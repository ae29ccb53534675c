"""Parser-conformance tests over synthetic golden inputs, mirroring the
reference's test strategy (IisLogTests / SitecoreLogParserShould /
GenericJsonParserTests — SURVEY.md §5) without copying its fixtures."""

import ray
import pyarrow as pa
import pytest

from cb import parsers

IIS = """#Software: Internet Information Services
#Version: 1.0
#Fields: date time cs-method cs-uri-stem sc-status
2024-01-02 10:00:01 GET /api/users 200
2024-01-02 10:00:02 POST /api/orders 201
2024-01-02 10:00:03 GET /health -
bad line
#Fields: date time cs-method cs-uri-stem sc-status cs-bytes time-taken
2024-01-02 10:01:00 GET /api/users 200 512 12
2024-01-02 99:99:99 GET /api/x 200 1 1
"""


def test_iis_header_driven_parse():
    docs = parsers.parse_iis_w3c("u_ex240102.log", IIS)
    # 3 valid gen-1 lines + 1 valid gen-2 line; bad line and bad-ts dropped
    assert len(docs) == 4
    assert docs[0]["@timestamp"] == "2024-01-02 10:00:01"
    assert docs[0]["cs-method"] == "GET"
    assert docs[0]["PartitionKey"] == "api"
    assert docs[0]["RowKey"].startswith("u_ex240102_")
    # '-' placeholder dropped
    assert "sc-status" not in docs[2]
    # header change picked up
    assert docs[3]["cs-bytes"] == "512" and docs[3]["time-taken"] == "12"
    # row keys are byte offsets: strictly increasing, unique
    offs = [int(d["RowKey"].rsplit("_", 1)[1]) for d in docs]
    assert offs == sorted(offs) and len(set(offs)) == 4


def test_iis_custom_attributes_explode():
    content = (
        "#Fields: date time cs-uri-stem x-customattributes\n"
        "2024-01-02 10:00:01 /a k1=v1;k2=v2\n"
    )
    docs = parsers.parse_iis_w3c("f.log", content)
    assert docs[0]["k1"] == "v1" and docs[0]["k2"] == "v2"


SITECORE = """****
ManagedPoolThread 10:00:01 INFO Job started
ManagedPoolThread 10:00:02 WARN Something password=hunter2; user id=admin; happened
  continuation line one
  continuation password=secret2; two
ManagedPoolThread 10:00:03 ERROR Boom

"""


def test_sitecore_multiline_and_redaction():
    docs = parsers.parse_sitecore("log.20240102.120000.txt", SITECORE)
    assert len(docs) == 3
    assert docs[0]["level"] == "INFO"
    assert docs[0]["@timestamp"] == "2024-01-02 10:00:01"
    assert "password=*****" in docs[1]["message"]
    assert "user id=*****" in docs[1]["message"]
    assert "hunter2" not in docs[1]["message"]
    # continuation lines appended (and redacted there too)
    assert "continuation line one" in docs[1]["message"]
    assert "secret2" not in docs[1]["message"]
    assert docs[2]["level"] == "ERROR"
    assert docs[0]["PartitionKey"] == "20240102"


def test_generic_json_flatten_and_ts_cascade():
    docs = parsers.parse_generic_json(
        "single.json",
        '{"Timestamp": "2024-03-04T05:06:07", "n": 3, "ok": true, "nested": {"a": 1}}',
    )
    assert docs[0]["@timestamp"] == "2024-03-04 05:06:07"
    assert docs[0]["n"] == "3" and docs[0]["ok"] == "True"
    assert docs[0]["nested"] == '{"a": 1}'
    # cascade: no good name -> name containing date
    docs = parsers.parse_generic_json("f.json", '[{"created_date": "2024-01-01", "x": 1}]')
    assert docs[0]["@timestamp"] == "2024-01-01 00:00:00"
    # synthesized keys
    assert docs[0]["PartitionKey"] == "f" and docs[0]["RowKey"] == "f_0"


def test_insight_metrics():
    content = (
        '{"records": [{"count": 4, "total": 10.0, "minimum": 1, "maximum": 4,'
        ' "average": 2.5, "resourceId": "/sub/x/rg/y", "time": "2024-02-03T04:05:06",'
        ' "metricName": "cpu", "timeGrain": "PT1M"}]}'
    )
    docs = parsers.parse_insight_metrics("m.json", content)
    assert docs[0]["RowKey"] == "20240203040506"
    # reference formula: guid-first-part _ last-3-segments-reversed _ metric
    assert docs[0]["PartitionKey"] == "x_y_rg_x_cpu"
    assert docs[0]["average"] == "2.5"


def test_ray_stage_over_files(tmp_path):
    (tmp_path / "a.log").write_text(IIS)
    (tmp_path / "b.log").write_text(IIS)
    ds = ray.data.read_binary_files([str(tmp_path / "a.log"), str(tmp_path / "b.log")], include_paths=True)
    out = ds.map_batches(parsers.parse_files_stage("iis"), batch_format="pyarrow")
    rows = out.take_all()
    assert len(rows) == 8
    assert {r["partition_key"] for r in rows} == {"api", "health"}
    fields = dict(rows[0]["fields"])
    assert fields["cs-method"] == "GET"
