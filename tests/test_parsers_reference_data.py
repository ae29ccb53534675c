"""Parser parity driven by the reference's OWN test data files and
assertions (read in place from /root/reference/test/.../Data — never
copied): IisLogTests.cs, SitecoreLogParserShould.cs,
SitecoreLogLineParserShould.cs, InsightMetricsParserTests.cs.

Known representation deviations (documented in cb/parsers.py): our
timestamps use "YYYY-MM-DD HH:MM:SS" (normalized to the reference's "T"
form here), multiline messages join with \\n (reference uses \\r\\n),
and field names map source->SitecoreProcessId, level->SitecoreLevel,
message->Payload."""

import os

import pytest

from cb import parsers

DATA = "/root/reference/test/ConveyorBelt.Tooling.Test/Data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not present"
)


def _read(name: str, encoding: str) -> str:
    # newline="" keeps \r\n verbatim (offset parity with the reference's
    # byte-oriented reader); universal-newline mode would shift offsets
    with open(os.path.join(DATA, name), encoding=encoding, newline="") as f:
        return f.read()


def test_iis_reference_file():
    # IisLogTests.cs:37-51 — offsets computed exactly as the reference's
    # GetDynamicRowOffsets (ASCII decode keeps the BOM bytes in the
    # offsets; latin-1 here preserves byte positions the same way)
    content = _read("IisLog.txt", "latin-1")
    offsets = [0]
    pos = 0
    while (pos := content.find("\r\n", pos)) > 0:
        pos += 2
        offsets.append(pos)

    def row_key(row: int) -> str:  # GetRowKey(row) = offsets[row+1-1]
        return f"u_ex15020701_{offsets[row]}"

    docs = parsers.parse_iis_w3c("u_ex15020701.log", content)
    assert len(docs) == 114
    e0 = docs[0]
    assert e0["s-computername"] == "5RD00155D4A0E2E"
    assert e0["cs-method"] == "GET"
    assert e0["cs-uri-query"] == "store=AU"
    assert e0["@timestamp"].replace(" ", "T") == "2016-09-16T05:59:59"
    assert docs[1]["cs-uri-stem"] == "/product/catalogue/v2/productgroups/ctl/4650127"
    assert e0["RowKey"] == row_key(5)
    # mid-file header generation change: rows 29/30 stay consecutive
    assert docs[20]["RowKey"] == row_key(29)
    assert docs[21]["RowKey"] == row_key(30)
    # the changing-headers tail (IisLogTests.cs:90-110)
    tail = [d for d in docs if d["RowKey"] == row_key(30)][0]
    assert tail["s-computername"] == "30RD00155D4A0E2E"
    assert tail["cs-uri-stem"] == "/product/catalogue/v2/productgroups/ctl/6385565"
    assert tail["time-taken"] == "94"
    assert docs[-1]["@timestamp"].replace(" ", "T") == "2016-09-16T05:00:01"


def test_sitecore_reference_files():
    # SitecoreLogParserShould.cs:18-70
    docs = parsers.parse_sitecore(
        "SitecoreLog1.log.20160613.172129.txt", _read("SitecoreLog1.txt", "utf-8-sig")
    )
    assert len(docs) == 1
    assert docs[0]["source"] == "ManagedPoolThread #0"
    assert docs[0]["level"] == "INFO"
    assert docs[0]["@timestamp"].replace(" ", "T") == "2016-06-13T17:12:32"
    assert (
        docs[0]["message"]
        == "Trying to load XML configuration /App_Config/Security/GlobalRoles.config"
    )

    docs = parsers.parse_sitecore(
        "baselogfile.20160613.180755.txt", _read("SitecoreLog2.txt", "utf-8-sig")
    )
    assert docs[0]["level"] == "DEBUG"

    docs = parsers.parse_sitecore(
        "baselogfile.20160101.180755.txt", _read("SitecoreLog3.txt", "utf-8-sig")
    )
    assert len(docs) == 2
    assert docs[0]["level"] == "ERROR"
    msg = docs[0]["message"]
    assert msg.startswith("Test Error with exception\n")  # ref: \r\n
    assert msg.endswith("Parameter name: database")


@pytest.mark.parametrize(
    "line,level,source,text",
    [
        (
            "ManagedPoolThread #0 17:12:32 INFO  Trying to load XML configuration /App_Config/Security/GlobalRoles.config",
            "INFO",
            "ManagedPoolThread #0",
            "Trying to load XML configuration /App_Config/Security/GlobalRoles.config",
        ),
        ("17436 11:10:02 DEBUG Test Debug message", "DEBUG", "17436", "Test Debug message"),
        ("17436 19:31:16 ERROR Test Error message", "ERROR", "17436", "Test Error message"),
    ],
)
def test_sitecore_line_vectors(line, level, source, text):
    # SitecoreLogLineParserShould.cs:20-35
    docs = parsers.parse_sitecore("x.20160614.txt", line)
    assert len(docs) == 1
    assert docs[0]["level"] == level
    assert docs[0]["source"] == source
    assert docs[0]["message"] == text


def test_sitecore_partial_line_is_not_an_entry():
    # SitecoreLogLineParserShould.cs:38-46
    docs = parsers.parse_sitecore(
        "x.20160614.txt",
        "   at System.Reflection.RuntimeConstructorInfo.Invoke(BindingFlags invokeAttr, Binder binder, Object[] parameters, CultureInfo culture)",
    )
    assert docs == []


def test_insight_metrics_reference_file():
    # InsightMetricsParserTests.cs:14-62
    docs = parsers.parse_insight_metrics(
        "InsightMetrics.json", _read("InsightMetrics.json", "utf-8-sig")
    )
    assert len(docs) == 96
    r = docs[0]
    assert (
        r["resourceId"]
        == "/SUBSCRIPTIONS/9614FC94-9519-46FA-B7EC-DD1B0411DB13/RESOURCEGROUPS/WHASHA/PROVIDERS/MICROSOFT.CACHE/REDIS/FILLAPDWHASHAPRODUCTSEYHOOACHE"
    )
    assert r["metricName"] == "connectedclients"
    assert (
        r["PartitionKey"]
        == "9614FC94_FILLAPDWHASHAPRODUCTSEYHOOACHE_REDIS_MICROSOFT.CACHE_connectedclients"
    )
    assert r["RowKey"] == "20180118125500"
    assert r["@timestamp"].startswith("2018-01-18 12:55:00")
    # keys unique across all records (KeysCreatedQueEsUnico)
    assert len({d["PartitionKey"] + d["RowKey"] for d in docs}) == 96


def test_generic_json_reference_files():
    for name in ("single.json", "anotherSingle.json"):
        docs = parsers.parse_generic_json(name, _read(name, "utf-8-sig"))
        assert len(docs) == 1
    docs = parsers.parse_generic_json("array.json", _read("array.json", "utf-8-sig"))
    assert len(docs) >= 2
