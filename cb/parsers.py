"""Reference parser family re-expressed as Ray Data batch transforms.

Capability parity with the reference's ``IParser`` implementations
(SURVEY.md §2.2) — behaviors re-implemented from their observable
semantics, not translated:

- W3C/IIS logs  (IisLogParser.cs:13-235): ``#Fields:`` header-driven
  dynamic schema incl. mid-file header changes, ``date time`` ->
  ``@timestamp`` with sortable-datetime validation, ``-`` placeholder
  drops, ``k=v;k=v`` attribute explosion, ``row_key = <stem>_<offset>``.
- Akamai logs   (AkamaiLogParser.cs:9-15): TSV split + quote trim.
- Sitecore logs (SitecoreLogParser.cs:24-162 + SitecoreLogLineParser):
  multiline assembly (continuation lines append to the current entry),
  password/user redaction, junk-line drop, date from filename + time
  from line.
- Generic JSON  (GenericJsonParser.cs:13-95): object/array flatten to
  string values, timestamp inference cascade good(Timestamp/EventDate)
  -> ok(name contains date/time) -> any parseable, synthesized keys.
- Insight metrics (InsightMetricsParser.cs:14-61): records[] -> one doc
  per metric with composite partition key.

Each parser is a pure function ``(filename, content) -> list[dict]``
plus a ``map_batches``-ready wrapper over ``read_binary_files(...,
include_paths=True)`` rows — a file is one row, so multiline state
stays file-local and the stage is embarrassingly parallel.

Docs are flat string dicts (the reference's ``IDictionary<string,
string>``), shipped as Arrow ``(path, row_key, partition_key,
timestamp, fields:map<string,string>)`` rows.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime

import pyarrow as pa

RESERVED = ("@timestamp", "PartitionKey", "RowKey")

_SORTABLE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}$")
_REDACT = re.compile(r"(?i)(password|user id)=([^;,\s]+)")


def _try_parse_ts(s: str) -> datetime | None:
    s = s.strip().replace("T", " ")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s[:26], fmt)
        except ValueError:
            continue
    return None


# --------------------------------------------------------------------------
# W3C / IIS
# --------------------------------------------------------------------------

def parse_iis_w3c(filename: str, content: str) -> list[dict]:
    """Header-driven W3C parse; returns one flat dict per valid line."""
    stem = os.path.splitext(os.path.basename(filename))[0]
    docs: list[dict] = []
    fields: list[str] | None = None
    offset = 0
    for raw in content.splitlines(keepends=True):
        offset += len(raw)
        line = raw.rstrip("\r\n")
        if line.startswith("#"):
            if line.startswith("#Fields:"):
                fields = line[len("#Fields:") :].split()
            continue
        if not line.strip() or fields is None:
            continue
        vals = line.split(" ")
        if len(vals) != len(fields):
            continue  # ragged line vs current header generation
        doc: dict = {}
        date_part = time_part = None
        for name, val in zip(fields, vals):
            if val == "-":
                continue  # reference drops placeholders
            if name == "date":
                date_part = val
                continue
            if name == "time":
                time_part = val
                continue
            if "customattributes" in name.lower() and "=" in val:
                for kv in val.split(";"):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        if k:
                            doc[k] = v
                continue
            doc[name] = val
        if date_part is None or time_part is None:
            continue
        ts = f"{date_part} {time_part}"
        if not _SORTABLE.match(ts) or _try_parse_ts(ts) is None:
            continue  # non-sortable/invalid timestamp -> row dropped
        doc["@timestamp"] = ts
        uri = doc.get("cs-uri-stem", "")
        segs = [s for s in uri.split("/") if s]
        doc["PartitionKey"] = segs[0] if segs else stem
        # END-of-line byte offset (the resume position a ParseCursor
        # would continue from) — IisLogTests.cs GetRowKey semantics
        doc["RowKey"] = f"{stem}_{offset}"
        docs.append(doc)
    return docs


def parse_akamai(filename: str, content: str) -> list[dict]:
    """TSV variant of the W3C parse with quote trimming."""
    unquoted = "\n".join(
        "\t".join(v.strip('"') for v in line.split("\t"))
        for line in content.splitlines()
    )
    # reuse the W3C machinery over space-normalized fields
    return parse_iis_w3c(filename, unquoted.replace("\t", " "))


# --------------------------------------------------------------------------
# Sitecore-style multiline logs
# --------------------------------------------------------------------------

_SC_LEVELS = ("INFO", "WARN", "ERROR", "DEBUG", "FATAL", "AUDIT")
_SC_FNAME_DATE = re.compile(r"(\d{8})(?:\.(\d{6}))?")


def _redact(msg: str) -> str:
    return _REDACT.sub(lambda m: f"{m.group(1)}=*****", msg)


# Entry shape (SitecoreLogLineParser.cs:13-28 semantics): scan for the
# FIRST hh:mm:ss token; everything before it is the event source (which
# may contain spaces — "ManagedPoolThread #0"), the next token is the
# level, the rest (leading whitespace skipped, inner spacing kept) is
# the message.  Deviation, documented: the level is whitelisted (the
# reference accepts any token there), which doubles as the junk guard.
_SC_ENTRY = re.compile(
    r"^(?P<src>.*?)[ \t]+(?P<time>\d{2}:\d{2}:\d{2})(?:\.\d+)?[ \t]+"
    r"(?P<level>" + "|".join(_SC_LEVELS) + r")(?:[ \t]+(?P<msg>.*))?$"
)


def parse_sitecore(filename: str, content: str) -> list[dict]:
    base = os.path.basename(filename)
    m = _SC_FNAME_DATE.search(base)
    date_s = m.group(1) if m else "19700101"
    date_iso = f"{date_s[:4]}-{date_s[4:6]}-{date_s[6:8]}"
    stem = os.path.splitext(base)[0]
    docs: list[dict] = []
    cur: dict | None = None
    for lineno, line in enumerate(content.splitlines(), start=1):
        stripped = line.strip()
        if not stripped or set(stripped) == {"*"}:
            continue  # junk line
        em = _SC_ENTRY.match(stripped)
        if em:
            if cur is not None and cur["message"].strip():
                docs.append(cur)
            cur = {
                "source": em.group("src"),
                "level": em.group("level"),
                "message": _redact(em.group("msg") or ""),
                "@timestamp": f"{date_iso} {em.group('time')}",
                "PartitionKey": date_s,
                "RowKey": f"{stem}_{lineno}",
            }
        elif cur is not None:
            cur["message"] = cur["message"] + "\n" + _redact(line)
    if cur is not None and cur["message"].strip():
        docs.append(cur)
    return docs


# --------------------------------------------------------------------------
# Generic JSON
# --------------------------------------------------------------------------

_GOOD_TS_NAMES = ("timestamp", "eventdate")


def _stringify(v) -> str:
    if isinstance(v, bool):
        return "True" if v else "False"
    if v is None:
        return ""
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True)
    return str(v)


def _infer_timestamp(obj: dict) -> str | None:
    """good(Timestamp/EventDate) -> ok(name has date/time) -> any value
    that parses; deterministic (no wall-clock fallback)."""
    for key in obj:
        if key.lower() in _GOOD_TS_NAMES:
            ts = _try_parse_ts(str(obj[key]))
            if ts:
                return ts.strftime("%Y-%m-%d %H:%M:%S")
    for key in obj:
        kl = key.lower()
        if ("date" in kl or "time" in kl) and _try_parse_ts(str(obj[key])):
            return _try_parse_ts(str(obj[key])).strftime("%Y-%m-%d %H:%M:%S")
    for key in obj:
        ts = _try_parse_ts(str(obj[key]))
        if ts:
            return ts.strftime("%Y-%m-%d %H:%M:%S")
    return None


def parse_generic_json(filename: str, content: str) -> list[dict]:
    stem = os.path.splitext(os.path.basename(filename))[0]
    data = json.loads(content)
    objs = data if isinstance(data, list) else [data]
    docs = []
    for i, obj in enumerate(objs):
        if not isinstance(obj, dict):
            continue
        doc = {k: _stringify(v) for k, v in obj.items()}
        ts = _infer_timestamp(obj)
        if ts:
            doc["@timestamp"] = ts
        doc.setdefault("PartitionKey", stem)
        doc.setdefault("RowKey", f"{stem}_{i}")
        docs.append(doc)
    return docs


# --------------------------------------------------------------------------
# Insight metrics JSON
# --------------------------------------------------------------------------

def parse_insight_metrics(filename: str, content: str) -> list[dict]:
    data = json.loads(content)
    docs = []
    for rec in data.get("records", []):
        ts = _try_parse_ts(str(rec.get("time", "")))
        resource = str(rec.get("resourceId", ""))
        # reference PK (InsightMetricsParser.cs:41-42):
        # {subscription-guid-first-part}_{last 3 path segments, reversed}_{metric}
        parts = resource.split("/")
        sub = parts[2].split("-")[0] if len(parts) > 2 else ""
        rev3 = "_".join(parts[::-1][:3])
        pk = f"{sub}_{rev3}_{rec.get('metricName', '')}"
        doc = {k: _stringify(v) for k, v in rec.items()}
        if ts:
            doc["@timestamp"] = ts.strftime("%Y-%m-%d %H:%M:%S")
            doc["RowKey"] = ts.strftime("%Y%m%d%H%M%S")
        else:
            doc["RowKey"] = "00000000000000"
        doc["PartitionKey"] = pk
        docs.append(doc)
    return docs


# --------------------------------------------------------------------------
# Ray stage
# --------------------------------------------------------------------------

PARSERS = {
    "iis": parse_iis_w3c,
    "akamai": parse_akamai,
    "sitecore": parse_sitecore,
    "json": parse_generic_json,
    "insight": parse_insight_metrics,
}

DOC_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("row_key", pa.string()),
        ("partition_key", pa.string()),
        ("timestamp", pa.string()),
        ("fields", pa.map_(pa.string(), pa.string())),
    ]
)


def docs_to_table(path: str, docs: list[dict]) -> pa.Table:
    rows = []
    for d in docs:
        rows.append(
            {
                "path": path,
                "row_key": d.get("RowKey", ""),
                "partition_key": d.get("PartitionKey", ""),
                "timestamp": d.get("@timestamp", ""),
                "fields": [
                    (k, v) for k, v in sorted(d.items()) if k not in RESERVED
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def parse_files_stage(parser_name: str):
    """Batch fn for ``read_binary_files(paths, include_paths=True)``
    datasets: one input row per file (reference: one work item per blob,
    BlobFileActor.cs:45-92)."""
    fn = PARSERS[parser_name]

    def stage(batch: pa.Table) -> pa.Table:
        tabs = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            docs = fn(path, data.decode("utf-8", errors="replace"))
            tabs.append(docs_to_table(path, docs))
        return (
            pa.concat_tables(tabs)
            if tabs
            else pa.Table.from_pylist([], schema=DOC_SCHEMA)
        )

    return stage
