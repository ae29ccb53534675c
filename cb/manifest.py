"""Per-partition manifests: lineage + checkpoint state.

The analog of the reference's only durable progress state, the per-source
``LastOffsetPoint`` advanced transactionally after a successful push
(/root/reference/src/ConveyorBelt.Tooling/Scheduling/MasterScheduler.cs:80-87,143
and FileOffset.cs:10-82).  Here progress is per OUTPUT PARTITION, not a
scalar cursor: each partition directory gets a ``manifest.json`` with
input lineage, row/term counts and a content checksum, committed
atomically (tmp file + rename) AFTER the partition's data file is fully
written — the write-audit-publish pattern.  A resumed build skips any
partition whose manifest says ``done`` (north_rule requirement).
"""

from __future__ import annotations

import json
import os
import tempfile


def write_atomic(path: str, obj: dict) -> None:
    """Write JSON atomically (same-directory tmp + rename)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True, indent=1)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write -> treat as not done


def is_done(path: str, **expect) -> bool:
    """True iff the manifest exists, parses, says done, and matches
    ``expect`` key/values (e.g. same input lineage -> safe to skip)."""
    m = read(path)
    if m is None or m.get("status") != "done":
        return False
    return all(m.get(k) == v for k, v in expect.items())
