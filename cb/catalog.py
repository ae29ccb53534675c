"""Durable source catalog: the ops surface of continuous ingest.

The reference's source-of-record is an Azure Table of
DiagnosticsSource rows — each names a source, its parser/mapping and
offsets, and carries an ``IsActive`` flag the scheduler re-reads every
cycle so operators can pause one source without touching the workers
(/root/reference/src/ConveyorBelt.Tooling/Configuration/
TableStorageConfigurationSource.cs:23-45); a cluster-wide
``stop_indexing`` key pauses everything
(/root/reference/src/ConveyorBelt.Worker/WorkerRole.cs:172-187).

Engine analog: ``sources.json`` (atomic rewrite, hot-reloaded every
tick) listing sources with

    {"name", "input_dir", "index_dir", "text_col", "id_col",
     "num_parts", "range_bits", "active", "stop_after"}

:func:`watch_catalog` polls the catalog file itself PLUS each ACTIVE
source's input dir each tick — flipping ``active`` to false pauses that
source's ingest on the next tick (its index stays serveable and its
shard manifests keep their place, so resuming catches up incrementally
and byte-identically); ``stop_after`` is the per-source stop-offset
guard (F3, BaseScheduler.cs:25-33); a catalog-level ``stop_indexing``
flag pauses every source at once.  Offsets/progress are NOT duplicated
into the catalog: the shard manifests written by the resumable build
are the offset store (single source of truth), exactly as the
reference keeps cursor state in the source row's companion position
keys.
"""

from __future__ import annotations

import os

from . import build, manifest, resumable

_SOURCE_DEFAULTS = {
    "kind": "index",  # or "federation": input_dir = drain dir of shards
    "text_col": "content",
    "id_col": None,
    "num_parts": build.DEFAULT_NUM_PARTS,
    "range_bits": build.DEFAULT_RANGE_BITS,
    "active": True,
    "stop_after": None,
}


def load_catalog(path: str) -> dict:
    cat = manifest.read(path)
    return cat if cat else {"stop_indexing": False, "sources": []}


def save_catalog(path: str, cat: dict) -> None:
    manifest.write_atomic(path, cat)


def _find(cat: dict, name: str) -> dict | None:
    for s in cat["sources"]:
        if s["name"] == name:
            return s
    return None


def add_source(path: str, name: str, input_dir: str, index_dir: str, **cfg) -> dict:
    """Register (or replace) a source row.  Unknown config keys raise;
    omitted ones default (see ``_SOURCE_DEFAULTS``)."""
    unknown = sorted(set(cfg) - set(_SOURCE_DEFAULTS))
    if unknown:
        raise ValueError(f"unknown source config keys {unknown}")
    cat = load_catalog(path)
    row = {
        "name": name,
        "input_dir": os.path.abspath(input_dir),
        "index_dir": os.path.abspath(index_dir),
        **_SOURCE_DEFAULTS,
        **cfg,
    }
    existing = _find(cat, name)
    if existing is not None:
        cat["sources"][cat["sources"].index(existing)] = row
    else:
        cat["sources"].append(row)
    save_catalog(path, cat)
    return row


def set_active(path: str, name: str, active: bool) -> None:
    """Pause (False) / resume (True) one source — takes effect on the
    next watch tick, like the reference's IsActive refresh."""
    cat = load_catalog(path)
    row = _find(cat, name)
    if row is None:
        raise ValueError(f"no source named {name!r} in {path}")
    row["active"] = bool(active)
    save_catalog(path, cat)


def set_stop_indexing(path: str, stop: bool) -> None:
    """Catalog-wide pause switch (``stop_indexing`` kv parity)."""
    cat = load_catalog(path)
    cat["stop_indexing"] = bool(stop)
    save_catalog(path, cat)


def watch_catalog(
    path: str,
    *,
    interval_s: float = 30.0,
    max_ticks: int | None = None,
    sleep_fn=None,
    on_tick=None,
) -> dict:
    """Multi-source continuous-ingest loop driven by the DURABLE catalog:
    every tick re-reads ``sources.json`` (config changes, pauses and new
    sources apply without restart), then runs one incremental watch tick
    per active source.  Returns {source name: last IndexMeta or None}.
    """
    import time

    if sleep_fn is None:
        sleep_fn = time.sleep
    sigs: dict[str, tuple | None] = {}
    metas: dict[str, object] = {}
    tick = 0
    while max_ticks is None or tick < max_ticks:
        cat = load_catalog(path)
        if not cat.get("stop_indexing"):
            for s in cat["sources"]:
                metas.setdefault(s["name"], None)
                if not s.get("active", True):
                    continue  # paused: skip scheduling, keep its state
                if s.get("kind", "index") == "federation":
                    # federated source: input_dir is a StreamConsumer
                    # drain dir, index_dir the federation root — one
                    # crash-safe ingest tick (only dirty day-indexes
                    # rebuild); pause/stop_indexing/stop_after behave
                    # exactly as for plain index sources
                    from . import federated

                    fed = federated.ingest_new_shards(
                        s["input_dir"], s["index_dir"],
                        stop_after=s.get("stop_after"),
                    )
                    if fed.get("changed"):
                        metas[s["name"]] = fed
                    continue
                meta, sigs[s["name"]] = resumable.watch_tick(
                    s["input_dir"], s["index_dir"], sigs.get(s["name"]),
                    text_col=s.get("text_col", "content"),
                    id_col=s.get("id_col"),
                    num_parts=s.get("num_parts", build.DEFAULT_NUM_PARTS),
                    range_bits=s.get("range_bits", build.DEFAULT_RANGE_BITS),
                    stop_after=s.get("stop_after"),
                )
                if meta is not None:
                    metas[s["name"]] = meta
        if on_tick is not None:
            on_tick(tick, metas)
        tick += 1
        if max_ticks is None or tick < max_ticks:
            sleep_fn(interval_s)
    return metas
