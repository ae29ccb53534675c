"""Durable source catalog (S6 parity): pause/resume flags, hot reload,
stop-offset guard, catalog-wide stop_indexing switch."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from cb import catalog
from cb.build import IndexMeta
from cb.resumable import watch


def _write_shard(d, name, rows):
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(d, name))


def _rows(tag, n, base):
    return [
        {"doc_id": base + i, "text": f"{tag} join merge doc{base + i} window"}
        for i in range(n)
    ]


def _index_shas(index_dir):
    out = {}
    for root, _, files in os.walk(index_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, index_dir)
            if rel.startswith("_shuffle"):
                continue
            with open(p, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_pause_resume_byte_identical(tmp_path):
    """Two sources; one paused mid-watch then resumed.  The active
    source's index must be byte-identical to a never-paused run, and
    the paused one must catch up to a fresh build after resume."""
    in_a, in_b = str(tmp_path / "in_a"), str(tmp_path / "in_b")
    os.makedirs(in_a)
    os.makedirs(in_b)
    idx_a, idx_b = str(tmp_path / "idx_a"), str(tmp_path / "idx_b")
    cat = str(tmp_path / "sources.json")
    catalog.add_source(cat, "a", in_a, idx_a, text_col="text", id_col="doc_id")
    catalog.add_source(cat, "b", in_b, idx_b, text_col="text", id_col="doc_id")

    _write_shard(in_a, "s0.parquet", _rows("alpha", 6, 100))
    _write_shard(in_b, "s0.parquet", _rows("beta", 6, 500))

    # tick plan: t0 both build; t1 pause b + grow both; t2 grow both
    # again (b stays paused); t3 resume b
    def on_tick(tick, metas):
        if tick == 0:
            catalog.set_active(cat, "b", False)
            _write_shard(in_a, "s1.parquet", _rows("alpha", 5, 200))
            _write_shard(in_b, "s1.parquet", _rows("beta", 5, 600))
        elif tick == 1:
            _write_shard(in_a, "s2.parquet", _rows("alpha", 4, 300))
            _write_shard(in_b, "s2.parquet", _rows("beta", 4, 700))
        elif tick == 2:
            catalog.set_active(cat, "b", True)

    metas = catalog.watch_catalog(
        cat, max_ticks=4, sleep_fn=lambda s: None, on_tick=on_tick
    )
    assert metas["a"].n_docs == 15
    assert metas["b"].n_docs == 15  # caught up after resume

    # never-paused reference runs over the SAME final inputs
    ref_a, ref_b = str(tmp_path / "ref_a"), str(tmp_path / "ref_b")
    watch(in_a, ref_a, max_ticks=1, sleep_fn=lambda s: None,
          text_col="text", id_col="doc_id")
    watch(in_b, ref_b, max_ticks=1, sleep_fn=lambda s: None,
          text_col="text", id_col="doc_id")
    assert _index_shas(idx_a) == _index_shas(ref_a)
    assert _index_shas(idx_b) == _index_shas(ref_b)


def test_paused_source_not_rebuilt(tmp_path):
    """While paused, a source's index bytes do not change even though
    its input grows."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    idx = str(tmp_path / "idx")
    cat = str(tmp_path / "sources.json")
    catalog.add_source(cat, "s", src, idx, text_col="text", id_col="doc_id")
    _write_shard(src, "s0.parquet", _rows("x", 5, 0))
    catalog.watch_catalog(cat, max_ticks=1, sleep_fn=lambda s: None)
    before = _index_shas(idx)
    catalog.set_active(cat, "s", False)
    _write_shard(src, "s1.parquet", _rows("x", 5, 100))
    catalog.watch_catalog(cat, max_ticks=2, sleep_fn=lambda s: None)
    assert _index_shas(idx) == before  # untouched while paused
    assert IndexMeta(idx).n_docs == 5


def test_stop_indexing_switch(tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    idx = str(tmp_path / "idx")
    cat = str(tmp_path / "sources.json")
    catalog.add_source(cat, "s", src, idx, text_col="text", id_col="doc_id")
    _write_shard(src, "s0.parquet", _rows("x", 5, 0))
    catalog.set_stop_indexing(cat, True)
    catalog.watch_catalog(cat, max_ticks=1, sleep_fn=lambda s: None)
    assert not os.path.exists(os.path.join(idx, "_global.json"))
    catalog.set_stop_indexing(cat, False)
    catalog.watch_catalog(cat, max_ticks=1, sleep_fn=lambda s: None)
    assert IndexMeta(idx).n_docs == 5


def test_stop_after_guard(tmp_path):
    """F3 stop-offset: files sorting after the bound are never
    scheduled; raising the bound picks them up incrementally."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    idx = str(tmp_path / "idx")
    _write_shard(src, "s0.parquet", _rows("x", 5, 0))
    _write_shard(src, "s1.parquet", _rows("x", 4, 100))
    _write_shard(src, "s2.parquet", _rows("x", 3, 200))
    meta = watch(src, idx, max_ticks=1, sleep_fn=lambda s: None,
                 text_col="text", id_col="doc_id", stop_after="s1.parquet")
    assert meta.n_docs == 9  # s2 beyond the stop offset
    meta = watch(src, idx, max_ticks=1, sleep_fn=lambda s: None,
                 text_col="text", id_col="doc_id")
    assert meta.n_docs == 12


def test_catalog_cli_roundtrip(tmp_path, capsys):
    from cb.cli import main

    cat = str(tmp_path / "sources.json")
    src = str(tmp_path / "in")
    os.makedirs(src)
    assert main([
        "catalog", "add", "--catalog", cat, "--name", "s",
        "--input", src, "--index", str(tmp_path / "idx"),
        "--text-col", "text", "--id-col", "doc_id",
    ]) == 0
    assert main(["catalog", "pause", "--catalog", cat, "--name", "s"]) == 0
    loaded = catalog.load_catalog(cat)
    assert loaded["sources"][0]["active"] is False
    assert main(["catalog", "resume", "--catalog", cat, "--name", "s"]) == 0
    assert catalog.load_catalog(cat)["sources"][0]["active"] is True
    with pytest.raises(ValueError):
        catalog.set_active(cat, "nope", True)


def test_federation_source_kind(tmp_path):
    """A catalog source with kind=federation drives ingest_new_shards:
    new drain shards rebuild only their day-indexes per tick; pausing
    stops ingest; resuming catches up."""
    from cb import federated

    base_us = 1_767_571_200_000_000

    def shard_rows(day, start, n):
        return [
            {
                "doc_id": 1 + start + i,
                "text": f"stream alpha beta m{start + i % 5}",
                "ts": base_us + day * 86_400_000_000,
            }
            for i in range(n)
        ]

    def write_ts_shard(name, rows):
        t = pa.Table.from_pylist(rows)
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
        )
        pq.write_table(t, os.path.join(drain, name))

    drain = str(tmp_path / "drain")
    os.makedirs(drain)
    fed_dir = str(tmp_path / "fed")
    federated.init_federation(
        fed_dir, text_col="text", id_col="doc_id", ts_col="ts",
        prefix="cb-", num_parts=4,
    )
    cat_path = str(tmp_path / "sources.json")
    catalog.add_source(
        cat_path, "stream", drain, fed_dir, kind="federation",
    )

    write_ts_shard("part=0-off=0-20.parquet", shard_rows(0, 0, 20))
    metas = catalog.watch_catalog(cat_path, max_ticks=1, sleep_fn=lambda s: None)
    assert metas["stream"]["changed"] == ["cb-20260105"]

    # pause -> new day-1 shard ignored
    catalog.set_active(cat_path, "stream", False)
    write_ts_shard("part=0-off=20-35.parquet", shard_rows(1, 100, 15))
    metas = catalog.watch_catalog(cat_path, max_ticks=1, sleep_fn=lambda s: None)
    assert metas["stream"] is None or metas["stream"]["changed"] == ["cb-20260105"]
    assert not os.path.isdir(os.path.join(fed_dir, "index=cb-20260106"))

    # resume -> catches up on the next tick
    catalog.set_active(cat_path, "stream", True)
    metas = catalog.watch_catalog(cat_path, max_ticks=1, sleep_fn=lambda s: None)
    assert metas["stream"]["changed"] == ["cb-20260106"]
    assert os.path.isdir(os.path.join(fed_dir, "index=cb-20260106"))


def test_federation_source_kind_multifield(tmp_path):
    """The catalog tick drives MULTIFIELD federations too: the fed.json
    cfg (fields=[...]) travels with the federation, so kind=federation
    sources need no extra catalog keys — one tick ingests a shard into
    per-field day sub-indexes and the multifield engine serves it."""
    from cb import federated

    base_us = 1_767_571_200_000_000
    drain = str(tmp_path / "drain")
    os.makedirs(drain)
    fed_dir = str(tmp_path / "fed")
    federated.init_federation(
        fed_dir, fields=["text", "title"], id_col="doc_id", ts_col="ts",
        prefix="mf-", num_parts=4,
    )
    cat_path = str(tmp_path / "sources.json")
    catalog.add_source(cat_path, "mfstream", drain, fed_dir, kind="federation")

    rows = [
        {
            "doc_id": 1 + i,
            "text": f"stream alpha beta m{i % 5}",
            "title": f"title m{i % 3}",
            "ts": base_us,
        }
        for i in range(20)
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, os.path.join(drain, "part=0-off=0-20.parquet"))

    metas = catalog.watch_catalog(cat_path, max_ticks=1, sleep_fn=lambda s: None)
    assert metas["mfstream"]["changed"] == ["mf-20260105"]
    for f in ("text", "title"):
        assert os.path.isdir(
            os.path.join(fed_dir, "index=mf-20260105", f"field={f}")
        )
    eng = federated.FederatedMultiFieldEngine(fed_dir)
    try:
        hits = eng.search("alpha title:m1", k=5)
        assert hits and all(1 <= d <= 20 for d, _ in hits)
    finally:
        eng.shutdown()
