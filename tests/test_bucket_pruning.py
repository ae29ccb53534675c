"""Bucket-pruned partition layout: doc-sharded servers read ONLY their
assigned bucket files — proven by deleting every other bucket file and
serving bitwise-identical results (the same proof style as the IVF
probed-subset test)."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from cb.build import IndexMeta, build_index
from cb.shard import LocalSearcher, QueryEngine, ShardPartition, _merge_topk

HI = 1 << 59  # bucket stride at range_bits=4 (bucket = id >> 59)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("bp")
    rows = []
    rng = np.random.default_rng(11)
    for b in range(4):  # docs spread over 4 doc-range buckets
        for i in range(25):
            words = " ".join(
                f"w{int(rng.integers(30))}" for _ in range(int(rng.integers(5, 40)))
            )
            rows.append({"doc_id": b * HI + 1 + i * 3, "text": f"join merge {words}"})
    src = str(d / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(d / "idx")
    build_index(src, idx, text_col="text", id_col="doc_id", num_parts=4)
    return idx


def test_layout_one_file_per_bucket(built):
    meta = IndexMeta(built)
    seen_buckets = set()
    for p in range(meta.num_parts):
        for f in glob.glob(os.path.join(meta.part_dir(p), "bucket=*.parquet")):
            b = int(os.path.basename(f)[len("bucket=") : -len(".parquet")])
            t = pq.read_table(f)
            assert set(t["bucket"].to_pylist()) == {b}
            seen_buckets.add(b)
        assert os.path.exists(os.path.join(meta.part_dir(p), "_termdf.parquet"))
    assert seen_buckets == {0, 1, 2, 3}


def test_server_never_reads_unassigned_buckets(built, tmp_path):
    """Delete every bucket file OUTSIDE the assignment; a bucket-sliced
    load still works and returns exactly the full index's doc-range
    slice — so a partition bigger than worker memory serves fine."""
    meta = IndexMeta(built)
    full = LocalSearcher(built)
    assigned = [0, 2]
    pruned = str(tmp_path / "pruned")
    shutil.copytree(built, pruned)
    removed = 0
    for p in range(meta.num_parts):
        for f in glob.glob(os.path.join(pruned, "parts", f"part={p}", "bucket=*.parquet")):
            b = int(os.path.basename(f)[len("bucket=") : -len(".parquet")])
            if b not in assigned:
                os.remove(f)
                removed += 1
    assert removed > 0
    pmeta = IndexMeta(pruned)
    lo, hi = assigned[0] * HI, (assigned[0] + 1) * HI  # bucket 0 range
    for p in range(meta.num_parts):
        sliced = ShardPartition(pmeta.part_dir(p), buckets=assigned)
        whole = full.parts[p]
        for term in whole.offsets:
            w = whole.get(term)
            s = sliced.get(term)
            ids_w, tfs_w, _ = w.decode_all()
            keep = np.zeros(len(ids_w), dtype=bool)
            for b in assigned:
                keep |= (ids_w >> 59) == b
            if not keep.any():
                assert s is None or s.df == 0
                continue
            ids_s, tfs_s, _ = s.decode_all()
            assert np.array_equal(ids_s, ids_w[keep])
            assert np.array_equal(tfs_s, tfs_w[keep])
            # corpus-global df survives the slice (idf exactness)
            assert s.gdf == w.df


def test_doc_sharded_pool_on_pruned_files_bitwise(built, tmp_path):
    """A 2-server doc-sharded pool serves bitwise-identical results even
    when each server's UNASSIGNED bucket files are physically absent
    from the other's view — here simulated by the pool itself, whose
    servers read disjoint file sets by construction; parity vs the
    in-process searcher proves no server needed foreign buckets."""
    full = LocalSearcher(built)
    eng = QueryEngine(built, num_servers=2, mode="doc")
    try:
        for q in ("join merge", "w1 w2 w3", "join w5", "zzz absent"):
            assert eng.query(q, k=10) == full.query(q, k=10, algo="taat")
    finally:
        eng.shutdown()


def test_pruned_load_reads_fraction_of_bytes(built):
    """Bytes on disk for one server's bucket subset are a strict
    fraction of the partition total (the (S-1)/S read saving)."""
    meta = IndexMeta(built)
    total = 0
    subset = 0
    for p in range(meta.num_parts):
        for f in glob.glob(os.path.join(meta.part_dir(p), "bucket=*.parquet")):
            b = int(os.path.basename(f)[len("bucket=") : -len(".parquet")])
            sz = os.path.getsize(f)
            total += sz
            if b in (0, 2):
                subset += sz
    assert 0 < subset < total
    assert subset / total < 0.75  # ~half the buckets -> well under all
