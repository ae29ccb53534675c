"""ES _update_by_query semantics: matched-set routing, set/add ops,
update_id idempotence (no double-add), and crash convergence via the
per-bucket done sentinels.  (DuckDB value-parity for the packaged
entry lives in test_oracle_parity.)"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import docmeta as dm
from cb.build import build_index
from cb.shard import QueryEngine

DOCS = [
    (1, "hash join over the big table", "en", "s0", 150),
    (2, "hash join deprecated path", "en", "s1", 250),
    (3, "merge sort window frame", "fr", "s0", 350),
    (4, "join hash reversed words", "en", "s0", 450),
    (5, "the quick hash join trick", "fr", "s1", 550),
    (6, "unrelated quantum zebra", "en", "s2", 650),
    (7, "join column index scan", "de", "s1", 125),
    (8, "sort merge join pipeline", "de", "s0", 825),
]


@pytest.fixture()
def built(tmp_path):
    rows = [
        {"doc_id": i, "text": t, "lang": lang, "source": src, "n_chars": n}
        for i, t, lang, src, n in DOCS
    ]
    src_file = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src_file)
    idx = str(tmp_path / "idx")
    build_index(src_file, idx, text_col="text", id_col="doc_id", num_parts=4)
    dm.ensure_docmeta(idx, src_file, ["lang", "source", "n_chars"])
    return idx


def _nchars(idx):
    eng = QueryEngine(idx, num_servers=2)
    try:
        return {d: n for d, n in eng.mget(range(1, 9), cols=("n_chars",))}
    finally:
        eng.shutdown()


def test_add_applies_to_matched_docs_only(built):
    eng = QueryEngine(built, num_servers=2)
    try:
        n = eng.update_by_query("merge", "n_chars", "add", 100)
    finally:
        eng.shutdown()
    assert n == 2  # docs 3 and 8
    got = _nchars(built)
    want = {i: nc + (100 if "merge" in t.split() else 0) for i, t, _, _, nc in DOCS}
    assert got == want


def test_set_op(built):
    eng = QueryEngine(built, num_servers=2)
    try:
        n = eng.update_by_query("quantum", "n_chars", "set", 7)
    finally:
        eng.shutdown()
    assert n == 1
    assert _nchars(built)[6] == 7


def test_update_id_reapply_is_noop(built):
    for expect in (2, 0):  # second run: all buckets have done sentinels
        eng = QueryEngine(built, num_servers=2)
        try:
            n = eng.update_by_query(
                "merge", "n_chars", "add", 100, update_id="u1"
            )
        finally:
            eng.shutdown()
        assert n == expect
    got = _nchars(built)
    assert got[3] == 450 and got[8] == 925  # added exactly once


def test_crash_convergence_skips_done_buckets(tmp_path):
    # Simulate a crash after one bucket finished: pre-write its done
    # sentinel, run the update, and check that bucket kept its old
    # values while the other bucket was updated.  range_bits=61
    # (shift=2) spreads the small fixture ids across buckets so the
    # interleave is real: doc 3 -> bucket 0, doc 8 -> bucket 2.
    rows = [
        {"doc_id": i, "text": t, "lang": lang, "source": src, "n_chars": n}
        for i, t, lang, src, n in DOCS
    ]
    src_file = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src_file)
    idx = str(tmp_path / "idx61")
    build_index(
        src_file, idx, text_col="text", id_col="doc_id",
        num_parts=4, range_bits=61,
    )
    dm.ensure_docmeta(idx, src_file, ["lang", "source", "n_chars"])
    sdir = os.path.join(idx, "docmeta", "_updates", "u2")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "b0.done"), "w") as f:
        f.write("1")
    n = dm.update_docs(idx, [3, 8], "n_chars", "add", 100, update_id="u2")
    assert n == 1
    got = _nchars(idx)
    assert got[3] == 350  # done-sentinel bucket untouched
    assert got[8] == 925
