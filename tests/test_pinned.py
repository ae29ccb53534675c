"""pinned query: order preservation, absent/tombstoned pin 404s,
organic dedupe, pinned-only when the query matches nothing.  (DuckDB
value-parity for the packaged entry lives in test_oracle_parity.)"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import docmeta as dm
from cb.build import build_index
from cb.shard import QueryEngine, delete_docs

DOCS = [
    (1, "hash join over the big table scan", "en", "s0", 150),
    (2, "join the path then hash it again join", "en", "s1", 250),
    (3, "merge sort window frame sort merge window", "fr", "s0", 350),
    (4, "join hash reversed words hash join", "en", "s0", 450),
    (5, "the quick hash trick join hash", "fr", "s1", 550),
    (6, "unrelated quantum zebra", "en", "s2", 650),
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("pinned")
    rows = [
        {"doc_id": i, "text": t, "lang": lang, "source": src, "n_chars": n}
        for i, t, lang, src, n in DOCS
    ]
    src_file = str(d / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src_file)
    idx = str(d / "idx")
    build_index(src_file, idx, text_col="text", id_col="doc_id", num_parts=2)
    dm.ensure_docmeta(idx, src_file, ["lang", "source", "n_chars"])
    return idx


def test_pinned_order_dedupe_and_absent(built):
    eng = QueryEngine(built, num_servers=2)
    try:
        organic = eng.search("hash join", k=10)
        got = eng.pinned("hash join", [6, 999, 4], k=10)
    finally:
        eng.shutdown()
    # pins first, given order, absent 999 dropped, score 0.0 / flag 1
    assert [r[0] for r in got[:2]] == [6, 4]
    assert all(r[1] == 0.0 and r[2] == 1 for r in got[:2])
    # organic tail: same ranking minus the pinned ids, flags 0
    want_tail = [(d, s, 0) for d, s in organic if d not in (6, 4)][:8]
    assert got[2:] == want_tail
    assert 4 not in [r[0] for r in got[2:]]


def test_pinned_only_when_no_organic(built):
    eng = QueryEngine(built, num_servers=2)
    try:
        got = eng.pinned("xyzzyunseen", [3, 1], k=10)
    finally:
        eng.shutdown()
    assert got == [(3, 0.0, 1), (1, 0.0, 1)]


def test_pinned_tombstoned_pin_drops(built):
    delete_docs(built, [6])  # last test in the module: no restore needed
    eng = QueryEngine(built, num_servers=2)
    try:
        got = eng.pinned("hash join", [6, 4], k=10)
    finally:
        eng.shutdown()
    assert [r[0] for r in got if r[2] == 1] == [4]
    assert 6 not in [r[0] for r in got]
