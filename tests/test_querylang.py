"""Lucene-lite query strings: parse + ES-aligned semantics + pool parity."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from cb import docmeta as dm, querylang
from cb.build import build_index
from cb.shard import LocalSearcher, QueryEngine

DOCS = [
    (1, "hash join over the big table", "en", "s0"),
    (2, "hash join deprecated path", "en", "s1"),
    (3, "merge sort window frame", "fr", "s0"),
    (4, "join hash reversed words", "en", "s0"),   # terms, but not the phrase
    (5, "the quick hash join trick", "fr", "s1"),
    (6, "unrelated quantum zebra", "en", "s0"),
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("ql")
    rows = [
        {"doc_id": i, "text": t, "lang": lang, "source": src}
        for i, t, lang, src in DOCS
    ]
    src_file = str(d / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src_file)
    idx = str(d / "idx")
    build_index(src_file, idx, text_col="text", id_col="doc_id", num_parts=4)
    dm.ensure_docmeta(idx, src_file, ["lang", "source"])
    return idx


def test_parse():
    p = querylang.parse('error timeout "hash join" lang:en -deprecated')
    assert p["terms"] == ["error", "timeout"]
    assert p["phrases"] == [["hash", "join"]]
    assert p["filters"] == {"lang": "en"}
    assert p["excluded"] == ["deprecated"]


def test_terms_or_semantics(built):
    s = LocalSearcher(built)
    got = {d for d, _ in s.search("hash join", k=10)}
    assert got == {1, 2, 4, 5}  # any-term match, scored


def test_phrase_required(built):
    s = LocalSearcher(built)
    got = {d for d, _ in s.search('"hash join"', k=10)}
    assert got == {1, 2, 5}  # doc 4 has both terms but not adjacent in order


def test_exclusion(built):
    s = LocalSearcher(built)
    got = {d for d, _ in s.search('"hash join" -deprecated', k=10)}
    assert got == {1, 5}


def test_parse_negated_phrase():
    p = querylang.parse('window -"hash join" -deprecated')
    assert p["terms"] == ["window"]
    assert p["excluded_phrases"] == [["hash", "join"]]
    assert p["excluded"] == ["deprecated"]
    assert p["phrases"] == []


def test_negated_phrase(built):
    s = LocalSearcher(built)
    # docs with "hash" but NOT the exact phrase "hash join": doc 4 only
    got = {d for d, _ in s.search('hash -"hash join"', k=10)}
    assert got == {4}
    # negated phrase whose terms never co-occur: drops nothing
    got = {d for d, _ in s.search('hash -"zebra join"', k=10)}
    assert got == {1, 2, 4, 5}
    # negated phrase with a term absent from the corpus: drops nothing
    got = {d for d, _ in s.search('hash -"warp join"', k=10)}
    assert got == {1, 2, 4, 5}


def test_field_filter(built):
    s = LocalSearcher(built)
    got = {d for d, _ in s.search('"hash join" lang:en', k=10)}
    assert got == {1, 2}
    got2 = {d for d, _ in s.search("hash join lang:en source:s0", k=10)}
    assert got2 == {1, 4}


def test_filter_without_docmeta_raises(tmp_path):
    rows = [{"doc_id": 1, "text": "alpha beta"}]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, text_col="text", id_col="doc_id", num_parts=2)
    with pytest.raises(ValueError, match="docmeta"):
        LocalSearcher(idx).search("alpha lang:en", k=5)


def test_scores_match_plain_bm25(built):
    """Query-string scores for pure-term queries equal plain BM25."""
    s = LocalSearcher(built)
    assert s.search("hash join", k=10) == s.query("hash join", k=10, algo="taat")


QUERIES = [
    "hash join",
    '"hash join"',
    '"hash join" -deprecated',
    '"hash join" lang:en',
    "hash join lang:en source:s0",
    "merge window",
    '-zebra hash',
    'quantum "merge sort"',
]


def test_engine_parity_both_modes(built):
    s = LocalSearcher(built)
    for mode in ("doc", "term"):
        for ns in (1, 2, 3):
            engine = QueryEngine(built, num_servers=ns, mode=mode)
            try:
                for q in QUERIES:
                    assert engine.search(q, k=10) == s.search(q, k=10), (mode, ns, q)
            finally:
                engine.shutdown()
