"""Percolator (reverse search): brute-force parity against the
querylang boolean semantics, plus validation errors."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from cb import analyze, percolate


DOCS = [
    (1, "hash join over the big table", "en"),
    (2, "hash join deprecated path", "fr"),
    (3, "merge sort window frame", "en"),
    (4, "table scan then merge", "en"),
    (5, "group order column stream", "fr"),
    (6, "join column index scan", "en"),
    (7, "zebra quantum stream", "fr"),
    (8, "", "en"),  # empty text: matches nothing
]

QUERIES = [
    "hash join",               # OR terms
    '"hash join"',             # phrase
    "table -scan",             # exclusion
    "stream lang:fr",          # filter
    "+join column",            # required + scored
    '-"table scan" merge',     # negated phrase
]


def _brute(q: str):
    from cb import querylang

    p = querylang.parse(q)
    weights = p.get("weights") or {}
    out = []
    for doc_id, text, lang in DOCS:
        toks = analyze.tokenize(text)
        pad = f" {' '.join(toks)} "
        if not any(f" {t} " in pad for t in weights):
            continue
        if any(f" {t} " not in pad for t in p.get("required", [])):
            continue
        if any(f" {' '.join(ph)} " not in pad for ph in p["phrases"]):
            continue
        if any(f" {' '.join(ph)} " in pad for ph in p.get("excluded_phrases", [])):
            continue
        if any(f" {t} " in pad for t in p["excluded"]):
            continue
        if any(lang != v for c, v in p["filters"].items() if c == "lang"):
            continue
        out.append(doc_id)
    return out


def _ds():
    rows = [{"doc_id": i, "text": t, "lang": lang} for i, t, lang in DOCS]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_percolate_matches_brute_force():
    res = percolate.percolate(_ds(), QUERIES).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    n_nonempty = 0
    for qid, q in enumerate(QUERIES):
        want = _brute(q)
        assert sorted(got.get(qid, [])) == sorted(want), q
        n_nonempty += bool(want)
    assert n_nonempty >= 5


def test_percolate_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="wildcard"):
        percolate.parse_queries(["jo*"])
    with pytest.raises(ValueError, match="msm"):
        percolate.parse_queries(["a b msm:2"])
    with pytest.raises(ValueError, match="range"):
        percolate.parse_queries(["join n_chars:[10 TO 20]"])


def test_percolate_missing_filter_column_raises():
    ds = _ds().drop_columns(["lang"])
    with pytest.raises(Exception, match="filter column"):
        percolate.percolate(ds, ["stream lang:fr"]).take_all()


def test_percolate_prefilter_exact_and_skips():
    """Term-indexed query prefiltering (the ES percolator trick) must
    change nothing about the output — including queries whose universe
    terms never occur in the corpus — while evaluating fewer queries."""
    queries = QUERIES + ["absentterm otherabsent", '"missing phrase"']
    a = percolate.percolate(_ds(), queries, prefilter=True).take_all()
    b = percolate.percolate(_ds(), queries, prefilter=False).take_all()
    key = lambda r: (r["query_id"], r["doc_id"])
    assert sorted(a, key=key) == sorted(b, key=key)
    # registry ids survive the compaction remap: the last REAL query
    # keeps its original id even with dead queries interleaved
    assert {r["query_id"] for r in a} <= set(range(len(QUERIES)))


def test_percolate_prefilter_batch_skip():
    """A batch containing none of any query's universe terms emits
    nothing (and takes the early-exit path)."""
    import pyarrow as pa
    import ray

    rows = [{"doc_id": 1, "text": "completely unrelated words here", "lang": "en"}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = percolate.percolate(ds, ["hash join", '"merge sort"']).take_all()
    assert out == []
