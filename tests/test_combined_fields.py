"""combined_fields (true BM25F): brute-force math parity, pool-size
invariance (the combined-df slice-sum contract), weight validation.
(DuckDB value-parity for the packaged entry lives in
test_oracle_parity.)"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cb import analyze, multifield, scoring

DOCS = [
    (1, "hash join over the big table scan", "hash overview"),
    (2, "join the path then hash it again join", "join guide"),
    (3, "merge sort window frame sort merge window", "sort notes"),
    (4, "join hash reversed words hash join", "words hash"),
    (5, "the quick hash trick join hash", "trick join"),
    (6, "unrelated quantum zebra", "zebra"),
]
W = {"text": 1.0, "title": 2.0}


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfields")
    rows = [
        {"doc_id": i, "text": t, "title": ti} for i, t, ti in DOCS
    ]
    idx = str(d / "idx")
    multifield.build_multifield(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), idx,
        ["text", "title"], id_col="doc_id",
    )
    return idx


def _brute(query, k=5):
    toks = {
        i: {"text": analyze.tokenize(t), "title": analyze.tokenize(ti)}
        for i, t, ti in DOCS
    }
    n = len(DOCS)
    tot = {
        f: sum(len(v[f]) for v in toks.values()) for f in ("text", "title")
    }
    avgdl = (W["text"] * tot["text"] + W["title"] * tot["title"]) / n
    terms = sorted(set(analyze.tokenize(query)))
    scores: dict[int, float] = {}
    for t in terms:
        df = sum(
            1 for v in toks.values()
            if t in v["text"] or t in v["title"]
        )
        if df == 0:
            continue
        idf = float(scoring.idf(df, n))
        for i, v in toks.items():
            tfc = (
                W["text"] * v["text"].count(t)
                + W["title"] * v["title"].count(t)
            )
            if tfc == 0:
                continue
            dlc = W["text"] * len(v["text"]) + W["title"] * len(v["title"])
            u = float(scoring.u_factor(tfc, dlc, avgdl))
            scores[i] = scores.get(i, 0.0) + idf * u
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, s) for d, s in ranked[:k]]


def test_combined_fields_brute_and_pool_invariance(built):
    for query in ("hash join", "merge sort", "zebra table", "join"):
        want = _brute(query)
        got_by_ns = []
        for ns in (1, 2, 4):
            eng = multifield.MultiFieldEngine(built, num_servers=ns)
            try:
                got_by_ns.append(
                    eng.combined_fields(
                        query, k=5, field_weights={"title": 2.0}
                    )
                )
            finally:
                eng.shutdown()
        assert got_by_ns[0] == got_by_ns[1] == got_by_ns[2], query
        got = got_by_ns[0]
        assert [d for d, _ in got] == [d for d, _ in want], query
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12
        )


def test_combined_fields_validation(built):
    eng = multifield.MultiFieldEngine(built, num_servers=2)
    try:
        with pytest.raises(ValueError):
            eng.combined_fields("hash", field_weights={"title": 0.5})
        with pytest.raises(ValueError):
            eng.combined_fields("hash", field_weights={"nope": 2.0})
        assert eng.combined_fields("qqqq zzzz") == []
    finally:
        eng.shutdown()
