"""Randomized query-string cross-check: engine search vs a pure-Python
reference over random corpora and generated queries mixing every clause
type (terms, phrases, filters, exclusions)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from cb import analyze, docmeta as dm, scoring
from cb.build import build_index
from cb.query import rank_topk
from cb.shard import LocalSearcher

VOCAB = [
    "alpha", "beta", "gamma", "delta", "join", "merge", "sort", "hash",
    "table", "scan", "window", "frame", "stream", "batch", "zebra",
]
LANGS = ["en", "fr", "de"]


def _reference_search(rows, parsed, k):
    """Sequential spec: BM25 over scored terms (sorted-term summation),
    membership = any scored term AND every phrase AND no excluded term
    AND metadata filters."""
    toks = {r["doc_id"]: analyze.tokenize(r["text"]) for r in rows}
    tf = {d: Counter(t) for d, t in toks.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(rows)
    avgdl = sum(dl.values()) / n if n else 0.0
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    score_terms = sorted(set(parsed["terms"]) | {t for p in parsed["phrases"] for t in p})
    meta = {r["doc_id"]: r for r in rows}
    ids, scores = [], []
    for r in rows:
        d = r["doc_id"]
        s = np.float64(0.0)
        hit = False
        for t in score_terms:
            c = tf[d].get(t)
            if c:
                hit = True
                s = s + scoring.idf(df[t], n) * scoring.u_factor(c, dl[d], avgdl)
        if not hit:
            continue
        ok = True
        for ph in parsed["phrases"]:
            m = len(ph)
            if not any(toks[d][j : j + m] == ph for j in range(len(toks[d]) - m + 1)):
                ok = False
                break
        for ph in parsed.get("excluded_phrases", []):
            m = len(ph)
            if any(toks[d][j : j + m] == ph for j in range(len(toks[d]) - m + 1)):
                ok = False
                break
        if ok and any(t in tf[d] for t in parsed["excluded"]):
            ok = False
        if ok:
            for col, val in parsed["filters"].items():
                if str(meta[d][col]) != val:
                    ok = False
                    break
        if ok:
            ids.append(d)
            scores.append(float(s))
    if not ids:
        return []
    return rank_topk(np.array(ids), np.array(scores, dtype=np.float64), k)


def _random_query(rng) -> str:
    parts = []
    for _ in range(int(rng.integers(1, 4))):
        parts.append(VOCAB[int(rng.integers(len(VOCAB)))])
    if rng.random() < 0.5:
        a, b = rng.integers(len(VOCAB), size=2)
        parts.append(f'"{VOCAB[int(a)]} {VOCAB[int(b)]}"')
    if rng.random() < 0.4:
        parts.append("lang:" + LANGS[int(rng.integers(len(LANGS)))])
    if rng.random() < 0.4:
        parts.append("-" + VOCAB[int(rng.integers(len(VOCAB)))])
    if rng.random() < 0.3:
        a, b = rng.integers(len(VOCAB), size=2)
        parts.append(f'-"{VOCAB[int(a)]} {VOCAB[int(b)]}"')
    return " ".join(parts)


@pytest.mark.parametrize("seed", [3, 11])
def test_search_fuzz_vs_reference(seed, tmp_path):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(150):
        n = int(rng.integers(4, 30))
        words = [VOCAB[int(j)] for j in rng.integers(len(VOCAB), size=n)]
        rows.append(
            {
                "doc_id": 10 + i * 3,
                "text": " ".join(words),
                "lang": LANGS[int(rng.integers(len(LANGS)))],
            }
        )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, text_col="text", id_col="doc_id", num_parts=4)
    dm.ensure_docmeta(idx, src, ["lang"])
    s = LocalSearcher(idx)
    from cb import querylang

    n_nonempty = 0
    for _ in range(40):
        q = _random_query(rng)
        got = s.search(q, k=10)
        want = _reference_search(rows, querylang.parse(q), 10)
        assert got == want, (q, got[:3], want[:3])
        n_nonempty += bool(got)
    assert n_nonempty > 10  # the queries actually exercise matching
