"""Randomized query-string cross-check: engine search vs a pure-Python
reference over random corpora and generated queries mixing every clause
type (terms, phrases, filters, exclusions, boosts, +required,
wildcards, fuzzy, numeric ranges)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from cb import analyze, docmeta as dm, querylang, scoring
from cb.build import build_index
from cb.query import rank_topk
from cb.shard import LocalSearcher

VOCAB = [
    "alpha", "beta", "gamma", "delta", "join", "merge", "sort", "hash",
    "table", "scan", "window", "frame", "stream", "batch", "zebra",
]
LANGS = ["en", "fr", "de"]


def _reference_search(rows, parsed, k):
    """Sequential spec: boost-weighted BM25 over scored terms
    (sorted-term summation, weight applied to idf first), membership =
    any scored term AND every phrase AND every required term AND no
    excluded term AND metadata filters (equality + ranges)."""
    toks = {r["doc_id"]: analyze.tokenize(r["text"]) for r in rows}
    tf = {d: Counter(t) for d, t in toks.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(rows)
    avgdl = sum(dl.values()) / n if n else 0.0
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    parsed = querylang.expand(parsed, sorted(df))
    weights = parsed["weights"]
    meta = {r["doc_id"]: r for r in rows}
    ids, scores = [], []
    for r in rows:
        d = r["doc_id"]
        s = np.float64(0.0)
        hit = False
        for t in sorted(weights):
            c = tf[d].get(t)
            if c:
                hit = True
                iw = float(scoring.idf(df[t], n)) * weights[t]
                s = s + iw * scoring.u_factor(c, dl[d], avgdl)
        if not hit:
            continue
        ok = all(t in tf[d] for t in parsed["required"])
        if ok:
            for ph in parsed["phrases"]:
                m = len(ph)
                if not any(toks[d][j : j + m] == ph for j in range(len(toks[d]) - m + 1)):
                    ok = False
                    break
        if ok:
            for ph in parsed.get("excluded_phrases", []):
                m = len(ph)
                if any(toks[d][j : j + m] == ph for j in range(len(toks[d]) - m + 1)):
                    ok = False
                    break
        if ok and any(t in tf[d] for t in parsed["excluded"]):
            ok = False
        if ok:
            for col, val in parsed["filters"].items():
                v = meta[d][col]
                if isinstance(val, querylang.Range):
                    if val.lo is not None and not (
                        float(v) >= float(val.lo) if val.lo_incl else float(v) > float(val.lo)
                    ):
                        ok = False
                        break
                    if val.hi is not None and not (
                        float(v) <= float(val.hi) if val.hi_incl else float(v) < float(val.hi)
                    ):
                        ok = False
                        break
                elif str(v) != val:
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
        w = VOCAB[int(rng.integers(len(VOCAB)))]
        r = rng.random()
        if r < 0.15:
            w = f"{w}^{int(rng.integers(2, 5))}"
        elif r < 0.3:
            w = "+" + w
        elif r < 0.45:
            cut = int(rng.integers(2, max(3, len(w))))
            w = w[:cut] + "*"
        elif r < 0.6:
            w = w + ("~" if rng.random() < 0.5 else f"~{int(rng.integers(1, 3))}")
        parts.append(w)
    if rng.random() < 0.5:
        a, b = rng.integers(len(VOCAB), size=2)
        ph = f'"{VOCAB[int(a)]} {VOCAB[int(b)]}"'
        if rng.random() < 0.3:
            ph += f"^{int(rng.integers(2, 4))}"
        parts.append(ph)
    if rng.random() < 0.4:
        parts.append("lang:" + LANGS[int(rng.integers(len(LANGS)))])
    if rng.random() < 0.35:
        a, b = sorted(rng.integers(4, 30, size=2))
        style = rng.random()
        if style < 0.4:
            lb = "[" if rng.random() < 0.5 else "{"
            rb = "]" if rng.random() < 0.5 else "}"
            parts.append(f"size:{lb}{a} TO {b}{rb}")
        elif style < 0.7:
            parts.append(f"size:>={a}")
        else:
            parts.append(f"size:<{b}")
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
                "size": n,
            }
        )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, text_col="text", id_col="doc_id", num_parts=4)
    dm.ensure_docmeta(idx, src, ["lang", "size"])
    s = LocalSearcher(idx)

    n_nonempty = 0
    n_v2 = 0
    for _ in range(60):
        q = _random_query(rng)
        got = s.search(q, k=10)
        want = _reference_search(rows, querylang.parse(q), 10)
        assert got == want, (q, got[:3], want[:3])
        n_nonempty += bool(got)
        n_v2 += any(c in q for c in "^+*~[{<>")
    assert n_nonempty > 15  # the queries actually exercise matching
    assert n_v2 > 15  # and the v2 syntax actually appears
