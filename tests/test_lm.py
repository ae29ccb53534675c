"""Bigram-LM quality scoring: hand-computed probabilities, unk mapping,
NULL short docs, cross-batch count globality, oracle parity is covered
by test_oracle_parity[lm_quality_score]."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cb import analyze, lm


def _mk(docs, parts=1):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _brute(docs, min_count):
    toks = [analyze.tokenize(t) for t in docs]
    uni = {}
    for ts in toks:
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
    vocab = {t for t, c in uni.items() if c >= min_count}
    V = len(vocab) + 1
    def m(t):
        return t if t in vocab else lm.UNK
    muni = {}
    for ts in toks:
        for t in ts:
            muni[m(t)] = muni.get(m(t), 0) + 1
    big = {}
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            big[(m(a), m(b))] = big.get((m(a), m(b)), 0) + 1
    out = []
    for i, ts in enumerate(toks):
        n = max(len(ts) - 1, 0)
        if n == 0:
            out.append((i, 0, None))
            continue
        s = 0.0
        for a, b in zip(ts, ts[1:]):
            s += math.log((big[(m(a), m(b))] + 1.0) / (muni[m(a)] + V))
        out.append((i, n, round(s / n, 6)))
    return out


def _got(ds, min_count):
    t = lm.lm_quality_score(ds, min_count=min_count).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    return [
        (int(r.doc_id), int(r.n_bigrams),
         None if np.isnan(r.lm_score) else round(float(r.lm_score), 6))
        for r in t.itertuples()
    ]


def test_hand_corpus_matches_brute(ray_session):
    docs = [
        "red blue red blue red",
        "red blue green",
        "green green green green",
        "solo",          # 1 token -> NULL
        "",              # 0 tokens -> NULL
        "rare pair here",  # all rare -> unk bigrams
    ]
    assert _got(_mk(docs), 2) == _brute(docs, 2)


def test_cross_batch_counts_are_global(ray_session):
    # the same bigram split across blocks must count once per occurrence
    docs = ["alpha beta gamma"] * 6 + ["delta epsilon"] * 5 + ["alpha beta zeta"]
    got_1 = _got(_mk(docs, parts=1), 3)
    got_8 = _got(_mk(docs, parts=8), 3)
    assert got_1 == got_8 == _brute(docs, 3)


def test_repetitive_doc_scores_higher_than_random(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{c}" for c in "abcdefghijklmnop"]
    rand_docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(30)]
    rep = " ".join(["wa wb wc wd"] * 8)
    docs = rand_docs + [rep, rep, rep]
    res = dict((i, s) for i, _, s in _got(_mk(docs), 2))
    rep_score = res[len(docs) - 1]
    mean_rand = np.mean([res[i] for i in range(len(rand_docs))])
    # the repeated pattern's bigrams dominate the corpus -> high prob
    assert rep_score > mean_rand
