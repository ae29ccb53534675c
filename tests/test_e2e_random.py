"""Randomized end-to-end: random-text corpora (not the synthetic code
fixture) through the full Ray build, engine vs oracle rank+score
identity — stresses analyzer/build integration beyond curated inputs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import corpus as cm
from cb import query as qm
from cb import shard as sm
from cb.build import build_index

ALPHA = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-. \n\t(){}[]#/*=+")


def _random_corpus(seed: int, n_docs: int) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n_docs):
        length = int(rng.integers(0, 400))
        content = "".join(
            ALPHA[int(j)] for j in rng.integers(0, len(ALPHA), length)
        )
        rows.append(
            {
                "repo": f"r{i % 4}",
                "path": f"p/{i}",
                "commit": f"{seed}-{i}",
                "lang": "python",
                "content": content,
            }
        )
    return pa.Table.from_pylist(rows)


@pytest.mark.parametrize("seed", [7, 1234, 999983])
def test_random_corpus_engine_matches_oracle(seed, tmp_path):
    tbl = _random_corpus(seed, 120)
    pq.write_table(tbl, str(tmp_path / "c.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "c.parquet"), idx, num_parts=4, range_bits=3)
    wid = cm.with_identity(tbl)
    oracle = qm.Oracle(wid["doc_id"].to_pylist(), wid["content"].to_pylist())
    s = sm.LocalSearcher(idx)
    # queries drawn from the corpus's own vocabulary + misses
    vocab = sorted(oracle.df.keys())
    rng = np.random.Generator(np.random.PCG64(seed ^ 0xBEEF))
    queries = ["nosuchtokenever"]
    for _ in range(12):
        m = int(rng.integers(1, 4))
        qs = [vocab[int(j)] for j in rng.integers(0, len(vocab), m)] if vocab else []
        queries.append(" ".join(qs))
    for q in queries:
        for k in (1, 7, 25):
            want = oracle.topk(q, k)
            assert s.query(q, k, algo="taat") == want, (seed, q, k)
            assert s.query(q, k, algo="wand") == want, (seed, q, k)
