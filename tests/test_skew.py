"""Skew stress: a corpus where one term appears in EVERY document (the
'import'-at-scale case the salted merge exists for)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import corpus as cm
from cb import query as qm
from cb import shard as sm
from cb.build import build_index


@pytest.fixture(scope="module")
def skewed(tmp_path_factory):
    rng = np.random.Generator(np.random.PCG64(99))
    rows = []
    for i in range(400):
        # 'omnipresent' in every doc, many times; a few rare terms
        body = "omnipresent " * int(rng.integers(5, 40))
        body += " ".join(f"rare{int(rng.integers(0, 200))}" for _ in range(10))
        rows.append(
            {
                "repo": f"org{i%3}/r{i%5}",
                "path": f"src/f_{i}.py",
                "commit": f"c{i:040d}"[:40],
                "lang": "python",
                "content": body,
            }
        )
    tbl = pa.Table.from_pylist(rows)
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(tbl, str(d / "c.parquet"))
    idx = str(tmp_path_factory.mktemp("skewidx"))
    meta = build_index(str(d / "c.parquet"), idx, num_parts=4, range_bits=4)
    wid = cm.with_identity(tbl)
    oracle = qm.Oracle(wid["doc_id"].to_pylist(), wid["content"].to_pylist())
    return idx, meta, oracle


def test_hot_term_chunk_bounds(skewed):
    idx, meta, oracle = skewed
    s = sm.LocalSearcher(idx)
    cp = s.get_postings("omnipresent")
    assert cp.df == 400  # every doc
    # uniform hash ids over 16 buckets: no chunk holds the whole list
    sizes = [c.df for c in cp.chunks]
    assert len(sizes) > 4
    assert max(sizes) < 400 * 0.5
    ids, tfs, dls = cp.decode_all()
    assert np.all(np.diff(ids) > 0)


def test_skewed_scoring_matches_oracle(skewed):
    idx, meta, oracle = skewed
    s = sm.LocalSearcher(idx)
    for q in ("omnipresent", "omnipresent rare7", "rare1 rare2 rare3", "omnipresent rare42 rare100"):
        for k in (1, 5, 20):
            want = oracle.topk(q, k)
            assert s.query(q, k, algo="taat") == want, (q, k)
            assert s.query(q, k, algo="wand") == want, (q, k)
