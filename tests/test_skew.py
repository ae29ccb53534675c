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


def test_sessionize_hot_key_cross_batch_merge(ray_session):
    """Two-phase sessionize: one user owns 60% of the events and every
    session straddles batch boundaries (batch_size much smaller than
    the key's event count).  Compare against a single-pass in-memory
    reference."""
    import pandas as pd
    import ray

    from cb.windows import sessionize

    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    t0 = np.datetime64("2024-01-01T00:00:00")
    for uid, n in ((1, 600), (2, 250), (3, 150)):
        t = t0 + np.timedelta64(int(rng.integers(0, 3600)), "s")
        for _ in range(n):
            # within-session steps (<gap) with occasional session breaks
            step = int(rng.integers(1, 60)) if rng.random() > 0.05 else int(
                rng.integers(2000, 9000)
            )
            t = t + np.timedelta64(step, "s")
            rows.append({"user_id": uid, "ts": t, "value": float(rng.integers(1, 9))})
    rng.shuffle(rows)  # arrival order is not time order
    df = pd.DataFrame(rows)

    def reference(df, gap=1800):
        out = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values("ts")
            ts = g["ts"].to_numpy()
            new = np.ones(len(g), dtype=bool)
            new[1:] = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s") > gap
            sess = np.cumsum(new)
            for _, s in g.assign(s=sess).groupby("s"):
                out.append(
                    (uid, s["ts"].min(), s["ts"].max(), len(s), s["value"].sum())
                )
        return sorted(out)

    ds = ray.data.from_pandas(df)
    got = sessionize(ds, gap_seconds=1800, batch_size=64).to_pandas()
    got_t = sorted(
        (r.user_id, np.datetime64(r.session_start), np.datetime64(r.session_end),
         int(r.n_events), float(r.sum_value))
        for r in got.itertuples()
    )
    assert got_t == reference(df)
