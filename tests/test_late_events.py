"""Late-data / lag metrics (W3) + build observability counters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from cb import windows


def _synthetic_stream(n=5000, seed=3, swap_frac=0.1):
    """Event times mostly increasing in arrival order, with a fraction
    arriving late (their ts pulled back behind earlier arrivals)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    base = np.datetime64("2024-01-01", "us")
    ts = base + np.cumsum(rng.integers(1, 60_000_000, size=n)).astype("timedelta64[us]")
    late_idx = rng.choice(np.arange(1, n), size=int(n * swap_frac), replace=False)
    ts[late_idx] -= np.timedelta64(120_000_000, "us") * rng.integers(1, 5, size=len(late_idx))
    types = rng.choice(["click", "view", "buy"], size=n)
    return pd.DataFrame({"event_id": np.arange(n), "ts": ts, "event_type": types})


def _reference(df, grace_us=0):
    df = df.sort_values("event_id")
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    wm = np.empty(len(ts), dtype=np.int64)
    run = np.iinfo(np.int64).min // 4
    for i in range(len(ts)):
        wm[i] = run
        run = max(run, ts[i])
    lag = wm - grace_us - ts
    late = (wm > np.iinfo(np.int64).min // 4) & (lag > 0)
    out = {}
    for t in sorted(set(df["event_type"])):
        m = (df["event_type"] == t).to_numpy()
        out[t] = (
            int(m.sum()),
            int((late & m).sum()),
            int(np.where(late & m, lag, 0).max(initial=0)),
        )
    return out


@pytest.mark.parametrize("grace_s", [0.0, 90.0])
def test_late_event_metrics_matches_reference(grace_s):
    df = _synthetic_stream()
    ds = ray.data.from_pandas(df).repartition(8)
    got = windows.late_event_metrics(
        ds, grace_seconds=grace_s, bucket_span=512
    ).to_pylist()
    ref = _reference(df, grace_us=int(grace_s * 1e6))
    got_map = {r["event_type"]: (r["n_events"], r["n_late"], r["max_lag_us"]) for r in got}
    assert got_map == ref
    assert sum(v[1] for v in ref.values()) > 0  # the stream really is out of order


def test_late_event_metrics_in_order_stream_zero_late():
    df = _synthetic_stream(swap_frac=0.0)
    ds = ray.data.from_pandas(df).repartition(4)
    got = windows.late_event_metrics(ds, bucket_span=700).to_pylist()
    assert all(r["n_late"] == 0 and r["max_lag_us"] == 0 for r in got)
    assert sum(r["n_events"] for r in got) == len(df)


def test_late_event_metrics_empty_stream():
    df = _synthetic_stream(n=5).iloc[0:0]
    ds = ray.data.from_pandas(df)
    got = windows.late_event_metrics(ds)
    assert got.num_rows == 0
    assert got.schema.names == ["event_type", "n_events", "n_late", "max_lag_us"]


def test_build_metrics_counters(tmp_path):
    import pyarrow.parquet as pq

    from cb import corpus as cm
    from cb.build import build_index

    tbl = cm.with_identity(cm.generate_corpus(60, seed=9))
    docs = pa.table({"doc_id": tbl["doc_id"], "text": tbl["content"]})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    meta = build_index(src, idx, text_col="text", id_col="doc_id", num_parts=4)
    m = meta.build_metrics()
    assert m["n_docs"] == 60
    assert m["partitions_done"] == len(m["partitions"]) > 0
    assert m["n_rows"] >= m["n_postings"] * 0  # present
    # postings counter agrees with the actual files
    total = 0
    for p in range(meta.num_parts):
        from cb.build import read_partition_table

        t = read_partition_table(idx, p)
        if t.num_rows:
            total += int(pa.compute.sum(t["df"]).as_py() or 0)
    assert m["n_postings"] == total
