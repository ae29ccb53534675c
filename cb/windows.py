"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time runtime (SURVEY.md §2.10): windows are
expressed as ``groupby(key).map_groups`` over ts-sorted groups — the
reference's minute-shard semantics (MinuteTableShardScheduler.cs:29-45)
and watermark/grace bookkeeping (W2) become partition-completeness in
manifests, not wall-clock waits.

Ordering assumption: within one key group, rows are sorted by ``ts``
inside the group function (pandas sort), so input block order never
matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def tumbling_window(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "minute",
) -> ray.data.Dataset:
    """Tumbling time window + key -> count/sum (pre-aggregated per batch)."""
    import pyarrow.compute as pc

    def partial_agg(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        t = pa.table({"window": w, key_col: batch[key_col], value_col: batch[value_col]})
        return (
            t.group_by(["window", key_col])
            .aggregate([(value_col, "sum"), ([], "count_all")])
            .rename_columns(["window", key_col, "value_sum", "n"])
        )

    pre = ds.map_batches(partial_agg, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby(["window", key_col]).aggregate(
        Sum("value_sum", alias_name="sum_value"), Sum("n", alias_name="n_events")
    )


def sessionize(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Gap-based session windows per key.

    -> (key, session_start, session_end, n_events, sum_value): a new
    session begins when the gap to the previous event of the same key
    exceeds ``gap_seconds``.

    TWO-PHASE: gap-based sessions are MERGEABLE (the session relation
    is the transitive closure of "within gap", so sessionizing disjoint
    event subsets and then gap-merging the resulting intervals — with a
    running max of session ends, since partial intervals may overlap —
    yields exactly the sessions of the union).  Phase 1 sessionizes
    each batch vectorized across ALL its keys (one sort per batch, no
    per-key Python); the groupby then moves partial SESSIONS, not
    events, and the per-key merge group is bounded by the key's partial
    session count — a hot key (one user = 20% of the log) shrinks by
    its within-batch sessionization factor before the shuffle.
    """

    def batch_sessions(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    key_col: df[key_col],
                    "session_start": df[ts_col],
                    "session_end": df[ts_col],
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_value": df[value_col],
                }
            )
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        ts = df[ts_col].to_numpy()
        keys = df[key_col].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        if len(df) > 1:
            deltas = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
            new[1:] = (keys[1:] != keys[:-1]) | (deltas > gap_seconds)
        sess = np.cumsum(new)
        out = (
            df.assign(_sess=sess)
            .groupby("_sess", sort=True)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                    "n_events": (ts_col, "size"),
                    "sum_value": (value_col, "sum"),
                }
            )
            .reset_index(drop=True)
        )
        return out

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["session_start", "session_end"], kind="mergesort")
        start = g["session_start"].to_numpy()
        end = g["session_end"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        if len(g) > 1:
            run_end = np.maximum.accumulate(end)[:-1]
            new[1:] = (start[1:] - run_end) / np.timedelta64(1, "s") > gap_seconds
        sess = np.cumsum(new)
        out = (
            g.assign(_sess=sess)
            .groupby("_sess", sort=True)
            .agg(
                session_start=("session_start", "min"),
                session_end=("session_end", "max"),
                n_events=("n_events", "sum"),
                sum_value=("sum_value", "sum"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    partials = ds.map_batches(batch_sessions, batch_format="pandas", batch_size=batch_size)
    return partials.groupby(key_col).map_groups(merge_key, batch_format="pandas")


def late_event_metrics(
    ds: ray.data.Dataset,
    *,
    grace_seconds: float = 0.0,
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket_span: int = 4096,
) -> pa.Table:
    """Late-data / lag metrics (W3 parity — the reference's ShardKeyActor
    tracks per-shard-key delay, /root/reference/src/ConveyorBelt.Tooling/
    Actors/ShardKeyActor.cs:74-84).

    The stream's processing order is ``arrival_col``; the watermark at
    each event is the max event-time of everything that arrived STRICTLY
    before it, minus ``grace_seconds``.  An event is late when its
    event-time is below that watermark; its lag is (watermark - ts).
    -> (key, n_events, n_late, max_lag_us) per key.

    Distributed as a two-pass prefix max: arrival ids are bucketed
    (``arrival // bucket_span``); pass A computes each bucket's max ts
    (tiny aggregate), the driver forms the exclusive prefix max over
    bucket maxima (bucket-count-sized), pass B re-groups by bucket and
    runs the carry-in running max vectorized per group.  Nothing
    corpus-sized on the driver; two shuffles of the (pruned) event
    columns."""
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Max

    grace_us = int(round(grace_seconds * 1_000_000))
    NEG = np.iinfo(np.int64).min // 4  # "no watermark yet" sentinel

    def project(batch: pa.Table) -> pa.Table:
        arr = batch[arrival_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(arr // bucket_span, type=pa.int64()),
                "arrival": pa.array(arr, type=pa.int64()),
                "ts_us": pa.array(ts.astype("datetime64[us]").astype(np.int64), type=pa.int64()),
                key_col: batch[key_col],
            }
        )

    bucketed = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # pass A: per-bucket max ts -> driver-side exclusive prefix max (tiny)
    bmax = {
        r["bucket"]: r["max_ts"]
        for r in bucketed.groupby("bucket").aggregate(Max("ts_us", alias_name="max_ts")).take_all()
    }
    buckets_sorted = sorted(bmax)
    carry_in = {}
    running = NEG
    for b in buckets_sorted:
        carry_in[b] = running
        running = max(running, bmax[b])
    carry_ref = ray.put(carry_in)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        carry = ray.get(carry_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("arrival", kind="mergesort")
        ts = g["ts_us"].to_numpy()
        wm = np.maximum.accumulate(np.concatenate(([carry], ts)))[:-1]
        has_wm = wm > NEG
        lag = np.where(has_wm, wm - grace_us - ts, np.int64(0))
        late = has_wm & (lag > 0)
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "one": np.ones(len(g), dtype=np.int64),
                "is_late": late.astype(np.int64),
                "lag_us": np.where(late, lag, np.int64(0)),
            }
        )
        return (
            out.groupby(key_col, sort=True)
            .agg(n_events=("one", "sum"), n_late=("is_late", "sum"), max_lag_us=("lag_us", "max"))
            .reset_index()
        )

    agg = (
        bucketed.groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(key_col)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_late", alias_name="n_late"),
            Max("max_lag_us", alias_name="max_lag_us"),
        )
    )
    from .collect import collect_table

    return collect_table(
        agg,
        schema=pa.schema(
            [
                (key_col, pa.string()),
                ("n_events", pa.int64()),
                ("n_late", pa.int64()),
                ("max_lag_us", pa.int64()),
            ]
        ),
    )


def sql_late_event_metrics(
    table: str = "events",
    grace_seconds: float = 0.0,
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> str:
    """DuckDB mirror via an exclusive running max window."""
    grace_us = int(round(grace_seconds * 1_000_000))
    return f"""
WITH w AS (
  SELECT {key_col},
         epoch_us({ts_col}) AS ts_us,
         max(epoch_us({ts_col})) OVER (
           ORDER BY {arrival_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS wm_us
  FROM {table}
)
SELECT {key_col},
       count(*)::BIGINT AS n_events,
       coalesce(sum(CASE WHEN wm_us - {grace_us} - ts_us > 0 THEN 1 ELSE 0 END), 0)::BIGINT AS n_late,
       coalesce(max(CASE WHEN wm_us - {grace_us} - ts_us > 0
                         THEN wm_us - {grace_us} - ts_us ELSE 0 END), 0)::BIGINT AS max_lag_us
FROM w GROUP BY 1 ORDER BY 1
"""


def sql_sessionize(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> str:
    """DuckDB mirror: lag-gap flag -> cumulative session id -> aggregate."""
    return f"""
WITH flagged AS (
  SELECT {key_col}, {ts_col}, {value_col},
         CASE WHEN {ts_col} - lag({ts_col}) OVER w <= INTERVAL {gap_seconds} SECOND
              THEN 0 ELSE 1 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})
),
numbered AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
)
SELECT {key_col},
       min({ts_col}) AS session_start,
       max({ts_col}) AS session_end,
       count(*)::BIGINT AS n_events,
       round(sum({value_col}), 6) AS sum_value
FROM numbered GROUP BY {key_col}, sess
ORDER BY {key_col}, session_start
"""
