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
) -> ray.data.Dataset:
    """Gap-based session windows per key.

    -> (key, session_start, session_end, n_events, sum_value): a new
    session begins when the gap to the previous event of the same key
    exceeds ``gap_seconds``.  The groupby is the only shuffle; the
    window logic runs vectorized per sorted group.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        if len(g) > 1:
            deltas = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
            gap[1:] = deltas > gap_seconds
        sess = np.cumsum(gap)
        out = (
            g.assign(_sess=sess)
            .groupby("_sess", sort=True)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
                sum_value=(value_col, "sum"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


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
