"""Join operators, Ray-Data-first.

The reference has no relational join (SURVEY.md §2.5); its closest
analog is embedding small config/dimension data into every work item
(DiagnosticsSource.ToSummary, Configuration/DiagnosticsSource.cs:166-186)
— i.e. a broadcast.  The engine exposes that as a first-class operator:

- :func:`broadcast_join` — small side ``ray.put`` once, pandas-merge
  per batch inside ``map_batches``; no shuffle, the canonical pattern
  for dimension tables at any scale.
- For large-large joins the engine's pattern is the bucketed hash join
  (add ``bucket = hash(key) % B`` to both sides, groupby bucket, merge
  within groups) — exercised by the dedup candidate-pair pipelines; a
  general wrapper is deliberately not provided until a workload needs
  it (no speculative API surface).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    *,
    on: str,
    how: str = "inner",
    small_prefix: str = "",
) -> ray.data.Dataset:
    """Join a Dataset against a small in-memory table (broadcast once).

    ``small`` is placed in the object store a single time; every task
    reads the same shared copy (zero-copy for numeric columns).
    """
    small_df = small.to_pandas()
    if small_prefix:
        small_df = small_df.rename(
            columns={c: f"{small_prefix}{c}" for c in small_df.columns if c != on}
        )
    ref = ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        side = ray.get(ref)
        return batch.merge(side, on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")
