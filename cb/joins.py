"""Join operators, Ray-Data-first.

The reference has no relational join (SURVEY.md §2.5); its closest
analog is embedding small config/dimension data into every work item
(DiagnosticsSource.ToSummary, Configuration/DiagnosticsSource.cs:166-186)
— i.e. a broadcast.  The engine exposes that as a first-class operator:

- :func:`broadcast_join` — small side ``ray.put`` once, vectorized
  Arrow ``index_in`` + ``take`` per batch inside ``map_batches``; no
  shuffle, no pandas round-trip, the canonical pattern for dimension
  tables at any scale.
- For large-large joins the engine's pattern is the bucketed hash join
  (add ``bucket = hash(key) % B`` to both sides, groupby bucket, merge
  within groups) — exercised by the dedup candidate-pair pipelines; a
  general wrapper is deliberately not provided until a workload needs
  it (no speculative API surface).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

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
    reads the same shared copy (zero-copy for numeric columns).  The
    per-batch probe is pure Arrow — ``index_in`` against the small key
    column, then ``take`` — preserving batch row order (left join order)
    with no pandas conversion.  Assumes UNIQUE keys on the small side
    (dimension-table contract; duplicate keys raise).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how!r}")
    if small_prefix:
        small = small.rename_columns(
            [c if c == on else f"{small_prefix}{c}" for c in small.column_names]
        )
    n_keys = len(pc.unique(small[on]))
    if n_keys != small.num_rows:
        raise ValueError(f"small side has duplicate keys on {on!r}")
    small = small.combine_chunks()
    ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        idx = pc.index_in(batch[on], value_set=side[on].chunk(0))
        if how == "inner":
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for name in side.column_names:
            if name == on:
                continue
            batch = batch.append_column(name, side[name].take(idx))
        return batch

    return ds.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)
