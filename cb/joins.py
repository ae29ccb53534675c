"""Join operators, Ray-Data-first.

The reference has no relational join (SURVEY.md §2.5); its closest
analog is embedding small config/dimension data into every work item
(DiagnosticsSource.ToSummary, Configuration/DiagnosticsSource.cs:166-186)
— i.e. a broadcast.  The engine exposes that as a first-class operator:

- :func:`broadcast_join` — small side ``ray.put`` once, vectorized
  Arrow ``index_in`` + ``take`` per batch inside ``map_batches``; no
  shuffle, no pandas round-trip, the canonical pattern for dimension
  tables at any scale.
- :func:`hash_join` — large-large joins via Ray Data's native hash
  join: both sides shuffle by key into ``num_partitions`` aggregators
  (one all-to-all exchange).  Partitioning assumption: the join key
  hashes evenly; a skewed key needs salting upstream.  The bucketed
  form of the same idea (explicit ``hash(key) % B`` groupby) is what
  the dedup candidate-pair pipelines use.
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


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
) -> ray.data.Dataset:
    """Large-large join of two fact tables (one key-hash shuffle per
    side).  Use :func:`broadcast_join` whenever one side fits in the
    object store — it avoids the exchange entirely.  ``num_partitions``
    sizes the aggregator pool: pick so each partition's share of BOTH
    sides fits a worker's heap (~rows/num_partitions per side)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
