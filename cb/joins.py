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
- :func:`asof_join` — large-large temporal as-of join (for each left
  row, the latest right row at-or-before it per key): both sides
  hash-co-partitioned by the ``by`` key in ONE shuffle, then each
  bucket merged with a vectorized sorted merge.  Partitioning
  assumption: ``by`` has enough distinct values to spread over
  ``num_buckets`` and no single key's rows exceed a worker's heap.
- :func:`interval_join` — stream × small interval table (range join):
  the interval side is broadcast (``ray.put`` once) and each batch is
  matched with one vectorized comparison — no shuffle.  For
  large-large range joins, bucket both sides by coarse value range
  first and apply the same kernel per bucket.
"""

from __future__ import annotations

import numpy as np
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


def _key_bucket_array(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Deterministic hash bucket per key value, vectorized.

    Integer keys use a multiplicative hash directly; string keys are
    dictionary-encoded first so the (slow) per-string hash runs once
    per DISTINCT value in the batch, then broadcast to rows by code.
    """
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    per_uniq = np.array(
        [zlib.crc32(str(u).encode()) % num_buckets for u in uniq], dtype=np.int32
    )
    codes = enc.indices.to_numpy(zero_copy_only=False)
    return pa.array(per_uniq[codes], pa.int32())


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema for a Dataset whose blocks may be pandas-backed
    (``from_pandas`` inputs): Ray's Schema wrapper then exposes numpy
    dtypes / raw Python classes instead of a ``pa.Schema``."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    s = ds.schema()
    fields = []
    for name, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((name, t))
        elif getattr(t, "__module__", "").startswith("ray.data"):
            # ray.data.datatype.DataType wrapper
            fields.append((name, t.to_arrow_dtype() if hasattr(t, "to_arrow_dtype") else pa.string()))
        elif isinstance(t, type):  # object dtype -> assume string
            fields.append((name, pa.string()))
        else:
            fields.append((name, pa.from_numpy_dtype(t)))
    return pa.schema(fields)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: str,
    direction: str = "backward",
    how: str = "inner",
    tolerance=None,
    right_suffix: str = "_r",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Temporal as-of join: for each left row, the single nearest right
    row per ``by`` key (latest at-or-before for ``direction="backward"``,
    earliest at-or-after for ``"forward"``, closest for ``"nearest"``).

    The operator Ray Data lacks (SURVEY.md custom-op case): implemented
    as a composition — both sides are tagged, schema-aligned and
    hash-co-partitioned by ``by`` (ONE all-to-all exchange for the two
    inputs together), then each bucket is merged with pandas
    ``merge_asof`` (a C sorted-merge, no Python row loop).  Bucket
    count bounds group size: a bucket holds ~(|L|+|R|)/num_buckets
    rows, so size ``num_buckets`` to the cluster, not the data.

    ``how="inner"`` drops unmatched left rows; ``how="left"`` keeps
    them (right integer columns become nullable Int64 so the output
    schema is identical whether or not a bucket had matches).
    Right-side columns colliding with left names get ``right_suffix``.
    """
    import pandas as pd

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = list(lschema.names)
    rename = {
        c: (f"{c}{right_suffix}" if c in lcols and c not in (on, by) else c)
        for c in rschema.names
    }
    rcols_out = [rename[c] for c in rschema.names if c not in (on, by)]
    out_cols = lcols + rcols_out
    rtypes = {rename[c]: rschema.field(c).type for c in rschema.names}
    ltypes = {c: lschema.field(c).type for c in lcols}

    def _normalize(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns([rename[c] for c in batch.column_names])
            cols, names = [], []
            for c in out_cols:
                names.append(c)
                if c in batch.column_names:
                    cols.append(batch[c])
                else:
                    typ = rtypes.get(c, ltypes.get(c))
                    cols.append(pa.nulls(batch.num_rows, typ))
            names.append("__side")
            cols.append(pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
            names.append("__bucket")
            cols.append(_key_bucket_array(batch[by], num_buckets))
            return pa.table(dict(zip(names, cols)))

        return fn

    combined = left.map_batches(
        _normalize(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(_normalize(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    left_only = [c for c in lcols if c not in (on, by)]

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        is_left = group["__side"].to_numpy() == 0
        l = group.loc[is_left, lcols].sort_values(on, kind="mergesort")
        r = group.loc[~is_left, [on, by] + rcols_out].sort_values(on, kind="mergesort")
        r = r.assign(__matched=True)
        if how == "left":
            for c in rcols_out:
                if pd.api.types.is_integer_dtype(r[c]):
                    r[c] = r[c].astype("Int64")
        m = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, tolerance=tolerance
        )
        if how == "inner":
            m = m[m["__matched"].notna()]
        m = m.drop(columns=["__matched"])[out_cols].reset_index(drop=True)
        # the union writes nulls into the other side's columns, so pandas
        # upcasts (int64 -> float64 etc.) inside the group; restore the
        # source dtypes wherever no null survived the merge
        for c in out_cols:
            if how == "left" and c in rcols_out:
                continue
            want = (ltypes.get(c) or rtypes[c]).to_pandas_dtype()
            if m[c].dtype != want and not m[c].isna().any():
                m[c] = m[c].astype(want)
        return m

    return combined.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def interval_join(
    ds: ray.data.Dataset,
    intervals: pa.Table,
    *,
    on: str,
    lo: str = "lo",
    hi: str = "hi",
    closed: str = "left",
    interval_prefix: str = "",
) -> ray.data.Dataset:
    """Range join of a stream against a SMALL interval table: each
    input row is matched to every interval containing ``row[on]``
    (overlapping intervals emit one output row per match).

    The interval side is broadcast once (``ray.put``); each batch does
    ONE vectorized (rows x intervals) comparison and a ``take`` — no
    shuffle, no Python row loop.  Memory per batch is
    ``len(batch) * len(intervals)`` bools, so this path is for interval
    tables up to a few thousand rows; beyond that, bucket both sides by
    coarse range and apply the same kernel per bucket (the dedup
    pipelines' bucketed-shuffle pattern).
    """
    if closed not in ("left", "both", "right", "neither"):
        raise ValueError(f"bad closed {closed!r}")
    if intervals.num_rows > 4096:
        raise ValueError(
            f"interval side has {intervals.num_rows} rows; broadcast path caps at "
            "4096 — bucket by coarse range instead"
        )
    icols = [c for c in intervals.column_names if c not in (lo, hi)]
    ivals = intervals.combine_chunks()
    ref = ray.put(
        (
            ivals.select(icols),
            ivals[lo].to_numpy(zero_copy_only=False),
            ivals[hi].to_numpy(zero_copy_only=False),
        )
    )

    def match(batch: pa.Table) -> pa.Table:
        side, los, his = ray.get(ref)
        x = batch[on].to_numpy(zero_copy_only=False)
        ge = x[:, None] >= los[None, :] if closed in ("left", "both") else x[:, None] > los[None, :]
        le = x[:, None] <= his[None, :] if closed in ("right", "both") else x[:, None] < his[None, :]
        row_idx, int_idx = np.nonzero(ge & le)
        out = batch.take(pa.array(row_idx, pa.int64()))
        taken = pa.array(int_idx, pa.int64())
        for c in side.column_names:
            out = out.append_column(f"{interval_prefix}{c}", side[c].take(taken))
        return out

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
