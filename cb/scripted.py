"""Scripted metric aggregation — the ES ``scripted_metric`` agg: a
user-supplied (map, reduce) pair runs a custom metric the engine has no
builtin for, with the engine supplying the distribution.

ES's contract is init/map per doc, combine per shard, reduce on the
coordinator.  The Ray-Data-native contract collapses init+map+combine
into ONE vectorized ``map_batch`` (a batch IS the shard-local slice; a
per-doc Python map_script would be a row loop — the exact anti-pattern
this repo bans), keeping the two real distribution points:

- ``map_batch(batch: pa.Table) -> pa.Table`` — batch -> SMALL partial
  state rows (keyed or global).  Runs distributed, vectorized.
- ``reduce(states: pa.Table) -> pa.Table`` — all partials -> final
  rows.  Runs once; input is O(groups x batches), never corpus-sized.

Scripts are plain objects registered under the ``metric_script``
registry kind (the reference's reflection-on-config-string extension
surface, Internal/FactoryHelper.cs:12-30), so a pipeline config names
its metric by string exactly like parsers/decoders/analyzers.

Exactness discipline for oracle-able scripts: keep partial states in
int64 (sums/counts/maxes fold exactly in any order) and spend floats
only in ``reduce`` as single correctly-rounded divisions — the built-in
``block_usage`` script below is bitwise vs its SQL mirror at every sf.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from . import registry


def scripted_metric(ds: ray.data.Dataset, script) -> pa.Table:
    """Run a metric script (object or registered name) over a Dataset:
    distributed vectorized partials, one driver reduce over the small
    state table."""
    if isinstance(script, str):
        script = registry.lookup("metric_script", script)
    parts = ds.map_batches(script.map_batch, batch_format="pyarrow")
    blocks = list(parts.iter_batches(batch_format="pyarrow"))
    states = (
        pa.concat_tables(blocks) if blocks else script.map_batch(pa.table({}))
    )
    return script.reduce(states)


class BlockUsageScript:
    """Per-``group_col`` storage-accounting metric no builtin covers:
    docs are charged in ``block`` - byte blocks (size rounded UP), the
    metric is total blocks, the largest single doc's blocks, and mean
    blocks per doc.  States are exact int64; the one float is a single
    division in reduce."""

    def __init__(self, group_col: str = "source", size_col: str = "n_chars",
                 block: int = 512):
        self.group_col = group_col
        self.size_col = size_col
        self.block = block

    def map_batch(self, batch: pa.Table) -> pa.Table:
        g = self.group_col
        if batch.num_rows == 0:
            return pa.table(
                {g: pa.array([], pa.string()),
                 "blocks": pa.array([], pa.int64()),
                 "max_blocks": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        size = batch[self.size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blocks = (size + self.block - 1) // self.block
        t = pa.table(
            {g: batch[g], "blocks": blocks, "mb": blocks,
             "one": np.ones(len(blocks), np.int64)}
        )
        agg = t.group_by(g).aggregate(
            [("blocks", "sum"), ("mb", "max"), ("one", "sum")]
        )
        return agg.rename_columns([g, "blocks", "max_blocks", "n"])

    def reduce(self, states: pa.Table) -> pa.Table:
        g = self.group_col
        if states.num_rows == 0:
            return pa.table(
                {g: pa.array([], pa.string()),
                 "total_blocks": pa.array([], pa.int64()),
                 "max_blocks": pa.array([], pa.int64()),
                 "avg_blocks": pa.array([], pa.float64())}
            )
        agg = states.group_by(g).aggregate(
            [("blocks", "sum"), ("max_blocks", "max"), ("n", "sum")]
        )
        agg = agg.rename_columns([g, "total_blocks", "max_blocks", "n"])
        tot = agg["total_blocks"].to_numpy(zero_copy_only=False)
        n = agg["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(np.array(agg[g].to_pylist()))
        return pa.table(
            {
                g: pa.array(np.array(agg[g].to_pylist())[order].tolist(), pa.string()),
                "total_blocks": pa.array(tot[order], pa.int64()),
                "max_blocks": pa.array(
                    agg["max_blocks"].to_numpy(zero_copy_only=False)[order], pa.int64()
                ),
                "avg_blocks": pa.array(tot[order] / n[order], pa.float64()),
            }
        )


registry.register("metric_script", "block_usage", BlockUsageScript())
