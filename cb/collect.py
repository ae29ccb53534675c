"""Driver-side collection of RESULT-SIZED datasets into one Arrow table.

``Dataset.to_arrow_refs`` hands back raw block refs — zero-copy for
Arrow blocks, but pandas-backed blocks (produced by some groupby /
map_groups paths, especially empty ones) pass through UNCONVERTED, and
an all-empty dataset yields blocks with no usable schema.  This is the
single shared collector handling both; never call it on corpus-sized
data.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def collect_table(ds: ray.data.Dataset, schema: pa.Schema | None = None) -> pa.Table:
    """Dataset -> one pa.Table via block refs.  ``schema`` (if given)
    is applied with cast and used for the zero-row case; without it an
    all-empty dataset collapses to a zero-column table."""
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
        for b in ray.get(ds.to_arrow_refs())
    ]
    non_empty = [t for t in tables if t.num_rows]
    if not non_empty:
        if schema is not None:
            return pa.Table.from_pylist([], schema=schema)
        return tables[0] if tables else pa.table({})
    out = pa.concat_tables(non_empty, promote_options="default").combine_chunks()
    return out.cast(schema) if schema is not None else out
