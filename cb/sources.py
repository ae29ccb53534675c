"""Source readers beyond Parquet.

S2 parity — the reference's ``SqlShardKeyQuery`` (/root/reference/src/
ConveyorBelt.Tooling/Querying/SqlShardKeyQuery.cs:17-78) reads one
shard's rows with ``SELECT * WHERE shardField = value``; here that is
``ray.data.read_sql`` against any DB-API connection (DuckDB used in
tests), with the shard predicate pushed into the query.

S1 parity — the point-partition table read — is
``read_parquet(columns=..., filter=...)`` via :mod:`cb.filters`.
"""

from __future__ import annotations

import ray.data


def read_sql_shard(
    query_or_table: str,
    connection_factory,
    *,
    shard_field: str | None = None,
    shard_value=None,
) -> ray.data.Dataset:
    """Read rows of one shard from a SQL source.

    ``connection_factory`` -> a DB-API connection (e.g.
    ``lambda: duckdb.connect(path, read_only=True)``).  If
    ``shard_field`` is given, ``query_or_table`` is treated as a table
    name and the shard predicate is pushed into the SQL; otherwise it is
    used as a full query verbatim.
    """
    if shard_field is not None:
        # escape embedded quotes: external shard values must not be able
        # to alter the query shape (SQL-literal injection guard)
        if isinstance(shard_value, str):
            lit = "'" + shard_value.replace("'", "''") + "'"
        elif isinstance(shard_value, (int, float)):
            lit = repr(shard_value)
        else:
            raise TypeError(f"unsupported shard_value type: {type(shard_value)}")
        ident = str(shard_field).replace('"', '""')
        sql = f'SELECT * FROM {query_or_table} WHERE "{ident}" = {lit}'
    else:
        sql = query_or_table
    return ray.data.read_sql(sql, connection_factory)
