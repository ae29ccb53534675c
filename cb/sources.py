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


def read_minute_shards(
    table: str,
    connection_factory,
    *,
    shard_field: str,
    last_offset_iso: str | None,
    strategy: str = "minute",
    grace_minutes: int = 3,
    max_items: int | None = None,
    now=None,
) -> tuple["ray.data.Dataset | None", str]:
    """The scheduler->reader loop in one call (the reference's
    MinuteTableShardScheduler emitting ShardKeyArrived events consumed
    by ShardKeyActor, Scheduling/MinuteTableShardScheduler.cs:20-47 +
    Actors/ShardKeyActor.cs): enumerate every due minute's shard keys
    since ``last_offset_iso`` (grace-window + max-items semantics from
    :func:`cb.shardkeys.minute_schedule`), read all of them as ONE
    union Dataset (one pushed-down SQL read per key — keys are
    point-partition predicates, so each read touches one shard), and
    return the new offset to persist.  Returns ``(None, offset)`` when
    nothing is due."""
    from . import shardkeys

    events, new_offset = shardkeys.minute_schedule(
        last_offset_iso, grace_minutes=grace_minutes, max_items=max_items,
        strategy=strategy, now=now,
    )
    keys = [k for e in events for k in e["shard_keys"]]
    if not keys:
        return None, new_offset
    parts = [
        read_sql_shard(
            table, connection_factory, shard_field=shard_field, shard_value=k
        )
        for k in keys
    ]
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return ds, new_offset
