"""Plugin registries: config-string -> component.

The reference wires every extension point through reflection on config
strings — ``SchedulerType`` -> ISourceScheduler
(/root/reference/src/ConveyorBelt.Tooling/Scheduling/MasterScheduler.cs:131-141),
``DynamicProperties["Parser"]`` -> IParser (Internal/FactoryHelper.cs:12-30),
``ShardKeyQuery`` -> IShardKeyQuery (Actors/ShardKeyActor.cs:57-59).
Here the same capability is explicit registries (SURVEY.md §2.11): jobs
name components by string in config, and user code registers new ones.
"""

from __future__ import annotations

_REGISTRIES: dict[str, dict[str, object]] = {
    "analyzer": {},
    "parser": {},
    "source": {},
    "dedup": {},
    "decoder": {},
    "metric_script": {},
}


def register(kind: str, name: str, obj) -> None:
    if kind not in _REGISTRIES:
        raise KeyError(f"unknown registry kind {kind!r} (have {sorted(_REGISTRIES)})")
    _REGISTRIES[kind][name] = obj


def lookup(kind: str, name: str):
    reg = _REGISTRIES.get(kind)
    if reg is None:
        raise KeyError(f"unknown registry kind {kind!r}")
    try:
        return reg[name]
    except KeyError:
        raise KeyError(
            f"no {kind} named {name!r}; registered: {sorted(reg)}"
        ) from None


def names(kind: str) -> list[str]:
    return sorted(_REGISTRIES[kind])


def _register_builtins() -> None:
    from . import analyze, dedup, parsers

    register("analyzer", "code", analyze.tokenize)
    for pname, fn in parsers.PARSERS.items():
        register("parser", pname, fn)

    import ray.data

    register("source", "parquet", ray.data.read_parquet)
    register("source", "csv", ray.data.read_csv)
    register("source", "json", ray.data.read_json)
    register("source", "text", ray.data.read_text)
    register("source", "binary", ray.data.read_binary_files)

    from . import sources

    register("source", "sql", sources.read_sql_shard)
    register("source", "minute_shards", sources.read_minute_shards)

    from . import streaming

    register("source", "stream", streaming.StreamConsumer)

    from . import multimodal

    register("decoder", "fake", multimodal._fake_decode)
    try:  # real image decoder — only when an imaging library exists
        import PIL  # noqa: F401

        register("decoder", "pillow", multimodal.pillow_decode)
    except ImportError:
        pass

    register("dedup", "exact", dedup.exact_duplicates)
    register("dedup", "minhash", dedup.minhash_near_duplicates)
    register("dedup", "simhash", dedup.simhash_near_duplicates)
    register("dedup", "ngram_jaccard", dedup.ngram_jaccard_pairs)


_register_builtins()
