"""Federated per-day / per-type indexes + exact cross-index search.

Reference parity: ConveyorBelt routes every indexed record to a
per-day Elasticsearch index named by ``IndexNamer``
(/root/reference/src/ConveyorBelt.Tooling/IndexNamer.cs:21-41, date
chars sliced from the ISO timestamp, optional prefix and
one-index-per-type mode), pushes each batch to the index of its
``@timestamp`` (NestBatchPusher.cs:66-75), and enumerates the
day-index set a query must span via ``MasterScheduler.GetIndexNames``
(MasterScheduler.cs:241-259).  Here the same lifecycle is Ray-Data
native:

- ``build_federation``: ONE streaming pass over the corpus derives the
  routing key per row (vectorized strftime on unique values through the
  byte-parity :func:`index_name`), hive-partitions the staging write
  (``write_parquet(partition_cols=...)``), then runs one distributed
  index build per key — each sub-index is an ordinary ``cb.build``
  index, so every serving/compaction/tombstone feature applies per day.
- A final per-term-partition merge job writes federation-global df
  summaries (``feddf/part=<p>.parquet``) — num_parts small tasks, no
  driver-side vocabulary.
- ``FederatedEngine``: a :class:`cb.shard.QueryEngine` per sub-index,
  constructed with ``fed=`` so every server scores with
  federation-global ``(N, avgdl, df)`` — ES ``dfs_query_then_fetch``.
  Because doc ids are content-derived and each doc lives in exactly one
  sub-index, the fan-out merge is bitwise identical to one monolithic
  index over the union corpus (tested; SQL oracle is the monolithic
  BM25 query).  Time-ranged queries prune to the day-indexes that
  overlap (the ``GetIndexNames`` read path), so a "last 2 days" query
  on a year-long federation touches 2/365ths of the postings.

Scale: each sub-index build is an independent distributed job over only
its partition's staging files; the staging write is the only full pass.
Query fan-out collects score ObjectRefs from every selected engine and
``ray.get``s ONCE — cross-index parallelism equals in-index
scatter-gather parallelism.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from . import build as build_mod
from . import manifest
from .build import DEFAULT_NUM_PARTS, DEFAULT_RANGE_BITS
from .shard import QueryEngine, _merge_topk

KEY_COL = "_fed_key"


def index_name(
    time_iso: str | None,
    type_name: str,
    prefix: str = "",
    one_index_per_type: bool = False,
) -> str:
    """Byte-parity port of ``IndexNamer.BuildName(string, string)``
    (IndexNamer.cs:26-41): date chars [0:4]+[5:7]+[8:10] of the ISO
    string, lowercased type name, optional prefix."""
    type_name = type_name.lower()
    if time_iso is None or len(time_iso) < 10:
        return f"{prefix}{type_name}" if one_index_per_type else prefix
    d = time_iso[0:4] + time_iso[5:7] + time_iso[8:10]
    return f"{prefix}{type_name}-{d}" if one_index_per_type else f"{prefix}{d}"


def get_index_names(
    last_offset_iso: str | None,
    type_name: str,
    prefix: str = "",
    one_index_per_type: bool = False,
    days_to_go_back: int = 7,
    today_iso: str | None = None,
    static_name: str | None = None,
) -> list[str]:
    """The day-index set a query/scheduler must span —
    ``MasterScheduler.GetIndexNames`` (MasterScheduler.cs:241-259):
    static name short-circuits; otherwise every day from the source's
    last offset (default ``days_to_go_back`` ago) through tomorrow.

    Deviation, documented: the reference's LINQ builds every name from
    the SAME offset date (the loop variable ``z`` is ignored —
    MasterScheduler.cs:256-257), returning N copies of one name; this
    implements the evident intent (one name per day)."""
    import datetime as _dt

    if static_name:
        return [static_name]
    today = (
        _dt.date.fromisoformat(today_iso[:10])
        if today_iso
        else _dt.date.today()
    )
    if last_offset_iso is None:
        start = today - _dt.timedelta(days=days_to_go_back)
    else:
        start = _dt.date.fromisoformat(last_offset_iso[:10])
    days = (today + _dt.timedelta(days=1) - start).days + 1
    if days <= 0:
        return []
    out = []
    for x in range(days):
        d = today + _dt.timedelta(days=1) - _dt.timedelta(days=x)
        out.append(index_name(d.isoformat(), type_name, prefix, one_index_per_type))
    return out


def _key_column(
    batch: pa.Table,
    ts_col: str | None,
    route_col: str | None,
    type_name: str,
    prefix: str,
    one_index_per_type: bool,
) -> pa.Array:
    """Routing key per row; names derived on the batch's few UNIQUE
    values through :func:`index_name` (byte-parity path), broadcast by
    dictionary take — no per-row Python."""
    if ts_col is not None:
        iso = pc.strftime(
            batch[ts_col].combine_chunks().cast(pa.timestamp("us")),
            format="%Y-%m-%dT%H:%M:%S",
        )
        enc = pc.dictionary_encode(iso)
        names = [
            index_name(v, type_name, prefix, one_index_per_type)
            for v in enc.dictionary.to_pylist()
        ]
    else:
        enc = pc.dictionary_encode(batch[route_col].combine_chunks().cast(pa.string()))
        names = [
            # null route value -> the bare prefix index, mirroring how a
            # null @timestamp routes in date mode (IndexNamer.cs:29-30)
            # rather than wedging the whole ingest tick on one record
            index_name(None, v if v is not None else "", prefix, one_index_per_type=True)
            for v in enc.dictionary.to_pylist()
        ]
    return pc.take(pa.array(names, type=pa.string()), enc.indices)


_CFG_KEYS = (
    "prefix", "type_name", "one_index_per_type", "routing", "ts_col",
    "route_col", "text_col", "id_col", "num_parts", "range_bits",
    "positions",
)


def _cfg_from(fg: dict) -> dict:
    """Routing/build config out of a loaded fed.json.  ``fields`` is
    optional (multifield federations; absent in pre-round-4 manifests)."""
    cfg = {k: fg[k] for k in _CFG_KEYS}
    cfg["fields"] = fg.get("fields")
    return cfg


def fed_meta_path(fed_dir: str) -> str:
    return os.path.join(fed_dir, "fed.json")


def load_fed_meta(fed_dir: str) -> dict:
    """Read fed.json, REBASING every member ``dir`` onto the fed_dir
    actually being opened.  Members live structurally at
    ``fed_dir/index=<key>`` (see _build_one), but the published dirs
    are whatever path the builder saw — so a federation that was
    snapshot-restored or moved would otherwise silently serve the OLD
    location's files (or crash).  Rebase-on-read makes fed.json
    location-independent without changing the published format."""
    with open(fed_meta_path(fed_dir)) as f:
        fg = json.load(f)
    for e in fg.get("indexes", ()):
        d = e.get("dir")
        if d:
            e["dir"] = os.path.join(fed_dir, os.path.basename(os.path.normpath(d)))
    return fg


def staging_dir(fed_dir: str, name: str) -> str:
    """The per-key slice of the routing pass — each sub-index's corpus
    of record (kept: it carries any metadata columns staged alongside
    id/text, so per-sub-index docmeta derives from ITS slice only)."""
    return os.path.join(fed_dir, "_staging", f"{KEY_COL}={name}")


def _member_docmeta_dir(fg: dict, index_dir: str) -> str:
    """Docmeta home of a federation member: the member index dir itself,
    or the FIRST field's sub-index for multifield members (where
    multifield._load_docmeta and MultiFieldSearcher read it)."""
    fields = fg.get("fields")
    if fields:
        from .multifield import field_dir

        return field_dir(index_dir, fields[0])
    return index_dir


def ensure_fed_docmeta(fed_dir: str, cols: list[str]) -> None:
    """Per-sub-index docmeta side tables (filter-context search over a
    federation): each build reads only that sub-index's staging slice —
    no cross-index duplication, metadata shards with the docs."""
    from . import docmeta as docmeta_mod

    fg = load_fed_meta(fed_dir)
    if not fg.get("id_col"):
        raise ValueError(
            "fed docmeta needs an explicit id_col (build_federation "
            "derived ids cannot be joined back to staging rows)"
        )
    for e in fg["indexes"]:
        docmeta_mod.ensure_docmeta(
            _member_docmeta_dir(fg, e["dir"]), staging_dir(fed_dir, e["name"]),
            cols, id_col=fg["id_col"],
        )
    if fg.get("docmeta_cols") != cols:
        # recorded so refresh_federation re-ensures docmeta for the
        # sub-indexes it rebuilds
        fg["docmeta_cols"] = cols
        manifest.write_atomic(fed_meta_path(fed_dir), fg)


def feddf_path(fed_dir: str, part: int, field: str | None = None) -> str:
    if field is not None:
        return os.path.join(fed_dir, "feddf", f"field={field}", f"part={part}.parquet")
    return os.path.join(fed_dir, "feddf", f"part={part}.parquet")


@ray.remote
def _merge_part_df(index_dirs: list[str], part: int, out_path: str) -> int:
    """Federation-global df for one term partition: concat every
    sub-index's tiny ``_termdf.parquet`` summary, one Arrow group-sum.
    num_parts of these run in parallel; each touches only summaries."""
    tabs = []
    for d in index_dirs:
        f = os.path.join(d, "parts", f"part={part}", "_termdf.parquet")
        if os.path.exists(f):
            tabs.append(pq.read_table(f))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if not tabs:
        merged = pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    else:
        t = pa.concat_tables(tabs)
        # group_by outputs keys FIRST: (term, df_sum)
        merged = (
            t.group_by("term")
            .aggregate([("df", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
    tmp = out_path + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, out_path)
    return merged.num_rows


def _stage(source, fed_dir: str, cfg: dict, columns: list[str] | None = None) -> None:
    """Routing pass: derive the key per row, hive-partition into
    ``_staging/`` (parquet write mode defaults to append — incremental
    refreshes stage ONLY the new records, old files untouched)."""
    ts_col, route_col = cfg.get("ts_col"), cfg.get("route_col")
    if isinstance(source, (str, list, tuple)):
        cols = columns
        if cols is not None:
            cols = list(dict.fromkeys(cols + [ts_col or route_col]))
        source = ray.data.read_parquet(source, columns=cols)

    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column(
            KEY_COL,
            _key_column(
                b, ts_col, route_col, cfg["type_name"], cfg["prefix"],
                cfg["one_index_per_type"],
            ),
        )

    source.map_batches(add_key, batch_format="pyarrow").write_parquet(
        os.path.join(fed_dir, "_staging"), partition_cols=[KEY_COL]
    )


def _staging_lineage(fed_dir: str) -> dict[str, list]:
    """key -> sorted (file, size) list of its staging slice — the
    change signal for incremental refresh."""
    staging = os.path.join(fed_dir, "_staging")
    out: dict[str, list] = {}
    if not os.path.isdir(staging):
        return out
    for d in os.listdir(staging):
        if not d.startswith(KEY_COL + "="):
            continue
        kdir = os.path.join(staging, d)
        out[d[len(KEY_COL) + 1 :]] = sorted(
            (f, os.path.getsize(os.path.join(kdir, f)))
            for f in os.listdir(kdir)
            if f.endswith(".parquet")
        )
    return out


def _build_one(fed_dir: str, key: str, cfg: dict, swap: bool = False) -> dict:
    """(Re)build one sub-index from its FULL staging slice.  With
    ``swap`` the build lands in ``index=<key>.new`` and replaces the
    old dir only when complete — a crashed refresh leaves the old index
    serving and a re-run rebuilds from scratch."""
    sub_dir = os.path.join(fed_dir, f"index={key}")
    target = sub_dir + ".new" if swap else sub_dir
    if swap and os.path.isdir(target):
        import shutil

        shutil.rmtree(target)  # leftover from a crashed refresh
    if cfg.get("fields"):
        # multifield federation: one sub-index per analyzed field under
        # index=<key>/field=<f> — the mapping-JSON -> per-field indexes
        # story (cb.multifield) per day/type slice
        from . import multifield as mf_mod

        mf_mod.build_multifield(
            staging_dir(fed_dir, key),
            target,
            cfg["fields"],
            id_col=cfg["id_col"],
            num_parts=cfg["num_parts"],
            range_bits=cfg["range_bits"],
            positions=cfg["positions"],
        )
        metas = {
            f: build_mod.IndexMeta(mf_mod.field_dir(target, f))
            for f in cfg["fields"]
        }
        any_meta = metas[cfg["fields"][0]]
        entry_extra = {
            "field_stats": {
                f: {"n_docs": m.n_docs, "total_tokens": m.total_tokens}
                for f, m in metas.items()
            }
        }

        class _M:  # stats carrier for the shared return below
            n_docs = any_meta.n_docs
            total_tokens = sum(m.total_tokens for m in metas.values())

        meta = _M
    else:
        entry_extra = {}
        meta = build_mod.build_index(
            staging_dir(fed_dir, key),
            target,
            text_col=cfg["text_col"],
            id_col=cfg["id_col"],
            columns=[c for c in (cfg["id_col"], cfg["text_col"]) if c],
            num_parts=cfg["num_parts"],
            range_bits=cfg["range_bits"],
            positions=cfg["positions"],
        )
    if swap:
        import shutil

        old = sub_dir + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        # two renames, never a window with NO index dir: a crash
        # between them leaves .old (re-run rebuilds .new and finishes)
        if os.path.isdir(sub_dir):
            os.rename(sub_dir, old)
        os.rename(target, sub_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)
    return {
        "name": key,
        "dir": sub_dir,
        "n_docs": meta.n_docs,
        "total_tokens": meta.total_tokens,
        **entry_extra,
    }


def _publish(fed_dir: str, cfg: dict, indexes: list[dict]) -> dict:
    """feddf merge + fed.json — LAST, so readers only ever see a
    manifest whose indexes and stats are complete."""
    from . import multifield as mf_mod

    fields = cfg.get("fields")
    if fields:
        # per-field df merges + per-field fed-global stats: each field
        # needs its own exact (N, avgdl, df) triple for the most_fields
        # sum to be bitwise the monolithic multifield score
        refs = []
        for f in fields:
            dirs = [mf_mod.field_dir(e["dir"], f) for e in indexes]
            refs += [
                _merge_part_df.remote(dirs, p, feddf_path(fed_dir, p, field=f))
                for p in range(cfg["num_parts"])
            ]
        ray.get(refs)
        field_stats = {}
        for f in fields:
            nd = sum(e["field_stats"][f]["n_docs"] for e in indexes)
            tt = sum(e["field_stats"][f]["total_tokens"] for e in indexes)
            field_stats[f] = {
                "n_docs": nd,
                "total_tokens": tt,
                "avgdl": (float(tt) / float(nd)) if nd else 0.0,
            }
        n_docs = sum(e["n_docs"] for e in indexes)
        total_tokens = sum(e["total_tokens"] for e in indexes)
        fed = {
            "version": 1,
            **cfg,
            "indexes": indexes,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": 0.0,  # per-field stats are authoritative (field_stats)
            "field_stats": field_stats,
        }
        manifest.write_atomic(fed_meta_path(fed_dir), fed)
        return fed
    dirs = [e["dir"] for e in indexes]
    ray.get(
        [
            _merge_part_df.remote(dirs, p, feddf_path(fed_dir, p))
            for p in range(cfg["num_parts"])
        ]
    )
    n_docs = sum(e["n_docs"] for e in indexes)
    total_tokens = sum(e["total_tokens"] for e in indexes)
    fed = {
        "version": 1,
        **cfg,
        "indexes": indexes,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        # same int-sum / float-divide as write_global: federation avgdl
        # is BITWISE the monolithic avgdl (required for exact merge)
        "avgdl": (float(total_tokens) / float(n_docs)) if n_docs else 0.0,
    }
    manifest.write_atomic(fed_meta_path(fed_dir), fed)
    return fed


def build_federation(
    source: "ray.data.Dataset | str",
    fed_dir: str,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    ts_col: str | None = None,
    route_col: str | None = None,
    type_name: str = "doc",
    prefix: str = "",
    one_index_per_type: bool = False,
    columns: list[str] | None = None,
    num_parts: int = DEFAULT_NUM_PARTS,
    range_bits: int = DEFAULT_RANGE_BITS,
    positions: bool = True,
    fields: list[str] | None = None,
) -> dict:
    """Build one sub-index per routing-key value under
    ``fed_dir/index=<name>/`` plus federation-global stats.

    Exactly one of ``ts_col`` (per-day indexes, NestBatchPusher's
    ``@timestamp`` routing) or ``route_col`` (one-index-per-type,
    ``EsOneIndexPerType``) must be given.  ``num_parts`` is FIXED
    across sub-indexes (the term->partition hash must agree for the
    federation df merge); ``range_bits`` likewise passed through.
    The routing/build config is recorded in ``fed.json`` so
    :func:`refresh_federation` is self-contained.
    """
    if (ts_col is None) == (route_col is None):
        raise ValueError("exactly one of ts_col / route_col required")
    if fields is not None and id_col is None:
        raise ValueError("multifield federations (fields=) require id_col")
    cfg = {
        "prefix": prefix,
        "type_name": type_name,
        "one_index_per_type": one_index_per_type,
        "routing": "ts" if ts_col else "type",
        "ts_col": ts_col,
        "route_col": route_col,
        "text_col": text_col,
        "id_col": id_col,
        "num_parts": num_parts,
        "range_bits": range_bits,
        "positions": positions,
        "fields": fields,
    }
    if fields and columns is None:
        columns = [id_col] + list(fields)
    _stage(source, fed_dir, cfg, columns)
    indexes = [
        _build_one(fed_dir, key, cfg) for key in sorted(_staging_lineage(fed_dir))
    ]
    return _publish(fed_dir, cfg, indexes)


def init_federation(
    fed_dir: str,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    ts_col: str | None = None,
    route_col: str | None = None,
    type_name: str = "doc",
    prefix: str = "",
    one_index_per_type: bool = False,
    num_parts: int = DEFAULT_NUM_PARTS,
    range_bits: int = DEFAULT_RANGE_BITS,
    positions: bool = True,
    fields: list[str] | None = None,
) -> dict:
    """An EMPTY federation (no sub-indexes yet) — the bootstrap for a
    purely streaming-fed lifecycle: ``init_federation`` once, then every
    record arrives via :func:`ingest_new_shards` ticks.  Keeps the whole
    corpus on the idempotent deterministic staging path (mixing the bulk
    append-mode staging with shard re-staging would duplicate rows on
    crash replay)."""
    if (ts_col is None) == (route_col is None):
        raise ValueError("exactly one of ts_col / route_col required")
    if fields is not None and id_col is None:
        raise ValueError("multifield federations (fields=) require id_col")
    cfg = {
        "prefix": prefix,
        "type_name": type_name,
        "one_index_per_type": one_index_per_type,
        "routing": "ts" if ts_col else "type",
        "ts_col": ts_col,
        "route_col": route_col,
        "text_col": text_col,
        "id_col": id_col,
        "num_parts": num_parts,
        "range_bits": range_bits,
        "positions": positions,
        "fields": fields,
    }
    return _publish(fed_dir, cfg, [])


def refresh_federation(source: "ray.data.Dataset | str", fed_dir: str) -> dict:
    """Incremental federation maintenance — the continuous-ingest loop
    of the reference (EventHub drain -> parse -> push to TODAY's index,
    Worker/WorkerRole + NestBatchPusher): ``source`` holds ONLY new
    records (e.g. a StreamConsumer drain directory); they are routed and
    appended to staging, and ONLY the sub-indexes whose slice changed
    are rebuilt (bounded by those days' data — historical day-indexes
    are untouched bytes on disk).  feddf + fed.json republish last;
    docmeta (if built via :func:`ensure_fed_docmeta`) refreshes for
    changed keys.  Running engines keep serving the OLD federation;
    construct a new :class:`FederatedEngine` to pick up the refresh
    (same contract as delete_docs/compaction)."""
    fg = load_fed_meta(fed_dir)
    cfg = _cfg_from(fg)
    before = _staging_lineage(fed_dir)
    _stage(source, fed_dir, cfg)
    after = _staging_lineage(fed_dir)
    changed = sorted(k for k in after if after[k] != before.get(k))
    entries = {e["name"]: e for e in fg["indexes"]}
    for key in changed:
        entries[key] = _build_one(fed_dir, key, cfg, swap=True)
        cols = fg.get("docmeta_cols")
        if cols:
            from . import docmeta as docmeta_mod

            docmeta_mod.ensure_docmeta(
                _member_docmeta_dir(fg, entries[key]["dir"]),
                staging_dir(fed_dir, key), cols, id_col=fg["id_col"],
            )
    fed = _publish(fed_dir, cfg, [entries[k] for k in sorted(entries)])
    if fg.get("docmeta_cols"):
        fed["docmeta_cols"] = fg["docmeta_cols"]
        manifest.write_atomic(fed_meta_path(fed_dir), fed)
    fed["changed"] = changed
    return fed


def expire_members(fed_dir: str, before_day: str) -> dict:
    """Retention for day-routed federations — the ES ILM delete-phase /
    curator analog (and the reference's whole operating domain: rolling
    time-partitioned log indexes): drop every member whose day key
    sorts before ``before_day`` (YYYYMMDD) and republish feddf +
    fed.json over the survivors, so the federation-global (N, avgdl,
    per-partition df) shrink EXACTLY to the remaining corpus — the
    merged top-k equals a federation freshly built without the expired
    days (bitwise, the delete+compact contract).  Ordering: publish the
    shrunk manifest FIRST, then remove the expired member dirs and
    staging slices — a crash in between leaves a correct federation
    plus orphan bytes, never a manifest naming missing dirs.  Running
    engines keep serving the OLD federation; construct a new one to
    pick up the retention (same contract as refresh/compact)."""
    import re
    import shutil

    if not re.fullmatch(r"\d{8}", before_day):
        # retention is destructive: a malformed cutoff (ISO dashes, a
        # bare month) would lexicographically no-op or misfire silently
        raise ValueError(
            f"before_day must be YYYYMMDD, got {before_day!r}"
        )
    fg = load_fed_meta(fed_dir)
    if not fg.get("ts_col"):
        raise ValueError(
            "expire_members needs day-routed members (ts_col federations)"
        )
    cfg = _cfg_from(fg)

    def day(e: dict) -> str:
        return e["name"][-8:]

    keep = [e for e in fg["indexes"] if day(e) >= before_day]
    dropped = [e for e in fg["indexes"] if day(e) < before_day]
    if not keep:
        raise ValueError(
            f"retention before_day={before_day} would drop every member; "
            "refusing (delete the federation dir explicitly instead)"
        )
    if not dropped:
        fg["dropped"] = []
        return fg
    fed = _publish(fed_dir, cfg, keep)
    if fg.get("docmeta_cols"):
        fed["docmeta_cols"] = fg["docmeta_cols"]
        manifest.write_atomic(fed_meta_path(fed_dir), fed)
    for e in dropped:
        shutil.rmtree(e["dir"], ignore_errors=True)
        shutil.rmtree(staging_dir(fed_dir, e["name"]), ignore_errors=True)
    fed["dropped"] = [e["name"] for e in dropped]
    return fed


@ray.remote
def _stage_shard(shard_path: str, fed_dir: str, cfg: dict) -> list[str]:
    """Route ONE immutable stream shard into staging with DETERMINISTIC
    per-(shard, key) filenames — a retried/crashed ingest overwrites the
    same files instead of appending duplicates (idempotent, unlike the
    bulk append-mode staging).  One task per shard; shards are consumer
    drain ranges, so they're small and many — task-parallel."""
    t = pq.read_table(shard_path)
    t = t.append_column(
        KEY_COL,
        _key_column(
            t, cfg.get("ts_col"), cfg.get("route_col"), cfg["type_name"],
            cfg["prefix"], cfg["one_index_per_type"],
        ),
    )
    import pyarrow.compute as pc

    base = os.path.basename(shard_path)[: -len(".parquet")]
    keys = sorted(set(t[KEY_COL].to_pylist()))
    for key in keys:
        sub = t.filter(pc.equal(t[KEY_COL], key)).drop_columns([KEY_COL])
        kdir = os.path.join(fed_dir, "_staging", f"{KEY_COL}={key}")
        os.makedirs(kdir, exist_ok=True)
        out = os.path.join(kdir, f"ingest-{base}.parquet")
        tmp = out + ".tmp"
        pq.write_table(sub, tmp)
        os.replace(tmp, out)
    return keys


def _ingest_state_path(fed_dir: str) -> str:
    return os.path.join(fed_dir, "_ingest.json")


def ingest_new_shards(
    shard_dir: str, fed_dir: str, stop_after: str | None = None
) -> dict:
    """Close the streaming loop: route a StreamConsumer drain
    directory's NEW shard files into the federation (the reference's
    EventHub -> parse -> today's-ES-index path, EventHubConsumer.cs +
    NestBatchPusher.cs).

    Crash-safe by construction: shards are immutable once published
    (write-audit-publish), staging filenames are deterministic per
    (shard, key) so re-staging overwrites rather than duplicates, and
    ``_ingest.json`` records (ingested, dirty-keys) AFTER staging —
    a crash at any point re-runs to the same state.  Only the
    sub-indexes whose keys went dirty are rebuilt."""
    state = {"ingested": [], "dirty": []}
    if os.path.exists(_ingest_state_path(fed_dir)):
        with open(_ingest_state_path(fed_dir)) as f:
            state = json.load(f)
    fg = load_fed_meta(fed_dir)
    cfg = _cfg_from(fg)
    seen = set(state["ingested"])
    new = sorted(
        f
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
        and f not in seen
        # stop-offset guard (F3 parity): shards sorting after the bound
        # are never scheduled
        and (stop_after is None or f <= stop_after)
    )
    dirty = set(state["dirty"])
    if new:
        touched = ray.get(
            [
                _stage_shard.remote(os.path.join(shard_dir, f), fed_dir, cfg)
                for f in new
            ]
        )
        dirty |= {k for ks in touched for k in ks}
        state = {"ingested": sorted(seen | set(new)), "dirty": sorted(dirty)}
        manifest.write_atomic(_ingest_state_path(fed_dir), state)
    if not dirty:
        fg["changed"] = []
        return fg
    entries = {e["name"]: e for e in fg["indexes"]}
    for key in sorted(dirty):
        entries[key] = _build_one(fed_dir, key, cfg, swap=True)
        cols = fg.get("docmeta_cols")
        if cols:
            from . import docmeta as docmeta_mod

            docmeta_mod.ensure_docmeta(
                _member_docmeta_dir(fg, entries[key]["dir"]),
                staging_dir(fed_dir, key), cols, id_col=fg["id_col"],
            )
    fed = _publish(fed_dir, cfg, [entries[k] for k in sorted(entries)])
    if fg.get("docmeta_cols"):
        fed["docmeta_cols"] = fg["docmeta_cols"]
        manifest.write_atomic(fed_meta_path(fed_dir), fed)
    manifest.write_atomic(
        _ingest_state_path(fed_dir), {"ingested": state["ingested"], "dirty": []}
    )
    fed["changed"] = sorted(dirty)
    return fed


@ray.remote
def _delete_in_index(index_dir: str, ids: list[int], docstats_of: str | None = None) -> int:
    """Tombstone the subset of ``ids`` this sub-index actually holds
    (docstats intersection) — per-index tombstone lists stay
    proportional to deletes ROUTED there, not to federation-wide
    deletes.  Returns how many of ``ids`` matched.

    ``docstats_of`` points at the sub-index whose docstats define
    membership when it differs from the tombstone target: a MULTIFIELD
    member's docstats live per field sub-index (every field indexes the
    same doc ids, so the first field is authoritative) while its
    tombstones live at the member level, where MultiFieldSearcher reads
    them."""
    import numpy as np

    from .shard import DocStats, delete_docs

    ds = DocStats.load(docstats_of or index_dir)
    arr = np.array(sorted(set(int(i) for i in ids)), dtype=np.int64)
    if len(ds.ids) == 0 or len(arr) == 0:
        return 0
    pos = np.clip(np.searchsorted(ds.ids, arr), 0, len(ds.ids) - 1)
    hit = ds.ids[pos] == arr
    if not hit.any():
        return 0
    delete_docs(index_dir, arr[hit].tolist())
    return int(hit.sum())


def delete_docs_federated(fed_dir: str, doc_ids) -> dict[str, int]:
    """ES DELETE-by-id across a federation: one task per sub-index
    intersects the id list with its own docstats and tombstones only
    matches.  Query paths mask tombstones at ranking time;
    :func:`compact_federation` physically drops them."""
    fg = load_fed_meta(fed_dir)
    ids = list(doc_ids)
    fields = fg.get("fields")
    if fields:
        from .multifield import field_dir as _fdir

        counts = ray.get(
            [
                _delete_in_index.remote(
                    e["dir"], ids, docstats_of=_fdir(e["dir"], fields[0])
                )
                for e in fg["indexes"]
            ]
        )
    else:
        counts = ray.get(
            [_delete_in_index.remote(e["dir"], ids) for e in fg["indexes"]]
        )
    return {
        e["name"]: c for e, c in zip(fg["indexes"], counts) if c
    }


def compact_federation(fed_dir: str) -> dict:
    """Compact every sub-index (each its own partition-parallel Ray
    pass), then republish feddf + fed.json — N/avgdl/df all shrink to
    the survivor corpus, so post-compaction federated scores are
    bitwise a fresh federation over the survivors."""
    fg = load_fed_meta(fed_dir)
    cfg = _cfg_from(fg)
    entries = []
    fields = fg.get("fields")
    if fields:
        from .multifield import compact_multifield

        for e in fg["indexes"]:
            stats = compact_multifield(e["dir"])
            first = stats[fields[0]]
            entries.append(
                {
                    "name": e["name"],
                    "dir": e["dir"],
                    "n_docs": first["n_docs"],
                    "total_tokens": sum(v["total_tokens"] for v in stats.values()),
                    "field_stats": {
                        f: {"n_docs": v["n_docs"], "total_tokens": v["total_tokens"]}
                        for f, v in stats.items()
                    },
                }
            )
        fed = _publish(fed_dir, cfg, entries)
        if fg.get("docmeta_cols"):
            fed["docmeta_cols"] = fg["docmeta_cols"]
            manifest.write_atomic(fed_meta_path(fed_dir), fed)
        return fed
    for e in fg["indexes"]:
        meta = build_mod.compact_index(e["dir"])
        entries.append(
            {
                "name": e["name"],
                "dir": e["dir"],
                "n_docs": meta.n_docs,
                "total_tokens": meta.total_tokens,
            }
        )
    fed = _publish(fed_dir, cfg, entries)
    if fg.get("docmeta_cols"):
        fed["docmeta_cols"] = fg["docmeta_cols"]
        manifest.write_atomic(fed_meta_path(fed_dir), fed)
    return fed


class FederatedEngine:
    """Cross-index search over a federation — the engine analog of one
    ES query spanning ``logstash-*``-style day indexes.

    Each sub-index gets its own :class:`QueryEngine` pool whose servers
    score with federation-global stats (``fed=``), so per-index top-k
    lists are globally comparable and the driver merge by
    ``(score desc, doc_id asc)`` is exact — bitwise equal to one
    monolithic index (dfs_query_then_fetch semantics).

    ``names=`` / day-range args prune the fan-out to the sub-indexes a
    time-bounded query can match (GetIndexNames read path)."""

    def __init__(self, fed_dir: str, num_servers: int = 2, mode: str = "doc"):
        self.meta = load_fed_meta(fed_dir)
        if self.meta.get("fields"):
            raise ValueError(
                "this federation is MULTIFIELD; use FederatedMultiFieldEngine"
            )
        self.fed_dir = fed_dir
        self.engines: dict[str, QueryEngine] = {
            e["name"]: QueryEngine(e["dir"], num_servers, mode, fed=fed_dir)
            for e in self.meta["indexes"]
        }
        from .telemetry import Telemetry

        self.telemetry = Telemetry()  # federation-level fan-out timers

    def _select(
        self,
        names: list[str] | None = None,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> list[str]:
        sel = list(self.engines) if names is None else [n for n in names if n in self.engines]
        if start_day or end_day:
            # day-named indexes end in YYYYMMDD: lexicographic == chronological
            def day(n: str) -> str:
                return n[-8:]

            sel = [
                n
                for n in sel
                if (start_day is None or day(n) >= start_day)
                and (end_day is None or day(n) <= end_day)
            ]
        return sel

    def query(
        self,
        text: str,
        k: int = 10,
        algo: str = "taat",
        names: list[str] | None = None,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> list[tuple[int, float]]:
        """Fan out to the selected sub-indexes, ONE ``ray.get`` over
        every server's score ref, exact merge."""
        import time as _time

        t0 = _time.perf_counter()
        futs = []
        for n in self._select(names, start_day, end_day):
            f = self.engines[n]._dispatch(text, k, algo)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        t1 = _time.perf_counter()
        self.telemetry.record("query.dispatch", t1 - t0)
        if not futs:
            self.telemetry.record("query.total", _time.perf_counter() - t0)
            return []
        scored = ray.get(futs)
        t2 = _time.perf_counter()
        self.telemetry.record("query.wait", t2 - t1)
        res = _merge_topk(scored, k)
        t3 = _time.perf_counter()
        self.telemetry.record("query.merge", t3 - t2)
        self.telemetry.record("query.total", t3 - t0)
        return res

    def query_boosted(
        self,
        text: str,
        k: int = 10,
        indices_boost: dict[str, float] | None = None,
        algo: str = "taat",
        **sel,
    ) -> list[tuple[int, float]]:
        """ES ``indices_boost``: each selected member's scores multiply
        by its per-index boost BEFORE the cross-index merge.  Members
        hold disjoint doc sets and a POSITIVE constant scale preserves
        each member's internal order, so the per-server local top-k cut
        stays valid and the merged result is the exact boosted global
        ranking; exact-binary boosts keep the multiply bitwise vs a SQL
        mirror."""
        ib = dict(indices_boost or {})
        for n, w in ib.items():
            if not float(w) > 0.0:
                raise ValueError(
                    f"indices_boost[{n!r}] = {w}: boosts must be > 0 "
                    "(a non-positive scale invalidates the per-member top-k cut)"
                )
        member_futs: list[tuple[float, list]] = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch(text, k, algo)
            if f is None:
                continue
            w = float(ib.get(n, 1.0))
            member_futs.append((w, f if isinstance(f, list) else [f]))
        if not member_futs:
            return []
        got = ray.get([r for _, fs in member_futs for r in fs])
        scored, i = [], 0
        for w, fs in member_futs:
            for _ in fs:
                part = got[i]
                i += 1
                scored.append(
                    [(d, s * w) for d, s in part] if w != 1.0 else part
                )
        return _merge_topk(scored, k)

    def phrase_query(
        self, text: str, k: int = 10, slop: int = 0, **sel
    ) -> list[tuple[int, float]]:
        """Phrase fan-out: refs collected across every selected engine,
        ONE ray.get (cross-index latency = max, not sum)."""
        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_phrase(text, k, slop)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def search(self, query_string: str, k: int = 10, **sel) -> list[tuple[int, float]]:
        """Query-string search across the federation.  Exactness notes:
        wildcard/fuzzy atoms expand per sub-index against ITS vocab
        (scoring_boolean — each matched term scores at the atom's boost,
        no match-count dependence), and a term absent from a sub-index
        can't contribute to that sub-index's disjoint docs, so the union
        of per-index expansions scores bitwise like one monolithic
        expansion; +required/-negated/phrase clauses are per-doc.
        Metadata filters need docmeta built per sub-index
        (:func:`ensure_fed_docmeta`).  Refs are collected from every
        selected engine before ONE ray.get — cross-index latency is
        max(sub-index), not sum."""
        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_search(query_string, k)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def msearch(
        self, query_strings: list[str], k: int = 10, **sel
    ) -> list[list[tuple[int, float]]]:
        """ES ``_msearch`` across the federation: EVERY query's refs
        across EVERY selected sub-index are in flight before any result
        is awaited — one ray.get drains query_count x member_count x
        servers refs, so the wall clock is max over all cells, not the
        sequential sum.  Bitwise identical to a search() loop (same
        kernels, same per-query merge)."""
        names = list(self._select(**sel))
        per_q: list[list] = []
        flat: list = []
        for q in query_strings:
            refs = []
            for n in names:
                f = self.engines[n]._dispatch_search(q, k)
                if f is None:
                    continue
                refs.extend(f if isinstance(f, list) else [f])
            per_q.append(refs)
            flat.extend(refs)
        got = ray.get(flat)
        out: list[list[tuple[int, float]]] = []
        pos = 0
        for refs in per_q:
            out.append(_merge_topk(got[pos:pos + len(refs)], k) if refs else [])
            pos += len(refs)
        return out

    def facets(
        self, query_string: str, facet_cols=(), stats_cols=(), **sel
    ) -> tuple[dict, dict]:
        """ES-style aggregations over the federation-wide match set:
        per-server partials collected across every selected engine, one
        ray.get, one exact additive fold — counts add, sums add,
        min/max fold across disjoint doc sets."""
        from .shard import _merge_facets

        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_facets(query_string, facet_cols, stats_cols)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return {c: {} for c in facet_cols}, {
                c: (0, 0, None, None) for c in stats_cols
            }
        return _merge_facets(ray.get(futs))

    def more_like_this(
        self,
        doc_text: str,
        k: int = 10,
        max_terms: int = 15,
        exclude: int | None = None,
        algo: str = "taat",
        **sel,
    ) -> list[tuple[int, float]]:
        """Federation-exact more_like_this: the feddf overlay makes ANY
        sub-engine's term_dfs federation-global (the merged summaries
        include terms a sub-index never saw), and the fed.json N feeds
        the selection idf — so term selection and ranking are bitwise
        the monolithic more_like_this."""
        import collections

        from . import analyze, scoring

        toks = collections.Counter(analyze.tokenize(doc_text))
        if not toks or not self.engines:
            return []
        dfs = next(iter(self.engines.values())).term_dfs(list(toks))
        n = self.meta["n_docs"]
        scored = [
            (t, toks[t] * float(scoring.idf(dfs[t], n))) for t in toks if t in dfs
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        terms = sorted(t for t, _ in scored[:max_terms])
        # tokenizer is idempotent on its own output: joined terms
        # re-tokenize to exactly this term set
        res = self.query(
            " ".join(terms), k + (1 if exclude is not None else 0), algo, **sel
        )
        if exclude is not None:
            res = [r for r in res if r[0] != exclude][:k]
        return res

    def search_after(
        self,
        text: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
        algo: str = "taat",
        **sel,
    ) -> list[tuple[int, float]]:
        """Cursor pagination across the federation (same doubling
        re-rank as QueryEngine.search_after; sub-engines' server-side
        result caches absorb the repeats)."""
        from .query import page_after

        return page_after(
            lambda q, kk: self.query(q, k=kk, algo=algo, **sel), text, k, after
        )

    def histogram(self, query_string: str, histos: dict, **sel) -> dict:
        """Histogram aggregation across the federation (per-server
        partials, one ray.get, exact additive fold)."""
        from .shard import _merge_hists

        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_histogram(query_string, histos)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return {c: {} for c in histos}
        return _merge_hists(ray.get(futs))

    def range_agg(self, query_string: str, ranges: dict, **sel) -> dict:
        """ES range aggregation across the federation (per-server range
        counts, one ray.get, exact elementwise fold across disjoint doc
        sets)."""
        from .shard import _merge_ranges

        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_range_agg(query_string, ranges)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return {c: [0] * len(b) for c, b in ranges.items()}
        return _merge_ranges(ray.get(futs))

    def composite(
        self, query_string: str, cols: list[str], size: int,
        after: tuple | None = None, **sel,
    ) -> tuple[list[tuple[tuple, int]], tuple | None]:
        """ES composite aggregation across the federation: per-server
        bucket dicts (one row per distinct key tuple) from every
        selected sub-index, one ray.get, exact additive fold, then the
        same key-ordered size/after paging as QueryEngine.composite —
        bitwise the monolithic pool's pages."""
        from .shard import _merge_composite

        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_composite(query_string, cols)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return [], None
        from .shard import _page_composite

        return _page_composite(_merge_composite(ray.get(futs)), size, after)

    def top_hits(self, text: str, group_col: str, k_per: int, **sel) -> dict:
        """Federated top_hits-inside-terms-agg: every selected
        sub-index's servers return their local per-group top k_per
        (scored with the feddf overlay, so idf is federation-global),
        one ray.get, exact re-cut per group value — disjoint doc sets
        make the merge bitwise the monolithic pool's."""
        from .shard import _merge_top_hits

        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_top_hits(text, group_col, k_per)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return {}
        return _merge_top_hits(ray.get(futs), k_per)

    def collapse(
        self, text: str, group_col: str, k: int, **sel
    ) -> list[tuple[int, float, object]]:
        """Federated field collapsing: top_hits(k_per=1) across the
        federation, flattened and re-cut — same driver math as
        QueryEngine.collapse, bitwise the monolithic result."""
        from .shard import _collapse_from_top_hits

        return _collapse_from_top_hits(self.top_hits(text, group_col, 1, **sel), k)

    def percentile_ranks(
        self, query_string: str, col: str, values: list[int], **sel
    ) -> dict[int, float] | None:
        """Federated percentile_ranks: integer range counts fold
        exactly across members, ONE division per value at the driver
        (same math as QueryEngine.percentile_ranks)."""
        from .shard import _pct_ranks_from_counts

        ranges = [(None, int(v) + 1) for v in values] + [(None, None)]
        cnts = self.range_agg(query_string, {col: ranges}, **sel)[col]
        return _pct_ranks_from_counts(cnts, values)

    def function_score(
        self, query_string: str, spec: dict, k: int = 10, **sel
    ) -> list[tuple[int, float]]:
        """Federated function_score: each member combines its fed-
        overlaid BM25 scores (fed-global N/avgdl/df) with the docmeta
        feature locally; member doc sets are disjoint so the driver
        re-cut is exact.  Needs ensure_fed_docmeta for the feature
        column."""
        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_function_score(query_string, spec, k)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def phrase_prefix_query(
        self, text: str, k: int = 10, max_expansions: int | None = None, **sel
    ) -> list[tuple[int, float]]:
        """Federated match_phrase_prefix.  The prefix expands per
        member against ITS vocabulary (ES itself expands per shard); a
        completion absent from a member can't match that member's
        disjoint docs, so with max_expansions=None (default here) the
        union is EXACTLY the monolithic result.  A finite cap applies
        per member (ES parity) and may admit more total completions
        than one monolithic index would."""
        futs = []
        for n in self._select(**sel):
            f = self.engines[n]._dispatch_phrase_prefix(text, k, max_expansions)
            if f is None:
                continue
            futs.extend(f if isinstance(f, list) else [f])
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def term_vectors(self, doc_ids: list[int], **sel) -> list[tuple]:
        """Federated _termvectors: fan out to every selected member
        (content-derived doc ids are federation-unique, so concat is
        duplicate-free), one ray.get."""
        futs = []
        for n in self._select(**sel):
            futs.extend(self.engines[n]._dispatch_term_vectors(list(doc_ids)))
        rows = [r for part in ray.get(futs) for r in part]
        rows.sort(key=lambda r: (r[0], r[1]))
        return rows

    def query_many(self, texts: list[str], k: int = 10, algo: str = "taat", **sel_kwargs):
        """Batched federation fan-out: in doc mode every server of every
        selected sub-index gets ONE score_many RPC covering all queries
        (the same round-trip amortization as QueryEngine.query_many,
        across the whole federation); exact because every
        (engine, server) scope is a disjoint doc set.  Falls back to
        per-query dispatch when any engine is term-sharded."""
        from . import analyze

        sel = self._select(**sel_kwargs)
        if any(self.engines[n].mode != "doc" for n in sel):
            return [self.query(t, k, algo, **sel_kwargs) for t in texts]
        term_lists = [sorted(set(analyze.tokenize(t))) for t in texts]
        live = [i for i, terms in enumerate(term_lists) if terms]
        servers = [s for n in sel for s in self.engines[n].servers]
        if not servers:
            return [[] for _ in texts]
        futs = [
            s.score_many.remote([term_lists[i] for i in live], k, algo=algo)
            for s in servers
        ]
        per_server = ray.get(futs)
        results: list = [[] for _ in texts]
        for j, i in enumerate(live):
            results[i] = _merge_topk([ps[j] for ps in per_server], k)
        return results

    def warm(self, min_df: int = 0) -> int:
        return sum(e.warm(min_df) for e in self.engines.values())

    def metrics(self) -> dict:
        """Federation-wide telemetry: the federation's own fan-out phase
        timers (dispatch / wait / merge / total — federated queries
        bypass member-engine query paths) plus per-member engine timers
        and the additive roll-up of every member's server counters (the
        TelemetryProvider analog across the whole fan-out)."""
        from .telemetry import merge_snapshots

        per = {n: e.metrics() for n, e in self.engines.items()}
        return {
            "engine": self.telemetry.snapshot(),
            "servers": merge_snapshots([m["servers"] for m in per.values()]),
            "members": per,
        }

    def shutdown(self) -> None:
        for e in self.engines.values():
            e.shutdown()
        self.engines = {}


@ray.remote
class _MultiFieldFedMember:
    """One sub-index of a MULTIFIELD federation as an actor: holds a
    fed-overridden :class:`cb.multifield.MultiFieldSearcher` (state
    loaded once here) so the cross-index fan-out runs member-parallel
    with ONE driver-side ``ray.get``.  Scale note: a member that
    outgrows one actor swaps in a doc-sharded MultiFieldEngine pool —
    same exact-merge contract, the bucket slices stay disjoint."""

    def __init__(self, index_dir: str, fed_dir: str):
        from .multifield import MultiFieldSearcher

        self.searcher = MultiFieldSearcher(index_dir, fed=fed_dir)

    def search(
        self, query: str, k: int,
        mode: str = "most_fields", tie_breaker: float = 0.0,
    ) -> list[tuple[int, float]]:
        return self.searcher.search(query, k, mode=mode, tie_breaker=tie_breaker)

    def facet_counts(self, query: str, facet_cols, stats_cols):
        return self.searcher.facet_counts(query, facet_cols, stats_cols)

    def histogram(self, query: str, histos: dict) -> dict:
        return self.searcher.histogram(query, histos)

    def range_counts(self, query: str, ranges: dict) -> dict:
        return self.searcher.range_counts(query, ranges)

    def composite_counts(self, query: str, cols: list[str]) -> dict:
        return self.searcher.composite_counts(query, cols)

    def top_hits(self, query: str, group_col: str, k_per: int) -> dict:
        return self.searcher.top_hits(query, group_col, k_per)

    def mlt(self, doc_fields: dict, k: int, max_terms: int):
        """Member MLT WITHOUT source-doc exclusion: term selection uses
        the fed-overlaid per-field df and fed (N, avgdl), so every
        member selects the SAME terms — the driver merges and excludes,
        keeping the result bitwise the monolithic MLT."""
        return self.searcher.more_like_this(doc_fields, k, max_terms)

    def function_score(self, query: str, spec: dict, k: int):
        return self.searcher.function_score(query, spec, k)

    def significant_counts(self, query: str, field: str, min_df: int):
        return self.searcher.significant_counts(query, field, min_df)

    def get_dfs(self, field: str, terms: list[str]) -> dict:
        return self.searcher.term_dfs(field, terms)


class FederatedMultiFieldEngine:
    """Cross-index MULTIFIELD search (mapping JSON -> analyzed fields
    -> per-day sub-indexes -> one query spanning them): each member
    scores every field with federation-global per-field stats
    (``field_stats`` + per-field feddf overlays), so the merged top-k
    is bitwise the monolithic multifield result — the multifield
    closure of the single-field FederatedEngine contract."""

    def __init__(self, fed_dir: str):
        self.meta = load_fed_meta(fed_dir)
        if not self.meta.get("fields"):
            raise ValueError(
                "this federation is single-field; use FederatedEngine"
            )
        self.fed_dir = fed_dir
        self.members = {
            e["name"]: _MultiFieldFedMember.remote(e["dir"], fed_dir)
            for e in self.meta["indexes"]
        }

    # day/name pruning: identical selection semantics to FederatedEngine
    def _select(
        self,
        names: list[str] | None = None,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> list[str]:
        sel = list(self.members) if names is None else [
            n for n in names if n in self.members
        ]
        if start_day or end_day:
            def day(n: str) -> str:
                return n[-8:]

            sel = [
                n
                for n in sel
                if (start_day is None or day(n) >= start_day)
                and (end_day is None or day(n) <= end_day)
            ]
        return sel

    def warm(self) -> int:
        """Touch every member once (actor construction is lazy-ish under
        Ray; a trivial query forces state load) — the serving-startup
        cost lands here instead of the first user query."""
        return len(ray.get([m.search.remote("", 1) for m in self.members.values()]))

    def search(
        self, query: str, k: int = 10,
        mode: str = "most_fields", tie_breaker: float = 0.0, **sel,
    ) -> list[tuple[int, float]]:
        """Fan out the multifield query string, ONE ray.get, exact
        merge by (score desc, doc_id asc) — members hold disjoint doc
        sets, so the merge is the global top-k.  ``mode="best_fields"``
        (dis_max) combines per doc, so the disjoint-member merge stays
        bitwise the monolithic result, exactly like most_fields."""
        futs = [
            self.members[n].search.remote(query, k, mode, tie_breaker)
            for n in self._select(**sel)
        ]
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def search_boosted(
        self,
        query: str,
        k: int = 10,
        indices_boost: dict[str, float] | None = None,
        mode: str = "most_fields",
        tie_breaker: float = 0.0,
        **sel,
    ) -> list[tuple[int, float]]:
        """ES ``indices_boost`` on the MULTIFIELD federation: member
        scores scale by the per-index boost before the merge — same
        positive-scale-preserves-order argument as
        FederatedEngine.query_boosted, composing with any multi_match
        mode."""
        ib = dict(indices_boost or {})
        for n, w in ib.items():
            if not float(w) > 0.0:
                raise ValueError(
                    f"indices_boost[{n!r}] = {w}: boosts must be > 0"
                )
        names = self._select(**sel)
        futs = [
            self.members[n].search.remote(query, k, mode, tie_breaker)
            for n in names
        ]
        if not futs:
            return []
        parts = []
        for n, res in zip(names, ray.get(futs)):
            w = float(ib.get(n, 1.0))
            parts.append([(d, s * w) for d, s in res] if w != 1.0 else res)
        return _merge_topk(parts, k)

    def facets(
        self, query: str, facet_cols=(), stats_cols=(), **sel
    ) -> tuple[dict, dict]:
        """ES aggregations over the federation-wide multifield match
        set: per-member partials (each member's full-match aggregation
        over its disjoint doc set), ONE ray.get, exact additive fold —
        membership is stats-independent and vocab expansion per member
        is scoring_boolean-safe, so this equals the monolithic
        multifield aggregation exactly."""
        from .shard import _merge_facets

        futs = [
            self.members[n].facet_counts.remote(
                query, list(facet_cols), list(stats_cols)
            )
            for n in self._select(**sel)
        ]
        if not futs:
            return {c: {} for c in facet_cols}, {
                c: (0, 0, None, None) for c in stats_cols
            }
        return _merge_facets(ray.get(futs))

    def histogram(self, query: str, histos: dict, **sel) -> dict:
        """Fixed-interval histogram over the federation-wide multifield
        match set (exact additive member fold)."""
        from .shard import _merge_hists

        futs = [
            self.members[n].histogram.remote(query, histos)
            for n in self._select(**sel)
        ]
        if not futs:
            return {c: {} for c in histos}
        return _merge_hists(ray.get(futs))

    def range_agg(self, query: str, ranges: dict, **sel) -> dict:
        """Range aggregation over the federation-wide multifield match
        set (exact elementwise member fold)."""
        from .shard import _merge_ranges

        futs = [
            self.members[n].range_counts.remote(query, ranges)
            for n in self._select(**sel)
        ]
        if not futs:
            return {c: [0] * len(b) for c, b in ranges.items()}
        return _merge_ranges(ray.get(futs))

    def composite(
        self, query: str, cols: list[str], size: int,
        after: tuple | None = None, **sel,
    ) -> tuple[list[tuple[tuple, int]], tuple | None]:
        """Composite aggregation over the federation-wide multifield
        match set: additive member fold + the shared key-ordered
        size/after paging — bitwise the monolithic multifield pages."""
        from .shard import _merge_composite

        futs = [
            self.members[n].composite_counts.remote(query, list(cols))
            for n in self._select(**sel)
        ]
        if not futs:
            return [], None
        from .shard import _page_composite

        return _page_composite(_merge_composite(ray.get(futs)), size, after)

    def top_hits(self, query: str, group_col: str, k_per: int, **sel) -> dict:
        """Federated multifield top_hits: members score with fed-global
        per-field stats, so per-group candidates merge bitwise to the
        monolithic multifield per-group top-k."""
        from .shard import _merge_top_hits

        futs = [
            self.members[n].top_hits.remote(query, group_col, k_per)
            for n in self._select(**sel)
        ]
        if not futs:
            return {}
        return _merge_top_hits(ray.get(futs), k_per)

    def function_score(
        self, query: str, spec: dict, k: int = 10, **sel
    ) -> list[tuple[int, float]]:
        """Federated multifield function_score: members combine their
        fed-global most_fields scores with the docmeta feature locally;
        disjoint member doc sets -> exact driver re-cut (bitwise the
        monolithic multifield function_score)."""
        futs = [
            self.members[n].function_score.remote(query, spec, k)
            for n in self._select(**sel)
        ]
        if not futs:
            return []
        return _merge_topk(ray.get(futs), k)

    def collapse(
        self, query: str, group_col: str, k: int, **sel
    ) -> list[tuple[int, float, object]]:
        """Federated multifield field collapsing (top_hits k_per=1,
        flatten + re-cut — bitwise the monolithic result)."""
        from .shard import _collapse_from_top_hits

        return _collapse_from_top_hits(self.top_hits(query, group_col, 1, **sel), k)

    def more_like_this(
        self,
        doc_fields: dict,
        k: int = 10,
        max_terms: int = 15,
        exclude: int | None = None,
        **sel,
    ) -> list[tuple[int, float]]:
        """Federation-wide most_fields MLT: every member selects the
        same terms (fed-global df overlays), member top-k lists merge
        exactly, the source doc drops at the driver — bitwise the
        monolithic multifield MLT."""
        kk = k + (1 if exclude is not None else 0)
        futs = [
            self.members[n].mlt.remote(doc_fields, kk, max_terms)
            for n in self._select(**sel)
        ]
        if not futs:
            return []
        res = _merge_topk(ray.get(futs), kk)
        if exclude is not None:
            res = [r for r in res if r[0] != exclude][:k]
        return res

    def search_after(self, query: str, k: int = 10, after=None, **sel):
        from .query import page_after

        return page_after(
            lambda q, kk: self.search(q, kk, **sel), query, k, after
        )

    def significant_terms(
        self, query: str, field: str, top_n: int = 10, min_df: int = 2, **sel
    ) -> list[tuple[str, int, int, float]]:
        """Federation-wide significant_terms of ``field``: per-member
        fg counts add (disjoint docs), match totals add, JLH at the
        driver with fed-global df and N."""
        from .multifield import _fold_sig, _jlh_rank

        names = self._select(**sel)
        parts = ray.get(
            [
                self.members[n].significant_counts.remote(query, field, min_df)
                for n in names
            ]
        )
        fg, m = _fold_sig(parts)
        if not fg or not names:
            return []
        dfs = ray.get(self.members[names[0]].get_dfs.remote(field, sorted(fg)))
        n_docs = self.meta["field_stats"][field]["n_docs"]
        return _jlh_rank(fg, m, dfs, n_docs, top_n)

    def shutdown(self) -> None:
        for m in self.members.values():
            ray.kill(m)
        self.members = {}
