"""Shard servers: stateful actor pool serving top-k BM25 queries.

The from-scratch replacement for what ConveyorBelt outsources to an
Elasticsearch cluster (README.md:5-8); structurally the analog of the
reference's long-lived stateful workers — connection+cache state loaded
once per worker (NestBatchPusher / ElasticsearchClient index cache,
/root/reference/src/ConveyorBelt.Tooling/NestBatchPusher.cs:16-99 and
ElasticsearchClient.cs:22-45), here an actor that loads its term
partitions once in ``__init__`` and serves many queries.

Topology: the index is TERM-partitioned (hash(term) % num_parts); each
``ShardServer`` owns the partitions ``p % num_servers == server_id``.
A query tokenizes on the driver, fetches each term's compressed postings
from its owner (an ObjectRef — zero-copy via the object store), and the
server owning the most query terms scores the gathered lists (vectorized
exact TAAT by default, block-max WAND selectable).  Scoring needs NO
side tables: per-posting doc lengths are stored in the postings
themselves (cb.compress), so the only corpus-global serving state is
two scalars (N, avgdl) from ``_global.json``.

Scale note (10^12 docs): with doc lengths posting-resident, serving
shards are self-contained; the remaining scale dimension is hybrid
partitioning — doc-range index GROUPS, term-partitioned inside a group,
queries fanned across groups and merged by (score, doc_id).  The group
dimension is exactly this module applied per group.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from . import analyze, phrase as phrase_mod, scoring, wand
from .build import IndexMeta, term_partition
from .compress import PostingList


class ChunkedPostings:
    """One term's posting list = ordered doc-id-range chunks.

    ``df``/``cf`` count the chunks HELD here; ``gdf`` is the term's
    corpus-global df (equal to ``df`` when a server holds the whole
    list, the partition-file total when it holds a doc-range slice) —
    idf must always use ``gdf`` or doc-sharded scores would drift."""

    __slots__ = ("term", "chunks", "df", "cf", "gdf")

    def __init__(self, term: str, rows: list[dict], global_df: int | None = None):
        self.term = term
        rows = sorted(rows, key=lambda r: r["bucket"])
        self.chunks = [PostingList(r) for r in rows]
        self.df = sum(c.df for c in self.chunks)
        self.cf = sum(c.cf for c in self.chunks)
        self.gdf = int(global_df) if global_df is not None else self.df

    def decode_all(self):
        ids, tfs, dls = [], [], []
        for c in self.chunks:
            i, t, d = c.decode_all()
            ids.append(i)
            tfs.append(t)
            dls.append(d)
        return np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls)


class DocStats:
    """doc_id -> doc_len lookup (sorted arrays + searchsorted).

    NOT used for scoring (doc lengths ride in the postings); this backs
    doc-length ANALYTICS over the docstats table the build writes
    (e.g. the doc_stats pipelines and tests)."""

    __slots__ = ("ids", "lens", "n_docs", "avgdl")

    def __init__(self, ids: np.ndarray, lens: np.ndarray, n_docs: int, avgdl: float):
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.lens = lens[order]
        self.n_docs = n_docs
        self.avgdl = avgdl

    @classmethod
    def load(cls, index_dir: str, buckets: list[int] | None = None) -> "DocStats":
        """``buckets`` restricts the read to those doc-range bucket
        files (docstats/bucket=<b>.parquet) — a doc-sharded server
        loads only its own slice's lengths, same pruning contract as
        the postings read."""
        meta = IndexMeta(index_dir)
        ds_dir = meta.docstats_dir()
        want = None if buckets is None else {f"bucket={b}.parquet" for b in buckets}
        files = sorted(
            os.path.join(ds_dir, f)
            for f in os.listdir(ds_dir)
            if f.endswith(".parquet") and (want is None or f in want)
        )
        import pyarrow as pa

        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        return cls(
            tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64),
            meta.n_docs,
            meta.avgdl,
        )

    def lookup(self, doc_ids: np.ndarray) -> np.ndarray:
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        pos = np.clip(np.searchsorted(self.ids, doc_ids), 0, max(len(self.ids) - 1, 0))
        if len(self.ids) == 0 or not np.array_equal(self.ids[pos], doc_ids):
            missing = doc_ids if len(self.ids) == 0 else doc_ids[self.ids[pos] != doc_ids]
            raise KeyError(f"doc ids not in docstats: {missing[:5].tolist()}...")
        return self.lens[pos]


class ShardPartition:
    """One term partition, loaded once; postings decoded on demand.

    The on-disk layout is BUCKET-PRUNED (one parquet file per doc-range
    bucket, cb.build.write_partition): ``buckets`` restricts the READ to
    a doc-range subset — a doc-sharded server touches only its own
    bucket files, so load I/O is ~1/S per server and a partition larger
    than worker memory still serves.  Per-term GLOBAL df comes from the
    partition's tiny ``_termdf.parquet`` summary, so idf stays
    corpus-exact on any slice without reading other buckets."""

    def __init__(
        self,
        path: str | None = None,
        buckets: list[int] | None = None,
        table: pa.Table | None = None,
        global_df: dict[str, int] | None = None,
    ):
        """Load from ``path`` (a partition DIRECTORY of bucket files) or
        from an in-memory ``table`` (tests / pre-sliced views).
        ``global_df`` short-circuits the summary read when the caller
        already has it."""
        import glob as _glob

        import pyarrow.compute as pc

        if table is None:
            if path is None or not os.path.isdir(path):
                self.table = None
                self.offsets: dict[str, tuple[int, int]] = {}
                self.global_df: dict[str, int] = {}
                return
            files = []
            for f in _glob.glob(os.path.join(path, "bucket=*.parquet")):
                b = int(os.path.basename(f)[len("bucket=") : -len(".parquet")])
                if buckets is None or b in set(buckets):
                    files.append((b, f))
            if global_df is None:
                tdf = os.path.join(path, "_termdf.parquet")
                if os.path.exists(tdf):
                    t = pq.read_table(tdf)
                    global_df = dict(
                        zip(t["term"].to_pylist(), t["df"].to_pylist())
                    )
            if not files:
                self.table = None
                self.offsets = {}
                self.global_df = global_df or {}
                return
            table = pa.concat_tables(
                [pq.read_table(f) for _, f in sorted(files)]
            ).sort_by([("term", "ascending"), ("bucket", "ascending")])
        else:
            if buckets is not None and table.num_rows:
                table = table.filter(
                    pc.is_in(table["bucket"], value_set=pa.array(sorted(buckets), type=pa.int32()))
                )
        self.global_df = global_df if global_df is not None else self._term_df_totals(table)
        self.table = table
        # Arrow run-end detection (rows are (term,bucket)-sorted): one
        # dictionary_encode + one vectorized diff, no per-row Python
        # compares over the whole partition.
        term_col = self.table["term"].combine_chunks()
        self.offsets = {}
        if len(term_col):
            enc = pc.dictionary_encode(term_col)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            change = np.empty(len(codes), dtype=bool)
            change[0] = True
            change[1:] = codes[1:] != codes[:-1]
            starts = np.flatnonzero(change)
            lens = np.diff(np.append(starts, len(codes)))
            dict_vals = enc.dictionary.to_pylist()
            for s, ln in zip(starts, lens):
                self.offsets[dict_vals[codes[s]]] = (int(s), int(ln))

    @staticmethod
    def _term_df_totals(table: pa.Table) -> dict[str, int]:
        """Per-term sum of chunk dfs (vectorized run-end reduceat)."""
        import pyarrow.compute as pc

        if table.num_rows == 0:
            return {}
        enc = pc.dictionary_encode(table["term"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        dfs = table["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = np.empty(len(codes), dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(dfs, starts)
        dict_vals = enc.dictionary.to_pylist()
        return {dict_vals[codes[s]]: int(v) for s, v in zip(starts, sums)}

    def get(self, term: str) -> ChunkedPostings | None:
        loc = self.offsets.get(term)
        if loc is None:
            return None
        rows = self.table.slice(loc[0], loc[1]).to_pylist()
        return ChunkedPostings(term, rows, global_df=self.global_df.get(term))


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone documents (ES DELETE-by-id parity): ids are appended to
    ``_tombstones.json`` (atomic rewrite); every query path masks them
    at ranking time — postings stay immutable, deletes are metadata.
    A rebuild (or future compaction) physically drops them.  Returns
    the total tombstone count."""
    import json

    from . import manifest

    path = os.path.join(index_dir, "_tombstones.json")
    existing = manifest.read(path) or {"doc_ids": []}
    merged = sorted(set(existing["doc_ids"]) | {int(d) for d in doc_ids})
    manifest.write_atomic(path, {"doc_ids": merged})
    return len(merged)


def put_alias(index_dir: str, name: str, filters: dict | None = None) -> None:
    """ES index alias (optionally FILTERED): alias metadata is index
    state (`_aliases.json`, atomic rewrite — the `_aliases` API), and
    every query through the alias applies its filter as ES filter
    context (membership only, scores untouched).  Idempotent upsert."""
    from . import manifest

    path = os.path.join(index_dir, "_aliases.json")
    cur = manifest.read(path) or {}
    cur[name] = {"filters": dict(filters or {})}
    manifest.write_atomic(path, cur)


def delete_alias(index_dir: str, name: str) -> bool:
    """Remove an alias; returns whether it existed."""
    from . import manifest

    path = os.path.join(index_dir, "_aliases.json")
    cur = manifest.read(path) or {}
    existed = name in cur
    if existed:
        del cur[name]
        manifest.write_atomic(path, cur)
    return existed


def get_aliases(index_dir: str) -> dict:
    """Alias name -> {filters} for an index dir."""
    from . import manifest

    return manifest.read(os.path.join(index_dir, "_aliases.json")) or {}


def load_tombstones(index_dir: str) -> np.ndarray:
    from . import manifest

    t = manifest.read(os.path.join(index_dir, "_tombstones.json"))
    return np.array(sorted(t["doc_ids"]), dtype=np.int64) if t else np.empty(0, dtype=np.int64)


def _live_mask(ids: np.ndarray, tomb: np.ndarray) -> np.ndarray:
    """True where ``ids`` is NOT tombstoned (both int64; tomb sorted)."""
    if len(tomb) == 0:
        return np.ones(len(ids), dtype=bool)
    pos = np.clip(np.searchsorted(tomb, ids), 0, len(tomb) - 1)
    return tomb[pos] != ids


def _phrase_topk_live(ordered_terms, postings, stats, k, tomb, slop=0):
    """Tombstone-aware phrase top-k: over-fetch ADAPTIVELY (start at
    k + min(|tomb|, 64), escalate to the exact k + |tomb| bound only
    when the first cut might have truncated survivors), then drop dead
    docs with ONE vectorized liveness mask over the whole result id
    array — per-query cost no longer grows linearly with the total
    number of deletes ever issued."""
    if len(tomb) == 0:
        return phrase_mod.phrase_topk(ordered_terms, postings, stats, k, slop=slop)
    probe = k + min(len(tomb), 64)
    res = phrase_mod.phrase_topk(ordered_terms, postings, stats, probe, slop=slop)
    ids = np.fromiter((d for d, _ in res), dtype=np.int64, count=len(res))
    keep = _live_mask(ids, tomb)
    if int(keep.sum()) < k and len(res) == probe and probe < k + len(tomb):
        # possibly truncated: retry with the exact worst-case bound
        res = phrase_mod.phrase_topk(ordered_terms, postings, stats, k + len(tomb), slop=slop)
        ids = np.fromiter((d for d, _ in res), dtype=np.int64, count=len(res))
        keep = _live_mask(ids, tomb)
    return [r for r, ok in zip(res, keep) if ok][:k]


class GlobalStats:
    """The only corpus-global state scoring needs: N and avgdl.

    Doc lengths ride inside the postings (cb.compress), so there is NO
    doc-stats side table to broadcast to servers — the serving scale
    path needs just these two scalars per index."""

    __slots__ = ("n_docs", "avgdl")

    def __init__(self, n_docs: int, avgdl: float):
        self.n_docs = n_docs
        self.avgdl = avgdl


def _facets_over(ids, dm, facet_cols, stats_cols):
    """Facet aggregation over one scope's matched doc ids: ES-style
    terms aggs (value -> count) and numeric stats aggs (n/sum/min/max)
    from the docmeta side table.  Vectorized (value_counts / sum) —
    returns tiny dicts, so driver merges stay O(distinct values)."""
    import pyarrow.compute as pc_

    facets: dict[str, dict] = {}
    for c in facet_cols:
        vals = dm.gather(ids, c).drop_null()
        vc = pc_.value_counts(vals)
        facets[c] = {
            row["values"]: int(row["counts"]) for row in vc.to_pylist()
        }
    stats: dict[str, tuple] = {}
    for c in stats_cols:
        vals = dm.gather(ids, c).drop_null()
        if len(vals) == 0:
            stats[c] = (0, 0, None, None)
        else:
            stats[c] = (
                len(vals),
                pc_.sum(vals).as_py(),
                pc_.min(vals).as_py(),
                pc_.max(vals).as_py(),
            )
    return facets, stats


def _stats_ext_over(ids, dm, cols) -> dict:
    """ES extended_stats partials over one scope's matched doc ids:
    ``col -> (n, sum, sumsq, min, max)``.  Values are cast to int64
    first so the sums are EXACT integers (overflow-checked); disjoint
    doc slices therefore add exactly and the driver finishes
    avg/variance/std with one division per moment — bitwise equal to
    the SQL mirror's ``sum::DOUBLE / n`` arithmetic because every
    integer involved is exactly representable as a double."""
    import pyarrow.compute as pc_

    out: dict[str, tuple] = {}
    for c in cols:
        vals = dm.gather(ids, c).drop_null()
        if len(vals) == 0:
            out[c] = (0, 0, 0, None, None)
            continue
        v64 = vals.cast(pa.int64())
        mx = pc_.max(v64).as_py()
        mn = pc_.min(v64).as_py()
        bound = max(abs(mx), abs(mn))
        if len(v64) * bound * bound < (1 << 62):
            # whole sum provably fits: vectorized (the multiply is
            # overflow-CHECKED; this bound makes the SUM safe too —
            # Arrow's sum wraps silently)
            sq = pc_.sum(pc_.multiply_checked(v64, v64)).as_py()
        else:
            # exact Python-int fold (unbounded precision) for slices
            # where n * max^2 could wrap int64
            sq = sum(int(x) * int(x) for x in v64.to_pylist())
        out[c] = (len(v64), pc_.sum(v64).as_py(), sq, mn, mx)
    return out


def _merge_stats_ext(parts) -> dict:
    """Fold per-server extended-stats partials (exact integer adds,
    min/max folds — disjoint doc slices)."""
    out: dict[str, tuple] = {}
    for s in parts:
        for c, (n, sm, sq, mn, mx) in s.items():
            if c not in out:
                out[c] = (n, sm, sq, mn, mx)
            elif n:
                N, S, Q, MN, MX = out[c]
                out[c] = (
                    N + n,
                    S + sm,
                    Q + sq,
                    mn if MN is None else (MN if mn is None else min(MN, mn)),
                    mx if MX is None else (MX if mx is None else max(MX, mx)),
                )
    return out


def _histos_over(ids, dm, histos: dict) -> dict:
    """ES histogram aggregation over one scope's matched ids:
    ``col -> {floor(value/interval)*interval: count}`` (int buckets) —
    the fixed-interval histogram Kibana's date_histogram specializes."""
    import pyarrow.compute as pc_

    out: dict[str, dict] = {}
    for c, interval in histos.items():
        vals = dm.gather(ids, c).drop_null()
        if len(vals) == 0:
            out[c] = {}
            continue
        b = pc_.cast(
            pc_.multiply(
                pc_.floor(pc_.divide(pc_.cast(vals, pa.float64()), float(interval))),
                float(interval),
            ),
            pa.int64(),
        )
        out[c] = {
            int(row["values"]): int(row["counts"])
            for row in pc_.value_counts(b).to_pylist()
        }
    return out


def _merge_hists(parts: list[dict]) -> dict:
    """Additive fold of per-scope histogram dicts (disjoint doc sets)."""
    out: dict[str, dict] = {}
    for h in parts:
        for c, d in h.items():
            acc = out.setdefault(c, {})
            for v, n in d.items():
                acc[v] = acc.get(v, 0) + n
    return out


def _merge_facets(parts):
    """Merge per-server (facets, stats) pairs: counts add, sums add,
    min/max fold (disjoint doc slices, so addition is exact)."""
    facets: dict[str, dict] = {}
    stats: dict[str, tuple] = {}
    for f, s in parts:
        for c, d in f.items():
            acc = facets.setdefault(c, {})
            for v, n in d.items():
                acc[v] = acc.get(v, 0) + n
        for c, (n, sm, mn, mx) in s.items():
            if c not in stats:
                stats[c] = (n, sm, mn, mx)
            elif n:
                N, S, MN, MX = stats[c]
                stats[c] = (
                    N + n,
                    S + sm,
                    mn if MN is None else (MN if mn is None else min(MN, mn)),
                    mx if MX is None else (MX if mx is None else max(MX, mx)),
                )
    return facets, stats


def _ranges_over(ids, dm, ranges: dict) -> dict:
    """ES range aggregation over one scope's matched doc ids:
    ``col -> [count per (lo, hi) range]`` with half-open ``[lo, hi)``
    semantics and ``None`` = unbounded — counts align positionally with
    the caller's range list so the driver merge is elementwise
    addition.  Nulls never match any range (mirrors SQL comparison
    semantics)."""
    out: dict[str, list[int]] = {}
    for c, bounds in ranges.items():
        vals = dm.gather(ids, c).drop_null()
        v = vals.to_numpy(zero_copy_only=False).astype(np.float64)
        cnts = []
        for lo, hi in bounds:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi
            cnts.append(int(m.sum()))
        out[c] = cnts
    return out


def _merge_ranges(parts: list[dict]) -> dict:
    """Elementwise fold of per-scope range-count lists (disjoint doc
    slices -> exact addition)."""
    out: dict[str, list[int]] = {}
    for p in parts:
        for c, cnts in p.items():
            if c not in out:
                out[c] = list(cnts)
            else:
                out[c] = [a + b for a, b in zip(out[c], cnts)]
    return out


def _composite_over(ids, dm, cols: list[str]) -> dict:
    """Composite-aggregation bucket counts over one scope's matched doc
    ids: ``(v1, v2, ...) -> count`` via one vectorized Arrow group_by
    over the gathered key columns (tiny output: one row per distinct
    key tuple, never per doc)."""
    tbl = pa.table({c: dm.gather(ids, c) for c in cols})
    tbl = tbl.drop_null()  # null key values drop (mirrors SQL GROUP BY
    # join semantics and keeps the driver's key sort total-orderable)
    agg = tbl.group_by(cols).aggregate([([], "count_all")])
    keys = [agg[c].to_pylist() for c in cols]
    cnts = agg["count_all"].to_pylist()
    return {tuple(k[i] for k in keys): int(cnts[i]) for i in range(len(cnts))}


def _merge_composite(parts: list[dict]) -> dict:
    """Additive fold of per-scope composite bucket dicts."""
    out: dict[tuple, int] = {}
    for p in parts:
        for k, n in p.items():
            out[k] = out.get(k, 0) + n
    return out


def _page_composite(
    merged: dict, size: int, after: tuple | None
) -> tuple[list[tuple[tuple, int]], tuple | None]:
    """Key-ordered size/after paging over a merged composite bucket
    dict — THE paging definition every engine (single-field, multifield,
    both federations) shares, so a fix lands once."""
    keys = sorted(merged)
    if after is not None:
        keys = [k for k in keys if k > after]
    page = keys[:size]
    after_key = page[-1] if len(keys) > size else None
    return [(k, merged[k]) for k in page], after_key


def _collapse_from_top_hits(hits: dict, k: int) -> list[tuple[int, float, object]]:
    """Field collapsing from a per-group top_hits(k_per=1) result:
    flatten the champions and re-cut by (score desc, doc_id asc)."""
    flat = [(d, s, v) for v, lst in hits.items() for d, s in lst]
    flat.sort(key=lambda r: (-r[1], r[0]))
    return flat[:k]


def _pct_ranks_from_counts(cnts: list[int], values) -> dict[int, float] | None:
    """percentile_ranks driver math over the range-counts fan-out
    output: the last count is the (non-null) match total, one IEEE
    division per probe value (bit-identical to SQL's c::DOUBLE/n::DOUBLE)."""
    n = cnts[-1]
    if n == 0:
        return None
    return {int(v): c / n for v, c in zip(values, cnts[:-1])}


def _top_hits_over(ids, scores, dm, group_col: str, k_per: int) -> dict:
    """Per-bucket top hits over one scope's scored match set:
    ``group value -> [(doc_id, score), ...]`` cut to ``k_per`` by
    (score desc, doc_id asc).  Vectorized: dictionary-encode the group
    column, one lexsort, slice the first ``k_per`` of each group run.
    Scopes are disjoint doc slices, so the driver merge (concat +
    re-cut per value) is exact."""
    if len(ids) == 0:
        return {}
    arr = dm.gather(ids, group_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -scores, codes))
    sc, sids, sscores = codes[order], ids[order], scores[order]
    out: dict = {}
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    ends = np.append(starts[1:], len(sc))
    dictionary = enc.dictionary.to_pylist()
    for s, e in zip(starts, ends):
        if sc[s] < 0:
            continue  # null group values drop (mirrors SQL GROUP BY join)
        cut = min(e, s + k_per)
        out[dictionary[sc[s]]] = [
            (int(d), float(x)) for d, x in zip(sids[s:cut], sscores[s:cut])
        ]
    return out


def _merge_top_hits(parts: list[dict], k_per: int) -> dict:
    """Fold per-scope top-hit lists: concat per group value, re-sort by
    (score desc, doc_id asc), cut to k_per — exact because each scope
    already kept its local top k_per and scopes are disjoint."""
    out: dict = {}
    for p in parts:
        for v, hits in p.items():
            out.setdefault(v, []).extend(hits)
    for v in out:
        out[v] = sorted(out[v], key=lambda h: (-h[1], h[0]))[:k_per]
    return out


def _combine_function_score(sc: np.ndarray, x: np.ndarray, spec: dict) -> np.ndarray:
    """function_score combine kernel, shared by the single-field and
    multifield servers: ``saturation`` = score + w*x/(x+pivot) (ES
    rank_feature), ``linear_decay`` = score * max(0,
    scale-|x-origin|)/scale.  One division / one multiply per doc —
    bitwise the SQL mirror (no transcendentals)."""
    if spec["kind"] == "saturation":
        w, pivot = float(spec["w"]), int(spec["pivot"])
        return sc + w * (x.astype(np.float64) / (x + pivot).astype(np.float64))
    if spec["kind"] == "linear_decay":
        origin, scale = int(spec["origin"]), int(spec["scale"])
        decay = np.maximum(scale - np.abs(x - origin), 0).astype(np.float64) / float(scale)
        return sc * decay
    if spec["kind"] == "distance_feature":
        # ES distance_feature query: score + boost * pivot/(pivot+dist)
        # with dist = |x - origin| — the close-to-origin analog of
        # rank_feature's saturation (integer dist, one division, so the
        # SQL mirror is bitwise).
        w = float(spec["w"])
        origin, pivot = int(spec["origin"]), int(spec["pivot"])
        dist = np.abs(x - origin)
        return sc + w * (float(pivot) / (dist + pivot).astype(np.float64))
    if spec["kind"] == "field_value_factor":
        # ES field_value_factor (combine: multiply): score * (factor *
        # modifier(field)).  log1p is computed as ln(1 + x) — NOT
        # numpy's log1p — so the DuckDB mirror ``ln(1 + x)`` is the
        # identical float expression; sqrt is correctly rounded in
        # both engines.
        f = float(spec["factor"])
        mod = spec.get("modifier", "none")
        v = x.astype(np.float64)
        if mod == "log1p":
            v = np.log(1.0 + v)
        elif mod == "sqrt":
            v = np.sqrt(v)
        elif mod != "none":
            raise ValueError(f"unknown field_value_factor modifier {mod!r}")
        return sc * (f * v)
    if spec["kind"] == "random":
        # ES random_score (seeded): deterministic per-doc hash blended
        # into the score — here ``x`` IS the doc-id array (no docmeta
        # gather).  r = md5_lower64(str(doc_id)) / 2^64: the uint64 ->
        # double cast and the exact power-of-two scaling are both
        # correctly rounded, so this mirrors DuckDB's
        # ``md5_number_lower(doc_id::VARCHAR)::DOUBLE / 2^64`` bitwise.
        import pyarrow.compute as pc_

        from .hashing import md5_lower64

        w = float(spec["w"])
        h = md5_lower64(pc_.cast(pa.array(x.astype(np.int64)), pa.string()))
        return sc + w * (h.astype(np.float64) / 18446744073709551616.0)
    raise ValueError(f"unknown function_score kind {spec['kind']!r}")


def _fscore_feature(ids: np.ndarray, dm, spec: dict) -> np.ndarray:
    """The function_score feature vector: ``random`` keys off the doc
    id itself (hashed in the kernel); every other kind gathers its
    docmeta feature column."""
    if spec["kind"] == "random":
        return ids.astype(np.int64)
    return dm.gather(ids, spec["col"]).to_numpy(zero_copy_only=False).astype(np.int64)


def load_vocab(meta: IndexMeta) -> list[str]:
    """Index vocabulary: the union of the partitions' ``_termdf.parquet``
    term columns (vocabulary-sized, NOT corpus-sized — this is the same
    tiny summary doc-sharded servers read for corpus-global df).  Used
    driver-side to rewrite wildcard/fuzzy query atoms into concrete
    terms; servers never need it."""
    cols = []
    for p in range(meta.num_parts):
        path = os.path.join(meta.part_dir(p), "_termdf.parquet")
        if os.path.exists(path):
            cols.append(pq.read_table(path, columns=["term"])["term"])
    if not cols:
        return []
    return pa.chunked_array(cols).to_pylist()


@ray.remote
class ShardServer:
    """Owns a set of term partitions — whole lists (term-sharded) or a
    doc-range bucket slice of every list (doc-sharded, ``buckets``);
    loads once, serves many queries.

    Doc-sharded load is PRUNED AT THE READ: the partition layout is one
    file per doc-range bucket, so a server opens only its assigned
    bucket files — bytes read per server ~ 1/S of the index, no loader
    tasks, no shared full-file decode, and partitions larger than one
    worker's memory still serve."""

    def __init__(
        self,
        index_dir: str,
        parts: list[int],
        buckets: list[int] | None = None,
        fed: str | None = None,
    ):
        meta = IndexMeta(index_dir)
        self.parts = {p: ShardPartition(meta.part_dir(p), buckets=buckets) for p in parts}
        self.stats = GlobalStats(meta.n_docs, meta.avgdl)
        self.n_docs = meta.n_docs
        # block-max umax annotations were computed with the BUILD-time
        # avgdl; a federation override changes avgdl, so WAND's pruning
        # bounds would be invalid (u grows with avgdl) — fed members
        # route every wand request through exact TAAT instead
        self._fed_override = fed is not None
        if fed is not None:
            # federation member (cb.federated): score with the
            # federation-global (N, avgdl) and per-term df so top-k
            # lists merge exactly across sub-indexes
            # (dfs_query_then_fetch).  df overlays are read per OWNED
            # term partition from the tiny feddf summaries — never a
            # whole-vocabulary driver object.
            import json as _json

            from . import federated as _fed

            with open(_fed.fed_meta_path(fed)) as f:
                fg = _json.load(f)
            self.stats = GlobalStats(fg["n_docs"], fg["avgdl"])
            self.n_docs = fg["n_docs"]
            for p, part in self.parts.items():
                fp = _fed.feddf_path(fed, p)
                if os.path.exists(fp):
                    t = pq.read_table(fp)
                    part.global_df = dict(
                        zip(t["term"].to_pylist(), t["df"].to_pylist())
                    )
        self.num_parts = meta.num_parts
        self.range_bits = meta.range_bits
        self.index_dir = index_dir
        self.buckets = buckets  # doc-range subset (doc-sharded mode)
        # tombstones are read ONCE at server start: deletes issued later
        # need a new engine (documented delete_docs contract)
        self.tombstones = load_tombstones(index_dir)
        self._docmeta = None  # lazy DocMeta for filtered search
        self._docstats = None  # lazy bucket-pruned doc-length lookup
        from collections import OrderedDict

        from .telemetry import Telemetry

        self.cache: dict[str, ChunkedPostings | None] = {}
        self.decoded: dict[str, tuple] = {}  # term -> (ids, contrib) numpy
        # (terms, k, algo) -> result, true LRU (hits refresh recency)
        self.results: OrderedDict[tuple, list] = OrderedDict()
        self._results_cap = 4096
        # ES request-cache analog: parsed clause set -> this scope's
        # matched doc ids.  Every full-match aggregation (facets,
        # histogram, range, composite, sampler, filters, adjacency,
        # significant) shares it, so repeated aggregations over the
        # same query pay the match pass once per server lifetime.
        # Safe because the inputs are fixed per server: the index is
        # immutable, tombstones load once, docmeta is read-only.
        self._match_cache: OrderedDict[str, np.ndarray | None] = OrderedDict()
        self._match_cache_cap = 32
        # per-actor stage counters (TelemetryProvider.cs analog);
        # rolled up by QueryEngine.metrics()
        self.telemetry = Telemetry()

    def _cached_match(self, parsed: dict, dm) -> np.ndarray | None:
        """This scope's matched doc ids for a parsed clause set, LRU-
        cached (the ES request cache): None = nothing can match."""
        from . import querylang

        key = repr(parsed)
        hit = self._match_cache.get(key)
        if hit is not None or key in self._match_cache:
            self._match_cache.move_to_end(key)
            self.telemetry.incr("server.match_cache_hit")
            return hit
        universe, _, keep = querylang.match(
            parsed,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        ids = None if universe is None else universe[keep]
        if len(self._match_cache) >= self._match_cache_cap:
            self._match_cache.popitem(last=False)
        self._match_cache[key] = ids
        return ids

    def _local(self, term: str) -> ChunkedPostings | None:
        if term not in self.cache:
            p = term_partition(term, self.num_parts)
            part = self.parts.get(p)
            self.cache[term] = part.get(term) if part is not None else None
        return self.cache[term]

    def get_postings(self, term: str) -> ChunkedPostings | None:
        return self._local(term)

    def warm(self, min_df: int = 0) -> int:
        """Pre-decode postings + contribution vectors for owned terms
        with df >= min_df (the first-touch decode otherwise lands on the
        first query: p95). Returns the number of terms warmed."""
        n = 0
        for part in self.parts.values():
            if part.table is None:
                continue
            for term in part.offsets:
                cp = self._local(term)
                if cp is None or cp.gdf < min_df or term in self.decoded:
                    continue
                ids, tfs, dls = cp.decode_all()
                # weight-independent u-vector; idf multiplies at use
                # (matches taat_scores' cache contract)
                self.decoded[term] = (ids, scoring.u_factor(tfs, dls, self.stats.avgdl))
                n += 1
        return n

    def score(self, terms: list[str], k: int, fetched_terms: list[str], *fetched, algo: str = "taat"):
        """Run top-k over the query terms; ``fetched`` are ChunkedPostings
        for non-local terms (passed as ObjectRefs, resolved by Ray).

        Default scorer is the vectorized exact TAAT (fastest for
        in-memory postings); ``algo="wand"`` selects block-max WAND —
        rank-identical by construction and by test.
        """
        if algo == "wand" and self._fed_override:
            algo = "taat"  # stored umax bounds are sub-index-avgdl-based
        key = (tuple(terms), k, algo)
        hit = self.results.get(key)
        if hit is not None:
            self.results.move_to_end(key)  # LRU: refresh recency on hit
            self.telemetry.incr("server.result_cache_hit")
            return hit  # exact: the index is immutable for a server's lifetime
        t0 = __import__("time").perf_counter()
        self.telemetry.incr("server.terms", len(terms))
        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p  # keep remote-fetched postings for repeat queries
        for t in terms:
            if t not in postings:
                postings[t] = self._local(t)
        live = {t: p for t, p in postings.items() if p is not None}
        idfs = {t: float(scoring.idf(p.gdf, self.n_docs)) for t, p in live.items()}
        if len(self.tombstones):
            # deletes present: mask the universe BEFORE ranking (WAND's
            # heap can't un-admit a tombstoned doc, so route via exact
            # TAAT — rank-identical by construction and by test)
            from .query import rank_topk

            universe, acc = wand.taat_scores(live, idfs, self.stats, decoded_cache=self.decoded)
            if universe is None:
                res = []
            else:
                keep = _live_mask(universe, self.tombstones)
                res = rank_topk(universe[keep], acc[keep], k)
        elif algo == "wand":
            res = wand.topk_wand(live, idfs, self.stats, k)
        else:
            res = wand.topk_taat(live, idfs, self.stats, k, decoded_cache=self.decoded)
        if len(self.results) >= self._results_cap:
            self.results.popitem(last=False)  # evict least-recently-used
        self.results[key] = res
        self.telemetry.record(
            "server.score", __import__("time").perf_counter() - t0
        )
        return res

    def metrics(self) -> dict:
        return self.telemetry.snapshot()

    def score_filtered(
        self, terms: list[str], k: int, filters: dict,
        fetched_terms: list[str], *fetched,
    ):
        """Filtered BM25 (ES ``bool: {must: match, filter: term}``
        parity): exact TAAT over the query terms, then the metadata
        predicate masks the candidate universe BEFORE ranking — the
        filter context never changes scores, only membership.  DocMeta
        loads lazily once per server; a doc-sharded server passes its
        bucket range so the filter table shards with the postings."""
        from . import docmeta as docmeta_mod

        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p
        for t in terms:
            if t not in postings:
                postings[t] = self._local(t)
        live = {t: p for t, p in postings.items() if p is not None}
        idfs = {t: float(scoring.idf(p.gdf, self.n_docs)) for t, p in live.items()}
        universe, acc = wand.taat_scores(live, idfs, self.stats, decoded_cache=self.decoded)
        if universe is None:
            return []
        keep = self._docmeta.mask(universe, filters) & _live_mask(universe, self.tombstones)
        from .query import rank_topk

        return rank_topk(universe[keep], acc[keep], k)

    def query_string(self, parsed: dict, k: int, fetched_terms: list[str] = (), *fetched):
        """Lucene-lite query over this server's scope (doc-sharded: its
        disjoint doc slice — the driver merge stays exact because every
        clause is evaluated per doc).  ``fetched`` carries non-local
        postings in term-sharded mode (same protocol as score)."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if parsed.get("filters") or parsed.get("scoped_phrases"):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta
        return querylang.execute(
            parsed,
            get_postings=self._local,
            stats=self.stats,
            k=k,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )

    def facet_counts(
        self, parsed: dict, facet_cols: list[str], stats_cols: list[str],
        fetched_terms: list[str] = (), *fetched,
    ):
        """ES-style aggregations over THIS scope's full match set of a
        query string (not just top-k): terms facets + numeric stats from
        docmeta.  Doc-sharded servers each aggregate their disjoint doc
        slice; the driver merge is exact addition."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None:
            return {c: {} for c in facet_cols}, {c: (0, 0, None, None) for c in stats_cols}
        return _facets_over(ids, self._docmeta, facet_cols, stats_cols)

    def stats_ext(
        self, parsed: dict, cols: list[str], fetched_terms: list[str] = (), *fetched
    ) -> dict:
        """ES extended_stats over THIS scope's full match set: the
        stats agg plus an exact sum-of-squares, so the driver derives
        avg/variance/std from additive integer partials."""
        from . import docmeta as docmeta_mod

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None:
            return {c: (0, 0, 0, None, None) for c in cols}
        return _stats_ext_over(ids, self._docmeta, cols)

    def matrix_stats(
        self, parsed: dict, col: str, fetched_terms: list[str] = (), *fetched
    ) -> tuple[int, int, int, int, int, int]:
        """ES matrix_stats partials over THIS scope's full match set
        for the pair (x = docmeta ``col``, y = doc token length from
        the bucket-pruned docstats): EXACT integer
        (n, sx, sy, sxx, syy, sxy) — disjoint doc slices add exactly,
        and the driver derives means/variances/covariance/correlation
        with one double op per moment, bitwise vs the SQL mirror.
        Overflow-guarded like _stats_ext_over: vectorized when the
        whole sum provably fits int64, Python-int fold otherwise."""
        from . import docmeta as docmeta_mod

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None or len(ids) == 0:
            return (0, 0, 0, 0, 0, 0)
        if self._docstats is None:
            self._docstats = DocStats.load(self.index_dir, buckets=self.buckets)
        x = (
            self._docmeta.gather(ids, col)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        y = self._docstats.lookup(ids)
        n = len(ids)
        bx = int(np.abs(x).max())
        by = int(np.abs(y).max())
        if n * max(bx * bx, by * by, bx * by) < (1 << 62):
            return (
                n, int(x.sum()), int(y.sum()),
                int((x * x).sum()), int((y * y).sum()), int((x * y).sum()),
            )
        xi = [int(v) for v in x]
        yi = [int(v) for v in y]
        return (
            n, sum(xi), sum(yi),
            sum(v * v for v in xi), sum(v * v for v in yi),
            sum(a * b for a, b in zip(xi, yi)),
        )

    def histogram(
        self, parsed: dict, histos: dict, fetched_terms: list[str] = (), *fetched
    ) -> dict:
        """Histogram aggregation over THIS scope's full match set of a
        query string (same match plumbing as facet_counts)."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None:
            return {c: {} for c in histos}
        return _histos_over(ids, self._docmeta, histos)

    def range_counts(
        self, parsed: dict, ranges: dict, fetched_terms: list[str] = (), *fetched
    ) -> dict:
        """ES range aggregation over THIS scope's full match set of a
        query string: explicit ``[lo, hi)`` buckets per numeric docmeta
        column (same match plumbing as facet_counts; driver merge is
        exact elementwise addition)."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None:
            return {c: [0] * len(b) for c, b in ranges.items()}
        return _ranges_over(ids, self._docmeta, ranges)

    def composite_counts(
        self, parsed: dict, cols: list[str], fetched_terms: list[str] = (), *fetched
    ) -> dict:
        """ES composite-aggregation source counts over THIS scope's
        full match set: ``(v1, v2, ...) -> count`` per distinct key
        tuple of the requested docmeta columns.  The driver merges
        additively, orders by key, and applies size/after paging —
        per-server output is one row per distinct key, never per doc."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        ids = self._cached_match(parsed, self._docmeta)
        if ids is None:
            return {}
        return _composite_over(ids, self._docmeta, list(cols))

    def top_hits(
        self, terms: list[str], k_per: int, group_col: str,
        fetched_terms: list[str] = (), *fetched,
    ) -> dict:
        """ES top_hits-inside-terms-agg over THIS scope: BM25 scores for
        the full match set (exact TAAT), grouped by a docmeta column,
        local top ``k_per`` per group value by (score desc, doc_id asc).
        Same plain-term fetch protocol as :meth:`score`; the driver
        re-cut per value is exact because scopes are disjoint."""
        from . import docmeta as docmeta_mod

        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p
        for t in terms:
            if t not in postings:
                postings[t] = self._local(t)
        live = {t: p for t, p in postings.items() if p is not None}
        if not live:
            return {}
        idfs = {t: float(scoring.idf(p.gdf, self.n_docs)) for t, p in live.items()}
        universe, acc = wand.taat_scores(live, idfs, self.stats, decoded_cache=self.decoded)
        if universe is None:
            return {}
        keep = _live_mask(universe, self.tombstones)
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        return _top_hits_over(universe[keep], acc[keep], self._docmeta, group_col, k_per)

    def top_metrics(
        self, parsed: dict, group_col: str, sort_col: str,
        metric_cols: list[str], k_per: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> dict:
        """ES top_metrics-inside-terms-agg over THIS scope: the match
        set grouped by ``group_col``, each group keeping the local top
        ``k_per`` rows by (``sort_col`` desc, doc_id asc), with the
        requested metric columns read off docmeta for the winners only.
        Rides _top_hits_over with the numeric sort column in the score
        slot — integer metric, so cross-slice re-cuts are exact."""
        from . import docmeta as docmeta_mod

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        if ids is None or len(ids) == 0:
            return {}
        import pyarrow.compute as pc_

        sort_vals = pc_.fill_null(
            dm.gather(ids, sort_col).cast(pa.float64()), float("-inf")
        ).to_numpy(zero_copy_only=False)
        hits = _top_hits_over(ids, sort_vals, dm, group_col, k_per)
        out = {}
        for v, rows in hits.items():
            wids = np.array([d for d, _ in rows], dtype=np.int64)
            metrics = {c: dm.gather(wids, c).to_pylist() for c in metric_cols}
            out[v] = [
                (int(d), float(s), tuple(metrics[c][i] for c in metric_cols))
                for i, (d, s) in enumerate(rows)
            ]
        return out

    def match_first(
        self, parsed: dict, k: int, fetched_terms: list[str] = (), *fetched
    ) -> list[int]:
        """The first ``k`` matching doc ids (id order) of THIS scope —
        the scoring-free half of ES ``constant_score``: disjoint sorted
        slices re-cut exactly at the driver."""
        from . import docmeta as docmeta_mod

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if parsed.get("filters") or parsed.get("scoped_phrases"):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        if ids is None:
            return []
        return np.sort(ids)[:k].tolist()

    def match_count(
        self, parsed: dict, fetched_terms: list[str] = (), *fetched
    ) -> int:
        """ES ``_count`` over THIS scope: size of the match set — ids
        never leave the server, disjoint slice counts add exactly at
        the driver."""
        from . import docmeta as docmeta_mod

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if parsed.get("filters") or parsed.get("scoped_phrases"):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        return 0 if ids is None else int(len(ids))

    def span_first(
        self, term: str, end: int, fetched_terms: list[str] = (), *fetched
    ) -> list[tuple[int, int]]:
        """ES ``span_first`` over THIS scope: (doc_id, first_position)
        for live docs whose first occurrence of ``term`` ends by
        position ``end`` — decoded straight off the positional
        postings, tombstone-masked, id-sorted."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        p = self._local(term)
        if p is None:
            return []
        ids, first = phrase_mod.span_first_docs(p, end)
        if len(ids) == 0:
            return []
        keep = _live_mask(ids, self.tombstones)
        return list(zip(ids[keep].tolist(), first[keep].tolist()))

    def terms_set(
        self, terms: list[str], spec: dict, k: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, float]]:
        """ES ``terms_set`` over THIS scope: BM25-scored term-OR match
        where each doc's own minimum_should_match comes from a doc
        field — ``required = min(cap, 1 + x // div)`` over the docmeta
        integer column ``spec['col']`` (the minimum_should_match_field
        contract, with the integer field derived by exact int ops so
        the SQL mirror reproduces it bit-for-bit).  Scores are the
        standard sorted-term TAAT sum; disjoint slices re-cut exactly
        at the driver."""
        from . import docmeta as docmeta_mod
        from .query import rank_topk

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        live = {t: self._local(t) for t in sorted(set(terms))}
        live = {t: p for t, p in live.items() if p is not None}
        if not live:
            return []
        idfs = {
            t: float(scoring.idf(getattr(p, "gdf", p.df), self.stats.n_docs))
            for t, p in live.items()
        }
        universe, acc = wand.taat_scores(
            live, idfs, self.stats, decoded_cache=self.decoded
        )
        if universe is None or len(universe) == 0:
            return []
        keep = _live_mask(universe, self.tombstones)
        cnt = np.zeros(len(universe), dtype=np.int64)
        for t, p in live.items():
            ids = (
                self.decoded[t][0]
                if self.decoded is not None and t in self.decoded
                else p.decode_all()[0]
            )
            cnt[np.searchsorted(universe, ids)] += 1
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        x = (
            self._docmeta.gather(universe, spec["col"])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        required = np.minimum(int(spec["cap"]), 1 + x // int(spec["div"]))
        keep &= cnt >= required
        ids, sc = universe[keep], acc[keep]
        if len(ids) == 0:
            return []
        return rank_topk(ids, sc, k)

    def span_or_first(
        self, terms: list[str], end: int, fetched_terms: list[str] = (), *fetched
    ) -> list[tuple[int, int]]:
        """ES ``span_first`` over a ``span_or`` of single-term clauses,
        THIS scope: (doc_id, earliest position over the term union)
        for live docs where ANY term first occurs before ``end`` —
        straight off the positional postings, tombstone-masked,
        id-sorted."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        chunkeds = [self._local(t) for t in sorted(set(terms))]
        ids, first = phrase_mod.span_or_first_docs(chunkeds, end)
        if len(ids) == 0:
            return []
        keep = _live_mask(ids, self.tombstones)
        return list(zip(ids[keep].tolist(), first[keep].tolist()))

    def span_not(
        self, term_a: str, term_b: str, slop: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, int]]:
        """ES ``span_not`` over THIS scope: (doc_id, first valid
        position) for live docs with an occurrence of ``term_a`` no
        closer than ``slop`` intervening tokens to any ``term_b`` —
        the exclusion dual of span_near, same vectorized keyed-
        searchsorted kernel (cb.phrase.span_not_docs)."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        pa_ = self._local(term_a)
        if pa_ is None:
            return []
        ids, pos = phrase_mod.span_not_docs(pa_, self._local(term_b), slop)
        if len(ids) == 0:
            return []
        keep = _live_mask(ids, self.tombstones)
        return list(zip(ids[keep].tolist(), pos[keep].tolist()))

    def bool_prefix(
        self, terms: list[str], prefix_terms: list[str], k: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, float]]:
        """ES ``match_bool_prefix`` over THIS scope: the complete terms
        score as BM25 shoulds (TAAT) and the trailing prefix, already
        expanded against the vocabulary driver-side, contributes a
        constant 1.0 to any doc matching ANY expansion (the ES
        ``rewrite: constant_score`` default for the prefix clause).
        Union semantics: prefix-only docs match too.  One float add in
        a fixed order, so the SQL mirror (coalesce(score,0)+1.0) is
        bitwise."""
        from .query import rank_topk

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        live = {t: self._local(t) for t in sorted(set(terms))}
        live = {t: p for t, p in live.items() if p is not None}
        idfs = {
            t: float(scoring.idf(getattr(p, "gdf", p.df), self.stats.n_docs))
            for t, p in live.items()
        }
        universe, acc = (None, None)
        if live:
            universe, acc = wand.taat_scores(
                live, idfs, self.stats, decoded_cache=self.decoded
            )
        pid_arrays = []
        for t in sorted(set(prefix_terms)):
            p = self._local(t)
            if p is None:
                continue
            hit = self.decoded.get(t)
            pid_arrays.append(hit[0] if hit is not None else p.decode_all()[0])
        pids = (
            np.unique(np.concatenate(pid_arrays))
            if pid_arrays
            else np.empty(0, dtype=np.int64)
        )
        if universe is None and len(pids) == 0:
            return []
        base = universe if universe is not None else np.empty(0, dtype=np.int64)
        full = np.union1d(base, pids)
        sc = np.zeros(len(full), dtype=np.float64)
        if universe is not None:
            sc[np.searchsorted(full, universe)] = acc
        if len(pids):
            sc[np.searchsorted(full, pids)] += 1.0
        keep = _live_mask(full, self.tombstones)
        ids, sc = full[keep], sc[keep]
        if len(ids) == 0:
            return []
        return rank_topk(ids, sc, k)

    def span_near(
        self, term_a: str, term_b: str, slop: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, int]]:
        """ES ``span_near`` (in_order=false, two terms) over THIS
        scope: (doc_id, intervening-token gap) for live docs where the
        terms co-occur within ``slop`` positions — vectorized off the
        positional postings (cb.phrase.span_near_docs), tombstone-
        masked, id-sorted."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        pa_, pb_ = self._local(term_a), self._local(term_b)
        if pa_ is None or pb_ is None:
            return []
        ids, gaps = phrase_mod.span_near_docs(pa_, pb_, slop)
        if len(ids) == 0:
            return []
        keep = _live_mask(ids, self.tombstones)
        return list(zip(ids[keep].tolist(), gaps[keep].tolist()))

    def intervals_q(
        self, terms: list[str], max_gaps: int, ordered: bool,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, int]]:
        """ES ``intervals`` (match rule, N single-term clauses) over
        THIS scope: (doc_id, min_gaps) for live docs where some
        one-occurrence-per-term tuple — in query order when
        ``ordered`` — spans at most ``max_gaps`` intervening positions
        (cb.phrase.intervals_docs), tombstone-masked, id-sorted."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        chunkeds = [self._local(t) for t in terms]
        ids, gaps = phrase_mod.intervals_docs(chunkeds, max_gaps, ordered)
        if len(ids) == 0:
            return []
        keep = _live_mask(ids, self.tombstones)
        return list(zip(ids[keep].tolist(), gaps[keep].tolist()))

    def reload_tombstones(self) -> int:
        """Re-read `_tombstones.json` (the ES `_refresh` visibility
        point for deletes): a running server pins the tombstone set it
        loaded — point-in-time semantics — until told to refresh.
        Clears the match-result cache (cached match sets embed the old
        mask).  Returns the live tombstone count."""
        self.tombstones = load_tombstones(self.index_dir)
        if getattr(self, "_match_cache", None):
            self._match_cache.clear()
        if getattr(self, "results", None):
            self.results.clear()  # scored-result LRU embeds the old mask
        return int(len(self.tombstones))

    def terms_stats(
        self, parsed: dict, group_col: str, stat_col: str,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple]:
        """ES terms agg with a metric sub-agg, kernel over THIS scope:
        the query's FULL match set grouped by the ``group_col`` docmeta
        value — ``(value, count, sum(stat_col))`` per value seen here.
        Exact integers, so disjoint doc slices ADD at the driver (the
        order-by-metric cut happens there, over complete sums — never
        the shard-local approximation ES documents as a pitfall).
        Vectorized: dictionary-encode + lexsort + add.reduceat; null
        group keys drop (the GROUP-BY convention shared with
        join_children)."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        universe, acc, keep = querylang.match(
            parsed,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        if universe is None:
            return []
        ids = universe[keep]
        if len(ids) == 0:
            return []
        arr = dm.gather(ids, group_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        x = (
            dm.gather(ids, stat_col)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        enc = arr.dictionary_encode()
        codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        scodes, sx = codes[order], x[order]
        starts = np.flatnonzero(np.r_[True, scodes[1:] != scodes[:-1]])
        sums = np.add.reduceat(sx, starts)
        counts = np.diff(np.append(starts, len(scodes)))
        dictionary = enc.dictionary.to_pylist()
        return [
            (dictionary[scodes[s]], int(c), int(sm))
            for s, c, sm in zip(starts, counts, sums)
            if scodes[s] >= 0
        ]

    def lm_counts(
        self, unigrams: list[str], bigrams: list[tuple[str, str]],
        fetched_terms: list[str] = (), *fetched,
    ) -> tuple[dict, dict]:
        """Language-model count kernel over THIS scope (the phrase
        suggester's evidence): collection frequency (total occurrences,
        live docs) per requested unigram, and adjacent-pair counts per
        requested bigram off the positional postings — exact integers,
        so disjoint doc slices sum at the driver.  Only the
        candidate-set terms are decoded: the broadcast stays
        query-sized, never vocabulary-sized."""
        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        decs = {}
        cf: dict[str, int] = {}
        for t in unigrams:
            p = self._local(t)
            if p is None:
                continue
            d = phrase_mod.decode_live(p, self.tombstones)
            decs[t] = d
            cf[t] = int(d[1].sum())
        bc: dict[tuple[str, str], int] = {}
        for a, b in bigrams:
            if a in decs and b in decs:
                c = phrase_mod.adjacent_pair_count(decs[a], decs[b])
                if c:
                    bc[(a, b)] = c
        return cf, bc

    def join_children(
        self, parsed: dict, parent_col: str,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple]:
        """ES join-field ``has_child`` kernel over THIS scope: the
        query's FULL match set scored, grouped by the parent key read
        off the docmeta column — ``(parent_value, max_score,
        n_children)`` per parent seen in this scope.  Vectorized
        (dictionary-encode + lexsort + maximum.reduceat); max and count
        merge exactly across disjoint doc slices at the driver.  Null
        parent keys drop (the SQL GROUP-BY-join convention shared with
        _top_hits_over)."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        universe, acc, keep = querylang.match(
            parsed,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        if universe is None:
            return []
        ids, sc = universe[keep], acc[keep]
        if len(ids) == 0:
            return []
        arr = dm.gather(ids, parent_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = arr.dictionary_encode()
        codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        scodes, ssc = codes[order], sc[order]
        starts = np.flatnonzero(np.r_[True, scodes[1:] != scodes[:-1]])
        maxes = np.maximum.reduceat(ssc, starts)
        counts = np.diff(np.append(starts, len(scodes)))
        dictionary = enc.dictionary.to_pylist()
        return [
            (dictionary[scodes[s]], float(m), int(c))
            for s, m, c in zip(starts, maxes, counts)
            if scodes[s] >= 0
        ]

    def parent_docs(
        self, parent_scores: dict, parent_col: str, k: int
    ) -> list[tuple[int, float]]:
        """ES ``has_parent`` second phase over THIS doc slice: every
        live doc whose parent key is in ``parent_scores`` gets its
        parent's score; local (score desc, doc_id asc) top-k.  One
        vectorized is_in over the slice's docmeta column — no postings
        touched; disjoint slices re-cut exactly at the driver."""
        import pyarrow.compute as pc_

        from . import docmeta as docmeta_mod
        from .query import rank_topk

        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        if len(dm.ids) == 0 or not parent_scores:
            return []
        parents = sorted(parent_scores)
        col = dm.cols[parent_col]
        m = pc_.fill_null(
            pc_.is_in(col, value_set=pa.array(parents)), False
        ).to_numpy(zero_copy_only=False)
        ids = dm.ids[np.asarray(m, dtype=bool)]
        if len(self.tombstones):
            ids = ids[_live_mask(ids, self.tombstones)]
        if len(ids) == 0:
            return []
        vals = dm.gather(ids, parent_col).to_pylist()
        sc = np.array([parent_scores[v] for v in vals], dtype=np.float64)
        return rank_topk(ids, sc, k)

    def get_docs(self, doc_ids: list[int], cols: list[str]) -> list[tuple]:
        """ES ``_mget`` over THIS doc-range slice: (doc_id, *col
        values) for every requested id this slice's doc store holds;
        absent and tombstoned ids are omitted (the 404 half of mget),
        so the disjoint-slice fan-out concatenates duplicate-free."""
        from . import docmeta as docmeta_mod

        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        ids = ids[_live_mask(ids, self.tombstones)]
        if len(ids) == 0 or len(dm.ids) == 0:
            return []
        pos = np.clip(np.searchsorted(dm.ids, ids), 0, len(dm.ids) - 1)
        ids = ids[dm.ids[pos] == ids]
        if len(ids) == 0:
            return []
        out_cols = [dm.gather(ids, c).to_pylist() for c in cols]
        return [
            tuple([int(i)] + [col[j] for col in out_cols])
            for j, i in enumerate(ids)
        ]

    def sample_hits(
        self, parsed: dict, k: int, fetched_terms: list[str] = (), *fetched
    ) -> list[tuple[int, int]]:
        """ES sampler aggregation, deterministically: the k lowest
        md5-hashed docs of THIS scope's full match set, as (doc_id,
        hash) pairs.  Hash order is a fixed uniform shuffle of the doc
        id space, so per-scope local top-k by (hash, doc_id) re-cut at
        the driver IS the global sample — no reservoir, no RNG state,
        rerun-stable and SQL-mirrorable."""
        from . import docmeta as docmeta_mod, querylang
        from .hashing import md5_lower64

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if parsed.get("filters") or parsed.get("scoped_phrases"):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        if ids is None or len(ids) == 0:
            return []
        import pyarrow.compute as pc_

        h = md5_lower64(pc_.cast(pa.array(ids), pa.string()))
        order = np.lexsort((ids, h))[:k]
        return [(int(ids[i]), int(h[i])) for i in order]

    def diversified_hits(
        self, parsed: dict, col: str, k: int, max_per: int,
        fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, int, str]]:
        """ES diversified_sampler over THIS scope, deterministically:
        candidates for the md5(doc_id)-order uniform sample with at
        most ``max_per`` docs per distinct ``col`` value.  Per scope we
        keep the max_per LOWEST (hash, id) per value — a superset of
        every global survivor (the global per-value cut can only drop
        more), so the driver's identical re-cut is exact.  Returns
        (doc_id, hash, value) triples, ≤ max_per per value."""
        from . import docmeta as docmeta_mod
        from .hashing import md5_lower64

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        if ids is None or len(ids) == 0:
            return []
        import pyarrow.compute as pc_

        vals = dm.gather(ids, col)
        enc = vals.combine_chunks().dictionary_encode() if isinstance(
            vals, pa.ChunkedArray
        ) else vals.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary.to_pylist()
        h = md5_lower64(pc_.cast(pa.array(ids), pa.string()))
        order = np.lexsort((ids, h, codes))
        sc, si, sh = codes[order], ids[order], h[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        rank_in_val = np.arange(len(sc)) - np.repeat(
            starts, np.diff(np.append(starts, len(sc)))
        )
        keep = rank_in_val < max_per
        return [
            (int(d), int(x), dictionary[c])
            for d, x, c in zip(si[keep], sh[keep], sc[keep])
        ]

    def function_score(
        self, parsed: dict, spec: dict, k: int, fetched_terms: list[str] = (), *fetched
    ) -> list[tuple[int, float]]:
        """ES function_score over the query's FULL match set: the BM25
        score of every matching doc in this scope is combined with a
        docmeta-feature function BEFORE the top-k cut (unlike rescore,
        which only re-ranks a first-pass window).  Disjoint doc slices
        -> per-server local top-k re-cuts exactly at the driver.

        ``spec`` kinds (both bitwise-mirrorable — one division / one
        multiply per doc, no transcendentals):

        - ``saturation`` (ES rank_feature): ``score + w * x/(x+pivot)``
        - ``linear_decay``: ``score * max(0, scale-|x-origin|)/scale``
        """
        from . import docmeta as docmeta_mod, querylang
        from .query import rank_topk

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        universe, acc, keep = querylang.match(
            parsed,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        if universe is None:
            return []
        ids, sc = universe[keep], acc[keep]
        if len(ids) == 0:
            return []
        x = _fscore_feature(ids, dm, spec)
        return rank_topk(ids, _combine_function_score(sc, x, spec), k)

    def boosting(
        self, parsed_pos: dict, parsed_neg: dict, negative_boost: float,
        k: int, fetched_terms: list[str] = (), *fetched,
    ) -> list[tuple[int, float]]:
        """ES ``boosting`` query over THIS scope: the positive clause's
        full-match BM25 scores, multiplied by ``negative_boost`` for
        docs that ALSO match the negative clause — demotion is
        membership-only (ES never scores the negative query).  One
        multiply by an exact binary fraction per demoted doc, so the
        SQL mirror (score * CASE WHEN matched THEN nb ELSE 1) is
        bitwise; per-doc, so disjoint doc slices re-cut exactly."""
        from . import docmeta as docmeta_mod, querylang
        from .query import rank_topk

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if any(
            p.get("filters") or p.get("scoped_phrases")
            for p in (parsed_pos, parsed_neg)
        ):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(
                    self.index_dir, buckets=self.buckets
                )
            dm = self._docmeta
        universe, acc, keep = querylang.match(
            parsed_pos,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        if universe is None:
            return []
        ids, sc = universe[keep], acc[keep]
        if len(ids) == 0:
            return []
        nuni, _, nkeep = querylang.match(
            parsed_neg,
            get_postings=self._local,
            stats=self.stats,
            docmeta=dm,
            decoded_cache=self.decoded,
            drop_ids=self.tombstones,
        )
        if nuni is not None:
            demote = np.isin(ids, nuni[nkeep], assume_unique=True)
            sc = np.where(demote, sc * float(negative_boost), sc)
        return rank_topk(ids, sc, k)

    def explain(
        self, terms: list[str], doc_id: int, fetched_terms: list[str] = (), *fetched
    ) -> list[tuple[str, int, int, float]]:
        """ES explain API: per-term BM25 contribution breakdown for ONE
        document — (term, tf, doc_len, contribution) for every query
        term the doc contains, computed with exactly the scoring
        kernel's idf * u factors (the sum of contributions IS the doc's
        TAAT score, bitwise).  Doc-sharded: only the server whose slice
        holds the doc emits rows."""
        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p
        for t in terms:
            if t not in postings:
                postings[t] = self._local(t)
        out: list[tuple[str, int, int, float]] = []
        if len(self.tombstones) and not _live_mask(
            np.array([doc_id], dtype=np.int64), self.tombstones
        )[0]:
            return out
        for t in sorted(terms):
            p = postings.get(t)
            if p is None:
                continue
            ids, tfs, dls = p.decode_all()
            j = int(np.searchsorted(ids, doc_id))
            if j < len(ids) and ids[j] == doc_id:
                idf = float(scoring.idf(p.gdf, self.n_docs))
                u = float(scoring.u_factor(tfs[j : j + 1], dls[j : j + 1], self.stats.avgdl)[0])
                out.append((t, int(tfs[j]), int(dls[j]), idf * u))
        return out

    def filter_counts(
        self, parsed: dict, named: dict, fetched_terms: list[str] = (), *fetched
    ) -> dict[str, int]:
        """ES ``filters`` aggregation over THIS scope: for each named
        sub-query, |match(main) ∩ match(sub)| on this disjoint doc
        slice (both match sets come from the same querylang.match
        plumbing; the driver fold is exact addition).  Sub-queries are
        parsed/expanded driver-side and shipped concrete."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        need_dm = parsed.get("filters") or parsed.get("scoped_phrases") or any(
            sp.get("filters") or sp.get("scoped_phrases") for sp in named.values()
        )
        dm = None
        if need_dm:
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta

        main = self._cached_match(parsed, dm)
        out: dict[str, int] = {}
        for name, sub_parsed in named.items():
            if main is None or len(main) == 0:
                out[name] = 0
                continue
            sub = self._cached_match(sub_parsed, dm)
            if sub is None or len(sub) == 0:
                out[name] = 0
                continue
            out[name] = int(len(np.intersect1d(main, sub, assume_unique=True)))
        return out

    def adjacency_counts(
        self, parsed: dict, named: dict, fetched_terms: list[str] = (), *fetched
    ) -> dict[tuple[str, str], int]:
        """ES ``adjacency_matrix`` aggregation over THIS scope: for
        every named filter pair (a, b) with a <= b, the count of
        main-match docs in match(a) ∩ match(b) (the diagonal (a, a) is
        the plain filters-agg bucket).  Per-name match sets are
        computed ONCE on this slice, pairwise intersections are sorted
        numpy intersects; the driver fold is exact addition."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        need_dm = parsed.get("filters") or parsed.get("scoped_phrases") or any(
            sp.get("filters") or sp.get("scoped_phrases") for sp in named.values()
        )
        dm = None
        if need_dm:
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta

        def _match_ids(p_):
            ids = self._cached_match(p_, dm)
            return np.empty(0, np.int64) if ids is None else ids

        main = _match_ids(parsed)
        names = sorted(named)
        sets = {}
        for name in names:
            sub = _match_ids(named[name])
            sets[name] = (
                np.intersect1d(main, sub, assume_unique=True)
                if len(main) and len(sub)
                else np.empty(0, np.int64)
            )
        out: dict[tuple[str, str], int] = {}
        for i, a in enumerate(names):
            out[(a, a)] = int(len(sets[a]))
            for b in names[i + 1 :]:
                out[(a, b)] = int(
                    len(np.intersect1d(sets[a], sets[b], assume_unique=True))
                )
        return out

    def significant(
        self, parsed: dict, min_df: int = 2, fetched_terms: list[str] = (), *fetched
    ) -> tuple[dict, int]:
        """Foreground term counts over THIS scope's match set (the
        per-server half of ES significant_terms): for every owned term
        with corpus df >= min_df, |postings(term) ∩ matched| via one
        vectorized searchsorted.  Without stored per-doc term vectors
        this walks the owned vocabulary once per query — warmed decodes
        (``warm``) make it a pure numpy pass; scopes are disjoint doc
        slices so the driver merge is exact addition."""
        from . import docmeta as docmeta_mod, querylang

        for t, p in zip(fetched_terms, fetched):
            self.cache[t] = p
        dm = None
        if parsed.get("filters") or parsed.get("scoped_phrases"):
            if self._docmeta is None:
                self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
            dm = self._docmeta
        ids = self._cached_match(parsed, dm)
        if ids is None:
            return {}, 0
        return self._sig_walk(np.sort(ids), min_df)

    def significant_meta(
        self, col: str, val, min_df: int = 2
    ) -> tuple[dict, int]:
        """Foreground term counts over a PURE docmeta-filter match set
        (``col == val`` — the filter-only background population of ES
        significant_terms' background_filter): one vectorized equality
        over this slice's docmeta, tombstone-masked, then the same
        owned-vocabulary walk as :meth:`significant`."""
        import pyarrow.compute as pc
        from . import docmeta as docmeta_mod

        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        arr = dm.cols.get(col)
        if arr is None or len(dm.ids) == 0:
            return {}, 0
        mask = pc.equal(arr, val)
        matched = dm.ids[mask.fill_null(False).to_numpy(zero_copy_only=False)]
        matched = matched[_live_mask(matched, self.tombstones)]
        if len(matched) == 0:
            return {}, 0
        return self._sig_walk(matched, min_df)

    def _sig_walk(self, matched: np.ndarray, min_df: int) -> tuple[dict, int]:
        """Owned-vocabulary intersection counts over a sorted matched-id
        array (the shared half of significant / significant_meta)."""
        counts: dict[str, int] = {}
        for part in self.parts.values():
            if part.table is None:
                continue
            for term in part.offsets:
                if part.global_df.get(term, 0) < min_df:
                    continue
                if term in self.decoded:
                    ids = self.decoded[term][0]
                else:
                    cp = self._local(term)
                    if cp is None:
                        continue
                    ids = cp.decode_all()[0]
                pos = np.clip(np.searchsorted(matched, ids), 0, len(matched) - 1)
                c = int(np.sum(matched[pos] == ids))
                if c:
                    counts[term] = c
        return counts, int(len(matched))

    def phrase(self, ordered_terms: list[str], k: int, fetched_terms: list[str], *fetched, slop: int = 0):
        """Exact phrase top-k (positional postings); same fetch protocol
        as :meth:`score`."""
        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p
        for t in set(ordered_terms):
            if t not in postings:
                postings[t] = self._local(t)
        return _phrase_topk_live(ordered_terms, postings, self.stats, k, self.tombstones, slop=slop)

    def phrase_prefix(
        self, fixed: list[str], expansions: list[str], k: int,
        fetched_terms: list[str] = (), *fetched
    ):
        """ES match_phrase_prefix over this scope (see
        cb.phrase.phrase_prefix_topk for the matching/scoring contract);
        same fetch protocol as :meth:`score`.  Tombstones are dropped
        from the FULL match set before ranking (no over-fetch needed —
        prefix matching computes the whole set anyway)."""
        postings = dict(zip(fetched_terms, fetched))
        for t, p in postings.items():
            self.cache[t] = p
        for t in set(fixed) | set(expansions):
            if t not in postings:
                postings[t] = self._local(t)
        return phrase_mod.phrase_prefix_topk(
            fixed, expansions, postings, self.stats, k, drop_ids=self.tombstones
        )

    def term_vectors(self, doc_ids: list[int]) -> list[tuple]:
        """ES _termvectors API from the positional index: for each
        requested doc THIS scope owns, every (term, tf, doc_len,
        positions) posting — bucket-pruned + candidate-block decode
        (see cb.termvectors).  Tombstoned docs return nothing (ES 404
        on a deleted doc).  Doc mode: only the owning server emits, so
        the engine concat is duplicate-free."""
        import pyarrow.compute as pc_

        from . import termvectors
        from .build import ID_BITS

        shift = ID_BITS - self.range_bits
        owned = set(self.buckets) if self.buckets is not None else None
        rows: list[tuple] = []
        for doc in doc_ids:
            doc = int(doc)
            if len(self.tombstones) and not _live_mask(
                np.array([doc], dtype=np.int64), self.tombstones
            )[0]:
                continue
            b = doc >> shift
            if owned is not None and b not in owned:
                continue
            for part in self.parts.values():
                if part.table is None:
                    continue
                t = part.table.filter(pc_.equal(part.table["bucket"], b))
                for term, tf, dl, pos in termvectors.doc_term_vectors(t, doc):
                    rows.append((doc, term, tf, dl, pos.tolist()))
        rows.sort(key=lambda r: (r[0], r[1]))
        return rows

    def term_vectors_store(
        self, doc_ids: list[int], text_col: str = "text"
    ) -> list[tuple]:
        """Doc-store term vectors: re-analyze the stored docmeta text
        column (ES's _termvectors-from-_source behavior, and the 100-TB
        fast path — O(doc length) per request, no index scan).  Output
        contract identical to :meth:`term_vectors`; the parity test
        between the two cross-proves the positional index against the
        analyzer."""
        from . import docmeta as docmeta_mod
        from .build import ID_BITS

        if self._docmeta is None:
            self._docmeta = docmeta_mod.DocMeta(self.index_dir, buckets=self.buckets)
        dm = self._docmeta
        if text_col not in dm.cols:
            raise ValueError(
                f"doc-store term vectors need docmeta column {text_col!r} "
                f"(has {sorted(dm.cols)}); build it with cb.docmeta or use "
                "the index path (term_vectors)"
            )
        shift = ID_BITS - self.range_bits
        owned = set(self.buckets) if self.buckets is not None else None
        ids = np.array(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
        if owned is not None and len(ids):
            ids = ids[np.isin(ids >> shift, np.array(sorted(owned), dtype=np.int64))]
        if len(self.tombstones) and len(ids):
            ids = ids[_live_mask(ids, self.tombstones)]
        if len(ids) == 0:
            return []
        texts = dm.gather(ids, text_col)
        rows: list[tuple] = []
        for doc, txt in zip(ids.tolist(), texts.to_pylist()):
            if txt is None:
                continue  # id not in this scope's docmeta slice
            toks = analyze.tokenize(txt)
            by_term: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                by_term.setdefault(t, []).append(i)
            for term in sorted(by_term):
                pos = by_term[term]
                rows.append((doc, term, len(pos), len(toks), pos))
        return rows

    def score_many(self, term_lists: list[list[str]], k: int, algo: str = "taat"):
        """Batched scoring of pre-tokenized queries whose terms this
        server already holds (warm path; one RPC amortizes round-trips)."""
        return [
            self.score(terms, k, [], algo=algo) for terms in term_lists
        ]

    def get_dfs(self, terms: list[str]) -> dict[str, int]:
        """Corpus-global df per term from the partition ``_termdf``
        summaries — NO postings decode (powers more_like_this term
        selection)."""
        out = {}
        for t in terms:
            part = self.parts.get(term_partition(t, self.num_parts))
            if part is not None:
                df = part.global_df.get(t)
                if df:
                    out[t] = int(df)
        return out


class LocalSearcher:
    """In-process searcher over a built index (tests / tiny corpora;
    production serving is the actor pool below)."""

    def __init__(self, index_dir: str, fed: str | None = None):
        self.meta = IndexMeta(index_dir)
        self.parts = {
            p: ShardPartition(self.meta.part_dir(p))
            for p in range(self.meta.num_parts)
        }
        self.stats = GlobalStats(self.meta.n_docs, self.meta.avgdl)
        self._fed_override = fed is not None  # see ShardServer: wand->taat
        if fed is not None:  # federation member: fed-global stats + df
            import json as _json

            from . import federated as _fed

            with open(_fed.fed_meta_path(fed)) as f:
                fg = _json.load(f)
            self.stats = GlobalStats(fg["n_docs"], fg["avgdl"])
            for p, part in self.parts.items():
                fp = _fed.feddf_path(fed, p)
                if os.path.exists(fp):
                    t = pq.read_table(fp)
                    part.global_df = dict(
                        zip(t["term"].to_pylist(), t["df"].to_pylist())
                    )
        self.tombstones = load_tombstones(index_dir)
        self._vocab: list[str] | None = None  # lazy, for wildcard/fuzzy

    def get_postings(self, term: str) -> ChunkedPostings | None:
        p = term_partition(term, self.meta.num_parts)
        return self.parts[p].get(term)

    def phrase_query(
        self, text: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        ordered = analyze.tokenize(text)
        postings = {t: self.get_postings(t) for t in set(ordered)}
        return _phrase_topk_live(ordered, postings, self.stats, k, self.tombstones, slop=slop)

    def search(
        self, query_string: str, k: int = 10, synonyms: dict | None = None
    ) -> list[tuple[int, float]]:
        """Lucene-lite query string (terms, "phrases", field:value,
        -exclusions, +required, ^boosts, wildcards, fuzzy, ranges) —
        see :mod:`cb.querylang`.  ``synonyms`` applies the ES
        query-time synonym filter (querylang.apply_synonyms)."""
        from . import docmeta as docmeta_mod, querylang

        parsed = querylang.parse(query_string)
        if parsed.get("expands"):
            if self._vocab is None:
                self._vocab = load_vocab(self.meta) or sorted(
                    {t for p in self.parts.values() for t in p.global_df}
                )
            parsed = querylang.expand(parsed, self._vocab)
        if synonyms:
            parsed = querylang.apply_synonyms(parsed, synonyms)
        dm = None
        if parsed["filters"] or parsed["scoped_phrases"]:
            try:
                dm = docmeta_mod.DocMeta(self.meta.index_dir)
            except FileNotFoundError:
                dm = None  # querylang raises the descriptive ValueError
        return querylang.execute(
            parsed, get_postings=self.get_postings, stats=self.stats, k=k, docmeta=dm,
            drop_ids=self.tombstones,
        )

    def facets(
        self, query_string: str, facet_cols=(), stats_cols=()
    ) -> tuple[dict, dict]:
        """In-process facet aggregation: ({col: {value: count}},
        {col: (n, sum, min, max)}) over the query's FULL match set."""
        from . import docmeta as docmeta_mod, querylang

        parsed = querylang.parse(query_string)
        if parsed.get("expands"):
            if self._vocab is None:
                self._vocab = load_vocab(self.meta) or sorted(
                    {t for p in self.parts.values() for t in p.global_df}
                )
            parsed = querylang.expand(parsed, self._vocab)
        dm = docmeta_mod.DocMeta(self.meta.index_dir)
        universe, _, keep = querylang.match(
            parsed, get_postings=self.get_postings, stats=self.stats,
            docmeta=dm, drop_ids=self.tombstones,
        )
        if universe is None:
            return (
                {c: {} for c in facet_cols},
                {c: (0, 0, None, None) for c in stats_cols},
            )
        return _facets_over(universe[keep], dm, list(facet_cols), list(stats_cols))

    def filtered_query(self, text: str, filters: dict, k: int = 10) -> list[tuple[int, float]]:
        """In-process filtered BM25 (ES bool must+filter parity)."""
        from . import docmeta as docmeta_mod
        from .query import rank_topk

        terms = sorted(set(analyze.tokenize(text)))
        postings = {t: self.get_postings(t) for t in terms}
        postings = {t: p for t, p in postings.items() if p is not None}
        if not postings:
            return []
        idfs = {t: float(scoring.idf(p.gdf, self.stats.n_docs)) for t, p in postings.items()}
        universe, acc = wand.taat_scores(postings, idfs, self.stats)
        if universe is None:
            return []
        dm = docmeta_mod.DocMeta(self.meta.index_dir)
        keep = dm.mask(universe, filters) & _live_mask(universe, self.tombstones)
        return rank_topk(universe[keep], acc[keep], k)

    def query(self, text: str, k: int = 10, algo: str = "wand") -> list[tuple[int, float]]:
        if algo == "wand" and self._fed_override:
            # stored block-max umax used the sub-index avgdl; the fed
            # avgdl can exceed it, invalidating WAND's bounds — exact
            # TAAT is rank-identical and always safe
            algo = "taat"
        terms = sorted(set(analyze.tokenize(text)))
        postings = {t: self.get_postings(t) for t in terms}
        postings = {t: p for t, p in postings.items() if p is not None}
        if not postings:
            return []
        idfs = {t: float(scoring.idf(p.gdf, self.stats.n_docs)) for t, p in postings.items()}
        if len(self.tombstones):
            from .query import rank_topk

            universe, acc = wand.taat_scores(postings, idfs, self.stats)
            if universe is None:
                return []
            keep = _live_mask(universe, self.tombstones)
            return rank_topk(universe[keep], acc[keep], k)
        fn = wand.topk_wand if algo == "wand" else wand.topk_taat
        return fn(postings, idfs, self.stats, k)


def _merge_topk(results: list[list[tuple[int, float]]], k: int) -> list[tuple[int, float]]:
    """Merge per-server top-k lists over DISJOINT doc sets -> global
    top-k with the (score desc, doc_id asc) tie-break.  Exact: every
    server returns its k best, and the global k best each live on some
    server."""
    allr = [t for r in results for t in r]
    allr.sort(key=lambda t: (-t[1], t[0]))
    return allr[:k]


class QueryEngine:
    """Driver-side facade over the ShardServer pool.

    Two topologies (``mode``):

    - ``"doc"`` (default): every server holds a doc-range BUCKET slice
      of every term partition; a query fans out to all servers, each
      scores its disjoint doc subset locally (per-query work ~1/S per
      server — throughput scales by dividing work, and per-server
      decode/cache memory shrinks with the pool), and the driver merges
      by (score, doc_id).  This is partition re-assignment, not
      replication: adding servers re-slices the doc ranges.  The analog
      of ES's doc-sharded index with scatter-gather search.
    - ``"term"``: each server owns whole term partitions
      (p % num_servers); a query routes to the server owning most of
      its terms, fetching the rest once via the object store.  Lower
      fan-out per query; replica round-robin for warm term sets.
    """

    def __init__(
        self,
        index_dir: str,
        num_servers: int = 2,
        mode: str = "doc",
        fed: str | None = None,
    ):
        self.meta = IndexMeta(index_dir)
        self.index_dir = index_dir
        self._aliases: dict | None = None  # lazy `_aliases.json` load
        self._fed = fed  # federation dir: servers score with fed-global stats
        # N for driver-side idf/JLH must match the df scale term_dfs
        # returns (fed-global when fed= is set)
        self._n_docs = self.meta.n_docs
        if fed is not None:
            import json as _json

            from . import federated as _fed_mod

            with open(_fed_mod.fed_meta_path(fed)) as f:
                self._n_docs = _json.load(f)["n_docs"]
        self.num_servers = num_servers
        self.mode = mode
        if mode == "doc":
            n_buckets = 1 << self.meta.range_bits
            if num_servers > n_buckets:
                raise ValueError(
                    f"doc-sharded pool needs num_servers <= {n_buckets} "
                    f"(2^range_bits doc-range buckets)"
                )
            all_parts = list(range(self.meta.num_parts))
            # the bucket universe: enumerable for realistic range_bits;
            # a sparse layout (huge range_bits over few live buckets)
            # is discovered from the docstats listing instead — the
            # ownership RULE (bucket % num_servers) is identical either
            # way, so routing and parity are unchanged
            if self.meta.range_bits <= 16:
                universe = range(n_buckets)
            else:
                universe = sorted(
                    int(os.path.basename(f)[len("bucket="):-len(".parquet")])
                    for f in glob.glob(
                        os.path.join(index_dir, "docstats", "bucket=*.parquet")
                    )
                )
            assignments = [
                [b for b in universe if b % num_servers == s]
                for s in range(num_servers)
            ]
            # bucket-pruned layout: every server reads ONLY its assigned
            # bucket files (disjoint), so the pool's total load I/O is
            # one read of the index regardless of S, each server's share
            # is ~1/S, and no file is ever decoded twice
            self.servers = [
                ShardServer.remote(index_dir, all_parts, buckets=assignments[s], fed=fed)
                for s in range(num_servers)
            ]
        elif mode == "term":
            assignments: dict[int, list[int]] = {s: [] for s in range(num_servers)}
            for p in range(self.meta.num_parts):
                assignments[p % num_servers].append(p)
            self.servers = [
                ShardServer.remote(index_dir, assignments[s], fed=fed)
                for s in range(num_servers)
            ]
        else:
            raise ValueError(f"unknown mode {mode!r}")
        # terms each server is known to hold decoded/fetched (cache map)
        self.seen: list[set[str]] = [set() for _ in range(num_servers)]
        self._rr = 0  # round-robin counter over warm replicas
        # driver-side merged-result LRU: the index is immutable for the
        # engine's lifetime, so repeat queries skip the scatter-gather
        # fan-out entirely (doc mode pays S RPCs per distinct query)
        from collections import OrderedDict

        self._results: "OrderedDict[tuple, list]" = OrderedDict()
        self._results_cap = 8192
        self._vocab: list[str] | None = None  # lazy, for wildcard/fuzzy
        from .telemetry import Telemetry

        self.telemetry = Telemetry()  # driver-side phase timers

    def warm(self, min_df: int = 0) -> int:
        """Pre-decode hot postings on every server (blocks until done)."""
        return sum(ray.get([s.warm.remote(min_df) for s in self.servers]))

    def shutdown(self) -> None:
        """Kill the server actors (callers that create short-lived
        engines should clean up so actors don't accumulate)."""
        for s in self.servers:
            ray.kill(s)
        self.servers = []

    def _owner(self, term: str) -> int:
        return term_partition(term, self.meta.num_parts) % self.num_servers

    def _dispatch(self, text: str, k: int, algo: str):
        return self._dispatch_terms(sorted(set(analyze.tokenize(text))), k, algo)

    def _dispatch_terms(self, terms: list[str], k: int, algo: str):
        if not terms:
            return None
        if self.mode == "doc":
            # scatter-gather: every term is local to every server's slice
            return [s.score.remote(terms, k, [], algo=algo) for s in self.servers]
        owners = {t: self._owner(t) for t in terms}
        # Routing: any server CAN score any query (it fetches and caches
        # non-local postings), so servers act as replicas once warm.
        # Round-robin across servers that have already seen every query
        # term (throughput scales with the pool); for cold term sets,
        # route to the server owning the most terms (fewest fetches) —
        # a pure function of the term set, so retries of a cold query
        # reuse the same server's cache instead of thrashing.
        covered = [
            s for s in range(self.num_servers)
            if all(t in self.seen[s] for t in terms)
        ]
        if covered:
            scorer = covered[self._rr % len(covered)]
            self._rr += 1
        else:
            counts = np.bincount([owners[t] for t in terms], minlength=self.num_servers)
            scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in terms if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(terms)
        return self.servers[scorer].score.remote(terms, k, fetched_terms, *refs, algo=algo)

    def _cache_put(self, key: tuple, res: list) -> list:
        if len(self._results) >= self._results_cap:
            self._results.popitem(last=False)  # evict least-recently-used
        self._results[key] = res
        return res

    def query(self, text: str, k: int = 10, algo: str = "taat") -> list[tuple[int, float]]:
        import time as _time

        t0 = _time.perf_counter()
        terms = tuple(sorted(set(analyze.tokenize(text))))
        key = (terms, k, algo)
        hit = self._results.get(key)
        if hit is not None:
            self._results.move_to_end(key)  # LRU: refresh recency on hit
            self.telemetry.incr("query.cache_hit")
            self.telemetry.record("query.total", _time.perf_counter() - t0)
            return hit
        fut = self._dispatch(text, k, algo)
        t1 = _time.perf_counter()
        self.telemetry.record("query.dispatch", t1 - t0)
        if fut is None:
            self.telemetry.record("query.total", _time.perf_counter() - t0)
            return []
        if isinstance(fut, list):  # doc-sharded scatter-gather
            scored = ray.get(fut)
            t2 = _time.perf_counter()
            self.telemetry.record("query.wait", t2 - t1)
            res = self._cache_put(key, _merge_topk(scored, k))
            t3 = _time.perf_counter()
            self.telemetry.record("query.merge", t3 - t2)
            self.telemetry.record("query.total", t3 - t0)
            return res
        res = self._cache_put(key, ray.get(fut))
        t2 = _time.perf_counter()
        self.telemetry.record("query.wait", t2 - t1)
        self.telemetry.record("query.total", t2 - t0)
        return res

    def metrics(self) -> dict:
        """Per-stage query telemetry: the driver-side phase timers
        (dispatch / wait / merge / total, with percentiles) plus the
        additive roll-up of every server's counters — the
        TelemetryProvider.cs:6-27 analog for serving (build-side
        counters live in IndexMeta.build_metrics)."""
        from .telemetry import merge_snapshots

        return {
            "engine": self.telemetry.snapshot(),
            "servers": merge_snapshots(
                ray.get([s.metrics.remote() for s in self.servers])
            ),
        }

    def search_alias(self, alias: str, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Query THROUGH an ES index alias: the alias's filter (if any)
        applies as filter context on top of the plain term query —
        membership changes, scores don't — so a filtered alias is a
        zero-copy virtual view over the same index (aliases load once
        per engine; call refresh_aliases after a put/delete)."""
        if self._aliases is None:
            self.refresh_aliases()
        spec = self._aliases.get(alias)
        if spec is None:
            raise KeyError(f"unknown alias {alias!r}")
        filters = spec.get("filters") or {}
        if not filters:
            return self.query(text, k=k)
        return self.filtered_query(text, filters, k=k)

    def refresh(self) -> int:
        """ES ``_refresh`` for deletes: running servers pin the
        tombstone set they loaded (point-in-time semantics — a live
        engine is an implicit PIT over delete_docs/delete_by_query
        written after it started), and this makes later deletes
        visible: every server re-reads `_tombstones.json` and drops
        its match cache.  Returns the tombstone count."""
        counts = ray.get([s.reload_tombstones.remote() for s in self.servers])
        self._results.clear()  # merged-result LRU embeds the old mask
        return int(max(counts, default=0))

    def refresh_aliases(self) -> dict:
        """Re-read `_aliases.json` (the alias API mutates index state
        out-of-band)."""
        self._aliases = get_aliases(self.index_dir)
        return self._aliases

    def filtered_query(self, text: str, filters: dict, k: int = 10) -> list[tuple[int, float]]:
        """Filtered BM25 via the pool (scatter-gather in doc mode,
        ownership-routed in term mode)."""
        terms = sorted(set(analyze.tokenize(text)))
        if not terms:
            return []
        if self.mode == "doc":
            futs = [
                s.score_filtered.remote(terms, k, filters, []) for s in self.servers
            ]
            return _merge_topk(ray.get(futs), k)
        owners = {t: self._owner(t) for t in terms}
        counts = np.bincount([owners[t] for t in terms], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in terms if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(terms)
        return ray.get(
            self.servers[scorer].score_filtered.remote(
                terms, k, filters, fetched_terms, *refs
            )
        )

    def _dispatch_phrase(self, text: str, k: int, slop: int = 0):
        """Phrase dispatch without the final ray.get (federation
        fan-out protocol; see _dispatch_search)."""
        ordered = analyze.tokenize(text)
        if not ordered:
            return None
        if self.mode == "doc":
            return [s.phrase.remote(ordered, k, [], slop=slop) for s in self.servers]
        uniq = sorted(set(ordered))
        owners = {t: self._owner(t) for t in uniq}
        counts = np.bincount([owners[t] for t in uniq], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in uniq if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(uniq)
        return self.servers[scorer].phrase.remote(
            ordered, k, fetched_terms, *refs, slop=slop
        )

    def phrase_query(
        self, text: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Phrase top-k via the pool (scatter-gather in doc mode,
        ownership-routed in term mode); ``slop`` = total extra gaps
        allowed between the in-order terms (0 = exact adjacency)."""
        fut = self._dispatch_phrase(text, k, slop)
        if fut is None:
            return []
        if isinstance(fut, list):
            return _merge_topk(ray.get(fut), k)
        return ray.get(fut)

    def _dispatch_phrase_prefix(
        self, text: str, k: int, max_expansions: int | None
    ):
        ordered = analyze.tokenize(text)
        if not ordered:
            return None
        fixed, prefix = ordered[:-1], ordered[-1]
        if self._vocab is None:
            self._vocab = load_vocab(self.meta)
        expansions = sorted(t for t in self._vocab if t.startswith(prefix))
        if max_expansions is not None:
            expansions = expansions[:max_expansions]
        if not expansions:
            return None
        if self.mode == "doc":
            return [
                s.phrase_prefix.remote(fixed, expansions, k) for s in self.servers
            ]
        involved = sorted(set(fixed) | set(expansions))
        owners = {t: self._owner(t) for t in involved}
        counts = np.bincount([owners[t] for t in involved], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in involved if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(involved)
        return self.servers[scorer].phrase_prefix.remote(
            fixed, expansions, k, fetched_terms, *refs
        )

    def phrase_prefix_query(
        self, text: str, k: int = 10, max_expansions: int | None = 50
    ) -> list[tuple[int, float]]:
        """ES match_phrase_prefix: the trailing token is a term PREFIX,
        expanded against the index vocabulary (the tiny ``_termdf``
        summaries, never the corpus) in term order up to
        ``max_expansions`` (None = every completion — the exact,
        SQL-mirrorable configuration); docs where the fixed tokens are
        immediately followed by any completion match, scored by BM25 of
        the fixed terms (cb.phrase.phrase_prefix_topk contract)."""
        fut = self._dispatch_phrase_prefix(text, k, max_expansions)
        if fut is None:
            return []
        if isinstance(fut, list):
            return _merge_topk(ray.get(fut), k)
        return ray.get(fut)

    def _dispatch_search(self, query_string: str, k: int, synonyms: dict | None = None):
        """Query-string dispatch WITHOUT the final ray.get: returns a
        list of per-server refs (doc mode) or one ref (term mode), or
        None for an empty query — lets federations collect refs across
        sub-indexes and block once."""
        from . import querylang

        parsed = querylang.parse(query_string)
        if parsed.get("expands"):
            if self._vocab is None:
                self._vocab = load_vocab(self.meta)
            parsed = querylang.expand(parsed, self._vocab)
        if synonyms:
            parsed = querylang.apply_synonyms(parsed, synonyms)
        involved = sorted(
            set(parsed.get("weights") or parsed["terms"])
            | {t for p in parsed["phrases"] for t in p}
            | set(parsed["excluded"])
            # negated-phrase terms must ship too: a term-mode scorer
            # missing one would silently skip the must_not clause
            | {t for p in parsed.get("excluded_phrases", []) for t in p}
        )
        if not involved:
            return None
        if self.mode == "doc":
            return [s.query_string.remote(parsed, k) for s in self.servers]
        owners = {t: self._owner(t) for t in involved}
        counts = np.bincount([owners[t] for t in involved], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in involved if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(involved)
        return self.servers[scorer].query_string.remote(parsed, k, fetched_terms, *refs)

    def search(
        self, query_string: str, k: int = 10, synonyms: dict | None = None
    ) -> list[tuple[int, float]]:
        """Lucene-lite query string via the pool (scatter-gather in doc
        mode; ownership-routed with postings fetch in term mode).
        Wildcard/fuzzy atoms are rewritten ONCE here against the
        vocabulary summary; servers receive concrete terms.
        ``synonyms`` applies the ES query-time synonym filter
        (querylang.apply_synonyms) to the scored term set."""
        fut = self._dispatch_search(query_string, k, synonyms=synonyms)
        if fut is None:
            return []
        if isinstance(fut, list):
            return _merge_topk(ray.get(fut), k)
        return ray.get(fut)

    def msearch(
        self, query_strings: list[str], k: int = 10,
        synonyms: dict | None = None,
    ) -> list[list[tuple[int, float]]]:
        """ES ``_msearch`` over full query strings (terms + phrases +
        filters + exclusions — the whole querylang surface, unlike the
        term-only query_many batcher): EVERY query's per-server refs
        are dispatched before any result is awaited, then ONE ray.get
        drains the flat ref list, so server work for query i+1 overlaps
        the wait for query i.  Same kernels and merge as search() —
        results are bitwise identical to the sequential loop."""
        futs = [
            self._dispatch_search(q, k, synonyms=synonyms)
            for q in query_strings
        ]
        flat: list = []
        for f in futs:
            if f is None:
                continue
            flat.extend(f if isinstance(f, list) else [f])
        got = ray.get(flat)
        out: list[list[tuple[int, float]]] = []
        pos = 0
        for f in futs:
            if f is None:
                out.append([])
            elif isinstance(f, list):
                out.append(_merge_topk(got[pos:pos + len(f)], k))
                pos += len(f)
            else:
                out.append(got[pos])
                pos += 1
        return out

    def _parsed_and_involved(self, query_string: str):
        from . import querylang

        parsed = querylang.parse(query_string)
        if parsed.get("expands"):
            if self._vocab is None:
                self._vocab = load_vocab(self.meta)
            parsed = querylang.expand(parsed, self._vocab)
        involved = sorted(
            set(parsed.get("weights") or parsed["terms"])
            | {t for p in parsed["phrases"] for t in p}
            | set(parsed["excluded"])
            | {t for p in parsed.get("excluded_phrases", []) for t in p}
        )
        return parsed, involved

    def _route_agg(self, method: str, parsed: dict, involved: list[str], *args):
        """Aggregation dispatch without the final ray.get: list of
        per-server refs (doc mode) or one ref (term mode).  ``method``
        is the ShardServer method name; ``args`` its extra positional
        args before the fetch protocol."""
        if self.mode == "doc":
            return [
                getattr(s, method).remote(parsed, *args) for s in self.servers
            ]
        owners = {t: self._owner(t) for t in involved}
        counts = np.bincount([owners[t] for t in involved], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in involved if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(involved)
        return getattr(self.servers[scorer], method).remote(
            parsed, *args, fetched_terms, *refs
        )

    def _dispatch_facets(self, query_string: str, facet_cols, stats_cols):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg(
            "facet_counts", parsed, involved, list(facet_cols), list(stats_cols)
        )

    def facets(
        self, query_string: str, facet_cols=(), stats_cols=()
    ) -> tuple[dict, dict]:
        """Pool facet aggregation over the query's FULL match set
        (scatter-gather + exact merge in doc mode — each server counts
        its disjoint slice, so work and memory are ~1/S per server;
        ownership-routed in term mode)."""
        fut = self._dispatch_facets(query_string, facet_cols, stats_cols)
        if fut is None:
            return (
                {c: {} for c in facet_cols},
                {c: (0, 0, None, None) for c in stats_cols},
            )
        if isinstance(fut, list):
            return _merge_facets(ray.get(fut))
        return ray.get(fut)

    def _dispatch_boosting(
        self, positive: str, negative: str, negative_boost: float, k: int
    ):
        p_pos, inv_pos = self._parsed_and_involved(positive)
        if not inv_pos:
            return None
        p_neg, inv_neg = self._parsed_and_involved(negative)
        return self._route_agg(
            "boosting", p_pos, sorted(set(inv_pos) | set(inv_neg)),
            p_neg, float(negative_boost), k,
        )

    def boosting(
        self, positive: str, negative: str,
        negative_boost: float = 0.5, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES boosting query: rank by the positive query's BM25 with
        docs matching the negative query demoted by ``negative_boost``
        (membership-only — the negative clause is never scored).  The
        demotion is per-doc, so the doc-sharded merge is the exact
        global top-k."""
        fut = self._dispatch_boosting(positive, negative, negative_boost, k)
        if fut is None:
            return []
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return _merge_topk(parts, k)

    def _dispatch_stats_ext(self, query_string: str, cols):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg("stats_ext", parsed, involved, list(cols))

    def extended_stats(self, query_string: str, cols=("n_chars",)) -> dict:
        """ES extended_stats aggregation over the query's FULL match
        set: ``col -> (n, sum, sumsq, min, max)`` — integer partials
        per disjoint doc slice, exact additive merge; derive
        avg / variance / std at the call site (one division per
        moment keeps the result bitwise vs the SQL mirror)."""
        fut = self._dispatch_stats_ext(query_string, cols)
        if fut is None:
            return {c: (0, 0, 0, None, None) for c in cols}
        if isinstance(fut, list):
            return _merge_stats_ext(ray.get(fut))
        return ray.get(fut)

    def matrix_stats(
        self, query_string: str, col: str = "n_chars"
    ) -> tuple[int, int, int, int, int, int]:
        """ES matrix_stats over the query's FULL match set for the pair
        (docmeta ``col``, doc token length): exact additive integer
        moment partials (n, sx, sy, sxx, syy, sxy) — derive mean /
        variance / covariance / correlation at the call site with one
        double op per moment."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return (0, 0, 0, 0, 0, 0)
        fut = self._route_agg("matrix_stats", parsed, involved, col)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        out = (0, 0, 0, 0, 0, 0)
        for p in parts:
            out = tuple(a + b for a, b in zip(out, p))
        return out

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Corpus-global df per term via the tiny ``_termdf`` summaries
        (no postings decode).  Doc mode: every server holds every
        partition's summary — one RPC; term mode: terms batched to
        their owners."""
        terms = sorted(set(terms))
        if not terms:
            return {}
        if self.mode == "doc":
            return ray.get(self.servers[0].get_dfs.remote(terms))
        by_owner: dict[int, list[str]] = {}
        for t in terms:
            by_owner.setdefault(self._owner(t), []).append(t)
        futs = [self.servers[s].get_dfs.remote(ts) for s, ts in by_owner.items()]
        out: dict[str, int] = {}
        for d in ray.get(futs):
            out.update(d)
        return out

    def query_terms(self, terms: list[str], k: int = 10, algo: str = "taat"):
        """Top-k over an explicit (pre-analyzed) term set."""
        fut = self._dispatch_terms(sorted(set(terms)), k, algo)
        if fut is None:
            return []
        if isinstance(fut, list):
            return _merge_topk(ray.get(fut), k)
        return ray.get(fut)

    def regexp_query(
        self, pattern: str, k: int = 10, algo: str = "taat"
    ) -> list[tuple[int, float]]:
        """ES ``regexp`` query, ``rewrite=scoring_boolean``: the pattern
        is anchored and matched against WHOLE vocabulary terms (ES
        regexp semantics — never substrings), every matched term joins
        a standard BM25 term query at weight 1.  Matching runs through
        pyarrow's RE2 kernel, the same engine DuckDB's
        ``regexp_full_match`` uses, so the expansion contract is RE2
        syntax exactly (no lookaround) and the SQL mirror can't drift.
        Vocabulary from the tiny ``_termdf`` summaries, one vectorized
        pass (same scale story as wildcard/fuzzy rewrite)."""
        import pyarrow.compute as pc

        if self._vocab is None:
            self._vocab = load_vocab(self.meta)
        arr = pa.array(sorted(set(self._vocab)), type=pa.string())
        mask = pc.match_substring_regex(arr, f"^(?:{pattern})$")
        terms = arr.filter(mask).to_pylist()
        if not terms:
            return []
        return self.query_terms(terms, k=k, algo=algo)

    def more_like_this(
        self,
        doc_text: str,
        k: int = 10,
        max_terms: int = 15,
        exclude: int | None = None,
        algo: str = "taat",
    ) -> list[tuple[int, float]]:
        """ES ``more_like_this`` (docs-as-query): pick the document's
        ``max_terms`` highest tf*idf terms (idf = the BM25 idf, df from
        the summary tables; ties broken by term asc for determinism),
        run a standard BM25 query with them, and drop the source doc
        (``exclude``) from the ranking."""
        import collections

        tf = collections.Counter(analyze.tokenize(doc_text))
        dfs = self.term_dfs(list(tf))
        n = self._n_docs
        scored = [
            (t, tf[t] * float(scoring.idf(dfs[t], n))) for t in tf if t in dfs
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        terms = [t for t, _ in scored[:max_terms]]
        res = self.query_terms(terms, k + (1 if exclude is not None else 0), algo)
        if exclude is not None:
            res = [r for r in res if r[0] != exclude][:k]
        return res

    def suggest_term(
        self,
        text: str,
        k: int = 5,
        max_edits: int = 2,
        prefix_length: int = 1,
        min_word_length: int = 4,
        suggest_mode: str = "missing",
    ) -> list[tuple[int, str, int, str, int, int]]:
        """ES term suggester ("did you mean"): per analyzed input token,
        the top-``k`` index-vocabulary terms within ``max_edits``
        Damerau-Levenshtein edits, ranked by (distance asc, df desc,
        term asc) — ES's default score-then-frequency sort.  Tokens
        shorter than ``min_word_length`` are skipped; ``missing`` mode
        (the ES default) skips tokens that already exist in the index.
        Candidates are prefiltered by length window and shared
        ``prefix_length`` prefix (the ES candidate-generator contract),
        so the DL pass touches a tiny slice of the vocabulary.  Vocab
        and df both come from the vocabulary-sized ``_termdf``
        summaries — no postings decode, and the only RPC is one batched
        df fetch; at 100-TB corpus scale the vocabulary stays the small
        side by construction (Heaps' law), so this remains driver-side.
        Returns ``(pos, token, rank, suggestion, distance, df)`` rows,
        ``pos``/``rank`` 1-based.  (The raw candidate machinery over an
        explicit typo list — no analyzer, no mode gates — is
        ``cb.suggest.fuzzy_suggest``; prefix completion is
        ``cb.suggest.prefix_suggest``.)"""
        from . import querylang

        toks = analyze.tokenize(text)
        if self._vocab is None:
            self._vocab = load_vocab(self.meta)
        vocab = sorted(set(self._vocab))
        vset = set(vocab)
        staged: list[tuple[int, str, list[tuple[str, int]]]] = []
        need: set[str] = set()
        for pos, tok in enumerate(toks, start=1):
            if len(tok) < min_word_length:
                continue
            if suggest_mode == "missing" and tok in vset:
                continue
            lo, hi = len(tok) - max_edits, len(tok) + max_edits
            pre = tok[:prefix_length]
            cands = [
                (t, d)
                for t in vocab
                if t != tok and lo <= len(t) <= hi and t.startswith(pre)
                and (d := querylang.damerau_levenshtein(tok, t)) <= max_edits
            ]
            staged.append((pos, tok, cands))
            need.update(t for t, _ in cands)
        dfs = self.term_dfs(sorted(need))
        out: list[tuple[int, str, int, str, int, int]] = []
        for pos, tok, cands in staged:
            ranked = sorted(cands, key=lambda td: (td[1], -dfs[td[0]], td[0]))
            for rank, (t, d) in enumerate(ranked[:k], start=1):
                out.append((pos, tok, rank, t, d, dfs[t]))
        return out

    def suggest_phrase(
        self,
        text: str,
        k: int = 3,
        max_edits: int = 1,
        prefix_length: int = 1,
        num_candidates: int = 4,
        discount: float = 0.4,
    ) -> list[tuple[int, str, float]]:
        """ES phrase suggester ("did you mean", whole-phrase): per
        analyzed token, a direct-generator candidate set — the token
        itself (distance 0, when indexed) plus vocabulary terms within
        ``max_edits`` Damerau-Levenshtein edits sharing the
        ``prefix_length`` prefix, capped to ``num_candidates`` by
        (distance asc, df desc, term asc) — then every candidate
        phrase is scored by a Stupid-Backoff bigram LM (ES's default
        smoothing, ``discount`` 0.4):

            score = log10(cf(w1)/T) + sum_i [ bigram(w_{i-1}, w_i) > 0
                      ? log10(bigram/cf(w_{i-1}))
                      : log10(discount * cf(w_i)/T) ]

        with cf = collection frequency and bigram counts read straight
        off the positional postings by ONE routed lm_counts kernel
        (doc mode: disjoint slices sum; term mode: the majority owner
        answers with fetched postings) and T = the index's exact
        total_tokens.  The broadcast evidence is candidate-set-sized.
        Returns (rank, phrase, score) top-k by (score desc, phrase
        asc); phrases whose words all vanished (cf 0) drop.  With
        tombstones, cf/bigram counts are live-doc exact while T stays
        build-time (document-level LM drift, not a ranking hazard)."""
        import math

        from . import querylang

        toks = analyze.tokenize(text)
        if not 2 <= len(toks) <= 4:
            raise ValueError(
                f"suggest_phrase wants 2-4 analyzed terms, got {toks}"
            )
        if self._vocab is None:
            self._vocab = load_vocab(self.meta)
        vocab = sorted(set(self._vocab))
        vset = set(vocab)
        staged = []
        need: set[str] = set()
        for tok in toks:
            lo, hi = len(tok) - max_edits, len(tok) + max_edits
            pre = tok[:prefix_length]
            cands = [
                (t, d)
                for t in vocab
                if lo <= len(t) <= hi and t.startswith(pre)
                and (d := querylang.damerau_levenshtein(tok, t)) <= max_edits
            ]
            staged.append(cands)
            need.update(t for t, _ in cands)
        dfs = self.term_dfs(sorted(need))
        cand_sets = [
            [
                t for t, _ in sorted(
                    cands, key=lambda td: (td[1], -dfs[td[0]], td[0])
                )[:num_candidates]
            ]
            for cands in staged
        ]
        if any(not c for c in cand_sets):
            return []
        from itertools import product as _product

        phrases = list(_product(*cand_sets))
        unigrams = sorted({t for c in cand_sets for t in c})
        bigrams = sorted(
            {(p[i], p[i + 1]) for p in phrases for i in range(len(p) - 1)}
        )
        fut = self._route_agg("lm_counts", unigrams, unigrams, bigrams)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        cf: dict[str, int] = {}
        bc: dict[tuple[str, str], int] = {}
        for pcf, pbc in parts:
            for t, c in pcf.items():
                cf[t] = cf.get(t, 0) + c
            for kpair, c in pbc.items():
                bc[kpair] = bc.get(kpair, 0) + c
        total = float(self.meta.total_tokens)
        scored: list[tuple[str, float]] = []
        for p in phrases:
            if any(cf.get(w, 0) == 0 for w in p):
                continue
            s = math.log10(cf[p[0]] / total)
            for i in range(1, len(p)):
                c = bc.get((p[i - 1], p[i]), 0)
                if c > 0:
                    s += math.log10(c / cf[p[i - 1]])
                else:
                    s += math.log10(discount * cf[p[i]] / total)
            scored.append((" ".join(p), s))
        scored.sort(key=lambda ps: (-ps[1], ps[0]))
        return [
            (rank, phrase, s)
            for rank, (phrase, s) in enumerate(scored[:k], start=1)
        ]

    def search_after(
        self,
        text: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
        algo: str = "taat",
    ) -> list[tuple[int, float]]:
        """ES ``search_after`` parity: the next ``k`` results strictly
        after the ``(score, doc_id)`` cursor in (score desc, id asc)
        order.  Deep pages re-rank through the driver result LRU with a
        doubling fetch — exact because scores are bitwise-deterministic
        for an immutable index, so cursor equality is safe."""
        from .query import page_after

        return page_after(
            lambda q, kk: self.query(q, k=kk, algo=algo), text, k, after
        )

    def _sig_counts(
        self, query_string: str, min_df: int
    ) -> tuple[dict[str, int], int]:
        """Per-term counts over the query's FULL match set + the match
        total — the shared half of significant_terms and its
        background_filter variant.  Doc mode: per-server slice counts
        add; term mode: per-server owned-vocab counts union (disjoint
        terms), every server sees the same match total."""
        from . import querylang

        parsed = querylang.parse(query_string)
        if parsed.get("expands"):
            if self._vocab is None:
                self._vocab = load_vocab(self.meta)
            parsed = querylang.expand(parsed, self._vocab)
        involved = sorted(
            set(parsed.get("weights") or parsed["terms"])
            | {t for p in parsed["phrases"] for t in p}
            | set(parsed["excluded"])
            | {t for p in parsed.get("excluded_phrases", []) for t in p}
        )
        if not involved:
            return {}, 0
        if self.mode == "doc":
            parts = ray.get(
                [s.significant.remote(parsed, min_df) for s in self.servers]
            )
            fg: dict[str, int] = {}
            for d, _ in parts:
                for t, c in d.items():
                    fg[t] = fg.get(t, 0) + c
            m = sum(mm for _, mm in parts)
        else:
            owners = {t: self._owner(t) for t in involved}
            futs = []
            for s in range(self.num_servers):
                fetched_terms = [
                    t for t in involved
                    if owners[t] != s and t not in self.seen[s]
                ]
                refs = [
                    self.servers[owners[t]].get_postings.remote(t)
                    for t in fetched_terms
                ]
                self.seen[s].update(involved)
                futs.append(
                    self.servers[s].significant.remote(
                        parsed, min_df, fetched_terms, *refs
                    )
                )
            parts = ray.get(futs)
            fg = {}
            for d, _ in parts:
                fg.update(d)  # disjoint term ownership
            m = max((mm for _, mm in parts), default=0)
        return fg, m

    def significant_terms_filtered(
        self, query_string: str, background_filter: str,
        top_n: int = 10, min_df: int = 2,
    ) -> list[tuple[str, int, int, float]]:
        """ES significant_terms with ``background_filter``: the
        background population is the filter's match set, not the whole
        corpus — "what's special about these docs vs their SEGMENT".
        Foreground = match(query ∧ filter) (the agg runs in the
        filtered search context, so fg ⊆ bg by construction and JLH is
        well-defined); both sides ride the same vocab-walk kernel, so
        returns ``[(term, fg, bg, score)]`` with JLH over (fg/m,
        bg/nb), top_n by (score desc, term asc); the corpus-df
        ``min_df`` gate applies to both passes."""
        from . import querylang

        filt = querylang.parse(background_filter).get("filters") or {}
        if len(filt) != 1:
            raise ValueError(
                f"background_filter wants one col:value filter, got {background_filter!r}"
            )
        (col, val), = filt.items()
        fg, m = self._sig_counts(f"{query_string} {background_filter}", min_df)
        if not m:
            return []
        # pure-filter background: docmeta equality match (no scored
        # terms to ride querylang.match).  Doc mode: disjoint slices
        # add; term mode: docmeta is whole-corpus on every server, so
        # counts union over disjoint owned vocab and nb is the max.
        parts = ray.get(
            [s.significant_meta.remote(col, val, min_df) for s in self.servers]
        )
        bg: dict[str, int] = {}
        if self.mode == "doc":
            for d, _ in parts:
                for t, c in d.items():
                    bg[t] = bg.get(t, 0) + c
            nb = sum(mm for _, mm in parts)
        else:
            for d, _ in parts:
                bg.update(d)
            nb = max((mm for _, mm in parts), default=0)
        if not nb:
            return []
        out = []
        for t, c in fg.items():
            bgc = bg.get(t, 0)
            if not bgc:
                continue
            fgp = c / m
            bgp = bgc / nb
            out.append((t, c, bgc, (fgp - bgp) * (fgp / bgp)))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[:top_n]

    def significant_terms(
        self, query_string: str, top_n: int = 10, min_df: int = 2
    ) -> list[tuple[str, int, int, float]]:
        """ES significant_terms: terms overrepresented in the query's
        match set vs the corpus, scored by JLH
        ``(fg/m - df/N) * ((fg/m) / (df/N))`` — returns
        ``[(term, fg, df, score)]`` top_n by (score desc, term asc).
        Doc mode: per-server slice counts add; term mode: per-server
        owned-vocab counts union (disjoint terms), every server sees
        the same match total."""
        fg, m = self._sig_counts(query_string, min_df)
        if not m:
            return []
        dfs = self.term_dfs(sorted(fg))
        n = self._n_docs
        out = []
        for t, c in fg.items():
            df = dfs.get(t)
            if not df:
                continue
            fgp = c / m
            bgp = df / n
            out.append((t, c, df, (fgp - bgp) * (fgp / bgp)))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[:top_n]

    def _dispatch_histogram(self, query_string: str, histos: dict):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg("histogram", parsed, involved, histos)

    def histogram(self, query_string: str, histos: dict) -> dict:
        """ES histogram aggregation over the query's FULL match set:
        ``{col: interval}`` -> ``{col: {bucket_lo: count}}`` (doc mode:
        scatter-gather + exact additive merge; term mode:
        ownership-routed, same protocol as facets)."""
        fut = self._dispatch_histogram(query_string, histos)
        if fut is None:
            return {c: {} for c in histos}
        if isinstance(fut, list):
            return _merge_hists(ray.get(fut))
        return ray.get(fut)

    def histogram_zerofill(
        self, query_string: str, col: str, interval: int,
        bounds: tuple[int, int],
    ) -> list[tuple[int, int]]:
        """ES histogram with ``min_doc_count: 0`` + ``extended_bounds``:
        the emitted bucket axis is the union of the data's buckets and
        the aligned ``bounds`` range, gaps (and the extension) filled
        with zero counts — the shape date_histogram dashboards rely on.
        The distributed work is the plain histogram (exact additive
        merge); zero-filling is a driver-side O(buckets) pass over the
        small bucket map."""
        h = self.histogram(query_string, {col: interval}).get(col, {})
        lo = (int(bounds[0]) // interval) * interval
        hi = (int(bounds[1]) // interval) * interval
        axis = set(range(lo, hi + interval, interval)) | set(h)
        return [(b, int(h.get(b, 0))) for b in sorted(axis)]

    def _dispatch_range_agg(self, query_string: str, ranges: dict):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg("range_counts", parsed, involved, ranges)

    def range_agg(self, query_string: str, ranges: dict) -> dict:
        """ES range aggregation over the query's FULL match set:
        ``{col: [(lo, hi), ...]}`` -> ``{col: [count, ...]}`` aligned
        with the input ranges (half-open ``[lo, hi)``, ``None`` =
        unbounded).  Doc mode: scatter-gather + exact elementwise
        addition; term mode: ownership-routed."""
        fut = self._dispatch_range_agg(query_string, ranges)
        if fut is None:
            return {c: [0] * len(b) for c, b in ranges.items()}
        if isinstance(fut, list):
            return _merge_ranges(ray.get(fut))
        return ray.get(fut)

    def collapse(
        self, text: str, group_col: str, k: int
    ) -> list[tuple[int, float, object]]:
        """ES field collapsing: the global top ``k`` hits keeping only
        the single best doc per ``group_col`` value (score desc, doc_id
        asc within a group and across the ranking).  Exactly the
        top_hits fan-out with k_per=1, flattened and re-ranked — the
        per-group champion from each disjoint slice is a superset of
        the global champions, so the driver re-cut is exact.  Returns
        ``(doc_id, score, group_value)`` triples."""
        return _collapse_from_top_hits(self.top_hits(text, group_col, 1), k)

    def percentile_ranks(
        self, query_string: str, col: str, values: list[int]
    ) -> dict[int, float] | None:
        """ES percentile_ranks aggregation over the query's FULL match
        set: for each value v, the fraction of matching docs (with a
        non-null ``col`` — nulls are outside the distribution, like
        SQL aggregate comparisons) whose ``col <= v`` (integer columns;
        <=v is the half-open range [None, v+1)).  Rides entirely on the range-counts machinery —
        one fan-out, exact integer addition, ONE division per value at
        the driver, so the result is bit-identical to the SQL mirror's
        ``count::DOUBLE / n::DOUBLE``.  None when the query matches
        nothing."""
        ranges = [(None, int(v) + 1) for v in values] + [(None, None)]
        cnts = self.range_agg(query_string, {col: ranges})[col]
        return _pct_ranks_from_counts(cnts, values)

    def explain(self, text: str, doc_id: int) -> list[tuple[str, int, int, float]]:
        """ES explain via the pool: per-term (term, tf, doc_len,
        contribution) for one doc — doc mode fans out (only the owning
        slice emits), term mode routes terms to one scorer with the
        standard fetch protocol."""
        terms = sorted(set(analyze.tokenize(text)))
        if not terms:
            return []
        if self.mode == "doc":
            parts = ray.get([s.explain.remote(terms, doc_id, []) for s in self.servers])
            return sorted((r for p in parts for r in p), key=lambda r: r[0])
        owners = {t: self._owner(t) for t in terms}
        counts = np.bincount([owners[t] for t in terms], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in terms if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(terms)
        return ray.get(
            self.servers[scorer].explain.remote(terms, doc_id, fetched_terms, *refs)
        )

    def filters_agg(self, query_string: str, filters: dict) -> dict[str, int]:
        """ES ``filters`` aggregation: per named sub-query string, the
        count of main-match docs also matching it — per-server
        intersection counts over disjoint slices, exact additive fold.
        Both main and sub queries are parsed (and wildcard/fuzzy
        expanded) ONCE here; servers receive concrete clause sets."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return {name: 0 for name in filters}
        named: dict[str, dict] = {}
        sub_terms: set[str] = set()
        for name, fq in filters.items():
            sp, sterms = self._parsed_and_involved(fq)
            named[name] = sp
            sub_terms.update(sterms or ())
        all_involved = sorted(set(involved) | sub_terms)
        fut = self._route_agg("filter_counts", parsed, all_involved, named)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        out: dict[str, int] = {name: 0 for name in filters}
        for p in parts:
            for name, c in p.items():
                out[name] += c
        return out

    def adjacency_matrix(
        self, query_string: str, filters: dict
    ) -> dict[tuple[str, str], int]:
        """ES adjacency_matrix via the pool: per named-filter pair
        (a <= b), |match(main) ∩ match(a) ∩ match(b)| — per-server
        counts over disjoint slices fold by exact addition (the same
        dispatch shape as filters_agg)."""
        parsed, involved = self._parsed_and_involved(query_string)
        names = sorted(filters)
        zero = {
            (a, b): 0 for i, a in enumerate(names) for b in names[i:]
        }
        if not involved:
            return zero
        named: dict[str, dict] = {}
        sub_terms: set[str] = set()
        for name, fq in filters.items():
            sp, sterms = self._parsed_and_involved(fq)
            named[name] = sp
            sub_terms.update(sterms or ())
        all_involved = sorted(set(involved) | sub_terms)
        fut = self._route_agg("adjacency_counts", parsed, all_involved, named)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        out = dict(zero)
        for p in parts:
            for key, c in p.items():
                out[key] += c
        return out

    def sample(self, query_string: str, k: int) -> list[int]:
        """ES sampler aggregation over the query's FULL match set: a
        deterministic uniform sample of k matching doc ids (lowest
        md5(doc_id), ties by id).  Per-server local top-k by (hash, id)
        re-cuts exactly at the driver; rerun-stable with no RNG."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return []
        fut = self._route_agg("sample_hits", parsed, involved, k)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        merged = sorted(
            (p for part in parts for p in part), key=lambda r: (r[1], r[0])
        )[:k]
        return [d for d, _ in merged]

    def diversified_sample(
        self, query_string: str, col: str, k: int, max_per: int = 1
    ) -> list[tuple[int, str]]:
        """ES diversified_sampler over the query's FULL match set: the
        md5(doc_id)-order uniform sample of k matching docs with at
        most ``max_per`` docs sharing a ``col`` value.  Per-server
        per-value local cuts are supersets of the global survivors, so
        the driver redoes the SAME per-value + global cut exactly —
        rerun-stable, pool-invariant, no RNG.  Returns (doc_id, value)
        in sample (hash) order."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return []
        fut = self._route_agg("diversified_hits", parsed, involved, col, k, max_per)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        per_val: dict[str, list[tuple[int, int]]] = {}
        for part in parts:
            for d, h, v in part:
                per_val.setdefault(v, []).append((h, d))
        survivors = []
        for v, cand in per_val.items():
            for h, d in sorted(cand)[:max_per]:
                survivors.append((h, d, v))
        survivors.sort()
        return [(d, v) for _, d, v in survivors[:k]]

    def delete_by_query(self, query_string: str) -> int:
        """ES ``_delete_by_query``: tombstone every doc matching the
        query.  Each disjoint server slice reports its full match set
        (``match_first`` at k = slice size — the same id-list shape a
        tombstone file stores, and the same materialization ES itself
        does via scroll), the driver writes ONE atomic tombstone
        update.  Returns the number of newly tombstoned docs.  Running
        servers keep serving the old tombstones (they load once at
        start — the delete_docs contract); construct a new engine to
        observe the deletes."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return 0
        big = 1 << 62
        fut = self._route_agg("match_first", parsed, involved, big)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        ids = sorted({d for part in parts for d in part})
        if not ids:
            return 0
        before = len(load_tombstones(self.meta.index_dir))
        delete_docs(self.meta.index_dir, ids)
        return len(load_tombstones(self.meta.index_dir)) - before

    def update_by_query(
        self, query_string: str, col: str, op: str, value,
        update_id: str | None = None,
    ) -> int:
        """ES ``_update_by_query``: apply ``col op value`` (op =
        ``set`` | ``add`` — the painless-script analog) to the stored
        fields of every doc matching the query.  The match half is
        delete_by_query's (each disjoint slice reports its match set);
        the write half is docmeta.update_docs — bucket-pruned in-place
        rewrites, one Ray task per touched bucket, crash-convergent
        under ``update_id``.  Returns the number of docs updated.
        Running servers keep serving their loaded docmeta (it loads
        lazily once per server); construct a new engine to observe the
        updates — the same visibility contract as delete_docs."""
        from . import docmeta as docmeta_mod

        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return 0
        big = 1 << 62
        fut = self._route_agg("match_first", parsed, involved, big)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        ids = sorted({d for part in parts for d in part})
        if not ids:
            return 0
        return docmeta_mod.update_docs(
            self.meta.index_dir, ids, col, op, value, update_id=update_id
        )

    def mget(self, doc_ids, cols=("lang", "source", "n_chars")) -> list[tuple]:
        """ES ``_mget``: stored fields by id from the doc store.  Doc
        mode: each server answers for its disjoint doc-range slice
        (absent/tombstoned ids 404 away); term mode: docmeta is
        whole-corpus on every server, so ONE server answers (the
        term_vectors_store duplicate-free rule)."""
        servers = self.servers if self.mode == "doc" else self.servers[:1]
        parts = ray.get(
            [s.get_docs.remote(list(doc_ids), list(cols)) for s in servers]
        )
        return sorted(p for part in parts for p in part)

    def constant_score(
        self, query_string: str, boost: float = 1.0, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``constant_score``: every matching doc scores exactly
        ``boost`` — membership only, no BM25 work, no postings decode
        beyond the match.  All scores tie, so the ranking is the
        deterministic (score, doc_id asc) order: the first k matching
        ids, each disjoint server slice contributing its own sorted
        prefix."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return []
        fut = self._route_agg("match_first", parsed, involved, k)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        ids = sorted(d for part in parts for d in part)[:k]
        return [(d, float(boost)) for d in ids]

    def pinned(
        self, query_string: str, pinned_ids, k: int = 10
    ) -> list[tuple[int, float, int]]:
        """ES ``pinned`` query: the listed ids surface first IN THE
        GIVEN ORDER — provided they exist and are live (absent /
        tombstoned ids 404 away, matching ES) — then organic matches
        for ``query_string`` with pinned ids deduped out, k rows total.
        Rows are (doc_id, score, pinned): pinned rows keep score 0.0
        (ES's pinned constants are sentinel floats near FLT_MAX,
        intentionally out of contract) and organic rows their BM25.
        Pinned docs appear even when the organic query matches
        nothing.  Requires docmeta (the liveness probe is one mget)."""
        live = {t[0] for t in self.mget(pinned_ids, cols=("n_chars",))}
        pins = [int(d) for d in pinned_ids if int(d) in live][:k]
        pinset = set(pins)
        organic = self.search(query_string, k=k)
        org = [
            (d, s) for d, s in organic if d not in pinset
        ][: max(0, k - len(pins))]
        return (
            [(d, 0.0, 1) for d in pins]
            + [(d, float(s), 0) for d, s in org]
        )

    def span_first(self, text: str, end: int) -> list[tuple[int, int]]:
        """ES ``span_first`` (single-term inner span): docs whose first
        occurrence of the analyzed term ends by position ``end``,
        with that 0-based position — filter-context (no scores; ES span
        scoring is sloppy-freq, intentionally out of contract).  Doc
        mode: disjoint slices concatenate; term mode: the term's owner
        answers."""
        toks = analyze.tokenize(text)
        if len(toks) != 1:
            raise ValueError(f"span_first wants exactly one analyzed term, got {toks}")
        fut = self._route_agg("span_first", toks[0], toks, end)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return sorted(p for part in parts for p in part)

    def terms_set(
        self, text: str, spec: dict, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``terms_set`` query: BM25-scored term-OR match where the
        per-doc minimum_should_match is read off a doc field —
        ``required = min(cap, 1 + col // div)`` (the
        minimum_should_match_field contract over an integer docmeta
        column).  Doc mode: disjoint local top-k re-cut exactly; term
        mode: the majority owner scores with fetched postings."""
        toks = sorted(set(analyze.tokenize(text)))
        if not toks:
            return []
        fut = self._route_agg("terms_set", toks, toks, spec, k)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return _merge_topk(parts, k)

    def span_near(self, text: str, slop: int) -> list[tuple[int, int]]:
        """ES ``span_near`` with ``in_order: false`` over two
        single-term clauses: docs where the two analyzed terms co-occur
        within ``slop`` intervening tokens, with that minimum gap —
        filter-context (span scoring is out of contract, same as
        span_first).  Doc mode: disjoint slices concatenate; term mode:
        the majority owner scores with fetched postings."""
        toks = analyze.tokenize(text)
        if len(toks) != 2 or toks[0] == toks[1]:
            raise ValueError(
                f"span_near wants exactly two distinct analyzed terms, got {toks}"
            )
        fut = self._route_agg("span_near", toks[0], toks, toks[1], int(slop))
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return sorted(p for part in parts for p in part)

    def _merged_parents(
        self, query_string: str, parent_col: str
    ) -> dict[object, tuple[float, int]]:
        """Shared join-field phase: per-parent (max child BM25 score,
        n_children) over the query's FULL match set, merged exactly
        across scopes (max of maxes, sum of counts)."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return {}
        fut = self._route_agg("join_children", parsed, involved, parent_col)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        merged: dict[object, tuple[float, int]] = {}
        for part in parts:
            for v, mx, n in part:
                if v in merged:
                    omx, on = merged[v]
                    merged[v] = (max(omx, mx), on + n)
                else:
                    merged[v] = (mx, n)
        return merged

    def has_child(
        self, query_string: str, parent_col: str,
        k: int = 10, min_children: int = 1,
    ) -> list[tuple[object, float, int]]:
        """ES join-field ``has_child`` (score_mode=max): parents whose
        child docs match the query, scored by the best-matching child's
        BM25, with the matching-child count — ``min_children`` drops
        thin parents.  Parents never exist as index docs (the join
        field's parent side is metadata), so the result rows are
        (parent_value, score, n_children) ranked (score desc, parent
        asc) — max and count both merge exactly across disjoint doc
        slices, no float-sum order hazard."""
        merged = self._merged_parents(query_string, parent_col)
        rows = [
            (v, mx, n) for v, (mx, n) in merged.items() if n >= min_children
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def has_parent(
        self, parent_query: str, parent_col: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES join-field ``has_parent`` (score=true): child docs whose
        parent group contains a doc matching the parent query, each
        scored with its parent's (max-child) score.  Phase 1 reuses the
        has_child kernel for the matched-parent score map; phase 2
        broadcasts that tiny map and each doc slice selects its members
        with one vectorized is_in over docmeta — exact local top-k
        re-cuts at the driver.  Term mode: docmeta is whole-corpus on
        every server, so ONE server answers phase 2 (the mget
        duplicate-free rule)."""
        merged = self._merged_parents(parent_query, parent_col)
        if not merged:
            return []
        scores = {v: mx for v, (mx, n) in merged.items()}
        servers = self.servers if self.mode == "doc" else self.servers[:1]
        parts = ray.get(
            [s.parent_docs.remote(scores, parent_col, k) for s in servers]
        )
        return _merge_topk(parts, k)

    def terms_orderby_metric(
        self, query_string: str, group_col: str, stat_col: str,
        top_n: int = 5,
    ) -> list[tuple[object, int, float]]:
        """ES terms aggregation ORDERED BY a metric sub-agg (``order:
        {avg_x: desc}``): buckets of ``group_col`` over the query's
        FULL match set, each carrying count and avg(``stat_col``),
        ranked (avg desc, value asc) and cut to ``top_n``.  Counts and
        sums reduce as exact integers across the disjoint doc slices
        BEFORE the cut, so the ordering is exact — not the per-shard
        top-N merge ES warns about for metric-ordered terms aggs.  The
        single float per bucket is one division of exact ints (bitwise
        vs the SQL mirror)."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return []
        fut = self._route_agg("terms_stats", parsed, involved, group_col, stat_col)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        merged: dict[object, tuple[int, int]] = {}
        for part in parts:
            for v, c, sm in part:
                oc, os_ = merged.get(v, (0, 0))
                merged[v] = (oc + c, os_ + sm)
        rows = [(v, c, sm / c) for v, (c, sm) in merged.items()]
        rows.sort(key=lambda r: (-r[2], r[0]))
        return rows[:top_n]

    def top_metrics(
        self, query_string: str, group_col: str, sort_col: str,
        metric_cols=(), k_per: int = 1,
    ) -> dict:
        """ES ``top_metrics`` inside a terms agg: per ``group_col``
        value of the query's FULL match set, the metric column values
        at the top ``k_per`` rows by (``sort_col`` desc, doc_id asc) —
        the "value at the max" workload (e.g. the newest doc's fields
        per group).  Per-scope winners carry their metrics with them,
        so the driver re-cut never re-reads docmeta."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return {}
        fut = self._route_agg(
            "top_metrics", parsed, involved, group_col, sort_col,
            list(metric_cols), k_per,
        )
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return _merge_top_hits(parts, k_per)

    def match_bool_prefix(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``match_bool_prefix``: every analyzed term but the last
        is a BM25 should; the trailing term matches as a PREFIX,
        expanded once driver-side against the tiny _termdf vocabulary
        (the wildcard/fuzzy rewrite path) and contributing a constant
        1.0 (ES's constant_score prefix rewrite).  Union semantics —
        prefix-only docs match.  Doc mode: disjoint local top-k re-cut
        exactly; term mode: the majority owner scores with fetched
        postings."""
        toks = analyze.tokenize(text)
        if not toks:
            return []
        complete, prefix = toks[:-1], toks[-1]
        if self._vocab is None:
            self._vocab = load_vocab(self.meta)
        expansions = sorted(t for t in self._vocab if t.startswith(prefix))
        involved = sorted(set(complete) | set(expansions))
        if not involved:
            return []
        fut = self._route_agg(
            "bool_prefix", sorted(set(complete)), involved, expansions, k
        )
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return _merge_topk(parts, k)

    def span_or_first(self, text: str, end: int) -> list[tuple[int, int]]:
        """ES ``span_first`` whose match clause is a ``span_or`` over
        the analyzed terms of ``text``: docs where the earliest
        occurrence of ANY term ends by ``end``, with that position —
        filter-context like span_first.  Doc mode: disjoint slices
        concatenate; term mode: the majority owner answers with
        fetched postings."""
        toks = sorted(set(analyze.tokenize(text)))
        if not toks:
            return []
        fut = self._route_agg("span_or_first", toks, toks, end)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return sorted(p for part in parts for p in part)

    def span_not(self, text: str, slop: int) -> list[tuple[int, int]]:
        """ES ``span_not`` over two single-term clauses (include,
        exclude) with a symmetric ``slop`` window: docs keeping an
        include occurrence clear of every exclude occurrence, with the
        first such position — filter-context, the exclusion dual of
        span_near."""
        toks = analyze.tokenize(text)
        if len(toks) != 2 or toks[0] == toks[1]:
            raise ValueError(
                f"span_not wants exactly two distinct analyzed terms, got {toks}"
            )
        fut = self._route_agg("span_not", toks[0], toks, toks[1], int(slop))
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return sorted(p for part in parts for p in part)

    def intervals(
        self, text: str, max_gaps: int, ordered: bool = False
    ) -> list[tuple[int, int]]:
        """ES ``intervals`` query (the ``match`` rule with ``max_gaps``
        / ``ordered``) over the analyzed terms of ``text``: docs where
        some tuple of positions, one occurrence per term (query order
        when ``ordered``), spans at most ``max_gaps`` intervening
        positions, with that minimal gap count — filter-context like
        the span family (ES interval scoring is sloppy-freq,
        intentionally out of contract).  Doc mode: disjoint slices
        concatenate; term mode: the majority owner answers with
        fetched postings."""
        toks = analyze.tokenize(text)
        if len(toks) < 2 or len(set(toks)) != len(toks):
            raise ValueError(
                f"intervals wants >=2 distinct analyzed terms, got {toks}"
            )
        fut = self._route_agg(
            "intervals_q", toks, sorted(set(toks)), int(max_gaps), bool(ordered)
        )
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return sorted(p for part in parts for p in part)

    def count(self, query_string: str) -> int:
        """ES ``_count``: the match-set size for a query string —
        scoring-free, ids never leave the servers (each disjoint slice
        reports its count, the driver sums; term mode asks the one
        scorer holding the full match)."""
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return 0
        fut = self._route_agg("match_count", parsed, involved)
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return int(sum(parts))

    def _dispatch_function_score(self, query_string: str, spec: dict, k: int):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg("function_score", parsed, involved, spec, k)

    def function_score(
        self, query_string: str, spec: dict, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES function_score: full-match-set BM25 combined with a
        docmeta-feature function (see ShardServer.function_score for the
        spec kinds), exact global top-k from disjoint per-server cuts."""
        fut = self._dispatch_function_score(query_string, spec, k)
        if fut is None:
            return []
        parts = ray.get(fut) if isinstance(fut, list) else [ray.get(fut)]
        return _merge_topk(parts, k)

    def _dispatch_term_vectors(
        self, doc_ids: list[int], source: str = "index", text_col: str = "text"
    ) -> list:
        if source == "store":
            # doc mode: each server re-analyzes its own docmeta slice;
            # term mode: docmeta is whole-corpus on every server, so ONE
            # server answers (no duplicate rows)
            servers = self.servers if self.mode == "doc" else self.servers[:1]
            return [
                s.term_vectors_store.remote(list(doc_ids), text_col)
                for s in servers
            ]
        return [s.term_vectors.remote(list(doc_ids)) for s in self.servers]

    def term_vectors(
        self, doc_ids: list[int], source: str = "index", text_col: str = "text"
    ) -> list[tuple]:
        """ES _termvectors: (doc_id, term, tf, doc_len, positions) for
        each live requested doc.  ``source="index"`` extracts from the
        positional index (bucket + candidate-block pruned —
        cb.termvectors); ``source="store"`` re-analyzes the stored
        docmeta text column (ES-from-_source, the high-QPS scale path).
        Identical output either way; owners are disjoint, so concat
        needs no dedupe."""
        futs = self._dispatch_term_vectors(doc_ids, source, text_col)
        rows = [r for part in ray.get(futs) for r in part]
        rows.sort(key=lambda r: (r[0], r[1]))
        return rows

    def _dispatch_composite(self, query_string: str, cols: list[str]):
        parsed, involved = self._parsed_and_involved(query_string)
        if not involved:
            return None
        return self._route_agg("composite_counts", parsed, involved, list(cols))

    def composite(
        self, query_string: str, cols: list[str], size: int, after: tuple | None = None
    ) -> tuple[list[tuple[tuple, int]], tuple | None]:
        """ES composite aggregation over the query's full match set:
        doc counts per distinct key tuple of ``cols``, key-ordered,
        paged ``size`` buckets at a time.  Returns ``(buckets,
        after_key)`` where ``buckets`` is ``[(key_tuple, count), ...]``
        and ``after_key`` feeds the next page (None = exhausted).
        Servers return one row per distinct key (tiny), the driver
        merge is exact addition, and paging is a sort + slice over the
        merged bucket dict — O(distinct keys), never O(docs)."""
        fut = self._dispatch_composite(query_string, cols)
        if fut is None:
            return [], None
        merged = _merge_composite(ray.get(fut)) if isinstance(fut, list) else ray.get(fut)
        return _page_composite(merged, size, after)

    def _dispatch_top_hits(self, text: str, group_col: str, k_per: int):
        terms = sorted(set(analyze.tokenize(text)))
        if not terms:
            return None
        if self.mode == "doc":
            return [s.top_hits.remote(terms, k_per, group_col, []) for s in self.servers]
        owners = {t: self._owner(t) for t in terms}
        counts = np.bincount([owners[t] for t in terms], minlength=self.num_servers)
        scorer = int(np.argmax(counts))
        fetched_terms = [
            t for t in terms if owners[t] != scorer and t not in self.seen[scorer]
        ]
        refs = [self.servers[owners[t]].get_postings.remote(t) for t in fetched_terms]
        self.seen[scorer].update(terms)
        return self.servers[scorer].top_hits.remote(
            terms, k_per, group_col, fetched_terms, *refs
        )

    def top_hits(self, text: str, group_col: str, k_per: int) -> dict:
        """ES top_hits-inside-terms-agg via the pool: per group value of
        ``group_col``, the exact top ``k_per`` matching docs by BM25
        (score desc, doc_id asc) over the query's FULL match set.  Doc
        mode: each server returns its local per-value top k_per, the
        driver re-cut is exact; term mode: ownership-routed."""
        fut = self._dispatch_top_hits(text, group_col, k_per)
        if fut is None:
            return {}
        if isinstance(fut, list):
            return _merge_top_hits(ray.get(fut), k_per)
        return ray.get(fut)

    def query_many(self, texts: list[str], k: int = 10, algo: str = "taat"):
        """Batched fan-out: queries are tokenized on the driver, chunked
        round-robin over the pool, and shipped as ONE score_many RPC per
        server — per-query RPC round-trips were the throughput ceiling
        for small queries.  Cold term sets still go through the
        ownership-routed single-query path first (fetch + cache)."""
        term_lists = [sorted(set(analyze.tokenize(t))) for t in texts]
        results: list = [None] * len(texts)
        if self.mode == "doc":
            # one score_many RPC per server covering every query; each
            # server scores its doc slice, driver merges per query
            live_idx = [i for i, terms in enumerate(term_lists) if terms]
            futs = [
                s.score_many.remote([term_lists[i] for i in live_idx], k, algo=algo)
                for s in self.servers
            ]
            per_server = ray.get(futs)
            for i, terms in enumerate(term_lists):
                if not terms:
                    results[i] = []
            for j, i in enumerate(live_idx):
                results[i] = _merge_topk([per_server[s][j] for s in range(self.num_servers)], k)
            return results
        cold_futs: dict[int, object] = {}
        warm_idx: list[int] = []
        for i, terms in enumerate(term_lists):
            if not terms:
                results[i] = []
            elif any(
                all(t in self.seen[s] for t in terms)
                for s in range(self.num_servers)
            ):
                warm_idx.append(i)
            else:
                cold_futs[i] = self._dispatch(texts[i], k, algo)
        # warm queries: round-robin batches, one RPC per server
        batches: list[list[int]] = [[] for _ in range(self.num_servers)]
        for j, i in enumerate(warm_idx):
            # only servers that hold every term of this query qualify
            covered = [
                s for s in range(self.num_servers)
                if all(t in self.seen[s] for t in term_lists[i])
            ]
            batches[covered[j % len(covered)]].append(i)
        batch_futs = []
        for s, idxs in enumerate(batches):
            if idxs:
                batch_futs.append(
                    (idxs, self.servers[s].score_many.remote(
                        [term_lists[i] for i in idxs], k, algo=algo))
                )
        for i, f in cold_futs.items():
            results[i] = [] if f is None else ray.get(f)
        for idxs, f in batch_futs:
            for i, res in zip(idxs, ray.get(f)):
                results[i] = res
        return results
