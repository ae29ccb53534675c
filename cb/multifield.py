"""Multi-field analyzed indexes: BM25 over N text fields per document.

The reference's mappings declare MANY analyzed fields per index
(/root/reference/mappings/AzureIisLog.json — every string field is
analyzed unless marked not_analyzed; applied at
Scheduling/MasterScheduler.cs:205-239), and users query `field:term`
or let the default search span fields.  The engine analog:

- :func:`build_multifield` builds one standard sub-index per analyzed
  field under ``index_dir/field=<name>/`` — each a column-pruned read
  of exactly (id, field), so the total bytes read off storage equal one
  read of the needed columns, and each sub-index independently carries
  the per-field stats BM25 needs (per-field df, doc length, avgdl) with
  every existing guarantee (byte-determinism, bucket-pruned layout,
  resumability) intact.
- Scoring is ES ``multi_match: most_fields``: an unscoped term is
  scored in EVERY field and a doc's score is the SUM of its per-field
  BM25 scores (field order fixed by the manifest, so float summation
  is deterministic); ``field:term`` scopes a term to one analyzed
  field.  Membership = any scored term matches in any scoped field.
- :class:`MultiFieldSearcher` is the in-process searcher;
  :class:`MultiFieldEngine` is the doc-sharded actor pool — every
  server holds the SAME doc-range bucket slice of every field's
  partitions, computes the cross-field sum locally over its disjoint
  doc subset (bucket-pruned reads), and the driver merges by
  (score, doc_id) exactly as the single-field engine does.
"""

from __future__ import annotations

import json
import os

import numpy as np

import ray
import ray.data

from . import analyze, manifest, scoring, wand
from .build import IndexMeta, term_partition
from .query import rank_topk
from .shard import GlobalStats, ShardPartition, _live_mask, _merge_topk, load_tombstones


def _mf_manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_multifield.json")


def field_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, f"field={field}")


def build_multifield(
    source: str | ray.data.Dataset,
    index_dir: str,
    fields: list[str],
    *,
    id_col: str = "doc_id",
    **build_kwargs,
) -> dict:
    """One sub-index per analyzed field (pruned ``columns=[id, field]``
    reads) + the ``_multifield.json`` manifest naming the fields in
    scoring order."""
    from . import build as build_mod

    if not fields:
        raise ValueError("need at least one analyzed field")
    os.makedirs(index_dir, exist_ok=True)
    for f in fields:
        if isinstance(source, str):
            sub_src: str | ray.data.Dataset = ray.data.read_parquet(
                source, columns=[id_col, f]
            )
        else:
            sub_src = source.select_columns([id_col, f])
        build_mod.build_index(
            sub_src, field_dir(index_dir, f), text_col=f, id_col=id_col, **build_kwargs
        )
    m = {"fields": list(fields), "id_col": id_col}
    manifest.write_atomic(_mf_manifest_path(index_dir), m)
    return m


def load_multifield_meta(index_dir: str) -> dict:
    m = manifest.read(_mf_manifest_path(index_dir))
    if not m:
        raise FileNotFoundError(f"no _multifield.json under {index_dir}")
    return m


def route_terms(
    query: str, fields: list[str]
) -> tuple[dict[str, list[str]], list[str]]:
    """Query string -> ({field: sorted scored terms}, excluded terms).

    Unscoped terms score in EVERY field (most_fields); ``field:term``
    with an analyzed field scopes the term; ``-term`` excludes docs
    containing the term in ANY field.  Phrases and not_analyzed filters
    are the single-field searcher's job — a multifield query using them
    raises a descriptive error rather than silently ignoring them."""
    from . import querylang

    parsed = querylang.parse(query)
    if parsed["phrases"] or parsed.get("excluded_phrases"):
        raise ValueError(
            "phrase clauses are per-field; use the single-field searcher "
            "on the target field's sub-index"
        )
    field_terms: dict[str, set] = {f: set() for f in fields}
    for f, val in parsed["filters"].items():
        if f not in field_terms:
            raise ValueError(
                f"unknown analyzed field {f!r}; this index has {fields}"
            )
        field_terms[f].update(analyze.tokenize(val))
    for t in parsed["terms"]:
        for f in fields:
            field_terms[f].add(t)
    return {f: sorted(ts) for f, ts in field_terms.items()}, parsed["excluded"]


def _score_fields(
    field_terms: dict[str, list[str]],
    excluded: list[str],
    get_postings,  # (field, term) -> ChunkedPostings | None
    stats: dict[str, GlobalStats],
    field_order: list[str],
    k: int,
    tombstones: np.ndarray,
) -> list[tuple[int, float]]:
    """Cross-field most_fields sum over one postings scope (whole index
    in-process; a doc-range slice on a server).  Field order is fixed,
    so the float sum is deterministic and slice-independent."""
    per_field = []
    for f in field_order:
        terms = field_terms.get(f) or []
        postings = {t: get_postings(f, t) for t in terms}
        live = {t: p for t, p in postings.items() if p is not None}
        if not live:
            continue
        idfs = {
            t: float(scoring.idf(getattr(p, "gdf", p.df), stats[f].n_docs))
            for t, p in live.items()
        }
        universe, acc = wand.taat_scores(live, idfs, stats[f])
        if universe is not None:
            per_field.append((f, universe, acc))
    if not per_field:
        return []
    all_ids = np.unique(np.concatenate([u for _, u, _ in per_field]))
    total = np.zeros(len(all_ids), dtype=np.float64)
    for _, universe, acc in per_field:  # manifest field order
        total[np.searchsorted(all_ids, universe)] += acc
    keep = _live_mask(all_ids, tombstones)
    for t in excluded:
        for f in field_order:
            p = get_postings(f, t)
            if p is None:
                continue
            ids, _, _ = p.decode_all()
            keep &= ~np.isin(all_ids, ids, assume_unique=True)
    return rank_topk(all_ids[keep], total[keep], k)


class MultiFieldSearcher:
    """In-process multi-field searcher (tests / tiny corpora)."""

    def __init__(self, index_dir: str):
        m = load_multifield_meta(index_dir)
        self.fields: list[str] = m["fields"]
        self.metas = {f: IndexMeta(field_dir(index_dir, f)) for f in self.fields}
        self.stats = {
            f: GlobalStats(meta.n_docs, meta.avgdl) for f, meta in self.metas.items()
        }
        self.parts = {
            f: {
                p: ShardPartition(meta.part_dir(p))
                for p in range(meta.num_parts)
            }
            for f, meta in self.metas.items()
        }
        self.tombstones = load_tombstones(index_dir)

    def _get(self, field: str, term: str):
        meta = self.metas[field]
        return self.parts[field][term_partition(term, meta.num_parts)].get(term)

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        field_terms, excluded = route_terms(query, self.fields)
        return _score_fields(
            field_terms, excluded, self._get, self.stats, self.fields, k,
            self.tombstones,
        )


@ray.remote
class MultiFieldServer:
    """One doc-range slice of EVERY field's partitions: the cross-field
    sum needs all of a doc's field scores co-located, and doc-sharding
    every field by the SAME bucket assignment guarantees exactly that.
    Bucket-pruned layout -> this server reads only its bucket files of
    each field sub-index."""

    def __init__(self, index_dir: str, buckets: list[int] | None):
        m = load_multifield_meta(index_dir)
        self.fields: list[str] = m["fields"]
        self.metas = {f: IndexMeta(field_dir(index_dir, f)) for f in self.fields}
        self.stats = {
            f: GlobalStats(meta.n_docs, meta.avgdl) for f, meta in self.metas.items()
        }
        self.parts = {
            f: {
                p: ShardPartition(meta.part_dir(p), buckets=buckets)
                for p in range(meta.num_parts)
            }
            for f, meta in self.metas.items()
        }
        self.tombstones = load_tombstones(index_dir)

    def _get(self, field: str, term: str):
        meta = self.metas[field]
        return self.parts[field][term_partition(term, meta.num_parts)].get(term)

    def score(self, field_terms: dict, excluded: list, k: int):
        return _score_fields(
            field_terms, excluded, self._get, self.stats, self.fields, k,
            self.tombstones,
        )


class MultiFieldEngine:
    """Driver facade: doc-sharded scatter-gather over MultiFieldServer
    actors, merged by (score, doc_id) — per-query work ~1/S per server,
    same topology maths as the single-field QueryEngine."""

    def __init__(self, index_dir: str, num_servers: int = 2):
        m = load_multifield_meta(index_dir)
        self.fields = m["fields"]
        range_bits = IndexMeta(field_dir(index_dir, self.fields[0])).range_bits
        n_buckets = 1 << range_bits
        if num_servers > n_buckets:
            raise ValueError(
                f"doc-sharded pool needs num_servers <= {n_buckets} "
                f"(2^range_bits doc-range buckets)"
            )
        self.num_servers = num_servers
        self.servers = [
            MultiFieldServer.remote(
                index_dir,
                [b for b in range(n_buckets) if b % num_servers == s],
            )
            for s in range(num_servers)
        ]

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        field_terms, excluded = route_terms(query, self.fields)
        futs = [s.score.remote(field_terms, excluded, k) for s in self.servers]
        return _merge_topk(ray.get(futs), k)

    def shutdown(self) -> None:
        for s in self.servers:
            ray.kill(s)
        self.servers = []
