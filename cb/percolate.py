"""Reverse search — the ES percolator, Ray-Data-native.

ConveyorBelt ships records to Elasticsearch and queries them later;
ES's percolator inverts that: queries are REGISTERED up front and each
arriving document reports which stored queries it matches (alerting,
saved-search notification, routing).  Here the registered queries are
parsed once with :mod:`cb.querylang` and evaluated INDEX-FREE over a
streaming ``ray.data.Dataset`` of documents.

Match semantics are exactly ``querylang.match``'s boolean layer (the
scoring layer is irrelevant — percolation is a membership question):

- >= 1 scored term present (the query's OR universe),
- every ``+required`` term present,
- every ``"phrase"`` present as an adjacent token sequence,
- no ``-excluded`` term / ``-"excluded phrase"`` present,
- every ``field:value`` filter column equal.

Scale design: the parsed query set is tiny and rides the task closure
(broadcast once per actor, not per batch); documents stream through ONE
vectorized ``map_batches`` pass — no index, no shuffle, no driver loop.
Term/phrase membership is evaluated on the space-padded token join
(`` t1 t2 ... ``) with ``pc.match_substring`` — the same containment
contract the DuckDB ``LIKE '% term %'`` oracle states, so engine and
oracle agree by construction.  Output is (query_id, doc_id) pairs.

Reference analog: ConveyorBelt's push loop decides per record which
downstream index receives it (ShardKeyActor routing); the percolator is
the content-based generalization the ES half provides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import analyze, querylang


def parse_queries(queries: list[str]) -> list[dict]:
    """Parse + validate registered percolator queries.  Wildcard/fuzzy
    atoms need a vocabulary to expand against and are rejected (the
    percolator is index-free); msm likewise (not a stored-query shape
    here)."""
    out = []
    for q in queries:
        p = querylang.parse(q)
        if p.get("expands"):
            raise ValueError(
                f"percolator query {q!r} has wildcard/fuzzy atoms; "
                "register concrete terms (no vocabulary to expand against)"
            )
        if p.get("minimum_should_match"):
            raise ValueError(f"percolator query {q!r}: msm unsupported")
        for col, val in p["filters"].items():
            if isinstance(val, querylang.Range):
                raise ValueError(
                    f"percolator query {q!r}: range filter on {col!r} "
                    "unsupported (equality filters only)"
                )
        out.append(p)
    return out


def _padded_tokens(texts) -> pa.Array:
    toks = analyze.token_array(texts)
    joined = pc.binary_join(toks, " ")
    return pc.binary_join_element_wise(
        pa.scalar(""), joined, pa.scalar(""), " "
    )


def _contains(padded: pa.Array, words: str) -> pa.ChunkedArray:
    return pc.match_substring(padded, f" {words} ")


def match_batch(batch: pa.Table, parsed: list[dict], text_col: str, id_col: str) -> pa.Table:
    """One vectorized percolation pass over an Arrow batch -> the
    (query_id, doc_id) pairs it produced."""
    padded = _padded_tokens(batch[text_col])
    ids = batch[id_col]
    qids_out, ids_out = [], []
    for qid, p in enumerate(parsed):
        weights = p.get("weights") or {
            t: 1.0 for t in set(p["terms"]) | {t for ph in p["phrases"] for t in ph}
        }
        if not weights:
            continue
        mask = None
        for t in sorted(weights):
            m = _contains(padded, t)
            mask = m if mask is None else pc.or_(mask, m)
        for t in p.get("required", []):
            mask = pc.and_(mask, _contains(padded, t))
        for ph in p["phrases"]:
            mask = pc.and_(mask, _contains(padded, " ".join(ph)))
        for ph in p.get("excluded_phrases", []):
            mask = pc.and_(mask, pc.invert(_contains(padded, " ".join(ph))))
        for t in p["excluded"]:
            mask = pc.and_(mask, pc.invert(_contains(padded, t)))
        filters = dict(p["filters"])
        filters.update(p.get("scoped_phrases", []))
        for col, val in filters.items():
            if col not in batch.column_names:
                raise ValueError(
                    f"percolator filter column {col!r} not in batch "
                    f"(has {batch.column_names})"
                )
            mask = pc.and_(mask, pc.equal(batch[col], val))
        hit = ids.filter(pc.fill_null(mask, False))
        if len(hit):
            qids_out.append(np.full(len(hit), qid, dtype=np.int64))
            ids_out.append(hit.to_numpy(zero_copy_only=False).astype(np.int64))
    if not qids_out:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(qids_out), pa.int64()),
            "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
        }
    )


def _universe_terms(p: dict) -> set[str]:
    """The scored-term universe of a parsed query (a doc must contain
    >= 1 of these to match, whatever the other clauses say)."""
    w = p.get("weights")
    if w:
        return set(w)
    return set(p["terms"]) | {t for ph in p["phrases"] for t in ph}


def percolate(
    ds,
    queries: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    prefilter: bool = True,
):
    """Percolate a document Dataset against registered queries ->
    Dataset of (query_id, doc_id) matches.  One streaming map_batches;
    queries are parsed ONCE here and shipped in the closure.

    ``prefilter`` is the ES percolator's own scale trick (it indexes
    the stored queries' terms): an inverted term -> query-ids map is
    built once from the universe terms, and each BATCH evaluates only
    the queries with >= 1 universe term present in the batch's token
    set — exact (a query with no universe term in the whole batch
    cannot match any of its docs), and it turns per-batch cost from
    O(|queries|) to O(|queries with a live term|).  At a 10k-query
    registry over a focused corpus that is the difference between a
    full sweep and a handful of evaluations per batch."""
    parsed = parse_queries(queries)
    term_to_q: dict[str, list[int]] = {}
    for qid, p in enumerate(parsed):
        for t in _universe_terms(p):
            term_to_q.setdefault(t, []).append(qid)

    def fn(batch: pa.Table) -> pa.Table:
        live = parsed
        if prefilter:
            toks = analyze.token_array(batch[text_col])
            present = set(pc.unique(pc.list_flatten(toks)).to_pylist())
            qids = sorted(
                {q for t in present for q in term_to_q.get(t, ())}
            )
            if not qids:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "doc_id": pa.array([], pa.int64()),
                    }
                )
            sub = match_batch(
                batch, [parsed[q] for q in qids], text_col, id_col
            )
            # remap the compacted ids back to registry ids
            remap = np.asarray(qids, dtype=np.int64)
            return pa.table(
                {
                    "query_id": pa.array(
                        remap[sub["query_id"].to_numpy(zero_copy_only=False)],
                        pa.int64(),
                    ),
                    "doc_id": sub["doc_id"],
                }
            )
        return match_batch(batch, live, text_col, id_col)

    return ds.map_batches(fn, batch_format="pyarrow")
