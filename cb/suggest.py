"""Search-as-you-type and did-you-mean suggesters over the index
vocabulary — the Elasticsearch ``completion`` / ``term`` suggester
surface ConveyorBelt delegates to ES (the reference ships queries to
ES and consumes suggest blocks verbatim; here the vocabulary IS our
own ``_termdf.parquet`` summaries, so the suggesters are first-class
engine operators).

Both suggesters read the per-partition ``_termdf.parquet`` summaries
as a Ray Dataset — vocabulary-sized, NOT corpus-sized (the same tiny
files doc-sharded servers read for corpus-global df), but at 100 TB a
vocabulary is still tens of millions of terms, so candidate matching
runs distributed in ``map_batches`` and only (candidate x query)-sized
partials reach an exchange:

- phase 1 (map_batches, Arrow): per batch, match terms against every
  query (prefix mask via ``pc.starts_with``; fuzzy via a vectorized
  length-band prefilter + the DuckDB-verified Damerau-Levenshtein from
  :mod:`cb.querylang` on band survivors only) and emit
  ``(query_id, term, df)`` partial rows.
- phase 2: ``groupby(["query_id", "term"]).aggregate(Sum(df))`` merges
  the per-partition df of a term (a term's postings live in every doc
  partition, so its _termdf rows must be summed — the same rule
  ``q_term_stats`` proves against SQL).
- phase 3 (two-phase top-k, the ``top_docs_per_lang`` pattern): a
  per-batch partial top-k shrinks candidates to <= k x n_queries per
  batch before the final per-query group, so a 1-character prefix over
  a 100M-term vocabulary never collects in one task.

Ranking is exact and fully tie-broken: prefix = (df DESC, term ASC);
fuzzy = (distance ASC, df DESC, term ASC) — the ES term-suggester's
default sort. Reference analog: ConveyorBelt's ES query passthrough
(src/ConveyorBelt.Tooling/Querying) — behavior parity, new engine.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min, Sum

from . import querylang
from .build import IndexMeta


def _termdf_dataset(meta: IndexMeta) -> ray.data.Dataset:
    files = [
        os.path.join(meta.part_dir(p), "_termdf.parquet")
        for p in range(meta.num_parts)
    ]
    files = [f for f in files if os.path.exists(f)]
    return ray.data.read_parquet(files, columns=["term", "df"])


def _finalize_topk(k: int, sort_cols: list[str], ascending: list[bool], out_cols: list[str]):
    """Per-query finalize: exact top-k + 1-based rank over the (already
    batch-combined) candidate partials of ONE query."""

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[out_cols]

    return fin


def prefix_suggest(meta: IndexMeta, prefixes: list[str], k: int = 5) -> pa.Table:
    """Top-k completion suggestions per prefix, ranked (df DESC, term
    ASC). Returns (prefix_id, rank, term, df)."""
    ds = _termdf_dataset(meta)

    def match(b: pa.Table) -> pa.Table:
        outs = []
        for pid, pref in enumerate(prefixes):
            m = b.filter(pc.starts_with(b["term"], pattern=pref))
            if m.num_rows:
                outs.append(m.append_column(
                    "prefix_id", pa.array([pid] * m.num_rows, type=pa.int64())
                ))
        if not outs:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
                 "prefix_id": pa.array([], pa.int64())}
            )
        return pa.concat_tables(outs)

    merged = ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
    merged = merged.groupby(["prefix_id", "term"]).aggregate(Sum("df", alias_name="df"))

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
            .groupby("prefix_id", sort=False)
            .head(k)
        )

    fin = _finalize_topk(
        k, ["df", "term"], [False, True], ["prefix_id", "rank", "term", "df"]
    )
    partials = merged.map_batches(batch_topk, batch_format="pandas")
    out = partials.groupby("prefix_id").map_groups(fin, batch_format="pandas")
    from .collect import collect_table

    return collect_table(out)


def fuzzy_suggest(
    meta: IndexMeta, queries: list[str], max_dist: int = 2, k: int = 5
) -> pa.Table:
    """Did-you-mean: top-k vocabulary terms within Damerau-Levenshtein
    distance <= max_dist of each query term, ranked (dist ASC, df DESC,
    term ASC). Returns (query_id, rank, term, dist, df).

    The distance kernel is :func:`cb.querylang.damerau_levenshtein` —
    the unrestricted-DL variant verified equal to DuckDB's
    ``damerau_levenshtein``, so the SQL oracle checks the exact same
    metric. A vectorized length-band prefilter (|len(term) - len(q)|
    <= max_dist is a lower bound on DL) keeps the per-row Python DP off
    all but a thin band of the vocabulary batch."""
    ds = _termdf_dataset(meta)

    def match(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["term"])
        qids, terms, dfs, dists = [], [], [], []
        for qid, q in enumerate(queries):
            band = pc.and_(
                pc.greater_equal(lens, len(q) - max_dist),
                pc.less_equal(lens, len(q) + max_dist),
            )
            cand = b.filter(band)
            for t, d in zip(cand["term"].to_pylist(), cand["df"].to_pylist()):
                dist = querylang.damerau_levenshtein(q, t)
                if dist <= max_dist:
                    qids.append(qid)
                    terms.append(t)
                    dfs.append(d)
                    dists.append(dist)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "dist": pa.array(dists, pa.int64()),
            }
        )

    merged = ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
    # dist is a pure function of (query, term) — identical in every
    # partition's partial row; Min is just the merge that preserves it.
    merged = merged.groupby(["query_id", "term"]).aggregate(
        Sum("df", alias_name="df"), Min("dist", alias_name="dist")
    )

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["dist", "df", "term"], ascending=[True, False, True], kind="mergesort"
            )
            .groupby("query_id", sort=False)
            .head(k)
        )

    fin = _finalize_topk(
        k,
        ["dist", "df", "term"],
        [True, False, True],
        ["query_id", "rank", "term", "dist", "df"],
    )
    partials = merged.map_batches(batch_topk, batch_format="pandas")
    out = partials.groupby("query_id").map_groups(fin, batch_format="pandas")
    from .collect import collect_table

    return collect_table(out)


def context_prefix_suggest(
    docs_file: str,
    prefixes: list[str],
    k: int = 5,
    context_col: str = "lang",
    text_col: str = "text",
) -> pa.Table:
    """ES completion suggester WITH CONTEXTS (category contexts): per
    (prefix, context value), the top-k completions ranked by the
    context-LOCAL document frequency (df DESC, term ASC) — "suggest
    for this user's language", the context-filtered variant of
    :func:`prefix_suggest`.

    Context-local df doesn't exist in the _termdf summaries (they are
    corpus-global), so it is derived in ONE distributed pass over the
    corpus: per batch, tokens are prefix-filtered FIRST (the exchange
    carries only completion candidates, never the vocabulary), then
    per-doc-distinct (term, context) partials reduce by integer sum.
    The final per-(prefix, context) top-k is the same two-phase
    pattern as prefix_suggest.  Returns (prefix_id, ctx, rank, term,
    df)."""
    from . import analyze

    ds = ray.data.read_parquet(docs_file, columns=[context_col, text_col])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ctx": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
        b = b.combine_chunks()  # chunked take/parent-indices hazards
        toks = analyze.token_array(b[text_col])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        mask = None
        for p in prefixes:
            m = pc.starts_with(flat, pattern=p)
            mask = m if mask is None else pc.or_(mask, m)
        parents = pc.list_parent_indices(toks)
        ctx = pc.take(b[context_col].cast(pa.string()), parents)
        t = pa.table({"did": parents, "ctx": ctx, "term": flat}).filter(mask)
        if t.num_rows == 0:
            return empty
        # per-doc distinct, then per-(ctx, term) doc counts — rows are
        # whole docs, so per-batch partial dfs SUM exactly
        g = t.group_by(["did", "ctx", "term"]).aggregate([([], "count_all")])
        out = (
            g.select(["ctx", "term"])
            .group_by(["ctx", "term"])
            .aggregate([([], "count_all")])
            .rename_columns(["ctx", "term", "df"])
        )
        return out.set_column(2, "df", out["df"].cast(pa.int64()))

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = pre.groupby(["ctx", "term"]).aggregate(Sum("df", alias_name="df"))

    def attach_prefix(b: pa.Table) -> pa.Table:
        outs = []
        for pid, pref in enumerate(prefixes):
            m = b.filter(pc.starts_with(b["term"], pattern=pref))
            if m.num_rows:
                outs.append(
                    m.append_column(
                        "prefix_id", pa.array([pid] * m.num_rows, pa.int64())
                    )
                )
        if not outs:
            return pa.table(
                {
                    "ctx": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "prefix_id": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    cands = agg.map_batches(attach_prefix, batch_format="pyarrow")

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
            .groupby(["prefix_id", "ctx"], sort=False)
            .head(k)
        )

    fin = _finalize_topk(
        k, ["df", "term"], [False, True],
        ["prefix_id", "ctx", "rank", "term", "df"],
    )
    partials = cands.map_batches(batch_topk, batch_format="pandas")
    out = partials.groupby(["prefix_id", "ctx"]).map_groups(fin, batch_format="pandas")
    from .collect import collect_table

    return collect_table(out)
