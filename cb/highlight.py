"""Snippet extraction (ES highlighter parity, deterministic flavor).

The reference surfaces search hits through Kibana, whose hit view is
ES's highlighter over the stored ``message`` field.  This is the
engine-side analog with EXACTLY specified semantics so a SQL oracle can
mirror it bit-for-bit:

- tokens = the engine analyzer's filtered token stream (positions are
  1-based in that stream);
- candidate windows are anchored at QUERY-TERM HIT positions (a window
  starting anywhere can be shifted right to its first hit without
  losing any of its distinct hits, so anchoring preserves the max);
- the best window maximizes the number of DISTINCT query terms inside
  ``[anchor, anchor + width - 1]``, ties broken by smallest anchor;
- the snippet is the space-joined token slice of that window.

The per-batch stage is candidate-proportional (it runs over the top-k
(query, doc) pairs, never the corpus) and vectorized per doc: one
searchsorted per query term over the anchor vector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import analyze

WIDTH = 15


def best_window(tokens: list[str], terms: list[str], width: int = WIDTH):
    """-> (anchor_1based, n_distinct_terms, snippet) or None if no term
    occurs in the doc."""
    positions = {}
    tok_arr = np.asarray(tokens, dtype=object)
    for t in set(terms):
        hits = np.flatnonzero(tok_arr == t) + 1  # 1-based
        if len(hits):
            positions[t] = hits
    if not positions:
        return None
    anchors = np.unique(np.concatenate(list(positions.values())))
    counts = np.zeros(len(anchors), dtype=np.int64)
    for hits in positions.values():
        lo = np.searchsorted(hits, anchors, side="left")
        hi = np.searchsorted(hits, anchors + width, side="left")
        counts += (hi > lo).astype(np.int64)
    # max count, tie -> smallest anchor (anchors are sorted asc, argmax
    # returns the first maximum)
    i = int(np.argmax(counts))
    a = int(anchors[i])
    snippet = " ".join(tokens[a - 1 : a - 1 + width])
    return a, int(counts[i]), snippet


def snippet_stage(query_terms: dict[int, list[str]], width: int = WIDTH):
    """map_batches fn over (query_id, doc_id, text) candidate rows ->
    (query_id, doc_id, anchor, n_terms, snippet)."""

    def f(batch: pa.Table) -> pa.Table:
        out = {"query_id": [], "doc_id": [], "anchor": [], "n_terms": [], "snippet": []}
        qids = batch["query_id"].to_pylist()
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for qid, did, text in zip(qids, dids, texts):
            res = best_window(analyze.tokenize(text), query_terms[qid], width)
            if res is None:
                continue
            a, c, s = res
            out["query_id"].append(qid)
            out["doc_id"].append(did)
            out["anchor"].append(a)
            out["n_terms"].append(c)
            out["snippet"].append(s)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "anchor": pa.array(out["anchor"], pa.int64()),
                "n_terms": pa.array(out["n_terms"], pa.int64()),
                "snippet": pa.array(out["snippet"], pa.string()),
            }
        )

    return f
