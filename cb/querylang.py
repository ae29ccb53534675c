"""Lucene-lite query strings: the user-facing query surface.

Reference users query their data through Elasticsearch/Kibana query
strings (README.md: "use Kibana on top of your Elasticsearch");
this module gives the engine the load-bearing subset so a pipeline
owner can switch without rewriting queries:

    error timeout            free terms (scored, OR-matched)
    "hash join"              exact phrase (required, positional match)
    lang:en source:src3      not_analyzed field filter (ES filter ctx)
    -deprecated              exclusion (docs containing it are dropped)
    -"legacy api"            negated phrase (bool.must_not match_phrase)

Semantics (ES-aligned):
- free terms contribute BM25 score; a doc matches if it contains ANY
  scored term (phrase terms count) — ES default OR behavior;
- every quoted phrase is REQUIRED (match_phrase in a bool.must);
  phrase terms also contribute to the BM25 score;
- ``field:value`` terms go to the docmeta filter context — they change
  membership, never scores;
- ``-term`` drops every doc containing the term (bool.must_not).

Execution is pure composition of existing primitives (taat scores,
positional phrase match, docmeta mask, posting membership), so it runs
wherever they run — in-process and on every doc-sharded server (each
server evaluates its disjoint slice; the driver merge stays exact).
"""

from __future__ import annotations

import re

import numpy as np

from . import analyze

# -"..." (negated phrase) must match BEFORE the bare \S+ branch, which
# would otherwise capture -"foo from -"foo bar" and silently misparse
_TOKEN_RE = re.compile(r'-"([^"]*)"|"([^"]*)"|(\S+)')
# a word is a field filter only when it LOOKS like one: identifier
# field, simple value (no further ':' or '/') — so URLs and times in
# free text ("http://x", "at 3:30pm") stay ordinary scored terms
_FILTER_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):([^:/]+)$")


def parse(q: str) -> dict:
    """Query string -> {terms, phrases, filters, excluded,
    excluded_phrases}."""
    terms: list[str] = []
    phrases: list[list[str]] = []
    filters: dict[str, str] = {}
    excluded: list[str] = []
    excluded_phrases: list[list[str]] = []
    for m in _TOKEN_RE.finditer(q):
        neg_phrase, phrase, word = m.group(1), m.group(2), m.group(3)
        if neg_phrase is not None:
            toks = analyze.tokenize(neg_phrase)
            if toks:
                excluded_phrases.append(toks)
            continue
        if phrase is not None:
            toks = analyze.tokenize(phrase)
            if toks:
                phrases.append(toks)
            continue
        if word.startswith("-") and len(word) > 1:
            excluded.extend(analyze.tokenize(word[1:]))
            continue
        m = _FILTER_RE.match(word)
        if m:
            filters[m.group(1)] = m.group(2)
            continue
        terms.extend(analyze.tokenize(word))
    return {
        "terms": sorted(set(terms)),
        "phrases": phrases,
        "filters": filters,
        "excluded": sorted(set(excluded)),
        "excluded_phrases": excluded_phrases,
    }


def execute(
    parsed: dict,
    *,
    get_postings,
    stats,
    k: int,
    docmeta=None,
    decoded_cache: dict | None = None,
    drop_ids: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Run a parsed query over one postings scope (the whole index for
    LocalSearcher; a doc-range slice on a doc-sharded server).

    ``get_postings(term) -> ChunkedPostings | None``; ``docmeta`` is a
    :class:`cb.docmeta.DocMeta` (required when filters are present).
    """
    from . import phrase as phrase_mod, scoring, wand
    from .query import rank_topk

    score_terms = sorted(set(parsed["terms"]) | {t for p in parsed["phrases"] for t in p})
    if not score_terms:
        return []
    postings = {t: get_postings(t) for t in score_terms}
    live = {t: p for t, p in postings.items() if p is not None}
    if not live:
        return []
    idfs = {
        t: float(scoring.idf(getattr(p, "gdf", p.df), stats.n_docs))
        for t, p in live.items()
    }
    universe, acc = wand.taat_scores(live, idfs, stats, decoded_cache=decoded_cache)
    if universe is None:
        return []
    keep = np.ones(len(universe), dtype=bool)
    if drop_ids is not None and len(drop_ids):
        # tombstoned documents (sorted id array)
        pos = np.clip(np.searchsorted(drop_ids, universe), 0, len(drop_ids) - 1)
        keep &= drop_ids[pos] != universe
    # required phrases: bool.must match_phrase
    for ph in parsed["phrases"]:
        ph_postings = {t: postings.get(t) or get_postings(t) for t in set(ph)}
        if any(p is None for p in ph_postings.values()):
            return []
        hits = phrase_mod.phrase_topk(ph, ph_postings, stats, len(universe))
        hit_ids = np.array(sorted(d for d, _ in hits), dtype=np.int64)
        keep &= np.isin(universe, hit_ids, assume_unique=True)
    # negated phrases: bool.must_not match_phrase — docs containing the
    # exact sequence are dropped from the candidate universe
    for ph in parsed.get("excluded_phrases", []):
        ph_postings = {t: postings.get(t) or get_postings(t) for t in set(ph)}
        if any(p is None for p in ph_postings.values()):
            continue  # phrase can't occur anywhere -> nothing to drop
        # matches are NOT bounded by the universe (negated-phrase terms
        # are unscored): bound by the phrase's rarest term df instead
        cap = min(p.df for p in ph_postings.values())
        hits = phrase_mod.phrase_topk(ph, ph_postings, stats, cap)
        if hits:
            hit_ids = np.array(sorted(d for d, _ in hits), dtype=np.int64)
            keep &= ~np.isin(universe, hit_ids, assume_unique=True)
    # exclusions: bool.must_not term membership
    for t in parsed["excluded"]:
        p = get_postings(t)
        if p is None:
            continue
        ids, _, _ = p.decode_all()
        keep &= ~np.isin(universe, ids, assume_unique=True)
    # filter context
    if parsed["filters"]:
        if docmeta is None:
            raise ValueError(
                f"query uses field filters {sorted(parsed['filters'])} but no "
                "docmeta table is loaded (build one with cb.docmeta)"
            )
        unknown = sorted(set(parsed["filters"]) - set(docmeta.cols))
        if unknown:
            raise ValueError(
                f"unknown filter fields {unknown}; docmeta has {sorted(docmeta.cols)}"
            )
        keep &= docmeta.mask(universe, parsed["filters"])
    return rank_topk(universe[keep], acc[keep], k)
