"""Lucene-lite query strings: the user-facing query surface.

Reference users query their data through Elasticsearch/Kibana query
strings (README.md: "use Kibana on top of your Elasticsearch");
this module gives the engine the load-bearing subset so a pipeline
owner can switch without rewriting queries:

    error timeout            free terms (scored, OR-matched)
    "hash join"              exact phrase (required, positional match)
    lang:en source:src3      not_analyzed field filter (ES filter ctx)
    source:"app one"         quoted filter value (spaces allowed) — or,
                             on a multi-field index, a phrase scoped to
                             one analyzed field (title:"hash join")
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

# Quoted branches must match BEFORE the bare \S+ branch, which would
# otherwise capture -"foo from -"foo bar" (and field:"foo from
# field:"foo bar") and silently misparse.  Branch order: negated scoped
# phrase (rejected with a descriptive error), scoped phrase / quoted
# filter value, negated phrase, phrase, bare word.
_TOKEN_RE = re.compile(
    r'-([A-Za-z_][A-Za-z0-9_]*):"([^"]*)"'
    r'|([A-Za-z_][A-Za-z0-9_]*):"([^"]*)"'
    r'|-"([^"]*)"|"([^"]*)"|(\S+)'
)
# a word is a field filter only when it LOOKS like one: identifier
# field, simple value (no further ':' or '/') — so URLs and times in
# free text ("http://x", "at 3:30pm") stay ordinary scored terms
_FILTER_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):([^:/]+)$")


def parse(q: str) -> dict:
    """Query string -> {terms, phrases, filters, excluded,
    excluded_phrases, scoped_phrases}.

    ``scoped_phrases`` is the RAW ``field:"..."`` list — whether a
    scoped clause is a phrase on an analyzed field or an exact filter
    value on a not_analyzed column is the executor's call (the parser
    does not know the index's field layout)."""
    terms: list[str] = []
    phrases: list[list[str]] = []
    filters: dict[str, str] = {}
    excluded: list[str] = []
    excluded_phrases: list[list[str]] = []
    scoped_phrases: list[tuple[str, str]] = []
    for m in _TOKEN_RE.finditer(q):
        neg_field, neg_val, sc_field, sc_val, neg_phrase, phrase, word = m.groups()
        if neg_field is not None:
            raise ValueError(
                f'negated scoped clauses (-{neg_field}:"{neg_val}") are not '
                "supported; negate an unscoped phrase or term instead"
            )
        if sc_field is not None:
            scoped_phrases.append((sc_field, sc_val))
            continue
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
        "scoped_phrases": scoped_phrases,
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
    # filter context; on a single-field index a scoped field:"..."
    # clause can only target a not_analyzed docmeta column (exact value
    # match — quoted so the value may contain spaces)
    filters = dict(parsed["filters"])
    filters.update(parsed.get("scoped_phrases", []))
    if filters:
        if docmeta is None:
            raise ValueError(
                f"query uses field filters {sorted(filters)} but no "
                "docmeta table is loaded (build one with cb.docmeta)"
            )
        unknown = sorted(set(filters) - set(docmeta.cols))
        if unknown:
            raise ValueError(
                f"unknown filter fields {unknown}; docmeta has {sorted(docmeta.cols)}"
            )
        keep &= docmeta.mask(universe, filters)
    return rank_topk(universe[keep], acc[keep], k)
