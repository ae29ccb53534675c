"""Exact phrase queries over positional postings.

ES ``match_phrase`` parity (the reference's search side is ES): a doc
matches when the query's tokens occur at ADJACENT positions in order in
the filtered token stream; matches are ranked by the standard BM25
score of the phrase's unique terms (sorted-term accumulation — the same
float-summation spec as cb.query), ties by ascending doc_id.

Adjacency is verified vectorized: starting from the first term's
positions, each step intersects (positions + 1) with the next term's
positions for the doc; a doc matches if any chain survives.
"""

from __future__ import annotations

import numpy as np

from . import scoring
from .query import rank_topk


def _decode_with_positions(chunked):
    """ChunkedPostings -> (ids, tfs, dls, pos_flat, occ_offsets)."""
    ids, tfs, dls, pflat = [], [], [], []
    for ch in chunked.chunks:
        i, t, d = ch.decode_all()
        p, _ = ch.decode_positions()
        ids.append(i)
        tfs.append(t)
        dls.append(d)
        pflat.append(p)
    ids = np.concatenate(ids)
    tfs = np.concatenate(tfs)
    dls = np.concatenate(dls)
    pflat = np.concatenate(pflat) if pflat else np.empty(0, dtype=np.int64)
    occ_offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(tfs, out=occ_offsets[1:])
    return ids, tfs, dls, pflat, occ_offsets


def _matches_with_slop(ordered_terms, positions_for, doc: int, slop: int) -> bool:
    """Ordered proximity: positions p1 < p2 < ... < pn exist with total
    extra gap ``(pn - p1) - (n-1) <= slop``.  Greedy earliest-next per
    start minimizes pn for each p1, so the vectorized greedy chain is
    exact for the existence question."""
    starts = positions_for(ordered_terms[0], doc)
    if len(starts) == 0:
        return False
    cur = starts
    for t in ordered_terms[1:]:
        nxt = positions_for(t, doc)
        if len(nxt) == 0:
            return False
        j = np.searchsorted(nxt, cur, side="right")  # smallest pos > cur
        ok = j < len(nxt)
        starts, j = starts[ok], j[ok]
        if len(starts) == 0:
            return False
        cur = nxt[j]
    return bool(np.any(cur - starts - (len(ordered_terms) - 1) <= slop))


def phrase_topk(
    ordered_terms: list[str],
    postings: dict,
    stats,
    k: int,
    slop: int = 0,
) -> list[tuple[int, float]]:
    """Top-k docs containing the token sequence ``ordered_terms`` —
    adjacent when ``slop == 0`` (ES match_phrase), else in order within
    ``slop`` total extra gaps (the deterministic ordered flavor of ES's
    slop).  ``postings`` must contain every unique term (None -> no
    matches)."""
    if k <= 0 or not ordered_terms:
        return []
    uniq = sorted(set(ordered_terms))
    if any(postings.get(t) is None for t in uniq):
        return []
    decoded = {t: _decode_with_positions(postings[t]) for t in uniq}

    # candidate docs: contained in every term's posting list
    cand = decoded[ordered_terms[0]][0]
    for t in uniq:
        cand = np.intersect1d(cand, decoded[t][0], assume_unique=True)
        if len(cand) == 0:
            return []

    def positions_for(term: str, doc: int) -> np.ndarray:
        ids, tfs, dls, pflat, occ = decoded[term]
        j = int(np.searchsorted(ids, doc))
        return pflat[occ[j]:occ[j + 1]]

    matches = []
    for doc in cand:
        if slop > 0:
            if _matches_with_slop(ordered_terms, positions_for, int(doc), slop):
                matches.append(int(doc))
            continue
        chain = positions_for(ordered_terms[0], int(doc))
        ok = True
        for t in ordered_terms[1:]:
            nxt = positions_for(t, int(doc))
            chain = np.intersect1d(chain + 1, nxt, assume_unique=False)
            if len(chain) == 0:
                ok = False
                break
        if ok:
            matches.append(int(doc))
    if not matches:
        return []

    # BM25 of the phrase's unique terms over the matching docs, sorted-
    # term accumulation (identical float order to the scoring spec)
    scores = np.zeros(len(matches), dtype=np.float64)
    marr = np.array(matches, dtype=np.int64)
    for t in uniq:
        ids, tfs, dls, _, _ = decoded[t]
        # gdf = corpus-global df (== df unless this server holds only a
        # doc-range slice); idf must be corpus-exact either way
        idf = float(scoring.idf(getattr(postings[t], "gdf", postings[t].df), stats.n_docs))
        j = np.searchsorted(ids, marr)
        scores += idf * scoring.u_factor(tfs[j], dls[j], stats.avgdl)
    return rank_topk(marr, scores, k)


def span_first_docs(chunked, end: int) -> tuple[np.ndarray, np.ndarray]:
    """ES ``span_first`` for a single-term inner span: docs whose FIRST
    occurrence of the term ends at position <= ``end`` (ES's ``end`` is
    the exclusive span-end bound; a term at 0-based position p spans
    [p, p+1), so the condition is ``p < end``).  Per-doc position lists
    are stored ascending, so the first occurrence is one gather off the
    occurrence offsets — no per-doc loop.  Returns (doc_ids,
    first_positions), both filtered."""
    ids, tfs, dls, pflat, occ = _decode_with_positions(chunked)
    if len(ids) == 0:
        return ids, np.empty(0, dtype=np.int64)
    first = pflat[occ[:-1]]
    keep = first < end
    return ids[keep], first[keep]


def span_or_first_docs(
    chunkeds: list, end: int
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``span_first`` whose inner clause is a ``span_or`` over
    single-term spans: docs where the EARLIEST occurrence of ANY of
    the terms ends by ``end``.  Union of the per-term span_first sets
    with an unbounded end, folded to the per-doc minimum position
    (sort + minimum.reduceat), then the bound applied once — the
    per-term firsts are each one gather, no per-doc loop."""
    parts = [span_first_docs(c, 1 << 40) for c in chunkeds if c is not None]
    parts = [(i, p) for i, p in parts if len(i)]
    if not parts:
        e = np.empty(0, dtype=np.int64)
        return e, e
    ids = np.concatenate([i for i, _ in parts])
    pos = np.concatenate([p for _, p in parts])
    order = np.lexsort((pos, ids))
    ids, pos = ids[order], pos[order]
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    uids = ids[starts]
    firsts = np.minimum.reduceat(pos, starts)
    keep = firsts < end
    return uids[keep].astype(np.int64), firsts[keep].astype(np.int64)


def span_not_docs(
    chunked_a, chunked_b, slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``span_not`` (include=term_a, exclude=term_b, symmetric
    pre/post window ``slop``): docs having at least one occurrence of
    ``a`` with NO occurrence of ``b`` within ``slop`` intervening
    tokens (the span_near gap convention: excluded iff
    ``|pa - pb| - 1 <= slop``), with the first such valid position.
    Same keyed-searchsorted shape as span_near_docs: nearest-b
    distance per a-occurrence, per-doc minimum over VALID positions
    via minimum.reduceat.  Docs containing ``a`` but not ``b`` are
    valid at their first occurrence outright."""
    ids_a, tfs_a, _, pa_flat, occ_a = _decode_with_positions(chunked_a)
    if len(ids_a) == 0:
        return ids_a.astype(np.int64), np.empty(0, dtype=np.int64)
    if chunked_b is None:
        first = pa_flat[occ_a[:-1]]
        return ids_a.astype(np.int64), first.astype(np.int64)
    ids_b, tfs_b, _, pb_flat, occ_b = _decode_with_positions(chunked_b)
    only = np.setdiff1d(ids_a, ids_b, assume_unique=True)
    oj = np.searchsorted(ids_a, only)
    out_ids = [only.astype(np.int64)]
    out_pos = [pa_flat[occ_a[oj]].astype(np.int64)]
    common, ia, ib = np.intersect1d(
        ids_a, ids_b, assume_unique=True, return_indices=True
    )
    if len(common):
        la, lb = tfs_a[ia].astype(np.int64), tfs_b[ib].astype(np.int64)
        m = len(common)
        SHIFT = np.int64(1) << np.int64(32)
        ra = np.repeat(np.arange(m, dtype=np.int64), la)
        apos = pa_flat[np.repeat(occ_a[ia], la) + _ragged_arange(la)]
        ka = ra * SHIFT + apos
        rb = np.repeat(np.arange(m, dtype=np.int64), lb)
        kb = rb * SHIFT + pb_flat[np.repeat(occ_b[ib], lb) + _ragged_arange(lb)]
        INF = np.int64(1) << np.int64(40)
        dist = np.full(len(ka), INF, dtype=np.int64)
        j = np.searchsorted(kb, ka)
        hi_ok = j < len(kb)
        same_hi = np.zeros(len(ka), dtype=bool)
        same_hi[hi_ok] = (kb[j[hi_ok]] >> np.int64(32)) == ra[hi_ok]
        dist[same_hi] = kb[j[same_hi]] - ka[same_hi]
        lo_ok = j > 0
        same_lo = np.zeros(len(ka), dtype=bool)
        same_lo[lo_ok] = (kb[j[lo_ok] - 1] >> np.int64(32)) == ra[lo_ok]
        dist[same_lo] = np.minimum(dist[same_lo], ka[same_lo] - kb[j[same_lo] - 1])
        valid_pos = np.where(dist - 1 > slop, apos, INF)
        seg_starts = np.r_[np.int64(0), np.cumsum(la)[:-1]]
        minp = np.minimum.reduceat(valid_pos, seg_starts)
        keep = minp < INF
        out_ids.append(common[keep].astype(np.int64))
        out_pos.append(minp[keep].astype(np.int64))
    ids = np.concatenate(out_ids)
    pos = np.concatenate(out_pos)
    order = np.argsort(ids, kind="stable")
    return ids[order], pos[order]


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized per-segment
    arange for ragged gathers)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.r_[np.int64(0), np.cumsum(lens)[:-1]]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def span_near_docs(
    chunked_a, chunked_b, slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``span_near`` with ``in_order: false`` over two single-term
    clauses: a doc matches when SOME occurrence pair sits within
    ``slop`` intervening positions, i.e. ``min |pa - pb| - 1 <= slop``
    (for two unit-length spans, ES's unordered slop is exactly the
    token count between them).  Fully vectorized across docs: per-doc
    position lists are keyed as ``doc_rank * 2^32 + pos`` so ONE
    searchsorted finds each a-occurrence's nearest b neighbours on
    both sides, and a per-doc ``minimum.reduceat`` folds occurrence
    minima.  Returns (doc_ids, intervening-token gap) for matching
    docs, id-sorted."""
    ids_a, tfs_a, _, pa_flat, occ_a = _decode_with_positions(chunked_a)
    ids_b, tfs_b, _, pb_flat, occ_b = _decode_with_positions(chunked_b)
    common, ia, ib = np.intersect1d(
        ids_a, ids_b, assume_unique=True, return_indices=True
    )
    if len(common) == 0:
        return common.astype(np.int64), np.empty(0, dtype=np.int64)
    la, lb = tfs_a[ia].astype(np.int64), tfs_b[ib].astype(np.int64)
    m = len(common)
    SHIFT = np.int64(1) << np.int64(32)
    ra = np.repeat(np.arange(m, dtype=np.int64), la)
    ka = ra * SHIFT + pa_flat[np.repeat(occ_a[ia], la) + _ragged_arange(la)]
    rb = np.repeat(np.arange(m, dtype=np.int64), lb)
    kb = rb * SHIFT + pb_flat[np.repeat(occ_b[ib], lb) + _ragged_arange(lb)]
    INF = np.int64(1) << np.int64(40)
    dist = np.full(len(ka), INF, dtype=np.int64)
    j = np.searchsorted(kb, ka)  # first b-key >= each a-key
    hi_ok = j < len(kb)
    same_hi = np.zeros(len(ka), dtype=bool)
    same_hi[hi_ok] = (kb[j[hi_ok]] >> np.int64(32)) == ra[hi_ok]
    dist[same_hi] = kb[j[same_hi]] - ka[same_hi]
    lo_ok = j > 0
    same_lo = np.zeros(len(ka), dtype=bool)
    same_lo[lo_ok] = (kb[j[lo_ok] - 1] >> np.int64(32)) == ra[lo_ok]
    dist[same_lo] = np.minimum(dist[same_lo], ka[same_lo] - kb[j[same_lo] - 1])
    seg_starts = np.r_[np.int64(0), np.cumsum(la)[:-1]]
    mind = np.minimum.reduceat(dist, seg_starts)
    keep = mind - 1 <= slop
    return common[keep].astype(np.int64), (mind[keep] - 1)


def _match_exact(ordered_terms: list[str], decoded: dict) -> np.ndarray:
    """Sorted doc ids matching the exact-adjacency phrase (slop 0),
    using pre-decoded postings (same chain algorithm as phrase_topk)."""
    cand = decoded[ordered_terms[0]][0]
    for t in set(ordered_terms):
        cand = np.intersect1d(cand, decoded[t][0], assume_unique=True)
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64)

    def positions_for(term: str, doc: int) -> np.ndarray:
        ids, tfs, dls, pflat, occ = decoded[term]
        j = int(np.searchsorted(ids, doc))
        return pflat[occ[j]:occ[j + 1]]

    matches = []
    for doc in cand:
        chain = positions_for(ordered_terms[0], int(doc))
        for t in ordered_terms[1:]:
            chain = np.intersect1d(chain + 1, positions_for(t, int(doc)))
            if len(chain) == 0:
                break
        else:
            matches.append(int(doc))
    return np.array(matches, dtype=np.int64)


def phrase_prefix_topk(
    fixed: list[str],
    expansions: list[str],
    postings: dict,
    stats,
    k: int,
    drop_ids: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """ES match_phrase_prefix: a doc matches when the fixed tokens are
    immediately followed by ANY of the ``expansions`` (the vocabulary
    terms completing the user's trailing prefix).  Contract: docs are
    scored by BM25 of the unique FIXED terms only — the prefix position
    is a matching constraint, not a scored term (it names no single
    vocabulary term, so giving it an idf would be arbitrary); ties by
    ascending doc id.  With no fixed terms (a bare prefix), every match
    scores 0.0 and ranking degenerates to doc id order."""
    if k <= 0 or not expansions:
        return []
    uniq_fixed = sorted(set(fixed))
    if any(postings.get(t) is None for t in uniq_fixed):
        return []
    decoded = {t: _decode_with_positions(postings[t]) for t in uniq_fixed}
    match = np.empty(0, dtype=np.int64)
    for e in expansions:
        if e not in decoded:
            pe = postings.get(e)
            if pe is None:
                continue
            decoded[e] = _decode_with_positions(pe)
        match = np.union1d(match, _match_exact(list(fixed) + [e], decoded))
    if drop_ids is not None and len(drop_ids) and len(match):
        pos = np.clip(np.searchsorted(drop_ids, match), 0, len(drop_ids) - 1)
        match = match[drop_ids[pos] != match]
    if len(match) == 0:
        return []
    scores = np.zeros(len(match), dtype=np.float64)
    for t in uniq_fixed:
        ids, tfs, dls, _, _ = decoded[t]
        idf = float(scoring.idf(getattr(postings[t], "gdf", postings[t].df), stats.n_docs))
        j = np.searchsorted(ids, match)
        scores += idf * scoring.u_factor(tfs[j], dls[j], stats.avgdl)
    return rank_topk(match, scores, k)


def intervals_docs(
    chunkeds: list, max_gaps: int, ordered: bool
) -> tuple[np.ndarray, np.ndarray]:
    """ES ``intervals`` query with a ``match`` rule over N single-term
    clauses (``max_gaps``, ``ordered`` — the all_of core of ES
    intervals; reference search side is ES, same contract family as
    span_near): a doc matches when SOME tuple of positions, one
    occurrence per term (in query order when ``ordered``), spans an
    interval with at most ``max_gaps`` intervening non-term positions
    — gaps = (max_pos - min_pos + 1) - n_terms, minimized over tuples.
    Returns (doc_ids, min_gaps), id-sorted.

    Candidates are the intersection of all N posting lists, so the
    per-doc work is bounded by the rarest term's df (the same
    partitioning assumption as phrase_topk); within a doc the ordered
    flavor uses the exact greedy earliest-next chain (minimal chain
    end per start, provably minimal over in-order tuples) and the
    unordered flavor the classic two-pointer smallest-range sweep over
    the label-merged position stream."""
    e = np.empty(0, dtype=np.int64)
    if max_gaps < 0 or any(c is None for c in chunkeds):
        return e, e
    n = len(chunkeds)
    decoded = [_decode_with_positions(c) for c in chunkeds]
    cand = decoded[0][0]
    for d in decoded[1:]:
        cand = np.intersect1d(cand, d[0], assume_unique=True)
        if len(cand) == 0:
            return e, e

    def positions_for(ti: int, doc: int) -> np.ndarray:
        ids, _, _, pflat, occ = decoded[ti]
        j = int(np.searchsorted(ids, doc))
        return pflat[occ[j]:occ[j + 1]]

    out_ids: list[int] = []
    out_gaps: list[int] = []
    for doc in cand:
        doc = int(doc)
        if ordered:
            starts = positions_for(0, doc)
            cur = starts
            alive = True
            for ti in range(1, n):
                nxt = positions_for(ti, doc)
                j = np.searchsorted(nxt, cur, side="right")
                ok = j < len(nxt)
                starts, j = starts[ok], j[ok]
                if len(starts) == 0:
                    alive = False
                    break
                cur = nxt[j]
            if not alive:
                continue
            g = int(np.min(cur - starts)) - (n - 1)
            if g <= max_gaps:
                out_ids.append(doc)
                out_gaps.append(g)
            continue
        parts = [positions_for(ti, doc) for ti in range(n)]
        lab = np.concatenate(
            [np.full(len(p), ti, dtype=np.int64) for ti, p in enumerate(parts)]
        )
        pos = np.concatenate(parts)
        order = np.argsort(pos, kind="stable")
        pos, lab = pos[order], lab[order]
        count = np.zeros(n, dtype=np.int64)
        covered, left, best = 0, 0, -1
        for right in range(len(pos)):
            if count[lab[right]] == 0:
                covered += 1
            count[lab[right]] += 1
            while covered == n:
                w = int(pos[right] - pos[left])
                if best < 0 or w < best:
                    best = w
                count[lab[left]] -= 1
                if count[lab[left]] == 0:
                    covered -= 1
                left += 1
        if best >= 0:
            g = best + 1 - n
            if g <= max_gaps:
                out_ids.append(doc)
                out_gaps.append(g)
    return (
        np.array(out_ids, dtype=np.int64),
        np.array(out_gaps, dtype=np.int64),
    )


def decode_live(chunked, tombstones=None):
    """ChunkedPostings -> (ids, tfs, pflat, occ) with tombstoned docs
    (sorted int64 array) filtered OUT of both the doc axis and the
    flat position stream — the shape lm kernels count over."""
    ids, tfs, _, pflat, occ = _decode_with_positions(chunked)
    if tombstones is not None and len(tombstones) and len(ids):
        pos = np.clip(np.searchsorted(tombstones, ids), 0, len(tombstones) - 1)
        keep = tombstones[pos] != ids
        if not keep.all():
            pflat = pflat[np.repeat(keep, tfs)]
            ids, tfs = ids[keep], tfs[keep]
            occ = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(tfs, out=occ[1:])
    return ids, tfs, pflat, occ


def adjacent_pair_count(dec_a, dec_b) -> int:
    """Number of positions where term A is immediately followed by
    term B (the bigram count a phrase-suggester LM needs), summed over
    the docs both terms appear in — vectorized with the span_near
    keyed-searchsorted shape (doc_rank * 2^32 + pos), no per-doc
    loop."""
    ids_a, tfs_a, pa_flat, occ_a = dec_a
    ids_b, tfs_b, pb_flat, occ_b = dec_b
    common, ia, ib = np.intersect1d(
        ids_a, ids_b, assume_unique=True, return_indices=True
    )
    if len(common) == 0:
        return 0
    la, lb = tfs_a[ia].astype(np.int64), tfs_b[ib].astype(np.int64)
    m = len(common)
    SHIFT = np.int64(1) << np.int64(32)
    ra = np.repeat(np.arange(m, dtype=np.int64), la)
    ka = ra * SHIFT + pa_flat[np.repeat(occ_a[ia], la) + _ragged_arange(la)] + 1
    rb = np.repeat(np.arange(m, dtype=np.int64), lb)
    kb = rb * SHIFT + pb_flat[np.repeat(occ_b[ib], lb) + _ragged_arange(lb)]
    j = np.searchsorted(kb, ka)
    ok = j < len(kb)
    return int(np.count_nonzero(kb[j[ok]] == ka[ok]))
