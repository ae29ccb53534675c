"""Top-k BM25 scoring over compressed postings: exact TAAT + block-max WAND.

Two scorers with identical results (tests assert equality on thousands
of queries):

- :func:`topk_taat` — exact term-at-a-time: decode everything, accumulate
  per-doc scores in sorted-term order (the float-summation spec), rank.
  Simple, vectorized; the in-engine cross-check and small-query path.
- :func:`topk_wand` — document-at-a-time WAND with the block-max check
  (Broder et al. WAND; Ding & Suel block-max refinement, public
  literature): term-global upper bounds pick the pivot, per-block max
  u-factor metadata (cb.compress) rejects doc-id ranges without decoding
  them, and skipped terms advance by whole blocks via the block-last-id
  skip lists.

Exactness under floats: every upper bound is a float64 computed with the
same multiply as real contributions (monotone under IEEE rounding), a
candidate is only skipped when its bound is STRICTLY below the current
threshold, and at-threshold candidates are still evaluated so the
(score desc, doc_id asc) tie-break can never differ from the oracle.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import scoring
from .query import rank_topk

# Doc ids are 63-bit non-negative (cb.corpus), so the exhausted sentinel
# must sit ABOVE the id space; cursors hold python ints, so 2**63 is safe.
MAX_ID = (1 << 63) - 1
INF_DOC = 1 << 63

# Instrumentation: posting blocks decoded through cursor loads.  WAND's
# scale advantage is DECODE VOLUME (blocks touched vs TAAT's
# decode-everything), which bench reports alongside wall-clock; one int
# increment per block load is noise.
BLOCKS_DECODED = 0


class TermCursor:
    """Iterator over one term's chunked, block-compressed postings."""

    __slots__ = (
        "term", "idf", "alpha", "chunked", "chunks", "blk_chunk", "blk_local",
        "blk_last", "blk_umax", "global_ub", "n_blocks", "cur_blk",
        "ids", "tfs", "dls", "pos", "cur_doc", "avgdl", "group",
    )

    def __init__(self, term: str, chunked, idf: float, alpha: int, need_umax: bool = True):
        self.term = term
        self.idf = float(idf)
        self.alpha = alpha
        # set by the topk entry points: the avgdl this cursor's u-factors
        # (and its stored block-max umax) are computed with, and the
        # summation group (field rank) for multi-field evaluation
        self.avgdl = None
        self.group = 0
        self.chunked = chunked
        self.chunks = chunked.chunks
        bc, bl, last, umax = [], [], [], []
        for ci, ch in enumerate(self.chunks):
            nb = ch.n_blocks
            bc.extend([ci] * nb)
            bl.extend(range(nb))
            last.append(ch.last_ids)
            umax.append(ch.umax)
        self.blk_chunk = np.array(bc, dtype=np.int32)
        self.blk_local = np.array(bl, dtype=np.int32)
        self.blk_last = np.concatenate(last) if last else np.empty(0, dtype=np.int64)
        self.blk_umax = np.concatenate(umax) if umax else np.empty(0, dtype=np.float64)
        self.n_blocks = len(self.blk_last)
        if need_umax and self.n_blocks and len(self.blk_umax) != self.n_blocks:
            raise ValueError(
                f"postings for {term!r} lack block-max metadata (index built "
                "with deferred umax and never annotated); run "
                "cb.build.annotate_partition or score with algo='taat'"
            )
        # term-global upper bound: idf * max block u (float64 multiply —
        # monotone, so >= every exact contribution idf * u_i)
        self.global_ub = (
            self.idf * float(self.blk_umax.max()) if len(self.blk_umax) else 0.0
        )
        self.cur_blk = -1
        self.ids = self.tfs = self.dls = None
        self.pos = 0
        self.cur_doc = INF_DOC
        if self.n_blocks:
            self._load_block(0)

    def _load_block(self, b: int) -> None:
        global BLOCKS_DECODED
        BLOCKS_DECODED += 1
        self.cur_blk = b
        ch = self.chunks[self.blk_chunk[b]]
        self.ids, self.tfs, self.dls = ch.decode_block(int(self.blk_local[b]))
        self.pos = 0
        self.cur_doc = int(self.ids[0])

    def block_ub(self) -> float:
        """Upper bound over the rest of the CURRENT block."""
        return self.idf * float(self.blk_umax[self.cur_blk])

    def block_last(self) -> int:
        return int(self.blk_last[self.cur_blk])

    def advance_to(self, target: int) -> None:
        """Move to the first doc >= target (block-skip via last-id list)."""
        if self.cur_doc >= target:
            return
        if target > MAX_ID:  # past the id space entirely
            self.cur_doc = INF_DOC
            return
        if self.blk_last[self.cur_blk] < target:
            b = int(np.searchsorted(self.blk_last, target))
            if b >= self.n_blocks:
                self.cur_doc = INF_DOC
                return
            self._load_block(b)
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # can't happen (blk_last >= target) but guard
            self.cur_doc = INF_DOC
        else:
            self.cur_doc = int(self.ids[self.pos])

    def next_doc(self) -> None:
        self.pos += 1
        if self.pos < len(self.ids):
            self.cur_doc = int(self.ids[self.pos])
        elif self.cur_blk + 1 < self.n_blocks:
            self._load_block(self.cur_blk + 1)
        else:
            self.cur_doc = INF_DOC

    def cur_tf(self) -> int:
        return int(self.tfs[self.pos])

    def cur_dl(self) -> int:
        return int(self.dls[self.pos])

    def decode_chunks(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full decode of every chunk (delegates to ChunkedPostings)."""
        return self.chunked.decode_all()


def _gather_terms(postings: dict, idfs: dict, need_umax: bool = True) -> list[TermCursor]:
    terms = sorted(t for t, p in postings.items() if p is not None and p.df > 0)
    return [
        TermCursor(t, postings[t], idfs[t], i, need_umax=need_umax)
        for i, t in enumerate(terms)
    ]


def topk_taat(
    postings: dict, idfs: dict, stats, k: int, decoded_cache: dict | None = None
) -> list[tuple[int, float]]:
    """Exact exhaustive scoring (decode-all, term-at-a-time, vectorized).

    In-memory serving default: numpy decode+accumulate beats the
    pointer-chasing WAND loop until posting lists far exceed memory;
    block-max WAND (below) is the IO-bound/disk-resident path and the
    rank-equality of the two is test-enforced.  ``decoded_cache``
    (term -> (ids, contrib)) amortizes BOTH varint decoding and the
    per-posting contribution idf*u across queries — idf, tf, dl and
    avgdl are all fixed per (index, term), so the contribution vector
    is query-independent and bitwise-stable.
    """
    if k <= 0:
        return []
    universe, acc = taat_scores(postings, idfs, stats, decoded_cache)
    if universe is None:
        return []
    return rank_topk(universe, acc, k)


def taat_scores(
    postings: dict, idfs: dict, stats, decoded_cache: dict | None = None
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Exact TAAT accumulation -> (matching doc ids sorted, scores).
    The shared core of :func:`topk_taat` and filtered search (which
    masks the universe by a metadata predicate BEFORE ranking)."""
    cursors = _gather_terms(postings, idfs, need_umax=False)
    if not cursors:
        return None, None
    per_term = []
    for c in cursors:
        # the cache stores the WEIGHT-INDEPENDENT u-factor vector; idf
        # (which carries any per-query boost) multiplies at use, so a
        # boosted query never poisons the cache for an unboosted one
        hit = decoded_cache.get(c.term) if decoded_cache is not None else None
        if hit is not None:
            ids, u_vec = hit
        else:
            ids, tfs, dls = c.decode_chunks()
            u_vec = scoring.u_factor(tfs, dls, stats.avgdl)
            if decoded_cache is not None:
                decoded_cache[c.term] = (ids, u_vec)
        per_term.append((ids, c.idf * u_vec))
    universe = np.unique(np.concatenate([ids for ids, _ in per_term]))
    acc = np.zeros(len(universe), dtype=np.float64)
    for ids, contrib in per_term:  # cursors sorted by term -> spec order
        acc[np.searchsorted(universe, ids)] += contrib
    return universe, acc


def topk_wand(postings: dict, idfs: dict, stats, k: int) -> list[tuple[int, float]]:
    """Block-max WAND; rank-identical to :func:`topk_taat`/the oracle."""
    if k <= 0:
        return []
    cursors = _gather_terms(postings, idfs)
    for c in cursors:
        c.avgdl = stats.avgdl
    return _wand_core(cursors, k)


def topk_wand_fields(
    field_postings: dict, field_idfs: dict, stats: dict, field_order: list[str], k: int
) -> list[tuple[int, float]]:
    """Block-max WAND over a most_fields MULTI-FIELD query.

    Every (field, term) pair becomes an independent cursor over the
    shared doc-id space — its own postings, idf (per-field df/N, any
    boost folded in) and per-field avgdl/umax — so the single-field
    pivot/block-max machinery applies unchanged: the most_fields doc
    score is a plain sum of cursor contributions, and idf * max-block-u
    (built with THAT field's avgdl) upper-bounds each.  Evaluation sums
    per-field partials in field order (``group`` = field rank), which
    is bitwise the TAAT accumulation spec — parity is test-enforced.

    Callers must route fed members to TAAT (fed avgdl overlays
    invalidate the stored umax bounds, same rule as the single-field
    ShardServer) — :func:`cb.multifield._score_fields` guards this.
    """
    if k <= 0:
        return []
    cursors: list[TermCursor] = []
    for gi, f in enumerate(field_order):
        live = field_postings.get(f) or {}
        terms = sorted(t for t, p in live.items() if p is not None and p.df > 0)
        for a, t in enumerate(terms):
            c = TermCursor(t, live[t], field_idfs[f][t], a)
            c.avgdl = stats[f].avgdl
            c.group = gi
            cursors.append(c)
    return _wand_core(cursors, k)


def _wand_core(cursors: list[TermCursor], k: int) -> list[tuple[int, float]]:
    if not cursors:
        return []
    heap: list[tuple[float, int]] = []  # (score, -doc_id), root = weakest

    def threshold() -> float:
        return heap[0][0] if len(heap) == k else -1.0

    def beats(key: tuple[float, int]) -> bool:
        return len(heap) < k or key > heap[0]

    while True:
        live = [c for c in cursors if c.cur_doc < INF_DOC]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc)
        # pivot: first prefix whose summed global UBs could reach the heap
        theta = threshold()
        ub = 0.0
        pivot = -1
        for i, c in enumerate(live):
            ub += c.global_ub
            if ub >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # even all terms together can't beat the threshold
        d = live[pivot].cur_doc
        if d >= INF_DOC:
            break
        if live[0].cur_doc < d:
            # outer terms must catch up to the pivot doc first
            for c in live[: pivot + 1]:
                c.advance_to(d)
            continue
        # all of live[0..pivot] are AT d. Block-max check: refined bound
        # from the blocks that actually contain/cover d.
        refined = 0.0
        for c in live[: pivot + 1]:
            refined += c.block_ub()
        # also add global bounds of any further terms already at d
        j = pivot + 1
        while j < len(live) and live[j].cur_doc == d:
            refined += live[j].block_ub()
            j += 1
        if refined < theta:
            # No doc in [d, X] can pass, where X keeps every bound valid:
            # X <= each participating cursor's current block end, and
            # X < the next non-participating cursor's doc (a term joining
            # the range would add its bound).
            boundary = min(c.block_last() for c in live[:j])
            if j < len(live):
                boundary = min(boundary, live[j].cur_doc - 1)
            target = boundary + 1
            for c in live[:j]:
                c.advance_to(target)
            continue
        # full evaluation at d: per-GROUP (= per-field) partial sums in
        # alphabetical-term order, group partials then added in group
        # order — bitwise the TAAT accumulation spec (each field's acc
        # vector sums alone, then adds into the cross-field total).
        # With one group this reduces to 0.0 + (the old flat chain).
        at_d = sorted(
            (c for c in live[:j] if c.cur_doc == d),
            key=lambda c: (c.group, c.alpha),
        )
        s = np.float64(0.0)
        gi = 0
        while gi < len(at_d):
            g = at_d[gi].group
            dl = at_d[gi].cur_dl()  # doc length rides in the postings (per field)
            sg = np.float64(0.0)
            while gi < len(at_d) and at_d[gi].group == g:
                c = at_d[gi]
                sg = sg + c.idf * scoring.u_factor(c.cur_tf(), dl, c.avgdl)
                gi += 1
            s = s + sg
        key = (float(s), -d)
        if beats(key):
            if len(heap) == k:
                heapq.heapreplace(heap, key)
            else:
                heapq.heappush(heap, key)
        for c in at_d:
            c.next_doc()
    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return [(-nd, s) for s, nd in out]
