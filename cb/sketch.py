"""Distributed cardinality sketch — the Elasticsearch ``cardinality``
aggregation analog (approximate count-distinct per group via
HyperLogLog). ConveyorBelt consumes ES aggregation blocks verbatim;
here the sketch is a first-class engine operator with the same shape:
group key in, approximate distinct-value count out.

HyperLogLog (Flajolet et al. 2007, public) with the standard
linear-counting small-range correction:

- hash: :func:`cb.hashing.md5_lower64` — the engine's one shared
  salted-hash kernel (vectorized single-block MD5 for short rows,
  hashlib fallback for long ones), deterministic across processes
  (NEVER Python ``hash()``, which is per-process salted).
- per batch (map_batches, Arrow in): group rows by key, fold each
  group's hashes into an m=2^p uint8 register array with
  ``np.maximum.at`` — a batch shrinks to (n_keys x m) bytes no matter
  how many rows it held.
- merge: register arrays are monotone-max monoids, so
  ``groupby(key).map_groups(np.maximum.reduce)`` is exact and the
  group size is (n_batches-with-key x m) bytes — bounded by batch
  COUNT, never corpus size. A hot key costs the same as a cold one.
- estimate: alpha_m * m^2 / sum(2^-rho); if E <= 2.5m and zero
  registers exist, linear counting m*ln(m/V).

At p=14 (m=16384, 16 KiB per key) the standard error is ~0.8%; the
driver-checkable contract entry asserts relative error <= 5% against
the exact count — a broken hash, register fold, or merge blows far
past that bound and flips the all-True oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .hashing import md5_lower64

HLL_P = 14
HLL_M = 1 << HLL_P
_REST_BITS = 64 - HLL_P  # 50 < 53: float64 log2 below is exact


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def registers_from_hashes(h: np.ndarray) -> np.ndarray:
    """Fold a uint64 hash array into one m-register HLL array.
    Index = top p bits; rho = 1 + leading-zero count of the remaining
    64-p bits (capped at 64-p+1 when they are all zero)."""
    h = h.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(_REST_BITS)).astype(np.int64)
    rest = h & np.uint64((1 << _REST_BITS) - 1)
    rho = np.full(len(h), _REST_BITS + 1, dtype=np.uint8)
    nz = rest > 0
    # floor(log2(rest)) is exact for rest < 2^53 (rest < 2^50 here)
    rho[nz] = (_REST_BITS - np.floor(np.log2(rest[nz].astype(np.float64)))).astype(
        np.uint8
    )
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def estimate(regs: np.ndarray) -> float:
    """HLL estimate with the linear-counting small-range correction."""
    m = len(regs)
    e = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.sum(regs == 0))
        if v:
            return float(m * np.log(m / v))
    return float(e)


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summary)
# --------------------------------------------------------------------------
#
# The hot-key detector: which groupby/shuffle keys (or corpus tokens)
# are heavy enough to need salting — found in ONE streaming pass with
# O(k) state, never a full count table.  Misra-Gries summaries are
# mergeable under arbitrary merge trees (Agarwal et al., "Mergeable
# Summaries", PODS 2012, public): merge = sum matching counters, then
# subtract the (k+1)-th largest count from all and keep the positive
# ones.  Invariants that hold for ANY distribution and ANY block/merge
# order (so contract booleans built on them are deterministic even
# though the raw estimates are not):
#
#   est(t) <= true(t)                      (never overestimates)
#   true(t) - est(t) <= (n - M) / (k + 1)  (M = sum of final counters)
#
# with est(t) = 0 for absent terms — so any t with true(t) > (n-M)/(k+1)
# is guaranteed PRESENT in the summary.


def mg_trim(terms: np.ndarray, counts: np.ndarray, k: int):
    """Trim a (term, count) table to at most k Misra-Gries counters:
    subtract the (k+1)-th largest count from every counter, keep > 0."""
    if len(terms) <= k:
        return terms, counts
    thresh = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > thresh
    return terms[keep], counts[keep] - thresh


_MG_SENTINEL = ""  # tokenizer never emits the empty string


def _mg_table(terms, counts, n: int) -> pa.Table:
    return pa.table(
        {
            "term": pa.array([_MG_SENTINEL] + list(terms), type=pa.string()),
            "est": pa.array([n] + list(np.asarray(counts, dtype=np.int64))),
        }
    )


def _mg_combine(b: pa.Table, k: int) -> pa.Table:
    """Sum matching counters within one batch of partials, then trim.
    The sentinel row carries the exact total item count (summed, never
    trimmed)."""
    g = b.group_by("term").aggregate([("est", "sum")])
    terms = np.asarray(g["term"].to_pylist(), dtype=object)
    counts = g["est_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    sent = terms == _MG_SENTINEL
    n = int(counts[sent].sum())
    t, c = mg_trim(terms[~sent], counts[~sent], k)
    return _mg_table(t, c, n)


def heavy_hitters(
    ds: ray.data.Dataset, col: str, k: int, tokenize: bool = False
) -> tuple[pa.Table, int]:
    """One-pass mergeable heavy-hitters over ``col`` (tokenized into
    terms when ``tokenize``, else the raw values).  Returns the final
    summary table (term, est) sorted (est DESC, term ASC) and the exact
    total item count n.  Per batch: exact Arrow value counts -> MG trim
    to k (a batch leaves as <= k+1 rows no matter its size); one
    intermediate map_batches combine bounds what the driver collects to
    O(blocks x k); the final merge is one more trim."""

    def batch_partial(b: pa.Table) -> pa.Table:
        vals = b[col]
        if tokenize:
            from .analyze import token_array

            vals = pc.list_flatten(token_array(vals))
        vc = vals.value_counts()
        terms = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(counts.sum())
        t, c = mg_trim(terms, counts, k)
        return _mg_table(t, c, n)

    partials = ds.map_batches(
        batch_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    combined = partials.map_batches(
        lambda b: _mg_combine(b, k), batch_format="pyarrow"
    )
    from .collect import collect_table

    collected = collect_table(combined)
    if collected.num_rows == 0:  # empty input -> schemaless blocks
        collected = _mg_table([], [], 0)
    final = _mg_combine(collected, k)
    n = final["est"][0].as_py()
    body = final.slice(1)
    order = pc.sort_indices(
        body, sort_keys=[("est", "descending"), ("term", "ascending")]
    )
    return body.take(order), n


def exact_heavy_hitters(
    ds: ray.data.Dataset, col: str, k: int, tokenize: bool = False
) -> tuple[pa.Table, int]:
    """Two-pass EXACT heavy hitters: every term whose true count
    exceeds n/(k+1), with its exact count — deterministic regardless
    of block or merge order, so it is value-checkable against a plain
    SQL GROUP BY / HAVING.

    Pass 1 is the mergeable Misra-Gries summary above: by the MG
    guarantee (true - est <= (n - M)/(k+1) <= n/(k+1)) its <= k terms
    are a SUPERSET of every term above the threshold.  Pass 2 counts
    ONLY those candidates exactly — the candidate set is tiny (<= k
    strings) so it ships inside the task closure, each batch emits
    <= k partial rows (vectorized ``pc.is_in`` mask + value counts),
    and the driver merge is O(blocks x k).  No full count table is
    ever built: a 100-TB corpus with a billion-term vocabulary costs
    the same driver memory as a toy one.

    Returns (table(term, cnt) sorted (cnt DESC, term ASC), exact n).
    """
    summary, n = heavy_hitters(ds, col, k, tokenize=tokenize)
    cand = summary["term"].combine_chunks()
    if len(cand) == 0 or n == 0:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        return empty, n

    def count_candidates(b: pa.Table) -> pa.Table:
        vals = b[col]
        if tokenize:
            from .analyze import token_array

            vals = pc.list_flatten(token_array(vals))
        hits = vals.filter(pc.is_in(vals, value_set=cand))
        vc = hits.value_counts()
        return pa.table(
            {
                "term": vc.field("values").cast(pa.string()),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(
        count_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    from .collect import collect_table

    g = collect_table(partials).group_by("term").aggregate([("cnt", "sum")])
    g = g.rename_columns(["term", "cnt"])
    heavy = g.filter(pc.greater(pc.multiply(g["cnt"], k + 1), n))
    order = pc.sort_indices(
        heavy, sort_keys=[("cnt", "descending"), ("term", "ascending")]
    )
    return heavy.take(order), n


def grouped_cardinality(
    ds: ray.data.Dataset, key: str, value: str
) -> pa.Table:
    """Approximate count-distinct of ``value`` per ``key`` group.
    Returns (key, estimate float64), one row per key, sorted by key."""

    def batch_regs(b: pa.Table) -> pa.Table:
        keys_out, regs_out = [], []
        kcol = b[key].to_pylist()
        h = md5_lower64(b[value])
        order = np.argsort(np.asarray(kcol, dtype=object), kind="stable")
        kc = [kcol[i] for i in order]
        hs = h[order]
        start = 0
        for i in range(1, len(kc) + 1):
            if i == len(kc) or kc[i] != kc[start]:
                keys_out.append(kc[start])
                regs_out.append(registers_from_hashes(hs[start:i]))
                start = i
        return pa.table(
            {
                key: pa.array(keys_out),
                "regs": pa.array(
                    [r.tobytes() for r in regs_out], type=pa.binary(HLL_M)
                ),
            }
        )

    partials = ds.map_batches(batch_regs, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        stack = np.stack(
            [np.frombuffer(r, dtype=np.uint8) for r in g["regs"].to_pylist()]
        )
        regs = np.maximum.reduce(stack)
        return pa.table(
            {
                key: g[key].slice(0, 1),
                "estimate": pa.array([estimate(regs)], type=pa.float64()),
            }
        )

    out = partials.groupby(key).map_groups(merge, batch_format="pyarrow")
    from .collect import collect_table

    return collect_table(out).sort_by(key)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (ES ``percentiles`` aggregation analog).
#
# KLL-shaped (Karnin-Lang-Liberty 2016) with DETERMINISTIC
# alternating-parity compaction instead of the paper's coin flip: a
# level buffer over capacity is sorted and every other element
# (starting offset alternates per compaction) is promoted with doubled
# weight.  Determinism keeps runs/processes reproducible (the repo's
# oracle gate depends on it); the formal randomized guarantee becomes
# an empirical one, pinned by the contract entry's rank-error bound.
# Uniform per-level capacity k gives the Manku-Rajagopalan-Lindsay
# space shape: k * log2(n/k) doubles held, regardless of stream size —
# a 10^10-value column at k=256 is ~35 levels = ~9 KB per group.
# Merging concatenates per-level buffers and recompacts, so per-batch
# partials -> groupby(key).map_groups fold is the natural Ray shape
# (same as grouped_cardinality above).
# ---------------------------------------------------------------------------


class QuantileSketch:
    """Mergeable rank/quantile sketch over float64 values."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._parity = 0

    @property
    def n(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def update_many(self, vals: np.ndarray) -> None:
        self.insert_at_level(np.asarray(vals, dtype=np.float64), 0)

    def insert_at_level(self, vals: np.ndarray, level: int) -> None:
        """Bulk insert of weight-2^level items (the merge primitive)."""
        while len(self.levels) <= level:
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[level] = np.concatenate([self.levels[level], vals])
        self._compact()

    def merge(self, other: "QuantileSketch") -> None:
        for i, b in enumerate(other.levels):
            if len(b):
                self.insert_at_level(b, i)

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) <= self.k:
                i += 1
                continue
            buf = np.sort(buf, kind="mergesort")
            off = self._parity
            self._parity ^= 1
            # odd buffer: one element stays behind at ITS OWN weight so
            # total weight (n) is conserved exactly through compaction
            if len(buf) % 2:
                leftover, buf = buf[-1:], buf[:-1]
            else:
                leftover = np.empty(0, dtype=np.float64)
            promoted = buf[off::2]
            self.levels[i] = leftover
            if len(self.levels) <= i + 1:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([b for b in self.levels]) if self.levels else np.empty(0)
        wts = (
            np.concatenate(
                [np.full(len(b), 1 << i, dtype=np.int64) for i, b in enumerate(self.levels)]
            )
            if self.levels
            else np.empty(0, dtype=np.int64)
        )
        return vals, wts

    def quantile(self, q: float) -> float:
        """Smallest stored value whose weighted cumulative count reaches
        ``ceil(q * n)`` (the quantile_disc convention the exact operator
        uses)."""
        vals, wts = self._items()
        if len(vals) == 0:
            raise ValueError("empty sketch")
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(vals[np.searchsorted(cum, target)])

    def to_rows(self) -> list[tuple[int, np.ndarray]]:
        return [(i, b) for i, b in enumerate(self.levels) if len(b)]


def grouped_quantile_sketch(
    ds: ray.data.Dataset, key: str, value: str, pcts: tuple[float, ...], k: int = 256
) -> pa.Table:
    """Approximate percentiles of ``value`` per ``key`` group via
    mergeable sketches: per-batch partial sketches shrink each batch to
    O(k log) doubles per key, the per-key fold merges buffers level by
    level — no group ever materializes its raw values.  Returns
    (key, pct, est) sorted by (key, pct)."""

    def batch_partial(b: pa.Table) -> pa.Table:
        kcol = b[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = b[value].to_numpy(zero_copy_only=False).astype(np.float64)
        keys_out, lvl_out, buf_out = [], [], []
        order = np.argsort(codes, kind="stable")
        sc, sv = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.append(starts[1:], len(sc))
        dictionary = enc.dictionary.to_pylist()
        for s, e in zip(starts, ends):
            sk = QuantileSketch(k)
            sk.update_many(sv[s:e])
            for lvl, buf in sk.to_rows():
                keys_out.append(dictionary[sc[s]])
                lvl_out.append(lvl)
                buf_out.append(buf)
        return pa.table(
            {
                key: pa.array(keys_out),
                "level": pa.array(lvl_out, type=pa.int64()),
                "buf": pa.array(
                    [b_.tolist() for b_ in buf_out], type=pa.list_(pa.float64())
                ),
            }
        )

    partials = ds.map_batches(batch_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        sk = QuantileSketch(k)
        lvls = g["level"].to_numpy(zero_copy_only=False)
        bufs = g["buf"].to_pylist()
        # insert deepest levels first so recompaction order is stable
        for i in np.argsort(lvls, kind="stable")[::-1]:
            sk.insert_at_level(np.asarray(bufs[i], dtype=np.float64), int(lvls[i]))
        return pa.table(
            {
                key: pa.concat_arrays([g[key].slice(0, 1).combine_chunks()] * len(pcts)),
                "pct": pa.array(list(pcts), type=pa.float64()),
                "est": pa.array([sk.quantile(p) for p in pcts], type=pa.float64()),
            }
        )

    out = partials.groupby(key).map_groups(merge, batch_format="pyarrow")
    from .collect import collect_table

    return collect_table(out).sort_by([(key, "ascending"), ("pct", "ascending")])
