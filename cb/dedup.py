"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's dedup is the idempotent deterministic-ID upsert
(``_id = PartitionKey + RowKey``,
/root/reference/src/ConveyorBelt.Tooling/NestBatchPusher.cs:70-71) —
replays overwrite, never duplicate.  Here that becomes a first-class
operator family over text/embedding columns, each expressed Ray-Data
first: vectorized signature computation in ``map_batches``, candidate
generation through a ``groupby`` on the bucket key (the only shuffle),
verification inside the group or a tiny second stage.
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Min

from . import analyze

SHINGLE_SEP = "\x1f"


# --------------------------------------------------------------------------
# Exact dedup: hash-partition + per-group first (SURVEY.md §2.8 D1)
# --------------------------------------------------------------------------

def _add_text_sha(batch: pa.Table, *, text_col: str) -> pa.Table:
    sha = [hashlib.sha256(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column("content_sha256", pa.array(sha, type=pa.string()))


def exact_duplicates(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """-> (content_sha256, keep_doc_id, n_docs): one row per distinct
    content; ``keep_doc_id`` = min id (deterministic survivor)."""
    hashed = ds.map_batches(
        _add_text_sha, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    ).select_columns(["content_sha256", id_col])
    agg = hashed.groupby("content_sha256").aggregate(
        Min(id_col, alias_name="keep_doc_id"), Count(alias_name="n_docs")
    )
    return agg


def sql_exact_duplicates(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT sha256({text_col}) AS content_sha256,
       min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS n_docs
FROM {table} GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Shingles + MinHash + LSH
# --------------------------------------------------------------------------

# Mersenne prime 2^31-1: (a*x+b) for a,b,x < 2^31 fits uint64, so the
# permutation family vectorizes as one numpy broadcast per batch with a
# cheap shift-fold for the modulo.  31-bit hash space is the standard
# engineering tradeoff for MinHash (collision bias ~|shingles|^2 / 2^32
# per permutation — negligible at document scale).
_MERSENNE = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_set(tokens: list[str], n: int = 3) -> list[str]:
    if len(tokens) < n:
        return []
    return sorted({SHINGLE_SEP.join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)})


def _shingle_hashes(shingles) -> np.ndarray:
    """md5-lower-64 per shingle — the exact value DuckDB's
    ``md5_number_lower`` returns, so the whole MinHash+LSH pipeline has
    an exact SQL oracle (:func:`sql_minhash_neardup`).  Batched kernel
    (:mod:`cb.hashing`); runs over the batch's UNIQUE-shingle vocab."""
    from .hashing import md5_lower64

    return md5_lower64(shingles)


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_hashes,) uint64 signature; empty input -> all-max sentinel.

    Fully vectorized: y = a*x+b < 2^62 fits uint64; y mod (2^31-1) via
    two shift-folds (2^31 === 1 mod p).  One (H, S) broadcast per call.
    """
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    p = np.uint64(_MERSENNE)
    x = (shingle_hashes % p)[None, :]  # (1, S), < 2^31
    y = a[:, None] * x + b[:, None]  # < 2^62, exact in uint64
    y = (y >> np.uint64(31)) + (y & p)  # < 2^32
    y = (y >> np.uint64(31)) + (y & p)  # < p + 1
    y = np.where(y >= p, y - p, y)
    return y.min(axis=1).astype(np.uint64)


def _batch_shingles(batch: pa.Table, text_col: str, n: int):
    """Vectorized batch shingling: Arrow tokenizer -> flat token array
    -> n-gram join via ``binary_join_element_wise`` over shifted takes
    (doc boundaries masked).  Returns (shingle strings, per-doc start
    offsets into them, per-doc shingle counts) — duplicates within a
    doc are KEPT (min-hash is duplicate-insensitive)."""
    return _token_windows(analyze.token_array(batch[text_col]), n)


def _token_windows(kept: pa.Array, n: int):
    """The shingle kernel over an already-tokenized ``list<string>``
    array — shared by the near-dup signatures (via
    :func:`_batch_shingles`) and the duplicate-substring span pass,
    which needs the token array itself to rebuild stripped text."""
    import pyarrow.compute as pc

    offsets = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts0 = offsets[:-1] - offsets[0]
    lens = np.diff(offsets)
    counts = np.maximum(lens - (n - 1), 0)
    total = int(counts.sum())
    sh_starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(counts, out=sh_starts[1:])
    if total == 0:
        return pa.array([], type=pa.string()), sh_starts, counts
    flat = pc.list_flatten(kept)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # position j of doc d emits flat[start_d + j + 0..n-1]
    base = np.repeat(starts0, counts) + (
        np.arange(total, dtype=np.int64) - np.repeat(sh_starts[:-1], counts)
    )
    parts = [flat.take(pa.array(base + j)) for j in range(n)]
    # last argument is the separator (elementwise join of the n takes)
    return pc.binary_join_element_wise(*parts, SHINGLE_SEP), sh_starts, counts


class MinHashStage:
    """Actor-pool stage: hash params built once per actor (__init__),
    signatures per batch (__call__).  Fully vectorized: Arrow n-gram
    shingling, md5 over the batch's unique-shingle vocabulary only,
    then per-permutation segment minima (``np.minimum.reduceat``) over
    the flat shingle-hash stream — no per-doc Python loop."""

    def __init__(self, num_hashes: int = 128, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _hash_params(num_hashes)
        self.num_hashes = num_hashes
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shingles, sh_starts, counts = _batch_shingles(
            batch, self.text_col, self.shingle_n
        )
        n = len(counts)
        sigs = np.full(
            (n, self.num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        if len(shingles):
            enc = pc.dictionary_encode(shingles)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            x = (_shingle_hashes(enc.dictionary) % np.uint64(_MERSENNE))[codes]
            p = np.uint64(_MERSENNE)
            nonempty = counts > 0
            seg = sh_starts[:-1][nonempty]
            for h in range(self.num_hashes):
                y = self.a[h] * x + self.b[h]  # < 2^62, exact in uint64
                y = (y >> np.uint64(31)) + (y & p)
                y = (y >> np.uint64(31)) + (y & p)
                y = np.where(y >= p, y - p, y)
                sigs[nonempty, h] = np.minimum.reduceat(y, seg)
        flat_vals = pa.array(sigs.astype(np.int64).ravel(), type=pa.int64())
        offs = pa.array(
            np.arange(0, (n + 1) * self.num_hashes, self.num_hashes, dtype=np.int32)
        )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "minhash": pa.ListArray.from_arrays(offs, flat_vals),
                "n_shingles": pa.array(counts, type=pa.int64()),
            }
        )


def _band_rows(batch: pa.Table, *, bands: int, rows_per_band: int) -> pa.Table:
    """Signatures -> (band, band_hash, doc_id) rows for the LSH groupby.

    Vectorized: the signature list column reshapes to an (n, H) matrix
    and each band's key is a wraparound polynomial hash of its rows —
    equal band values always collide (that is the LSH bucket), unequal
    values collide with ~2^-64 probability (a spurious candidate the
    verify stage then rejects).  No per-doc Python loop."""
    import pyarrow.compute as pc

    num_hashes = bands * rows_per_band
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nsh = batch["n_shingles"].to_numpy(zero_copy_only=False)
    live = nsh > 0
    n = int(live.sum())
    if n == 0:
        return pa.table(
            {
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    col = batch["minhash"].combine_chunks()
    mat = (
        pc.list_flatten(col)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .reshape(len(ids), num_hashes)[live]
        .view(np.uint64)
    )
    C = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier, wraparound mul
    out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_hash = np.empty(bands * n, dtype=np.uint64)
    for bnd in range(bands):
        h = np.full(n, np.uint64(bnd + 1), dtype=np.uint64)
        for j in range(rows_per_band):
            h = h * C + mat[:, bnd * rows_per_band + j]
        out_hash[bnd * n : (bnd + 1) * n] = h
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(np.tile(ids[live], bands), type=pa.int64()),
        }
    )


def _emit_pairs(group: pd.DataFrame, max_group: int | None = None) -> pd.DataFrame:
    """All-pairs within one candidate bucket.  ``max_group`` caps the
    bucket size: a bucket with more distinct docs than the cap is DROPPED
    (logged) — an LSH bucket or shingle shared by thousands of docs
    carries no near-dup signal and its O(n^2) pair fan-out would
    dominate the whole job (hot-key guard; skew test proves bounded
    time on a degenerate corpus)."""
    docs = np.unique(group["doc_id"].to_numpy())
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
    )
    if len(docs) < 2:
        return empty
    if max_group is not None and len(docs) > max_group:
        import logging

        logging.getLogger(__name__).warning(
            "dedup: dropping hot bucket with %d docs (cap %d, ~%d pairs skipped)",
            len(docs), max_group, len(docs) * (len(docs) - 1) // 2,
        )
        return empty
    # vectorized upper-triangle pair expansion (no Python double loop)
    ii, jj = np.triu_indices(len(docs), k=1)
    return pd.DataFrame({"doc_a": docs[ii], "doc_b": docs[jj]})


def _candidate_columns(pairs: ray.data.Dataset, cols: tuple[str, str] = ("doc_a", "doc_b")) -> np.ndarray:
    """Distinct ids appearing in the candidate-pair dataset (sorted).
    Candidate-proportional, NOT corpus-proportional: safe to hold on the
    driver and broadcast."""
    a, b = cols
    chunks = []
    for batch in pairs.select_columns([a, b]).iter_batches(batch_format="numpy"):
        chunks.append(np.asarray(batch[a], dtype=np.int64))
        chunks.append(np.asarray(batch[b], dtype=np.int64))
    if not chunks:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(chunks))


def _pair_counts(
    pairs: ray.data.Dataset, count_col: str, n_buckets: int = 64
) -> ray.data.Dataset:
    """Distinct (doc_a, doc_b) rows + occurrence counts.

    Replaces ``groupby([doc_a, doc_b]).aggregate(Count)``: Ray's generic
    aggregate over a two-column key materializes one group per DISTINCT
    PAIR (measured ~85 s for 500k candidate rows on this box — the
    dominant cost of every near-dup pipeline).  Here the per-pair count
    is a per-batch Arrow ``group_by`` partial (combiner), ONE shuffle
    keyed by a bounded hash bucket of the pair, and a vectorized Arrow
    merge per bucket — group count is ``n_buckets``, never
    pair-cardinality (same pattern as the index build's partial rows).
    """
    def partial_count(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["doc_a", "doc_b"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_a", "doc_b", "n"])
        )
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((a * np.uint64(1000003)) ^ b) % np.uint64(n_buckets)
        return t.append_column("bucket", pa.array(h.astype(np.int32), type=pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        return (
            group.select(["doc_a", "doc_b", "n"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([("n", "sum")])
            .rename_columns(["doc_a", "doc_b", count_col])
        )

    return (
        pairs.map_batches(partial_count, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def _make_sig_side(t: "pa.Table | None", id_col: str, *, sig_col: str, width: int) -> dict:
    """(ids, (n, width) signature matrix) LUT from the candidate slice."""
    import pyarrow.compute as pc

    if t is None:
        return {"ids": np.empty(0, dtype=np.int64),
                "sigs": np.empty((0, width), dtype=np.int64)}
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(t[sig_col])
    sigs = flat.to_numpy(zero_copy_only=False).astype(np.int64).reshape(len(ids), width)
    return {"ids": ids, "sigs": sigs}


def _make_simhash_side(t: "pa.Table | None", id_col: str) -> dict:
    if t is None:
        return {"ids": np.empty(0, dtype=np.int64),
                "sigs": np.empty(0, dtype=np.uint64)}
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sigs = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return {"ids": ids, "sigs": sigs}


def _make_count_side(t: "pa.Table | None", id_col: str) -> dict:
    if t is None:
        return {"ids": np.empty(0, dtype=np.int64),
                "n": np.empty(0, dtype=np.float64)}
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return {"ids": ids,
            "n": t["count()"].to_numpy(zero_copy_only=False).astype(np.float64)}


def _pair_indices(batch: pa.Table, ids_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(doc_a, doc_b) columns -> positions into a sorted candidate-id
    array (vectorized searchsorted; every candidate is present by
    construction)."""
    a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    return np.searchsorted(ids_sorted, a), np.searchsorted(ids_sorted, b)


def _slice_by_ids_ds(
    ds: ray.data.Dataset, ids: np.ndarray, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``id_col`` is in ``ids`` — the dataflow does
    the filtering (one broadcast membership test per batch)."""
    ref = ray.put(ids)

    def keep(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        col = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.zeros(len(col), dtype=bool)
        pos = np.searchsorted(want, col)
        in_range = pos < len(want)
        mask[in_range] = want[pos[in_range]] == col[in_range]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


@ray.remote
def _assemble_side(make, id_col: str, *blocks) -> dict:
    """Concat the filtered candidate blocks, sort by id, hand to the
    caller's ``make(table, id_col) -> dict`` LUT builder — all INSIDE a
    Ray task, so the candidate slice and the LUT live in the object
    store end-to-end and the driver only ever holds the ObjectRef."""
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
        for b in blocks
    ]
    live = [t for t in tables if t.num_rows]
    if live:
        t = pa.concat_tables(live, promote_options="default").combine_chunks().sort_by(id_col)
    else:
        t = None
    return make(t, id_col)


def _candidate_side(ds: ray.data.Dataset, ids: np.ndarray, make, id_col: str = "doc_id"):
    """ObjectRef to the verification side LUT over the candidate slice
    of ``ds``: filter in the dataflow, assemble in a task — at a
    near-dup-heavy 100 TB corpus the candidate slice is itself large,
    so it must never round-trip through the driver (it used to via
    take_all + ray.put)."""
    filtered = _slice_by_ids_ds(ds, ids, id_col)
    return _assemble_side.remote(make, id_col, *filtered.to_arrow_refs())


def minhash_near_duplicates(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    concurrency: int = 4,
    max_bucket: int | None = 1024,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup: signature (actor pool) -> band rows ->
    groupby(band, band_hash) -> candidate pairs -> signature-estimated
    Jaccard filter.  -> (doc_a, doc_b, est_jaccard).

    Verification is dataflow-shaped: candidate ids (pair-proportional)
    are broadcast to FILTER the signature dataset down to the candidate
    slice; nothing corpus-sized ever reaches the driver.  ``max_bucket``
    caps LSH bucket fan-out (hot-bucket guard, dropped buckets logged).
    """
    from functools import partial as _partial

    rows_per_band = num_hashes // bands
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "num_hashes": num_hashes,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    sigs_mat = sigs.materialize()  # reused: band rows + verification slice
    band_rows = sigs_mat.map_batches(
        _band_rows,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pyarrow",
    )
    cand = band_rows.groupby(["band", "band_hash"]).map_groups(
        _partial(_emit_pairs, max_group=max_bucket), batch_format="pandas"
    )
    pairs = _pair_counts(cand, "n_bands").materialize()
    # verification: signature-estimated Jaccard over the CANDIDATE slice
    # of the signature dataset (filtered in the dataflow, broadcast once
    # as a (sorted ids, signature matrix) pair — one numpy comparison
    # per batch, no per-pair Python loop)
    lut_ref = _candidate_side(
        sigs_mat, _candidate_columns(pairs),
        _partial(_make_sig_side, sig_col="minhash", width=num_hashes),
    )

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = ray.get(lut_ref)
        ia, ib = _pair_indices(batch, s["ids"])
        est = (s["sigs"][ia] == s["sigs"][ib]).mean(axis=1)
        t = batch.append_column("est_jaccard", pa.array(est, type=pa.float64()))
        return t.filter(pc.greater_equal(t["est_jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash (64-bit) near-dup
# --------------------------------------------------------------------------

def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over the token stream; token hash = md5-lower-64
    (DuckDB ``md5_number_lower``) so :func:`sql_simhash_neardup` is an
    exact oracle.  Bit i is set when the per-occurrence +/-1 sum over
    that bit is strictly positive."""
    if not tokens:
        return 0
    import struct

    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, w in Counter(tokens).items():
        h = struct.unpack("<Q", hashlib.md5(tok.encode()).digest()[8:16])[0]
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += w * (2 * bits - 1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_stage(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized batch SimHash: md5 over the batch's unique-token
    vocabulary only, bit matrix via ``np.unpackbits``, per-doc +/-1
    votes with one ``np.add.reduceat`` — no per-doc/per-token Python
    loop (bit-identical to :func:`simhash64`, asserted in tests)."""
    import struct

    import pyarrow.compute as pc

    kept = analyze.token_array(batch[text_col])
    offsets = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts0 = offsets[:-1] - offsets[0]
    lens = np.diff(offsets)
    n = len(lens)
    u = np.zeros(n, dtype=np.uint64)
    total = int(lens.sum())
    if total:
        flat = pc.list_flatten(kept)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        H = _shingle_hashes(enc.dictionary)  # batched kernel over the vocab
        # (V, 64) sign matrix: column i is +/-1 for bit i (little-endian
        # byte view + bitorder="little" puts bit 0 in column 0)
        bits = np.unpackbits(
            H.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)
        signs = 2 * bits - 1
        nonempty = lens > 0
        acc = np.add.reduceat(signs[codes], starts0[nonempty], axis=0)
        set_bits = acc > 0
        u[nonempty] = (
            set_bits.astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch[id_col],
            "simhash": pa.array(u.view(np.int64), type=pa.int64()),
        }
    )


def simhash_near_duplicates(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 1024,
) -> ray.data.Dataset:
    """4-band exact-match blocking (Hamming<=3 guarantees >=1 equal
    16-bit band) -> candidate pairs -> exact Hamming verify.

    Scale note: 16-bit bands give only 65,536 buckets per band, so at
    >=10^7 docs buckets go quadratic — ``max_bucket`` bounds the pair
    fan-out (dropped buckets logged).  At that corpus scale prefer
    8x8-bit banding with a higher verify bar, or MinHash LSH.
    Verification broadcasts only the candidate slice of the signature
    dataset (dataflow filter), never the corpus."""
    from functools import partial as _partial

    sigs = ds.map_batches(
        simhash_stage,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
    ).materialize()

    def bands(batch: pa.Table) -> pa.Table:
        u = (
            batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
            .view(np.uint64)
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        # row-major (doc-major) order matches the old per-doc loop
        h = ((u[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n), type=pa.int32()),
                "band_hash": pa.array(h.ravel(), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, 4), type=pa.int64()),
            }
        )

    cand = (
        sigs.map_batches(bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_partial(_emit_pairs, max_group=max_bucket), batch_format="pandas")
    )
    pairs = _pair_counts(cand, "n_bands").materialize()
    lut_ref = _candidate_side(sigs, _candidate_columns(pairs), _make_simhash_side)

    def verify(batch: pa.Table) -> pa.Table:
        s = ray.get(lut_ref)
        ia, ib = _pair_indices(batch, s["ids"])
        x = s["sigs"][ia] ^ s["sigs"][ib]
        # vectorized 64-bit popcount: unpackbits over the byte view
        d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(
            axis=1
        ).astype(np.int64)
        keep = d <= max_hamming
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a[keep], type=pa.int64()),
                "doc_b": pa.array(b[keep], type=pa.int64()),
                "hamming": pa.array(d[keep], type=pa.int64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (SQL-mirrorable; the oracle-checked dedup)
# --------------------------------------------------------------------------

def _shingle_rows(batch: pa.Table, *, text_col: str, id_col: str, n: int) -> pa.Table:
    """(doc_id, shingle) rows, DISTINCT per doc (shingle_set semantics),
    fully vectorized: Arrow n-gram shingling (duplicates kept) +
    dictionary-encode + unique (doc, code) pair dedup — no per-row
    Python tokenize/set loop."""
    import pyarrow.compute as pc

    shingles, _, counts = _batch_shingles(batch, text_col, n)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(shingles) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "shingle": pa.array([], type=pa.string()),
            }
        )
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    enc = pc.dictionary_encode(shingles)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = int(len(enc.dictionary))
    uniq = np.unique(doc_of * v + codes)
    return pa.table(
        {
            "doc_id": pa.array(ids[uniq // v], type=pa.int64()),
            "shingle": enc.dictionary.take(pa.array(uniq % v)),
        }
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> pa.Table:
    """Exact Jaccard over DISTINCT n-gram shingle sets.
    -> (doc_a, doc_b, jaccard) for pairs >= threshold.

    Pair generation happens per shingle group (the groupby is the only
    shuffle).  Doc-set sizes come from a dataflow aggregate FILTERED to
    the candidate ids before they reach the driver (pair-proportional,
    never corpus-sized).  ``max_df`` drops shingles shared by more than
    that many docs (hot-shingle guard: a near-universal shingle carries
    no signal and fans out O(n^2) pairs; dropped shingles are logged).
    The default None keeps the exact-SQL-oracle semantics; large-corpus
    callers should set it (~100) and accept the documented bias."""
    from functools import partial as _partial

    rows = ds.map_batches(
        _shingle_rows,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "n": n},
        batch_format="pyarrow",
    )
    rows_mat = rows.materialize()
    cand = rows_mat.groupby("shingle").map_groups(
        _partial(_emit_pairs, max_group=max_df), batch_format="pandas"
    )
    co = _pair_counts(cand, "n_common").materialize()
    sizes_ref = _candidate_side(
        rows_mat.groupby("doc_id").aggregate(Count()), _candidate_columns(co),
        _make_count_side,
    )

    def jaccard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = ray.get(sizes_ref)
        ia, ib = _pair_indices(batch, side["ids"])
        c = batch["n_common"].to_numpy(zero_copy_only=False).astype(np.float64)
        na, nb = side["n"][ia], side["n"][ib]
        j = c / (na + nb - c)
        t = batch.append_column("jaccard", pa.array(j, type=pa.float64()))
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    out = co.map_batches(jaccard, batch_format="pyarrow")
    return out


def sql_ngram_jaccard(
    table: str = "documents", text_col: str = "text", n: int = 3, threshold: float = 0.5
) -> str:
    tok = analyze.sql_token_array(text_col)
    sep = f"chr({ord(SHINGLE_SEP)})"  # derived from the Python separator
    shingle = f" || {sep} || ".join(f"d.toks[i.r+{j}]" if j else "d.toks[i.r]" for j in range(n))
    return f"""
WITH docs AS (SELECT doc_id, {tok} AS toks FROM {table}),
sh AS (
  SELECT DISTINCT d.doc_id, {shingle} AS shingle
  FROM docs d, (SELECT unnest(range(1, greatest(len(toks) - {n - 2}, 1))) AS r, doc_id
                FROM docs) i
  WHERE i.doc_id = d.doc_id
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT co.doc_a, co.doc_b, n_common,
       n_common::DOUBLE / (sa.n + sb.n - n_common)::DOUBLE AS jaccard
FROM co JOIN sizes sa ON sa.doc_id = co.doc_a JOIN sizes sb ON sb.doc_id = co.doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common)::DOUBLE >= {threshold}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# Exact SQL oracles for the hash-based near-dup pipelines
# --------------------------------------------------------------------------

def sql_minhash_neardup(
    table: str = "documents",
    text_col: str = "text",
    *,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> str:
    """Exact DuckDB mirror of :func:`minhash_near_duplicates`: same
    shingles (stop-filtered token trigrams), same md5-lower-64 shingle
    hash (``md5_number_lower``), same (a*x+b) mod 2^31-1 permutation
    family (the seeded constants are inlined as a VALUES table), band
    candidates = pairs agreeing on ALL rows of >=1 band, and the same
    signature-estimated Jaccard filter.  The engine's polynomial
    band-bucket key can only differ from band-value equality on a
    ~2^-64 collision (a spurious candidate the verify stage rejects).
    """
    tok = analyze.sql_token_array(text_col)
    rows_per_band = num_hashes // bands
    a, b = _hash_params(num_hashes)
    perm_rows = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_hashes)
    )
    sep = f"chr({ord(SHINGLE_SEP)})"
    shingle = f" || {sep} || ".join(
        f"d.toks[i.r+{j}]" if j else "d.toks[i.r]" for j in range(shingle_n)
    )
    return f"""
WITH docs AS (SELECT doc_id, {tok} AS toks FROM {table}),
sh AS (
  SELECT DISTINCT d.doc_id, {shingle} AS shingle
  FROM docs d, (SELECT unnest(range(1, greatest(len(toks) - {shingle_n - 2}, 1))) AS r, doc_id
                FROM docs) i
  WHERE i.doc_id = d.doc_id
),
hx AS (SELECT doc_id, CAST(md5_number_lower(shingle) % {_MERSENNE} AS BIGINT) AS x FROM sh),
perms(pid, pa, pb) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, pid, min((pa * x + pb) % {_MERSENNE}) AS v
  FROM hx CROSS JOIN perms GROUP BY doc_id, pid
),
bandsig AS (
  SELECT doc_id, pid // {rows_per_band} AS band, list(v ORDER BY pid) AS bv
  FROM sig GROUP BY doc_id, pid // {rows_per_band}
),
cand AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS n_bands
  FROM bandsig x JOIN bandsig y
    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
fullsig AS (SELECT doc_id, list(v ORDER BY pid) AS fs FROM sig GROUP BY doc_id)
SELECT c.doc_a, c.doc_b, c.n_bands,
       list_sum(list_transform(range(1, {num_hashes + 1}),
                i -> CASE WHEN fa.fs[i] = fb.fs[i] THEN 1 ELSE 0 END))::DOUBLE
         / {num_hashes}.0 AS est_jaccard
FROM cand c
JOIN fullsig fa ON fa.doc_id = c.doc_a
JOIN fullsig fb ON fb.doc_id = c.doc_b
WHERE list_sum(list_transform(range(1, {num_hashes + 1}),
               i -> CASE WHEN fa.fs[i] = fb.fs[i] THEN 1 ELSE 0 END))::DOUBLE
        / {num_hashes}.0 >= {threshold}
ORDER BY doc_a, doc_b
"""


def cluster_pairs(
    pairs: ray.data.Dataset,
    *,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Connected components over an undirected near-dup PAIR dataset ->
    (doc_id, cluster_rep) for every doc appearing in any pair, where
    ``cluster_rep`` is the component's minimum doc id (the canonical
    survivor a fuzzy-dedup pipeline keeps).

    Pairs are necessary but not sufficient for dedup: near-duplication
    is transitive in practice (A~B, B~C => keep one of {A,B,C}), so the
    keep-set must come from components of the pair GRAPH, not from the
    pair list.

    Hash-to-min label propagation with the repo's candidate-LUT
    contract: the label table is CANDIDATE-proportional (only docs that
    appear in some pair), lives in the object store (assembled by Ray
    tasks — :func:`_assemble_side` pattern, never the driver), and each
    round is one vectorized ``map_batches`` over the edges (searchsorted
    label lookup + per-batch (dst, min label) partials) followed by one
    ``groupby(node).min``.  Labels are monotone non-increasing, so the
    label SUM is a one-scalar convergence test per round.  Rounds =
    component diameter (near-dup clusters: small)."""
    import pyarrow.compute as _pc

    def sym(b: pa.Table) -> pa.Table:
        a = b[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, bb]), type=pa.int64()),
                "dst": pa.array(np.concatenate([bb, a]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    def _cols(blocks, names):
        """Block -> numpy columns; tolerates pandas-backed and schemaless
        empty blocks (the Dataset.to_arrow_refs gotcha, cb.collect)."""
        for b in blocks:
            if not isinstance(b, pa.Table):
                b = pa.Table.from_pandas(b, preserve_index=False)
            if b.num_rows == 0 or names[0] not in b.column_names:
                continue
            yield tuple(
                b[n].to_numpy(zero_copy_only=False).astype(np.int64)
                if n is not None
                else b[b.column_names[1]].to_numpy(zero_copy_only=False).astype(np.int64)
                for n in names
            )

    @ray.remote(num_returns=2)
    def init_labels(*blocks):
        srcs = [c[0] for c in _cols(blocks, ("src",))]
        ids = (
            np.unique(np.concatenate(srcs)) if srcs else np.empty(0, dtype=np.int64)
        )
        return {"ids": ids, "label": ids.copy()}, int(ids.sum())

    @ray.remote(num_returns=2)
    def merge_labels(lut, *msg_blocks):
        new = lut["label"].copy()
        for nodes, lab in _cols(msg_blocks, ("node", None)):
            pos = np.searchsorted(lut["ids"], nodes)
            np.minimum.at(new, pos, lab)
        return {"ids": lut["ids"], "label": new}, int(new.sum())

    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "cluster_rep": pa.array([], pa.int64())}
            )
        )
    lut_ref, sum_ref = init_labels.remote(*edges.to_arrow_refs())
    prev = ray.get(sum_ref)

    converged = False
    for _ in range(max_iters):
        ref = lut_ref

        def propagate(b: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = lut["label"][np.searchsorted(lut["ids"], src)]
            t = pa.table(
                {"node": b["dst"], "label": pa.array(lab, type=pa.int64())}
            )
            # per-batch combiner: one (node, min label) row per distinct dst
            return (
                t.group_by("node")
                .aggregate([("label", "min")])
                .rename_columns(["node", "label"])
            )

        msgs = edges.map_batches(propagate, batch_format="pyarrow")
        merged = msgs.groupby("node").min("label")
        lut_ref, sum_ref = merge_labels.remote(lut_ref, *merged.to_arrow_refs())
        s = ray.get(sum_ref)
        if s == prev:  # monotone non-increasing -> fixed point
            converged = True
            break
        prev = s
    if not converged:
        raise RuntimeError(
            f"cluster_pairs did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters) — raising instead of "
            "returning silently-wrong labels; raise max_iters"
        )

    @ray.remote
    def emit(lut) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(lut["ids"], type=pa.int64()),
                "cluster_rep": pa.array(lut["label"], type=pa.int64()),
            }
        )

    return ray.data.from_arrow_refs([emit.remote(lut_ref)])


def keep_representatives(
    ds: ray.data.Dataset,
    clusters,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Fuzzy-dedup FILTER: drop every doc that belongs to a near-dup
    cluster and is not its representative.  ``clusters`` is the
    (doc_id, cluster_rep) table/dataset from :func:`cluster_pairs` —
    candidate-proportional, broadcast once (``ray.put``) and applied as
    a vectorized membership test per batch; the corpus streams."""
    if isinstance(clusters, ray.data.Dataset):
        from .collect import collect_table

        clusters = collect_table(clusters)
    drop = clusters.filter(
        pc.not_equal(clusters["doc_id"], clusters["cluster_rep"])
    )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    drop = np.sort(drop)
    ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(d, ids), 0, max(len(d) - 1, 0))
        mask = np.ones(len(ids), dtype=bool) if len(d) == 0 else d[pos] != ids
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def _rfind_top_level(sql: str, keyword: str) -> int:
    """Index of the LAST occurrence of ``keyword`` at parenthesis depth
    0 outside string/identifier literals and ``--`` line comments (-1
    if none) — structural SQL splitting, immune to subqueries that
    contain the same keyword."""
    upper = sql.upper()
    kw = keyword.upper()
    depth = 0
    best = -1
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'" or c == '"':
            q = c
            i += 1
            while i < n and sql[i] != q:
                i += 1
        elif c == "-" and sql.startswith("--", i):
            # line comment: quotes/parens inside it are not structure
            while i < n and sql[i] != "\n":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and upper.startswith(kw, i):
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            j = i + len(kw)
            after_ok = j >= n or not (sql[j].isalnum() or sql[j] == "_")
            if before_ok and after_ok:
                best = i
            i = j - 1
        i += 1
    return best


def sql_cluster_pairs(pairs_sql: str) -> str:
    """Recursive-CTE oracle for :func:`cluster_pairs` over ANY pair
    query of shape ``WITH <ctes> SELECT ... [ORDER BY ...]`` emitting
    (doc_a, doc_b) columns (e.g. :func:`sql_minhash_neardup`): the pair
    query becomes one more CTE, then transitive closure over the
    symmetrized edges; rep = min(reachable ∪ self).

    Splitting is structural (:func:`_rfind_top_level`): the final
    SELECT and a trailing ORDER BY are located at paren depth 0, so a
    pair query whose last SELECT contains a subquery with ORDER BY (or
    is not newline-prefixed) cannot be mis-sliced."""
    body = pairs_sql.strip()
    assert body.upper().startswith("WITH"), "pair query must start with WITH"
    sel = _rfind_top_level(body, "SELECT")
    assert sel > 0, "pair query must end in a top-level SELECT"
    ctes, final = body[:sel], body[sel:]
    ob = _rfind_top_level(final, "ORDER")
    if ob >= 0:
        final = final[:ob]
    ctes = ctes.strip()[len("WITH"):].strip().rstrip(",")
    # the comma / closing paren go on their OWN line: ctes or the final
    # SELECT may end in a '--' line comment that would swallow them
    return f"""
WITH RECURSIVE {ctes}
,
pairs AS ({final}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(n, m) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
)
SELECT n AS doc_id, least(n, min(m))::BIGINT AS cluster_rep
FROM reach GROUP BY n ORDER BY doc_id
"""


def sql_simhash_neardup(
    table: str = "documents",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
) -> str:
    """Exact DuckDB mirror of :func:`simhash_near_duplicates`: same
    md5-lower-64 token hash, per-occurrence +/-1 bit votes (strictly
    positive -> bit set), 4x16-bit band blocking, and bit_count(xor)
    Hamming verify.  Works in the unsigned domain throughout (the
    engine's signed int64 storage is a representation detail)."""
    tok = analyze.sql_token_array(text_col)
    return f"""
WITH toks AS (SELECT doc_id, {tok} AS ts FROM {table}),
occ AS (SELECT doc_id, unnest(ts) AS t FROM toks),
th AS (SELECT DISTINCT t, md5_number_lower(t) AS h FROM occ),
acc AS (
  SELECT o.doc_id, u.i,
         sum(CASE WHEN (th.h >> u.i) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS s
  FROM occ o JOIN th ON th.t = o.t
  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) u
  GROUP BY 1, 2
),
sims0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0
                       THEN CAST(1 AS UBIGINT) << CAST(i AS INTEGER)
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS u
  FROM acc GROUP BY doc_id
),
sims AS (
  SELECT t.doc_id, coalesce(s0.u, CAST(0 AS UBIGINT)) AS u
  FROM toks t LEFT JOIN sims0 s0 ON s0.doc_id = t.doc_id
),
bandrows AS (
  SELECT doc_id, b.bnd, CAST((u >> CAST(16 * b.bnd AS INTEGER)) & 65535 AS BIGINT) AS bh
  FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandrows x JOIN bandrows y
    ON x.bnd = y.bnd AND x.bh = y.bh AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       bit_count(xor(sa.u, sb.u))::BIGINT AS hamming
FROM cand c
JOIN sims sa ON sa.doc_id = c.doc_a
JOIN sims sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.u, sb.u)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# Exact duplicate-substring spans (LLM-pipeline addendum)
#
# The ExactSubstr pass of Lee et al., "Deduplicating Training Data Makes
# Language Models Better" (2022): find every maximal token span whose
# n-token windows ALL occur >= min_count times corpus-wide, and
# optionally strip those spans from the text.  The reference engine has
# no analog (its dedup is the deterministic-ID upsert,
# /root/reference/src/ConveyorBelt.Tooling/NestBatchPusher.cs:70-71);
# this is the standard large-scale pretraining-data operator the
# LLM addendum calls for.
#
# Ray-Data shape (two streaming passes, ONE bounded shuffle):
#   pass A  map_batches: vectorized n-token windows -> md5-lower-64 per
#           unique window (cb.hashing, the DuckDB-exact kernel) ->
#           per-batch partial counts (combiner) -> ONE shuffle keyed by
#           a bounded hash bucket (the `_pair_counts` shape: group
#           count = n_buckets, never window cardinality) -> per-bucket
#           Arrow merge -> qualifying hashes assembled into one sorted
#           uint64 array INSIDE a Ray task (driver holds the ObjectRef).
#   pass B  map_batches actor stage: recompute window hashes, member-
#           ship via searchsorted against the broadcast dup array (the
#           decontaminate shape), merge overlapping duplicated windows
#           into maximal spans — batch-local, because every window of a
#           doc lives in its batch; no second shuffle.
# At 100 TB the dup-window array is |windows with count >= min_count|
# (a small fraction of a natural corpus; ~1.03M u64 = 8 MB at sf0.1
# density x 1000); on a template-heavy corpus it can reach tens of GB.
# ``dup_store="bloom"`` is the scale path behind the SAME membership
# contract and the SAME exact results: the bucket-merge pass writes
# each bucket's qualifying hashes to a sorted file on shared storage
# (cb.storage contract) and folds them into a Bloom filter; pass B
# broadcasts only the filter bits (~bits_per_key/64 of the raw array),
# and every Bloom hit is verified EXACTLY against the bucket files
# (per-actor bounded LRU of loaded buckets) — false positives cost a
# probe, never a wrong span.  The dup_spans_bloom oracle entry proves
# bitwise equality with the array path.
# --------------------------------------------------------------------------

def _window_hash_stream(kept: pa.Array, n: int):
    """(uint64 md5-lower-64 per n-token window, per-doc window start
    offsets, per-doc window counts) — hashing runs over the batch's
    unique-window vocabulary only (dictionary encode), like
    MinHashStage."""
    shingles, sh_starts, counts = _token_windows(kept, n)
    if len(shingles) == 0:
        return np.empty(0, dtype=np.uint64), sh_starts, counts
    from .hashing import md5_lower64

    enc = pc.dictionary_encode(shingles)
    vocab = md5_lower64(enc.dictionary)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return vocab[codes], sh_starts, counts


@ray.remote
def _sorted_u64(*blocks) -> np.ndarray:
    """Concat per-bucket dup-hash blocks into one sorted uint64 array —
    inside a Ray task, so the set lives in the object store end-to-end
    and the driver only holds the ObjectRef."""
    parts = []
    for b in blocks:
        if not isinstance(b, pa.Table):
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            parts.append(
                b["h"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            )
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts).view(np.uint64))


def _dup_window_partial(batch: pa.Table, *, n: int, text_col: str, n_buckets: int) -> pa.Table:
    """Per-batch combiner: unique window hashes + partial counts,
    keyed by a bounded hash bucket."""
    h, _, _ = _window_hash_stream(analyze.token_array(batch[text_col]), n)
    uh, cnt = np.unique(h, return_counts=True)
    return pa.table(
        {
            "h": pa.array(uh.view(np.int64), type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            "bucket": pa.array(
                (uh % np.uint64(n_buckets)).astype(np.int32), type=pa.int32()
            ),
        }
    )


def duplicate_window_hashes(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    n_buckets: int = 64,
):
    """ObjectRef to the sorted uint64 array of n-token-window hashes
    occurring >= ``min_count`` times corpus-wide (all occurrences count,
    including repeats within one doc — Lee et al. semantics)."""

    def merge(group: pa.Table) -> pa.Table:
        t = group.select(["h", "n"]).group_by("h").aggregate([("n", "sum")])
        return t.filter(pc.greater_equal(t["n_sum"], min_count)).select(["h"])

    dup = (
        ds.map_batches(
            partial(_dup_window_partial, n=n, text_col=text_col, n_buckets=n_buckets),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )
    return _sorted_u64.remote(*dup.to_arrow_refs())


class BloomDupSet:
    """Membership oracle for the dup-window set at 100-TB scale: Bloom
    bits broadcast to every pass-B actor (O(filter bits), tunable via
    ``bits_per_key`` — vs 64 bits/key for the raw sorted array) + EXACT
    verification of every Bloom hit against the per-bucket sorted hash
    files pass A wrote to shared storage (:mod:`cb.storage` contract).
    Results are therefore identical to the array path; a false positive
    costs one bucket probe, never a wrong span.

    Per-actor state: an LRU of loaded bucket arrays.  ``max_cached``
    defaults to ``n_buckets`` — dup-window hashes are md5-uniform, so a
    dense batch touches nearly every bucket and a smaller LRU would
    re-read ~the whole dup set from shared storage per batch; caching
    all touched buckets bounds worst-case RAM at the dup set size (the
    array path's constant cost) while sparse corpora only ever load the
    buckets their candidates hash to.  Shrink it only when actor RAM,
    not storage bandwidth, is the binding constraint."""

    def __init__(self, bits: np.ndarray, k: int, work_dir: str, n_buckets: int,
                 max_cached: int | None = None):
        self.bits = bits  # uint8, len = m/8, m a power of two
        self.k = int(k)
        self.mask = np.uint64(len(bits) * 8 - 1)
        self.work_dir = work_dir
        self.n_buckets = int(n_buckets)
        self.max_cached = int(n_buckets if max_cached is None else max_cached)
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_cache"] = None  # never ship a warm cache
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._cache = OrderedDict()

    @staticmethod
    def _positions(h: np.ndarray, i: int, mask: np.uint64) -> np.ndarray:
        # double hashing: pos_i = (h + i * h2) & (m - 1), h2 odd
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        return (h + np.uint64(i) * h2) & mask

    def _probe_bits(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            p = self._positions(h, i, self.mask)
            byte = self.bits[(p >> np.uint64(3)).astype(np.int64)]
            out &= ((byte >> (p & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return out

    def _bucket(self, b: int) -> np.ndarray:
        got = self._cache.get(b)
        if got is not None:
            self._cache.move_to_end(b)
            return got
        f = os.path.join(self.work_dir, f"dupbucket={b}.parquet")
        arr = (
            pq.read_table(f)["h"].to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False).view(np.uint64)
            if os.path.exists(f)
            else np.empty(0, dtype=np.uint64)
        )
        self._cache[b] = arr
        if len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return arr

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Exact membership mask for uint64 hashes ``h``."""
        if len(h) == 0 or len(self.bits) == 0:
            return np.zeros(len(h), dtype=bool)
        h = np.ascontiguousarray(h, dtype=np.uint64)
        cand = self._probe_bits(h)
        if not cand.any():
            return cand
        hc = h[cand]
        uniq = np.unique(hc)
        verified = np.zeros(len(uniq), dtype=bool)
        ub = (uniq % np.uint64(self.n_buckets)).astype(np.int64)
        for b in np.unique(ub):
            arr = self._bucket(int(b))
            sel = ub == b
            if len(arr):
                hs = uniq[sel]
                i = np.minimum(np.searchsorted(arr, hs), len(arr) - 1)
                verified[sel] = arr[i] == hs
        out = np.zeros(len(h), dtype=bool)
        out[np.flatnonzero(cand)] = verified[np.searchsorted(uniq, hc)]
        return out


@ray.remote
def _bloom_from_bucket_files(
    work_dir: str, n_buckets: int, n_keys: int, bits_per_key: int
) -> BloomDupSet:
    """Fold pass A's bucket files into a BloomDupSet (inside a Ray
    task: the driver only ever holds the ObjectRef)."""
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys * bits_per_key)))))
    k = min(16, max(1, int(round(np.log(2) * m / max(1, n_keys)))))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    mask = np.uint64(m - 1)
    for b in range(n_buckets):
        f = os.path.join(work_dir, f"dupbucket={b}.parquet")
        if not os.path.exists(f):
            continue
        h = (
            pq.read_table(f)["h"].to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False).view(np.uint64)
        )
        for i in range(k):
            p = BloomDupSet._positions(h, i, mask)
            np.bitwise_or.at(
                bits,
                (p >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
            )
    return BloomDupSet(bits, k, work_dir, n_buckets)


def duplicate_window_bloom(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    n_buckets: int = 64,
    work_dir: str,
    bits_per_key: int = 12,
):
    """ObjectRef to a :class:`BloomDupSet` over the qualifying window
    hashes.  Same pass-A shuffle as :func:`duplicate_window_hashes`,
    but each bucket's merge task writes its sorted qualifying hashes to
    ``work_dir`` (REQUIRED and caller-owned, shared-storage contract —
    pass-B actors on other nodes verify against these files; the IVF
    ``index_dir`` precedent) instead of returning them, so nothing
    dup-set-sized is ever broadcast."""
    os.makedirs(work_dir, exist_ok=True)

    def merge(group: pa.Table) -> pa.Table:
        b = int(group["bucket"][0].as_py())
        t = group.select(["h", "n"]).group_by("h").aggregate([("n", "sum")])
        t = t.filter(pc.greater_equal(t["n_sum"], min_count))
        h = np.sort(
            t["h"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            .view(np.uint64)
        )
        f = os.path.join(work_dir, f"dupbucket={b}.parquet")
        pq.write_table(
            pa.table({"h": pa.array(h.view(np.int64), type=pa.int64())}),
            f + ".tmp",
        )
        os.replace(f + ".tmp", f)
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int32()),
                "n": pa.array([len(h)], type=pa.int64()),
            }
        )

    rows = (
        ds.map_batches(
            partial(_dup_window_partial, n=n, text_col=text_col, n_buckets=n_buckets),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )
    written = {int(r["bucket"]) for r in rows}
    # stale files from an earlier run into the same dir must not verify
    for b in range(n_buckets):
        if b not in written:
            f = os.path.join(work_dir, f"dupbucket={b}.parquet")
            if os.path.exists(f):
                os.remove(f)
    n_keys = sum(int(r["n"]) for r in rows)
    return _bloom_from_bucket_files.remote(work_dir, n_buckets, n_keys, bits_per_key)


class DupSpanStage:
    """Pass B of the duplicate-substring pipeline: per batch, recompute
    window hashes, test membership against the broadcast sorted dup
    array (searchsorted), and merge overlapping duplicated windows into
    maximal token spans ``[span_start, span_end)``.  With
    ``strip=True`` also rebuilds the cleaned text (analyzed tokens
    outside every span, space-joined) — BOTH copies of a duplicate are
    dropped (deterministic, order-free; production keep-first needs a
    global occurrence order, documented tradeoff).  All vectorized; the
    ``ray.get`` of the dup set happens once per actor in ``__init__``.
    """

    def __init__(self, dup_ref, *, n: int, text_col: str, id_col: str,
                 strip: bool = False):
        self.dup = (
            dup_ref
            if isinstance(dup_ref, (np.ndarray, BloomDupSet))
            else ray.get(dup_ref)
        )
        self.n = n
        self.text_col = text_col
        self.id_col = id_col
        self.strip = strip

    def _member(self, h: np.ndarray) -> np.ndarray:
        """Membership mask — sorted-array searchsorted (broadcast
        path) or Bloom-probe + exact bucket-file verify (scale path);
        both EXACT."""
        if isinstance(self.dup, BloomDupSet):
            return self.dup.contains(h)
        if len(h) and len(self.dup):
            i = np.minimum(np.searchsorted(self.dup, h), len(self.dup) - 1)
            return self.dup[i] == h
        return np.zeros(len(h), dtype=bool)

    def _spans(self, h, sh_starts, counts):
        """(window doc-index, window pos) of dup windows -> merged span
        triples (doc index, start, end) over the batch."""
        mask = self._member(h)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        wpos = np.arange(len(h), dtype=np.int64) - np.repeat(sh_starts[:-1], counts)
        d, p = doc_of[mask], wpos[mask]
        if not len(d):
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        brk = np.empty(len(d), dtype=bool)
        brk[0] = True
        # windows are emitted doc-major, pos-ascending; merge while the
        # next window starts at or before the running end (= prev + n,
        # since end is strictly increasing within a doc)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + self.n)
        s_idx = np.flatnonzero(brk)
        e_idx = np.append(s_idx[1:], len(d)) - 1
        return d[s_idx], p[s_idx], p[e_idx] + self.n

    def __call__(self, batch: pa.Table) -> pa.Table:
        kept = analyze.token_array(batch[self.text_col])
        h, sh_starts, counts = _window_hash_stream(kept, self.n)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        span_doc, span_start, span_end = self._spans(h, sh_starts, counts)
        if not self.strip:
            return pa.table(
                {
                    self.id_col: pa.array(ids[span_doc], type=pa.int64()),
                    "span_start": pa.array(span_start, type=pa.int64()),
                    "span_end": pa.array(span_end, type=pa.int64()),
                }
            )
        offsets = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts0 = offsets[:-1] - offsets[0]
        lens = np.diff(offsets)
        total = int(lens.sum())
        cover = np.zeros(total + 1, dtype=np.int64)
        np.add.at(cover, starts0[span_doc] + span_start, 1)
        np.add.at(cover, starts0[span_doc] + span_end, -1)
        covered = np.cumsum(cover[:-1]) > 0
        doc_tok = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        removed = np.bincount(doc_tok[covered], minlength=len(ids)).astype(np.int64)
        new_offsets = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens - removed, out=new_offsets[1:])
        flat = pc.list_flatten(kept)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat_kept = flat.filter(pa.array(~covered))
        lists = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), flat_kept
        )
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "clean_text": pc.binary_join(lists, " "),
                "n_removed": pa.array(removed, type=pa.int64()),
            }
        )


def duplicate_ngram_spans(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 2,
    n_buckets: int = 64,
    dup_store: str = "array",
    work_dir: str | None = None,
    bits_per_key: int = 12,
) -> ray.data.Dataset:
    """-> (doc_id, span_start, span_end): maximal token spans whose
    every n-token window occurs >= min_count times corpus-wide
    (ExactSubstr detection; see the section comment for the 100-TB
    shape).  Two streaming passes over the corpus, one bounded
    shuffle.  ``dup_store="bloom"`` (requires ``work_dir`` on shared
    storage) broadcasts Bloom bits instead of the raw hash array —
    same exact output, O(filter bits) broadcast."""
    dup_ref = _dup_store_ref(
        ds, dup_store, n=n, min_count=min_count, text_col=text_col,
        n_buckets=n_buckets, work_dir=work_dir, bits_per_key=bits_per_key,
    )
    return ds.map_batches(
        DupSpanStage,
        fn_constructor_kwargs={
            "dup_ref": dup_ref, "n": n, "text_col": text_col,
            "id_col": id_col, "strip": False,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _dup_store_ref(ds, dup_store, *, n, min_count, text_col, n_buckets,
                   work_dir, bits_per_key):
    if dup_store == "array":
        return duplicate_window_hashes(
            ds, n=n, min_count=min_count, text_col=text_col, n_buckets=n_buckets
        )
    if dup_store == "bloom":
        if not work_dir:
            raise ValueError(
                "dup_store='bloom' requires an explicit work_dir on shared "
                "storage (cb.storage contract)"
            )
        return duplicate_window_bloom(
            ds, n=n, min_count=min_count, text_col=text_col,
            n_buckets=n_buckets, work_dir=work_dir, bits_per_key=bits_per_key,
        )
    raise ValueError(f"unknown dup_store {dup_store!r} (array|bloom)")


def strip_duplicate_spans(
    ds: ray.data.Dataset,
    *,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 2,
    n_buckets: int = 64,
    dup_store: str = "array",
    work_dir: str | None = None,
    bits_per_key: int = 12,
) -> ray.data.Dataset:
    """-> (doc_id, clean_text, n_removed): the corpus with every
    duplicated span removed (analyzed tokens outside spans,
    space-joined; one row per input doc).  ``dup_store`` as in
    :func:`duplicate_ngram_spans`."""
    dup_ref = _dup_store_ref(
        ds, dup_store, n=n, min_count=min_count, text_col=text_col,
        n_buckets=n_buckets, work_dir=work_dir, bits_per_key=bits_per_key,
    )
    return ds.map_batches(
        DupSpanStage,
        fn_constructor_kwargs={
            "dup_ref": dup_ref, "n": n, "text_col": text_col,
            "id_col": id_col, "strip": True,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _sql_win_cte(table: str, text_col: str, n: int) -> str:
    """Shared CTE prefix: analyzed tokens + every n-token window with
    its 0-based position (the engine compares md5-lower-64 of these
    strings — identical membership up to a ~2^-64 collision, the same
    accepted caveat as the minhash oracle)."""
    tok = analyze.sql_token_array(text_col)
    sep = f"chr({ord(SHINGLE_SEP)})"
    return f"""
WITH docs AS (SELECT doc_id, {tok} AS toks FROM {table}),
win AS (
  SELECT d.doc_id, i.r - 1 AS pos,
         array_to_string(d.toks[i.r:i.r + {n - 1}], {sep}) AS w
  FROM docs d, (SELECT unnest(range(1, greatest(len(toks) - {n - 2}, 1))) AS r,
                       doc_id
                FROM docs) i
  WHERE i.doc_id = d.doc_id
),
dupwin AS (
  SELECT doc_id, pos FROM win
  WHERE w IN (SELECT w FROM win GROUP BY w HAVING count(*) >= {{min_count}})
),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {n} THEN 0 ELSE 1 END AS b
  FROM dupwin
),
spans AS (
  SELECT doc_id, min(pos)::BIGINT AS span_start,
         (max(pos) + {n})::BIGINT AS span_end
  FROM (SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
        FROM brk)
  GROUP BY doc_id, grp
)"""


def sql_dup_ngram_spans(
    table: str = "documents", text_col: str = "text",
    *, n: int = 8, min_count: int = 2,
) -> str:
    """DuckDB mirror of :func:`duplicate_ngram_spans`: same analyzed
    tokens (``sql_token_array``), same windows, corpus-wide count
    filter, gaps-and-islands span merge."""
    cte = _sql_win_cte(table, text_col, n).format(min_count=min_count)
    return cte + """
SELECT doc_id, span_start, span_end FROM spans
ORDER BY doc_id, span_start
"""


def sql_strip_duplicate_spans(
    table: str = "documents", text_col: str = "text",
    *, n: int = 8, min_count: int = 2,
) -> str:
    """DuckDB mirror of :func:`strip_duplicate_spans`: tokens outside
    every span, space-joined in position order; one row per doc."""
    cte = _sql_win_cte(table, text_col, n).format(min_count=min_count)
    return cte + """,
tokpos AS (
  SELECT doc_id, r - 1 AS i, t
  FROM (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS r
        FROM docs)
),
keep AS (
  SELECT tp.doc_id, tp.i, tp.t
  FROM tokpos tp
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = tp.doc_id
                      AND tp.i >= s.span_start AND tp.i < s.span_end)
),
agg AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS clean_text,
         count(*) AS n_kept
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       (len(d.toks) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM docs d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
