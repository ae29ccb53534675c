"""Text analysis operators for training-data pipelines.

Vectorized ``map_batches`` stages over a text column: token counting,
quality scoring (stopword ratio, mean token length), n-gram-marker
language ID, and rolling-hash document fingerprints.  Each has a DuckDB
SQL mirror so the driver's oracle can value-compare results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import analyze

# Raw tokens = post-split non-empty, BEFORE stopword/length filtering
# (quality metrics need the stopword mass that the analyzer drops).


def _raw_token_lists(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    s = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    for pat, rep in analyze.SPLIT_RULES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    s = pc.utf8_lower(s)
    lists = pc.split_pattern_regex(s, pattern=analyze.SPLIT_PATTERN)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.greater(pc.utf8_length(flat), 0)
    flat_kept = flat.filter(keep)
    parents_kept = parents.filter(keep)
    counts = np.bincount(parents_kept.to_numpy(zero_copy_only=False), minlength=len(lists))
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat_kept)


def token_stats(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens_raw, n_tokens, n_chars, stop_ratio, mean_token_len)."""
    texts = batch[text_col]
    raw = _raw_token_lists(texts)
    kept = analyze.token_array(texts)
    n_raw = np.diff(raw.offsets.to_numpy(zero_copy_only=False))
    n_kept = np.diff(kept.offsets.to_numpy(zero_copy_only=False))
    flat_kept = pc.list_flatten(kept)
    lens = pc.utf8_length(flat_kept).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(kept).to_numpy(zero_copy_only=False)
    len_sums = np.bincount(parents, weights=lens, minlength=len(kept)).astype(np.int64)
    # float64 arithmetic mirrored exactly in SQL (integer casts, one division)
    stop_ratio = np.where(n_raw > 0, (n_raw - n_kept) / np.maximum(n_raw, 1), 0.0)
    mean_len = np.where(n_kept > 0, len_sums / np.maximum(n_kept, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_tokens_raw": pa.array(n_raw, type=pa.int64()),
            "n_tokens": pa.array(n_kept, type=pa.int64()),
            "n_chars": pc.utf8_length(texts).cast(pa.int64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
            "mean_token_len": pa.array(mean_len, type=pa.float64()),
        }
    )


def sql_token_stats(table: str = "documents", text_col: str = "text") -> str:
    tok = analyze.sql_token_array(text_col)
    raw = (
        f"list_filter(regexp_split_to_array(lower("
        + _sql_rules(text_col)
        + f"), '{analyze.SPLIT_PATTERN}'), t -> len(t) > 0)"
    )
    return f"""
WITH t AS (
  SELECT doc_id, {raw} AS raw, {tok} AS kept, length({text_col})::BIGINT AS n_chars
  FROM {table}
)
SELECT doc_id,
       len(raw)::BIGINT AS n_tokens_raw,
       len(kept)::BIGINT AS n_tokens,
       n_chars,
       CASE WHEN len(raw) > 0
            THEN (len(raw) - len(kept))::DOUBLE / greatest(len(raw), 1)::DOUBLE
            ELSE 0.0 END AS stop_ratio,
       CASE WHEN len(kept) > 0
            THEN list_sum(list_transform(kept, x -> len(x)))::DOUBLE / greatest(len(kept), 1)::DOUBLE
            ELSE 0.0 END AS mean_token_len
FROM t ORDER BY doc_id
"""


def _sql_rules(col: str) -> str:
    expr = col
    for pat, rep in analyze.SPLIT_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


# --------------------------------------------------------------------------
# Language ID: marker-token voting (n-gram heuristic family)
# --------------------------------------------------------------------------

LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "is", "to")),
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "la", "les", "et", "est")),
    ("es", ("el", "los", "las", "es", "y")),
)


def lang_id(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Deterministic marker voting; ties and zero evidence -> 'und'.
    Tie-break order = LANG_MARKERS declaration order."""
    raw = _raw_token_lists(batch[text_col])
    flat = pc.list_flatten(raw)
    parents = pc.list_parent_indices(raw).to_numpy(zero_copy_only=False)
    n = len(raw)
    counts = np.zeros((len(LANG_MARKERS), n), dtype=np.int64)
    for i, (_, markers) in enumerate(LANG_MARKERS):
        mask = pc.is_in(flat, value_set=pa.array(markers)).to_numpy(zero_copy_only=False)
        counts[i] = np.bincount(parents[mask], minlength=n)
    best = counts.max(axis=0)
    # first language reaching the max (declaration-order tie-break)
    pick = np.argmax(counts == best, axis=0)
    langs = np.array([code for code, _ in LANG_MARKERS], dtype=object)[pick]
    langs = np.where(best > 0, langs, "und")
    return pa.table(
        {
            "doc_id": batch[id_col],
            "lang_pred": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def sql_lang_id(table: str = "documents", text_col: str = "text") -> str:
    raw = (
        f"list_filter(regexp_split_to_array(lower("
        + _sql_rules(text_col)
        + f"), '{analyze.SPLIT_PATTERN}'), t -> len(t) > 0)"
    )
    cols = []
    for code, markers in LANG_MARKERS:
        inlist = ", ".join(f"'{m}'" for m in markers)
        cols.append(f"len(list_filter(raw, t -> t IN ({inlist}))) AS c_{code}")
    greatest = "greatest(" + ", ".join(f"c_{c}" for c, _ in LANG_MARKERS) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for code, _ in LANG_MARKERS:
        case += f"WHEN c_{code} = {greatest} THEN '{code}' "
    case += "END"
    return f"""
WITH t AS (SELECT doc_id, {raw} AS raw FROM {table}),
c AS (SELECT doc_id, {', '.join(cols)} FROM t)
SELECT doc_id, {case} AS lang_pred FROM c ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Document fingerprint: polynomial rolling hash over the kept-token stream
# --------------------------------------------------------------------------

# Mersenne prime modulus + small base: h = (h*B + md5_64(tok)) % M over
# the token sequence.  Token hash = lower-64 md5 word (the exact value
# DuckDB's md5_number_lower returns), so the whole fingerprint has an
# exact SQL mirror (sql_fingerprint) and the driver value-hash-checks
# it; M < 2^31 keeps every intermediate product within uint64/BIGINT on
# both engines.
_FP_MOD = (1 << 31) - 1
_FP_BASE = 1_000_003


_FP_POWS = np.ones(1, dtype=np.uint64)


def _fp_pows(n: int) -> np.ndarray:
    """B^j % M for j < n (grown once per process, reused across batches)."""
    global _FP_POWS
    if len(_FP_POWS) < n:
        old = len(_FP_POWS)
        grown = np.empty(n, dtype=np.uint64)
        grown[:old] = _FP_POWS
        M, B = np.uint64(_FP_MOD), np.uint64(_FP_BASE)
        for j in range(old, n):
            grown[j] = (grown[j - 1] * B) % M
        _FP_POWS = grown
    return _FP_POWS


def _token_hashes(vocab: list[str]) -> np.ndarray:
    """md5-lower-64 per unique token (vocab-bounded Python loop; the
    per-occurrence work below is fully vectorized)."""
    import hashlib
    import struct

    out = np.empty(len(vocab), dtype=np.uint64)
    for i, t in enumerate(vocab):
        out[i] = struct.unpack("<Q", hashlib.md5(t.encode()).digest()[8:16])[0]
    return out % np.uint64(_FP_MOD)


def fingerprint(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Polynomial hash of the filtered token sequence (order-sensitive,
    whitespace/formatting-insensitive).  Vectorized: unique-token md5s
    once per batch vocabulary, then one modular polynomial evaluation
    over the flat token stream (fp = sum h_i * B^(L-1-i) mod M — the
    closed form of the rolling recurrence)."""
    kept = analyze.token_array(batch[text_col])
    offsets = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    out = np.zeros(n, dtype=np.uint64)
    total = int(offsets[-1] - offsets[0])
    if total:
        flat = pc.list_flatten(kept)
        enc = pc.dictionary_encode(flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        h = _token_hashes(enc.dictionary.to_pylist())[codes]  # < M
        M = np.uint64(_FP_MOD)
        pows = _fp_pows(int(lens.max()))
        starts0 = offsets[:-1] - offsets[0]
        within = np.arange(total, dtype=np.int64) - np.repeat(starts0, lens)
        exp = np.repeat(lens, lens) - 1 - within
        prod = (h * pows[exp]) % M  # < M < 2^31; doc sums fit uint64
        nonempty = lens > 0
        sums = np.add.reduceat(prod, starts0[nonempty])
        out[nonempty] = sums % M
    return pa.table(
        {
            "doc_id": batch[id_col],
            "fingerprint": pa.array(out.astype(np.int64), type=pa.int64()),
        }
    )


def sql_fingerprint(table: str = "documents", text_col: str = "text") -> str:
    """Exact SQL mirror of :func:`fingerprint`: same md5-lower-64 token
    hash (md5_number_lower), same rolling recurrence via list_reduce
    with a prepended 0 accumulator."""
    tok = analyze.sql_token_array(text_col)
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS UBIGINT),
           list_transform({tok}, t -> md5_number_lower(t) % {_FP_MOD})),
         (a, b) -> (a * {_FP_BASE} + b) % {_FP_MOD}
       )::BIGINT AS fingerprint
FROM {table} ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Repetition quality stats (Gopher-style filters)
# --------------------------------------------------------------------------

def repetition_stats(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc repetition signals used by web-corpus quality filters
    (duplicate-line fraction; most-frequent-word-bigram fraction).
    Fully columnar: lines via one split kernel, per-doc distinct counts
    and bigram max-counts via Arrow group_by — no per-doc Python."""
    n = batch.num_rows
    texts = batch[text_col].combine_chunks()

    # duplicate-line fraction: 1 - distinct_lines / lines
    lines = pc.split_pattern(texts, pattern="\n")
    loff = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    llens = np.diff(loff)
    ldi = np.repeat(np.arange(n, dtype=np.int64), llens)
    lt = pa.table({"di": ldi, "v": pc.list_flatten(lines)})
    pairs = lt.group_by(["di", "v"]).aggregate([("v", "count")])
    dcounts = pairs.group_by("di").aggregate([("v_count", "count")])
    uniq = np.zeros(n, dtype=np.int64)
    uniq[dcounts["di"].to_numpy(zero_copy_only=False)] = dcounts[
        "v_count_count"
    ].to_numpy(zero_copy_only=False)
    dup_line = np.where(llens > 0, 1.0 - uniq / np.maximum(llens, 1), 0.0)

    # top-bigram fraction: max bigram count / total bigrams (engine
    # tokenizer, so the SQL mirror shares the token stream)
    toks = analyze.token_array(texts)
    toff = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    tlens = np.diff(toff)
    flat = pc.list_flatten(toks)
    starts0 = toff[:-1] - toff[0]
    total = int(toff[-1] - toff[0])
    top_bg = np.zeros(n, dtype=np.float64)
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(starts0, tlens)
        keep = within < np.repeat(tlens, tlens) - 1  # not last token of doc
        idx = np.flatnonzero(keep)
        if len(idx):
            left = flat.take(pa.array(idx))
            right = flat.take(pa.array(idx + 1))
            bg = pc.binary_join_element_wise(left, right, " ")
            bdi = np.repeat(np.arange(n, dtype=np.int64), np.maximum(tlens - 1, 0))
            bt = pa.table({"di": bdi, "g": bg})
            bc = bt.group_by(["di", "g"]).aggregate([("g", "count")])
            bmax = bc.group_by("di").aggregate([("g_count", "max")])
            mx = np.zeros(n, dtype=np.float64)
            mx[bmax["di"].to_numpy(zero_copy_only=False)] = bmax[
                "g_count_max"
            ].to_numpy(zero_copy_only=False)
            nbg = np.maximum(tlens - 1, 0).astype(np.float64)
            top_bg = np.where(nbg > 0, mx / np.maximum(nbg, 1.0), 0.0)

    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_lines": pa.array(llens, type=pa.int64()),
            "dup_line_frac": pa.array(np.round(dup_line, 6), type=pa.float64()),
            "top_bigram_frac": pa.array(np.round(top_bg, 6), type=pa.float64()),
        }
    )


def sql_repetition_stats(table: str = "documents", text_col: str = "text") -> str:
    """Exact mirror: same line split, same tokenizer, same double
    divisions, round(6) both sides."""
    tok = analyze.sql_token_array(text_col)
    return f"""
WITH docs AS (SELECT doc_id, {text_col} AS text, {tok} AS toks FROM {table}),
lines AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
lstats AS (SELECT doc_id, len(ls)::BIGINT AS n_lines,
                  len(list_distinct(ls))::BIGINT AS n_uniq FROM lines),
t AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i FROM docs),
bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
       FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
bgc AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2),
bstats AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bgc GROUP BY 1)
SELECT d.doc_id,
       l.n_lines,
       round(CASE WHEN l.n_lines > 0
             THEN 1.0 - l.n_uniq::DOUBLE / l.n_lines::DOUBLE
             ELSE 0.0 END, 6) AS dup_line_frac,
       round(coalesce(b.mx::DOUBLE / b.tot::DOUBLE, 0.0), 6) AS top_bigram_frac
FROM docs d
JOIN lstats l USING (doc_id)
LEFT JOIN bstats b USING (doc_id)
ORDER BY d.doc_id
"""
