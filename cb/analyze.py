"""Code-aware analyzer: content -> terms.

The analog of the reference's parser family (``IParser`` implementations,
e.g. /root/reference/src/ConveyorBelt.Tooling/Parsing/IisLogParser.cs:13-235):
a stateless per-record transform that turns raw text into flat, typed
records.  Here the transform is tokenization for the inverted index
(BASELINE.json north_star): identifier splitting (camelCase, snake_case,
acronym and digit boundaries), lowercasing, stopword filtering.

The tokenizer is defined ONCE as a sequence of RE2-compatible regex
rewrites plus a split pattern, and exposed in three exactly-equivalent
forms:

- :func:`tokenize_table` — vectorized Arrow kernels for ``map_batches``
  (``pyarrow.compute`` uses RE2),
- :func:`tokenize` — pure-Python mirror (``re``) used for query strings
  and unit tests,
- :func:`sql_token_array` — a DuckDB SQL expression (DuckDB uses RE2)
  used by the correctness oracle.

All three MUST stay in lockstep; the golden tests in
``tests/test_analyze.py`` assert pairwise equality on edge cases and the
fixture corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Boundary-splitting rewrite rules, applied in order (RE2 syntax, global
# replace, left-to-right non-overlapping — identical semantics in
# pyarrow.compute (RE2), Python `re`, and DuckDB regexp_replace (RE2)).
#   R1 acronym boundary:   HTMLParser   -> HTML Parser
#   R2 camel boundary:     camelCase    -> camel Case   (also x2Parser -> x2 Parser)
#   R3 letter->digit:      Parser2      -> Parser 2
#   R4 digit->letter:      2fa          -> 2 fa
SPLIT_RULES: tuple[tuple[str, str], ...] = (
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
    (r"([a-z0-9])([A-Z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
)

# After the rewrites the text is lowercased and split on runs of anything
# outside [a-z0-9]; snake_case and kebab-case split here for free.
SPLIT_PATTERN = r"[^a-z0-9]+"

# English stopwords only. Code keywords (import/return/def/...) are
# deliberately KEPT: they are the hot, skewed terms the salted merge is
# exercised on (BASELINE.json north_star).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "this", "to", "was", "with",
)

MAX_TOKEN_LEN = 64

_PY_RULES = [(re.compile(p), r.replace("\\1", r"\1")) for p, r in SPLIT_RULES]
_PY_SPLIT = re.compile(SPLIT_PATTERN)
_STOPSET = frozenset(STOPWORDS)


def tokenize(text: str) -> list[str]:
    """Pure-Python tokenizer (mirror of the Arrow and SQL paths)."""
    for pat, rep in _PY_RULES:
        text = pat.sub(rep, text)
    toks = _PY_SPLIT.split(text.lower())
    return [t for t in toks if t and t not in _STOPSET and len(t) <= MAX_TOKEN_LEN]


# Words are maximal [A-Za-z0-9] runs of the ORIGINAL text.  Every
# SPLIT_RULES pattern matches only alphanumerics on both sides, so a
# rewrite can never span a non-alphanumeric character: splitting into
# words FIRST and rewriting each word independently is exactly
# equivalent to rewriting the whole text (the 3-way parity suite in
# tests/test_analyze.py pins this).
_WORD_SPLIT = r"[^A-Za-z0-9]+"


def _subtoken_lists(uniq: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Unique words -> (kept flat subtokens, per-word offsets, counts):
    the SPLIT_RULES rewrites + lower + split + stopword/length filter,
    evaluated once per DISTINCT word."""
    t = uniq
    for pat, rep in SPLIT_RULES:
        t = pc.replace_substring_regex(t, pattern=pat, replacement=rep)
    t = pc.utf8_lower(t)
    lists = pc.split_pattern_regex(t, pattern=SPLIT_PATTERN)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.and_(
        pc.and_(
            pc.greater(pc.utf8_length(flat), 0),
            pc.less_equal(pc.utf8_length(flat), MAX_TOKEN_LEN),
        ),
        pc.invert(pc.is_in(flat, value_set=pa.array(STOPWORDS))),
    )
    flat_kept = flat.filter(keep)
    parents_kept = parents.filter(keep)
    counts = np.bincount(
        parents_kept.to_numpy(zero_copy_only=False), minlength=len(uniq)
    ).astype(np.int64)
    offsets = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat_kept, offsets, counts


def token_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized: string array -> list<string> array of filtered tokens.

    The regex rewrite passes dominate tokenizer CPU, and a code corpus
    is Zipfian: split into words first, dictionary-encode, run the
    rewrite/stopword passes on the batch's UNIQUE words only, then
    re-expand through the code indices (a gather, no regex)."""
    s = texts
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    words = pc.split_pattern_regex(s, pattern=_WORD_SPLIT)
    flat_words = pc.list_flatten(words)
    doc_of_word = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat_words)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_kept, offsets, counts = _subtoken_lists(enc.dictionary)
    # expand: occurrence i contributes the subtoken slice
    # [offsets[code], offsets[code]+counts[code]) of flat_kept, in order
    occ_counts = counts[codes]
    total = int(occ_counts.sum())
    occ_cum = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(occ_counts, out=occ_cum[1:])
    idx = (
        np.repeat(offsets[codes] - occ_cum[:-1], occ_counts)
        + np.arange(total, dtype=np.int64)
    )
    tokens = flat_kept.take(pa.array(idx, type=pa.int64()))
    doc_counts = np.bincount(
        doc_of_word, weights=occ_counts, minlength=len(words)
    ).astype(np.int64)
    doc_offsets = np.zeros(len(words) + 1, dtype=np.int64)
    np.cumsum(doc_counts, out=doc_offsets[1:])
    return pa.ListArray.from_arrays(pa.array(doc_offsets, type=pa.int64()), tokens)


def explode_tokens(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """String array -> (flat_terms, parent_row_indices, doc_len per row).

    ``doc_len`` counts post-filter tokens (the BM25 length norm).
    """
    lists = token_array(texts)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    doc_len = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
    return flat, parents, doc_len


def term_occurrences(
    doc_ids: pa.Array | np.ndarray, texts: pa.Array | pa.ChunkedArray
) -> tuple[pa.Table, pa.Table]:
    """Batch kernel: (doc_id, content) -> ((doc_id, term, pos), (doc_id, doc_len)).

    One row per token OCCURRENCE with its position in the filtered token
    stream (phrase queries need adjacency over these positions).
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if not isinstance(doc_ids, pa.Array):
        doc_ids = pa.array(np.asarray(doc_ids), type=pa.int64())
    flat, parents, doc_len = explode_tokens(texts)
    p = parents.to_numpy(zero_copy_only=False)
    # position within each doc = running index minus the doc's first index
    starts = np.zeros(len(doc_len) + 1, dtype=np.int64)
    np.cumsum(doc_len, out=starts[1:])
    pos = np.arange(len(p), dtype=np.int64) - starts[p]
    occ = pa.table(
        {
            "doc_id": doc_ids.take(parents),
            "term": flat,
            "pos": pa.array(pos.astype(np.int32), type=pa.int32()),
        }
    )
    stats = pa.table(
        {"doc_id": doc_ids, "doc_len": pa.array(doc_len, type=pa.int32())}
    )
    return occ, stats


def term_frequencies(
    doc_ids: pa.Array | np.ndarray, texts: pa.Array | pa.ChunkedArray
) -> tuple[pa.Table, pa.Table]:
    """Batch kernel: (doc_id, content) -> ((doc_id, term, tf), (doc_id, doc_len)).

    Exact per-document term frequencies: a document is one input row, so a
    within-batch group-by is exact (the reference's per-file parse locality,
    cf. SitecoreLogParser multiline state being file-local,
    /root/reference/src/ConveyorBelt.Tooling/Parsing/SitecoreLogParser.cs:24-162).
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if not isinstance(doc_ids, pa.Array):
        doc_ids = pa.array(np.asarray(doc_ids), type=pa.int64())
    flat, parents, doc_len = explode_tokens(texts)
    ids_per_token = doc_ids.take(parents)
    pairs = pa.table({"doc_id": ids_per_token, "term": flat})
    tf = pairs.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    tf = tf.rename_columns(["doc_id", "term", "tf"])
    tf = tf.set_column(2, "tf", tf.column("tf").cast(pa.int32()))
    stats = pa.table(
        {"doc_id": doc_ids, "doc_len": pa.array(doc_len, type=pa.int32())}
    )
    return tf, stats


# ---------------------------------------------------------------------------
# DuckDB mirror (used by __ray_entry__.oracle_sql and tests)
# ---------------------------------------------------------------------------

def sql_token_array(col: str) -> str:
    """DuckDB expression producing the filtered token array for ``col``.

    Exactly mirrors :func:`tokenize`; DuckDB's regexp functions are RE2,
    like pyarrow's.
    """
    expr = col
    for pat, rep in SPLIT_RULES:
        sql_rep = rep.replace("\\1", "\\1").replace("\\2", "\\2")
        expr = f"regexp_replace({expr}, '{pat}', '{sql_rep}', 'g')"
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{SPLIT_PATTERN}'), "
        f"t -> len(t) > 0 AND len(t) <= {MAX_TOKEN_LEN} AND t NOT IN ({stoplist}))"
    )
