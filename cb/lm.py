"""Corpus-trained bigram LM quality scoring (KenLM-perplexity proxy).

Large-scale pretraining pipelines score every document with a small
language model trained on the corpus (or a reference corpus) and filter
on perplexity — the CCNet / Gopher "quality by LM score" pass.  The
container has no KenLM, so this is the same operator with an exact,
SQL-mirrorable model: an add-one-smoothed bigram LM over a
min-count-pruned vocabulary (OOV tokens collapse to one ``<unk>``
symbol), trained on the corpus itself.

Score per doc = mean over positions i>=1 of
``ln((C(w[i-1] w[i]) + 1) / (C(w[i-1]) + V))`` where C are counts over
the unk-mapped token stream and ``V = |vocab| + 1`` (the model
vocabulary incl. unk).  Higher = more "typical" text; repetitive or
out-of-distribution docs score low.  NULL when the doc has < 2 tokens.

Ray-Data shape (three streaming passes, bounded shuffles only):
  pass 1  unigram counts: per-batch Arrow group_by partials -> ONE
          hash-bucket-keyed shuffle (the `_pair_counts` shape; group
          count = n_buckets, never vocab cardinality) -> vocab = terms
          with count >= min_count.  The mapped-stream unigram counts
          derive from the raw counts (C(unk) = total - sum(vocab)) —
          no extra pass.
  pass 2  bigram counts over the unk-mapped stream (vocab broadcast as
          a sorted array; bigram key = prev*(V+1)+cur packed into one
          int64): same partial-count + bucket-merge shape.
  pass 3  scoring: the model (sorted vocab, mapped unigram counts,
          sorted bigram keys + counts) is assembled INSIDE a Ray task,
          broadcast once, held per actor (__init__), and each batch
          scores vectorized (searchsorted lookups + ln + segment sums).
Scale note: the pruned model is min_count-bounded (~vocab + observed
bigrams over it); real corpora at 100 TB keep it broadcastable by
raising min_count (CCNet trains on a sample for the same reason) —
document the sample if you train on a slice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import analyze

UNK = "\x11"  # reserved: the analyzer never emits control chars


def _flat_tokens(batch: pa.Table, text_col: str):
    """(flat token array, per-doc lens) for one batch."""
    kept = analyze.token_array(batch[text_col])
    offsets = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    flat = pc.list_flatten(kept)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, lens


def _bucket_merge(ds_rows: ray.data.Dataset, key_cols: list[str]) -> ray.data.Dataset:
    """Sum per-batch partial counts: ONE shuffle keyed by a bounded
    bucket (already a column), Arrow group-sum per bucket."""
    def merge(group: pa.Table) -> pa.Table:
        t = group.select(key_cols + ["n"]).group_by(key_cols).aggregate([("n", "sum")])
        return t.rename_columns(key_cols + ["n"])

    return ds_rows.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def unigram_counts(
    ds: ray.data.Dataset, *, text_col: str = "text", n_buckets: int = 64
) -> ray.data.Dataset:
    """(term, n) corpus-wide token counts (partial-combine + one bounded
    shuffle)."""
    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch, text_col)
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int32())}
            )
        t = pa.table({"term": flat}).group_by("term").aggregate([([], "count_all")])
        t = t.rename_columns(["term", "n"])
        # deterministic cross-process bucket key (Python hash() is
        # per-process salted — it would split one term across buckets)
        from .hashing import md5_lower64

        h = md5_lower64(t["term"].combine_chunks()) % np.uint64(n_buckets)
        return t.append_column(
            "bucket", pa.array(h.astype(np.int32), type=pa.int32())
        )

    return _bucket_merge(ds.map_batches(partial, batch_format="pyarrow"), ["term"])


@ray.remote
def _assemble_vocab(min_count: int, *blocks):
    """Sorted vocab array + mapped unigram counts, inside a Ray task.

    Returns dict(vocab=sorted str np.ndarray, uni=int64 counts aligned
    with vocab + [unk] appended, v=len(vocab)+1)."""
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
        for b in blocks
    ]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return {"vocab": np.empty(0, dtype=object), "uni": np.zeros(1, np.int64), "v": 1}
    t = pa.concat_tables(tabs, promote_options="default")
    terms = np.array(t["term"].to_pylist(), dtype=object)
    counts = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(counts.sum())
    keep = counts >= min_count
    terms, counts = terms[keep], counts[keep]
    order = np.argsort(terms)  # lexicographic == DuckDB ORDER BY for our charset
    terms, counts = terms[order], counts[order]
    uni = np.append(counts, total - int(counts.sum()))  # [vocab..., unk]
    return {"vocab": terms, "uni": uni, "v": len(terms) + 1}


def _codes(flat: pa.Array, vocab: np.ndarray) -> np.ndarray:
    """Token array -> model codes (unk = len(vocab)).  The vocab lookup
    runs over the batch's UNIQUE tokens only (dictionary encode), then
    broadcasts by take — no per-token Python."""
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    d = np.array(enc.dictionary.to_pylist(), dtype=object)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(vocab) == 0:
        lut = np.zeros(len(d), dtype=np.int64)
    else:
        idx = np.searchsorted(vocab, d)
        idx_c = np.minimum(idx, len(vocab) - 1)
        lut = np.where(vocab[idx_c] == d, idx_c, len(vocab)).astype(np.int64)
    return lut[codes]


def _bigram_keys(codes: np.ndarray, lens: np.ndarray, v: int):
    """Packed within-doc bigram keys (prev*(v+1)+cur) + per-doc bigram
    counts.  v+1 = number of distinct codes (vocab + unk)."""
    n_big = np.maximum(lens - 1, 0)
    if int(n_big.sum()) == 0:
        return np.empty(0, dtype=np.int64), n_big
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    big_starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(n_big, out=big_starts[1:])
    total = int(big_starts[-1])
    base = np.repeat(starts[:-1], n_big) + (
        np.arange(total, dtype=np.int64) - np.repeat(big_starts[:-1], n_big)
    )
    return codes[base] * np.int64(v + 1) + codes[base + 1], n_big


class _BigramCountStage:
    def __init__(self, model_ref, text_col: str, n_buckets: int):
        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.vocab, self.v = m["vocab"], m["v"]
        self.text_col = text_col
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch, self.text_col)
        keys, _ = _bigram_keys(_codes(flat, self.vocab), lens, self.v)
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "bucket": pa.array(
                    (uk % self.n_buckets).astype(np.int32), type=pa.int32()
                ),
            }
        )


@ray.remote
def _assemble_bigrams(model: dict, *blocks) -> dict:
    """model + sorted bigram (keys, counts) — the full broadcastable LM."""
    tabs = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
        for b in blocks
    ]
    tabs = [t for t in tabs if t.num_rows]
    if tabs:
        t = pa.concat_tables(tabs, promote_options="default")
        keys = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys)
        keys, cnts = keys[order], cnts[order]
    else:
        keys = np.empty(0, dtype=np.int64)
        cnts = np.empty(0, dtype=np.int64)
    return {**model, "bkeys": keys, "bcnts": cnts}


class ScoreStage:
    """Actor-pool scorer: model ray.get once per actor, batches scored
    vectorized (code lookup, bigram searchsorted, ln, per-doc
    position-ordered segment sums)."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.m = m
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        flat, lens = _flat_tokens(batch, self.text_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _codes(flat, m["vocab"])
        keys, n_big = _bigram_keys(codes, lens, m["v"])
        n = len(keys)
        if n:
            if len(m["bkeys"]):
                i = np.minimum(np.searchsorted(m["bkeys"], keys), len(m["bkeys"]) - 1)
                c2 = np.where(m["bkeys"][i] == keys, m["bcnts"][i], 0)
            else:
                c2 = np.zeros(n, dtype=np.int64)
            prev = (keys // np.int64(m["v"] + 1)).astype(np.int64)
            c1 = m["uni"][prev]
            lp = np.log((c2 + 1.0) / (c1 + float(m["v"])))
            big_starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(n_big[:-1], out=big_starts[1:])
            nz = n_big > 0
            sums = np.zeros(len(lens), dtype=np.float64)
            sums[nz] = np.add.reduceat(lp, big_starts[nz])
        else:
            sums = np.zeros(len(lens), dtype=np.float64)
        score = np.full(len(lens), np.nan)
        nz = n_big > 0
        score[nz] = np.round(sums[nz] / n_big[nz], 6)
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "n_bigrams": pa.array(n_big, type=pa.int64()),
                "lm_score": pa.array(
                    [None if not k else float(s) for k, s in zip(nz, score)],
                    type=pa.float64(),
                ),
            }
        )


def train_bigram_model(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 5,
    n_buckets: int = 64,
):
    """ObjectRef to the pruned add-one bigram LM (see module doc)."""
    uni = unigram_counts(ds, text_col=text_col, n_buckets=n_buckets)
    model_ref = _assemble_vocab.remote(min_count, *uni.to_arrow_refs())
    bi = _bucket_merge(
        ds.map_batches(
            _BigramCountStage,
            fn_constructor_kwargs={
                "model_ref": model_ref, "text_col": text_col,
                "n_buckets": n_buckets,
            },
            batch_format="pyarrow",
            concurrency=2,
        ),
        ["key"],
    )
    # model_ref is auto-dereferenced inside the task: the vocab never
    # round-trips through the driver
    return _assemble_bigrams.remote(model_ref, *bi.to_arrow_refs())


def lm_quality_score(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    n_buckets: int = 64,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """-> (doc_id, n_bigrams, lm_score): mean bigram log-probability per
    doc under the corpus-trained pruned LM (NULL when < 2 tokens)."""
    model_ref = train_bigram_model(
        ds, text_col=text_col, min_count=min_count, n_buckets=n_buckets
    )
    return ds.map_batches(
        ScoreStage,
        fn_constructor_kwargs={
            "model_ref": model_ref, "text_col": text_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def sql_lm_quality_score(
    table: str = "documents", text_col: str = "text", *, min_count: int = 5
) -> str:
    """Exact DuckDB mirror: same analyzed tokens, same pruned vocab
    (count >= min_count), same unk mapping, same add-one bigram
    probability, position-ordered sum / count, round 6."""
    tok = analyze.sql_token_array(text_col)
    unk = f"chr({ord(UNK)})"
    return f"""
WITH docs AS (SELECT doc_id, {tok} AS toks FROM {table}),
tokpos AS (
  SELECT doc_id, r - 1 AS i, t
  FROM (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS r
        FROM docs)
),
uni0 AS (SELECT t, count(*)::BIGINT AS c FROM tokpos GROUP BY 1),
vocab AS (SELECT t FROM uni0 WHERE c >= {min_count}),
vv AS (SELECT count(*) + 1 AS v FROM vocab),
m AS (
  SELECT doc_id, i,
         CASE WHEN t IN (SELECT t FROM vocab) THEN t ELSE {unk} END AS w
  FROM tokpos
),
uni AS (SELECT w, count(*)::BIGINT AS c1 FROM m GROUP BY 1),
big AS (
  SELECT a.doc_id, a.i, a.w AS w1, b.w AS w2
  FROM m a JOIN m b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
bc AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM big GROUP BY 1, 2),
scored AS (
  SELECT g.doc_id,
         sum(ln((bc.c2 + 1.0) / (u.c1 + (SELECT v FROM vv)))
             ORDER BY g.i) AS lp,
         count(*)::BIGINT AS n_bigrams
  FROM big g
  JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
  JOIN uni u ON u.w = g.w1
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       round(s.lp / s.n_bigrams, 6) AS lm_score
FROM docs d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
"""
