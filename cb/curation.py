"""Training-data curation operators: quality filtering, stratified
sampling, benchmark decontamination, PII redaction.

The operations an LLM-corpus pipeline runs between raw ingest and
training, expressed Ray-Data-first (vectorized ``map_batches``, one
broadcast for small side inputs, no shuffles) with DuckDB SQL mirrors
so every one is value-checked by the driver's oracle gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from . import analyze, textstats

# --------------------------------------------------------------------------
# Quality filter: threshold rules over the token_stats metrics
# --------------------------------------------------------------------------

QUALITY_RULES = (
    # (name, metric, op, threshold) — first failing rule is the reason
    ("too_short", "n_tokens", "lt", 5),
    ("too_long", "n_tokens", "gt", 100000),
    ("high_stop_ratio", "stop_ratio", "gt", 0.6),
    ("short_tokens", "mean_token_len", "lt", 2.0),
)


def _first_failing_rule(stats: pa.Table) -> np.ndarray:
    """Per-row first-failing QUALITY_RULES name ('' = keep)."""
    reason = np.full(stats.num_rows, "", dtype=object)
    for name, metric, op, thr in QUALITY_RULES:
        col = stats[metric].to_numpy(zero_copy_only=False)
        bad = col < thr if op == "lt" else col > thr
        fresh = bad & (reason == "")
        reason[fresh] = name
    return reason


def quality_filter(ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, keep, reason): rule-based quality gate over the
    vectorized token metrics; ``reason`` is the FIRST failing rule."""

    def f(batch: pa.Table) -> pa.Table:
        stats = textstats.token_stats(batch, text_col=text_col, id_col=id_col)
        reason = _first_failing_rule(stats)
        return pa.table(
            {
                "doc_id": stats["doc_id"],
                "keep": pa.array(reason == "", type=pa.bool_()),
                "reason": pa.array(reason.tolist(), type=pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def apply_quality_gate(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """The quality verdict applied IN the stream: per-batch metric mask,
    rows kept with ALL their columns — no corpus-sized join, the gate
    composes directly into a larger curation dataflow."""

    def f(batch: pa.Table) -> pa.Table:
        stats = textstats.token_stats(batch, text_col=text_col, id_col=id_col)
        reason = _first_failing_rule(stats)
        return batch.filter(pa.array(reason == ""))

    return ds.map_batches(f, batch_format="pyarrow")


def sql_quality_filter(table: str = "documents", text_col: str = "text") -> str:
    stats_sql = textstats.sql_token_stats(table, text_col).strip().rstrip(";")
    cases = " ".join(
        f"WHEN {metric} {'<' if op == 'lt' else '>'} {thr} THEN '{name}'"
        for name, metric, op, thr in QUALITY_RULES
    )
    return f"""
WITH s AS ({stats_sql})
SELECT doc_id,
       (CASE {cases} ELSE '' END) = '' AS keep,
       CASE {cases} ELSE '' END AS reason
FROM s ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Stratified sampling: deterministic per-group rates (no RNG, no shuffle)
# --------------------------------------------------------------------------

def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict[str, int],
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> ray.data.Dataset:
    """Keep each row iff ``doc_id % 100 < rates[group]`` — a
    deterministic, resume-stable hash sample with per-group percentages
    (the down/up-weighting step of corpus mixing).  Embarrassingly
    parallel; the id is already uniform (content-derived)."""
    ref = ray.put(dict(rates))

    def f(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        groups = batch[group_col].to_pylist()
        lim = np.array([r.get(g, default_rate) for g in groups], dtype=np.int64)
        return batch.filter(pa.array((ids % 100) < lim))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_stratified_sample(
    rates: dict[str, int], table: str = "documents", group_col: str = "lang"
) -> str:
    cases = " ".join(f"WHEN '{g}' THEN {p}" for g, p in sorted(rates.items()))
    return f"""
SELECT doc_id, {group_col}
FROM {table}
WHERE doc_id % 100 < (CASE {group_col} {cases} ELSE 0 END)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Decontamination: n-gram overlap against a benchmark set
# --------------------------------------------------------------------------

class DecontaminateStage:
    """Actor-pool stage: the benchmark shingle set (large at real scale,
    ~10^6 entries) is fetched and deserialized ONCE per actor in
    ``__init__`` — a plain-function stage would re-unpickle it on every
    batch."""

    def __init__(self, bench_ref, n: int, text_col: str, id_col: str):
        self.bench = ray.get(bench_ref)
        self._bench_arr = pa.array(sorted(self.bench), type=pa.string())
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _batch_shingles

        shingles, sh_starts, counts = _batch_shingles(
            batch, self.text_col, self.n
        )
        n_docs = batch.num_rows
        hits = np.zeros(n_docs, dtype=np.int64)
        if len(shingles):
            # DISTINCT shingles per doc (shingle_set semantics): Arrow
            # membership against the broadcast benchmark set, then a
            # per-doc distinct-hit count — no per-row Python
            member = pc.is_in(shingles, value_set=self._bench_arr).to_numpy(
                zero_copy_only=False
            )
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            hit_idx = np.flatnonzero(member)
            if len(hit_idx):
                # count DISTINCT matched shingles per doc (duplicates of
                # one shingle inside a doc count once)
                enc = pc.dictionary_encode(shingles.take(pa.array(hit_idx)))
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                d = doc_of[hit_idx]
                uniq = np.unique(d * (int(codes.max()) + 1) + codes)
                np.add.at(hits, (uniq // (int(codes.max()) + 1)), 1)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "contaminated": pa.array(hits > 0, type=pa.bool_()),
                "n_hits": pa.array(hits, type=pa.int64()),
            }
        )


def decontaminate(
    ds: ray.data.Dataset,
    benchmark_texts: list[str],
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """-> (doc_id, contaminated, n_hits): flag docs sharing any token
    n-gram with the benchmark set (test-set leakage removal).  The
    benchmark shingle set is broadcast once and held per actor; each
    batch intersects locally — no shuffle.  At 100 TB this is the
    standard decontamination pass: benchmark shingles ~10^6 entries,
    corpus streamed once."""
    from .dedup import shingle_set

    bench = set()
    for t in benchmark_texts:
        bench.update(shingle_set(analyze.tokenize(t), n))
    return ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={
            "bench_ref": ray.put(bench), "n": n,
            "text_col": text_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def sql_decontaminate(
    benchmark_texts: list[str] | None = None,
    n: int = 8,
    table: str = "documents",
    text_col: str = "text",
    bench_sql: str | None = None,
) -> str:
    """Mirror of :func:`decontaminate`.  The benchmark set comes from
    ``benchmark_texts`` (inlined VALUES) or ``bench_sql`` (a SELECT
    yielding one column ``bt`` — lets the driver's static oracle derive
    the set from the same tables the engine reads)."""
    from .analyze import sql_token_array
    from .dedup import SHINGLE_SEP

    tok = sql_token_array(text_col)
    sep = f"chr({ord(SHINGLE_SEP)})"  # derived, so Python and SQL can't drift
    shingle = f" || {sep} || ".join(
        f"d.toks[i.r+{j}]" if j else "d.toks[i.r]" for j in range(n)
    )
    if bench_sql is None:
        bench_sql = "VALUES " + ", ".join(
            "('" + t.replace("'", "''") + "')" for t in benchmark_texts
        )
    btok = sql_token_array("bt")
    bshingle = f" || {sep} || ".join(
        f"b.toks[i.r+{j}]" if j else f"b.toks[i.r]" for j in range(n)
    )
    return f"""
WITH docs AS (SELECT doc_id, {tok} AS toks FROM {table}),
bench(bt) AS ({bench_sql}),
btoks AS (SELECT {btok} AS toks FROM bench),
bsh AS (
  SELECT DISTINCT {bshingle} AS shingle
  FROM btoks b, (SELECT unnest(range(1, greatest(len(toks) - {n - 2}, 1))) AS r, toks
                 FROM btoks) i
  WHERE i.toks = b.toks
),
dsh AS (
  SELECT DISTINCT d.doc_id, {shingle} AS shingle
  FROM docs d, (SELECT unnest(range(1, greatest(len(toks) - {n - 2}, 1))) AS r, doc_id
                FROM docs) i
  WHERE i.doc_id = d.doc_id
),
hits AS (
  SELECT d.doc_id, count(*)::BIGINT AS n_hits
  FROM dsh d JOIN bsh USING (shingle) GROUP BY 1
)
SELECT docs.doc_id,
       coalesce(hits.n_hits, 0) > 0 AS contaminated,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits
FROM docs LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE-ish token counting (subword-regex proxy for tokenizer budgeting)
# --------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape, restricted to RE2 syntax (no
# backtracking, no \p shortcuts DuckDB lacks): contractions, letter
# runs, digit runs, non-space symbol runs, trailing spaces.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_stats(ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, n_bpe_tokens): subword-regex token counts — the
    budgeting number a tokenizer-aware pipeline schedules by (exact BPE
    merges need the tokenizer model; the pre-tokenizer split is the
    standard proxy and is exactly SQL-mirrorable)."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], pattern=BPE_PATTERN)
        return pa.table({"doc_id": batch[id_col], "n_bpe_tokens": n.cast(pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_bpe_token_stats(table: str = "documents", text_col: str = "text") -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id, len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_bpe_tokens
FROM {table} ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Sequence packing: greedy document packing into token-budget windows
# --------------------------------------------------------------------------

def auto_pack_groups(
    n_docs: int, *, docs_per_group: int = 1 << 16, min_groups: int = 64
) -> int:
    """Corpus-derived pack-group count (the ``auto_range_bits`` analog,
    cb/build.py): each group is a whole-group pandas task of skinny
    (group, id, n_tokens) rows, so the count must GROW with the corpus
    — a fixed 64 means ~2.5 GB per task at 10^10 docs.  ~64k docs/group
    keeps per-task memory in the tens of MB at any scale; the floor
    keeps small corpora on the historical 64-group layout."""
    return max(min_groups, -(-int(n_docs) // docs_per_group))


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_groups: int | str = "auto",
) -> ray.data.Dataset:
    """-> (pack_group, pack_id, doc_id, n_tokens): deterministic greedy
    first-fit packing of documents into token-budget windows — the
    sample-packing step before training.  Docs are grouped by
    ``doc_id % n_groups`` (PACK GROUPS — each group packs
    independently, so the operator is one groupby + a per-group
    vectorized pass and pack ids are stable under resume/repartition);
    within a group docs pack in ascending doc_id order.  Oversized docs
    get a singleton pack (truncation is the trainer's call, flagged by
    n_tokens > budget).

    ``n_groups="auto"`` derives the count from the corpus size
    (:func:`auto_pack_groups`; costs one ``count()`` of the input) so
    per-group task memory stays bounded at any scale; note the output
    pack_group/pack_id values CHANGE when the group count does — pin an
    explicit ``n_groups`` when mirroring a fixed oracle."""
    import pandas as pd

    from . import analyze as analyze_mod

    if n_groups == "auto":
        n_groups = auto_pack_groups(ds.count())
    n_groups = int(n_groups)

    def count_tokens(batch: pa.Table) -> pa.Table:
        lists = analyze_mod.token_array(batch[text_col])
        n = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pack_group": pa.array(ids % n_groups, type=pa.int64()),
                id_col: batch[id_col],
                "n_tokens": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        toks = g["n_tokens"].to_numpy()
        pack = np.empty(len(g), dtype=np.int64)
        cur, used = 0, 0
        for i, t in enumerate(toks):
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            pack[i] = cur
            used += t
        out = g.copy()
        out["pack_id"] = pack
        return out[["pack_group", "pack_id", id_col, "n_tokens"]]

    counted = ds.map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True)
    return counted.groupby("pack_group").map_groups(pack_group, batch_format="pandas")


def sql_pack_sequences(
    budget: int = 2048,
    table: str = "documents",
    text_col: str = "text",
    n_groups: int = 64,
) -> str:
    """Exact SQL mirror of :func:`pack_sequences`: the greedy running-
    budget recurrence is a recursive CTE stepping one row-number at a
    time per pack group (recursion depth = largest group, all groups
    advance per iteration)."""
    tok = analyze.sql_token_array(text_col)
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id % {n_groups} AS pack_group, doc_id,
         len({tok})::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {n_groups} ORDER BY doc_id) AS rn
  FROM {table}
),
r AS (
  SELECT pack_group, doc_id, n_tokens, rn,
         0::BIGINT AS pack_id, n_tokens AS used
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.pack_group, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN r.used > 0 AND r.used + t.n_tokens > {budget}
              THEN r.pack_id + 1 ELSE r.pack_id END,
         CASE WHEN r.used > 0 AND r.used + t.n_tokens > {budget}
              THEN t.n_tokens ELSE r.used + t.n_tokens END
  FROM t JOIN r ON t.pack_group = r.pack_group AND t.rn = r.rn + 1
)
SELECT pack_group, pack_id, doc_id, n_tokens
FROM r ORDER BY pack_group, doc_id
"""


# --------------------------------------------------------------------------
# PII redaction: vectorized regex scrub (RE2 on both engine and oracle)
# --------------------------------------------------------------------------

PII_PATTERNS = (
    # (pattern, replacement) — applied in order; RE2 syntax, identical
    # semantics in pyarrow (RE2) and DuckDB (RE2)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,}\b", "<NUM>"),
)


def pii_redact(ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """-> (doc_id, text_redacted): email/IP/long-number scrub with
    Arrow's RE2 kernels (the P10 secret-redaction parity generalized
    to corpus text)."""

    def f(batch: pa.Table) -> pa.Table:
        s = batch[text_col]
        for pat, rep in PII_PATTERNS:
            s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
        return pa.table({"doc_id": batch[id_col], "text_redacted": s})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_pii_redact(table: str = "documents", text_col: str = "text") -> str:
    expr = text_col
    for pat, rep in PII_PATTERNS:
        # DuckDB standard string literals keep backslashes verbatim —
        # only quotes need escaping
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS text_redacted FROM {table} ORDER BY doc_id"


# --------------------------------------------------------------------------
# Deterministic train/val/test split (salted content hash)
# --------------------------------------------------------------------------

def dataset_split(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    salt: str = "cb",
    cuts: tuple[int, int] = (80, 90),
) -> ray.data.Dataset:
    """Assign every doc to train/val/test by ``md5(salt + id) % 100``
    (salted so re-splitting with a new salt is independent of the old
    one, unlike raw ``id % 100``).  Deterministic, resume-stable, and
    embarrassingly parallel — membership never depends on which shard
    or batch a doc arrived in, so a re-run or a grown corpus keeps every
    existing doc's split.  Hashing is the shared batched kernel
    (:mod:`cb.hashing`), no shuffle anywhere."""
    from . import hashing

    lo, hi = cuts

    def f(batch: pa.Table) -> pa.Table:
        h = hashing.salted_id_hash(salt, batch[id_col], mod=100)
        split = np.where(h < lo, "train", np.where(h < hi, "val", "test"))
        return pa.table(
            {id_col: batch[id_col], "split": pa.array(split.tolist(), type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_dataset_split(
    table: str = "documents",
    id_col: str = "doc_id",
    salt: str = "cb",
    cuts: tuple[int, int] = (80, 90),
) -> str:
    """Exact mirror: DuckDB's ``md5_number_lower`` is the same
    little-endian lower-8-bytes of the md5 digest."""
    h = f"md5_number_lower(concat('{salt}', {id_col}::VARCHAR)) % 100"
    return f"""
SELECT {id_col},
       CASE WHEN {h} < {cuts[0]} THEN 'train'
            WHEN {h} < {cuts[1]} THEN 'val'
            ELSE 'test' END AS split
FROM {table} ORDER BY {id_col}
"""


# --------------------------------------------------------------------------
# Token-budget mixture sampling (data mixing)
# --------------------------------------------------------------------------

def token_budget_sample(
    ds: ray.data.Dataset,
    budgets: dict[str, int],
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
    n_ranges: int = 4096,
) -> ray.data.Dataset:
    """Downsample each source to a TOKEN budget (the mixture-weighting
    step of a pretraining data pipeline): docs are taken in salted-hash
    order (deterministic, layout-independent) while the source's
    cumulative token count stays within its budget; sources without a
    budget are dropped.

    TWO-PHASE, no per-source group ever holds a source's rows (a real
    pretraining mix has 3-10 sources, so "group = source" means "group
    ≈ corpus/5"):

    1. one tokenize pass -> skinny (id, source, n_tokens, h) projection
       (batched md5 kernel, :mod:`cb.hashing`), materialized so the two
       consumers below don't re-tokenize the corpus;
    2. per-batch (source, h-range) token-sum partials -> a tiny native
       groupby — per source, the driver locates the BOUNDARY range r*
       where the cumulative budget lands (sources x n_ranges rows
       total);
    3. a stateless filter keeps ranges < r* outright and drops ranges
       > r*; only rows INSIDE r* (≈ 1/n_ranges of the source) form a
       per-source group that sorts by (h, id) and applies the carry-in
       cumsum cutoff.

    The kept set is bitwise the global salted-hash-order prefix (the
    window-sum SQL oracle) because cum-token order is monotone in
    (h, id): full ranges are prefix-interior, the boundary group
    resolves the exact row, later ranges are past the cutoff."""
    from . import analyze, hashing

    def annotate(batch: pa.Table) -> pa.Table:
        toks = analyze.token_array(batch[text_col])
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        h = hashing.salted_id_hash(salt, batch[id_col], mod=hashing.HASH_DOMAIN)
        return pa.table(
            {
                id_col: batch[id_col],
                source_col: batch[source_col],
                "n_tokens": pa.array(np.diff(off), type=pa.int64()),
                "h": pa.array(h.astype(np.int64), type=pa.int64()),
            }
        )

    ann = ds.map_batches(
        annotate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def range_of(h: np.ndarray) -> np.ndarray:
        return hashing.hash_range(h, n_ranges)

    def batch_hist(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                source_col: batch[source_col],
                "r": pa.array(range_of(h), type=pa.int64()),
                "n_tokens": batch["n_tokens"],
            }
        )
        return (
            t.group_by([source_col, "r"])
            .aggregate([("n_tokens", "sum")])
            .rename_columns([source_col, "r", "tok"])
        )

    hist = (
        ann.map_batches(batch_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([source_col, "r"])
        .sum("tok")
        .take_all()
    )  # sources x n_ranges rows — driver-tiny
    per_src: dict[str, list[tuple[int, int]]] = {}
    for row in hist:
        per_src.setdefault(row[source_col], []).append(
            (int(row["r"]), int(row["sum(tok)"]))
        )
    cutoffs: dict[str, tuple[int, int]] = {}  # source -> (r*, carry_in)
    for s, budget in budgets.items():
        ranges = sorted(per_src.get(s, []))
        cum = 0
        r_star, carry = n_ranges, 0  # default: whole source fits
        for r, tok in ranges:
            if cum + tok > budget:
                r_star, carry = r, budget - cum
                break
            cum += tok
        cutoffs[s] = (r_star, carry)
    cut_ref = ray.put(cutoffs)

    def _rstar_per_row(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(r, r*) per row — the source lookup runs over the batch's
        source DICTIONARY (a handful of values), not its rows."""
        cuts = ray.get(cut_ref)
        d = pc.dictionary_encode(batch[source_col])
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        lut = np.array(
            [cuts.get(s, (-1, 0))[0] for s in d.dictionary.to_pylist()],
            dtype=np.int64,
        )
        rstar = lut[d.indices.to_numpy(zero_copy_only=False)]
        r = range_of(batch["h"].to_numpy(zero_copy_only=False).astype(np.int64))
        return r, rstar

    def keep_full(batch: pa.Table) -> pa.Table:
        r, rstar = _rstar_per_row(batch)
        return batch.filter(pa.array(r < rstar)).drop_columns(["h"])

    def boundary_rows(batch: pa.Table) -> pa.Table:
        r, rstar = _rstar_per_row(batch)
        return batch.filter(pa.array(r == rstar))

    def resolve_boundary(group: pd.DataFrame) -> pd.DataFrame:
        cuts = ray.get(cut_ref)
        carry = cuts[group[source_col].iloc[0]][1]
        g = group.sort_values(["h", id_col], kind="mergesort")
        keep = g["n_tokens"].cumsum() <= carry
        return g[keep.values].drop(columns=["h"])

    full = ann.map_batches(keep_full, batch_format="pyarrow", zero_copy_batch=True)
    boundary = (
        ann.map_batches(boundary_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(source_col)
        .map_groups(resolve_boundary, batch_format="pandas")
    )
    return full.union(boundary)


def alpha_mix_sample(
    ds: ray.data.Dataset,
    *,
    alpha: float = 0.5,
    total_budget: int = 100_000,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
    n_ranges: int = 4096,
) -> ray.data.Dataset:
    """Temperature (alpha) mixing — the standard multilingual/domain
    rebalancing knob (multilingual BERT / XLM-R sampling, Gopher/Pile
    mixture weights): source s gets token budget
    ``floor(total_budget * C_s^alpha / sum_t C_t^alpha)`` where C_s is
    the source's corpus token count — alpha=1 keeps natural
    proportions, alpha=0 gives uniform, in between upsamples the tail.
    Budgets then feed :func:`token_budget_sample` (salted-hash order,
    two-phase, skew-proof).

    The per-source count aggregation is a per-batch Arrow partial
    folded at the driver (n_sources x n_blocks tiny rows — a real mix
    has 3-10 sources, so this never shuffles the corpus); the alpha
    share sum runs in SOURCE-NAME order so the float total is
    deterministic and the SQL mirror (``sum(... ORDER BY source)``)
    is bitwise."""
    from . import analyze

    def partial(batch: pa.Table) -> pa.Table:
        kept = analyze.token_array(batch[text_col])
        offs = kept.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": batch[source_col],
                "n": pa.array(np.diff(offs), type=pa.int64()),
            }
        )
        return t.group_by("source").aggregate([("n", "sum")]).rename_columns(
            ["source", "n"]
        )

    tiny = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = tiny.groupby("source")["n"].sum().sort_index()
    shares = np.power(counts.to_numpy(dtype=np.float64), float(alpha))
    denom = 0.0  # strict left-to-right in source-name order: bitwise
    for sh in shares:  # the DuckDB sum(... ORDER BY source) fold
        denom += float(sh)
    budgets = {
        s: int(np.floor(total_budget * sh / denom))
        for s, sh in zip(counts.index, shares)
    }
    return token_budget_sample(
        ds, budgets, id_col=id_col, source_col=source_col,
        text_col=text_col, salt=salt, n_ranges=n_ranges,
    )


def sql_alpha_mix_sample(
    *,
    alpha: float = 0.5,
    total_budget: int = 100_000,
    table: str = "documents",
    salt: str = "mix",
) -> str:
    """Mirror of :func:`alpha_mix_sample`: budgets computed in SQL from
    the same token counts (``pow`` + ORDER BY source sum, floor), same
    window-sum prefix as sql_token_budget_sample."""
    from . import analyze

    tok = analyze.sql_token_array("text")
    return f"""
WITH d AS (
  SELECT doc_id, source, len({tok})::BIGINT AS n_tokens,
         (md5_number_lower(concat('{salt}', doc_id::VARCHAR)) % 1000000)::BIGINT AS h
  FROM {table}
),
cnt AS (SELECT source, sum(n_tokens)::BIGINT AS c FROM d GROUP BY 1),
tot AS (SELECT sum(pow(c::DOUBLE, {alpha!r}) ORDER BY source) AS s FROM cnt),
b AS (
  SELECT source,
         floor({total_budget} * pow(c::DOUBLE, {alpha!r}) / (SELECT s FROM tot))::BIGINT AS budget
  FROM cnt
),
c AS (
  SELECT d.*, b.budget,
         sum(d.n_tokens) OVER (
           PARTITION BY d.source ORDER BY d.h, d.doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM d JOIN b ON b.source = d.source
)
SELECT doc_id, source, n_tokens FROM c WHERE cum <= budget ORDER BY doc_id
"""


def sql_token_budget_sample(
    budgets: dict[str, int],
    table: str = "documents",
    salt: str = "mix",
) -> str:
    """Exact mirror: same md5-lower-64 hash order, same cumulative
    <= budget prefix via a window sum."""
    from . import analyze

    tok = analyze.sql_token_array("text")
    rows = ", ".join(f"('{s}', {b})" for s, b in sorted(budgets.items()))
    return f"""
WITH d AS (
  SELECT doc_id, source, len({tok})::BIGINT AS n_tokens,
         (md5_number_lower(concat('{salt}', doc_id::VARCHAR)) % 1000000)::BIGINT AS h
  FROM {table}
),
b(source, budget) AS (VALUES {rows}),
c AS (
  SELECT d.*, b.budget,
         sum(d.n_tokens) OVER (
           PARTITION BY d.source ORDER BY d.h, d.doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM d JOIN b ON b.source = d.source
)
SELECT doc_id, source, n_tokens FROM c WHERE cum <= budget ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Training-data export: deterministic shuffle -> shard assignments
# --------------------------------------------------------------------------

def export_shards(
    ds: ray.data.Dataset,
    *,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "export",
    n_ranges: int = 4096,
) -> ray.data.Dataset:
    """Deterministic epoch shuffle + sharding for training export:
    every doc gets ``(shard, pos)`` where ``shard = h % n_shards`` and
    ``pos`` is the doc's rank within its shard in ``(h, id)`` order,
    ``h = md5(salt+id) % 1e6`` (:mod:`cb.hashing`).  Layout-independent
    and salt-re-dealable — a re-run, a resumed run, or a grown corpus
    gives every existing doc the same (shard, pos).

    Exact global ranks WITHOUT a global sort: the same two-phase shape
    as token_budget_sample — per-batch (shard, h-range) count
    histograms -> tiny groupby -> driver prefix offsets (n_shards x
    n_ranges ints), then per-(shard, range) groups (corpus /
    (n_shards*n_ranges) rows each) sort locally and add their carry-in
    offset.  No group ever holds a shard's full row set."""
    from . import hashing

    def annotate(batch: pa.Table) -> pa.Table:
        h = hashing.salted_id_hash(
            salt, batch[id_col], mod=hashing.HASH_DOMAIN
        ).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "shard": pa.array(h % n_shards, type=pa.int64()),
                "r": pa.array(hashing.hash_range(h, n_ranges), type=pa.int64()),
                "h": pa.array(h, type=pa.int64()),
            }
        )

    ann = ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def batch_hist(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["shard", "r"])
            .group_by(["shard", "r"])
            .aggregate([([], "count_all")])
            .rename_columns(["shard", "r", "n"])
        )

    hist = (
        ann.map_batches(batch_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["shard", "r"])
        .sum("n")
        .take_all()
    )  # n_shards x n_ranges rows — driver-tiny
    per_shard: dict[int, list[tuple[int, int]]] = {}
    for row in hist:
        per_shard.setdefault(int(row["shard"]), []).append(
            (int(row["r"]), int(row["sum(n)"]))
        )
    offsets: dict[tuple[int, int], int] = {}
    for s, ranges in per_shard.items():
        cum = 0
        for r, n in sorted(ranges):
            offsets[(s, r)] = cum
            cum += n
    off_ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        base = offs[(int(g["shard"].iloc[0]), int(g["r"].iloc[0]))]
        g = g.sort_values(["h", id_col], kind="mergesort")
        g = g.assign(pos=np.arange(base, base + len(g), dtype=np.int64))
        return g[[id_col, "shard", "pos"]]

    return ann.groupby(["shard", "r"]).map_groups(rank_group, batch_format="pandas")


def write_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "export",
    n_ranges: int = 64,
) -> dict:
    """RESUMABLE training export: rows land in
    ``out_dir/shard=<s>/range=<r>.parquet`` (rows (h, id)-sorted within
    each file; file = one (shard, h-range) unit), written atomically —
    a failed export re-run overwrites only its own files with identical
    bytes, never one giant output.  Reading a shard's files in range
    order replays the deterministic shuffle order.  ``out_dir`` follows
    the shared-storage contract (cb.storage)."""
    import os

    from . import hashing

    def annotate(batch: pa.Table) -> pa.Table:
        h = hashing.salted_id_hash(
            salt, batch[id_col], mod=hashing.HASH_DOMAIN
        ).astype(np.int64)
        return batch.append_column(
            "shard", pa.array(h % n_shards, type=pa.int64())
        ).append_column(
            "r", pa.array(hashing.hash_range(h, n_ranges), type=pa.int64())
        ).append_column("h", pa.array(h, type=pa.int64()))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        s, r = int(g["shard"].iloc[0]), int(g["r"].iloc[0])
        g = g.sort_values(["h", id_col], kind="mergesort").drop(
            columns=["shard", "r", "h"]
        )
        d = os.path.join(out_dir, f"shard={s}")
        os.makedirs(d, exist_ok=True)
        fpath = os.path.join(d, f"range={r}.parquet")
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False), fpath + ".tmp"
        )
        os.replace(fpath + ".tmp", fpath)
        return pd.DataFrame({"shard": [s], "r": [r], "n_rows": [len(g)]})

    parts = (
        ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["shard", "r"])
        .map_groups(write_group, batch_format="pandas")
        .take_all()
    )
    return {
        "out_dir": out_dir,
        "n_files": len(parts),
        "n_rows": int(sum(p["n_rows"] for p in parts)),
    }
