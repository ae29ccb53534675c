"""Benchmark driver: index-build throughput + BM25 query latency.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-phase sec...}, "sf": ..., "num_cpus": N}

--scaling: runs the same job twice in fresh processes at 8 and 32 CPUs
(the sandbox proxy for N vs 4N nodes) and prints both times + scaling
efficiency.

Input prep (synthetic source-code corpus generation, page-cache warm)
is untimed; timed phases are the engine: index builds and query serving.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_DOCS_PER_SF = 6_000_000  # sf0.1 -> 600k synthetic source files
QUERY_REPEATS = 5


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_corpus(n_docs: int, seed: int = 42) -> str:
    """Deterministic corpus parquet under /tmp, generated in parallel
    once and reused (generation is input prep, not engine work)."""
    import ray

    out = f"/tmp/cb_bench/corpus_{n_docs}_{seed}"
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    from cb import corpus as corpus_mod

    @ray.remote
    def gen(start: int, count: int, path: str) -> int:
        import pyarrow.parquet as pq

        tbl = corpus_mod.generate_corpus_slice(start, count, seed)
        pq.write_table(tbl, path)
        return count

    n_files = max(8, NCPU)
    per = (n_docs + n_files - 1) // n_files
    futs = []
    for i in range(n_files):
        start = i * per
        cnt = min(per, n_docs - start)
        if cnt <= 0:
            break
        futs.append(gen.remote(start, cnt, os.path.join(out, f"part-{i:05d}.parquet")))
    ray.get(futs)
    with open(marker, "w") as f:
        f.write(str(n_docs))
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from cb import build, shard

    sf = _sf_value(SF_DIR)
    n_code_docs = max(2000, int(CORPUS_DOCS_PER_SF * sf))
    corpus_dir = ensure_corpus(n_code_docs)
    docs_path = os.path.join(SF_DIR, "documents.parquet")

    # warm page cache (untimed)
    import pyarrow.parquet as pq

    pq.read_table(docs_path)
    for f in os.listdir(corpus_dir):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(corpus_dir, f))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # Contention probe: a fixed single-threaded numpy kernel, timed at
    # start and end of the run.  The sandbox VM shares hardware with
    # invisible neighbors and run-to-run wall times swing up to ~2x for
    # identical work; this calibrates how loaded the box was so scaling
    # ratios can be read honestly (a clean pair has similar calib times
    # in both legs).
    def _calibrate() -> float:
        import numpy as _np

        a = _np.random.Generator(_np.random.PCG64(1)).standard_normal((1200, 1200))
        t = time.perf_counter()
        for _ in range(4):
            a = a @ a * 1e-3
        return time.perf_counter() - t

    extras["calib_start_sec"] = _calibrate()

    # phase 1: index build over the sf documents table
    docs_idx = "/tmp/cb_bench/idx_docs"
    shutil.rmtree(docs_idx, ignore_errors=True)
    t0 = time.perf_counter()
    # num_parts is FIXED (not CPU-derived): the scaling criterion compares
    # the SAME job at two parallelism levels.
    meta_docs = build.build_index(docs_path, docs_idx, text_col="text", id_col="doc_id",
                                  columns=["doc_id", "text"],
                                  num_parts=8, batch_size=1024)
    timings["build_documents"] = time.perf_counter() - t0
    extras["documents_docs_per_sec"] = meta_docs.n_docs / timings["build_documents"]

    # phase 2: index build over the synthetic source-code corpus
    code_idx = "/tmp/cb_bench/idx_code"
    shutil.rmtree(code_idx, ignore_errors=True)
    t0 = time.perf_counter()
    meta_code = build.build_index(corpus_dir, code_idx, text_col="content", id_col=None,
                                  num_parts=32, batch_size=2048)
    timings["build_code_corpus"] = time.perf_counter() - t0
    extras["code_docs_per_sec"] = meta_code.n_docs / timings["build_code_corpus"]

    # phase 3: BM25 top-10 serving on the code index (actor pool).
    # Latency: sequential singles (reported, latency doesn't scale with
    # CPUs). Throughput: pipelined query_many across the server pool
    # (scales with servers — part of the headline/scaling value).
    from cb.pipelines import QUERY_SET

    vocab_queries = list(QUERY_SET) + [
        "import batch reader",
        "parse token stream",
        "getValue setKey",
        "hash index merge block",
        "read_file write_file",
    ]
    # DISTINCT throughput queries (vocab pair/triple combinations): the
    # throughput number reflects real scoring work, not the per-server
    # result cache (which only repeats would hit)
    import itertools

    vocab_words = sorted({w for q in vocab_queries for w in q.split()})
    distinct_queries = [
        " ".join(c) for c in itertools.islice(itertools.combinations(vocab_words, 2), 600)
    ]
    t0 = time.perf_counter()
    engine = shard.QueryEngine(code_idx, num_servers=max(2, NCPU // 2))
    engine.warm(min_df=1000)  # pre-decode hot postings (timed: part of serving startup)
    timings["engine_load"] = time.perf_counter() - t0

    for _ in range(QUERY_REPEATS):
        for q in vocab_queries:
            engine.query(q, k=10)
    # latency/phase numbers come from the engine's own telemetry
    # counters (cb.telemetry), not ad-hoc wall timers around the calls
    em = engine.metrics()
    qt = em["engine"]["timers"]["query.total"]
    extras["query_p50_ms"] = 1000 * qt["p50_sec"]
    extras["query_p95_ms"] = 1000 * qt["p95_sec"]
    extras["n_latency_queries"] = float(qt["count"])
    for phase in ("dispatch", "wait", "merge"):
        t = em["engine"]["timers"].get(f"query.{phase}")
        if t:
            extras[f"query_{phase}_mean_ms"] = 1000 * t["mean_sec"]
    sv = em["servers"]["timers"].get("server.score")
    if sv:
        extras["server_score_mean_ms"] = 1000 * sv["mean_sec"]

    t0 = time.perf_counter()
    engine.query_many(distinct_queries, k=10)
    timings["bm25_query_throughput"] = time.perf_counter() - t0
    extras["queries_per_sec"] = len(distinct_queries) / timings["bm25_query_throughput"]

    # msearch (full query strings incl. phrases) vs the sequential
    # search loop — the batched-dispatch win on the querylang path
    # (query_many above covers only plain term sets)
    qs_mixed = [
        (f'"{q}"' if i % 4 == 0 else q)
        for i, q in enumerate(distinct_queries[:200])
    ]
    t0 = time.perf_counter()
    for q in qs_mixed:
        engine.search(q, k=10)
    seq_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    engine.msearch(qs_mixed, k=10)
    msearch_sec = time.perf_counter() - t0
    extras["msearch_queries_per_sec"] = len(qs_mixed) / msearch_sec
    extras["msearch_speedup_vs_sequential"] = seq_sec / msearch_sec

    # phase 4 (extras, untimed in headline): IVF recall@10 vs brute
    # force on the embeddings table — the accuracy/perf tradeoff number
    # the approximate index is accountable to.  Skipped during --scaling
    # legs (extras are not part of the scaled job).
    skip_extras = bool(os.environ.get("CB_BENCH_SKIP_EXTRAS"))
    emb_path = os.path.join(SF_DIR, "embeddings.parquet")
    if not skip_extras and os.path.exists(emb_path):
        import numpy as np

        from cb import ann

        head = pq.read_table(emb_path).sort_by("vec_id").slice(0, 20)
        qmat = np.array(head["embedding"].to_pylist())
        qids = head["vec_id"].to_numpy()
        ds = ray.data.read_parquet(emb_path)
        exact = ann.brute_force_topk(ds, qmat, qids, k=10)
        ivf_dir = "/tmp/cb_bench/ivf"
        shutil.rmtree(ivf_dir, ignore_errors=True)
        t0 = time.perf_counter()
        # nprobe=8/16 cells: recall 0.82 on the UNCLUSTERED sf0.1
        # fixture at the same wall time as nprobe=4 (0.595) — the
        # probe-count sweep is recorded in BENCH/BASELINE.md
        approx = ann.ivf_topk(
            ray.data.read_parquet(emb_path), qmat, qids, k=10,
            index_dir=ivf_dir, n_centroids=16, nprobe=8,
        )
        extras["ivf_build_plus_search_sec"] = time.perf_counter() - t0
        ex = {}
        for r in exact.to_pylist():
            ex.setdefault(r["query_id"], set()).add(r["vec_id"])
        got = {}
        for r in approx.to_pylist():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [
            len(ex[q] & got.get(q, set())) / len(ex[q]) for q in ex
        ]
        extras["ivf_recall_at_10"] = sum(recalls) / len(recalls)

    # phase 5 (extras): compaction throughput — tombstone ~1% of the
    # code corpus and physically drop it (vectorized whole-partition
    # decode -> survivor mask -> re-encode).
    engine.shutdown()
    if not skip_extras:
        ds_dir = os.path.join(code_idx, "docstats")
        some = pq.read_table(os.path.join(ds_dir, sorted(os.listdir(ds_dir))[0]))
        dead = some["doc_id"].to_pylist()[:: max(1, some.num_rows // max(1, meta_code.n_docs // 100))]
        shard.delete_docs(code_idx, dead)
        n_rows = build.IndexMeta(code_idx).build_metrics()["n_rows"]
        t0 = time.perf_counter()
        build.compact_index(code_idx)
        extras["compact_sec"] = time.perf_counter() - t0
        extras["compact_tombstones"] = float(len(dead))
        extras["compact_posting_rows"] = float(n_rows)

    # phase 6 (extras): federation — per-day split of the documents
    # table, federation-global-exact cross-index search, and the
    # day-pruning payoff (the GetIndexNames read path).
    if not skip_extras:
        from cb import federated
        from cb.pipelines import FED_EPOCH_US, FED_NDAYS

        import numpy as np
        import pyarrow as pa

        def with_ts(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            us = FED_EPOCH_US + (ids % FED_NDAYS) * 86_400_000_000
            return b.append_column("ts", pa.array(us).cast(pa.timestamp("us")))

        fed_dir = "/tmp/cb_bench/fed"
        shutil.rmtree(fed_dir, ignore_errors=True)
        t0 = time.perf_counter()
        federated.build_federation(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
                with_ts, batch_format="pyarrow"
            ),
            fed_dir, text_col="text", id_col="doc_id", ts_col="ts", prefix="cb-",
        )
        extras["fed_build_sec"] = time.perf_counter() - t0
        fed_queries = [
            " ".join(c)
            for c in itertools.islice(
                itertools.combinations(
                    sorted({w for q in QUERY_SET for w in q.split()}), 2
                ),
                150,
            )
        ]
        feng = federated.FederatedEngine(fed_dir, num_servers=2)
        # disjoint query halves: server-side result caches from one
        # measurement must not serve the other.  Warm first so both
        # legs measure steady-state scoring (first-touch decode
        # otherwise lands entirely on the full-fan-out leg and
        # inflates the prune ratio).
        feng.warm(min_df=0)
        half = len(fed_queries) // 2
        try:
            t0 = time.perf_counter()
            feng.query_many(fed_queries[:half], k=10)
            full = time.perf_counter() - t0
            extras["fed_queries_per_sec"] = half / full
            t0 = time.perf_counter()
            feng.query_many(
                fed_queries[half:], k=10,
                start_day="20260106", end_day="20260106",
            )
            pruned = time.perf_counter() - t0
            # >1: a 1-of-N-days query costs ~1/N of the unbounded fan-out
            extras["fed_day_prune_speedup"] = full / pruned
        finally:
            feng.shutdown()

    if not skip_extras:
        # phase 7: LLM-curation ops at corpus scale — ExactSubstr
        # duplicate-span detection and bigram-LM quality scoring over a
        # 60k-doc slice of the code corpus (streamed, never collected)
        from cb import dedup as dedup_mod
        from cb import lm as lm_mod
        from cb.corpus import with_identity as _wid

        sub_docs = 60_000
        sub_dir = ensure_corpus(sub_docs)
        def _code_ds():
            return (
                ray.data.read_parquet(
                    sub_dir, columns=["repo", "path", "commit", "content"]
                )
                .map_batches(_wid, batch_format="pyarrow")
                .select_columns(["doc_id", "content"])
            )

        # actor pools sized >= session CPUs starve the upstream read
        # tasks (deadlock at RAY_GRAFT_CPUS=8 with the old fixed 8)
        pool = min(8, max(2, NCPU // 2))
        t0 = time.perf_counter()
        n_spans = dedup_mod.duplicate_ngram_spans(
            _code_ds(), n=8, min_count=2, text_col="content", concurrency=pool
        ).count()
        dt = time.perf_counter() - t0
        extras["dup_span_docs_per_sec"] = sub_docs / dt
        extras["dup_span_rows"] = float(n_spans)
        t0 = time.perf_counter()
        lm_mod.lm_quality_score(
            _code_ds(), text_col="content", min_count=5, concurrency=pool
        ).count()
        extras["lm_score_docs_per_sec"] = sub_docs / (time.perf_counter() - t0)

    if not skip_extras:
        # phase 8: multifield serving — block-max WAND vs exact TAAT on
        # one in-process searcher (isolates scoring cost from actor
        # dispatch); queries are MULTIFIELD_SET's plain scored-term
        # subset (the clause shapes WAND can bound), k=10.  Wall-clock
        # AND decode volume are both reported: on this synthetic corpus
        # (flat score distribution, every vocab term in ~10% of docs)
        # block-max bounds rarely cut off and vectorized decode-all
        # TAAT wins wall-clock — which is why TAAT stays the serving
        # default; WAND's lever is blocks-not-decoded on selective
        # queries (see BENCH/BASELINE.md).
        from cb import multifield as mf_mod, wand as wand_mod
        from cb.pipelines import MULTIFIELD_SET, get_multifield_index

        mf_idx = get_multifield_index(SF_DIR)
        srch = mf_mod.MultiFieldSearcher(mf_idx)
        eligible = [
            q for q in MULTIFIELD_SET
            if mf_mod._wand_eligible(
                mf_mod.route_query(q, srch.fields), srch.tombstones
            )
        ]
        total_blocks = 0
        for q in eligible:  # warm postings blocks for both legs
            srch.search(q, k=10, algo="taat")
            routed = mf_mod.route_query(q, srch.fields)
            for f in srch.fields:
                for t in routed["field_terms"].get(f) or []:
                    p = srch._get(f, t)
                    if p is not None:
                        total_blocks += sum(ch.n_blocks for ch in p.chunks)
        b0 = wand_mod.BLOCKS_DECODED
        for q in eligible:
            srch.search(q, k=10, algo="wand")
        extras["mf_wand_blocks_decoded_frac"] = (
            (wand_mod.BLOCKS_DECODED - b0) / max(total_blocks, 1)
        )
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            for q in eligible:
                srch.search(q, k=10, algo="taat")
        taat_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            for q in eligible:
                srch.search(q, k=10, algo="wand")
        wand_s = time.perf_counter() - t0
        nq = float(reps * len(eligible))
        extras["mf_taat_queries_per_sec"] = nq / taat_s
        extras["mf_wand_queries_per_sec"] = nq / wand_s
        extras["mf_wand_speedup_vs_taat"] = taat_s / wand_s
        # best_fields (dis_max) combine: same match work as TAAT plus
        # the per-field max — the delta vs mf_taat is the combine cost
        t0 = time.perf_counter()
        for _ in range(reps):
            for q in eligible:
                srch.search(q, k=10, mode="best_fields", tie_breaker=0.25)
        extras["mf_dismax_queries_per_sec"] = nq / (time.perf_counter() - t0)

    if not skip_extras:
        # phase 9: full-match aggregation family on the documents index
        # (facets / range / composite / top_hits per second — each is a
        # FULL-match-set pass, so these are corpus-bound, not top-k-
        # bound; per-server output stays O(buckets | groups | k)).
        from cb import docmeta as docmeta_mod
        from cb.pipelines import FACET_SET, RANGE_EDGES

        docmeta_mod.ensure_docmeta(
            docs_idx, docs_path, ["lang", "source", "n_chars"]
        )
        ag = shard.QueryEngine(docs_idx, num_servers=4)
        try:
            reps = 10
            th_queries = list(QUERY_SET[:5])  # top_hits is plain-term
            legs = {
                "agg_facets_per_sec": (FACET_SET, lambda q: ag.facets(
                    q, facet_cols=["lang", "source"]
                )),
                "agg_range_per_sec": (FACET_SET, lambda q: ag.range_agg(
                    q, {"n_chars": list(RANGE_EDGES)}
                )),
                "agg_composite_per_sec": (FACET_SET, lambda q: ag.composite(
                    q, ["lang", "source"], size=8
                )),
                "agg_top_hits_per_sec": (th_queries, lambda q: ag.top_hits(
                    q, "lang", 3
                )),
            }
            for key, (qs_, fn) in legs.items():
                for q in qs_:  # warm postings once per leg
                    fn(q)
                t0 = time.perf_counter()
                for _ in range(reps):
                    for q in qs_:
                        fn(q)
                extras[key] = reps * len(qs_) / (time.perf_counter() - t0)

            # phase 10: round-5 search-API closure — function_score
            # (full-match combine), match_phrase_prefix (vocabulary
            # expansion + positional chains), term vectors (bucket +
            # candidate-block pruned decode)
            from cb.pipelines import (
                FSCORE_PIVOT,
                FSCORE_W,
                PHRASE_PREFIX_SET,
                QUERY_SET as _QS,
            )

            spec = {"kind": "saturation", "col": "n_chars",
                    "w": FSCORE_W, "pivot": FSCORE_PIVOT}
            for q in _QS[:5]:
                ag.function_score(q, spec, k=10)
            t0 = time.perf_counter()
            for _ in range(reps):
                for q in _QS[:5]:
                    ag.function_score(q, spec, k=10)
            extras["function_score_per_sec"] = reps * 5 / (time.perf_counter() - t0)

            for q in PHRASE_PREFIX_SET:
                ag.phrase_prefix_query(q, k=10, max_expansions=None)
            t0 = time.perf_counter()
            for _ in range(reps):
                for q in PHRASE_PREFIX_SET:
                    ag.phrase_prefix_query(q, k=10, max_expansions=None)
            extras["phrase_prefix_per_sec"] = (
                reps * len(PHRASE_PREFIX_SET) / (time.perf_counter() - t0)
            )

            import numpy as np
            import pyarrow.parquet as _pq

            tv_ids = np.sort(
                _pq.read_table(docs_path, columns=["doc_id"])["doc_id"]
                .to_numpy(zero_copy_only=False)
            )[:20].tolist()
            ag.term_vectors(tv_ids[:5])  # warm
            t0 = time.perf_counter()
            for i in range(0, 20, 5):
                ag.term_vectors(tv_ids[i : i + 5])
            extras["term_vectors_docs_per_sec"] = 20 / (time.perf_counter() - t0)
        finally:
            ag.shutdown()

        # phase 10b: percolator throughput — index-free streaming pass
        # over the whole documents table (docs/sec, vectorized)
        from cb import percolate as perc_mod
        from cb.pipelines import PERCOLATE_SET

        n_docs_tbl = meta_docs.n_docs
        t0 = time.perf_counter()
        perc_ds = perc_mod.percolate(
            ray.data.read_parquet(docs_path), list(PERCOLATE_SET)
        )
        n_pairs = perc_ds.count()
        extras["percolate_docs_per_sec"] = n_docs_tbl / (time.perf_counter() - t0)
        extras["percolate_pairs"] = float(n_pairs)

        # phase 11: cluster-balanced sampling — nearest-centroid
        # assignment throughput (vectors/sec through the actor-pool
        # matmul + per-batch partial sample); same embeddings-fixture
        # guard as the phase-2 ANN block
        if os.path.exists(emb_path):
            import numpy as _np
            import pyarrow.parquet as _pq2

            from cb import ann as _ann

            head = _pq2.read_table(emb_path).sort_by("vec_id").slice(0, 8)
            cmat = _np.array(head["embedding"].to_pylist())
            cids = head["vec_id"].to_numpy()
            n_vecs = _pq2.read_metadata(emb_path).num_rows
            t0 = time.perf_counter()
            _ann.assign_clusters(
                ray.data.read_parquet(emb_path), cmat, cids
            ).count()
            extras["cluster_assign_vecs_per_sec"] = (
                n_vecs / (time.perf_counter() - t0)
            )

    extras["calib_end_sec"] = _calibrate()
    total = sum(timings.values())
    out = {
        "metric": "index_build_plus_bm25_queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": NCPU,
        "extras": {k: round(v, 3) for k, v in extras.items()},
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), CB_BENCH_SKIP_EXTRAS="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # Default pair 4 vs 16 (the rule's "N and 4N"): on this single box,
    # 8-vs-32 conflates algorithmic scaling with memory-bandwidth
    # saturation (measured ~55-70% per-task CPU inflation at 32 workers
    # even for embarrassingly parallel map stages; ~19% at 16). Real
    # N->4N node counts keep per-node bandwidth constant, which the
    # smaller pair models more faithfully. Override with
    # CB_SCALE_LO/CB_SCALE_HI.
    lo = int(os.environ.get("CB_SCALE_LO", "4"))
    hi = int(os.environ.get("CB_SCALE_HI", "16"))
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    build_lo = r_lo["queries"]["build_documents"] + r_lo["queries"]["build_code_corpus"]
    build_hi = r_hi["queries"]["build_documents"] + r_hi["queries"]["build_code_corpus"]
    print(json.dumps({
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        "build_sec_lo": round(build_lo, 3),
        "build_sec_hi": round(build_hi, 3),
        "build_scaling_efficiency": round((build_lo / build_hi) / (hi / lo), 3),
        "detail_lo": r_lo["queries"],
        "detail_hi": r_hi["queries"],
        "extras_lo": r_lo.get("extras", {}),
        "extras_hi": r_hi.get("extras", {}),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
