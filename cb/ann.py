"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each ``map_batches`` task does one numpy
  matmul per batch and emits only its per-batch top-k candidates, the
  driver merges the tiny candidate set.  The per-batch top-k is the
  combiner that keeps the merge O(batches * Q * k), never O(N).
- :func:`build_ivf` / :func:`ivf_search` — a real bucketed IVF index:
  sampled-k-means centroids, one groupby pass writes one parquet file
  per coarse cell, a query READS only its ``nprobe`` buckets (pruned
  I/O, not just pruned flops).  Approximate -> rows-only oracle check;
  recall@10 >= 0.9 asserted in tests on clustered data.
- :func:`embedding_near_duplicates` — EXACT cosine >= tau pairs as a
  distributed block-pair sweep (no corpus-sized driver state).
- :func:`embedding_near_duplicates_lsh` — the sub-quadratic scale
  path: random-hyperplane LSH blocking + exact verify (precision 1,
  recall rises with bands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return mat / norms


def _topk_with_ties(col: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest values PLUS every value tied at the kth
    boundary.  An argpartition that keeps an arbitrary subset of the tied
    candidates can drop the one the global (sim DESC, id ASC) tie-break
    prefers before the driver merge — ties must survive to the merge."""
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    if k >= len(col):
        return np.arange(len(col))
    kth = np.partition(col, len(col) - k)[len(col) - k]
    return np.flatnonzero(col >= kth)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch[col]
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    n = len(lists)
    return flat.reshape(n, -1)


def _candidate_schema() -> pa.Schema:
    return pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )


def _empty_candidates() -> pa.Table:
    return pa.Table.from_pylist([], schema=_candidate_schema())


def _merge_candidates(tbl: pa.Table, k: int) -> pa.Table:
    """Tiny driver-side merge of per-batch candidates -> exact top-k per
    query with the global (sim DESC, vec_id ASC) tie-break."""
    out = {"query_id": [], "rank": [], "vec_id": [], "sim": []}
    df = tbl.to_pandas()
    for qid, g in df.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend([qid] * len(g))
        out["rank"].extend(range(1, len(g) + 1))
        out["vec_id"].extend(g["vec_id"].tolist())
        out["sim"].extend(g["sim"].tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "vec_id": pa.array(out["vec_id"], type=pa.int64()),
            "sim": pa.array(out["sim"], type=pa.float64()),
        }
    )


class BruteForceScorer:
    """Actor-pool stage: query matrix fetched once per actor."""

    def __init__(self, query, k: int, vec_col: str, id_col: str, allow=None):
        # ``query`` may be a plain dict (small query sets, shipped in the
        # actor ctor) or an ObjectRef from ray.put (large query matrices,
        # fetched once per actor from the shared object store).
        q = ray.get(query) if isinstance(query, ray.ObjectRef) else query
        self.qmat = _normalize(np.asarray(q["mat"]))
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        # optional metadata pre-filter: SORTED allowed-id array, fetched
        # once per actor (filtered vector search).  Scale note: at 100 TB
        # an id-set broadcast only works for selective filters — the
        # general design carries the filter COLUMN in the vector table
        # (or hash-partitions both sides) so the mask is batch-local.
        a = ray.get(allow) if isinstance(allow, ray.ObjectRef) else allow
        self.allow = None if a is None else np.asarray(a, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if self.allow is not None:
            pos = np.searchsorted(self.allow, ids)
            pos[pos == len(self.allow)] = 0
            keep = (
                self.allow[pos] == ids
                if len(self.allow)
                else np.zeros(len(ids), dtype=bool)
            )
            if not keep.any():
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "sim": pa.array([], type=pa.float64()),
                    }
                )
            mat, ids = mat[keep], ids[keep]
        sims = mat @ self.qmat.T  # (n, Q)
        k = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = _topk_with_ties(col, k)
            out_q.append(np.full(len(top), self.qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(col[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


class ClusterAssigner:
    """Actor-pool stage: the centroid matrix is normalized ONCE per
    actor; each batch is one (n, C) matmul + argmax — the assignment
    half of spherical k-means / IVF routing, reusable standalone as the
    cluster step of diversity sampling (SemDeDup-style
    cluster-then-prune curation).  ``np.argmax`` breaks ties at the
    lowest index, so with ascending centroid ids the tie-break is
    (sim DESC, cid ASC) — the SQL mirror's window order."""

    def __init__(self, cents, cent_ids, vec_col: str, id_col: str):
        c = ray.get(cents) if isinstance(cents, ray.ObjectRef) else cents
        self.cmat = _normalize(np.asarray(c))
        self.cids = np.asarray(cent_ids, dtype=np.int64)
        if not np.all(self.cids[:-1] < self.cids[1:]):
            raise ValueError("centroid ids must be strictly ascending")
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        best = np.argmax(mat @ self.cmat.T, axis=1)
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "cluster": pa.array(self.cids[best], type=pa.int64()),
            }
        )


def assign_clusters(
    ds: ray.data.Dataset,
    cent_mat: np.ndarray,
    cent_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """-> Dataset of (id_col, cluster): nearest-centroid (cosine)
    assignment of every vector, streaming (the output is two skinny
    int64 columns regardless of dimension).  Size ``concurrency``
    strictly below the session CPU count (same deadlock note as
    :func:`brute_force_topk`)."""
    cent_ids = np.asarray(cent_ids, dtype=np.int64)
    if not np.all(cent_ids[:-1] < cent_ids[1:]):
        # checked here too: an actor-ctor failure surfaces as an opaque
        # ActorDiedError instead of this ValueError
        raise ValueError("centroid ids must be strictly ascending")
    return ds.map_batches(
        ClusterAssigner,
        fn_constructor_kwargs={
            "cents": np.asarray(cent_mat),
            "cent_ids": np.asarray(cent_ids),
            "vec_col": vec_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def brute_force_topk(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
    allow_ids: np.ndarray | None = None,
) -> pa.Table:
    """-> (query_id, rank, vec_id, sim): exact cosine top-k per query.

    ``allow_ids`` (sorted int64) restricts candidates to that id set —
    filtered vector search (the ES knn-query ``filter`` clause); see
    the BruteForceScorer scale note on broadcast-vs-colocated filters.

    NOTE: size ``concurrency`` strictly below the session CPU count —
    an actor pool that reserves every CPU starves the read tasks and
    the pipeline deadlocks."""
    query = {"mat": np.asarray(query_mat), "ids": np.asarray(query_ids)}
    allow = None
    if allow_ids is not None:
        allow_ids = np.asarray(allow_ids, dtype=np.int64)
        if not np.all(allow_ids[:-1] <= allow_ids[1:]):
            raise ValueError("allow_ids must be sorted ascending")
        allow = ray.put(allow_ids)
    cands = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={
            "query": query,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
            "allow": allow,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    from .collect import collect_table

    tbl = collect_table(cands, schema=_candidate_schema())  # tiny: batches * Q * k
    return _merge_candidates(tbl, k)


# --------------------------------------------------------------------------
# IVF: a real bucketed index (build once, probe-only reads)
# --------------------------------------------------------------------------

def _kmeans(mat: np.ndarray, k: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means over a (sampled) normalized
    matrix: k-means++-style seeding + Lloyd iterations with cosine
    assignment; centroids re-normalized each round."""
    n = len(mat)
    k = min(k, n)
    rng = np.random.Generator(np.random.PCG64(seed))
    # k-means++ seeding on cosine distance
    first = int(rng.integers(n))
    cents = [mat[first]]
    d = 1.0 - mat @ cents[0]
    for _ in range(1, k):
        probs = np.maximum(d, 0)
        s = probs.sum()
        idx = int(rng.choice(n, p=probs / s)) if s > 0 else int(rng.integers(n))
        cents.append(mat[idx])
        d = np.minimum(d, 1.0 - mat @ cents[-1])
    C = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(mat @ C.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members) == 0:
                # reseed empty cluster to the worst-served point
                worst = int(np.argmin((mat @ C.T).max(axis=1)))
                C[c] = mat[worst]
            else:
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                C[c] = v / norm if norm > 0 else C[c]
    return C


def build_ivf(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Build a bucketed IVF layout: sampled-k-means centroids, one
    groupby pass assigning every vector to its nearest centroid, one
    parquet file per bucket (``bucket=<c>.parquet``).  A query then
    READS only its ``nprobe`` buckets — probing saves I/O, not just
    matmul flops.  At cluster scale each bucket file is further
    range-partitioned; the layout (dir per coarse cell) is the standard
    IVF file organization."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    # centroid sample: deterministic HASH sample on the id column, not
    # limit(n) (first-N is order-biased on clustered inputs) and not
    # random_sample (row-order/partitioning dependent) — Knuth
    # multiplicative hashing keeps the kept-set a fixed function of the
    # ids, so rebuilds see the same seed sample regardless of scan order
    n_total = ds.count()
    if n_total > sample_size:
        frac = sample_size / n_total
        cut = np.uint64(int(frac * (1 << 32)))

        def keep_sample(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
            return batch.filter(pa.array(h < cut))

        sample = ds.map_batches(keep_sample, batch_format="pyarrow").take_all()
    else:
        sample = ds.take_all()
    smat = _normalize(np.array([r[vec_col] for r in sample]))
    cents = _kmeans(smat, n_centroids, iters=iters)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cents_ref)
        mat = _normalize(_batch_matrix(batch, vec_col))
        a = np.argmax(mat @ C.T, axis=1).astype(np.int32)
        return pa.table(
            {
                "centroid": pa.array(a, type=pa.int32()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    def write_bucket(group: pa.Table) -> pa.Table:
        c = int(group["centroid"][0].as_py())
        # sort by id for deterministic bucket bytes
        group = group.sort_by(id_col)
        fpath = os.path.join(index_dir, f"bucket={c}.parquet")
        pq.write_table(group, fpath + ".tmp")
        os.replace(fpath + ".tmp", fpath)
        return pa.table(
            {"centroid": pa.array([c], type=pa.int32()),
             "n_vecs": pa.array([group.num_rows], type=pa.int64())}
        )

    counts = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("centroid")
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()
    )
    written = {int(r["centroid"]) for r in counts}
    # drop stale cells from a previous build of this dir (write_bucket
    # only touches non-empty groups; ivf_search also guards via meta)
    import glob as _glob

    for f in _glob.glob(os.path.join(index_dir, "bucket=*.parquet")):
        c = int(os.path.basename(f)[len("bucket=") : -len(".parquet")])
        if c not in written:
            os.remove(f)
    meta = {
        "n_centroids": int(len(cents)),
        "dim": int(cents.shape[1]),
        "vec_col": vec_col,
        "id_col": id_col,
        "buckets": {str(r["centroid"]): int(r["n_vecs"]) for r in counts},
    }
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_search(
    index_dir: str,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    concurrency: int = 2,
) -> pa.Table:
    """Probe-only search over a :func:`build_ivf` layout: each query
    selects its ``nprobe`` nearest centroids; ONLY those bucket files
    are read (pruned ``read_parquet``), scored per batch against the
    queries probing them, and merged on the driver.  Size
    ``concurrency`` to the cluster (stay below the session CPU count —
    an actor pool that reserves every CPU starves the read tasks)."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = _normalize(np.asarray(query_mat))
    qids = np.asarray(query_ids, dtype=np.int64)
    nprobe = min(nprobe, meta["n_centroids"])
    # only cells THIS build wrote (meta['buckets']) are live — a stale
    # bucket file from an earlier build in the same dir must not serve;
    # dead cells are masked out so every query still probes nprobe REAL
    # cells rather than wasting probes on empty ones
    live = {int(c) for c in meta["buckets"]}
    qsims = qmat @ cents.T
    dead = np.array([c not in live for c in range(len(cents))], dtype=bool)
    qsims[:, dead] = -np.inf
    probe = np.argsort(-qsims, axis=1)[:, :nprobe]
    needed = sorted({int(c) for row in probe for c in row} & live)
    files = [
        os.path.join(index_dir, f"bucket={c}.parquet")
        for c in needed
        if os.path.exists(os.path.join(index_dir, f"bucket={c}.parquet"))
    ]
    if not files:
        return _merge_candidates(_empty_candidates(), k)
    query_ref = ray.put({"mat": qmat, "ids": qids, "probe": probe})
    vec_col, id_col = meta["vec_col"], meta["id_col"]

    class ProbeScorer:
        """Actor-pool stage: query/probe state fetched once per actor."""

        def __init__(self):
            q = ray.get(query_ref)
            self.qmat, self.qids, self.probe = q["mat"], q["ids"], q["probe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            assign = batch["centroid"].to_numpy(zero_copy_only=False)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                sub = mat[mask] @ self.qmat[qi]
                sub_ids = ids[mask]
                top = _topk_with_ties(sub, min(k, len(sub_ids)))
                out_q.append(np.full(len(top), self.qids[qi], dtype=np.int64))
                out_v.append(sub_ids[top])
                out_s.append(sub[top])
            if not out_q:
                return _empty_candidates()
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
                }
            )

    cands = ray.data.read_parquet(files).map_batches(
        ProbeScorer, batch_format="pyarrow", concurrency=concurrency
    )
    from .collect import collect_table

    tbl = collect_table(cands, schema=_candidate_schema())
    return _merge_candidates(tbl, k)


def ivf_topk(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index_dir: str | None = None,
    concurrency: int = 2,
) -> pa.Table:
    """Convenience wrapper: build (or reuse) the IVF layout, then
    probe-search it.  Same output schema as :func:`brute_force_topk`;
    recall < 1 by design (measured in tests: >=0.9 on clustered data).

    ``index_dir`` is REQUIRED and holds the cell files the probe tasks
    read from other nodes: shared-storage contract applies
    (:mod:`cb.storage`).  It must be caller-supplied (not derived)
    because an existing ``meta.json`` there is REUSED — a derived
    default would let a different dataset silently hit another run's
    index; a node-local ``mkdtemp`` default would break multi-node."""
    import os

    if index_dir is None:
        raise ValueError(
            "ivf_topk requires an explicit index_dir on shared storage "
            "(see cb.storage): an existing IVF layout there is reused, "
            "so the caller must own the path/dataset pairing"
        )
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_ivf(
            ds, index_dir, n_centroids=n_centroids,
            vec_col=vec_col, id_col=id_col,
        )
    return ivf_search(
        index_dir, query_mat, query_ids, k=k, nprobe=nprobe, concurrency=concurrency
    )


def _collect_pairs(ds: ray.data.Dataset) -> pa.Table:
    """Result-sized (vec_a, vec_b, cosine) dataset -> one Table."""
    from .collect import collect_table

    return collect_table(ds, schema=_pairs_schema())


def _pairs_schema() -> pa.Schema:
    return pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())]
    )


def _cross_pairs(
    a_ids: np.ndarray, a_mat: np.ndarray, b_ids: np.ndarray, b_mat: np.ndarray,
    tau: float, same: bool,
) -> pa.Table:
    """All unordered (a, b) pairs with cosine >= tau between two
    normalized blocks, emitted as (min_id, max_id).  ``same=True`` (a
    block against itself) keeps only the upper triangle; distinct
    blocks hold disjoint id sets, so every cross pair appears exactly
    once and is oriented by min/max."""
    sims = a_mat @ b_mat.T
    keep = sims >= tau
    if same:
        keep &= a_ids[:, None] < b_ids[None, :]
    ii, jj = np.nonzero(keep)
    lo = np.minimum(a_ids[ii], b_ids[jj])
    hi = np.maximum(a_ids[ii], b_ids[jj])
    return pa.table(
        {
            "vec_a": pa.array(lo, type=pa.int64()),
            "vec_b": pa.array(hi, type=pa.int64()),
            "cosine": pa.array(sims[ii, jj], type=pa.float64()),
        }
    )


def embedding_near_duplicates(
    ds: ray.data.Dataset,
    *,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_rows: int = 4096,
    work_dir: str | None = None,
) -> pa.Table:
    """EXACT cosine near-dup pairs (>= tau, a < b), distributed as a
    block-pair sweep: vectors are bucketed into B blocks (one parquet
    file each, written by a groupby pass), then one task per (i<=j)
    block pair loads two blocks and emits its pairs.  Nothing
    corpus-sized touches the driver; compute is the inherent exact
    O(N^2) spread over B(B+1)/2 independent tasks.  For the approximate
    scale path (sub-quadratic candidate generation) use
    :func:`embedding_near_duplicates_lsh`.

    ``work_dir`` is written by the block pass and read back by the
    pair-sweep tasks, which may run on OTHER NODES: it must satisfy the
    shared-storage contract (:mod:`cb.storage`).  Callers pass one
    explicitly (kept afterwards, caller-owned); ``None`` derives a
    UNIQUE run-scoped path under ``CB_SHARED_DIR`` (never node-local
    ``mkdtemp``; never a params-derived name two concurrent jobs on
    different datasets would collide on) and removes it when done."""
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pq

    from . import storage

    own_work_dir = work_dir is None
    if own_work_dir:
        work_dir = storage.scratch_dir("neardup", uuid.uuid4().hex)
    try:
        return _embedding_near_duplicates_body(
            ds, tau=tau, vec_col=vec_col, id_col=id_col,
            block_rows=block_rows, work_dir=work_dir,
        )
    finally:
        # uuid-named scratch is unreachable after this call — remove it
        # on the error path too, not just on success
        if own_work_dir:
            shutil.rmtree(work_dir, ignore_errors=True)


def _embedding_near_duplicates_body(
    ds: ray.data.Dataset,
    *,
    tau: float,
    vec_col: str,
    id_col: str,
    block_rows: int,
    work_dir: str,
) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    os.makedirs(work_dir, exist_ok=True)
    n = ds.count()
    n_blocks = max(1, -(-n // block_rows))

    def assign(batch: pa.Table) -> pa.Table:
        b = (
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64) % n_blocks
        ).astype(np.int32)
        return pa.table(
            {"block": pa.array(b, type=pa.int32()), id_col: batch[id_col], vec_col: batch[vec_col]}
        )

    def write_block(group: pa.Table) -> pa.Table:
        b = int(group["block"][0].as_py())
        group = group.sort_by(id_col)
        fpath = os.path.join(work_dir, f"block={b}.parquet")
        pq.write_table(group.drop_columns(["block"]), fpath + ".tmp")
        os.replace(fpath + ".tmp", fpath)
        return pa.table({"block": pa.array([b], type=pa.int32())})

    written = {
        r["block"]
        for r in ds.map_batches(assign, batch_format="pyarrow")
        .groupby("block")
        .map_groups(write_block, batch_format="pyarrow")
        .take_all()
    }
    blocks = sorted(written)
    pair_rows = [
        {"i": i, "j": j} for ai, i in enumerate(blocks) for j in blocks[ai:]
    ]
    if not pair_rows:
        return pa.Table.from_pylist([], schema=_pairs_schema())

    def score_pair(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ta = pq.read_table(os.path.join(work_dir, f"block={i}.parquet"))
            a_ids = ta[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            a_mat = _normalize(_batch_matrix(ta, vec_col))
            if i == j:
                tb_ids, tb_mat = a_ids, a_mat
            else:
                tb = pq.read_table(os.path.join(work_dir, f"block={j}.parquet"))
                tb_ids = tb[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                tb_mat = _normalize(_batch_matrix(tb, vec_col))
            out.append(_cross_pairs(a_ids, a_mat, tb_ids, tb_mat, tau, i == j))
        return pa.concat_tables(out) if out else pa.Table.from_pylist([], schema=_pairs_schema())

    cands = ray.data.from_items(pair_rows).map_batches(
        score_pair, batch_format="pyarrow", batch_size=1
    )
    return _collect_pairs(cands)


def _make_vec_side(t, id_col: str, *, vec_col: str, dim: int) -> dict:
    """(ids, normalized matrix) verification LUT — built inside a Ray
    task from the candidate slice (cb.dedup._candidate_side)."""
    if t is None:
        return {"ids": np.empty(0, dtype=np.int64),
                "mat": np.empty((0, dim), dtype=np.float64)}
    return {
        "ids": t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
        "mat": _normalize(_batch_matrix(t, vec_col)),
    }


class HyperplaneSigner:
    """Actor-pool stage: random-hyperplane sign signatures, planes
    drawn once per actor in ``__init__`` (deterministic seed)."""

    def __init__(self, dim: int, bits: int, bands: int, vec_col: str, id_col: str, seed: int = 29):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.normal(size=(bits * bands, dim))
        self.bits = bits
        self.bands = bands
        self.vec_col = vec_col
        self.id_col = id_col
        self.weights = (1 << np.arange(bits, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        signs = (mat @ self.planes.T) > 0  # (n, bits*bands)
        out_band, out_hash, out_id = [], [], []
        for b in range(self.bands):
            chunk = signs[:, b * self.bits : (b + 1) * self.bits]
            h = chunk @ self.weights  # (n,)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(h.astype(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), type=pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            }
        )


def embedding_near_duplicates_lsh(
    ds: ray.data.Dataset,
    *,
    tau: float = 0.9,
    bits: int = 8,
    bands: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int | None = 4096,
    concurrency: int = 2,
) -> pa.Table:
    """Approximate near-dup pairs via random-hyperplane LSH blocking +
    EXACT within-candidate verification: sign signatures (actor pool)
    -> band rows -> groupby(band, band_hash) -> candidate pairs ->
    exact cosine filter over the candidate-id vector slice (broadcast,
    pair-proportional).  Precision is exact (every emitted pair truly
    has cosine >= tau); recall < 1 by design and rises with ``bands``
    (P(miss) = (1 - p^bits)^bands, p = 1 - theta/pi).  The scale path
    for corpora where the exact block sweep's O(N^2) is unaffordable."""
    from functools import partial as _partial

    from . import dedup as dedup_mod

    first = ds.limit(1).take_all()
    if not first:
        return pa.Table.from_pylist([], schema=_pairs_schema())
    dim = len(first[0][vec_col])
    sigs = ds.map_batches(
        HyperplaneSigner,
        fn_constructor_kwargs={
            "dim": dim, "bits": bits, "bands": bands,
            "vec_col": vec_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    cand = sigs.groupby(["band", "band_hash"]).map_groups(
        _partial(dedup_mod._emit_pairs, max_group=max_bucket), batch_format="pandas"
    )
    pairs = dedup_mod._pair_counts(cand, "n_bands").materialize()
    lut_ref = dedup_mod._candidate_side(
        ds, dedup_mod._candidate_columns(pairs),
        _partial(_make_vec_side, vec_col=vec_col, dim=dim),
        id_col=id_col,
    )

    def verify(batch: pa.Table) -> pa.Table:
        s = ray.get(lut_ref)
        ia, ib = dedup_mod._pair_indices(batch, s["ids"])
        # one vectorized row-wise dot over the gathered matrices — no
        # per-pair Python loop
        cos = np.einsum("ij,ij->i", s["mat"][ia], s["mat"][ib])
        keep = cos >= tau
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
                "cosine": pa.array(cos[keep], type=pa.float64()),
            }
        )

    out = pairs.map_batches(verify, batch_format="pyarrow")
    return _collect_pairs(out)
