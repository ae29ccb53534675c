"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each ``map_batches`` task does one numpy
  matmul per batch and emits only its per-batch top-k candidates, the
  driver merges the tiny candidate set.  The per-batch top-k is the
  combiner that keeps the merge O(batches * Q * k), never O(N).
- :func:`ivf_topk` — the scale path: deterministic coarse centroids,
  vectors bucketed by nearest centroid (one groupby-shaped pass), a
  query probes only ``nprobe`` buckets.  Approximate -> rows-only
  oracle check.
- :func:`embedding_near_duplicates` — cosine >= tau near-dup pairs via
  the same broadcast pattern.
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


class BruteForceScorer:
    """Actor-pool stage: query matrix fetched once per actor."""

    def __init__(self, query, k: int, vec_col: str, id_col: str):
        # ``query`` may be a plain dict (small query sets, shipped in the
        # actor ctor) or an ObjectRef from ray.put (large query matrices,
        # fetched once per actor from the shared object store).
        q = ray.get(query) if isinstance(query, ray.ObjectRef) else query
        self.qmat = _normalize(np.asarray(q["mat"]))
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
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


def brute_force_topk(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> pa.Table:
    """-> (query_id, rank, vec_id, sim): exact cosine top-k per query.

    NOTE: size ``concurrency`` strictly below the session CPU count —
    an actor pool that reserves every CPU starves the read tasks and
    the pipeline deadlocks."""
    query = {"mat": np.asarray(query_mat), "ids": np.asarray(query_ids)}
    cands = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={
            "query": query,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    cand_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )
    tbl = pa.Table.from_pylist(cands.take_all(), schema=cand_schema)  # tiny: batches * Q * k
    out = {"query_id": [], "rank": [], "vec_id": [], "sim": []}
    import pandas as pd

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
) -> pa.Table:
    """IVF-style approximate top-k: centroids = first ``n_centroids``
    vectors (deterministic), vectors assigned to nearest centroid,
    queries probe ``nprobe`` nearest buckets.  Same output schema as
    :func:`brute_force_topk`; recall < 1 by design (scale path)."""
    first = ds.limit(n_centroids).take_all()
    cents = _normalize(np.array([r[vec_col] for r in first]))
    cents_ref = ray.put(cents)
    query_ref = ray.put({"mat": np.asarray(query_mat), "ids": np.asarray(query_ids)})

    class ProbeScorer:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            q = ray.get(query_ref)
            self.qmat = _normalize(np.asarray(q["mat"]))
            self.qids = np.asarray(q["ids"], dtype=np.int64)
            # per query: set of probed buckets
            qsims = self.qmat @ self.cents.T
            self.probe = np.argsort(-qsims, axis=1)[:, :nprobe]

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            assign = np.argmax(mat @ self.cents.T, axis=1)
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
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "sim": pa.array([], type=pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
                }
            )

    cands = ds.map_batches(ProbeScorer, batch_format="pyarrow", concurrency=2)
    import pandas as pd

    cand_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
    )
    df = pa.Table.from_pylist(cands.take_all(), schema=cand_schema).to_pandas()
    rows = {"query_id": [], "rank": [], "vec_id": [], "sim": []}
    if len(df):
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
            rows["query_id"].extend([qid] * len(g))
            rows["rank"].extend(range(1, len(g) + 1))
            rows["vec_id"].extend(g["vec_id"].tolist())
            rows["sim"].extend(g["sim"].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int64()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "sim": pa.array(rows["sim"], type=pa.float64()),
        }
    )


def embedding_near_duplicates(
    ds: ray.data.Dataset,
    *,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine near-dup pairs (>= tau, a < b).  Broadcast the full
    normalized matrix (sandbox scale); the 100TB path is LSH-bucketed
    blocking (random-hyperplane signs) + within-bucket verify."""
    all_rows = ds.take_all()
    ids = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _normalize(np.array([all_rows[i][vec_col] for i in order]))
    ref = ray.put({"ids": ids, "mat": mat})

    def pairs(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        bmat = _normalize(_batch_matrix(batch, vec_col))
        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = bmat @ side["mat"].T
        out_a, out_b, out_s = [], [], []
        for i in range(len(bids)):
            mask = (sims[i] >= tau) & (side["ids"] > bids[i])
            for j in np.flatnonzero(mask):
                out_a.append(bids[i])
                out_b.append(int(side["ids"][j]))
                out_s.append(float(sims[i, j]))
        return pa.table(
            {
                "vec_a": pa.array(out_a, type=pa.int64()),
                "vec_b": pa.array(out_b, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())]
    )
    return pa.Table.from_pylist(
        ds.map_batches(pairs, batch_format="pyarrow").take_all(), schema=schema
    )
