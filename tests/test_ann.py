"""ANN operators: exact brute force, bucketed IVF (recall + layout),
tie-break determinism."""

import numpy as np
import pytest
import ray

from cb import ann


def _clustered(n_per=60, n_clusters=8, dim=32, seed=5):
    """Deterministic clustered vectors (unit-ish): cluster center + small
    noise, so k-means recovers the structure and IVF recall is high."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(n_per):
            v = centers[c] + 0.15 * rng.normal(size=dim)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            vid += 1
    return rows


def _reference_topk(rows, qmat, qids, k):
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    q = np.asarray(qmat, dtype=np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ mat.T
    out = {}
    for i, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[i]))[:k]
        out[int(qid)] = [int(ids[j]) for j in order]
    return out


def test_brute_force_exact():
    rows = _clustered()
    ds = ray.data.from_items(rows)
    qmat = np.array([rows[0]["embedding"], rows[100]["embedding"]])
    qids = np.array([0, 100])
    got = ann.brute_force_topk(ds, qmat, qids, k=10)
    ref = _reference_topk(rows, qmat, qids, 10)
    by_q = {}
    for r in got.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == ref


def test_brute_force_keeps_kth_boundary_ties():
    """Duplicate vectors tie at the kth boundary; the per-batch top-k
    must keep all of them so the global (sim DESC, id ASC) tie-break is
    exact (ADVICE round 1)."""
    base = np.zeros(8)
    base[0] = 1.0
    rows = [{"vec_id": i, "embedding": base.tolist()} for i in range(30)]
    ds = ray.data.from_items(rows).repartition(5)  # force multiple batches
    got = ann.brute_force_topk(ds, np.array([base]), np.array([0]), k=10)
    assert [r["vec_id"] for r in got.to_pylist()] == list(range(10))


def test_ivf_layout_and_recall(tmp_path):
    rows = _clustered()
    ds = ray.data.from_items(rows)
    idx = str(tmp_path / "ivf")
    meta = ann.build_ivf(ds, idx, n_centroids=8, sample_size=480, iters=10)
    assert meta["n_centroids"] == 8
    assert sum(meta["buckets"].values()) == len(rows)
    import os

    bucket_files = [f for f in os.listdir(idx) if f.startswith("bucket=")]
    assert len(bucket_files) == len(meta["buckets"])  # one file per cell

    qsel = [0, 75, 190, 305, 420]
    qmat = np.array([rows[i]["embedding"] for i in qsel])
    qids = np.array([rows[i]["vec_id"] for i in qsel])
    got = ann.ivf_search(idx, qmat, qids, k=10, nprobe=2)
    ref = _reference_topk(rows, qmat, qids, 10)
    hits = total = 0
    by_q = {}
    for r in got.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for qid, want in ref.items():
        have = set(by_q.get(qid, []))
        hits += len(have & set(want))
        total += len(want)
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall}"


def test_ivf_probe_reads_subset(tmp_path):
    """A single query with nprobe=1 must read exactly one bucket file
    (probing saves I/O, not just flops)."""
    rows = _clustered()
    ds = ray.data.from_items(rows)
    idx = str(tmp_path / "ivf")
    ann.build_ivf(ds, idx, n_centroids=8, sample_size=480)
    cents = np.load(f"{idx}/centroids.npy")
    q = np.array([rows[0]["embedding"]], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :1]
    # remove every bucket EXCEPT the probed one: search must still work,
    # proving unprobed buckets are never opened
    import os

    keep = f"bucket={int(probe[0][0])}.parquet"
    for f in list(os.listdir(idx)):
        if f.startswith("bucket=") and f != keep:
            os.remove(os.path.join(idx, f))
    got = ann.ivf_search(idx, q, np.array([0]), k=5, nprobe=1)
    assert got.num_rows == 5


def _reference_pairs(rows, tau):
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= tau:
                out.add((int(ids[i]), int(ids[j])))
    return out


def _neardup_corpus(seed=11):
    """120 spread vectors + 15 planted near-dup pairs (tiny noise)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(120):
        v = rng.normal(size=24)
        rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
    for p in range(15):
        base = np.asarray(rows[p * 3]["embedding"])
        near = base + 0.02 * rng.normal(size=24)
        rows.append({"vec_id": 1000 + p, "embedding": near.tolist()})
    return rows


def test_embedding_neardup_exact_block_sweep():
    rows = _neardup_corpus()
    ds = ray.data.from_items(rows)
    got = ann.embedding_near_duplicates(ds, tau=0.95, block_rows=40)
    ref = _reference_pairs(rows, 0.95)
    assert {(r["vec_a"], r["vec_b"]) for r in got.to_pylist()} == ref
    assert len(ref) >= 15  # the planted pairs exist


def test_embedding_neardup_lsh_recall_and_precision():
    rows = _neardup_corpus()
    ds = ray.data.from_items(rows)
    got = ann.embedding_near_duplicates_lsh(ds, tau=0.95, bits=8, bands=16)
    ref = _reference_pairs(rows, 0.95)
    got_pairs = {(r["vec_a"], r["vec_b"]) for r in got.to_pylist()}
    assert got_pairs <= ref  # exact verify => precision 1
    recall = len(got_pairs & ref) / len(ref)
    assert recall >= 0.9, f"LSH recall = {recall}"
    # every emitted cosine really is >= tau
    assert all(r["cosine"] >= 0.95 for r in got.to_pylist())


def test_kmeans_deterministic():
    rng = np.random.Generator(np.random.PCG64(1))
    m = rng.normal(size=(100, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    a = ann._kmeans(m, 4)
    b = ann._kmeans(m, 4)
    assert np.array_equal(a, b)


def test_embedding_neardup_explicit_work_dir(tmp_path):
    """The block spill lands where the caller says (shared-storage
    contract, cb.storage) and the result is identical to the derived
    default path."""
    rows = _neardup_corpus()
    ds = ray.data.from_items(rows)
    wd = str(tmp_path / "neardup_wd")
    got = ann.embedding_near_duplicates(ds, tau=0.95, block_rows=40, work_dir=wd)
    ref = _reference_pairs(rows, 0.95)
    assert {(r["vec_a"], r["vec_b"]) for r in got.to_pylist()} == ref
    import os

    assert any(f.startswith("block=") for f in os.listdir(wd))


def test_ivf_topk_requires_index_dir():
    """No node-local mkdtemp default: an explicit shared-storage dir is
    part of the API contract (a reused meta.json must be caller-owned)."""
    ds = ray.data.from_items(_neardup_corpus()[:50])
    with pytest.raises(ValueError, match="shared storage"):
        ann.ivf_topk(ds, np.zeros((1, 24)), np.array([0]), index_dir=None)


def test_scratch_dir_deterministic(tmp_path, monkeypatch):
    from cb import storage

    monkeypatch.setenv(storage.ENV_VAR, str(tmp_path / "root"))
    a = storage.scratch_dir("kind", "key1")
    b = storage.scratch_dir("kind", "key1")
    c = storage.scratch_dir("kind", "key2")
    assert a == b != c
    assert a.startswith(str(tmp_path / "root"))
    import os

    assert os.path.isdir(a) and os.path.isdir(c)


def test_assign_clusters_brute_parity():
    """Nearest-centroid assignment == the numpy argmax over normalized
    cosine, with the (sim DESC, cid ASC) tie-break; centroid ids must
    be strictly ascending (the tie-break precondition)."""
    rng = np.random.Generator(np.random.PCG64(3))
    mat = rng.normal(size=(200, 16))
    ids = np.arange(7000, 7200, dtype=np.int64)
    cents = mat[:6].copy()
    cids = ids[:6]
    ds = ray.data.from_items(
        [{"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, mat)]
    )
    got = dict(
        (r["vec_id"], r["cluster"])
        for r in ann.assign_clusters(ds, cents, cids).take_all()
    )

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    want = cids[np.argmax(norm(mat) @ norm(cents).T, axis=1)]
    assert [got[int(i)] for i in ids] == list(want)
    with pytest.raises(ValueError, match="ascending"):
        ann.assign_clusters(ds, cents, cids[::-1]).take_all()


def test_brute_force_allow_ids_filter():
    """Filtered vector search == brute force over the pre-restricted
    corpus; empty allow set -> no rows; unsorted allow set rejected."""
    rng = np.random.Generator(np.random.PCG64(9))
    mat = rng.normal(size=(120, 12))
    ids = np.arange(4000, 4120, dtype=np.int64)
    rows = [
        {"vec_id": int(i), "embedding": v.tolist()} for i, v in zip(ids, mat)
    ]
    qmat, qids = mat[:3], ids[:3]
    allow = np.sort(ids[::3])
    ds = ray.data.from_items(rows)
    got = ann.brute_force_topk(ds, qmat, qids, k=7, allow_ids=allow)
    sub = ray.data.from_items([r for r in rows if r["vec_id"] in set(allow.tolist())])
    want = ann.brute_force_topk(sub, qmat, qids, k=7)
    assert got.to_pylist() == want.to_pylist()
    empty = ann.brute_force_topk(
        ds, qmat, qids, k=7, allow_ids=np.array([], dtype=np.int64)
    )
    assert empty.num_rows == 0
    with pytest.raises(ValueError, match="sorted"):
        ann.brute_force_topk(ds, qmat, qids, k=7, allow_ids=allow[::-1])
