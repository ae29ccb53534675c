"""Shared-storage contract enforced against a FAKE MULTI-NODE cluster
(`ray.cluster_utils.Cluster`, 2 raylets in one box): the subprocess —
the pytest session keeps its own single-node Ray — proves

  1. `cb.storage.scratch_dir` RAISES when CB_SHARED_DIR is unset on a
     >1-node cluster (the node-local default is the module's one
     silent failure mode) and works once it's set;
  2. a small index build, an embedding-near-dup block-spill sweep, and
     a full-probe IVF search all run to completion on two nodes with
     every inter-stage file under CB_SHARED_DIR, with results equal to
     the single-node run (build compared BYTE-for-byte).

Both raylets share one filesystem here, so reachability itself can't
fail in-sandbox — the guard (1) is the enforced invariant, (2) pins
that every stage goes through the contract path and stays correct
under multi-node scheduling."""

import hashlib
import os
import subprocess
import sys
import textwrap

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from cb import ann, corpus as corpus_mod
from cb.build import build_index

_SCRIPT = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("RAY_ADDRESS", None)
    os.environ.pop("CB_SHARED_DIR", None)
    shared, corpus_dir, idx_dir, emb_path, pairs_out, ivf_out = sys.argv[1:7]

    from ray.cluster_utils import Cluster
    import ray
    c = Cluster(initialize_head=True, head_node_args={"num_cpus": 3})
    c.add_node(num_cpus=3)
    ray.init(address=c.address, include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    assert alive == 2, f"expected 2 alive nodes, got {alive}"

    from cb import storage
    try:
        storage.scratch_dir("probe", "x")
        raise SystemExit("guard did not raise on a 2-node cluster")
    except RuntimeError as e:
        assert "CB_SHARED_DIR" in str(e), e
    os.environ["CB_SHARED_DIR"] = shared
    assert storage.scratch_dir("probe", "x").startswith(shared)
    print("GUARD_OK", flush=True)

    import numpy as np
    import pyarrow.parquet as pq
    from cb import ann
    from cb.build import build_index

    build_index(corpus_dir, idx_dir, num_parts=4)
    emb = ray.data.read_parquet(emb_path)
    # work_dir derived via scratch_dir -> under CB_SHARED_DIR
    pairs = ann.embedding_near_duplicates(emb, tau=0.45, block_rows=128)
    pq.write_table(pairs, pairs_out)

    t = pq.read_table(emb_path)
    ids = np.sort(t["vec_id"].to_numpy(zero_copy_only=False))[:5]
    sel = t.filter(__import__("pyarrow").compute.is_in(t["vec_id"],
                   value_set=__import__("pyarrow").array(ids)))
    order = np.argsort(sel["vec_id"].to_numpy(zero_copy_only=False))
    qmat = np.array(sel["embedding"].to_pylist(), dtype=np.float64)[order]
    topk = ann.ivf_topk(
        ray.data.read_parquet(emb_path), qmat, ids, k=10,
        n_centroids=4, nprobe=4, index_dir=os.path.join(shared, "ivf"),
    )
    pq.write_table(topk, ivf_out)
    print("E2E_OK", flush=True)
    ray.shutdown()
    c.shutdown()
    """
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _parquet_shas(index_dir):
    out = {}
    for root, _, files in os.walk(index_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                    fh.read()
                ).hexdigest()
    return out


@pytest.mark.skipif(not os.path.exists(EMB), reason="testdata missing")
def test_two_node_guard_and_pipeline(tmp_path, ray_session):
    corpus_dir = str(tmp_path / "corpus")
    corpus_mod.write_corpus(corpus_dir, 150, seed=7, n_files=4)
    shared = str(tmp_path / "shared")
    os.makedirs(shared)
    script = tmp_path / "two_node.py"
    script.write_text(_SCRIPT)
    idx_b = str(tmp_path / "idx_twonode")
    pairs_out = str(tmp_path / "pairs.parquet")
    ivf_out = str(tmp_path / "ivf.parquet")

    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), shared, corpus_dir, idx_b, EMB,
         pairs_out, ivf_out],
        env=env, cwd=repo_root, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "GUARD_OK" in proc.stdout and "E2E_OK" in proc.stdout

    # every spill/index file the 2-node run wrote lives under the
    # shared root (or the explicitly-passed idx/out paths)
    assert os.path.isdir(os.path.join(shared, "ivf"))

    # single-node reference build: byte-identical payload files
    idx_a = str(tmp_path / "idx_single")
    build_index(corpus_dir, idx_a, num_parts=4)
    fa, fb = _parquet_shas(idx_a), _parquet_shas(idx_b)
    assert fa.keys() == fb.keys()
    assert fa == fb, [k for k in fa if fa[k] != fb[k]]

    # near-dup pairs equal the single-node sweep
    ref_pairs = ann.embedding_near_duplicates(
        ray.data.read_parquet(EMB), tau=0.45, block_rows=128,
        work_dir=str(tmp_path / "wd_single"),
    )
    got_pairs = pq.read_table(pairs_out)
    assert sorted(map(tuple, got_pairs.to_pandas().values.tolist())) == sorted(
        map(tuple, ref_pairs.to_pandas().values.tolist())
    )

    # full-probe IVF (nprobe == n_centroids) is exact -> equals the
    # single-node brute-force table
    t = pq.read_table(EMB)
    ids = np.sort(t["vec_id"].to_numpy(zero_copy_only=False))[:5]
    import pyarrow as pa
    import pyarrow.compute as pc

    sel = t.filter(pc.is_in(t["vec_id"], value_set=pa.array(ids)))
    order = np.argsort(sel["vec_id"].to_numpy(zero_copy_only=False))
    qmat = np.array(sel["embedding"].to_pylist(), dtype=np.float64)[order]
    # compare (query_id, rank, vec_id) like the ann_ivf_exact entry:
    # scores can differ in the last ULP between the bucketed and the
    # single-matmul summation orders
    cols = ["query_id", "rank", "vec_id"]
    ref_topk = ann.brute_force_topk(
        ray.data.read_parquet(EMB), qmat, ids, k=10
    ).to_pandas()[cols]
    got_topk = pq.read_table(ivf_out).to_pandas()[cols]
    key = ["query_id", "rank"]
    assert (
        got_topk.sort_values(key).reset_index(drop=True).values.tolist()
        == ref_topk.sort_values(key).reset_index(drop=True).values.tolist()
    )
