"""ES ``_reindex`` (cb.build.reindex): rebuild a new index from the
source index's OWN document store (docmeta text column), no corpus
access.  Contracts:

- same-analyzer reindex reproduces the direct build's rankings,
  scores, phrase results, and global stats BITWISE;
- tombstoned docs are dropped in-stream — reindex == a fresh build
  over the survivors, with zero tombstones in the new index
  (the physical-delete path, same contract compaction proves);
- honest errors when the doc store is missing or text-less.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import build, docmeta, shard

_WORDS = ["merge", "sort", "hash", "join", "table", "scan", "window",
          "group", "order", "stream"] + [f"tok{i:02d}" for i in range(30)]


def _mk_corpus(path: str, n: int, seed: int = 5, drop: set | None = None):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        text = " ".join(
            _WORDS[int(rng.integers(len(_WORDS)))]
            for _ in range(int(rng.integers(6, 30)))
        )
        rows.append({"doc_id": 3000 + i, "text": text})
    if drop:
        rows = [r for r in rows if r["doc_id"] not in drop]
    pq.write_table(pa.Table.from_pylist(rows), path)


_QS = ["merge sort", "hash join", "tok03 window", "table scan group"]


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("reindex")
    src_corpus = str(d / "docs.parquet")
    _mk_corpus(src_corpus, n=250)
    idx = str(d / "idx")
    build.build_index(
        src_corpus, idx, text_col="text", id_col="doc_id", num_parts=4
    )
    docmeta.ensure_docmeta(idx, src_corpus, ["text"])
    return str(d), src_corpus, idx


def test_reindex_reproduces_direct_build(built):
    d, _, idx = built
    dst = os.path.join(d, "re")
    meta = build.reindex(idx, dst)
    a = shard.LocalSearcher(idx)
    b = shard.LocalSearcher(dst)
    for q in _QS:
        assert b.query(q, k=20, algo="taat") == a.query(q, k=20, algo="taat"), q
        assert b.phrase_query(q, k=20) == a.phrase_query(q, k=20), q
    ga, gb = build.IndexMeta(idx), meta
    assert (gb.n_docs, gb.avgdl) == (ga.n_docs, ga.avgdl)


def test_reindex_makes_deletes_physical(built, tmp_path):
    d, src_corpus, idx = built
    victims = [3003, 3017, 3042, 3100]
    # tombstone in a COPY of the source index (module fixture stays clean)
    import shutil

    idx2 = str(tmp_path / "idx2")
    shutil.copytree(idx, idx2)
    shard.delete_docs(idx2, victims)
    dst = str(tmp_path / "re2")
    meta = build.reindex(idx2, dst)
    assert len(shard.load_tombstones(dst)) == 0
    assert meta.n_docs == build.IndexMeta(idx).n_docs - len(victims)
    # == a fresh build over the survivors
    surv_corpus = str(tmp_path / "surv.parquet")
    _mk_corpus(surv_corpus, n=250, drop=set(victims))
    fresh_dir = str(tmp_path / "fresh")
    build.build_index(
        surv_corpus, fresh_dir, text_col="text", id_col="doc_id", num_parts=4
    )
    b, f = shard.LocalSearcher(dst), shard.LocalSearcher(fresh_dir)
    for q in _QS:
        assert b.query(q, k=30, algo="taat") == f.query(q, k=30, algo="taat"), q


def test_reindex_requires_doc_store_with_text(built, tmp_path):
    d, src_corpus, idx = built
    bare = str(tmp_path / "bare")
    build.build_index(
        src_corpus, bare, text_col="text", id_col="doc_id", num_parts=2
    )
    with pytest.raises(ValueError, match="document store"):
        build.reindex(bare, str(tmp_path / "out"))
    docmeta.ensure_docmeta(bare, src_corpus, [])
    with pytest.raises(ValueError, match="text column"):
        build.reindex(bare, str(tmp_path / "out"))
