import hashlib

import numpy as np
import pyarrow as pa

from cb import corpus


def test_deterministic_and_sliceable():
    full = corpus.generate_corpus(30, seed=42)
    again = corpus.generate_corpus(30, seed=42)
    assert full.equals(again)
    sl = corpus.generate_corpus_slice(10, 5, seed=42)
    assert sl.equals(full.slice(10, 5))


def test_schema_and_edge_docs():
    t = corpus.generate_corpus(20, seed=42)
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    assert all(pa.types.is_string(f.type) for f in t.schema)
    contents = t.column("content").to_pylist()
    assert contents[: len(corpus.EDGE_CONTENTS)] == corpus.EDGE_CONTENTS
    # skew: 'import'/'use' style keyword line in most non-edge docs
    sizes = [len(c) for c in contents[len(corpus.EDGE_CONTENTS):]]
    assert min(sizes) >= 200


def test_identity_columns():
    t = corpus.generate_corpus(10, seed=42)
    out = corpus.with_identity(t)
    ids = out.column("doc_id").to_pylist()
    assert len(set(ids)) == 10
    for row in out.to_pylist():
        h = hashlib.sha256(
            f"{row['repo']}\x00{row['path']}\x00{row['commit']}".encode()
        ).digest()
        assert row["doc_id"] == int.from_bytes(h[:8], "big") & 0x7FFFFFFFFFFFFFFF
        assert row["content_sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_ids_independent_of_batching():
    t = corpus.generate_corpus(10, seed=42)
    whole = corpus.doc_ids_from_keys(t["repo"], t["path"], t["commit"])
    parts = [
        corpus.doc_ids_from_keys(
            t.slice(i, 5)["repo"], t.slice(i, 5)["path"], t.slice(i, 5)["commit"]
        )
        for i in (0, 5)
    ]
    assert np.array_equal(whole, np.concatenate(parts))
