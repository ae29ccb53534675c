"""Dedup operators over a corpus with planted exact and near duplicates."""

import numpy as np
import pytest
import ray

from cb import analyze, dedup

BASE = (
    "def loadIndexShard(path, block):\n"
    "    data = readFile(path)\n"
    "    for row in parseRows(data):\n"
    "        emit(row.key, row.value)\n"
    "    return buildPostings(data, block)\n"
)
NEAR = BASE.replace("buildPostings", "buildPostingLists")  # one-token edit
OTHER = "completely different text about quantum zebras dancing slowly tonight " * 3


def _ds():
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},          # exact dup of 1
        {"doc_id": 3, "text": NEAR},           # near dup of 1
        {"doc_id": 4, "text": OTHER},
        {"doc_id": 5, "text": OTHER + " extra"},  # near dup of 4
        {"doc_id": 6, "text": "tiny"},
    ]
    return ray.data.from_items(rows)


def test_exact_duplicates():
    out = {r["keep_doc_id"]: r["n_docs"] for r in dedup.exact_duplicates(_ds()).take_all()}
    assert out[1] == 2  # docs 1+2 collapse
    assert out[3] == 1 and out[4] == 1


def test_minhash_signature_properties():
    a, b = dedup._hash_params(128)
    s1 = dedup.shingle_set(analyze.tokenize(BASE))
    s2 = dedup.shingle_set(analyze.tokenize(NEAR))
    sig1 = dedup.minhash_signature(dedup._shingle_hashes(s1), a, b)
    sig2 = dedup.minhash_signature(dedup._shingle_hashes(s2), a, b)
    est = float(np.mean(sig1 == sig2))
    true_j = len(set(s1) & set(s2)) / len(set(s1) | set(s2))
    assert abs(est - true_j) < 0.25
    assert est > 0.5  # near-dups really do collide
    # deterministic
    again = dedup.minhash_signature(dedup._shingle_hashes(s1), a, b)
    assert np.array_equal(sig1, again)


def test_minhash_near_duplicates_pipeline():
    pairs = dedup.minhash_near_duplicates(_ds(), threshold=0.5, concurrency=2).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got  # exact dups trivially near
    assert (1, 3) in got or (2, 3) in got  # near dup found
    assert not any({a, b} == {4, 6} for a, b in got)


def test_minhash_stage_matches_scalar_reference():
    """The vectorized MinHashStage (Arrow shingling + reduceat minima)
    is bit-identical to the scalar per-doc path
    shingle_set -> _shingle_hashes -> minhash_signature, including
    empty / shorter-than-n docs (all-max sentinel) and in-doc
    duplicate shingles (min-hash is duplicate-insensitive)."""
    import pyarrow as pa

    stage = dedup.MinHashStage(num_hashes=32, shingle_n=3)
    texts = [BASE, NEAR, OTHER, "tiny", "", "a b c", "a b",
             "rep rep rep rep rep", OTHER + " " + OTHER]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = stage(batch)
    for i, t in enumerate(texts):
        ref = dedup.minhash_signature(
            dedup._shingle_hashes(dedup.shingle_set(analyze.tokenize(t), 3)),
            stage.a,
            stage.b,
        ).astype(np.int64)
        got = np.asarray(out["minhash"][i].as_py(), dtype=np.int64)
        assert np.array_equal(got, ref), t


def test_simhash_stage_matches_scalar_reference():
    """Vectorized simhash_stage == simhash64(tokenize(t)) per doc,
    including empty docs and repeated tokens (weighted votes)."""
    import pyarrow as pa

    texts = [BASE, NEAR, OTHER, "", "x", "a a a b", "tiny"]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = dedup.simhash_stage(batch)
    for i, t in enumerate(texts):
        ref = dedup.simhash64(analyze.tokenize(t))
        got = out["simhash"][i].as_py() & ((1 << 64) - 1)
        assert got == ref, t


def test_band_rows_bucket_property():
    """Equal band values always share a band_hash; a single differing
    band changes only that band's hash."""
    import pyarrow as pa

    H, bands, rpb = 8, 4, 2
    sig = list(range(100, 100 + H))
    sig2 = list(sig)
    sig2[5] += 1  # perturb band 2 only
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "minhash": pa.array([sig, sig, sig2], type=pa.list_(pa.int64())),
            "n_shingles": pa.array([4, 4, 4], type=pa.int64()),
        }
    )
    rows = dedup._band_rows(batch, bands=bands, rows_per_band=rpb).to_pylist()
    key = {(r["doc_id"], r["band"]): r["band_hash"] for r in rows}
    for bnd in range(bands):
        assert key[(1, bnd)] == key[(2, bnd)]
        if bnd == 2:
            assert key[(3, bnd)] != key[(1, bnd)]
        else:
            assert key[(3, bnd)] == key[(1, bnd)]
    # distinct bands of the same signature do not trivially collide
    assert len({key[(1, b)] for b in range(bands)}) == bands


def test_simhash_near_duplicates():
    pairs = dedup.simhash_near_duplicates(_ds(), max_hamming=6).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got
    hamming = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert hamming[(1, 2)] == 0


def test_ngram_jaccard_exact_values():
    out = dedup.ngram_jaccard_pairs(_ds(), threshold=0.2).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    s1 = set(dedup.shingle_set(analyze.tokenize(BASE)))
    s3 = set(dedup.shingle_set(analyze.tokenize(NEAR)))
    expect = len(s1 & s3) / len(s1 | s3)
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == expect


def test_hot_bucket_cap_bounds_degenerate_corpus():
    """Every doc shares one hot shingle: without a cap that one group
    emits O(n^2) pairs; with max_df the hot group is dropped while pairs
    blocked by their OTHER (distinctive) shingles survive."""
    hot = "alpha beta gamma "  # one shared trigram across all docs
    rows = [
        {"doc_id": i, "text": hot + f"unique{i} filler{i} token{i} pad{i}"}
        for i in range(300)
    ]
    # two docs sharing distinctive shingles beyond the hot one
    rows.append({"doc_id": 900, "text": hot + "special marker sequence here now"})
    rows.append({"doc_id": 901, "text": hot + "special marker sequence here later"})
    ds = ray.data.from_items(rows)
    out = dedup.ngram_jaccard_pairs(ds, threshold=0.2, max_df=50).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (900, 901) in got  # blocked via 'special marker sequence' shingles
    # the 300 hot-only docs pair ONLY through the dropped hot shingle
    assert not any(a < 300 and b < 300 for a, b in got)


def test_verification_state_is_candidate_proportional(monkeypatch):
    """The round-1 scale-killer was corpus-sized driver lookup tables in
    near-dup verification.  Verification now filters the signature
    dataset down to CANDIDATE ids in the dataflow; this test spies on
    the slice and asserts its size tracks candidates, not the corpus."""
    slices = []
    real = dedup._candidate_side

    def spy(ds, ids, make, id_col="doc_id"):
        # the LUT itself is assembled in a Ray task (only an ObjectRef
        # reaches the driver); the driver-side footprint is the
        # candidate id array — that is what must track candidates
        slices.append(len(ids))
        return real(ds, ids, make, id_col=id_col)

    monkeypatch.setattr(dedup, "_candidate_side", spy)
    # 200 unrelated docs + one near-dup pair -> candidates ~2 docs
    rows = [
        {"doc_id": i, "text": f"totally unique document {i} with words w{i} x{i} y{i} z{i}"}
        for i in range(200)
    ]
    rows.append({"doc_id": 900, "text": "shared shingle run alpha beta gamma delta one"})
    rows.append({"doc_id": 901, "text": "shared shingle run alpha beta gamma delta two"})
    ds = ray.data.from_items(rows)
    pairs = dedup.minhash_near_duplicates(ds, threshold=0.5, concurrency=2).take_all()
    assert any({r["doc_a"], r["doc_b"]} == {900, 901} for r in pairs)
    assert slices, "verification did not go through the candidate slice"
    # corpus is 202 docs; the slice must be FAR smaller (candidates only)
    assert max(slices) <= 20, f"slice sizes {slices} look corpus-sized"


def test_emit_pairs_cap_and_vectorized():
    import pandas as pd

    g = pd.DataFrame({"doc_id": [3, 1, 2, 1]})
    out = dedup._emit_pairs(g)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2), (1, 3), (2, 3)]
    assert dedup._emit_pairs(g, max_group=2).empty


def test_cluster_pairs_components():
    """Connected components over a pair list: chain + triangle + isolated
    pair, reps = component minima; matches a union-find reference."""
    import pyarrow as pa

    pairs = pa.table(
        {
            # chain 1-2-3-4, triangle 10-11-12 (one redundant edge),
            # pair 20-21
            "doc_a": [1, 2, 3, 10, 11, 10, 20],
            "doc_b": [2, 3, 4, 11, 12, 12, 21],
        }
    )
    ds = ray.data.from_arrow(pairs)
    out = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.cluster_pairs(ds).take_all()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cluster_pairs_empty():
    import pyarrow as pa

    ds = ray.data.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64())}))
    assert dedup.cluster_pairs(ds).take_all() == []

def test_sql_cluster_pairs_structural_split():
    """The pair-SQL wrapper must split on the TOP-LEVEL final SELECT
    and strip only a trailing top-level ORDER BY — a final SELECT
    containing a newline-prefixed subquery with its own ORDER BY (and
    no newline before the outer SELECT) must not be mis-sliced."""
    import duckdb

    from cb.dedup import sql_cluster_pairs

    tricky = (
        "WITH p AS (SELECT 1 AS doc_a, 2 AS doc_b UNION ALL SELECT 2, 3)"
        " SELECT doc_a, doc_b FROM p WHERE doc_a IN (\nSELECT doc_a FROM p"
        " WHERE 'SELECT (' != ')order by' ORDER BY doc_a\n) ORDER BY doc_a, doc_b"
    )
    out = duckdb.sql(sql_cluster_pairs(tricky)).fetchall()
    # {1,2,3} is one cluster with rep 1
    assert out == [(1, 1), (2, 1), (3, 1)]


def test_sql_cluster_pairs_line_comments():
    """'--' line comments may contain quotes or unbalanced parens —
    the structural scan must skip them, not enter string mode."""
    import duckdb

    from cb.dedup import sql_cluster_pairs

    tricky = (
        "WITH p AS (SELECT 1 AS doc_a, 2 AS doc_b) -- don't ((reorder\n"
        "SELECT doc_a, doc_b FROM p -- trailing 'comment )\n"
        "ORDER BY doc_a"
    )
    out = duckdb.sql(sql_cluster_pairs(tricky)).fetchall()
    assert out == [(1, 1), (2, 1)]
