import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cb import compress, scoring


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(compress.varint_decode(compress.varint_encode(v), len(v)), v)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500, unique=True
    )
)
def test_ids_roundtrip(ids):
    ids = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(compress.decode_ids(compress.encode_ids(ids), len(ids)), ids)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_postings_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=700))
    rng = np.random.Generator(np.random.PCG64(data.draw(st.integers(0, 2**32))))
    ids = np.sort(rng.choice(2**40, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    row = compress.encode_postings("t", ids, tfs, dls, avgdl=250.0)
    pl = compress.PostingList(row)
    got_ids, got_tfs, got_dls = pl.decode_all()
    assert np.array_equal(got_ids, ids)
    assert np.array_equal(got_tfs, tfs)
    assert np.array_equal(got_dls, dls)
    assert pl.df == n and pl.cf == tfs.sum()
    # deferred-umax path (single-pass build) annotates identically
    deferred = compress.encode_postings("t", ids, tfs, dls, avgdl=None)
    assert deferred["block_umax"] == []
    assert compress.annotate_umax(deferred, 250.0)["block_umax"] == row["block_umax"]
    # block maxes are true upper bounds of exact per-posting u factors
    u = scoring.u_factor(tfs, dls, 250.0)
    for b in range(pl.n_blocks):
        s, e = b * compress.BLOCK, min((b + 1) * compress.BLOCK, n)
        assert pl.umax[b] == np.max(u[s:e])
        assert pl.last_ids[b] == ids[e - 1]


def test_empty():
    assert len(compress.varint_encode(np.empty(0, dtype=np.uint64))) == 0
    assert len(compress.varint_decode(b"")) == 0


def test_partition_encode_matches_per_row_reference():
    """The whole-partition vectorized encoder must produce a table
    EQUAL (values and blob bytes) to per-row encode_postings calls."""
    import numpy as np
    import pyarrow as pa

    from cb import build, compress

    rng = np.random.Generator(np.random.PCG64(17))
    # synthetic sorted flat arrays: 40 (term,bucket) rows, ragged sizes
    rows = []
    for code in range(12):
        for bucket in sorted(rng.choice(8, size=int(rng.integers(1, 4)), replace=False)):
            df = int(rng.integers(1, 400))
            ids = np.sort(rng.choice(10**6, size=df, replace=False)) + (bucket << 40)
            tfs = rng.integers(1, 5, size=df)
            dls = rng.integers(1, 300, size=df)
            poss = []
            for tf in tfs:
                poss.extend(sorted(rng.choice(1000, size=tf, replace=False)))
            rows.append((code, bucket, ids, tfs, dls, np.array(poss)))
    codes = np.concatenate([[c] * len(i) for c, _, i, _, _, _ in rows]).astype(np.int64)
    buckets = np.concatenate([[b] * len(i) for _, b, i, _, _, _ in rows]).astype(np.int32)
    flat = {
        "codes": codes,
        "buckets": buckets,
        "doc_ids": np.concatenate([i for _, _, i, _, _, _ in rows]),
        "tfs": np.concatenate([t for _, _, _, t, _, _ in rows]).astype(np.int64),
        "dls": np.concatenate([d for _, _, _, _, d, _ in rows]).astype(np.int64),
        "poss": np.concatenate([p for _, _, _, _, _, p in rows]).astype(np.int64),
        "dictionary": pa.array([f"term{k:03d}" for k in range(12)], type=pa.string()),
    }

    def reference(flat, avgdl, store_positions):
        occ = np.zeros(len(flat["tfs"]) + 1, dtype=np.int64)
        np.cumsum(flat["tfs"], out=occ[1:])
        c = flat["codes"]
        ch = np.empty(len(c), dtype=bool)
        ch[0] = True
        ch[1:] = (c[1:] != c[:-1]) | (flat["buckets"][1:] != flat["buckets"][:-1])
        rs = np.flatnonzero(ch)
        re_ = np.append(rs[1:], len(c))
        terms = flat["dictionary"].take(pa.array(c[rs])).to_pylist()
        out = []
        for t, s, e in zip(terms, rs, re_):
            row = compress.encode_postings(
                t, flat["doc_ids"][s:e], flat["tfs"][s:e], flat["dls"][s:e], avgdl,
                positions=flat["poss"][occ[s]:occ[e]] if store_positions else None,
            )
            row["bucket"] = int(flat["buckets"][s])
            out.append(row)
        return pa.Table.from_pylist(out, schema=build._posting_file_schema())

    for avgdl in (None, 73.5):
        for store_positions in (True, False):
            got = build.encode_partition_rows(flat, avgdl, store_positions=store_positions)
            want = reference(flat, avgdl, store_positions)
            assert got.equals(want), (avgdl, store_positions)
