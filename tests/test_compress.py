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
