"""Batched md5-lower-64 kernel: exact vs hashlib, incl. fallback rows."""

import hashlib
import struct

import numpy as np
import pyarrow as pa

from cb.hashing import md5_lower64, salted_id_hash


def _ref(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:16])[0]


def test_md5_lower64_matches_hashlib():
    rng = np.random.default_rng(3)
    cases = ["", "a", "mix123", "x" * 55, "y" * 56, "z" * 200, "é漢字"] + [
        f"salt{int(i)}" for i in rng.integers(0, 2**62, 300)
    ]
    got = md5_lower64(cases)
    want = np.array([_ref(s) for s in cases], dtype=np.uint64)
    assert (got == want).all()


def test_md5_lower64_null_and_chunked():
    arr = pa.chunked_array([pa.array(["a", None]), pa.array(["b"])])
    got = md5_lower64(arr)
    assert got[0] == _ref("a") and got[1] == _ref("") and got[2] == _ref("b")


def test_salted_id_hash_mod():
    ids = pa.array([0, 1, 2**62, -5])
    got = salted_id_hash("cb", ids, mod=100)
    want = np.array([_ref(f"cb{i}") % 100 for i in ids.to_pylist()], dtype=np.uint64)
    assert (got == want).all()
