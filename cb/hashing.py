"""Batched md5-lower-64 — ONE vectorized kernel for every salted-hash
routing decision in the engine (dataset_split, token_budget_sample,
dedup signature vocabularies).

The value is the little-endian uint64 at digest bytes [8:16] — exactly
DuckDB's ``md5_number_lower``, which is what keeps every salted-hash
pipeline SQL-oracle-checkable.

:func:`md5_lower64` is a numpy implementation of single-block MD5
(RFC 1321, public): salted id/token strings are <= 55 bytes, so the
padded message is one 512-bit block and all 64 rounds run as
whole-batch uint32 numpy ops — no per-row Python string/f-string/
hashlib-object churn in the map stages that use it.  Rows longer than
55 bytes (rare: ids are <= 20 digits) fall back to hashlib row-wise,
so the kernel is exact for any input.

Honest measurement (process-CPU, 500k salted int ids): ~parity with
the per-row hashlib loop it replaces (hashlib's C MD5 is ~1.3 us/row;
so is this) — the win is ONE shared, oracle-exact, testable kernel
instead of four copies of a Python loop, not wall-clock.  If a faster
batch hash is ever needed, swap the routing hash family here and in
the SQL mirrors together.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RFC 1321 constants: K[i] = floor(abs(sin(i+1)) * 2^32), per-round shifts
_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * (2.0**32)).astype(np.uint64).astype(np.uint32)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _md5_single_block(M: np.ndarray) -> np.ndarray:
    """(N, 16) uint32 padded message blocks -> (N,) uint64 lower-64
    (little-endian digest bytes [8:16] = C'|D'<<32)."""
    n = len(M)
    M = np.ascontiguousarray(M.T)  # word-major: M[g] is contiguous per round
    A = np.full(n, _INIT[0], dtype=np.uint32)
    B = np.full(n, _INIT[1], dtype=np.uint32)
    C = np.full(n, _INIT[2], dtype=np.uint32)
    D = np.full(n, _INIT[3], dtype=np.uint32)
    for i in range(64):
        if i < 16:
            F = (B & C) | (~B & D)
            g = i
        elif i < 32:
            F = (D & B) | (~D & C)
            g = (5 * i + 1) % 16
        elif i < 48:
            F = B ^ C ^ D
            g = (3 * i + 5) % 16
        else:
            F = C ^ (B | ~D)
            g = (7 * i) % 16
        F = F + A + _K[i] + M[g]
        A, D, C = D, C, B
        B = B + _rotl(F, int(_S[i]))
    C = C + np.uint32(_INIT[2])
    D = D + np.uint32(_INIT[3])
    return C.astype(np.uint64) | (D.astype(np.uint64) << np.uint64(32))


def _string_array(strings) -> pa.Array:
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(strings, type=pa.string())
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    return strings


def md5_lower64(strings) -> np.ndarray:
    """md5-lower-64 (DuckDB ``md5_number_lower``) of each string, as a
    (N,) uint64 array.  Accepts a pyarrow String(Chunked)Array, numpy
    array or list of str.  Vectorized single-block MD5 for rows <= 55
    bytes; exact hashlib fallback for longer rows."""
    arr = _string_array(strings)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = pc.if_else(pc.is_valid(arr), arr, "")  # nulls hash as ""
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    out = np.empty(n, dtype=np.uint64)
    small = lens <= 55
    if small.any():
        idx = np.flatnonzero(small)
        l = lens[idx]
        total = int(l.sum())
        msg = np.zeros((len(idx), 64), dtype=np.uint8)
        rows = np.repeat(np.arange(len(idx)), l)
        cols = np.arange(total) - np.repeat(np.cumsum(np.append(0, l))[:-1], l)
        src = np.repeat(off[idx], l) + cols
        msg[rows, cols] = data[src]
        msg[np.arange(len(idx)), l] = 0x80
        blocks = msg.view("<u4").reshape(len(idx), 16).astype(np.uint32)
        bits = (l * 8).astype(np.uint64)
        blocks[:, 14] = (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        blocks[:, 15] = (bits >> np.uint64(32)).astype(np.uint32)
        out[idx] = _md5_single_block(blocks)
    if not small.all():
        for i in np.flatnonzero(~small):
            s = bytes(data[off[i] : off[i + 1]])
            out[i] = struct.unpack("<Q", hashlib.md5(s).digest()[8:16])[0]
    return out


def salted_id_hash(salt: str, ids, mod: int | None = None) -> np.ndarray:
    """``md5_lower64(f"{salt}{id}")`` for a whole id column at once
    (string build is Arrow-vectorized too).  ``mod`` applies a final
    modulus (the routing use: ``% 100`` splits, ``% 1_000_000``
    sampling order)."""
    if isinstance(ids, (pa.Array, pa.ChunkedArray)):
        id_str = pc.cast(ids, pa.string())
    else:
        id_str = pc.cast(pa.array(ids), pa.string())
    joined = pc.binary_join_element_wise(
        pa.scalar(salt), id_str, pa.scalar("")
    )
    h = md5_lower64(joined)
    if mod is not None:
        h = h % np.uint64(mod)
    return h


#: Routing-hash domain every salted pipeline shares (and every SQL
#: mirror inlines): h = md5_lower64(salt+id) % HASH_DOMAIN.
HASH_DOMAIN = 1_000_000


def hash_range(h: np.ndarray, n_ranges: int) -> np.ndarray:
    """h (already mod HASH_DOMAIN) -> equal-width range index in
    [0, n_ranges): the two-phase histogram/boundary key shared by
    token_budget_sample / export_shards / write_training_shards — one
    definition so the engine copies and the SQL mirrors cannot drift."""
    return (h * n_ranges) // HASH_DOMAIN
