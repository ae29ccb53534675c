"""Posting-list codec: delta + varint (FOR-style) with block-max metadata.

Per BASELINE.json north_star: postings are ``term -> sorted doc_id +
term-frequency arrays``, doc-id gaps delta-encoded then LEB128-varint
packed; every ``BLOCK`` entries carry (last doc_id, byte offsets, max
BM25 u-factor) so the query side can skip blocks (block-max WAND) and
decode blocks independently.

All encode/decode paths are numpy-vectorized (no per-posting Python
loop): encoding builds the byte stream with <=10 masked scatter passes
(one per possible varint byte), decoding recovers values with masked
gather passes over the continuation-bit structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import scoring

BLOCK = 128
_MAXB = 10  # max varint bytes for a 64-bit value


def varint_encode_with_sizes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 ndarray -> (LEB128 byte stream, per-value byte counts).

    All-small fast path: when every value < 128 (typical for tf/dl
    streams) the stream IS the values — one cast, ~16x over the general
    loop.  The general path scatters one byte position per pass
    (measured faster than an (n, K) byte-plane + boolean compress for
    mixed-width streams like delta-coded doc ids)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    if int(v.max()) < 128:  # 1-byte fast path
        return v.astype(np.uint8), np.ones(n, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    out = np.zeros(int(starts[-1] + nbytes[-1]), dtype=np.uint8)
    for k in range(_MAXB):
        mask = nbytes > k
        if not mask.any():
            break
        idx = starts[mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out, nbytes


def varint_encode(values: np.ndarray) -> np.ndarray:
    """uint64 ndarray -> LEB128 byte stream (uint8 ndarray)."""
    return varint_encode_with_sizes(values)[0]


def varint_decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """LEB128 byte stream -> uint64 ndarray (all values in the buffer)."""
    buf = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
    if len(buf) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((buf & 0x80) == 0)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        vals[mask] |= (buf[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    if count is not None:
        assert len(vals) == count, f"decoded {len(vals)} values, expected {count}"
    return vals


def encode_ids(doc_ids: np.ndarray) -> np.ndarray:
    """Sorted int64 doc ids -> delta varint bytes (first id absolute)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty(len(ids), dtype=np.uint64)
    if len(ids):
        deltas[0] = np.uint64(ids[0])
        np.subtract(ids[1:], ids[:-1], out=deltas[1:], casting="unsafe")
    return varint_encode(deltas)


def decode_ids(blob, count: int | None = None) -> np.ndarray:
    deltas = varint_decode(blob, count)
    return np.cumsum(deltas, dtype=np.uint64).astype(np.int64)


POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("ids_blob", pa.binary()),
        ("tfs_blob", pa.binary()),
        ("dls_blob", pa.binary()),  # per-posting doc length (varint)
        ("pos_blob", pa.binary()),  # per-occurrence positions (varint deltas,
                                     # reset at each posting; counts == tf)
        ("block_last_id", pa.list_(pa.int64())),
        ("block_umax", pa.list_(pa.float64())),
        ("block_id_off", pa.list_(pa.int32())),
        ("block_tf_off", pa.list_(pa.int32())),
        ("block_dl_off", pa.list_(pa.int32())),
        ("block_pos_off", pa.list_(pa.int32())),
    ]
)


def encode_postings(
    term: str,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    avgdl: float | None,
    positions: np.ndarray | None = None,
) -> dict:
    """One term's sorted postings -> compressed row (dict per POSTING_SCHEMA).

    Per-posting doc lengths are stored IN the postings (varint stream):
    scoring never needs a doc-stats side table, which removes the
    docstats broadcast from the serving scale path entirely.

    ``avgdl`` may be None when the corpus-global average is not yet
    known (single-pass builds compute it from the same shuffle);
    ``block_umax`` is then left empty and filled by
    :func:`annotate_umax` in a small post-pass over the written index.
    When given, umax uses the exact float64 ops of the query side
    (:func:`cb.scoring.u_factor`), so block bounds are true upper bounds.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(doc_lens, dtype=np.int64)
    assert len(ids) == len(tfs) == len(dls)
    n = len(ids)
    if n == 0:
        return {
            "term": term, "df": 0, "cf": 0,
            "ids_blob": b"", "tfs_blob": b"", "dls_blob": b"", "pos_blob": b"",
            "block_last_id": [], "block_umax": [],
            "block_id_off": [], "block_tf_off": [], "block_dl_off": [],
            "block_pos_off": [],
        }
    block_starts = np.arange(0, n, BLOCK, dtype=np.int64)
    block_ends = np.minimum(block_starts + BLOCK, n)
    # one vectorized pass over ALL blocks: deltas with a reset to the
    # absolute id at each block start (so blocks decode independently);
    # the concatenation of per-block LEB128 streams is byte-identical to
    # one stream over these reset deltas.
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(ids[0])
    np.subtract(ids[1:], ids[:-1], out=deltas[1:], casting="unsafe")
    deltas[block_starts] = ids[block_starts].astype(np.uint64)
    id_bytes, id_sizes = varint_encode_with_sizes(deltas)
    tf_bytes, tf_sizes = varint_encode_with_sizes(tfs.astype(np.uint64))
    dl_bytes, dl_sizes = varint_encode_with_sizes(dls.astype(np.uint64))
    id_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(id_sizes, out=id_cum[1:])
    tf_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_sizes, out=tf_cum[1:])
    dl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dl_sizes, out=dl_cum[1:])
    if avgdl is not None:
        u = scoring.u_factor(tfs, dls, avgdl)
        umax = np.maximum.reduceat(u, block_starts).tolist()
    else:
        umax = []
    # positional stream: per-posting delta-encoded occurrence positions
    # (counts are the tfs, so no length prefix is needed); byte offsets
    # recorded at each BLOCK's first posting so blocks decode alone.
    if positions is not None:
        poss = np.ascontiguousarray(positions, dtype=np.int64)
        occ_starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=occ_starts[1:])
        assert len(poss) == occ_starts[-1], "positions must total sum(tf)"
        pdeltas = np.empty(len(poss), dtype=np.uint64)
        if len(poss):
            pdeltas[0] = np.uint64(poss[0])
            np.subtract(poss[1:], poss[:-1], out=pdeltas[1:], casting="unsafe")
            pdeltas[occ_starts[:-1]] = poss[occ_starts[:-1]].astype(np.uint64)
        pos_bytes, pos_sizes = varint_encode_with_sizes(pdeltas)
        pos_cum = np.zeros(len(poss) + 1, dtype=np.int64)
        np.cumsum(pos_sizes, out=pos_cum[1:])
        block_pos_off = pos_cum[occ_starts[block_starts]].tolist()
        pos_blob = pos_bytes.tobytes()
    else:
        pos_blob = b""
        block_pos_off = []
    return {
        "term": term,
        "df": n,
        "cf": int(tfs.sum()),
        "ids_blob": id_bytes.tobytes(),
        "tfs_blob": tf_bytes.tobytes(),
        "dls_blob": dl_bytes.tobytes(),
        "pos_blob": pos_blob,
        "block_last_id": ids[block_ends - 1].tolist(),
        "block_umax": umax,
        "block_id_off": id_cum[block_starts].tolist(),
        "block_tf_off": tf_cum[block_starts].tolist(),
        "block_dl_off": dl_cum[block_starts].tolist(),
        "block_pos_off": block_pos_off,
    }


def _binary_column_stream(col) -> np.ndarray:
    """Concatenated bytes of a binary column as one uint8 ndarray
    (zero-copy view over the Arrow data buffer)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]]


def annotate_umax_table(tbl: pa.Table, avgdl: float) -> pa.Table:
    """Columnar block-umax rewrite of a whole partition file: ONE varint
    decode over the concatenated tf/dl streams + one reduceat, instead
    of a per-row Python dict round-trip (``to_pylist``) over up-to-GiB
    partition files."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    dfs = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(dfs.sum())
    tfs = varint_decode(_binary_column_stream(tbl["tfs_blob"]), total).astype(np.int64)
    dls = varint_decode(_binary_column_stream(tbl["dls_blob"]), total).astype(np.int64)
    u = scoring.u_factor(tfs, dls, avgdl)
    # per-row block starts: row_start + {0, BLOCK, 2*BLOCK, ...}
    n_blocks = (dfs + BLOCK - 1) // BLOCK
    row_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(dfs[:-1], out=row_starts[1:])
    block_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_blocks, out=block_offsets[1:])
    tot_blocks = int(block_offsets[-1])
    starts = (
        np.repeat(row_starts, n_blocks)
        + (np.arange(tot_blocks, dtype=np.int64) - np.repeat(block_offsets[:-1], n_blocks))
        * BLOCK
    )
    umax_flat = np.maximum.reduceat(u, starts) if tot_blocks else np.empty(0, dtype=np.float64)
    umax_col = pa.ListArray.from_arrays(
        pa.array(block_offsets, type=pa.int32()), pa.array(umax_flat, type=pa.float64())
    )
    return tbl.set_column(
        tbl.schema.get_field_index("block_umax"), "block_umax", umax_col.cast(tbl["block_umax"].type)
    )


def annotate_umax(row: dict, avgdl: float) -> dict:
    """Fill ``block_umax`` on a row encoded with ``avgdl=None``."""
    pl = PostingList(row)
    if pl.df == 0:
        row = dict(row)
        row["block_umax"] = []
        return row
    _, tfs, dls = pl.decode_all()
    u = scoring.u_factor(tfs, dls, avgdl)
    starts = np.arange(0, pl.df, BLOCK, dtype=np.int64)
    out = dict(row)
    out["block_umax"] = np.maximum.reduceat(u, starts).tolist()
    return out


class PostingList:
    """Decoded-on-demand view over one compressed posting row."""

    __slots__ = (
        "term", "df", "cf", "_ids_buf", "_tfs_buf", "_dls_buf", "_pos_buf",
        "last_ids", "umax", "id_off", "tf_off", "dl_off", "pos_off",
    )

    def __init__(self, row: dict):
        self.term = row["term"]
        self.df = int(row["df"])
        self.cf = int(row["cf"])
        self._ids_buf = np.frombuffer(row["ids_blob"], dtype=np.uint8)
        self._tfs_buf = np.frombuffer(row["tfs_blob"], dtype=np.uint8)
        self._dls_buf = np.frombuffer(row["dls_blob"], dtype=np.uint8)
        self._pos_buf = np.frombuffer(row.get("pos_blob") or b"", dtype=np.uint8)
        self.last_ids = np.asarray(row["block_last_id"], dtype=np.int64)
        self.umax = np.asarray(row["block_umax"], dtype=np.float64)
        self.id_off = np.asarray(row["block_id_off"], dtype=np.int64)
        self.tf_off = np.asarray(row["block_tf_off"], dtype=np.int64)
        self.dl_off = np.asarray(row["block_dl_off"], dtype=np.int64)
        self.pos_off = np.asarray(row.get("block_pos_off") or [], dtype=np.int64)

    @property
    def has_positions(self) -> bool:
        return len(self._pos_buf) > 0 or self.cf == 0

    @property
    def n_blocks(self) -> int:
        return len(self.last_ids)

    def block_len(self, b: int) -> int:
        return min(BLOCK, self.df - b * BLOCK)

    def decode_block(self, b: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Block b -> (doc_ids, tfs, doc_lens), all int64."""
        id_end = self.id_off[b + 1] if b + 1 < self.n_blocks else len(self._ids_buf)
        tf_end = self.tf_off[b + 1] if b + 1 < self.n_blocks else len(self._tfs_buf)
        dl_end = self.dl_off[b + 1] if b + 1 < self.n_blocks else len(self._dls_buf)
        nb = self.block_len(b)
        deltas = varint_decode(self._ids_buf[self.id_off[b]:id_end], nb)
        ids = np.cumsum(deltas, dtype=np.uint64).astype(np.int64)
        tfs = varint_decode(self._tfs_buf[self.tf_off[b]:tf_end], nb).astype(np.int64)
        dls = varint_decode(self._dls_buf[self.dl_off[b]:dl_end], nb).astype(np.int64)
        return ids, tfs, dls

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Whole-list decode in ONE varint pass per stream (not per
        block): the encoded deltas reset to an absolute id at each block
        start, so ids = running cumsum minus the cumsum just before each
        block start (vectorized with repeat)."""
        empty = np.empty(0, dtype=np.int64)
        if self.n_blocks == 0:
            return empty, empty, empty
        v = varint_decode(self._ids_buf, self.df)
        t = np.cumsum(v, dtype=np.uint64)
        starts = np.arange(0, self.df, BLOCK, dtype=np.int64)
        sizes = np.diff(np.append(starts, self.df))
        base = np.empty(len(starts), dtype=np.uint64)
        base[0] = np.uint64(0)
        base[1:] = t[starts[1:] - 1]
        ids = (t - np.repeat(base, sizes)).astype(np.int64)
        tfs = varint_decode(self._tfs_buf, self.df).astype(np.int64)
        dls = varint_decode(self._dls_buf, self.df).astype(np.int64)
        return ids, tfs, dls

    def decode_positions(self) -> tuple[np.ndarray, np.ndarray]:
        """-> (flat positions int64, per-posting occurrence offsets).

        ``offsets`` has df+1 entries; posting i's positions are
        ``flat[offsets[i]:offsets[i+1]]`` (count == tf_i).  Raises if
        the index was built without positions."""
        if self.df == 0:
            return np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
        if len(self._pos_buf) == 0:
            raise ValueError(
                f"postings for {self.term!r} carry no positions "
                "(index built by a pre-positional version)"
            )
        tfs = varint_decode(self._tfs_buf, self.df).astype(np.int64)
        offsets = np.zeros(self.df + 1, dtype=np.int64)
        np.cumsum(tfs, out=offsets[1:])
        v = varint_decode(self._pos_buf, int(offsets[-1]))
        t = np.cumsum(v, dtype=np.uint64)
        starts = offsets[:-1]
        base = np.empty(self.df, dtype=np.uint64)
        base[0] = np.uint64(0)
        base[1:] = t[starts[1:] - 1]
        flat = (t - np.repeat(base, tfs)).astype(np.int64)
        return flat, offsets
