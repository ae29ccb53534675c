"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``DecodeStage`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case a deterministic fake
decoder (bytes -> seeded pixel tensor) exercises the REAL Ray-side
plumbing — schema, actor-pool signature, batch sizing, output layout —
which is what a production decoder would drop into.

Pattern notes for 100 TB media:
- binary payloads are large: keep ``batch_size`` small (16-64) and
  ``batch_format='pyarrow'`` (binary arrays don't round-trip pandas
  cheaply);
- decode/feature stages are CALLABLE CLASSES (actor pools): codec/model
  setup happens once per actor in ``__init__``;
- emit fixed-shape feature tensors as ``list<float>`` columns so
  downstream ANN (cb.ann) consumes them directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),      # opaque encoded bytes
        ("width", pa.int32()),         # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "width": 64 if kind != "audio" else 0,
                "height": 64 if kind != "audio" else 0,
                "duration_ms": 0 if kind == "image" else 1000,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic bytes -> float vector (stand-in for decode+embed).

    Defined as ``v_j = (md5_64(hex(payload) ':' j) % 2000001)/1e6 - 1``
    (values in [-1, 1]) — the batched md5-lower-64 kernel
    (:mod:`cb.hashing`) equals DuckDB ``md5_number_lower``, so the WHOLE
    fake-decode media pipeline has an exact SQL mirror when the payload
    bytes come from a table the oracle can read
    (sql_media_ann_topk)."""
    from .hashing import md5_lower64

    hexs = payload.hex()
    h = md5_lower64([f"{hexs}:{j}" for j in range(out_dim)])
    return (h % np.uint64(2000001)).astype(np.float64) / 1e6 - 1.0


def pillow_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Real image decoder (registered as ``"pillow"`` when PIL is
    importable): decode -> grayscale -> bilinear-resize to the smallest
    square covering ``out_dim`` pixels -> flatten -> scale to [-1, 1].
    Deterministic for a given payload, so downstream ANN/dedup results
    are reproducible.  Import happens at call time — i.e. once per
    actor via ``DecodeStage.__init__``'s registry resolution — so the
    module stays importable in containers without PIL."""
    import math
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(payload)).convert("L")
    side = max(1, math.isqrt(max(out_dim - 1, 0)) + 1)
    img = img.resize((side, side), Image.BILINEAR)
    px = np.asarray(img, dtype=np.float64).reshape(-1)[:out_dim]
    if px.size < out_dim:
        px = np.pad(px, (0, out_dim - px.size))
    return px / 127.5 - 1.0


class DecodeStage:
    """Actor-pool stage: decode + feature-extract media payloads, with a
    PLUGGABLE decoder (the reference's reflection-on-config extension
    point, Internal/FactoryHelper.cs:12-30, as an explicit registry —
    same mechanism as parsers/analyzers in :mod:`cb.registry`).

    ``decoder`` is either a callable ``(payload: bytes, out_dim: int)
    -> np.ndarray`` or the registry name of one (kind ``"decoder"``):
    a production decoder (PIL / torchaudio / pyav + an embedding model)
    drops in via ``cb.registry.register("decoder", "pil_clip", fn)`` +
    ``DecodeStage(decoder="pil_clip")`` without editing this class; the
    callable is resolved in ``__init__`` — ONCE PER ACTOR, where a real
    implementation loads its codec/model.

    No media libraries exist in this container, so the only built-in is
    the deterministic ``"fake"`` stand-in (bytes -> seeded tensor);
    constructing without a decoder raises ``NotImplementedError`` to
    keep the stub honest.  ``fake=True`` is shorthand for
    ``decoder="fake"``.
    """

    def __init__(self, *, fake: bool = False, out_dim: int = 64, decoder=None,
                 out_type: str = "float32"):
        # float32 halves feature bytes at 100-TB scale (the default);
        # float64 keeps decode output bit-exact against a DOUBLE-typed
        # SQL mirror (what the oracled entry uses)
        self.out_type = out_type
        if decoder is None and fake:
            decoder = "fake"
        if decoder is None:
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present "
                "in this container; inject one (decoder=<callable or "
                "registry name>) or construct with fake=True for the "
                "deterministic stand-in decoder"
            )
        if isinstance(decoder, str):
            from . import registry

            decoder = registry.lookup("decoder", decoder)
        self.decoder = decoder
        self.out_dim = out_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        np_t = np.float64 if self.out_type == "float64" else np.float32
        pa_t = pa.float64() if self.out_type == "float64" else pa.float32()
        feats = [
            np.asarray(self.decoder(p, self.out_dim), dtype=np_t).tolist()
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(feats, type=pa.list_(pa_t)),
            }
        )


class ResizeStage:
    """Image resize plumbing (stub): validates metadata and rewrites the
    typed width/height; the pixel op itself is the stubbed part."""

    def __init__(self, *, width: int, height: int, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image resize requires an imaging library; use fake=True"
            )
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (
            batch.set_column(
                batch.schema.get_field_index("width"),
                "width",
                pa.array([self.width] * n, type=pa.int32()),
            ).set_column(
                batch.schema.get_field_index("height"),
                "height",
                pa.array([self.height] * n, type=pa.int32()),
            )
        )


class FrameSampleStage:
    """Video frame-sampling plumbing (stub): one output row per sampled
    frame index — demonstrates the 1->N explode layout downstream
    decoders need."""

    def __init__(self, *, every_ms: int = 500, fake: bool = False):
        if not fake:
            raise NotImplementedError("video decoding unavailable; use fake=True")
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["kind"] != "video":
                continue
            for t in range(0, max(r["duration_ms"], 1), self.every_ms):
                rows.append(
                    {"media_id": r["media_id"], "frame_ms": t, "payload": r["payload"]}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("media_id", pa.int64()), ("frame_ms", pa.int32()), ("payload", pa.binary())]
            ),
        )
