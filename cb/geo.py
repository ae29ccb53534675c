"""Geo queries and aggregations — the Elasticsearch ``geo_distance`` /
``geo_bounding_box`` query and ``geotile_grid`` / ``geo_distance``
(ring) aggregation surface ConveyorBelt delegates to ES (the reference
ships documents to ES and lets ES index ``geo_point`` fields; here the
kernels are first-class Ray Data operators over plain lat/lon DOUBLE
columns).

Every operator is one vectorized ``map_batches`` pass (numpy trig over
Arrow-backed arrays, zero row loops) that shrinks each batch to either
a filtered slice (queries) or a tiny ``(bucket, count)`` partial
(aggregations); aggregation partials merge in a native
``groupby().sum()`` whose group count is bounded by the BUCKET DOMAIN
(tiles / rings), never the corpus — the ``doclen_quantiles`` two-phase
pattern.  At 100 TB nothing but bucket partials crosses an exchange
and no driver-side loop touches rows.

Exact-parity contract (what makes these DuckDB-oracle-able):

- Haversine is evaluated with ONE canonical expression tree —
  ``2 R asin(sqrt(sin^2(dphi/2) + cos(phi0) cos(phi) sin^2(dlam/2)))``
  with degree->radian conversion written ``deg * (pi/180)`` — and the
  SQL mirrors spell the SAME tree.  numpy's vectorized trig may differ
  from libm by an ulp (~1e-12 km observed), so emitted distances are
  ``round(d, 6)`` (millimeter grid) on BOTH sides — verified bitwise
  at sf0.001/0.01/0.1 — and every membership edge (radius, ring edge,
  tile edge) is either IEEE-exact on both sides or separated from the
  data by >= 0.09 km (guarded by ``tests/test_geo.py``), 10 orders of
  magnitude above the ulp noise.
- Geotile is the slippy-map tile formula at zoom z:
  ``x = floor((lon+180)/360 * 2^z)``,
  ``y = floor((1 - ln(tan(phi) + 1/cos(phi)) / pi) / 2 * 2^z)`` —
  again one shared expression tree; tile assignment is bitwise equal
  to DuckDB on all sf test grids (exact-edge points land on
  binary-exact values, e.g. lat=0 -> y-frac exactly 0.5).

The test fixture has no geo columns, so coordinates are DERIVED
deterministically from the integer key onto a centidegree grid
(:func:`coord_exprs`): ``lat = ((key*7919) % 17000 - 8500) / 100.0``
(clamped inside Web-Mercator range), ``lon = ((key*104729) % 36000 -
18000) / 100.0`` — integer modulus then one exact-input division, so
Ray and SQL derive bit-identical DOUBLEs.  A real deployment replaces
the derivation with its own lat/lon columns; every kernel below takes
plain arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

EARTH_RADIUS_KM = 6371.0

#: centidegree derivation constants — shared by the numpy kernel and
#: the SQL mirrors (primes keep the grid uncorrelated with key order)
LAT_MUL, LAT_MOD, LAT_OFF = 7919, 17000, 8500
LON_MUL, LON_MOD, LON_OFF = 104729, 36000, 18000


def derive_coords(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic test-fixture coordinates from an integer key
    column: centidegree grid, lat in [-85, 85) (inside Web-Mercator),
    lon in [-180, 180).  Integer ops then ONE division by 100.0 — the
    division inputs are exact integers, so the result is the correctly
    rounded double on every engine."""
    k = np.asarray(keys, dtype=np.int64)
    lat = ((k * LAT_MUL) % LAT_MOD - LAT_OFF) / 100.0
    lon = ((k * LON_MUL) % LON_MOD - LON_OFF) / 100.0
    return lat, lon


def coord_exprs(key: str) -> tuple[str, str]:
    """The SQL spelling of :func:`derive_coords` (same integer ops,
    same single division)."""
    lat = f"(({key} * {LAT_MUL}) % {LAT_MOD} - {LAT_OFF}) / 100.0"
    lon = f"(({key} * {LON_MUL}) % {LON_MOD} - {LON_OFF}) / 100.0"
    return lat, lon


def haversine_km(
    lat: np.ndarray, lon: np.ndarray, lat0: float, lon0: float
) -> np.ndarray:
    """Great-circle distance (km) with the canonical expression tree
    the SQL mirror (:func:`sql_haversine`) reproduces verbatim."""
    p = np.pi / 180.0
    la0, lo0 = lat0 * p, lon0 * p
    la, lo = lat * p, lon * p
    a = (
        np.sin((la - la0) / 2.0) ** 2
        + np.cos(la0) * np.cos(la) * np.sin((lo - lo0) / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def sql_haversine(lat: str, lon: str, lat0: float, lon0: float) -> str:
    """SQL mirror of :func:`haversine_km` — SAME tree, term for term
    (``deg * (pi()/180.0)`` conversion, ``^2`` powers, one asin)."""
    la0 = f"{lat0!r} * (pi() / 180.0)"
    lo0 = f"{lon0!r} * (pi() / 180.0)"
    la = f"({lat}) * (pi() / 180.0)"
    lo = f"({lon}) * (pi() / 180.0)"
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt("
        f"sin((({la}) - ({la0})) / 2.0) ^ 2"
        f" + cos({la0}) * cos({la})"
        f" * sin((({lo}) - ({lo0})) / 2.0) ^ 2))"
    )


def geotile(
    lat: np.ndarray, lon: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Slippy-map tile ids at ``zoom`` (the ES ``geotile_grid`` bucket
    key) — canonical tree shared with :func:`sql_geotile`."""
    n = float(1 << zoom)
    p = np.pi / 180.0
    la = lat * p
    xt = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    yt = np.floor(
        (1.0 - np.log(np.tan(la) + 1.0 / np.cos(la)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    # the antimeridian point lon=180 (absent from the derived grid but
    # legal input) belongs to the last column, not a phantom column n
    np.clip(xt, 0, (1 << zoom) - 1, out=xt)
    np.clip(yt, 0, (1 << zoom) - 1, out=yt)
    return xt, yt


def sql_geotile(lat: str, lon: str, zoom: int) -> tuple[str, str]:
    n = f"{float(1 << zoom)!r}"
    la = f"({lat}) * (pi() / 180.0)"
    xt = (
        f"least(greatest(floor((({lon}) + 180.0) / 360.0 * {n})::BIGINT,"
        f" 0), {(1 << zoom) - 1})"
    )
    yt = (
        f"least(greatest(floor((1.0 - ln(tan({la}) + 1.0 / cos({la}))"
        f" / pi()) / 2.0 * {n})::BIGINT, 0), {(1 << zoom) - 1})"
    )
    return xt, yt


# ---------------------------------------------------------------------------
# Ray Data operators


def with_coords(batch: pa.Table, key_col: str) -> pa.Table:
    """map_batches stage: append derived ``lat`` / ``lon`` columns."""
    lat, lon = derive_coords(batch[key_col].to_numpy(zero_copy_only=False))
    return batch.append_column("lat", pa.array(lat, pa.float64())).append_column(
        "lon", pa.array(lon, pa.float64())
    )


def bounding_box(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> ray.data.Dataset:
    """ES ``geo_bounding_box`` (filter context): pure comparisons on
    the coordinate doubles — IEEE-exact, no trig.  One vectorized
    pass; each batch shrinks to its box slice."""

    def f(batch: pa.Table) -> pa.Table:
        b = with_coords(batch, key_col)
        lat = b["lat"].to_numpy()
        lon = b["lon"].to_numpy()
        mask = (lat <= top) & (lat >= bottom) & (lon >= left) & (lon <= right)
        return b.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def distance_within(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    lat0: float,
    lon0: float,
    radius_km: float,
) -> ray.data.Dataset:
    """ES ``geo_distance`` query: docs within ``radius_km`` of the
    origin, carrying ``dist_km = round(haversine, 6)`` (the rounding
    grid both engines agree on bitwise; membership uses the UNROUNDED
    distance with a strict ``<`` and the fixture guarantees >= 0.09 km
    of clearance at every sf — tests/test_geo.py guards it)."""

    def f(batch: pa.Table) -> pa.Table:
        b = with_coords(batch, key_col)
        d = haversine_km(b["lat"].to_numpy(), b["lon"].to_numpy(), lat0, lon0)
        b = b.append_column("dist_km", pa.array(np.round(d, 6), pa.float64()))
        return b.filter(pa.array(d < radius_km))

    return ds.map_batches(f, batch_format="pyarrow")


def distance_rings(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    lat0: float,
    lon0: float,
    edges: tuple[float, ...],
) -> ray.data.Dataset:
    """ES ``geo_distance`` aggregation: half-open distance rings
    ``[0, e1), [e1, e2), ..., [e_last, inf)`` -> doc count.  Per-batch
    ``np.searchsorted`` partials (ring domain-sized), native
    ``groupby().sum()`` merge — nothing corpus-sized moves."""
    e = np.asarray(edges, dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        b = with_coords(batch, key_col)
        d = haversine_km(b["lat"].to_numpy(), b["lon"].to_numpy(), lat0, lon0)
        ring = np.searchsorted(e, d, side="right").astype(np.int64)
        r, c = np.unique(ring, return_counts=True)
        return pa.table({"ring": r, "n": c.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("ring").sum("n").rename_columns({"sum(n)": "n_docs"})


def geotile_grid(
    ds: ray.data.Dataset, key_col: str, *, zoom: int, min_count: int = 1
) -> ray.data.Dataset:
    """ES ``geotile_grid`` aggregation at ``zoom``: per-batch
    ``(xtile, ytile, count)`` partials (tile domain-sized — a batch
    shrinks to its distinct tiles), native groupby-sum merge, then the
    ES ``min_doc_count`` prune."""

    def partial(batch: pa.Table) -> pa.Table:
        b = with_coords(batch, key_col)
        xt, yt = geotile(b["lat"].to_numpy(), b["lon"].to_numpy(), zoom)
        t = pa.table({"xtile": xt, "ytile": yt}).group_by(
            ["xtile", "ytile"]
        ).aggregate([("ytile", "count")])
        return t.rename_columns(["xtile", "ytile", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (
        parts.groupby(["xtile", "ytile"]).sum("n").rename_columns({"sum(n)": "n_docs"})
    )
    if min_count > 1:
        merged = merged.filter(expr=f"n_docs >= {min_count}")
    return merged
