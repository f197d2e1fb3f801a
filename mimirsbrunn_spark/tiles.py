"""Tile encoders: hierarchical grid cells (H3-role) + S2 cell ids.

The reference relies on Elasticsearch's internal geo indexing (geohash /
BKD) for its spatial pre-filter; our engine makes the tiling explicit so
that point-in-polygon becomes a *cell-id equi-join* Catalyst can plan
(broadcast or shuffled), mirroring the bbox filter-refine pattern of
``/root/reference/src/admin_geofinder.rs:48-70`` (envelope pre-filter)
+ ``:101-104`` (exact refine).

Two encoders:

1. **Grid cells** (``h3_7`` .. ``h3_12`` columns). The ``h3`` wheel is not
   available in this environment, so per SURVEY.md §7(3) we use a
   documented deterministic fallback: an equal-angle lon/lat quadtree grid
   whose resolutions are sized to match H3 res 7-12 cell diameters
   (res r → 2^(r+6) columns; res 7 ≈ 4.9 km, res 12 ≈ 153 m at the
   equator). Properties preserved from real H3: 64-bit cell ids, strict
   hierarchy (parent = bit shift), k-ring neighborhoods (``grid_disk``)
   with antimeridian wrap, and uniform-area-ish behavior good enough for
   join pruning. The encoding is pure integer/IEEE-double arithmetic and
   therefore *expressible identically in Spark SQL (JVM, codegen) and
   DuckDB SQL* — which is what lets the driver's oracle verify tile
   assignment bit-for-bit, and keeps the hot path out of Python entirely.

2. **S2 cells** (``s2_cell`` column): a faithful reimplementation of the
   public S2 cell-id scheme (cube face → quadratic ST → Hilbert curve,
   per the published s2geometry algorithm) vectorized in numpy, exposed
   as a pandas UDF. Stored as signed int64 (the usual bit-cast of the
   uint64 id).

Cell id layout for grid cells (bigint, always positive):
    id = res * 2^58 + i * 2^29 + j
where i = floor((lon+180)/360 * 2^(res+6)) clamped to [0, 2^(res+6)-1],
      j = floor((lat+90)/180 * 2^(res+6)) clamped likewise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

GRID_RES_MIN, GRID_RES_MAX = 0, 15
_RES_SHIFT = 2**58
_I_SHIFT = 2**29


def _grid_n(res: int) -> int:
    """Cells per axis exponent: res r → 2^(r+6) columns/rows."""
    return res + 6


# ---------------------------------------------------------------------------
# Grid cells — numpy (oracle / pandas path)
# ---------------------------------------------------------------------------


def grid_cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lon/lat → grid cell id (int64)."""
    n = _grid_n(res)
    size = np.int64(1) << n
    i = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(size)).astype(np.int64)
    j = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(size)).astype(np.int64)
    i = np.clip(i, 0, size - 1)
    j = np.clip(j, 0, size - 1)
    return np.int64(res) * _RES_SHIFT + i * _I_SHIFT + j


def grid_cell(lon: float, lat: float, res: int) -> int:
    return int(grid_cell_np(np.array([lon]), np.array([lat]), res)[0])


def grid_decompose(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, i, j)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // _RES_SHIFT
    rem = cell - res * _RES_SHIFT
    i = rem // _I_SHIFT
    j = rem - i * _I_SHIFT
    return res, i, j


def grid_parent_np(cell: np.ndarray, parent_res: int) -> np.ndarray:
    res, i, j = grid_decompose(cell)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return np.int64(parent_res) * _RES_SHIFT + (i >> shift) * _I_SHIFT + (j >> shift)


def grid_disk(cell: int, k: int) -> list[int]:
    """All cells within Chebyshev distance k (the H3 ``grid_disk`` role).

    Longitude wraps at the antimeridian; latitude rows are clamped
    (pole-adjacent disks are truncated, not wrapped). Deterministic order.
    """
    res, i, j = grid_decompose(np.array([cell]))
    res, i, j = int(res[0]), int(i[0]), int(j[0])
    size = 1 << _grid_n(res)
    out = []
    for dj in range(-k, k + 1):
        jj = j + dj
        if jj < 0 or jj >= size:
            continue
        for di in range(-k, k + 1):
            ii = (i + di) % size
            out.append(res * _RES_SHIFT + ii * _I_SHIFT + jj)
    return sorted(set(out))


# meters per degree consistent with geometry.EARTH_RADIUS_M = 6_371_000
# (2*pi*R/360); using a larger constant here would undersize pruning disks
# relative to the haversine refine and silently drop in-radius neighbors.
M_PER_DEG = 2.0 * np.pi * 6_371_000.0 / 360.0


def _radius_ring_counts(lat: float, radius_m: float, res: int) -> tuple[int, int]:
    """Per-axis ring counts (ki columns, kj rows) whose rectangle covers
    the metric radius around any in-cell position at ``lat``.

    floor(delta/width)+1 rings are required to cover an offset of delta
    from an arbitrary in-cell position, +1 safety; the lon width is
    evaluated at the disk's WORST latitude (see below), so the cap's
    full lon extent is covered. Extras are free: the exact haversine
    refine filters them. The counts are DECOUPLED: near a pole the shrinking lon
    cell width widens only ki (clamped at the full wrap, size//2 — past
    that every column is already covered), while kj stays radius/height
    (clamped at size: one over-pole reflection each way spans the globe).
    A coupled square k at lat 90 would iterate (2k+1)^2 ~ 10^11 cells."""
    n = _grid_n(res)
    size = 1 << n
    cell_h_m = 180.0 / size * M_PER_DEG  # meridional cell height
    # lon extent must use cos at the disk's WORST (most poleward)
    # latitude, not the query latitude: the true max lon offset of a
    # spherical cap is asin(sin(r/R)/cos(lat)), which for large radii at
    # mid/high latitude exceeds r/(cell width at lat) by more than any
    # constant safety ring — a cos-at-query-lat estimate silently drops
    # in-radius neighbors near the disk's lon extremes. dlat/cos(|lat|+
    # dlat) >= the cap extent everywhere below the full-wrap clamp
    # (numerically verified over 10m..20,000km x 0..90 deg); a disk
    # touching the pole drives coslat to ~0 and ki to the full wrap.
    dlat_deg = radius_m / M_PER_DEG
    coslat = max(np.cos(np.radians(min(abs(lat) + dlat_deg, 90.0))), 1e-9)
    cell_w_m = 360.0 / size * M_PER_DEG * coslat
    ki = int(np.floor(radius_m / cell_w_m)) + 2
    kj = int(np.floor(radius_m / cell_h_m)) + 2
    return min(ki, size // 2), min(kj, size)


def radius_disk_k(lat: float, radius_m: float, res: int) -> int:
    """Chebyshev ring count for a SQUARE disk superset (legacy shape;
    grid_cells_for_radius uses the decoupled rectangle). Clamped at the
    full lon wrap so a polar latitude cannot return an astronomical k."""
    ki, kj = _radius_ring_counts(lat, radius_m, res)
    return max(ki, kj)


def grid_cells_for_radius(lon: float, lat: float, radius_m: float, res: int) -> list[int]:
    """Cells covering a metric radius around a point (kNN pruning, role
    of ``geo_distance`` filter in ``/root/reference/libs/mimir/src/
    adapters/primary/common/dsl.rs:391-423``): decoupled ki×kj rectangle,
    antimeridian wrap via modulo, rows past a pole reflected (jj
    mirrored, columns shifted half the circle), set-deduped. The exact
    twin of the Catalyst enumeration in operators/knn.reverse_geocode."""
    n = _grid_n(res)
    size = 1 << n
    ki, kj = _radius_ring_counts(lat, radius_m, res)
    c = grid_cell(lon, lat, res)
    rem = c % _RES_SHIFT
    i = rem // _I_SHIFT
    j = rem % _I_SHIFT
    out = set()
    for dj in range(-kj, kj + 1):
        jr = j + dj
        if jr < 0:
            jj, shift = -1 - jr, size // 2
        elif jr >= size:
            jj, shift = 2 * size - 1 - jr, size // 2
        else:
            jj, shift = jr, 0
        for di in range(-ki, ki + 1):
            ii = (i + di + shift) % size
            out.add(res * _RES_SHIFT + ii * _I_SHIFT + jj)
    return sorted(out)


# ---------------------------------------------------------------------------
# Grid cells — Spark Column expression (JVM-side, codegen; the hot path)
# ---------------------------------------------------------------------------


def grid_cell_col(lon: Column | str, lat: Column | str, res: int) -> Column:
    """Spark Column computing the same grid cell id, fully JVM-side."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    size = 1 << _grid_n(res)
    i = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(size)))
    j = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(size)))
    i = F.least(F.greatest(i, F.lit(0)), F.lit(size - 1))
    j = F.least(F.greatest(j, F.lit(0)), F.lit(size - 1))
    return (F.lit(res).cast("long") * F.lit(_RES_SHIFT) + i * F.lit(_I_SHIFT) + j).alias(
        f"h3_{res}"
    )


def grid_cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """The identical encoding as an ANSI-SQL snippet (for the DuckDB oracle)."""
    size = 1 << _grid_n(res)
    i = f"least(greatest(cast(floor(({lon_expr} + 180.0) / 360.0 * {float(size)}) as bigint), 0), {size - 1})"
    j = f"least(greatest(cast(floor(({lat_expr} + 90.0) / 180.0 * {float(size)}) as bigint), 0), {size - 1})"
    return f"(cast({res} as bigint) * {_RES_SHIFT} + {i} * {_I_SHIFT} + {j})"


def with_grid_cells(df, lon: str, lat: str, res_list=(7, 8, 9, 10, 11, 12)):
    """Attach h3_{r} columns for each resolution (single projection)."""
    return df.select("*", *[grid_cell_col(lon, lat, r) for r in res_list])


# ---------------------------------------------------------------------------
# S2 cell ids — public algorithm, vectorized numpy
# ---------------------------------------------------------------------------

_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.uint64
)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig_orientation: int, pos: int, orientation: int):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(
            level,
            i + (int(r[index]) >> 1),
            j + (int(r[index]) & 1),
            orig_orientation,
            pos + index,
            orientation ^ int(_POS_TO_ORIENTATION[index]),
        )


for _orient in range(4):
    _init_lookup(0, 0, 0, _orient, 0, _orient)

_S2_MAX_LEVEL = 30
_S2_POS_BITS = 2 * _S2_MAX_LEVEL + 1


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # strict > matches S2::LargestAbsComponent exactly: ties go to the
    # LATER axis (|x|==|y| at lon +-45/135 -> the y face), so cell ids
    # interoperate with the real s2geometry library on boundary points
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    # over= too: discarded lanes (point not on that face) divide by a
    # near-zero non-largest component; the selected face's ratio is <=1.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        uv_by_face = [
            (y / x, z / x),      # face 0 (+x)
            (-x / y, z / y),     # face 1 (+y)
            (-x / z, -y / z),    # face 2 (+z)
            (z / x, y / x),      # face 3 (-x)
            (z / y, -x / y),     # face 4 (-y)
            (-y / z, -x / z),    # face 5 (-z)
        ]
        for f, (ue, ve) in enumerate(uv_by_face):
            m = face == f
            if np.any(m):
                u[m] = ue[m]
                v[m] = ve[m]
    return face.astype(np.uint64), u, v


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    ij = np.floor(s * float(1 << _S2_MAX_LEVEL)).astype(np.int64)
    return np.clip(ij, 0, (1 << _S2_MAX_LEVEL) - 1).astype(np.uint64)


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2's quadratic projection (area-uniformizing), public formula.
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def s2_cell_np(lon: np.ndarray, lat: np.ndarray, level: int = 16) -> np.ndarray:
    """Vectorized lon/lat → S2 cell id at ``level``, bit-cast to int64."""
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    coslat = np.cos(lat_r)
    x = coslat * np.cos(lon_r)
    y = coslat * np.sin(lon_r)
    z = np.sin(lat_r)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face << np.uint64(_S2_POS_BITS - 1)
    bits = face & np.uint64(_SWAP_MASK)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> shift) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> shift) & mask) << np.uint64(2)
        bits = _lookup_pos[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    cell = n * np.uint64(2) + np.uint64(1)  # leaf id
    if level < _S2_MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (_S2_MAX_LEVEL - level))
        cell = (cell & (~(lsb - np.uint64(1)))) | lsb
    return cell.view(np.int64)


def s2_cell_oracle_sql(points_sql: str, level: int = 16, id_col: str = "point_id") -> str:
    """Exact DuckDB oracle for ``s2_cell_np``: the identical face/ST/IJ
    float pipeline plus the 8-iteration 4-bit-lookup Hilbert interleave,
    unrolled as a recursive CTE joining the inlined 1024-entry
    ``_lookup_pos`` table (the same table the numpy path indexes).

    Parity notes (verified bit-exact on 150k points):
    - radians is written as ``x * 0.017453292519943295`` on both sides
      (numpy's deg2rad constant) so the multiply is IEEE-identical;
      cos/sin/sqrt resolve to the same libm on this host;
    - all remaining ops are division/floor/integer bit math (exact);
    - the final level truncation ``(cell & ~(lsb-1)) | lsb`` and the
      uint64→int64 bit-cast are done via overflow-safe BIGINT arithmetic:
      with q = n >> (shift-1), the truncated leaf id is (q|1) << shift,
      bit-cast by subtracting 2^(64-shift) before the multiply when the
      sign bit would be set.
    """
    deg2rad = "0.017453292519943295"
    lut_vals = ",".join(f"({i},{int(v)})" for i, v in enumerate(_lookup_pos))
    shift = 2 * (_S2_MAX_LEVEL - level)  # lsb = 1 << shift
    if shift < 2:
        raise ValueError("oracle supports level <= 29")
    div = 1 << (shift - 1)
    mult = 1 << shift
    thresh = 1 << (63 - shift)
    sub = 1 << (64 - shift)

    def st(u: str) -> str:
        return (
            f"(CASE WHEN {u} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {u}) "
            f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {u}) END)"
        )

    def ij(s: str) -> str:
        return f"least(greatest(CAST(floor({s} * 1073741824.0) AS BIGINT), 0), 1073741823)"

    return f"""
WITH RECURSIVE
s2pts AS ({points_sql}),
s2xyz AS (
  SELECT {id_col},
         cos(lat * {deg2rad}) * cos(lon * {deg2rad}) AS x,
         cos(lat * {deg2rad}) * sin(lon * {deg2rad}) AS y,
         sin(lat * {deg2rad}) AS z
  FROM s2pts
),
s2face AS (
  SELECT {id_col}, x, y, z,
         CASE WHEN comp < 0 THEN face0 + 3 ELSE face0 END AS face
  FROM (
    SELECT *, CASE face0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END AS comp
    FROM (
      SELECT *,
             CASE WHEN abs(x) > abs(y)
                  THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
                  ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS face0
      FROM s2xyz))
),
s2uv AS (
  SELECT {id_col}, face,
         CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                   WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
         CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                   WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM s2face
),
s2ij AS (
  SELECT {id_col}, face, {ij(st('u'))} AS i, {ij(st('v'))} AS j FROM s2uv
),
s2lut(idx, val) AS (VALUES {lut_vals}),
s2hil({id_col}, k, bits, n) AS (
    SELECT {id_col}, 7, face & 1, CAST(face AS BIGINT) * 1152921504606846976 FROM s2ij
  UNION ALL
    SELECT h.{id_col}, h.k - 1, l.val & 3,
           h.n + ((CAST(l.val AS BIGINT) >> 2) << (h.k * 8))
    FROM s2hil h JOIN s2ij p USING ({id_col})
    JOIN s2lut l ON l.idx = h.bits
                 + (((p.i >> (h.k * 4)) & 15) * 64)
                 + (((p.j >> (h.k * 4)) & 15) * 4)
    WHERE h.k >= 0
),
s2fin AS (
  SELECT {id_col}, (n // {div}) + 1 - ((n // {div}) % 2) AS qs FROM s2hil WHERE k = -1
)
SELECT {id_col},
       (CASE WHEN qs >= {thresh} THEN qs - {sub} ELSE qs END) * {mult} AS s2_cell
FROM s2fin
"""


# ---------------------------------------------------------------------------
# Geohash — the cell scheme Elasticsearch's geo indexing historically used
# (the role the reference leans on implicitly through ES's geohash/BKD
# pre-filter); public base32 algorithm, closed form (no binary-search loop):
# quantize lon/lat to ceil/floor(5p/2) bits, interleave lon-first, base32.
# ---------------------------------------------------------------------------

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql_expr(lon_expr: str, lat_expr: str, precision: int = 6) -> str:
    """Geohash of (lon, lat) as ONE SQL string valid verbatim in BOTH
    Spark SQL and DuckDB (the strongest oracle-parity form): only
    +,-,*,/, floor, least/greatest, CAST, %, substr and || — shifts are
    spelled as exact floor-divisions by powers of two (all operands
    < 2^53, so double math is exact), sidestepping the engines'
    different bit-operator spellings."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    li = (
        f"least(greatest(CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(1 << nlon)}) "
        f"AS BIGINT), 0), {(1 << nlon) - 1})"
    )
    la = (
        f"least(greatest(CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(1 << nlat)}) "
        f"AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    # assemble each output character's 5-bit group directly (values
    # 0..31) instead of one 5p-bit integer: a full-width val reaches
    # 2^55..2^60 at precision 11-12 and the BIGINT→double division
    # rounds away the low bits — per-group, every operand stays < 2^30
    # at ANY precision, so the double math really is exact
    chars = []
    for c in range(precision):
        terms = []
        for b in range(5):
            k = 5 * c + b  # bit position from the MSB; even → lon bit
            src, sh = (li, nlon - 1 - k // 2) if k % 2 == 0 else (la, nlat - 1 - k // 2)
            bit = f"(CAST(floor({src} / {float(1 << sh)}) AS BIGINT) % 2)"
            terms.append(f"{bit} * {1 << (4 - b)}")
        group = "(" + " + ".join(terms) + ")"
        chars.append(f"substr('{GEOHASH_BASE32}', CAST({group} AS INT) + 1, 1)")
    return "(" + " || ".join(chars) + ")"


def geohash_col(lon: Column | str, lat: Column | str, precision: int = 6) -> Column:
    """Geohash as a pure-Catalyst Column (wraps the shared SQL string)."""
    lon_e = lon if isinstance(lon, str) else None
    lat_e = lat if isinstance(lat, str) else None
    if lon_e is None or lat_e is None:
        raise ValueError("geohash_col takes column NAMES (the expr is SQL-generated)")
    return F.expr(geohash_sql_expr(lon_e, lat_e, precision)).alias(f"geohash{precision}")


def geohash_np(lon, lat, precision: int = 6) -> list[str]:
    """Reference scalar/numpy implementation (independent of the SQL
    path — the cross-check role, like the scalar S2 reimplementation)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    li = np.clip(np.floor((lon + 180.0) / 360.0 * float(1 << nlon)).astype(np.int64), 0, (1 << nlon) - 1)
    la = np.clip(np.floor((lat + 90.0) / 180.0 * float(1 << nlat)).astype(np.int64), 0, (1 << nlat) - 1)
    val = np.zeros(len(lon), dtype=np.int64)
    for k in range(nbits):
        src, sh = (li, nlon - 1 - k // 2) if k % 2 == 0 else (la, nlat - 1 - k // 2)
        val = (val << 1) | ((src >> sh) & 1)
    out = []
    for v in val:
        out.append(
            "".join(
                GEOHASH_BASE32[(int(v) >> (5 * (precision - 1 - c))) & 31]
                for c in range(precision)
            )
        )
    return out


def s2_cell_pandas_udf(level: int = 16):
    """pandas UDF factory: (lon, lat) → s2 cell id column."""

    @F.pandas_udf("long")
    def _s2(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_np(lon.to_numpy(), lat.to_numpy(), level))

    return _s2


# ---------------------------------------------------------------------------
# Grid-backend seam: true-H3 adapters behind one facade
# ---------------------------------------------------------------------------
# The engine's Catalyst/SQL cell paths (grid_cell_col / grid_cell_sql and
# the oracle gates) are quadtree-by-design: the encoding must be
# expressible identically in Spark SQL and DuckDB SQL, which real H3 is
# not. The PIP finder's cover + candidate lookup are likewise quadtree
# on purpose — its budgeted bbox decomposition and the cross-engine gate
# oracles are built on the rectangular grid and do NOT route through
# this facade. What the facade provides: the true-H3 adapters below
# (cell_np / parent_np / disk / cells_for_radius) with the SAME
# signatures as their quadtree twins, pinned by the golden conformance
# pack (tests/test_h3_conformance.py) so a real `h3` wheel (genuinely
# absent from this image: `import h3` fails) is validated the moment it
# is importable. Callers doing cell analytics pick a backend via
# `get_cell_ops()` / SPARK_GRAFT_GRID_BACKEND; swapping the finder
# itself to hexagons would additionally need an H3 polygon cover
# (h3.polygon_to_cells) and is out of scope while the wheel cannot be
# tested here.


def _import_h3():
    try:
        import h3  # noqa: F401  (not in this image; present on real clusters)

        return h3
    except ImportError:
        return None


def detect_grid_backend() -> str:
    import os

    want = os.environ.get("SPARK_GRAFT_GRID_BACKEND", "auto")
    if want == "quadtree":
        return "quadtree"
    h3 = _import_h3()
    if h3 is None:
        if want == "h3":
            raise ImportError("SPARK_GRAFT_GRID_BACKEND=h3 but the h3 wheel is not installed")
        return "quadtree"
    return "h3"


def h3_cell_np(lon, lat, res: int, h3mod=None) -> np.ndarray:
    """lon/lat → real H3 cell ids (int64 bit-cast). Per-point loop: the
    core h3 wheel exposes no vectorized API; its C kernel is fast enough
    that the loop is not the bottleneck of a batch."""
    h3 = h3mod or _import_h3()
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    out = np.empty(len(lon), dtype=np.uint64)
    for n, (lo, la) in enumerate(zip(lon, lat)):
        out[n] = int(h3.str_to_int(h3.latlng_to_cell(float(la), float(lo), res)))
    return out.view(np.int64)


def h3_parent_np(cells, parent_res: int, h3mod=None) -> np.ndarray:
    h3 = h3mod or _import_h3()
    cells = np.asarray(cells, dtype=np.int64).view(np.uint64)
    out = np.empty(len(cells), dtype=np.uint64)
    for n, c in enumerate(cells):
        out[n] = int(h3.str_to_int(h3.cell_to_parent(h3.int_to_str(int(c)), parent_res)))
    return out.view(np.int64)


def h3_disk(cell: int, k: int, h3mod=None) -> list[int]:
    h3 = h3mod or _import_h3()
    c = h3.int_to_str(int(np.uint64(np.int64(cell))))
    return sorted(int(h3.str_to_int(x)) for x in h3.grid_disk(c, k))


def h3_cells_for_radius(lon: float, lat: float, radius_m: float, res: int, h3mod=None) -> list[int]:
    """Metric-radius disk in true H3: ring count from the published mean
    hex edge lengths per res (meters), +1 safety ring."""
    h3 = h3mod or _import_h3()
    edge_m = h3.average_hexagon_edge_length(res, unit="m")
    k = int(radius_m / (edge_m * 1.5)) + 2  # hex apothem ≈ 1.5*edge per ring step
    return h3_disk(h3.str_to_int(h3.latlng_to_cell(lat, lon, res)), k, h3mod=h3)


class _CellOps:
    """Backend facade: cell_np/parent_np/disk/cells_for_radius."""

    def __init__(self, backend: str, h3mod=None):
        self.backend = backend
        if backend == "h3":
            h3 = h3mod or _import_h3()
            self.cell_np = lambda lon, lat, res: h3_cell_np(lon, lat, res, h3mod=h3)
            self.parent_np = lambda cells, res: h3_parent_np(cells, res, h3mod=h3)
            self.disk = lambda cell, k: h3_disk(cell, k, h3mod=h3)
            self.cells_for_radius = (
                lambda lon, lat, r, res: h3_cells_for_radius(lon, lat, r, res, h3mod=h3)
            )
        else:
            self.cell_np = grid_cell_np
            self.parent_np = grid_parent_np
            self.disk = grid_disk
            self.cells_for_radius = grid_cells_for_radius


def get_cell_ops(backend: str | None = None, h3mod=None) -> _CellOps:
    return _CellOps(backend or detect_grid_backend(), h3mod=h3mod)


GRID_BACKEND = detect_grid_backend()


# ---------------------------------------------------------------------------
# Morton (Z-order) keys — data-layout clustering
# ---------------------------------------------------------------------------
#
# Bit-interleave of the SAME (i, j) grid indices the quadtree cells use,
# via the public "Binary Magic Numbers" spread (Sean Anderson's bit
# hacks page; also how Delta's OPTIMIZE ZORDER and Geomesa's Z2 index
# key points). Unlike the row-major `grid_cell` id, consecutive Morton
# keys are spatially adjacent quads, so range-clustering parquet files
# on this key gives every file a spatially tight footprint — the layout
# lever `plans/layout.py` builds on. Reference relationship: ES gets
# spatial routing from its geohash-bucketed indices (mimir-base.json
# geo fields); a parquet lake needs the explicit curve key.

_MORTON_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _grid_ij_int(lon: float, lat: float, res: int) -> tuple[int, int]:
    """Python-scalar (i, j) with the exact float64 op sequence of
    grid_cell_np (CPython floats ARE float64, so this is bit-identical)."""
    size = 1 << _grid_n(res)
    i = int(np.floor((float(lon) + 180.0) / 360.0 * float(size)))
    j = int(np.floor((float(lat) + 90.0) / 180.0 * float(size)))
    return min(max(i, 0), size - 1), min(max(j, 0), size - 1)


def morton_interleave_int(i: int, j: int) -> int:
    def spread(x: int) -> int:
        for sh, m in _MORTON_STEPS:
            x = (x | (x << sh)) & m
        return x

    return spread(i) | (spread(j) << 1)


def morton_key_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lon/lat → Morton key (int64), oracle/pandas path."""
    n = _grid_n(res)
    size = np.int64(1) << n
    i = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(size)).astype(np.int64)
    j = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(size)).astype(np.int64)
    i = np.clip(i, 0, size - 1)
    j = np.clip(j, 0, size - 1)

    def spread(x: np.ndarray) -> np.ndarray:
        for sh, m in _MORTON_STEPS:
            x = (x | (x << np.int64(sh))) & np.int64(m)
        return x

    return spread(i) | (spread(j) << np.int64(1))


def morton_key_col(lon: Column | str, lat: Column | str, res: int) -> Column:
    """The identical Morton key fully JVM-side (no Python in the plan)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    size = 1 << _grid_n(res)
    i = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(size))), F.lit(0)), F.lit(size - 1))
    j = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(size))), F.lit(0)), F.lit(size - 1))

    def spread(c: Column) -> Column:
        for sh, m in _MORTON_STEPS:
            c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(m))
        return c

    return spread(i).bitwiseOR(F.shiftleft(spread(j), 1)).alias(f"z_{res}")


def morton_key_sql_cte(inner_sql: str, lon_expr: str, lat_expr: str, res: int,
                       alias: str | None = None) -> str:
    """DuckDB oracle for ``morton_key_col`` as a WITH chain over
    ``inner_sql`` (staged `SELECT * REPLACE` spreads keep the SQL linear
    instead of exponentially duplicating the i/j expressions). The final
    SELECT carries every inner column plus the key column ``z_{res}``."""
    size = 1 << _grid_n(res)
    zcol = alias or f"z_{res}"
    i = (f"least(greatest(cast(floor(({lon_expr} + 180.0) / 360.0 * {float(size)}) as bigint), 0), {size - 1})")
    j = (f"least(greatest(cast(floor(({lat_expr} + 90.0) / 180.0 * {float(size)}) as bigint), 0), {size - 1})")
    stages = [f"_z0 AS (SELECT *, {i} AS _zi, {j} AS _zj FROM _zin)"]
    for k, (sh, m) in enumerate(_MORTON_STEPS, start=1):
        stages.append(
            f"_z{k} AS (SELECT * REPLACE(((_zi | (_zi << {sh})) & {m}) AS _zi,"
            f" ((_zj | (_zj << {sh})) & {m}) AS _zj) FROM _z{k - 1})"
        )
    n_stages = len(_MORTON_STEPS)
    return (
        f"WITH _zin AS ({inner_sql}), " + ", ".join(stages)
        + f" SELECT * EXCLUDE (_zi, _zj), (_zi | (_zj << 1)) AS {zcol} FROM _z{n_stages}"
    )


def morton_window(lon: float, lat: float, res: int, prefix_bits: int) -> tuple[int, int]:
    """[lo, hi] Morton-key range (inclusive) of the quad with
    ``prefix_bits`` bits per axis that contains (lon, lat) — the whole
    quad is ONE contiguous key range, which is the property the layout
    pruning relies on."""
    n = _grid_n(res)
    if not 0 <= prefix_bits <= n:
        raise ValueError(f"prefix_bits must be in [0, {n}]")
    i, j = _grid_ij_int(lon, lat, res)
    shift = n - prefix_bits
    base = morton_interleave_int(i >> shift, j >> shift)
    lo = base << (2 * shift)
    return lo, lo + (1 << (2 * shift)) - 1


def with_morton_key(df, lon: str = "lon", lat: str = "lat", res: int = 12,
                    key: str | None = None):
    """Staged-projection Morton key: each spread step lands in its own
    named column, so Catalyst keeps the steps as separate (non-cheap,
    referenced-twice) projections instead of inlining them into one
    exponentially-duplicated expression tree — the single-Column form
    (`morton_key_col`) exceeds janino's method-size limit and knocks the
    whole stage out of codegen. Use THIS form in write paths."""
    out = key or f"z_{res}"
    size = 1 << _grid_n(res)
    i = F.least(F.greatest(F.floor((F.col(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(size))), F.lit(0)), F.lit(size - 1))
    j = F.least(F.greatest(F.floor((F.col(lat) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(size))), F.lit(0)), F.lit(size - 1))
    d = df.withColumn("_zi", i).withColumn("_zj", j)
    for sh, m in _MORTON_STEPS:
        d = d.withColumn("_zi", F.col("_zi").bitwiseOR(F.shiftleft(F.col("_zi"), sh)).bitwiseAND(F.lit(m)))
        d = d.withColumn("_zj", F.col("_zj").bitwiseOR(F.shiftleft(F.col("_zj"), sh)).bitwiseAND(F.lit(m)))
    return d.withColumn(out, F.col("_zi").bitwiseOR(F.shiftleft(F.col("_zj"), 1))).drop("_zi", "_zj")
