from __future__ import annotations

import numpy as np
import pytest

from mimirsbrunn_spark import geometry as G
from mimirsbrunn_spark import tiles as TL


def test_grid_cell_roundtrip_and_hierarchy():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    c12 = TL.grid_cell_np(lon, lat, 12)
    c7 = TL.grid_cell_np(lon, lat, 7)
    assert np.array_equal(TL.grid_parent_np(c12, 7), c7)
    res, i, j = TL.grid_decompose(c12)
    assert (res == 12).all()
    assert (i >= 0).all() and (i < 2**18).all()
    assert (j >= 0).all() and (j < 2**18).all()


def test_grid_disk_wraps_antimeridian():
    c = TL.grid_cell(-179.99, 10.0, 7)
    disk = TL.grid_disk(c, 1)
    assert c in disk
    assert len(disk) == 9
    # one neighbor must be on the +180 side
    _, i, _ = TL.grid_decompose(np.array(disk))
    size = 1 << 13
    assert (i == size - 1).any()


def test_grid_cell_sql_matches_numpy(spark):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    import pandas as pd

    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(TL.grid_cell_col("lon", "lat", 9).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    want = TL.grid_cell_np(lon, lat, 9)
    assert np.array_equal(np.sort(got), np.sort(want))

    import duckdb

    sql = f"select {TL.grid_cell_sql('lon', 'lat', 9)} as c from pdf"
    dk = duckdb.sql(sql).df()["c"].to_numpy()
    assert np.array_equal(np.sort(dk), np.sort(want))


def test_s2_cells_basic_invariants():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    c = TL.s2_cell_np(lon, lat, 16)
    # deterministic
    assert np.array_equal(c, TL.s2_cell_np(lon, lat, 16))
    # all 6 faces represented over a uniform sphere sample
    faces = (c.view(np.uint64) >> np.uint64(61)).astype(int)
    assert set(faces) == {0, 1, 2, 3, 4, 5}
    # nearby points share coarse cells
    c_a = TL.s2_cell_np(np.array([2.3522]), np.array([48.8566]), 10)
    c_b = TL.s2_cell_np(np.array([2.3523]), np.array([48.8567]), 10)
    assert c_a[0] == c_b[0]
    # level bit structure: lsb at 2*(30-level)
    lsb = np.uint64(1) << np.uint64(2 * (30 - 16))
    cu = c.view(np.uint64)
    assert ((cu & (np.uint64(2) * lsb - np.uint64(1))) == lsb).all()


def test_pip_octagon():
    from mimirsbrunn_spark.datagen import octagon

    ring = octagon(40.0, 40.0, 1.0)
    mp = [[ring]]
    lon = np.array([44.0, 48.0, 40.1, 39.0])
    lat = np.array([44.0, 41.0, 40.1, 44.0])
    got = G.points_in_multipolygon(lon, lat, mp)
    assert got.tolist() == [True, False, False, False]


def test_pip_with_hole():
    outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
    hole = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)])
    mp = [[outer, hole]]
    lon = np.array([5.0, 2.0, 11.0])
    lat = np.array([5.0, 2.0, 5.0])
    assert G.points_in_multipolygon(lon, lat, mp).tolist() == [False, True, False]


def test_wkb_roundtrip():
    outer = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
    hole = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)])
    mp = [[outer, hole], [np.array([(20.0, 20.0), (21.0, 20.0), (21.0, 21.0)])]]
    back = G.wkb_to_mp(G.mp_to_wkb(mp))
    assert len(back) == 2 and len(back[0]) == 2
    assert np.allclose(back[0][0], outer)
    assert np.allclose(back[0][1], hole)


def test_haversine_known_value():
    # Paris → London ≈ 343.5 km
    d = G.haversine_np(np.array([2.3522]), np.array([48.8566]), np.array([-0.1276]), np.array([51.5072]))
    assert 340_000 < d[0] < 348_000


def test_haversine_sql_matches_numpy(spark):
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "lon1": rng.uniform(-180, 180, 200),
            "lat1": rng.uniform(-89, 89, 200),
            "lon2": rng.uniform(-180, 180, 200),
            "lat2": rng.uniform(-89, 89, 200),
        }
    )
    want = G.haversine_np(pdf.lon1, pdf.lat1, pdf.lon2, pdf.lat2)
    expr = G.haversine_sql("lon1", "lat1", "lon2", "lat2")
    dk = duckdb.sql(f"select {expr} as d from pdf").df()["d"].to_numpy()
    assert np.allclose(dk, want, rtol=1e-9)
    sp = (
        spark.createDataFrame(pdf)
        .selectExpr(f"{expr} as d")
        .toPandas()["d"]
        .to_numpy()
    )
    assert np.allclose(np.sort(sp), np.sort(want), rtol=1e-9)


def test_radius_disk_never_drops_in_radius_points():
    """ADVICE r01: the pruning disk must be a superset of the metric
    radius — probe points just inside the radius on many bearings at
    awkward latitudes and assert their cell is in the disk."""
    import math

    from mimirsbrunn_spark.geometry import EARTH_RADIUS_M, haversine_np
    from mimirsbrunn_spark.tiles import grid_cell, grid_cells_for_radius

    import numpy as np

    for lat0, lon0 in [(0.0, 0.0), (45.3, 2.7), (60.1, -179.99), (74.9, 17.3)]:
        for radius in (500.0, 1000.0, 4999.0):
            for res in (7, 9):
                disk = set(grid_cells_for_radius(lon0, lat0, radius, res))
                d = radius * 0.999
                for bearing_deg in range(0, 360, 20):
                    th = math.radians(bearing_deg)
                    la1 = math.radians(lat0)
                    ang = d / EARTH_RADIUS_M
                    la2 = math.asin(
                        math.sin(la1) * math.cos(ang)
                        + math.cos(la1) * math.sin(ang) * math.cos(th)
                    )
                    lo2 = math.radians(lon0) + math.atan2(
                        math.sin(th) * math.sin(ang) * math.cos(la1),
                        math.cos(ang) - math.sin(la1) * math.sin(la2),
                    )
                    lat2, lon2 = math.degrees(la2), math.degrees(lo2)
                    if lon2 > 180.0:
                        lon2 -= 360.0
                    if lon2 < -180.0:
                        lon2 += 360.0
                    assert haversine_np(
                        np.array([lon0]), np.array([lat0]), np.array([lon2]), np.array([lat2])
                    )[0] <= radius
                    assert grid_cell(lon2, lat2, res) in disk, (
                        lat0, lon0, radius, res, bearing_deg,
                    )


# ---------------------------------------------------------------------------
# S2 exactness pinned by an INDEPENDENT scalar implementation
# ---------------------------------------------------------------------------

_S2_POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
_S2_POS_TO_ORIENT = [1, 0, 0, 3]  # swap, none, none, invert|swap


def _s2_scalar(lon_deg: float, lat_deg: float, level: int) -> int:
    """Published S2 algorithm, scalar python ints, NO lookup tables —
    a deliberately different code path (per-level Hilbert iteration, as in
    the s2geometry reference docs) to cross-check tiles.s2_cell_np's
    vectorized table-driven encoder."""
    import math

    lon, lat = math.radians(lon_deg), math.radians(lat_deg)
    x = math.cos(lat) * math.cos(lon)
    y = math.cos(lat) * math.sin(lon)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w):
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    def ij(s):
        return max(0, min((1 << 30) - 1, int(math.floor(s * (1 << 30)))))

    i, j = ij(st(u)), ij(st(v))
    # bit-by-bit Hilbert: orientation starts as face & 1 (swap mask)
    pos = 0
    orientation = face & 1
    for k in range(29, -1, -1):
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        ijb = bi * 2 + bj
        quad = _S2_POS_TO_IJ[orientation].index(ijb)
        pos = pos * 4 + quad
        orientation ^= _S2_POS_TO_ORIENT[quad]
    cell = ((face << 60) + pos) * 2 + 1  # leaf id (61-bit pos incl. trailing 1)
    if level < 30:
        lsb = 1 << (2 * (30 - level))
        cell = (cell & ~(lsb - 1)) | lsb
    return cell - (1 << 64) if cell >= (1 << 63) else cell


def test_s2_cross_implementation_exactness():
    import numpy as np

    from mimirsbrunn_spark.tiles import s2_cell_np

    rng = np.random.RandomState(7)
    lons = np.concatenate([rng.uniform(-180, 180, 200),
                           [0.0, 90.0, -90.0, 179.99, -179.99, 45.0, 0.0, 0.0]])
    lats = np.concatenate([rng.uniform(-89.9, 89.9, 200),
                           [0.0, 0.0, 0.0, 0.0, 0.0, 35.26, 89.9, -89.9]])
    for level in (4, 10, 16, 30):
        got = s2_cell_np(lons, lats, level)
        for lo, la, g in zip(lons, lats, got):
            assert int(g) == _s2_scalar(float(lo), float(la), level), (lo, la, level)


def test_s2_face_bits_cardinals():
    """Exact face assignment for the 6 cardinal directions (the top 3 bits
    of the uint64 id — hand-derivable from the published cube layout)."""
    import numpy as np

    from mimirsbrunn_spark.tiles import s2_cell_np

    cases = [((0.0, 0.0), 0), ((90.0, 0.0), 1), ((0.0, 90.0), 2),
             ((180.0, 0.0), 3), ((-90.0, 0.0), 4), ((0.0, -90.0), 5)]
    for (lon, lat), face in cases:
        cell = np.uint64(s2_cell_np(np.array([lon]), np.array([lat]), 30).view(np.uint64)[0])
        assert int(cell) >> 61 == face, (lon, lat, face)


def test_h3_backend_seam_dispatch():
    """The grid-backend facade: default = quadtree (wheel absent in this
    image); with an h3-shaped module injected, the adapters drive its API
    (latlng_to_cell/cell_to_parent/grid_disk) — so a cluster that has the
    real wheel gets true H3 through the same entry points."""
    import numpy as np

    from mimirsbrunn_spark.tiles import GRID_BACKEND, get_cell_ops, grid_cell

    assert GRID_BACKEND == "quadtree"
    ops = get_cell_ops()
    assert ops.backend == "quadtree"
    assert int(ops.cell_np(np.array([2.35]), np.array([48.85]), 7)[0]) == grid_cell(2.35, 48.85, 7)

    class FakeH3:
        """Minimal h3-4.x-shaped API: str tokens <-> ints, fake cells."""

        def latlng_to_cell(self, lat, lng, res):
            return f"{int((lng + 180) * 100)}_{int((lat + 90) * 100)}_{res}"

        def str_to_int(self, s):
            a, b, r = s.split("_")
            return (int(a) << 24) + (int(b) << 4) + int(r)

        def int_to_str(self, i):
            return f"{i >> 24}_{(i >> 4) & 0xFFFFF}_{i & 0xF}"

        def cell_to_parent(self, s, parent_res):
            a, b, _ = s.split("_")
            return f"{a}_{b}_{parent_res}"

        def grid_disk(self, s, k):
            a, b, r = s.split("_")
            return [f"{int(a) + d}_{b}_{r}" for d in range(-k, k + 1)]

    fake = FakeH3()
    ops = get_cell_ops("h3", h3mod=fake)
    assert ops.backend == "h3"
    cells = ops.cell_np(np.array([2.35, 3.0]), np.array([48.85, 49.0]), 9)
    assert list(cells) == [fake.str_to_int(fake.latlng_to_cell(48.85, 2.35, 9)),
                           fake.str_to_int(fake.latlng_to_cell(49.0, 3.0, 9))]
    parents = ops.parent_np(cells, 7)
    assert all(int(p) & 0xF == 7 for p in parents)
    disk = ops.disk(int(cells[0]), 1)
    assert len(disk) == 3


def test_points_to_mp_distance():
    """G4: zero inside/on-boundary; exact for axis-aligned offsets; the
    nearest-edge (not nearest-vertex) distance for diagonal probes."""
    from mimirsbrunn_spark.geometry import M_PER_DEG_EQ, points_to_mp_distance_m

    sq = [[np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]]
    lon = np.array([0.5, 0.5, 0.5, 2.0, -1.0, 0.5])
    lat = np.array([0.5, 1.0, 2.0, 0.5, 0.5, -0.25])
    d = points_to_mp_distance_m(lon, lat, sq)
    assert d[0] == 0.0 and d[1] == 0.0             # inside, on edge
    m = M_PER_DEG_EQ
    assert abs(d[2] - 1.0 * m) / m < 0.01           # 1 deg above the top edge
    assert abs(d[3] - 1.0 * m) / m < 0.01           # 1 deg right (cos ~1 near equator)
    assert abs(d[4] - 1.0 * m) / m < 0.01
    assert abs(d[5] - 0.25 * m) / m < 0.01


def test_geohash_canonical_vectors_and_engine_parity(spark):
    """Geohash: canonical public vectors + the shared-SQL Catalyst path
    equals the independent numpy reimplementation on a point sweep."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.tiles import geohash_col, geohash_np, geohash_sql_expr

    assert geohash_np([-5.603], [42.605], 5) == ["ezs42"]
    assert geohash_np([2.3522], [48.8566], 6) == ["u09tvw"]
    assert geohash_np([-0.1278], [51.5074], 6) == ["gcpvj0"]

    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-90, 90, 400)
    expect = geohash_np(lon, lat, 6)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "i long, lon double, lat double",
    )
    got = {r["i"]: r["geohash6"] for r in df.select("i", geohash_col("lon", "lat", 6)).collect()}
    assert [got[i] for i in range(400)] == expect
    # the SAME string runs in DuckDB
    con = duckdb.connect()
    dres = con.execute(
        f"SELECT {geohash_sql_expr('-5.603', '42.605', 5)}"
    ).fetchone()[0]
    assert dres == "ezs42"


def test_simplify_mp_dp():
    """Douglas–Peucker: a noisy circle shrinks to few vertices at coarse
    tolerance; interior containment is preserved; fine tolerance is a
    near-no-op; sub-tolerance rings (exteriors AND holes) pass through
    verbatim — a dropped hole would break the banded-exact refine's
    invariant (pip.py arrow_refine): points inside it would flip to
    'inside' with no boundary to band against."""
    import numpy as np

    from mimirsbrunn_spark.geometry import (
        points_in_multipolygon, simplify_mp,
    )

    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    rng = np.random.default_rng(3)
    ring = np.stack([10 * np.cos(t) + rng.normal(0, 0.01, 400),
                     10 * np.sin(t) + rng.normal(0, 0.01, 400)], axis=1)
    mp = [[ring]]
    sm = simplify_mp(mp, 0.25)
    n_after = len(sm[0][0])
    assert n_after < 80, n_after
    # deep-interior and far-exterior points keep their verdicts
    probes_in = np.array([[0.0, 0.0], [3.0, 3.0], [-5.0, 0.0]])
    probes_out = np.array([[20.0, 0.0], [0.0, -15.0]])
    assert points_in_multipolygon(probes_in[:, 0], probes_in[:, 1], sm).all()
    assert not points_in_multipolygon(probes_out[:, 0], probes_out[:, 1], sm).any()
    # near-no-op at fine tolerance
    assert len(simplify_mp(mp, 1e-9)[0][0]) >= 395
    # tiny hole survives VERBATIM at coarse tolerance (banded-exactness
    # invariant), exterior still simplifies
    hole = np.array([(0.0, 0.0), (0.1, 0.0), (0.1, 0.1), (0.05, 0.11), (0.0, 0.1)])
    sm2 = simplify_mp([[ring, hole]], 0.5)
    assert len(sm2[0]) == 2
    assert np.array_equal(sm2[0][1], hole)
    # a point inside the kept hole stays OUTSIDE the simplified polygon
    assert not points_in_multipolygon(
        np.array([0.05]), np.array([0.05]), sm2
    ).any()


def test_simplify_admin_boundaries_operator(spark, fixtures_dir):
    """DataFrame wrapper: vertex counts reported, WKB round-trips, and at
    a tiny tolerance the attachments are unchanged on the fixture corpus."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.operators.pip import attach_admins, simplify_admin_boundaries
    from mimirsbrunn_spark.operators.spans import extract_geo_points

    admins = spark.read.parquet(f"{fixtures_dir}/admins.parquet")
    slim = simplify_admin_boundaries(admins, 1e-9)
    row = slim.agg(F.sum("n_vertices_before").alias("b"), F.sum("n_vertices_after").alias("a")).collect()[0]
    assert row["a"] == row["b"]  # octagons: nothing to remove at 1e-9
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    pts = extract_geo_points(docs).withColumn(
        "point_uid", F.concat_ws("#", "doc_id", "span_offset")
    ).limit(2000)
    a = attach_admins(pts, admins).select("point_uid", F.to_json("admin_ids").alias("x"))
    b = attach_admins(pts, slim.drop("n_vertices_before", "n_vertices_after")).select(
        "point_uid", F.to_json("admin_ids").alias("x")
    )
    assert a.alias("a").join(b.alias("b"), "point_uid").filter(F.expr("a.x <> b.x")).count() == 0


def test_geohash_exact_at_max_precision(spark):
    """r5 review regression: the one-big-integer SQL form rounded away
    the trailing base32 characters at precision >= 11 (val reached
    2^55-2^60, past double's 2^53 exactness). The per-character 5-bit
    groups keep every operand < 2^30, so precision 12 (standard geohash
    max) must match the int64 numpy path in BOTH engines."""
    import duckdb
    import numpy as np

    from mimirsbrunn_spark.tiles import geohash_col, geohash_np, geohash_sql_expr

    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for p in (11, 12):
        want = list(geohash_np(lon, lat, p))
        # DuckDB
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) lon, unnest(?) lat)",
            [lon.tolist(), lat.tolist()],
        )
        duck = [r[0] for r in con.execute(
            f"SELECT {geohash_sql_expr('lon', 'lat', p)} FROM t"
        ).fetchall()]
        assert duck == want, f"duckdb diverges at precision {p}"
        # Spark
        df = spark.createDataFrame(
            [(float(lon[i]), float(lat[i])) for i in range(len(lon))],
            "lon double, lat double",
        )
        got = [r[0] for r in df.select(geohash_col("lon", "lat", p)).collect()]
        assert got == want, f"spark diverges at precision {p}"


def test_radius_cover_includes_cap_lon_extreme():
    """The lon extent of a metric-radius disk must use cos at the disk's
    WORST latitude: at (0, 60) with r=1000 km, the point (18.2171,
    61.2592) is ~999.95 km away (inside the radius) but sits past the
    cos-at-query-lat estimate's lon reach — the old enumeration omitted
    its cell and the kNN silently dropped a true neighbor."""
    import numpy as np

    from mimirsbrunn_spark.geometry import haversine_np
    from mimirsbrunn_spark.tiles import grid_cell, grid_cells_for_radius

    d = float(haversine_np(np.array([0.0]), np.array([60.0]),
                           np.array([18.2171]), np.array([61.2592]))[0])
    assert d < 1_000_000.0
    cells = set(grid_cells_for_radius(0.0, 60.0, 1_000_000.0, 8))
    assert grid_cell(18.2171, 61.2592, 8) in cells


def test_reverse_knn_finds_cap_lon_extreme_neighbor(spark):
    """End-to-end: the Catalyst twin of the radius cover must join the
    cap-extreme target (same scenario as the unit test above)."""
    from mimirsbrunn_spark.operators.knn import reverse_geocode

    q = spark.createDataFrame([(1, 0.0, 60.0)], "query_id long, lon double, lat double")
    t = spark.createDataFrame(
        [(10, 18.2171, 61.2592), (11, 0.0, 60.001)],
        "target_id long, lon double, lat double",
    )
    got = {r["target_id"] for r in
           reverse_geocode(q, t, k=5, radius_m=1_000_000.0, res=8).collect()}
    assert got == {10, 11}


def test_haversine_near_antipodal_not_nan(spark):
    """Float rounding can push the haversine h a few ulps above 1 for
    near-antipodal pairs; without the clip (present in haversine_np) the
    SQL/Column forms returned NaN and the pair silently failed every
    radius filter."""
    import math

    from mimirsbrunn_spark.geometry import haversine_sql
    from mimirsbrunn_spark.operators.knn import haversine_col
    from pyspark.sql import functions as F

    lon1, lat1 = 171.3470447, -64.7096539
    lon2, lat2 = -8.6529567, 64.7096534
    row = spark.range(1).select(
        haversine_col(F.lit(lon1), F.lit(lat1), F.lit(lon2), F.lit(lat2)).alias("d")
    ).collect()[0]
    assert math.isfinite(row["d"]) and row["d"] > 1.9e7
    sql_d = spark.sql(
        f"SELECT {haversine_sql(repr(lon1), repr(lat1), repr(lon2), repr(lat2))} AS d"
    ).collect()[0]["d"]
    assert math.isfinite(sql_d) and abs(sql_d - row["d"]) < 1e-6
    import duckdb

    duck_d = duckdb.sql(
        f"SELECT {haversine_sql(repr(lon1), repr(lat1), repr(lon2), repr(lat2))} AS d"
    ).fetchone()[0]
    assert math.isfinite(duck_d) and abs(duck_d - row["d"]) < 1e-6


def test_wkb_unclosed_ring_keeps_last_vertex():
    """An unclosed ring in external WKB must keep its last real vertex —
    the old unconditional ring[:-1] silently deleted a polygon corner."""
    import struct

    import numpy as np

    from mimirsbrunn_spark.geometry import points_in_multipolygon, wkb_to_mp

    # raw LE WKB multipolygon: one polygon, one UNCLOSED 4-point quad
    pts = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    buf = struct.pack("<BII", 1, 6, 1) + struct.pack("<BII", 1, 3, 1)
    buf += struct.pack("<I", len(pts))
    for x, y in pts:
        buf += struct.pack("<dd", x, y)
    mp = wkb_to_mp(buf)
    assert len(mp[0][0]) == 4  # all four vertices kept
    # the corner region the dropped vertex would have lost
    inside = points_in_multipolygon(np.array([1.0]), np.array([3.5]), mp)
    assert bool(inside[0])


def test_s2_face_tiebreak_matches_largest_abs_component():
    """S2::LargestAbsComponent uses strict >: |x|==|y| (lon exactly 45)
    resolves to the y face (face 1), matching the real s2geometry
    library on boundary meridians. Both engines agree after the fix."""
    import numpy as np

    from mimirsbrunn_spark.tiles import _xyz_to_face_uv

    # an EXACT |x| == |y| tie (cos/sin of 45 deg differ by 1 ulp in
    # float64, so the tie must be constructed directly)
    face, _, _ = _xyz_to_face_uv(np.array([0.5]), np.array([0.5]), np.array([0.3]))
    assert int(face[0]) == 1
    # and |y| == |z| ties resolve to the z face
    face, _, _ = _xyz_to_face_uv(np.array([0.3]), np.array([0.5]), np.array([0.5]))
    assert int(face[0]) == 2


def test_get_admins_if_parent_cycle_terminates():
    """A malformed dump with a parent_id cycle must not hang an executor:
    the branch walk breaks at the first repeated id."""
    from mimirsbrunn_spark.geofinder import AdminGeoFinder, AdminRec

    import numpy as np

    sq = [[np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])]]
    f = AdminGeoFinder()
    f.insert(AdminRec(id="A", zone_type="city", parent_id="B", mp=sq))
    f.insert(AdminRec(id="B", zone_type="state", parent_id="A", mp=sq))
    f.insert(AdminRec(id="S", zone_type="suburb", parent_id="S", mp=sq))  # self-loop
    branches = f.get_admins_if(0.5, 0.5, lambda r: r.zone_type is not None)
    ids = sorted(b[0].id for b in branches)
    assert ids == ["A", "S"] or ids == ["A", "B", "S"] or len(branches) >= 1
    for b in branches:
        assert len(b) <= 3  # walk terminated
