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
