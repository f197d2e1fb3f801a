"""Simplified-refine exactness (VERDICT r03 #8): the partitioned PIP
with ``simplify_tolerance`` classifies on Douglas–Peucker-simplified
rings and exact-rechecks only the boundary band — the result must be
IDENTICAL to the full-geometry broadcast path, including for points
inside zigzag notches that simplification erases (the case where
skipping the band recheck would flip the verdict)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.geometry import (
    mp_to_wkb,
    points_in_multipolygon,
    points_near_mp_boundary,
    simplify_mp,
)

TOL = 0.05


def _zigzag_square(cx, cy, half=5.0, amp=0.04, teeth=40):
    """Square with a zigzag east edge (amplitude < TOL, so DP flattens
    it): notch interiors are OUTSIDE the true polygon but INSIDE the
    simplified one."""
    pts = [(cx - half, cy - half), (cx + half, cy - half)]
    ys = np.linspace(cy - half, cy + half, teeth * 2 + 1)
    for i, y in enumerate(ys[1:-1], 1):
        x = cx + half - (amp if i % 2 else 0.0)
        pts.append((x, float(y)))
    pts += [(cx + half, cy + half), (cx - half, cy + half)]
    return np.array(pts, dtype=np.float64)


@pytest.fixture(scope="module")
def zigzag_admins(spark):
    ring = _zigzag_square(0.0, 0.0)
    rows = [
        ("zz:c", "country", None, mp_to_wkb([[_zigzag_square(0.0, 0.0, half=20.0)]])),
        ("zz:t", "city", "zz:c", mp_to_wkb([[ring]])),
    ]
    return spark.createDataFrame(
        rows, "id string, zone_type string, parent_id string, boundary_wkb binary"
    )


def test_dp_flattens_and_band_catches_notches():
    ring = _zigzag_square(0.0, 0.0)
    mp = [[ring]]
    simp = simplify_mp(mp, TOL)
    assert sum(len(r) for p in simp for r in p) < len(ring) / 4
    # probe points inside the notches: outside true, inside simplified
    probes_x = np.full(20, 5.0 - 0.01)
    probes_y = np.linspace(-4.5, 4.5, 20)
    true_in = points_in_multipolygon(probes_x, probes_y, mp)
    simp_in = points_in_multipolygon(probes_x, probes_y, simp)
    assert (~true_in & simp_in).any(), "no disagreement points — fixture too tame"
    band = points_near_mp_boundary(probes_x, probes_y, simp, TOL * 1.5)
    disagree = true_in != simp_in
    assert (band | ~disagree).all(), "a disagreement point escaped the band"


def test_partitioned_simplified_matches_broadcast_full(spark, zigzag_admins):
    from mimirsbrunn_spark.operators.pip import attach_admins

    # dense probe cloud over the zigzag region incl. the notch band
    # x densely sampled across the zigzag band [4.8, 5.05] (step 3.1e-3
    # << notch amplitude), y spanning the full edge — so many probes land
    # where simplified-only classification is WRONG
    n = 4000
    pts = spark.range(n).select(
        F.col("id").cast("string").alias("point_uid"),
        ((F.col("id") % 80) * 0.0031 + 4.8).alias("lon"),
        ((F.col("id") / 80).cast("int") * 0.22 - 5.5).alias("lat"),
    )
    full = {
        r["point_uid"]: r["admin_ids"]
        for r in attach_admins(pts, zigzag_admins, strategy="broadcast").collect()
    }
    simp = {
        r["point_uid"]: r["admin_ids"]
        for r in attach_admins(
            pts, zigzag_admins, strategy="partitioned", simplify_tolerance=TOL
        ).collect()
    }
    assert full == simp
    # non-vacuity: the cloud must include notch-band points where the
    # simplified-only verdict differs from the true one
    ring = _zigzag_square(0.0, 0.0)
    mp = [[ring]]
    s = simplify_mp(mp, TOL)
    lon = np.array([(i % 80) * 0.0031 + 4.8 for i in range(n)])
    lat = np.array([(i // 80) * 0.22 - 5.5 for i in range(n)])
    assert (points_in_multipolygon(lon, lat, mp) != points_in_multipolygon(lon, lat, s)).any()


def test_auto_tolerance_policy_units():
    """simplify_tolerance='auto' (VERDICT r04 #1): slim dims resolve to
    None (no-op — the q7 rectangle/octagon floor is untouched); dense
    rings resolve to ~EDGE_FACTOR x mean edge length."""
    from mimirsbrunn_spark.operators.pip import (
        AUTO_SIMPLIFY_EDGE_FACTOR,
        AUTO_SIMPLIFY_MIN_VERTICES,
        _auto_simplify_tolerance,
    )

    rect = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=np.float64)
    assert _auto_simplify_tolerance([[rect]]) is None
    dense = _zigzag_square(0.0, 0.0, teeth=400)  # ~800 vertices
    assert len(dense) >= AUTO_SIMPLIFY_MIN_VERTICES
    tol = _auto_simplify_tolerance([[dense]])
    d = np.diff(dense, axis=0)
    mean_edge = float(np.hypot(d[:, 0], d[:, 1]).sum()) / len(dense)
    assert tol == pytest.approx(AUTO_SIMPLIFY_EDGE_FACTOR * mean_edge)
    # holes count toward density too
    assert _auto_simplify_tolerance([[rect], [dense]]) is not None


def test_auto_banded_refine_is_default_and_exact(spark):
    """The partitioned default (no simplify_tolerance argument) now
    routes dense polygons through the banded refine and must stay
    hash-identical to the full-geometry broadcast path — including on
    sub-tolerance zigzag notches where classify-on-simplified alone
    would flip verdicts."""
    from mimirsbrunn_spark.operators.pip import (
        _auto_simplify_tolerance,
        attach_admins,
    )
    from mimirsbrunn_spark.geometry import mp_to_wkb as _wkb

    ring = _zigzag_square(0.0, 0.0, teeth=400, amp=0.01)
    mp = [[ring]]
    tol = _auto_simplify_tolerance(mp)
    assert tol is not None and tol > 0.01 / 2  # amp below chord tolerance
    admins = spark.createDataFrame(
        [
            ("zz:c", "country", None, _wkb([[_zigzag_square(0.0, 0.0, half=20.0, teeth=400)]])),
            ("zz:t", "city", "zz:c", _wkb(mp)),
        ],
        "id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    n = 4000
    pts = spark.range(n).select(
        F.col("id").cast("string").alias("point_uid"),
        ((F.col("id") % 80) * 0.0008 + 4.96).alias("lon"),
        ((F.col("id") / 80).cast("int") * 0.22 - 5.5).alias("lat"),
    )
    full = {
        r["point_uid"]: r["admin_ids"]
        for r in attach_admins(pts, admins, strategy="broadcast").collect()
    }
    auto = {
        r["point_uid"]: r["admin_ids"]
        for r in attach_admins(pts, admins, strategy="partitioned").collect()
    }
    assert full == auto
    # non-vacuity: simplified-only classification disagrees somewhere
    s = simplify_mp(mp, tol)
    lon = np.array([(i % 80) * 0.0008 + 4.96 for i in range(n)])
    lat = np.array([(i // 80) * 0.22 - 5.5 for i in range(n)])
    assert (points_in_multipolygon(lon, lat, mp) != points_in_multipolygon(lon, lat, s)).any()


def test_banded_refine_exact_inside_subtolerance_hole(spark):
    """Regression (r5 review): simplify_mp used to DROP hole rings whose
    extent sat under the tolerance, so a point inside a tiny enclave of a
    dense (auto-banded) polygon classified 'inside' on the simplified
    geometry with no boundary left to band against — silently diverging
    from the broadcast path. Holes now pass through verbatim and the
    partitioned-auto result must stay identical to broadcast, including
    probes INSIDE the hole."""
    from mimirsbrunn_spark.geometry import mp_to_wkb as _wkb
    from mimirsbrunn_spark.operators.pip import (
        _auto_simplify_tolerance,
        attach_admins,
    )

    ring = _zigzag_square(0.0, 0.0, teeth=400, amp=0.01)  # >=512 vertices
    # enclave hole centred at origin, far smaller than the auto tolerance
    hole = np.array(
        [(-0.004, -0.004), (0.004, -0.004), (0.004, 0.004), (-0.004, 0.004)]
    )
    mp = [[ring, hole]]
    tol = _auto_simplify_tolerance(mp)
    assert tol is not None and tol > 0.016, "hole must sit under the tolerance"
    s = simplify_mp(mp, tol)
    assert len(s[0]) == 2, "hole must survive simplification"
    admins = spark.createDataFrame(
        [
            ("h:c", "country", None, _wkb([[_zigzag_square(0.0, 0.0, half=20.0)]])),
            ("h:t", "city", "h:c", _wkb(mp)),
        ],
        "id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    # probes: dead centre of the hole, just outside the hole, deep interior
    pts = spark.createDataFrame(
        [("in_hole", 0.0, 0.0), ("near_hole", 0.02, 0.0), ("deep", 3.0, 3.0)],
        "point_uid string, lon double, lat double",
    )
    full = {
        r["point_uid"]: sorted(r["admin_ids"])
        for r in attach_admins(pts, admins, strategy="broadcast").collect()
    }
    auto = {
        r["point_uid"]: sorted(r["admin_ids"])
        for r in attach_admins(pts, admins, strategy="partitioned").collect()
    }
    assert full == auto
    assert "h:t" not in full["in_hole"], full["in_hole"]
    assert "h:t" in full["near_hole"] and "h:t" in full["deep"]
