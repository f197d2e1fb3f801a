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
