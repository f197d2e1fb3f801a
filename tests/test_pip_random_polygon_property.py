"""Randomized-POLYGON property sweep of the PIP join (G1-G3 + J1).

The octagon sweep (test_octagon_oracle_property.py) randomizes the
POINT cloud over a fixed admin family; this one randomizes the
GEOMETRY itself: star-shaped concave polygons with random vertex
counts, random extents spanning the finder's resolution classes, and
50%-probability interior holes, over a mixed zone-type family that
keeps the same-zone-type collision skip live. The oracle is
test-local and algorithm-independent: winding-number containment
(the engine refines with an even-odd crossing count — the two agree
on all simple polygons) plus a direct replay of the flat
``geofinder.get`` fold (admin_geofinder.rs:220-269 with no parents).
A false negative from the multi-res cell cover, the envelope
prefilter, the WKB round-trip, or either join strategy's refine shows
up as a mismatched per-point attachment list.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.geofinder import zone_rank
from mimirsbrunn_spark.geometry import mp_to_wkb
from mimirsbrunn_spark.operators.pip import attach_admins

N_POINTS = 250
# mixed types: untyped (rank -1, never collision-skipped), three 'city'
# admins (collision skip fires wherever they overlap), rest distinct
ZONE_TYPES = [None, "city", "city", "city", "suburb", "city_district", "state", "country"]


def _star_ring(rng: np.random.Generator, cx: float, cy: float, rmax: float) -> np.ndarray:
    n = int(rng.integers(5, 41))
    ang = np.sort(rng.uniform(0.0, 2.0 * np.pi, size=n))
    # keep angles distinct so no two vertices coincide
    ang += np.arange(n) * 1e-9
    rad = rng.uniform(0.25 * rmax, rmax, size=n)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _family(rng: np.random.Generator):
    """[(id, zone_type, mp)] — star polygons, half with a hole."""
    fam = []
    for i, zt in enumerate(ZONE_TYPES):
        cx = float(rng.uniform(-25.0, 25.0))
        cy = float(rng.uniform(-20.0, 20.0))
        rmax = float(rng.uniform(2.0, 18.0))
        ext = _star_ring(rng, cx, cy, rmax)
        rings = [ext]
        if rng.random() < 0.5:
            # radii <= 0.8 * min(outer radii) at the same center =>
            # strictly interior at every angle
            rmin = float(np.min(np.hypot(ext[:, 0] - cx, ext[:, 1] - cy)))
            rings.append(_star_ring(rng, cx, cy, 0.8 * rmin))
        fam.append((f"rp:{i}", zt, [rings]))
    return fam


# ---------------------------------------------------------------------------
# test-local oracle: winding number + flat get() fold
# ---------------------------------------------------------------------------


def _winding(px: float, py: float, ring: np.ndarray) -> int:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = (x2 - x) * (py - y) - (px - x) * (y2 - y)
    up = (y <= py) & (y2 > py) & (cross > 0)
    dn = (y > py) & (y2 <= py) & (cross < 0)
    return int(up.sum()) - int(dn.sum())


def _inside_mp(px: float, py: float, mp) -> bool:
    for rings in mp:
        if _winding(px, py, rings[0]) != 0 and all(
            _winding(px, py, hole) == 0 for hole in rings[1:]
        ):
            return True
    return False


def _min_edge_dist(px: float, py: float, mp) -> float:
    best = np.inf
    for rings in mp:
        for ring in rings:
            a = ring
            b = np.roll(ring, -1, axis=0)
            ab = b - a
            ap = np.column_stack([px - a[:, 0], py - a[:, 1]])
            denom = (ab * ab).sum(axis=1)
            t = np.clip((ap * ab).sum(axis=1) / np.where(denom == 0, 1.0, denom), 0.0, 1.0)
            proj = a + ab * t[:, None]
            d = np.hypot(px - proj[:, 0], py - proj[:, 1])
            best = min(best, float(d.min()))
    return best


def _oracle_fold(px: float, py: float, fam) -> list[str]:
    cands = sorted(
        (rec for rec in fam if _inside_mp(px, py, rec[2])),
        key=lambda rec: (zone_rank(rec[1]), rec[0]),
    )
    added: set[str] = set()
    out: list[str] = []
    for aid, zt, _ in cands:
        if zt is not None and zt in added:
            continue
        if zt is not None:
            added.add(zt)
        out.append(aid)
    return out


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [11, 23, 47, 61, 83])
def test_random_polygon_pip_both_strategies(spark, seed):
    rng = np.random.default_rng(seed)
    fam = _family(rng)

    xs = np.vstack([ring for _, _, mp in fam for rings in mp for ring in rings])
    lo_x, hi_x = xs[:, 0].min(), xs[:, 0].max()
    lo_y, hi_y = xs[:, 1].min(), xs[:, 1].max()
    pad_x, pad_y = 0.1 * (hi_x - lo_x), 0.1 * (hi_y - lo_y)
    lon = rng.uniform(lo_x - pad_x, hi_x + pad_x, size=N_POINTS)
    lat = rng.uniform(lo_y - pad_y, hi_y + pad_y, size=N_POINTS)
    # sidestep boundary-convention ambiguity between winding number and
    # even-odd crossing: random floats land this close to an edge with
    # probability ~0, but make it structural
    keep = np.array(
        [min(_min_edge_dist(x, y, mp) for _, _, mp in fam) > 1e-9 for x, y in zip(lon, lat)]
    )
    lon, lat = lon[keep], lat[keep]
    assert len(lon) > N_POINTS * 0.9

    expected = {
        i: _oracle_fold(float(x), float(y), fam) for i, (x, y) in enumerate(zip(lon, lat))
    }
    assert any(expected.values()), "degenerate seed: no point hit any polygon"

    admins = spark.createDataFrame(
        [(aid, zt, None, mp_to_wkb(mp)) for aid, zt, mp in fam],
        schema="id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    pts = spark.createDataFrame(
        [(str(i), float(x), float(y)) for i, (x, y) in enumerate(zip(lon, lat))],
        schema="point_uid string, lon double, lat double",
    )

    for strategy in ("broadcast", "partitioned"):
        rows = (
            attach_admins(pts, admins, strategy=strategy)
            .select("point_uid", "admin_ids")
            .collect()
        )
        got = {int(r["point_uid"]): list(r["admin_ids"] or []) for r in rows}
        mismatched = {
            i: (got.get(i, []), exp)
            for i, exp in expected.items()
            if got.get(i, []) != exp
        }
        assert not mismatched, f"seed={seed} strategy={strategy}: {list(mismatched.items())[:5]}"
