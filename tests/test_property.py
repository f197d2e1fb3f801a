"""Property-based tests (hypothesis): the vectorized batch refine must
agree with the sequential oracle on arbitrary admin configurations, and
tile algebra must hold for arbitrary coordinates. Goes beyond the
reference's test strategy (SURVEY §5: it has no randomized testing)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from mimirsbrunn_spark.geofinder import AdminGeoFinder, AdminRec
from mimirsbrunn_spark.operators.pip import refine_batch
from mimirsbrunn_spark import tiles as TL

ZONES = [None, "suburb", "city", "state_district", "state", "country"]


def regular_polygon(cx: float, cy: float, r: float, n: int = 8) -> np.ndarray:
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


admin_strategy = st.lists(
    st.tuples(
        st.floats(-60, 60), st.floats(-40, 40),  # center
        st.floats(0.5, 20),                       # radius
        st.sampled_from(ZONES),
        st.integers(0, 4),                        # parent index (mod len)
    ),
    min_size=1,
    max_size=8,
)

points_strategy = st.lists(
    st.tuples(st.floats(-80, 80), st.floats(-60, 60)), min_size=1, max_size=40
)


@settings(max_examples=60, deadline=None)
@given(admin_strategy, points_strategy)
def test_batch_refine_matches_sequential_oracle(admins, points):
    finder = AdminGeoFinder()
    n = len(admins)
    for i, (cx, cy, r, zt, parent) in enumerate(admins):
        parent_id = f"adm{parent % n}" if parent % n != i else None
        finder.insert(
            AdminRec(
                id=f"adm{i}", zone_type=zt, parent_id=parent_id,
                mp=[[regular_polygon(cx, cy, r)]],
            )
        )
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    batch = refine_batch(finder, lon, lat)
    seq = [finder.get_ids(p[0], p[1]) for p in points]
    assert batch == seq


@settings(max_examples=100, deadline=None)
@given(st.floats(-180, 179.9999), st.floats(-90, 89.9999),
       st.integers(0, 12), st.integers(0, 12))
def test_tile_parent_commutes(lon, lat, r1, r2):
    lo, hi = min(r1, r2), max(r1, r2)
    direct = TL.grid_cell(lon, lat, lo)
    via_child = int(TL.grid_parent_np(np.array([TL.grid_cell(lon, lat, hi)]), lo)[0])
    assert direct == via_child


@settings(max_examples=60, deadline=None)
@given(st.floats(-180, 179.9999), st.floats(-89, 89), st.integers(1, 3))
def test_grid_disk_contains_center_and_is_symmetric(lon, lat, k):
    c = TL.grid_cell(lon, lat, 7)
    disk = TL.grid_disk(c, k)
    assert c in disk
    # every member's disk of radius k contains the center (symmetry),
    # except near poles where rows clamp
    _, _, j = TL.grid_decompose(np.array([c]))
    size = 1 << 13
    if k <= int(j[0]) <= size - 1 - k:
        for m in disk[:5]:
            assert c in TL.grid_disk(m, k)


@settings(max_examples=60, deadline=None)
@given(st.floats(-180, 180), st.floats(-90, 90), st.integers(0, 30))
def test_s2_level_structure(lon, lat, level):
    c = int(TL.s2_cell_np(np.array([lon]), np.array([lat]), level)[0])
    cu = np.array(c, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (30 - level))
    assert cu & lsb  # level marker bit set
    assert (cu & (lsb - np.uint64(1))) == 0  # nothing below the marker
    # parent at a coarser level is a prefix: same face bits
    if level > 0:
        p = int(TL.s2_cell_np(np.array([lon]), np.array([lat]), level - 1)[0])
        pu = np.array(p, dtype=np.int64).view(np.uint64)
        assert (pu >> np.uint64(61)) == (cu >> np.uint64(61))
