"""Randomized sweep of cell-ring-pruned reverse-geocode kNN (G7) vs a
brute-force all-pairs oracle.

The `reverse_knn` gate runs a fixed cloud; the directed tests pin the
pole-reflection / antimeridian-wrap / no-duplicate branches one at a
time. This sweep composes them: random query/target clouds with heavy
polar (|lat| > 89) and antimeridian (|lon| > 179.5) clusters, random
radius/res/k per seed, checked per query against an UNPRUNED all-pairs
haversine top-k (same distance kernel — G9 is already cross-engine
hash-gated — so any mismatch is a pruning miss, a wrap/reflection
duplicate, or a ranking drift, not formula noise)."""

from __future__ import annotations

import numpy as np
import pytest

from mimirsbrunn_spark.geometry import haversine_np
from mimirsbrunn_spark.operators.knn import reverse_geocode

CASES = [
    # (seed, n_queries, n_targets, radius_m, res, k)
    (7, 40, 3000, 5000.0, 7, 5),
    (19, 40, 3000, 800.0, 8, 3),
    (31, 30, 2000, 30000.0, 6, 4),
]


def _cloud(rng: np.random.Generator, n: int) -> tuple[np.ndarray, np.ndarray]:
    """~40% uniform, ~30% polar caps, ~30% antimeridian band."""
    kind = rng.random(n)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-85.0, 85.0, n)
    polar = kind < 0.3
    lat[polar] = np.where(rng.random(polar.sum()) < 0.5, 1.0, -1.0) * rng.uniform(
        89.0, 90.0, polar.sum()
    )
    anti = (kind >= 0.3) & (kind < 0.6)
    lat[anti] = rng.uniform(-80.0, 80.0, anti.sum())
    lon[anti] = np.where(rng.random(anti.sum()) < 0.5, 1.0, -1.0) * rng.uniform(
        179.5, 180.0, anti.sum()
    )
    return lon, lat


@pytest.mark.parametrize("seed,n_q,n_t,radius_m,res,k", CASES)
def test_knn_matches_brute_force(spark, seed, n_q, n_t, radius_m, res, k):
    rng = np.random.default_rng(seed)
    qlon, qlat = _cloud(rng, n_q)
    tlon, tlat = _cloud(rng, n_t)
    # densify: drop half the targets near the queries so most queries
    # have in-radius neighbors at every radius under test
    half = n_t // 2
    pick = rng.integers(0, n_q, half)
    scale = radius_m / 111_320.0
    tlat[:half] = np.clip(qlat[pick] + rng.uniform(-2, 2, half) * scale, -90.0, 90.0)
    tlon[:half] = (
        qlon[pick] + rng.uniform(-2, 2, half) * scale / np.maximum(
            np.cos(np.radians(np.clip(np.abs(tlat[:half]), 0, 89.9))), 1e-2
        ) + 180.0
    ) % 360.0 - 180.0

    # brute-force oracle: all pairs, no pruning
    expected: dict[int, list[tuple[int, float, int]]] = {}
    for qi in range(n_q):
        d = haversine_np(
            np.full(n_t, qlon[qi]), np.full(n_t, qlat[qi]), tlon, tlat
        )
        hits = sorted(
            ((round(float(d[ti]), 3), ti) for ti in np.nonzero(d <= radius_m)[0]),
        )[:k]
        expected[qi] = [(ti, dm, r + 1) for r, (dm, ti) in enumerate(hits)]
    assert sum(len(v) for v in expected.values()) > n_q // 2, "degenerate seed"

    q = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(qlon, qlat))],
        "query_id int, lon double, lat double",
    )
    t = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(tlon, tlat))],
        "target_id int, lon double, lat double",
    )
    rows = reverse_geocode(q, t, k=k, radius_m=radius_m, res=res).collect()
    got: dict[int, list[tuple[int, float, int]]] = {i: [] for i in range(n_q)}
    for r in rows:
        got[r["query_id"]].append((r["target_id"], r["distance_m"], r["rank"]))
    for qi in range(n_q):
        got[qi].sort(key=lambda x: x[2])
        assert got[qi] == expected[qi], (
            f"seed={seed} query={qi} at ({qlon[qi]}, {qlat[qi]}): "
            f"engine={got[qi]} oracle={expected[qi]}"
        )
