"""Randomized property sweep of the octagon G5 oracle (VERDICT r04 #8):
``geofinder.get`` (the engine's candidate fold, driver-side — the same
code both PIP strategies replay) against the fully independent DuckDB
recursive-CTE replay, over random point clouds.

Drift target: the oracle inlines the parent walk as a precomputed
ancestor closure and replays the fold edge-wise — any divergence
between that inlining and the live ``geofinder.get`` loop (ordering,
memo-acceptance, zone-type blocking, untyped ranks, dangling parents)
shows up as a mismatched attachment list for some random point."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from mimirsbrunn_spark.gate_octagon import (
    OCT_FAMILY,
    _oct_ring,
    octagon_oracle_sql,
)
from mimirsbrunn_spark.geofinder import AdminGeoFinder, AdminRec
from mimirsbrunn_spark.geometry import mp_to_wkb, wkb_to_mp

N_POINTS = 400


def _finder() -> AdminGeoFinder:
    finder = AdminGeoFinder()
    for aid, zt, pid, cx, cy, r, h in OCT_FAMILY:
        mp = [] if cx is None else wkb_to_mp(mp_to_wkb([[_oct_ring(cx, cy, r, h)]]))
        finder.insert(AdminRec(id=aid, zone_type=zt, parent_id=pid, mp=mp))
    return finder


def _oracle(lon: np.ndarray, lat: np.ndarray) -> dict[int, list[str]]:
    import pandas as pd

    con = duckdb.connect()
    cloud = pd.DataFrame(
        {"point_id": np.arange(len(lon), dtype=np.int64), "lon": lon, "lat": lat}
    )
    con.register("sweep_pts", cloud)
    sql = octagon_oracle_sql("SELECT point_id, lon, lat FROM sweep_pts")
    out: dict[int, list[str]] = {}
    for pid, aid, pos in con.execute(sql).fetchall():
        out.setdefault(int(pid), []).append((int(pos), aid))
    return {k: [a for _, a in sorted(v)] for k, v in out.items()}


@pytest.mark.parametrize("seed", range(24))
def test_octagon_oracle_random_cloud(seed):
    rng = np.random.default_rng(seed)
    # uniform over the family's extent plus an outside margin; a slice of
    # each cloud is pinned NEAR edges (within ±0.3 of an octagon vertex
    # band) where fold-order and crossing arithmetic actually bite
    lon = rng.uniform(-85.0, 85.0, N_POINTS)
    lat = rng.uniform(-85.0, 85.0, N_POINTS)
    k = N_POINTS // 4
    vx = []
    for aid, zt, pid, cx, cy, r, h in OCT_FAMILY:
        if cx is not None:
            vx.extend(_oct_ring(cx, cy, r, h).tolist())
    vx = np.asarray(vx)
    pick = rng.integers(0, len(vx), k)
    lon[:k] = vx[pick, 0] + rng.uniform(-0.3, 0.3, k)
    lat[:k] = vx[pick, 1] + rng.uniform(-0.3, 0.3, k)

    finder = _finder()
    engine = {
        i: [a.id for a in finder.get(float(lo), float(la))]
        for i, (lo, la) in enumerate(zip(lon, lat))
    }
    engine = {i: v for i, v in engine.items() if v}
    oracle = _oracle(lon, lat)
    assert engine == oracle
    # non-vacuity: the cloud must exercise multi-admin attachments
    assert any(len(v) >= 3 for v in engine.values())
