"""Non-vacuity guard for the octagon driver gate (VERDICT r03 #1).

The gate's value is that the HARD branches of geofinder.get fire at
driver scale; if the family geometry drifts (an octagon moved/resized)
the gate could silently degenerate back to trivial nesting. This pins:
zone-type collision, memo acceptance beyond geometry, unindexed-ancestor
type blocking, both-untyped acceptance, orphan-parent walk — each firing
on the sf0.01 point cloud — plus DuckDB-oracle == Python-replay equality
(independent of Spark; the Spark paths are gate-checked in
test_gate_oracle.py).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from mimirsbrunn_spark.gate_octagon import OCT_FAMILY, _oct_ring, octagon_oracle_sql
from mimirsbrunn_spark.geofinder import AdminGeoFinder
from mimirsbrunn_spark.geometry import mp_to_wkb, points_in_multipolygon

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def family():
    fd = AdminGeoFinder()
    mps = {}
    for aid, zt, pid, cx, cy, r, h in OCT_FAMILY:
        if cx is not None:
            mps[aid] = [[_oct_ring(cx, cy, r, h)]]
        fd.insert_wkb(aid, zt, pid, None if cx is None else mp_to_wkb(mps[aid]))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    pts = con.execute(
        """SELECT o_orderkey,
           (CAST(o_orderkey AS BIGINT) * 2654435761) % 360000000 / 1000000.0 - 180.0,
           (CAST(o_orderkey AS BIGINT) * 40503 + 7) % 180000000 / 1000000.0 - 90.0
           FROM orders"""
    ).fetchall()
    oracle = set(map(tuple, con.execute(octagon_oracle_sql()).fetchall()))
    return fd, mps, pts, oracle


def _inside(mps, aid, lon, lat):
    return bool(points_in_multipolygon(np.array([lon]), np.array([lat]), mps[aid])[0])


def test_oracle_matches_python_replay_and_branches_fire(family):
    fd, mps, pts, oracle = family
    py_rows = set()
    stats = dict(collision_AB=0, memo_S_outside=0, E_blocked=0, E_attached=0,
                 UV_both=0, U_attached=0)
    for pid_, lon, lat in pts:
        got = [r.id for r in fd.get(lon, lat)]
        for pos, aid in enumerate(got, 1):
            py_rows.add((pid_, aid, pos))
        in_a = _inside(mps, "oct:t:A", lon, lat)
        if in_a and _inside(mps, "oct:t:B", lon, lat):
            stats["collision_AB"] += 1
            assert "oct:t:B" not in got  # same-zone-type skip
        if "oct:s:S" in got and not _inside(mps, "oct:s:S", lon, lat):
            stats["memo_S_outside"] += 1  # memo-accept beyond geometry
        if in_a and _inside(mps, "oct:d:E", lon, lat):
            stats["E_blocked"] += 1
            assert "oct:d:E" not in got  # blocked by UNINDEXED ancestor D
        if "oct:d:E" in got:
            stats["E_attached"] += 1
        if "oct:u:U" in got and "oct:u:V" in got:
            stats["UV_both"] += 1  # untyped never zone-blocked
        if "oct:u:U" in got:
            stats["U_attached"] += 1  # orphan-parent walk terminated safely
    assert py_rows == oracle
    for k, n in stats.items():
        assert n >= 5, f"branch {k} fired only {n} times — family drifted vacuous"
