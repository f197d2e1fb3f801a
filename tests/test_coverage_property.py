"""Randomized sweep of the raster↔vector coverage join (G16).

The `coverage_cells` gate runs one fixed corpus/admin family; the
directed tests pin single branches. This sweep randomizes the part the
gate can't vary: the MIX of cover resolutions. Admin bboxes are drawn
across size classes so `admin_cell_cover` lands on several resolutions
at once — strictly coarser AND strictly finer than the raster — forcing
both `cell_coverage_join` branches (raster→ancestor equi-join and the
finer-cover rollup) plus the cross-resolution union + dedup in one call.

Oracle: the cover rows come from the engine (`admin_cell_cover` is
already exercised by the PIP sweeps); the JOIN itself is replayed with a
test-local integer ancestor function written from the cell-layout spec
(res*2^58 + i*2^29 + j), independent of both `tiles.grid_parent_np` and
the SQL `_ancestor_at` — a raster row matches an admin iff the finer of
(raster cell, cover cell) reprojects onto the coarser. Any divergence is
a join-key, branch-selection, or dedup defect in `cell_coverage_join`.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.geometry import mp_to_wkb
from mimirsbrunn_spark.operators.coverage import cell_coverage_join
from mimirsbrunn_spark.operators.pip import admin_cell_cover
from mimirsbrunn_spark.tiles import grid_cell_np

_RS, _IS = 2**58, 2**29


def _anc(cell: int, parent_res: int) -> int:
    """Test-local ancestor from the layout spec (not engine code)."""
    res, rem = divmod(cell, _RS)
    i, j = divmod(rem, _IS)
    s = res - parent_res
    assert s >= 0
    return parent_res * _RS + (i >> s) * _IS + (j >> s)


def _matches(raster_cell: int, res: int, cov_cell: int) -> bool:
    cres = cov_cell // _RS
    if cres <= res:
        return _anc(raster_cell, cres) == cov_cell
    return _anc(cov_cell, res) == raster_cell


def _rect_mp(cx: float, cy: float, hw: float, hh: float):
    ring = np.array(
        [[cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh], [cx - hw, cy + hh]]
    )
    return [[ring]]


# half-extents spanning the finder's size classes: ~0.03 deg -> res 8,
# ~0.7 -> res 6, ~4 -> res 4, ~30 -> res 2/0
_SIZES = [0.03, 0.05, 0.4, 0.7, 3.0, 5.0, 25.0, 40.0]


@pytest.mark.parametrize("seed,res", [(7, 5), (19, 4), (31, 7)])
def test_cell_coverage_join_matches_ancestor_replay(spark, seed, res):
    rng = np.random.default_rng(seed)
    fam = []
    for i, hw in enumerate(_SIZES):
        cx = float(rng.uniform(-120.0, 120.0))
        cy = float(rng.uniform(-60.0, 60.0))
        fam.append((f"cov:{i}", cx, cy, hw, hw * float(rng.uniform(0.5, 1.0))))
    admins = spark.createDataFrame(
        [(aid, "city", None, mp_to_wkb(_rect_mp(cx, cy, hw, hh)))
         for aid, cx, cy, hw, hh in fam],
        schema="id string, zone_type string, parent_id string, boundary_wkb binary",
    )

    cover = [(int(r["cell"]), r["id"]) for r in admin_cell_cover(admins).collect()]
    cov_res = {c // _RS for c, _ in cover}
    assert len(cov_res) >= 2, f"degenerate seed: single cover res {cov_res}"
    assert any(cr <= res for cr in cov_res) and any(cr > res for cr in cov_res), (
        f"seed={seed}: cover resolutions {sorted(cov_res)} don't straddle raster res {res}"
    )

    # raster: media cells clustered on the admins (plus strays far away)
    n = 300
    pick = rng.integers(0, len(fam), n)
    lon = np.array([fam[p][1] for p in pick]) + rng.uniform(-1.5, 1.5, n) * np.array(
        [fam[p][3] for p in pick]
    )
    lat = np.array([fam[p][2] for p in pick]) + rng.uniform(-1.5, 1.5, n) * np.array(
        [fam[p][4] for p in pick]
    )
    lon = np.clip(lon, -179.9, 179.9)
    lat = np.clip(lat, -89.9, 89.9)
    cells = grid_cell_np(lon, lat, res)
    raster_rows = [
        (int(c), f"d{k}", f"m{k}") for k, c in enumerate(cells)
    ]
    raster = spark.createDataFrame(raster_rows, "cell long, doc_id string, media_ref string")

    expected = {
        (aid, c, d, m)
        for c, d, m in raster_rows
        for cov_cell, aid in cover
        if _matches(c, res, cov_cell)
    }
    assert expected, "degenerate seed: no raster cell covered by any admin"

    got = {
        (r["admin_id"], r["cell"], r["doc_id"], r["media_ref"])
        for r in cell_coverage_join(raster, admins, res).collect()
    }
    assert got == expected, f"seed={seed} res={res} diff={got ^ expected}"

    # rollup consistency on the same expected set
    exp_stats = {}
    for aid, c, d, m in expected:
        n_media, cs = exp_stats.setdefault(aid, [0, set()])
        exp_stats[aid][0] += 1
        exp_stats[aid][1].add(c)
    got_stats = {
        r["admin_id"]: (r["n_media"], r["n_cells"])
        for r in cell_coverage_join(raster, admins, res)
        .groupBy("admin_id")
        .agg(F.count("*").alias("n_media"), F.countDistinct("cell").alias("n_cells"))
        .collect()
    }
    assert got_stats == {a: (v[0], len(v[1])) for a, v in exp_stats.items()}


def test_cell_coverage_join_empty_cover(spark):
    """All-None boundaries -> no cover rows -> empty result with the
    documented schema (admin_id + raster columns), not a crash."""
    admins = spark.createDataFrame(
        [("a:0", "city", None, None)],
        schema="id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    raster = spark.createDataFrame(
        [(5 * _RS + 3 * _IS + 4, "d0", "m0")], "cell long, doc_id string, media_ref string"
    )
    out = cell_coverage_join(raster, admins, 5)
    assert out.columns == ["admin_id", "cell", "doc_id", "media_ref"]
    assert out.count() == 0
