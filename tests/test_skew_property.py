"""Randomized join-equivalence sweep for resolution-salting (the skew
defense under every cell-keyed join): re-keying hot cells to their
res+k children on BOTH sides must preserve the join exactly.

The fixed-lattice tests pin one hot core; this sweep randomizes the
globe (including points snapped onto exact cell boundaries, where a
drift between `grid_cell_col`'s fine-res assignment and
`split_cells_to_children`'s integer enumeration would silently drop
every hot-cell join row) and the hot set. Property: fact⋈dim on the
salted key yields exactly one match per point — the same pairs as the
plain base-cell join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.skew import salted_cell_col, split_cells_to_children
from mimirsbrunn_spark.tiles import grid_cell_col

BASE_RES = 5


@pytest.mark.parametrize("seed", [17, 61, 139])
def test_salted_join_equals_base_cell_join(spark, seed):
    rng = random.Random(seed)
    cell_w = 360.0 / (1 << BASE_RES)  # base-res cell extent in lon
    cell_h = 180.0 / (1 << BASE_RES)
    rows = []
    for i in range(3000):
        if rng.random() < 0.15:
            # snap onto an exact base-cell boundary (corner or edge)
            lon = round(rng.randrange(-(1 << BASE_RES) // 2, (1 << BASE_RES) // 2) * cell_w, 10)
            lat = round(rng.randrange(-(1 << BASE_RES) // 2, (1 << BASE_RES) // 2) * cell_h, 10)
        else:
            lon = rng.uniform(-180.0, 180.0)
            lat = rng.uniform(-90.0, 90.0)
        rows.append((i, lon, lat))
    pts = spark.createDataFrame(rows, "point_id long, lon double, lat double")

    base_cells = [
        r["cell"]
        for r in pts.select(grid_cell_col("lon", "lat", BASE_RES).alias("cell"))
        .distinct()
        .collect()
    ]
    hot = sorted(rng.sample(base_cells, k=min(12, len(base_cells))))

    # dim side re-keys itself WITHOUT seeing the fact data: cold cells
    # keep the base key, hot cells expand to their res+2 children
    cold = [(c, c) for c in base_cells if c not in set(hot)]
    expanded = [(child, c) for c in hot for child in split_cells_to_children([c], 2)]
    dim = spark.createDataFrame(cold + expanded, "join_key long, dim_cell long")

    fact = pts.select(
        "point_id",
        grid_cell_col("lon", "lat", BASE_RES).alias("base_cell"),
        salted_cell_col("lon", "lat", BASE_RES, hot),
    )
    joined = fact.join(dim, fact["salted_cell"] == dim["join_key"]).select(
        "point_id", "base_cell", "dim_cell"
    )
    got = {r["point_id"]: (r["base_cell"], r["dim_cell"]) for r in joined.collect()}
    assert len(got) == joined.count(), f"seed {seed}: a point matched twice"
    assert set(got) == set(range(3000)), (
        f"seed {seed}: {3000 - len(got)} points dropped by the salted join "
        "(fine-res assignment drifted from the child enumeration)"
    )
    for pid, (base, dimc) in got.items():
        assert base == dimc, f"seed {seed} point {pid}: joined to the wrong cell"
