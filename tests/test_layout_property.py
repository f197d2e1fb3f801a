"""Randomized sweep of the Z-order serving path: pruned-lake reverse
geocode (`plans/layout.reverse_geocode_lake`) vs the same kNN over a
full scan of the identical lake.

The kNN operator itself is swept against brute force in
test_knn_property.py, so equality here isolates exactly the layer this
file owns: Morton window derivation (radius padding, antimeridian
wrap, polar caps, quad-boundary queries), window merging, and the
footer-stats file pruning — an under-covering window set silently
drops in-radius results from the pruned scan, which no single fixed
query layout can be trusted to catch.

Clouds mix uniform, polar (|lat| > 89), antimeridian (|lon| > 179.5),
and exact quad-corner points at the sweep's own prefix_bits; radius,
kNN ring res, k, prefix width, and the lake's Morton key resolution
all vary per case."""

from __future__ import annotations

import numpy as np
import pytest

from mimirsbrunn_spark.operators.knn import reverse_geocode
from mimirsbrunn_spark.plans.layout import (
    reverse_geocode_lake,
    windows_pruned_fraction,
    write_spatially_clustered,
)

CASES = [
    # (seed, n_targets, radius_m, res, k, prefix_bits, key_res, expect_pruning)
    (13, 2500, 500_000.0, 4, 3, 6, 12, False),
    (43, 2500, 25_000.0, 6, 2, 8, 12, True),  # local radius → files must prune
    (97, 2000, 2_000_000.0, 3, 4, 5, 10, False),  # huge radius, coarse key
]


def _cloud(rng: np.random.Generator, n: int, prefix_bits: int):
    kind = rng.random(n)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-85.0, 85.0, n)
    polar = kind < 0.2
    lat[polar] = np.where(rng.random(polar.sum()) < 0.5, 1.0, -1.0) * rng.uniform(
        89.0, 90.0, polar.sum()
    )
    anti = (kind >= 0.2) & (kind < 0.4)
    lon[anti] = np.where(rng.random(anti.sum()) < 0.5, 1.0, -1.0) * rng.uniform(
        179.5, 180.0, anti.sum()
    )
    # exact quad corners of THIS sweep's prefix grid — the boundary rows
    # where an off-by-one in window derivation would bite
    corner = kind >= 0.9
    qw, qh = 360.0 / (1 << prefix_bits), 180.0 / (1 << prefix_bits)
    lon[corner] = (
        np.round((lon[corner] + 180.0) / qw) * qw - 180.0
    ).clip(-180.0, 180.0)
    lat[corner] = (np.round((lat[corner] + 90.0) / qh) * qh - 90.0).clip(-90.0, 90.0)
    return lon, lat


@pytest.mark.parametrize(
    "seed,n_t,radius_m,res,k,prefix_bits,key_res,expect_pruning", CASES
)
def test_pruned_lake_equals_full_scan(
    spark, tmp_path, seed, n_t, radius_m, res, k, prefix_bits, key_res, expect_pruning
):
    rng = np.random.default_rng(seed)
    n_q = 25
    if expect_pruning:
        # a real serving batch is spatially local — a city's worth of
        # /reverse — which is the shape where file pruning shows; a
        # globe-spread batch legitimately touches every file of a
        # small lake
        clon, clat = rng.uniform(-170, 170), rng.uniform(-60, 60)
        qlon = np.clip(clon + rng.uniform(-1.0, 1.0, n_q), -180.0, 180.0)
        qlat = np.clip(clat + rng.uniform(-1.0, 1.0, n_q), -90.0, 90.0)
    else:
        qlon, qlat = _cloud(rng, n_q, prefix_bits)
    tlon, tlat = _cloud(rng, n_t, prefix_bits)
    # densify half the targets around the queries so small radii still
    # return hits (a sweep that returns nothing proves nothing)
    half = n_t // 2
    pick = rng.integers(0, n_q, half)
    scale = radius_m / 111_320.0
    tlat[:half] = np.clip(qlat[pick] + rng.uniform(-2, 2, half) * scale, -90.0, 90.0)
    tlon[:half] = (
        qlon[pick]
        + rng.uniform(-2, 2, half)
        * scale
        / np.maximum(np.cos(np.radians(np.clip(np.abs(tlat[:half]), 0, 89.9))), 1e-2)
        + 180.0
    ) % 360.0 - 180.0

    targets = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(tlon, tlat))],
        "target_id long, lon double, lat double",
    )
    path = str(tmp_path / "lake")
    key = write_spatially_clustered(targets, path, res=key_res, n_files=8)
    queries = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(qlon, qlat))],
        "query_id long, lon double, lat double",
    )

    full = reverse_geocode(
        queries, spark.read.parquet(path), k=k, radius_m=radius_m, res=res
    )
    lake, info = reverse_geocode_lake(
        spark, path, queries, k=k, radius_m=radius_m, res=res,
        key_col=key, prefix_bits=prefix_bits, return_scan_info=True,
    )
    a = sorted(tuple(r) for r in full.collect())
    b = sorted(tuple(r) for r in lake.collect())
    assert len(a) > n_q // 2, f"seed {seed}: degenerate (almost no hits)"
    assert a == b, (
        f"seed {seed}: pruned lake result diverged from full scan "
        f"({len(a)} vs {len(b)} rows) — window under/over-coverage"
    )
    if expect_pruning:
        frac = windows_pruned_fraction(path, info["windows"], key)
        assert frac > 0.0, f"seed {seed}: local-radius batch pruned no files"
