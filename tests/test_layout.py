"""Z-order layout: Morton key cross-engine identity, cluster-on-write
file pruning (parquet footer stats), pushed-filter plan shape, and the
result-transparency the gate relies on.

Reference relationship: ES geohash-bucketed index routing
(config/elasticsearch/templates/components/mimir-base.json geo fields)
is mimirsbrunn's implicit spatial layout; the parquet lake makes it an
explicit curve key (see mimirsbrunn_spark/plans/layout.py docstring).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.gate_points import points_from_orders
from mimirsbrunn_spark.plans.layout import (
    bbox_scan,
    file_key_ranges,
    pruned_file_fraction,
    write_spatially_clustered,
    zrange_scan,
)
from mimirsbrunn_spark.tiles import (
    morton_interleave_int,
    morton_key_col,
    morton_key_np,
    morton_window,
)

SF_DIR = "/root/testdata/sf0.001"


def test_morton_interleave_bits():
    # i fills even bits, j odd bits
    assert morton_interleave_int(0b101, 0b011) == 0b011011
    assert morton_interleave_int(0, 0) == 0
    n21 = (1 << 21) - 1
    assert morton_interleave_int(n21, n21) == (1 << 42) - 1


def test_morton_col_matches_np(spark):
    pts = points_from_orders(spark, SF_DIR).limit(500)
    rows = pts.select("lon", "lat", morton_key_col("lon", "lat", 12)).collect()
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    expect = morton_key_np(lon, lat, 12)
    got = np.array([r.z_12 for r in rows])
    assert (expect == got).all()


def test_morton_window_is_exact_quad_key_set():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    keys = morton_key_np(lon, lat, 12)
    lo, hi = morton_window(2.35, 48.85, res=12, prefix_bits=2)
    in_win = (keys >= lo) & (keys <= hi)
    # membership in the window == membership in the quad (same i/j prefix)
    qlon = (lon >= 0.0) & (lon < 90.0)  # prefix 2 of i: 4 quads of 90 deg
    qlat = (lat >= 45.0) & (lat < 90.0)  # prefix 2 of j: 4 quads of 45 deg
    assert (in_win == (qlon & qlat)).all()


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zlayout") / "pts")
    pts = points_from_orders(spark, SF_DIR)
    key = write_spatially_clustered(pts, path, res=12, n_files=8)
    return path, key


def test_clustered_scan_result_transparent(spark, clustered):
    path, key = clustered
    lo, hi = morton_window(2.35, -60.0, res=12, prefix_bits=2)
    got = {r.point_id for r in zrange_scan(spark, path, lo, hi, key).collect()}
    direct = {
        r.point_id
        for r in points_from_orders(spark, SF_DIR)
        .withColumn(key, morton_key_col("lon", "lat", 12))
        .filter(F.col(key).between(lo, hi))
        .collect()
    }
    assert got == direct and len(got) > 0


def test_clustered_files_prune_unclustered_dont(spark, clustered, tmp_path):
    path, key = clustered
    ranges = file_key_ranges(path, key)
    assert len(ranges) >= 6  # range partitioner actually split the keyspace
    # near-disjoint: each boundary overlaps at most its neighbour
    ordered = sorted(ranges, key=lambda r: r[1])
    for (_, _, mx), (_, mn2, _) in zip(ordered, ordered[1:]):
        assert mx <= mn2
    lo, hi = morton_window(2.35, -60.0, res=12, prefix_bits=2)
    frac = pruned_file_fraction(path, lo, hi, key)
    assert frac >= 0.5, f"clustered layout pruned only {frac:.2f}"

    # same rows, unclustered: every file spans ~the whole keyspace -> no pruning
    flat = str(tmp_path / "flat")
    (
        points_from_orders(spark, SF_DIR)
        .withColumn(key, morton_key_col("lon", "lat", 12))
        .repartition(8)
        .write.parquet(flat)
    )
    assert pruned_file_fraction(flat, lo, hi, key) == 0.0


def test_zrange_filter_is_pushed_to_scan(spark, clustered):
    path, key = clustered
    lo, hi = morton_window(2.35, 48.85, res=12, prefix_bits=2)
    plan = zrange_scan(spark, path, lo, hi, key)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert f"GreaterThanOrEqual({key}," in plan and f"LessThanOrEqual({key}," in plan


def test_bbox_scan_union_of_windows(spark, clustered):
    path, key = clustered
    w1 = morton_window(2.35, -60.0, res=12, prefix_bits=2)
    w2 = morton_window(-100.0, -60.0, res=12, prefix_bits=2)
    got = {r.point_id for r in bbox_scan(spark, path, [w1, w2], key).collect()}
    per = set()
    for lo, hi in (w1, w2):
        per |= {r.point_id for r in zrange_scan(spark, path, lo, hi, key).collect()}
    assert got == per and len(got) > 0


def test_job_zorder_output_layout(spark, fixtures_dir, tmp_path):
    """--output-layout zorder publishes points_indexed with near-disjoint
    per-file Morton ranges and the z_12 key column; row content matches a
    plain-layout run of the same job."""
    import json
    from pathlib import Path

    import jobs.index_corpus as job
    from mimirsbrunn_spark.sources.lifecycle import read_published

    outz = str(tmp_path / "out_z")
    job.main([
        "--docs", f"{fixtures_dir}/docs.parquet",
        "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", outz, "--res", "7",
        "--output-layout", "zorder", "--output-files", "8",
    ])
    report = json.loads((Path(outz) / "run_report.json").read_text())
    assert report["output_layout"] == "zorder"

    pub = read_published(spark, outz, "points_indexed")
    assert "z_12" in pub.columns

    root = Path(outz) / "points_indexed"
    gen = json.loads((root / "_CURRENT").read_text())["generation"]
    ranges = file_key_ranges(str(root / gen), "z_12")
    assert len(ranges) >= 4
    ordered = sorted(ranges, key=lambda r: r[1])
    for (_, _, mx), (_, mn2, _) in zip(ordered, ordered[1:]):
        assert mx <= mn2

    outp = str(tmp_path / "out_p")
    job.main([
        "--docs", f"{fixtures_dir}/docs.parquet",
        "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", outp, "--res", "7",
    ])
    plain = read_published(spark, outp, "points_indexed")
    a = {tuple(r) for r in pub.drop("z_12").select("point_uid", "lon", "lat").collect()}
    b = {tuple(r) for r in plain.select("point_uid", "lon", "lat").collect()}
    assert a == b


def test_reverse_geocode_lake_equals_full_scan(spark, tmp_path):
    """Pruned lake serving == full-scan reverse_geocode, including a
    query on a quad boundary and one at the antimeridian; and the scan
    it builds really skips most files."""
    import numpy as np

    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.plans.layout import reverse_geocode_lake

    rng = np.random.default_rng(11)
    n = 4000
    lon = np.concatenate([
        rng.uniform(-180, 180, n - 200),
        rng.uniform(179.95, 180.0, 100),     # antimeridian east edge
        rng.uniform(-180.0, -179.95, 100),   # antimeridian west edge
    ])
    lat = rng.uniform(-80, 80, n)
    targets = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(n)],
        "target_id long, lon double, lat double",
    )
    path = str(tmp_path / "addr_lake")
    key = write_spatially_clustered(targets, path, res=12, n_files=8)

    # quad size at prefix_bits=6 is 5.625 x 2.8125 deg; 0.0 sits on a
    # quad boundary, 179.999 wraps, others are interior
    qs = [(0, 0.0001, 0.0001), (1, 179.999, 10.0), (2, -179.999, 10.0),
          (3, 12.3, 45.6), (4, -77.0, -33.0)]
    queries = spark.createDataFrame(qs, "query_id long, lon double, lat double")

    full = reverse_geocode(
        queries, spark.read.parquet(path), k=3, radius_m=500_000.0, res=4
    )
    lake = reverse_geocode_lake(
        spark, path, queries, k=3, radius_m=500_000.0, res=4,
        key_col=key, prefix_bits=6,
    )
    a = sorted(tuple(r) for r in full.collect())
    b = sorted(tuple(r) for r in lake.collect())
    assert a == b and len(a) > 0


def test_reverse_geocode_lake_key_res_follows_key_col(spark, tmp_path):
    """A lake clustered at res 10 must be scanned with res-10 windows:
    key_res now derives from the z_<res> column name, so the default no
    longer silently filters z_10 keys against res-12 windows (empty
    results). A non-convention key_col without an explicit key_res is
    refused loudly."""
    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.plans.layout import reverse_geocode_lake

    rng = np.random.default_rng(7)
    n = 800
    targets = spark.createDataFrame(
        [(int(i), float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10))) for i in range(n)],
        "target_id long, lon double, lat double",
    )
    path = str(tmp_path / "lake_r10")
    key = write_spatially_clustered(targets, path, res=10, n_files=4)
    assert key == "z_10"
    queries = spark.createDataFrame(
        [(0, 0.5, 0.5), (1, -5.0, 3.0)], "query_id long, lon double, lat double"
    )
    full = reverse_geocode(
        queries, spark.read.parquet(path), k=2, radius_m=300_000.0, res=4
    )
    lake = reverse_geocode_lake(
        spark, path, queries, k=2, radius_m=300_000.0, res=4,
        key_col=key, prefix_bits=6,
    )
    a = sorted(tuple(r) for r in full.collect())
    b = sorted(tuple(r) for r in lake.collect())
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="key_res"):
        reverse_geocode_lake(spark, path, queries, key_col="morton")


def test_reverse_geocode_lake_tolerates_invalid_coords(spark, tmp_path):
    """A null/NaN/out-of-range coordinate in the batch must not kill the
    whole job with a driver TypeError inside window derivation — the row
    is dropped and counted in the scan info."""
    from mimirsbrunn_spark.plans.layout import reverse_geocode_lake

    targets = spark.createDataFrame(
        [(i, 1.0 + i * 0.001, 1.0) for i in range(50)],
        "target_id long, lon double, lat double",
    )
    path = str(tmp_path / "lake_inv")
    write_spatially_clustered(targets, path, res=12, n_files=2)
    queries = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, None, 1.0), (2, float("nan"), 1.0), (3, 999.0, 1.0)],
        "query_id long, lon double, lat double",
    )
    out, info = reverse_geocode_lake(
        spark, path, queries, k=1, radius_m=100_000.0, res=4,
        return_scan_info=True,
    )
    assert info["n_queries"] == 4 and info["n_invalid_coords"] == 3
    got = {r["query_id"] for r in out.collect()}
    assert 0 in got


def test_reverse_geocode_lake_refuses_corpus_batch(spark, tmp_path):
    from mimirsbrunn_spark.plans.layout import reverse_geocode_lake

    targets = spark.range(10).select(
        F.col("id").alias("target_id"), F.lit(1.0).alias("lon"), F.lit(1.0).alias("lat")
    )
    path = str(tmp_path / "tiny_lake")
    write_spatially_clustered(targets, path, res=12, n_files=2)
    big = spark.range(50).select(
        F.col("id").alias("query_id"), F.lit(1.0).alias("lon"), F.lit(1.0).alias("lat")
    )
    with pytest.raises(ValueError, match="max_query_batch"):
        reverse_geocode_lake(spark, path, big, max_query_batch=10)


def test_compact_published_preserves_cluster_key(spark, tmp_path):
    """Compaction with cluster_key re-clusters on the Morton key, so the
    new generation prunes like the original clustered write; the default
    coalesce path on the same pileup yields files spanning the whole
    keyspace (fraction 0) — the regression the knob exists to prevent."""
    import json
    from pathlib import Path

    from mimirsbrunn_spark.plans import compact_published
    from mimirsbrunn_spark.sources import publish_table, read_published
    from mimirsbrunn_spark.tiles import with_morton_key

    rng = np.random.default_rng(3)
    n = 300_000
    pts = spark.createDataFrame(
        [(int(i), float(lo), float(la)) for i, (lo, la) in enumerate(
            zip(rng.uniform(-180, 180, n), rng.uniform(-90, 90, n))
        )],
        "point_uid long, lon double, lat double",
    )
    keyed = with_morton_key(pts, res=12)
    base = str(tmp_path / "tables")
    for name in ("a", "b"):
        publish_table(keyed.repartition(24), base, name)  # random pileup

    compact_published(spark, base, "a", target_file_mb=1, cluster_key="z_12")
    compact_published(spark, base, "b", target_file_mb=1)

    lo, hi = morton_window(2.35, 48.85, res=12, prefix_bits=4)
    fracs, gens = {}, {}
    for name in ("a", "b"):
        root = Path(base) / name
        gen = json.loads((root / "_CURRENT").read_text())["generation"]
        gens[name] = str(root / gen)
        fracs[name] = pruned_file_fraction(gens[name], lo, hi, "z_12")
    n_files_a = len(list(Path(gens["a"]).glob("*.parquet")))
    assert n_files_a >= 2
    assert fracs["a"] >= 0.5, fracs
    assert fracs["b"] == 0.0, fracs
    # rows survive both paths
    assert read_published(spark, base, "a").count() == n
    assert read_published(spark, base, "b").count() == n


def test_bbox_scan_empty_windows_is_empty_not_crash(spark, clustered):
    """No windows = nothing can match: an all-rejected serving batch
    derives [] and must get a schema-correct empty scan, not
    filter(None)."""
    path, key = clustered
    out = bbox_scan(spark, path, [], key)
    assert out.count() == 0
    assert out.schema == spark.read.parquet(path).schema


def test_derive_query_windows_polar_query_bounded(spark):
    """A near-pole query's lon padding caps at the full wrap (180 deg)
    instead of spinning the driver through millions of quad steps; the
    capped window set still covers every lon at the query latitude."""
    import time as _t

    from mimirsbrunn_spark.plans.layout import derive_query_windows

    t0 = _t.monotonic()
    wins = derive_query_windows([(0.0, 89.95)], radius_m=400_000.0)
    assert _t.monotonic() - t0 < 5.0
    # bounded: at most the full quad grid row count x lat rows, far
    # below the millions the uncapped dlon produced
    assert 0 < len(wins) <= 4096
    for lon in (-179.5, -90.0, 0.0, 90.0, 179.5):
        k = morton_window(lon, 89.95, res=12, prefix_bits=6)
        assert any(lo <= k[0] and k[1] <= hi for lo, hi in wins), lon
