"""Streaming reverse-geocode serving: micro-batched query files against
the Z-clustered lake, pinned to the batch operator (`reverse_geocode` on
a full scan = `reverse_geocode_lake` = the streamed union), and
replay-idempotent under the batch_id-overwrite recipe."""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.knn import reverse_geocode
from mimirsbrunn_spark.plans.layout import write_spatially_clustered
from mimirsbrunn_spark.streaming.serving import reverse_geocode_stream


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 3000
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(40, 52, n)
    targets = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(n)],
        "target_id long, lon double, lat double",
    )
    path = str(tmp_path_factory.mktemp("serve") / "lake")
    key = write_spatially_clustered(targets, path, res=12, n_files=8)
    return path, key


def _write_query_files(spark, dst: Path, batches):
    dst.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "query_id long, lon double, lat double")
        stage = dst.parent / f"stage_{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        for f in Path(stage).glob("*.parquet"):
            shutil.copy(f, dst / f"queries_{i}.parquet")


def test_stream_serving_matches_batch(spark, lake, tmp_path):
    lake_path, key = lake
    batches = [
        [(0, 2.35, 48.85), (1, -0.57, 44.84)],
        [(2, 5.37, 43.30), (3, 4.85, 45.75), (4, 7.27, 47.70)],
    ]
    qdir = tmp_path / "queries"
    _write_query_files(spark, qdir, batches)

    q = reverse_geocode_stream(
        spark,
        str(qdir),
        lake_path,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        k=3,
        radius_m=400_000.0,
        res=5,
        key_col=key,
        max_files_per_trigger=1,  # forces >=2 micro-batches
    )
    q.awaitTermination(120)

    all_queries = spark.createDataFrame(
        [r for b in batches for r in b], "query_id long, lon double, lat double"
    )
    expected = reverse_geocode(
        all_queries, spark.read.parquet(lake_path), k=3, radius_m=400_000.0, res=5
    )
    got = spark.read.option("basePath", str(tmp_path / "out")).parquet(
        str(tmp_path / "out")
    )
    a = sorted(
        tuple(r)
        for r in got.select("query_id", "target_id", "distance_m", "rank").collect()
    )
    b = sorted(tuple(r) for r in expected.collect())
    assert a == b and len(a) > 0
    # really micro-batched: one batch_id dir per trigger file
    assert len(list((tmp_path / "out").glob("batch_id=*"))) >= 2


def test_stream_serving_replay_idempotent(spark, lake, tmp_path):
    """Restarting from the same checkpoint after new files arrive serves
    only the new batch; the union never duplicates a (query_id, rank)."""
    lake_path, key = lake
    qdir = tmp_path / "queries"
    _write_query_files(spark, qdir, [[(0, 2.35, 48.85)]])

    kw = dict(
        k=2, radius_m=400_000.0, res=5, key_col=key, max_files_per_trigger=1
    )
    q = reverse_geocode_stream(
        spark, str(qdir), lake_path,
        str(tmp_path / "out"), str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination(120)
    first = spark.read.parquet(str(tmp_path / "out")).count()
    assert first > 0

    # second wave of queries, same checkpoint dir
    _write_query_files(spark, tmp_path / "q2", [[(10, -0.57, 44.84)]])
    shutil.copy(
        next((tmp_path / "q2").glob("*.parquet")), qdir / "queries_wave2.parquet"
    )
    q = reverse_geocode_stream(
        spark, str(qdir), lake_path,
        str(tmp_path / "out"), str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    pairs = [tuple(r) for r in got.select("query_id", "rank").collect()]
    assert len(pairs) == len(set(pairs))  # no duplicates across restarts
    assert got.filter(F.col("query_id") == 10).count() > 0


def test_serve_reverse_job_batch(spark, lake, tmp_path):
    """spark-submit entry (batch mode) against a PUBLISHED lake: resolves
    _CURRENT, serves, writes results + a run_report with the pruning
    fraction."""
    import json

    import jobs.serve_reverse as job
    from mimirsbrunn_spark.sources import publish_table

    lake_path, key = lake
    base = str(tmp_path / "pub")
    publish_table(spark.read.parquet(lake_path), base, "addr")

    qdir = tmp_path / "q"
    _write_query_files(spark, qdir, [[(0, 2.35, 48.85), (1, -0.57, 44.84)]])
    out = str(tmp_path / "out")
    job.main([
        "--lake", base, "--name", "addr", "--queries", str(qdir),
        "--out", out, "--k", "3", "--radius-m", "400000", "--res", "5",
        "--key-col", key,
    ])
    report = json.loads((tmp_path / "out" / "_run_report.json").read_text())
    assert report["mode"] == "batch" and report["n_queries"] == 2
    assert report["n_results"] == spark.read.parquet(out).count() > 0
    assert 0.0 <= report["lake_files_pruned_fraction"] <= 1.0
    # /metrics + /status artifacts (handlers.rs:386-414 port)
    prom = (tmp_path / "out" / "_metrics.prom").read_text()
    assert (
        'bragi_http_requests_total{handler="reverse",method="GET",status="200"} 2'
        in prom
    )
    assert "bragi_http_request_duration_seconds_count" in prom
    status = json.loads((tmp_path / "out" / "_status.json").read_text())
    assert status["elasticsearch"]["health"] == "green"


def test_serve_reverse_job_stream(spark, lake, tmp_path):
    import json

    import jobs.serve_reverse as job

    lake_path, key = lake
    qdir = tmp_path / "q"
    _write_query_files(spark, qdir, [[(0, 2.35, 48.85)], [(1, 5.37, 43.30)]])
    out = str(tmp_path / "out")
    job.main([
        "--lake", lake_path, "--queries", str(qdir), "--out", out,
        "--stream", "--checkpoint", str(tmp_path / "ck"),
        "--k", "2", "--radius-m", "400000", "--res", "5", "--key-col", key,
    ])
    report = json.loads((tmp_path / "out" / "_run_report.json").read_text())
    assert report["mode"] == "stream" and report["n_results"] > 0


def test_serve_reverse_rejects_invalid(spark, lake, tmp_path):
    """Request-boundary validation: typed errors for bad parameters,
    per-row drops (counted) for invalid coordinates."""
    import json

    import jobs.serve_reverse as job
    from mimirsbrunn_spark.functions.bragi_api import ValidationError

    lake_path, key = lake
    qdir = tmp_path / "q"
    _write_query_files(spark, qdir, [[
        (0, 2.35, 48.85),          # valid
        (1, 200.0, 48.85),         # lon out of range
        (2, 2.35, 91.0),           # lat out of range
        (3, float("nan"), 48.85),  # NaN lon
    ]])
    out = str(tmp_path / "out")

    with pytest.raises(ValidationError):
        job.main(["--lake", lake_path, "--queries", str(qdir), "--out", out,
                  "--k", "0", "--key-col", key])
    with pytest.raises(ValidationError):
        job.main(["--lake", lake_path, "--queries", str(qdir), "--out", out,
                  "--radius-m", "-5", "--key-col", key])

    job.main(["--lake", lake_path, "--queries", str(qdir), "--out", out,
              "--k", "2", "--radius-m", "400000", "--res", "5", "--key-col", key])
    report = json.loads((tmp_path / "out" / "_run_report.json").read_text())
    assert report["n_queries"] == 1 and report["n_rejected"] == 3
    got = spark.read.parquet(out)
    assert got.select("query_id").distinct().collect() == [tuple([0])] or \
        [r.query_id for r in got.select("query_id").distinct().collect()] == [0]


def test_stream_batch_reports(spark, lake, tmp_path):
    """Every micro-batch leaves a _batch_report.json with its pruning
    audit; the job's stream report aggregates them."""
    import json

    import jobs.serve_reverse as job

    lake_path, key = lake
    qdir = tmp_path / "q"
    _write_query_files(spark, qdir, [
        [(0, 2.35, 48.85), (100, 999.0, 0.0)],  # one valid, one rejected
        [(1, 5.37, 43.30)],
    ])
    out = str(tmp_path / "out")
    job.main(["--lake", lake_path, "--queries", str(qdir), "--out", out,
              "--stream", "--checkpoint", str(tmp_path / "ck"),
              "--k", "2", "--radius-m", "400000", "--res", "5", "--key-col", key])

    # availableNow may drain both files in one micro-batch — assert the
    # totals, not the batching
    reports = sorted(Path(out).glob("batch_id=*/_batch_report.json"))
    assert len(reports) >= 1
    per_batch = [json.loads(p.read_text()) for p in reports]
    assert all(0.0 <= r["lake_files_pruned_fraction"] <= 1.0 for r in per_batch)
    assert all(r["n_scan_windows"] > 0 for r in per_batch)

    agg = json.loads((Path(out) / "_run_report.json").read_text())
    assert agg["mode"] == "stream" and agg["n_batches"] == len(reports)
    assert agg["n_queries"] == 2 and agg["n_rejected"] == 1
    assert 0.0 <= agg["lake_files_pruned_fraction"] <= 1.0
    assert agg["n_results"] > 0


def test_stream_all_rejected_and_zero_batch_runs(spark, lake, tmp_path):
    """Crash-path regressions: (a) a micro-batch where EVERY row fails
    coord validation must not kill the stream (empty window set ->
    schema-correct empty scan, not filter(None)); (b) a run that drains
    zero micro-batches (empty queries dir) must exit cleanly with
    n_results=0 instead of PATH_NOT_FOUND on --out."""
    import json

    import jobs.serve_reverse as job

    lake_path, key = lake

    # (a) the only batch is all-invalid
    qdir = tmp_path / "q"
    _write_query_files(spark, qdir, [[(0, 999.0, 0.0), (1, 2.35, 95.0)]])
    out = str(tmp_path / "out")
    job.main(["--lake", lake_path, "--queries", str(qdir), "--out", out,
              "--stream", "--checkpoint", str(tmp_path / "ck"),
              "--k", "2", "--radius-m", "400000", "--res", "5",
              "--key-col", key])
    rep = json.loads((Path(out) / "_run_report.json").read_text())
    assert rep["n_results"] == 0
    assert rep["n_queries"] == 0 and rep["n_rejected"] == 2
    assert rep["n_batches"] >= 1

    # (b) zero batches: nothing to drain at all
    qdir2 = tmp_path / "q2"
    qdir2.mkdir()
    out2 = str(tmp_path / "out2")
    job.main(["--lake", lake_path, "--queries", str(qdir2), "--out", out2,
              "--stream", "--checkpoint", str(tmp_path / "ck2"),
              "--k", "2", "--radius-m", "400000", "--res", "5",
              "--key-col", key])
    rep2 = json.loads((Path(out2) / "_run_report.json").read_text())
    assert rep2["n_results"] == 0 and rep2["n_batches"] == 0
