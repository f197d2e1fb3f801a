"""Streaming round-out (VERDICT r03 #10): left-outer stream-stream join
with watermark-eviction null emission, and dropDuplicatesWithinWatermark
ingest dedup — both pinned to their batch equivalents."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F


def _time_split_events(spark, tmp_path, n_files=3):
    """sf0.01 events split into time-ordered files (non-overlapping time
    ranges, ascending mod times) so watermarks advance between batches
    and no event is ever late."""
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    qs = e.approxQuantile("__us", [i / n_files for i in range(1, n_files)], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    stage = tmp_path / "stage"
    stage.mkdir()
    final = tmp_path / "events_src"
    final.mkdir()
    for i in range(n_files):
        d = stage / f"p{i}"
        (
            e.filter((F.col("__us") > bounds[i]) & (F.col("__us") <= bounds[i + 1]))
            .drop("__us")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(d))
        )
        for f in Path(d).glob("*.parquet"):
            shutil.copy(f, final / f"events_{i}.parquet")
    return str(final)


def test_left_outer_stream_join_matches_batch(spark, tmp_path):
    from mimirsbrunn_spark.streaming import stream_click_view_join

    src = _time_split_events(spark, tmp_path)
    # flush file: one far-future click + view (user -1) advances BOTH
    # side watermarks past every real click's join window, forcing the
    # outer-side null emissions before the availableNow run terminates
    max_ts = spark.read.parquet(src).agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [
            (10**9 + 1, max_ts, -1, "click", 0.0, ""),
            (10**9 + 2, max_ts, -1, "view", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 100 DAYS")).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out, ckpt = str(tmp_path / "lj_out"), str(tmp_path / "lj_ckpt")
    q = stream_click_view_join(
        spark, src, out, ckpt, max_gap_minutes=15, watermark="30 minutes",
        how="left_outer",
    )
    assert q.awaitTermination(900), "stream query did not terminate"
    got = {
        (r["user_id"], r["click_id"], r["view_id"], r["gap_us"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] >= 0  # drop the flush sentinel's own row
    }

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("us").alias("cus")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuser"), F.col("event_id").alias("view_id"),
        F.col("us").alias("vus"),
    )
    batch = {
        (
            r["user_id"], r["click_id"], r["view_id"],
            None if r["vus"] is None else r["cus"] - r["vus"],
        )
        for r in c.join(
            v,
            (c["user_id"] == v["vuser"]) & (v["vus"] <= c["cus"])
            & (v["vus"] >= c["cus"] - 15 * 60 * 1_000_000),
            "left",
        ).collect()
    }
    n_null = sum(1 for r in batch if r[2] is None)
    assert n_null > 0, "fixture produced no unmatched clicks — test vacuous"
    assert got == batch, (
        f"stream {len(got)} rows vs batch {len(batch)} "
        f"(nulls: {sum(1 for r in got if r[2] is None)} vs {n_null})"
    )


def test_dedup_ingest_matches_batch_distinct(spark, tmp_path):
    from mimirsbrunn_spark.streaming import deduped_event_ingest_stream

    src = _time_split_events(spark, tmp_path)
    # duplicate every file (at-least-once redelivery inside the watermark)
    for f in sorted(Path(src).glob("events_*.parquet")):
        shutil.copy(f, Path(src) / f"redelivered_{f.name}")
    out, ckpt = str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    q = deduped_event_ingest_stream(spark, src, out, ckpt, watermark="30 days")
    assert q.awaitTermination(900), "stream query did not terminate"
    got = spark.read.parquet(out)
    assert got.count() == got.select("event_id").distinct().count()
    batch = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    assert got.count() == batch.select("event_id").distinct().count()
    # value-level spot check: the deduped stream preserves the row payloads
    g = {r["event_id"]: (r["user_id"], r["event_type"]) for r in got.collect()}
    b = {
        r["event_id"]: (r["user_id"], r["event_type"])
        for r in batch.dropDuplicates(["event_id"]).collect()
    }
    assert g == b
