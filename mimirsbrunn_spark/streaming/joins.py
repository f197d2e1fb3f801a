"""Stream-stream event-time interval join.

The third Structured-Streaming staple next to windowed_event_counts and
stateful sessionization (streaming/sessions.py): join two live streams
of the SAME events source — clicks against the views that preceded them
within a bounded gap, per user. Both sides carry watermarks and the join
condition carries the event-time bound, which is exactly what lets Spark
age out join state instead of buffering both streams forever
(state retention = watermark + gap).

Semantics parity: the emitted pairs equal the batch inner interval join
``clicks ⋈ views ON user AND click_ts - gap <= view_ts <= click_ts``
whenever events arrive at most `watermark` late — pinned by the pytest
comparing against exactly that batch join on the same input.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .sessions import EVENTS_SCHEMA


def stream_click_view_join(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_gap_minutes: int = 15,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
    how: str = "inner",
) -> StreamingQuery:
    """File-source stream → watermarked stream-stream interval join:
    (user_id, click_id, view_id, gap_us) for every view at most
    ``max_gap_minutes`` before its click, per user.

    ``how="left_outer"`` additionally emits (user_id, click_id, NULL,
    NULL) for clicks with no in-gap view — Spark only releases these
    rows when the WATERMARK passes the click's join window (state
    eviction), not at query termination: a run that ends while state is
    live keeps those clicks buffered in the checkpoint for the next
    incremental run. The left-join pytest therefore appends a far-future
    flush event per side to advance the watermark past all real state
    (the standard pattern for bounded replays of an outer stream join).
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unknown how {how!r} (inner|left_outer)")
    joined = clicks.join(
        views,
        F.expr(
            f"""c_user = v_user
                AND view_ts <= click_ts
                AND view_ts >= click_ts - INTERVAL {max_gap_minutes} MINUTES"""
        ),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
