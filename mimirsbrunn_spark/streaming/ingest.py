"""Structured-Streaming incremental ingest.

The reference has NO event-time streaming (SURVEY §2.10: its async Rust
streams are pull-based batch pipelining). The equivalent operational
need — "new document files keep arriving; keep the index fresh" — maps
to a file-source Structured Streaming job: the same extract→tile
transformations as batch (identical DataFrame code — that's the point of
the unified API), with exactly-once file-sink semantics via Spark's
checkpointing, which complements plans/checkpoint.py's batch resume.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.spans import extract_geo_points
from ..schemas import DOCS
from ..tiles import with_grid_cells


def incremental_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    res_list=(7, 12),
) -> StreamingQuery:
    """Watch ``docs_dir`` for new interleaved-doc parquet files; extract
    geo points, tile-encode, append to ``out_dir`` exactly-once."""
    stream = (
        spark.readStream.schema(DOCS)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_dir)
    )
    pts = with_grid_cells(extract_geo_points(stream), "lon", "lat", res_list)
    return (
        pts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def deduped_event_ingest_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """At-least-once upstream → exactly-once-per-key ingest: events
    re-delivered within ``watermark`` of their first arrival are dropped
    by key (event_id) via dropDuplicatesWithinWatermark — the streaming
    counterpart of the batch ``dropDuplicates`` gate, with state bounded
    by the watermark instead of growing with the corpus (the property
    that matters at 10^12 events: a plain streaming dropDuplicates would
    keep every key forever). Re-deliveries later than the watermark are
    by contract re-emitted — downstream MERGE (sources/lifecycle.py)
    absorbs those, exactly like the reference's idempotent ES upserts."""
    from .sessions import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
