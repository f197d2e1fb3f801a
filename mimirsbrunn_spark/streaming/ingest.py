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
