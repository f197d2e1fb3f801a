"""Streaming reverse-geocode serving over the Z-clustered address lake.

The reference serves ``/reverse`` as an HTTP endpoint (bragi
``routes.rs`` → ``handlers.rs:344-384`` → the ES ``geo_distance`` DSL,
``dsl.rs:391-423``) — a continuous stream of small query batches against
a big indexed point set. The Spark-idiomatic analog is a Structured
Streaming job: query batches arrive as files, each micro-batch runs the
SAME batch operator (`plans/layout.reverse_geocode_lake` — Morton-window
file pruning + cell-ring kNN), and results append to a lake. foreachBatch
is the documented escape hatch for batch-only operators inside a stream;
replay safety comes from writing each micro-batch under its batch_id and
overwriting that directory on replay (idempotent, the standard
foreachBatch exactly-once recipe).

At 100 TB the property that matters is inherited from the batch
operator: a serving micro-batch opens only the address-lake files whose
Morton ranges intersect the batch's radius-padded neighborhoods, never
the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

QUERY_SCHEMA = "query_id long, lon double, lat double"


def reverse_geocode_stream(
    spark: SparkSession,
    queries_dir: str,
    lake_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 1,
    radius_m: float = 1000.0,
    res: int = 7,
    key_col: str = "z_12",
    key_res: int | None = None,
    prefix_bits: int = 6,
    target_id: str = "target_id",
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Watch ``queries_dir`` for (query_id, lon, lat) parquet batches;
    reverse geocode each micro-batch against the clustered lake at
    ``lake_path``; append (query_id, target_id, distance_m, rank) under
    ``out_dir``/batch_id=N, overwrite-on-replay.

    Each batch dir also gets a ``_batch_report.json`` (underscore-prefixed
    so dataset reads skip it) with the batch's query/reject counts, scan
    windows, and files-pruned fraction — footer stats are read ONCE at
    stream start and every batch's audit is then pure arithmetic."""
    import json
    import time
    from pathlib import Path

    from ..functions.bragi_api import coord_validity_condition
    from ..plans.layout import (
        file_key_ranges,
        ranges_pruned_fraction,
        reverse_geocode_lake,
    )

    lake_ranges = file_key_ranges(lake_path, key_col)

    def _serve(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        t0 = time.monotonic()
        valid = batch.filter(coord_validity_condition())
        n_in = batch.count()
        out, info = reverse_geocode_lake(
            spark,
            lake_path,
            valid,
            k=k,
            radius_m=radius_m,
            res=res,
            key_col=key_col,
            # None lets reverse_geocode_lake derive the Morton-space res
            # from key_col's z_<res> name — a lake clustered at res 10
            # served with res-12 windows would silently return nothing
            key_res=key_res,
            prefix_bits=prefix_bits,
            target_id=target_id,
            return_scan_info=True,
        )
        bdir = f"{out_dir}/batch_id={batch_id}"
        out.write.mode("overwrite").parquet(bdir)
        Path(bdir, "_batch_report.json").write_text(json.dumps({
            "batch_id": batch_id,
            "n_queries": info["n_queries"],
            "n_rejected": n_in - info["n_queries"],
            "n_scan_windows": len(info["windows"]),
            "lake_files_pruned_fraction": round(
                ranges_pruned_fraction(lake_ranges, info["windows"]), 4
            ),
            # feeds the bragi_http_request_duration_seconds histogram the
            # driver renders (status.MetricsRegistry; prometheus_handler.rs)
            "duration_s": round(time.monotonic() - t0, 6),
        }))

    stream = (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(queries_dir)
    )
    return (
        stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
