"""Bucketed-table co-location + small-file compaction.

Two shuffle economics tools the 100-TB framing calls for explicitly:

- **Bucketing** (`write_bucketed` / `assert_colocated_join`): persist a
  table hash-bucketed (and optionally sorted) on its join/agg keys via
  the catalog. Two tables bucketed identically on the join key join
  WITHOUT any exchange — the per-bucket files are already co-located —
  and a groupBy on the bucket key aggregates exchange-free. This is the
  "pre-shuffle once, join many times" pattern: the repeated consumers of
  a points table keyed by cell (PIP pairs, coverage rollups, kNN target
  lookups) pay the partitioning cost once at write time.
- **Compaction** (`compact_published`): rewrite the current generation of
  a published table into ~``target_file_mb`` files (tiny-file pileup is
  the classic long-running-pipeline failure: doubled listing costs,
  under-packed scans). Publishes a NEW generation and swaps the pointer,
  so readers never observe a half-compacted table.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed bucketed table (bucket metadata lives
    in the catalog, hence saveAsTable). ``sort_cols`` additionally sorts
    within buckets — sort-merge joins then skip the sort too."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join_plan(spark: SparkSession, left: str, right: str, on: list[str]) -> str:
    """Join two catalog tables on ``on`` and return the executed-plan
    string (the no-Exchange property is asserted by the caller/test)."""
    df = spark.table(left).join(spark.table(right), on)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def compact_published(
    spark: SparkSession,
    base_dir: str,
    name: str,
    target_file_mb: int = 256,
    cluster_key: str | None = None,
) -> str:
    """Rewrite the CURRENT generation of a published table into
    ~target_file_mb files (see sources/lifecycle.publish_table for the
    generation/pointer protocol). Returns the new generation path.

    ``cluster_key`` preserves a Z-order layout through compaction: a
    plain ``coalesce`` reads file splits in Spark's size-ordered
    scheduling order, so merged files span scattered key ranges and the
    footer-stats pruning `plans/layout.py` relies on is silently lost.
    With a key, the rewrite is repartitionByRange + sortWithinPartitions
    on it — one range shuffle, same cost shape as the original clustered
    write, tight per-file ranges restored."""
    from ..sources.lifecycle import publish_table, read_published, resolve_generation

    # the pointer format has a single owner (lifecycle.resolve_generation)
    # — re-parsing _CURRENT here would silently diverge from the read
    # path if the protocol ever changes
    gen = resolve_generation(Path(base_dir) / name)
    total = sum(f.stat().st_size for f in gen.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = read_published(spark, base_dir, name)
    if cluster_key is not None:
        from pyspark.sql import functions as F

        df = df.repartitionByRange(n_files, F.col(cluster_key)).sortWithinPartitions(
            cluster_key
        )
    else:
        df = df.coalesce(n_files)
    return publish_table(df, base_dir, name)
