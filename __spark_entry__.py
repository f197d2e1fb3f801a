"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (derived point cloud →
tile encoding → broadcast PIP admin attachment → per-city/cell rollup)
on sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator with its DuckDB oracle (see mimirsbrunn_spark/gate.py for the
cross-engine determinism rules).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _prep(spark: SparkSession) -> None:
    from mimirsbrunn_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial-join + tile-assignment rollup on sf0.001."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.gate import points_from_orders, rect_admins_df
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.tiles import grid_cell_col

    _prep(spark)
    sf_dir = "/root/testdata/sf0.001"
    pts = points_from_orders(spark, sf_dir).select(
        "point_id", "lon", "lat", grid_cell_col("lon", "lat", 7)
    )
    attached = attach_admins(pts, rect_admins_df(spark), strategy="broadcast")
    return (
        attached.select("point_id", "h3_7", F.try_element_at("admin_ids", F.lit(1)).alias("city_id"))
        .groupBy("city_id", "h3_7")
        .agg(F.count("*").alias("n_points"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimirsbrunn_spark.gate import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_spark.gate import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
