"""Deterministic gate point clouds shared by every gate module.

Leaf module (no intra-package imports) so gate.py and gate_extra.py can
both use it without circularity; exact in both engines (integer
multiply-mod arithmetic — see gate.py's module docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LON_MULT = 2654435761  # Knuth multiplicative constant
_LAT_MULT = 40503
_LON_MOD = 360_000_000  # microdegrees
_LAT_MOD = 180_000_000


def points_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey").cast("long")
    return o.select(
        F.col("o_orderkey").alias("point_id"),
        ((k * _LON_MULT) % _LON_MOD / 1_000_000.0 - 180.0).alias("lon"),
        ((k * _LAT_MULT + 7) % _LAT_MOD / 1_000_000.0 - 90.0).alias("lat"),
    )


POINTS_FROM_ORDERS_SQL = f"""
    SELECT o_orderkey AS point_id,
           (CAST(o_orderkey AS BIGINT) * {_LON_MULT}) % {_LON_MOD} / 1000000.0 - 180.0 AS lon,
           (CAST(o_orderkey AS BIGINT) * {_LAT_MULT} + 7) % {_LAT_MOD} / 1000000.0 - 90.0 AS lat
    FROM orders
"""


def points_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey").cast("long")
    return n.select(
        F.col("n_nationkey").alias("query_id"),
        ((k * 7919 + 13) * 104729 % _LON_MOD / 1_000_000.0 - 180.0).alias("lon"),
        ((k * 6271 + 5) * 104729 % _LAT_MOD / 1_000_000.0 - 90.0).alias("lat"),
    )


POINTS_FROM_NATION_SQL = f"""
    SELECT n_nationkey AS query_id,
           (CAST(n_nationkey AS BIGINT) * 7919 + 13) * 104729 % {_LON_MOD} / 1000000.0 - 180.0 AS lon,
           (CAST(n_nationkey AS BIGINT) * 6271 + 5) * 104729 % {_LAT_MOD} / 1000000.0 - 90.0 AS lat
    FROM nation
"""


