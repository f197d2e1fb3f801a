"""Source readers (SURVEY §2.1 S3/S4): the reference's file-format
ingestion re-expressed as schema-enforced Spark reads.

OSM PBF (S1/S2) is intentionally *not* parsed here: per SURVEY §2.1 the
engine consumes pre-converted Parquet tables (streets/pois fixtures carry
the same shapes); a PBF→Parquet converter is an offline concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ADDRESSES_RAW


def read_bano_csv(spark: SparkSession, path: str) -> DataFrame:
    """BANO address CSV (src/bano.rs:44-53; src/addr_reader.rs:103-157):
    headerless, column order id,house_number,street,zip,city,src,lat,lon
    (lat BEFORE lon!), recursive directory walk, gz transparent, malformed
    rows dropped (the reference logs-and-skips, addr_reader.rs:73-84)."""
    df = spark.read.csv(
        path,
        schema=ADDRESSES_RAW,
        header=False,
        mode="DROPMALFORMED",
        recursiveFileLookup=True,
    )
    # empty street names are dropped with a warning in the reference
    return df.filter(F.col("street").isNotNull() & (F.length(F.trim("street")) > 0))


def read_openaddresses_csv(spark: SparkSession, path: str) -> DataFrame:
    """OpenAddresses CSV (src/openaddresses.rs:41-52): headered
    LON,LAT,NUMBER,STREET,UNIT,CITY,DISTRICT,REGION,POSTCODE,ID,HASH —
    normalized to the BANO-shaped schema."""
    raw = spark.read.csv(
        path, header=True, mode="DROPMALFORMED", recursiveFileLookup=True
    )
    return (
        raw.select(
            F.col("ID").alias("id"),
            F.col("NUMBER").alias("house_number"),
            F.col("STREET").alias("street"),
            F.col("POSTCODE").alias("zip"),
            F.col("CITY").alias("city"),
            F.lit("OA").alias("src"),
            F.col("LAT").try_cast("double").alias("lat"),
            F.col("LON").try_cast("double").alias("lon"),
        )
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .filter(F.col("street").isNotNull() & (F.length(F.trim("street")) > 0))
    )


def read_cosmogony_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Cosmogony zone stream (src/admin.rs:214-219): line-delimited JSON,
    gz transparent, unreadable lines dropped (the reference's
    read_zones drops them with a log)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("mode", "DROPMALFORMED").json(path)
