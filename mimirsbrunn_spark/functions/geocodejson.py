"""C10 — GeocodeJSON output assembly.

Re-expresses the reference's response adapter
(/root/reference/libs/mimir/src/adapters/primary/common/geocoding.rs:10-131)
as a Column projection + ``to_json``: each place row becomes one
GeocodeJSON *Feature* (valid GeoJSON Point feature whose properties carry
a ``geocoding`` object), and the driver-side ``geocodejson_response``
wraps collected features into the FeatureCollection envelope
(format_type/geocoding{version,query}/features — geocoding.rs:10-31).

Null-field skipping mirrors serde's skip_serializing_if: Spark's to_json
drops null fields by default (ignoreNullFields).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOCODEJSON_VERSION = "0.1.0"


def _opt(df: DataFrame, name: str, dtype: str = "string") -> Column:
    return F.col(name) if name in df.columns else F.lit(None).cast(dtype)


def geocodejson_feature(df: DataFrame) -> Column:
    """One GeocodeJSON Feature struct per place row.

    Expected columns (all optional except id/lon/lat): id, type, label,
    name, house_number, street, zip_codes array, insee, level, admins
    array<struct<id,name,level,zone_type,zip_codes,weight>>, poi_type
    struct<id,name>, lon, lat. Maps 1:1 to GeocodeJsonProperty fields
    (geocoding.rs:70-110): postcode = first zip, city = the city-admin
    name, citycode = insee, administrative_regions from the admins array."""
    admins = F.col("admins") if "admins" in df.columns else F.array().cast(
        "array<struct<id:string,name:string,level:int,zone_type:string,"
        "zip_codes:array<string>,weight:double>>"
    )
    cities = F.filter(admins, lambda a: a["zone_type"] == "city")
    city = F.try_element_at(cities, F.lit(1))
    geocoding = F.struct(
        F.col("id").alias("id"),
        _opt(df, "type").alias("type"),
        _opt(df, "zone_type").alias("zone_type"),
        _opt(df, "label").alias("label"),
        _opt(df, "name").alias("name"),
        (_opt(df, "house_number")).alias("housenumber"),
        _opt(df, "street").alias("street"),
        (
            F.try_element_at(F.col("zip_codes"), F.lit(1))
            if "zip_codes" in df.columns
            else F.lit(None).cast("string")
        ).alias("postcode"),
        city["name"].alias("city"),
        _opt(df, "insee").alias("citycode"),
        _opt(df, "level", "int").alias("level"),
        F.transform(
            admins,
            lambda a: F.struct(
                a["id"].alias("id"),
                a["name"].alias("name"),
                a["level"].alias("level"),
                a["zone_type"].alias("zone_type"),
                a["zip_codes"].alias("zip_codes"),
            ),
        ).alias("administrative_regions"),
        (
            F.when(F.col("poi_type").isNotNull(), F.array(F.col("poi_type")))
            if "poi_type" in df.columns
            else F.lit(None).cast("array<struct<id:string,name:string>>")
        ).alias("poi_types"),
    )
    return F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("lon"), F.col("lat")).alias("coordinates"),
        ).alias("geometry"),
        F.struct(geocoding.alias("geocoding")).alias("properties"),
    )


def to_geocodejson(df: DataFrame) -> DataFrame:
    """(place rows) → one JSON Feature string per row (``feature`` col).
    Stays distributed: serialization happens in the JVM (to_json), so a
    100 TB place table can be sunk as GeocodeJSON lines without Python."""
    return df.select(F.to_json(geocodejson_feature(df)).alias("feature"))


def geocodejson_response(features: list[str], q: str = "") -> str:
    """Driver-side FeatureCollection envelope around collected features
    (the k results of a geocode query — small by construction)."""
    return json.dumps(
        {
            "type": "FeatureCollection",
            "geocoding": {"version": GEOCODEJSON_VERSION, "query": q},
            "features": [json.loads(f) for f in features],
        }
    )
