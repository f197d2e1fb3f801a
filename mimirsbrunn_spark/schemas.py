"""Spark schemas for the engine's tables.

Mapping of the reference's document model (libs/places/src/*.rs — see
SURVEY.md §1) onto Spark types, plus the interleaved-corpus input table
per BASELINE.json.input_hint / FIXTURES.md §1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- interleaved text+media corpus (input_hint) -----------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # text | geo | media
        T.StructField("text", T.StringType(), True),        # geo: "{lon};{lat}"
        T.StructField("media_ref", T.StringType(), True),   # media:{hash} or ""
        T.StructField("offset", T.IntegerType(), False),    # position in doc
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# -- coord struct (libs/places/src/coord.rs:12-29) --------------------------

COORD = T.StructType(
    [
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ]
)

BBOX = T.StructType(
    [
        T.StructField("minx", T.DoubleType(), False),
        T.StructField("miny", T.DoubleType(), False),
        T.StructField("maxx", T.DoubleType(), False),
        T.StructField("maxy", T.DoubleType(), False),
    ]
)

# -- admins (libs/places/src/admin.rs:23-83, FIXTURES.md §2) -----------------

ADMINS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("insee", T.StringType(), True),
        T.StructField("level", T.IntegerType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("zip_codes", T.ArrayType(T.StringType()), True),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("coord", COORD, True),
        T.StructField("boundary_wkb", T.BinaryType(), True),
        T.StructField("bbox", BBOX, True),
        T.StructField("zone_type", T.StringType(), True),
        T.StructField("parent_id", T.StringType(), True),
        T.StructField("codes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# denormalized admin summary carried inside other places
# (administrative_regions: Vec<Arc<Admin>> — SURVEY §1.4)
ADMIN_SUMMARY = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("insee", T.StringType(), True),
        T.StructField("level", T.IntegerType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("zip_codes", T.ArrayType(T.StringType()), True),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("zone_type", T.StringType(), True),
        T.StructField("parent_id", T.StringType(), True),
    ]
)

# -- BANO-shaped addresses (src/bano.rs:44-53, FIXTURES.md §3) ---------------

ADDRESSES_RAW = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("house_number", T.StringType(), True),
        T.StructField("street", T.StringType(), True),
        T.StructField("zip", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("src", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), False),  # BANO order: lat then lon
        T.StructField("lon", T.DoubleType(), False),
    ]
)

# -- OSM-way-shaped streets (src/osm_reader/street.rs, FIXTURES.md §4) -------

STREETS_RAW = T.StructType(
    [
        T.StructField("osm_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # way | relation
        T.StructField("name", T.StringType(), True),
        T.StructField("highway", T.StringType(), True),
        T.StructField("public_transport", T.StringType(), True),
        T.StructField("node_points", T.ArrayType(COORD), False),
    ]
)

# -- tagged POIs (src/osm_reader/poi.rs, FIXTURES.md §5) ----------------------

POIS_RAW = T.StructType(
    [
        T.StructField("osm_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # node | way | relation
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ]
)

# -- NTFS-shaped stops (libs/places/src/stop.rs:107-145, FIXTURES.md §6) ------

STOPS_RAW = T.StructType(
    [
        T.StructField("stop_area_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("stop_point_ids", T.ArrayType(T.StringType()), False),
        T.StructField("physical_modes", T.ArrayType(T.StringType()), False),
    ]
)
