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


# -- Iceberg DDL (S12 template install for the north-rule table format) ------
#
# The reference installs its ES index templates before writing
# (/root/reference/src/bin/mimirsbrunn/mod.rs settings/template flow);
# on an Iceberg deployment the equivalent install step is CREATE TABLE
# with the registry schema. The sandbox has no iceberg runtime jar, so
# these strings are the documented, unit-covered contract a cluster-side
# bootstrap runs verbatim via spark.sql().


def _ddl_type(dt: T.DataType) -> str:
    return dt.simpleString()


def iceberg_ddl(
    table_ident: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
    table_properties: dict[str, str] | None = None,
) -> str:
    """CREATE TABLE ... USING iceberg for a registry schema.

    ``partition_by`` entries may be bare columns or Iceberg hidden-
    partitioning transforms (e.g. ``bucket(64, doc_id)``, ``days(ts)``)
    — passed through verbatim, as Spark SQL accepts them in
    PARTITIONED BY for v2 catalogs."""
    cols = ",\n  ".join(
        f"{f.name} {_ddl_type(f.dataType)}" + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    ddl = f"CREATE TABLE IF NOT EXISTS {table_ident} (\n  {cols}\n) USING iceberg"
    if partition_by:
        ddl += "\nPARTITIONED BY (" + ", ".join(partition_by) + ")"
    props = {"format-version": "2", "write.parquet.compression-codec": "zstd"}
    props.update(table_properties or {})
    ddl += "\nTBLPROPERTIES (" + ", ".join(
        f"'{k}' = '{v}'" for k, v in sorted(props.items())
    ) + ")"
    return ddl


def corpus_install_ddl(catalog_ns: str = "corpus") -> dict[str, str]:
    """The install set for an Iceberg deployment of the engine's input
    and dim tables: interleaved docs bucketed by doc_id (co-locates the
    doc-keyed joins: dedup flags, attach join-back), admins unpartitioned
    (a dim; snapshot isolation comes from the format)."""
    return {
        "docs": iceberg_ddl(
            f"{catalog_ns}.docs", DOCS, partition_by=["bucket(256, doc_id)"]
        ),
        "admins": iceberg_ddl(f"{catalog_ns}.admins", ADMINS),
    }
