"""Cosmogony zone stream → the ADMINS dimension (cosmogony2mimir).

The reference's `read_admin_in_cosmogony_file` + `Zone::into_admin`
(src/admin.rs:124-211, 251-294) re-expressed as one declarative plan:

- the BTreeMap<zone_id → (osm_id, insee)> the Rust code builds in a
  first pass becomes a broadcast self-join on the slim (id, osm_id,
  city-insee) projection — no driver-side map, scales to the full
  planet zone set;
- id formatting = the gated C6/J4 scalar (`admin:fr:{insee}` retro-compat
  for cities, else `admin:osm:{osm_id}`, admin.rs:140-147);
- insee/zip/weight/codes/names extraction = the gated C5/C7/C8/C9/A2/A3
  scalars over the tags map (osm_reader/admin.rs:74-89,
  admin.rs:113-122);
- the GeoJSON boundary (always a MultiPolygon in cosmogony output) is
  converted to the engine's WKB + bbox + centroid-fallback coord in ONE
  Arrow-batched mapInPandas over the pre-parsed coordinate arrays —
  the only non-Catalyst step, vectorized per batch;
- `administrative_regions` (the parent chain, admin.rs:251-294) is NOT
  denormalized here: `operators.places.resolve_admin_hierarchy` (J3)
  resolves it where needed, keeping the published dim normalized.

Output conforms to `schemas.ADMINS` (+ i18n extras), i.e. it is directly
usable as the PIP dim of `operators.pip.attach_admins`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# cosmogony jsonl zone shape (the fields into_admin consumes; extra
# fields in the stream are simply not projected)
ZONES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("osm_id", T.StringType()),
        T.StructField("admin_level", T.IntegerType()),
        T.StructField("zone_type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("parent", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("center_tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "international_labels", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField(
            "center",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
        T.StructField(
            "boundary",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "coordinates",
                        T.ArrayType(  # polygons
                            T.ArrayType(  # rings
                                T.ArrayType(T.ArrayType(T.DoubleType()))  # points
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _boundary_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """coordinates → (wkb, minx..maxy, centroid lon/lat) per row."""
    from ..geometry import mp_bbox, mp_centroid, mp_to_wkb

    wkbs, boxes, cents = [], [], []
    for coords in pdf["coordinates"]:
        if coords is None or len(coords) == 0:
            wkbs.append(None)
            boxes.append((None, None, None, None))
            cents.append((None, None))
            continue
        # Arrow hands nested lists as object-dtype ndarrays; numpy 2
        # refuses direct asarray on those, so stack point-wise. [:2]
        # drops the optional GeoJSON altitude — a 3-wide ring would
        # corrupt the 2-double-per-point WKB layout.
        mp = [
            [np.stack([np.asarray(p, dtype=np.float64)[:2] for p in ring])
             for ring in poly]
            for poly in coords
        ]
        wkbs.append(mp_to_wkb(mp))
        boxes.append(tuple(float(v) for v in mp_bbox(mp)))
        cents.append(tuple(float(v) for v in mp_centroid(mp)))
    def fcol(vals, i):
        return pd.Series(
            [v[i] for v in vals], index=pdf.index, dtype="float64"
        )

    return pd.DataFrame(
        {
            "__zid": pdf["__zid"].astype("int64"),
            "boundary_wkb": pd.Series(wkbs, index=pdf.index, dtype=object),
            "minx": fcol(boxes, 0),
            "miny": fcol(boxes, 1),
            "maxx": fcol(boxes, 2),
            "maxy": fcol(boxes, 3),
            "c_lon": fcol(cents, 0),
            "c_lat": fcol(cents, 1),
        }
    )


def zones_to_admins(
    zones: DataFrame,
    langs: tuple[str, ...] = ("fr", "en"),
    french_id_retrocompatibility: bool = True,
) -> DataFrame:
    """Zone::into_admin over the whole stream (admin.rs:124-211)."""
    from ..functions.scalars import (
        codes_from_tags,
        country_code_from_codes,
        i18n_names_from_tags,
        population_weight,
    )
    from ..operators.enrich import admin_id, normalize_weight, split_zip_codes

    zones = zones.filter(F.col("id").isNotNull() & F.col("osm_id").isNotNull())

    # pass 1 of the Rust code: zone idx → (osm_id, insee-if-city)
    city_insee = F.when(
        F.col("zone_type") == "city", F.col("tags")["ref:INSEE"]
    )
    slim = zones.select(
        F.col("id").alias("__pid"),
        admin_id("osm_id", city_insee, french_id_retrocompatibility).alias(
            "__parent_admin_id"
        ),
    )

    base = zones.select(
        F.col("id").alias("__zid"),
        admin_id("osm_id", city_insee, french_id_retrocompatibility).alias("id"),
        # admin.insee is read from tags for EVERY zone (admin.rs:134);
        # the reference defaults it to "" rather than null
        F.coalesce(F.col("tags")["ref:INSEE"], F.lit("")).alias("insee"),
        F.coalesce(F.col("admin_level"), F.lit(0)).alias("level"),
        F.col("name"),
        F.coalesce(F.col("label"), F.col("name")).alias("label"),
        F.col("tags")["alt_name"].alias("alt_name"),
        F.col("tags")["loc_name"].alias("loc_name"),
        # read_zip_codes: addr:postcode else postal_code, ';'-split,
        # empties dropped, sorted (osm_reader/admin.rs:74-85) == C5
        split_zip_codes(
            F.coalesce(
                F.col("tags")["addr:postcode"],
                F.col("tags")["postal_code"],
                F.lit(""),
            )
        ).alias("zip_codes"),
        normalize_weight(population_weight("tags", "center_tags")).alias("weight"),
        F.col("zone_type"),
        F.col("parent").alias("__parent"),
        codes_from_tags("tags").alias("codes"),
        i18n_names_from_tags("tags", list(langs)).alias("names"),
        i18n_names_from_tags("tags", list(langs), prefix="alt_name:").alias(
            "alt_names"
        ),
        F.map_filter(
            F.coalesce(
                F.col("international_labels"),
                F.create_map().cast("map<string,string>"),
            ),
            lambda k, v: k.isin(list(langs)),
        ).alias("labels"),
        F.col("center").getField("coordinates").alias("__center"),
        F.col("boundary").getField("coordinates").alias("coordinates"),
    ).withColumn("country_codes", F.array_compact(F.array(country_code_from_codes("codes"))))

    # boundary-less zones never cross the Arrow boundary: they fall out
    # of the left join as nulls (and an all-null 4-level nested column
    # segfaults pyarrow's arrow_to_pandas in this pyspark build)
    geo = base.select("__zid", "coordinates").filter(
        F.col("coordinates").isNotNull()
    ).mapInPandas(
        lambda it: (_boundary_batch(pdf) for pdf in it),
        schema=(
            "__zid long, boundary_wkb binary, minx double, miny double,"
            " maxx double, maxy double, c_lon double, c_lat double"
        ),
    )

    out = (
        base.drop("coordinates")
        .join(geo, "__zid", "left")
        .join(
            F.broadcast(slim), base["__parent"] == F.col("__pid"), "left"
        )
        .withColumn(
            # center when present, else boundary centroid (the reference
            # defaults a missing center to Coord::default; the centroid
            # is strictly more useful and what osm_reader computes)
            "coord",
            F.when(
                F.col("__center").isNotNull() & (F.size("__center") >= 2),
                F.struct(
                    F.col("__center")[0].alias("lon"),
                    F.col("__center")[1].alias("lat"),
                ),
            ).otherwise(
                F.when(
                    F.col("c_lon").isNotNull(),
                    F.struct(
                        F.col("c_lon").alias("lon"), F.col("c_lat").alias("lat")
                    ),
                )
            ),
        )
        .withColumn(
            "bbox",
            F.when(
                F.col("minx").isNotNull(),
                F.struct("minx", "miny", "maxx", "maxy"),
            ),
        )
        .withColumn("parent_id", F.col("__parent_admin_id"))
        .drop(
            "__zid", "__parent", "__pid", "__parent_admin_id", "__center",
            "minx", "miny", "maxx", "maxy", "c_lon", "c_lat",
        )
    )
    return out
