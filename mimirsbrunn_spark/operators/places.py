"""Place-type pipelines: streets (osm2mimir), POIs, stops (ntfs2mimir).

Each pipeline composes the primitive operators exactly as the reference
binaries do (SURVEY §3): validity filter → representative point → admin
attachment → enrichment → dedup/ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geofinder import zone_rank

# F1 — street validity (street.rs:164-195; config/osm2mimir/default.toml:136-139)
EXCLUDED_HIGHWAY = ["bus_guideway", "bus_stop", "elevator", "escape", "platform"]
EXCLUDED_PUBLIC_TRANSPORT = ["platform", "hub"]


def valid_streets(streets: DataFrame) -> DataFrame:
    """Way must have a nonempty name, a highway tag not excluded, and a
    public_transport tag not excluded; relations are associatedStreet."""
    name_ok = F.col("name").isNotNull() & (F.length(F.trim("name")) > 0)
    hw_ok = F.col("highway").isNull() | ~F.col("highway").isin(EXCLUDED_HIGHWAY)
    pt_ok = F.col("public_transport").isNull() | ~F.col("public_transport").isin(
        EXCLUDED_PUBLIC_TRANSPORT
    )
    is_way = (F.col("kind") == "way") & name_ok & F.col("highway").isNotNull() & hw_ok & pt_ok
    is_rel = (F.col("kind") == "relation") & name_ok
    return streets.filter(is_way | is_rel)


def way_representative_point(streets: DataFrame) -> DataFrame:
    """G10 — the way's *middle* node ("a better marker on a street than the
    first node", osm_utils.rs:35-55): element_at(nodes, n/2 + 1)."""
    mid = F.try_element_at("node_points", (F.size("node_points") / 2).cast("int") + 1)
    return streets.withColumn("coord", mid).withColumn(
        "lon", F.col("coord.lon")
    ).withColumn("lat", F.col("coord.lat"))


def middle_out_order(n: int) -> list[int]:
    """G11 — node try-order ``nodes[n/2..] ++ nodes[..n/2]``
    (street.rs:316-333): boundary-adjacent endpoints tried last."""
    half = n // 2
    return list(range(half, n)) + list(range(half))


def attach_street_admins(
    streets: DataFrame, admins: DataFrame, max_zone: str = "city"
) -> DataFrame:
    """G6 + G11 — per street: the FIRST RESOLVABLE node in middle-out
    order is probed with ``get_admins_if(zone_type <= city)`` and its
    result — possibly empty — is accepted (street.rs:316-345:
    ``filter_map(obj_map.get).find_map(coords)`` picks one node, then
    one geofinder call; it does NOT keep probing other nodes on an empty
    result). Output one row per branch (street crossing a boundary → one
    row per city, osm2mimir.rs:336-348), with the branch's admin ids
    attached. A street with ZERO branches — probe outside every
    boundary, or no resolvable node at all — produces NO output row,
    exactly as in the reference, where ``get_street_admin`` returns an
    empty Vec and the caller's ``for admins in …`` loop (street.rs
    :255-266, :282-289) then never builds the street. ``city_id`` is the
    branch's first ``is_city()`` admin, falling back to the branch leaf
    (get_street_city_or_relation, street.rs:78-85 — a street in an
    arrondissement dedups under Paris, not the arrondissement).

    Broadcast the admin dim (as in attach_admins) and evaluate per way in
    a vectorized batch UDF; per-way candidate work is tiny (one node ×
    few candidate admins)."""
    from .pip import broadcast_admin_dim, finder_for_broadcast

    spark = SparkSession.getActiveSession()
    bc = broadcast_admin_dim(spark, admins)
    max_rank = zone_rank(max_zone)

    in_cols = streets.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        finder = finder_for_broadcast(bc.value)
        # street.rs:338-343: zone_type.map(|zt| zt <= City).unwrap_or(false)
        # — untyped admins are EXCLUDED (unlike `get`, which keeps them)
        cond = lambda rec: rec.zone_type is not None and zone_rank(rec.zone_type) <= max_rank  # noqa: E731
        for pdf in batches:
            out_rows = []
            for rec in pdf.itertuples(index=False):
                # a missing node list and an all-unresolvable one are the
                # same situation (nothing to probe) and take the same
                # path: zero branches below → no output row
                nodes = rec.node_points if rec.node_points is not None else []
                branches = []
                for idx in middle_out_order(len(nodes)):
                    node = nodes[idx]
                    if node is None or node["lon"] is None or node["lat"] is None:
                        continue  # unresolvable node: try the next one
                    # ONE geofinder call on the first resolvable node;
                    # an empty result is accepted (street.rs:316-345)
                    branches = finder.get_admins_if(node["lon"], node["lat"], cond)
                    break
                base = {c: getattr(rec, c) for c in in_cols}
                # zero branches → the street is not built at all
                # (street.rs:255-266/:282-289 loop over an empty Vec)
                for br in branches:
                    city_id = next(
                        (a.id for a in br if a.zone_type == "city"), br[0].id
                    )
                    out_rows.append(
                        {
                            **base,
                            "branch_admin_ids": [a.id for a in br],
                            "city_id": city_id,
                        }
                    )
            if out_rows:
                yield pd.DataFrame(out_rows)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(streets.schema.fields)
        + [
            T.StructField("branch_admin_ids", T.ArrayType(T.StringType()), True),
            T.StructField("city_id", T.StringType(), True),
        ]
    )
    return streets.mapInPandas(gen, schema=out_schema)


def streets_pipeline(streets: DataFrame, admins: DataFrame) -> DataFrame:
    """The osm2mimir street path (SURVEY §3, osm2mimir.rs:274-348
    semantics): F1 filter → G10 representative point → G6/G11 attach with
    per-city explode → W1 dedup by (name, city) with relations-first
    insertion order → W2 unique-id suffixing."""
    from .enrich import dedup_streets

    valid = valid_streets(streets)
    attached = attach_street_admins(valid, admins)
    pointed = way_representative_point(attached)
    prepared = (
        pointed.withColumn(
            "street_id",
            F.concat(F.lit("street:osm:"), F.col("kind"), F.lit(":"), F.col("osm_id")),
        )
        .withColumn(
            # relations sort before ways, then osm id (street.rs:77-85)
            "ingest_order",
            F.when(F.col("kind") == "relation", F.lit(0)).otherwise(F.lit(1)) * F.lit(10**12)
            + F.col("osm_id"),
        )
    )
    return dedup_streets(prepared)


# ---------------------------------------------------------------------------
# POIs (src/osm_reader/poi.rs)
# ---------------------------------------------------------------------------

# F2 — default poi_type rules (config/osm2mimir/default.toml); first match wins
DEFAULT_POI_RULES = [
    ("amenity", "college", "poi_type:amenity:college", "college"),
    ("amenity", "university", "poi_type:amenity:university", "university"),
    ("amenity", "theatre", "poi_type:amenity:theatre", "theatre"),
    ("amenity", "hospital", "poi_type:amenity:hospital", "hospital"),
    ("amenity", "post_office", "poi_type:amenity:post_office", "post office"),
    ("amenity", "bicycle_rental", "poi_type:amenity:bicycle_rental", "bicycle rental station"),
    ("amenity", "bicycle_parking", "poi_type:amenity:bicycle_parking", "bicycle parking"),
    ("amenity", "parking", "poi_type:amenity:parking", "parking"),
    ("amenity", "police", "poi_type:amenity:police", "police station"),
    ("amenity", "townhall", "poi_type:amenity:townhall", "town hall"),
    ("leisure", "garden", "poi_type:leisure:garden", "garden"),
    ("leisure", "park", "poi_type:leisure:park", "park"),
]


def classify_pois(pois: DataFrame, rules=None) -> DataFrame:
    """F2 — first-match rule engine (poi.rs:134-147): a F.when chain
    generated from config preserves first-match order; unmatched POIs are
    dropped (not a POI)."""
    rules = rules or DEFAULT_POI_RULES
    expr = None
    for key, value, type_id, type_name in rules:
        cond = F.col("tags")[key] == value
        branch = F.struct(F.lit(type_id).alias("id"), F.lit(type_name).alias("name"))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return pois.withColumn("poi_type", expr).filter(F.col("poi_type").isNotNull())


def pois_pipeline(pois: DataFrame, admins: DataFrame, addresses: DataFrame | None = None,
                  max_distance_reverse_m: float = 1000.0) -> DataFrame:
    """poi classification → admin attach → name fallback + postcode
    override (poi.rs:214-223) → nearest-address join within 1 km
    (G8, poi.rs:282-349: keep the POI when none found)."""
    from .enrich import attach_admin_structs, format_label, zip_codes_from_admins
    from .pip import attach_admins

    # navitia POIs (sources/read_navitia_pois) arrive pre-typed; only
    # OSM-shaped inputs go through the F2 rule engine (poi.rs:134-147).
    classified = pois if "poi_type" in pois.columns else classify_pois(pois)
    attached = attach_admins(classified, admins, strategy="broadcast")
    resolved = attach_admin_structs(attached, admins)
    named = resolved.withColumn(
        "name",
        F.coalesce(F.col("tags")["name"], F.col("poi_type.name")),  # fallback poi.rs:214-217
    ).withColumn(
        "zip_codes",
        F.when(
            F.col("tags")["addr:postcode"].isNotNull(),
            F.array(F.col("tags")["addr:postcode"]),  # override poi.rs:220-223
        ).otherwise(zip_codes_from_admins()),
    ).withColumn("label", format_label("name")).withColumn(
        "poi_id",
        F.when(
            F.col("kind") == "navitia",
            F.concat(F.lit("poi:navitia:"), F.col("osm_id")),
        ).otherwise(
            F.concat(F.lit("poi:osm:"), F.col("kind"), F.lit(":"), F.col("osm_id"))
        ),
    )
    if addresses is None:
        return named
    # G8 — nearest address within max_distance_reverse, LEFT join (keep all)
    from .knn import reverse_geocode

    nearest = reverse_geocode(
        named.select(F.col("poi_id").alias("query_id"), "lon", "lat"),
        addresses.select(F.col("addr_id").alias("target_id"), "lon", "lat"),
        k=1, radius_m=max_distance_reverse_m, res=9,
        broadcast_queries=False,
    ).select(
        F.col("query_id").alias("poi_id"),
        F.col("target_id").alias("nearest_addr_id"),
        F.col("distance_m").alias("nearest_addr_distance_m"),
    )
    return named.join(nearest, "poi_id", "left")


# ---------------------------------------------------------------------------
# Stops (src/stops.rs)
# ---------------------------------------------------------------------------

# stop physical-mode weights — the FULL config/ntfs2mimir/default.toml
# table (:21-75); ids are compared lowercased (stops.rs:104,117), unknown
# modes contribute 0.0 (stops.rs:118-124)
PHYSICAL_MODE_WEIGHT = {
    "rapidtransit": 8.0, "train": 8.0, "air": 8.0, "boat": 8.0, "ferry": 8.0,
    "localtrain": 8.0, "longdistancetrain": 8.0,
    "metro": 5.0, "busrapidtransit": 5.0,
    "coach": 3.0,
    "tramway": 2.0, "railshuttle": 2.0, "funicular": 2.0, "shuttle": 2.0,
    "suspendedcablecar": 2.0,
    "bus": 1.0,
}


def stops_pipeline(stops: DataFrame, admins: DataFrame) -> DataFrame:
    """A6/A7/J7 — make_weight (stops.rs:138-160): the per-area physical-
    mode weight sum (build_stop_area_weight, :97-136) averaged with the
    first CITY admin's weight — final = (mode_sum + admin_city_weight)/2
    when the area has stop points, admin_city_weight alone otherwise.
    The RAW sum is used, exactly as in the reference (the count/max
    initialize_weights form exists in stops.rs:81-95 but has NO callers
    there; n_stop_points is still emitted as a diagnostic column).
    ``mode_weight`` is the raw per-area sum."""
    from .enrich import attach_admin_structs, format_label, weight_from_city, zip_codes_from_admins
    from .pip import attach_admins

    mode_map = F.create_map(*[F.lit(x) for kv in PHYSICAL_MODE_WEIGHT.items() for x in kv])
    with_counts = stops.withColumn("n_stop_points", F.size("stop_point_ids")).withColumn(
        "mode_weight_sum",
        F.aggregate(
            "physical_modes", F.lit(0.0),
            lambda acc, m: acc + F.coalesce(mode_map[F.lower(m)], F.lit(0.0)),
        ),
    ).withColumn("mode_weight", F.col("mode_weight_sum"))
    attached = attach_admin_structs(
        attach_admins(with_counts, admins, strategy="broadcast"), admins
    )
    return (
        attached.withColumn(
            "weight",
            F.when(
                F.col("n_stop_points") > 0,
                (F.col("mode_weight_sum") + weight_from_city()) / F.lit(2.0),
            ).otherwise(weight_from_city()),
        )
        .withColumn("zip_codes", zip_codes_from_admins())
        .withColumn("label", format_label("name"))
        .withColumn("stop_id", F.concat(F.lit("stop_area:"), F.col("stop_area_id")))
    )


# ---------------------------------------------------------------------------
# J2 — INSEE override join (bano2mimir.rs:104-115, bano.rs:78-81)
# ---------------------------------------------------------------------------


def insee_override(attached: DataFrame, admins: DataFrame, insee_col: str = "insee") -> DataFrame:
    """When an admin with the row's INSEE exists, replace all attached
    admins of that admin's level with it (keep others, append it)."""
    by_insee = admins.filter(F.length(F.coalesce("insee", F.lit(""))) > 0).select(
        F.col("insee").alias(insee_col),
        F.struct(
            F.col("id"), F.col("name"), F.col("level"), F.col("zone_type"),
            F.col("zip_codes"), F.col("weight"),
        ).alias("__insee_admin"),
    )
    joined = attached.join(F.broadcast(by_insee), insee_col, "left")
    replaced = F.when(
        F.col("__insee_admin").isNotNull(),
        F.concat(
            F.filter("admins", lambda a: a["level"] != F.col("__insee_admin")["level"]),
            F.array(F.col("__insee_admin")),
        ),
    ).otherwise(F.col("admins"))
    return joined.withColumn("admins", replaced).drop("__insee_admin")


# ---------------------------------------------------------------------------
# J3 — cosmogony parent-hierarchy resolution (src/admin.rs:251-294)
# ---------------------------------------------------------------------------


def resolve_admin_hierarchy(admins: DataFrame, max_depth: int = 10) -> DataFrame:
    """Fill ``parent_ids`` (the full ancestor chain, nearest first) by
    walking parent_id — the admin set is a dimension, so collect the
    skeleton to the driver and broadcast the resolved chains (the
    reference holds the whole map in memory the same way)."""
    skel = {
        r["id"]: r["parent_id"]
        for r in admins.select("id", "parent_id").collect()
    }
    chains = {}
    for aid in skel:
        chain = []
        cur = skel.get(aid)
        depth = 0
        while cur is not None and depth < max_depth:
            chain.append(cur)
            cur = skel.get(cur)
            depth += 1
        chains[aid] = chain
    spark = SparkSession.getActiveSession()
    chain_df = spark.createDataFrame(
        [(k, v) for k, v in chains.items()], "id string, parent_ids array<string>"
    )
    return admins.join(F.broadcast(chain_df), "id", "left")
