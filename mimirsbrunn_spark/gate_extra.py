"""Round-5 gate widening: driver gates (exact DuckDB oracles) for the
operators that were previously pytest-only — the transitive OSM
dependency pull (S2), admin parent-hierarchy resolution (J3), polygon
centroid/bbox (G12/G13), metric distance-to-polygon (G4), the scoped
geo_shape filter (G14), and the stop-line human sort (W4).

Cross-engine determinism follows gate.py's rules: integer arithmetic
wherever possible; where libm enters (cos/sqrt in the G4 distance) the
SQL mirrors the numpy op sequence exactly and outputs are rounded well
below the ulp-divergence floor.

Reference parity targets:
- S2  osmpbfreader get_objs_and_deps via the osm_reader modules
- J3  cosmogony parent chain, src/admin.rs:251-294
- G12/G13 libs/places centroid/bbox derivation for admins
- G4  the geo crate's planar polygon distance (distance annotation)
- G14 build_shape_query, dsl.rs:438-471
- W4  stop.rs:168-195 line ordering
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gate_points import (
    POINTS_FROM_NATION_SQL,
    POINTS_FROM_ORDERS_SQL,
    points_from_nation,
    points_from_orders,
)

# NOTE: .gate itself (rect_admins_df) is imported lazily inside the
# query builders — gate.py imports this module at its bottom.

# ---------------------------------------------------------------------------
# S2 — filtered-object + transitive-dependency scan (osm_deps_closure)
# ---------------------------------------------------------------------------
#
# Synthetic OSM-shaped graph from lineitem, integer-only so both engines
# build it identically: relation(order) → way(part) → node-ish
# supplier, plus a supplier↔twin 2-cycle so the gate proves the
# frontier's anti-join terminates on cyclic member references (real OSM
# relations can and do reference each other in cycles).

_PART_NS = 10_000_000
_SUPP_NS = 20_000_000
_TWIN_NS = 30_000_000


def q_osm_deps_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.readers import resolve_osm_dependencies

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok = F.col("l_orderkey").cast("long")
    pk = F.col("l_partkey").cast("long") + F.lit(_PART_NS)
    sk = F.col("l_suppkey").cast("long") + F.lit(_SUPP_NS)
    tw = F.col("l_suppkey").cast("long") + F.lit(_TWIN_NS)
    members = (
        li.select(ok.alias("parent_id"), pk.alias("child_id"))
        .unionByName(li.select(pk.alias("parent_id"), sk.alias("child_id")))
        .unionByName(li.select(sk.alias("parent_id"), tw.alias("child_id")))
        .unionByName(li.select(tw.alias("parent_id"), sk.alias("child_id")))
    )
    seeds = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(F.col("o_orderkey").cast("long").alias("osm_id"))
    )
    return resolve_osm_dependencies(seeds, members)


OSM_DEPS_CLOSURE_SQL = f"""
    WITH RECURSIVE edges AS (
        SELECT CAST(l_orderkey AS BIGINT) AS parent_id,
               CAST(l_partkey AS BIGINT) + {_PART_NS} AS child_id FROM lineitem
        UNION ALL
        SELECT CAST(l_partkey AS BIGINT) + {_PART_NS},
               CAST(l_suppkey AS BIGINT) + {_SUPP_NS} FROM lineitem
        UNION ALL
        SELECT CAST(l_suppkey AS BIGINT) + {_SUPP_NS},
               CAST(l_suppkey AS BIGINT) + {_TWIN_NS} FROM lineitem
        UNION ALL
        SELECT CAST(l_suppkey AS BIGINT) + {_TWIN_NS},
               CAST(l_suppkey AS BIGINT) + {_SUPP_NS} FROM lineitem
    ),
    closure AS (
        SELECT CAST(o_orderkey AS BIGINT) AS osm_id FROM orders WHERE o_orderkey % 20 = 0
        UNION
        SELECT e.child_id FROM closure c JOIN edges e ON e.parent_id = c.osm_id
    )
    SELECT DISTINCT osm_id FROM closure
"""


# ---------------------------------------------------------------------------
# J3 — parent-hierarchy resolution over the 548-admin rectangle dim
# ---------------------------------------------------------------------------


def q_admin_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .gate import rect_admins_df
    from .operators.places import resolve_admin_hierarchy

    admins = rect_admins_df(spark)
    resolved = resolve_admin_hierarchy(admins)
    return resolved.select(
        "id", F.array_join(F.col("parent_ids"), "|").alias("chain")
    )


# The rectangle hierarchy is closed-form: city(i,j) → state(i//4,j//4)
# → country(i//16,j//8); state(i,j) → country(i//4,j//2).
ADMIN_HIERARCHY_SQL = """
    SELECT 'adm:c:' || CAST(i.range AS VARCHAR) || ':' || CAST(j.range AS VARCHAR) AS id,
           '' AS chain
    FROM range(2) i, range(2) j
    UNION ALL
    SELECT 'adm:s:' || CAST(i.range AS VARCHAR) || ':' || CAST(j.range AS VARCHAR),
           'adm:c:' || CAST(i.range // 4 AS VARCHAR) || ':' || CAST(j.range // 2 AS VARCHAR)
    FROM range(8) i, range(4) j
    UNION ALL
    SELECT 'adm:t:' || CAST(i.range AS VARCHAR) || ':' || CAST(j.range AS VARCHAR),
           'adm:s:' || CAST(i.range // 4 AS VARCHAR) || ':' || CAST(j.range // 4 AS VARCHAR)
           || '|' ||
           'adm:c:' || CAST(i.range // 16 AS VARCHAR) || ':' || CAST(j.range // 8 AS VARCHAR)
    FROM range(32) i, range(16) j
"""


# ---------------------------------------------------------------------------
# G12/G13 — shoelace centroid + bbox from real WKB, vs closed form
# ---------------------------------------------------------------------------


def q_admin_centroid_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the actual WKB parse → mp_centroid/mp_bbox kernels
    (geometry.py) over the 548 admin polygons in an Arrow-batched UDF;
    the oracle knows each rectangle's center/extent in closed form.
    Rounded to 6 decimals: the closed-form values are exact quarter-
    precision doubles, the shoelace result is within a few ulp."""
    from .gate import rect_admins_df

    @F.pandas_udf(
        "struct<cx:double,cy:double,minx:double,miny:double,maxx:double,maxy:double>"
    )
    def _geom(wkb: pd.Series) -> pd.DataFrame:
        from .geometry import mp_bbox, mp_centroid, wkb_to_mp

        rows = []
        for buf in wkb:
            mp = wkb_to_mp(bytes(buf))
            cx, cy = mp_centroid(mp)
            minx, miny, maxx, maxy = mp_bbox(mp)
            rows.append((cx, cy, minx, miny, maxx, maxy))
        return pd.DataFrame(rows, columns=["cx", "cy", "minx", "miny", "maxx", "maxy"])

    admins = rect_admins_df(spark)
    g = admins.select("id", _geom("boundary_wkb").alias("g"))
    return g.select(
        "id",
        *[F.round(F.col(f"g.{c}"), 6).alias(c) for c in ("cx", "cy", "minx", "miny", "maxx", "maxy")],
    )


def _centroid_level_sql(prefix: str, ni: int, nj: int, w: float, h: float) -> str:
    return f"""
    SELECT '{prefix}' || CAST(i.range AS VARCHAR) || ':' || CAST(j.range AS VARCHAR) AS id,
           ROUND(-180.0 + i.range * {w} + {w / 2.0}, 6) AS cx,
           ROUND(-90.0 + j.range * {h} + {h / 2.0}, 6) AS cy,
           ROUND(-180.0 + i.range * {w}, 6) AS minx,
           ROUND(-90.0 + j.range * {h}, 6) AS miny,
           ROUND(-180.0 + i.range * {w} + {w}, 6) AS maxx,
           ROUND(-90.0 + j.range * {h} + {h}, 6) AS maxy
    FROM range({ni}) i, range({nj}) j
    """


ADMIN_CENTROID_BBOX_SQL = (
    _centroid_level_sql("adm:c:", 2, 2, 180.0, 90.0)
    + " UNION ALL "
    + _centroid_level_sql("adm:s:", 8, 4, 45.0, 45.0)
    + " UNION ALL "
    + _centroid_level_sql("adm:t:", 32, 16, 11.25, 11.25)
)


# ---------------------------------------------------------------------------
# G4 — metric distance to a polygon (nation query points vs one country
# rectangle), SQL mirroring the numpy op sequence edge by edge
# ---------------------------------------------------------------------------

_G4_RECT = (0.0, -90.0, 180.0, 90.0)  # x0, y0, w, h — country adm:c:1:0
_M_PER_DEG = 2.0 * math.pi * 6371000.0 / 360.0


def _g4_ring() -> np.ndarray:
    x0, y0, w, h = _G4_RECT
    return np.array(
        [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)], dtype=np.float64
    )


def q_distance_to_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ring = _g4_ring()

    @F.pandas_udf("double")
    def _dist(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from .geometry import points_to_mp_distance_m

        return pd.Series(
            points_to_mp_distance_m(lon.to_numpy(), lat.to_numpy(), [[ring]])
        )

    pts = points_from_nation(spark, sf_dir)
    return pts.select(
        "query_id", F.round(_dist("lon", "lat"), 2).alias("dist_m")
    )


def _g4_edge_sql(ax: float, ay: float, bx: float, by: float) -> str:
    """One edge's point-to-segment distance, replicating
    points_to_mp_distance_m's op order: per-edge local equirectangular
    x-scaling by cos of the mean latitude of (edge midpoint, point).
    SQL has no let-binding inside an expression, so the clamped ``t``
    term is textually repeated — the arithmetic is identical."""
    mid = f"({ay!r} + {by!r}) / 2.0"
    cl = f"cos(radians((lat + {mid}) / 2.0))"
    ux = f"({bx!r} * {cl} - {ax!r} * {cl})"
    uy = f"({by!r} - {ay!r})"
    t = (
        f"GREATEST(0.0, LEAST(1.0, "
        f"((lon * {cl} - {ax!r} * {cl}) * {ux} + (lat - {ay!r}) * {uy})"
        f" / ({ux} * {ux} + {uy} * {uy})))"
    )
    dx = f"(lon * {cl} - ({ax!r} * {cl} + {t} * {ux}))"
    dy = f"(lat - ({ay!r} + {t} * {uy}))"
    return f"sqrt({dx} * {dx} + {dy} * {dy})"


def _distance_oracle_sql() -> str:
    ring = _g4_ring()
    edges = []
    n = len(ring)
    for k in range(n):
        ax, ay = float(ring[k][0]), float(ring[k][1])
        bx, by = float(ring[(k + 1) % n][0]), float(ring[(k + 1) % n][1])
        edges.append(_g4_edge_sql(ax, ay, bx, by))
    x0, y0, w, h = _G4_RECT
    least = "LEAST(" + ", ".join(edges) + ")"
    return f"""
        WITH pts AS ({POINTS_FROM_NATION_SQL})
        SELECT query_id,
               CASE WHEN lon >= {x0!r} AND lon <= {x0 + w!r}
                     AND lat >= {y0!r} AND lat <= {y0 + h!r}
                    THEN 0.0
                    ELSE ROUND({least} * {_M_PER_DEG!r}, 2)
               END AS dist_m
        FROM pts
    """


# ---------------------------------------------------------------------------
# G14 — geo_shape filter scoped by place type
# ---------------------------------------------------------------------------

_SHAPE_RECT = (0.0, 0.0, 45.0, 45.0)


def q_shape_filter_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.geocode import shape_filter

    x0, y0, w, h = _SHAPE_RECT
    ring = np.array(
        [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)], dtype=np.float64
    )
    pts = points_from_orders(spark, sf_dir)
    places = pts.select(
        "point_id",
        "lon",
        "lat",
        F.when(F.col("point_id") % 3 == 0, F.lit("poi"))
        .when(F.col("point_id") % 3 == 1, F.lit("addr"))
        .otherwise(F.lit("street"))
        .alias("type"),
    )
    out = shape_filter(places, [[ring]], ["poi", "addr"])
    return out.select("point_id", "type")


def _shape_filter_sql() -> str:
    x0, y0, w, h = _SHAPE_RECT
    return f"""
        WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
        typed AS (
            SELECT point_id, lon, lat,
                   CASE CAST(point_id % 3 AS INT)
                        WHEN 0 THEN 'poi' WHEN 1 THEN 'addr' ELSE 'street'
                   END AS type
            FROM pts
        )
        SELECT point_id, type FROM typed
        WHERE type NOT IN ('poi', 'addr')
           OR (lon >= {x0!r} AND lon <= {x0 + w!r} AND lat >= {y0!r} AND lat <= {y0 + h!r})
    """


# ---------------------------------------------------------------------------
# W4 — stop-line human (natural) sort
# ---------------------------------------------------------------------------

_NULLS_LAST = 2**60


def q_stop_line_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalars import sort_lines

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ln = F.col("l_linenumber").cast("int")
    line = F.struct(
        F.when(ln % 3 == 0, F.lit(None).cast("int")).otherwise((ln % 2).cast("int")).alias("sort_order"),
        F.concat(
            F.lit("C"), ln.cast("string"), F.lit("_"), (F.col("l_partkey") % 120).cast("string")
        ).alias("code"),
        F.concat(F.lit("bus "), (F.col("l_suppkey") % 45).cast("string")).alias("name"),
    )
    grouped = (
        li.select(F.col("l_orderkey").alias("route_id"), line.alias("line"))
        .groupBy("route_id")
        .agg(F.collect_list("line").alias("lines"))
    )
    return grouped.select(
        "route_id",
        F.array_join(
            F.transform(
                sort_lines("lines"), lambda l: F.concat(l["code"], F.lit("/"), l["name"])
            ),
            ",",
        ).alias("line_order"),
    )


STOP_LINE_SORT_SQL = f"""
    WITH lines AS (
        SELECT l_orderkey AS route_id,
               CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_linenumber % 2 END AS so,
               l_linenumber AS ln,
               l_partkey % 120 AS pk,
               l_suppkey % 45 AS sk
        FROM lineitem
    )
    SELECT route_id,
           string_agg(
               'C' || CAST(ln AS VARCHAR) || '_' || CAST(pk AS VARCHAR)
                   || '/' || 'bus ' || CAST(sk AS VARCHAR),
               ','
               ORDER BY COALESCE(CAST(so AS BIGINT), {_NULLS_LAST}),
                        'c' || lpad(CAST(ln AS VARCHAR), 10, '0')
                            || '_' || lpad(CAST(pk AS VARCHAR), 10, '0'),
                        'bus ' || lpad(CAST(sk AS VARCHAR), 10, '0')
           ) AS line_order
    FROM lines
    GROUP BY route_id
"""


# ---------------------------------------------------------------------------
# A3+A2 — population parse (tags → fallback center_tags → 0) then
# normalize clamp(w / 1.4e9, 0, 1)
# ---------------------------------------------------------------------------


def q_weight_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalars import population_weight
    from .operators.enrich import normalize_weight

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    tags = F.create_map(
        F.lit("population"),
        F.when(k % 10 == 0, F.lit("xx")).otherwise((k * 700000).cast("string")),
    )
    center_tags = F.create_map(
        F.lit("population"),
        F.when(k % 20 == 0, F.lit("yy")).otherwise((k * 300000).cast("string")),
    )
    pop = population_weight(tags, center_tags)
    return c.select(
        F.col("c_custkey").alias("query_id"), normalize_weight(pop).alias("weight")
    )


WEIGHT_NORMALIZE_SQL = """
    SELECT c_custkey AS query_id,
           CASE WHEN c_custkey % 20 = 0 THEN 0.0
                WHEN c_custkey % 10 = 0 THEN
                     LEAST(GREATEST(CAST(c_custkey AS BIGINT) * 300000 / 1.4e9, 0.0), 1.0)
                ELSE LEAST(GREATEST(CAST(c_custkey AS BIGINT) * 700000 / 1.4e9, 0.0), 1.0)
           END AS weight
    FROM customer
"""


# ---------------------------------------------------------------------------
# C7/C8/C9 — codes / i18n names / country code from an OSM tag map
# ---------------------------------------------------------------------------


def q_tag_codes_i18n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalars import (
        codes_from_tags,
        country_code_from_codes,
        i18n_names_from_tags,
    )

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nk = F.col("n_nationkey").cast("string")
    tags = F.create_map(
        F.lit("ISO3166-1:alpha2"), F.substring("n_name", 1, 2),
        F.lit("ref:INSEE"), nk,
        F.lit("wikidata"), F.concat(F.lit("Q"), nk),
        F.lit("name"), F.col("n_name"),
        F.lit("name:fr"), F.concat(F.lit("fr-"), F.col("n_name")),
        F.lit("name:de"), F.concat(F.lit("de-"), F.col("n_name")),
        F.lit("name:zz"), F.concat(F.lit("zz-"), F.col("n_name")),
        F.lit("highway"), F.lit("bus_stop"),
    )
    base = n.select(F.col("n_nationkey").alias("nation_id"), tags.alias("tags"))
    codes = base.select(
        "nation_id", F.explode(F.map_entries(codes_from_tags("tags"))).alias("e")
    ).select("nation_id", F.lit("code").alias("kind"), F.col("e.key").alias("key"), F.col("e.value").alias("value"))
    names = base.select(
        "nation_id",
        F.explode(F.map_entries(i18n_names_from_tags("tags", ["fr", "de"]))).alias("e"),
    ).select("nation_id", F.lit("name").alias("kind"), F.col("e.key").alias("key"), F.col("e.value").alias("value"))
    cc = base.select(
        "nation_id",
        F.lit("cc").alias("kind"),
        F.lit("country_code").alias("key"),
        country_code_from_codes(codes_from_tags("tags")).alias("value"),
    )
    return codes.unionByName(names).unionByName(cc)


TAG_CODES_I18N_SQL = """
    SELECT n_nationkey AS nation_id, 'code' AS kind, 'ISO3166-1:alpha2' AS key,
           substring(n_name, 1, 2) AS value FROM nation
    UNION ALL
    SELECT n_nationkey, 'code', 'ref:INSEE', CAST(n_nationkey AS VARCHAR) FROM nation
    UNION ALL
    SELECT n_nationkey, 'code', 'wikidata', 'Q' || CAST(n_nationkey AS VARCHAR) FROM nation
    UNION ALL
    SELECT n_nationkey, 'name', 'fr', 'fr-' || n_name FROM nation
    UNION ALL
    SELECT n_nationkey, 'name', 'de', 'de-' || n_name FROM nation
    UNION ALL
    SELECT n_nationkey, 'cc', 'country_code', lower(substring(n_name, 1, 2)) FROM nation
"""


# ---------------------------------------------------------------------------
# J8 — munin union view with type pruning (streets supplied but NOT
# requested — the oracle proves the pruned table contributes no rows)
# ---------------------------------------------------------------------------


def q_union_places_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.union_view import places_view

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ck = F.col("c_custkey").cast("long")
    addrs = c.select(
        F.concat(F.lit("addr:"), ck.cast("string")).alias("addr_id"),
        F.col("c_name").alias("name"),
        ((ck * 13) % 3600 / 10.0 - 180.0).alias("lon"),
        ((ck * 7) % 1800 / 10.0 - 90.0).alias("lat"),
        ((ck % 100) / 100.0).alias("weight"),
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    streets = s.select(
        F.concat(F.lit("street:"), F.col("s_suppkey").cast("string")).alias("street_id"),
        F.col("s_name").alias("name"),
        F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat"),
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    pk = F.col("p_partkey").cast("long")
    pois = p.select(
        F.concat(F.lit("poi:"), pk.cast("string")).alias("poi_id"),
        F.col("p_name").alias("name"),
        ((pk * 17) % 3600 / 10.0 - 180.0).alias("lon"),
        ((pk * 11) % 1800 / 10.0 - 90.0).alias("lat"),
    )
    view = places_view(spark, addrs=addrs, streets=streets, pois=pois, types=["addr", "poi"])
    return view.select("id", "type", "name", "lon", "lat", "weight")


UNION_PLACES_VIEW_SQL = """
    SELECT 'addr:' || CAST(c_custkey AS VARCHAR) AS id, 'addr' AS type, c_name AS name,
           (CAST(c_custkey AS BIGINT) * 13) % 3600 / 10.0 - 180.0 AS lon,
           (CAST(c_custkey AS BIGINT) * 7) % 1800 / 10.0 - 90.0 AS lat,
           (c_custkey % 100) / 100.0 AS weight
    FROM customer
    UNION ALL
    SELECT 'poi:' || CAST(p_partkey AS VARCHAR), 'poi', p_name,
           (CAST(p_partkey AS BIGINT) * 17) % 3600 / 10.0 - 180.0,
           (CAST(p_partkey AS BIGINT) * 11) % 1800 / 10.0 - 90.0,
           0.0
    FROM part
"""


# ---------------------------------------------------------------------------
# F2 — POI first-match rule engine (first matching rule wins; unmatched
# rows are dropped entirely)
# ---------------------------------------------------------------------------


def q_poi_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.places import classify_pois

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    pk = F.col("p_partkey").cast("long")
    am = (
        F.when(pk % 5 == 0, F.lit("townhall"))
        .when(pk % 5 == 1, F.lit("parking"))
        .when(pk % 5 == 3, F.lit("college"))
        .otherwise(F.lit("junk"))
    )
    le = (
        F.when(pk % 3 == 0, F.lit("garden"))
        .when(pk % 3 == 1, F.lit("park"))
        .otherwise(F.lit("none"))
    )
    pois = p.select(
        F.col("p_partkey").alias("poi_id"),
        F.create_map(F.lit("amenity"), am, F.lit("leisure"), le).alias("tags"),
    )
    out = classify_pois(pois)
    return out.select(
        "poi_id", F.col("poi_type.id").alias("type_id"), F.col("poi_type.name").alias("type_name")
    )


# Rule order: every amenity rule precedes garden/park, and exactly one
# amenity value can match per row, so the first-match semantics reduce
# to this CASE (college < parking < townhall < garden < park in the
# DEFAULT_POI_RULES order is irrelevant for single-valued tags).
POI_CLASSIFY_SQL = """
    WITH typed AS (
        SELECT p_partkey AS poi_id,
               CASE WHEN p_partkey % 5 = 0 THEN 'townhall'
                    WHEN p_partkey % 5 = 1 THEN 'parking'
                    WHEN p_partkey % 5 = 3 THEN 'college'
                    ELSE 'junk' END AS am,
               CASE WHEN p_partkey % 3 = 0 THEN 'garden'
                    WHEN p_partkey % 3 = 1 THEN 'park'
                    ELSE 'none' END AS le
        FROM part
    )
    SELECT poi_id,
           CASE WHEN am = 'college' THEN 'poi_type:amenity:college'
                WHEN am = 'parking' THEN 'poi_type:amenity:parking'
                WHEN am = 'townhall' THEN 'poi_type:amenity:townhall'
                WHEN le = 'garden' THEN 'poi_type:leisure:garden'
                WHEN le = 'park' THEN 'poi_type:leisure:park'
           END AS type_id,
           CASE WHEN am = 'college' THEN 'college'
                WHEN am = 'parking' THEN 'parking'
                WHEN am = 'townhall' THEN 'town hall'
                WHEN le = 'garden' THEN 'garden'
                WHEN le = 'park' THEN 'park'
           END AS type_name
    FROM typed
    WHERE am IN ('college', 'parking', 'townhall') OR le IN ('garden', 'park')
"""


# ---------------------------------------------------------------------------
# S4 — BANO CSV reader round-trip: deterministic CSV written from
# customer, read back through the REAL reader (schema enforcement,
# DROPMALFORMED, empty-street drop), vs the surviving-row oracle
# ---------------------------------------------------------------------------


def _gate_tmp(sf_dir: str, kind: str) -> str:
    # pid-keyed so concurrent sessions over the same fixture (e.g. the
    # sf1 gate harness racing a dev suite run) never clobber each other's
    # scratch; each q_* call writes then reads within one process
    import os
    import re

    slug = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")
    return f"/tmp/mim_gate_srcfiles/{slug}/pid{os.getpid()}/{kind}"


def q_bano_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.readers import read_bano_csv

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    ks = k.cast("string")
    rows = c.select(
        F.concat(F.lit("b"), ks).alias("id"),
        F.concat((k % 200).cast("string"), F.when(k % 7 == 0, F.lit("bis")).otherwise(F.lit(""))).alias("house_number"),
        F.when(k % 11 == 0, F.lit("")).otherwise(F.concat(F.lit("rue "), (k % 50).cast("string"))).alias("street"),
        (k % 90000 + 10000).cast("string").alias("zip"),
        F.concat(F.lit("city"), (k % 30).cast("string")).alias("city"),
        F.lit("bano").alias("src"),
        # k%13==0 rows get an unparseable lat — the reader must drop them
        F.when(k % 13 == 0, F.lit("bad")).otherwise(
            (((k * 7) % 1800 - 900) / 10.0).cast("string")
        ).alias("lat"),
        (((k * 13) % 3600 - 1800) / 10.0).cast("string").alias("lon"),
    )
    path = _gate_tmp(sf_dir, "bano_csv")
    rows.write.mode("overwrite").option("emptyValue", "").csv(path)
    out = read_bano_csv(spark, path)
    return out.select("id", "house_number", "street", "zip", "city", "lat", "lon")


BANO_CSV_SQL = """
    SELECT 'b' || CAST(c_custkey AS VARCHAR) AS id,
           CAST(c_custkey % 200 AS VARCHAR)
               || CASE WHEN c_custkey % 7 = 0 THEN 'bis' ELSE '' END AS house_number,
           'rue ' || CAST(c_custkey % 50 AS VARCHAR) AS street,
           CAST(c_custkey % 90000 + 10000 AS VARCHAR) AS zip,
           'city' || CAST(c_custkey % 30 AS VARCHAR) AS city,
           ((CAST(c_custkey AS BIGINT) * 7) % 1800 - 900) / 10.0 AS lat,
           ((CAST(c_custkey AS BIGINT) * 13) % 3600 - 1800) / 10.0 AS lon
    FROM customer
    WHERE c_custkey % 11 != 0 AND c_custkey % 13 != 0
"""


# ---------------------------------------------------------------------------
# S3 — cosmogony JSONL reader round-trip (malformed lines dropped)
# ---------------------------------------------------------------------------


def q_cosmogony_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.readers import read_cosmogony_jsonl

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey").cast("long")
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("zone:"), k.cast("string")).alias("id"),
            F.concat(F.lit("Zone "), F.col("n_name")).alias("name"),
            F.element_at(
                F.array(F.lit("city"), F.lit("state"), F.lit("country"), F.lit("unknown")),
                (k % 4 + 1).cast("int"),
            ).alias("zone_type"),
            F.when(k % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("parent:"), (k % 7).cast("string"))
            ).alias("parent_id"),
        )
    )
    lines = n.select(
        F.when(k % 5 == 0, F.lit('{"broken')).otherwise(payload).alias("value")
    )
    path = _gate_tmp(sf_dir, "cosmogony_jsonl")
    lines.write.mode("overwrite").text(path)
    out = read_cosmogony_jsonl(
        spark, path, schema="id string, name string, zone_type string, parent_id string"
    )
    return out.select("id", "name", "zone_type", "parent_id")


COSMOGONY_JSONL_SQL = """
    SELECT 'zone:' || CAST(n_nationkey AS VARCHAR) AS id,
           'Zone ' || n_name AS name,
           CASE CAST(n_nationkey % 4 AS INT)
                WHEN 0 THEN 'city' WHEN 1 THEN 'state'
                WHEN 2 THEN 'country' ELSE 'unknown' END AS zone_type,
           CASE WHEN n_nationkey % 3 = 0 THEN ''
                ELSE 'parent:' || CAST(n_nationkey % 7 AS VARCHAR) END AS parent_id
    FROM nation
    WHERE n_nationkey % 5 != 0
"""


# ---------------------------------------------------------------------------
# G8 — POI → nearest-address LEFT join (keep the POI when none found);
# null sentinels (-1) so both engines hash identically
# ---------------------------------------------------------------------------

_G8_RADIUS_M = 200_000.0


def q_poi_nearest_addr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.knn import reverse_geocode

    pois = points_from_nation(spark, sf_dir)
    addrs = points_from_orders(spark, sf_dir).withColumnRenamed("point_id", "target_id")
    nearest = reverse_geocode(
        pois, addrs, k=1, radius_m=_G8_RADIUS_M, res=0,
        query_id="query_id", target_id="target_id",
    ).select(
        "query_id",
        F.col("target_id").alias("nearest_addr_id"),
        F.col("distance_m").alias("nearest_addr_distance_m"),
    )
    return (
        pois.select(F.col("query_id").alias("poi_id"))
        .join(nearest, F.col("poi_id") == F.col("query_id"), "left")
        .select(
            "poi_id",
            F.coalesce(F.col("nearest_addr_id"), F.lit(-1)).alias("nearest_addr_id"),
            F.coalesce(F.col("nearest_addr_distance_m"), F.lit(-1.0)).alias("nearest_addr_distance_m"),
        )
    )


def _poi_nearest_addr_sql() -> str:
    from .geometry import haversine_sql

    return f"""
        WITH q AS ({POINTS_FROM_NATION_SQL}),
        t AS ({POINTS_FROM_ORDERS_SQL}),
        pairs AS (
            SELECT q.query_id, t.point_id AS target_id,
                   {haversine_sql('q.lon', 'q.lat', 't.lon', 't.lat')} AS d
            FROM q, t
        ),
        ranked AS (
            SELECT query_id, target_id, round(d, 3) AS distance_m,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(d, 3) ASC, target_id ASC
                   ) AS rank
            FROM pairs WHERE d <= {_G8_RADIUS_M!r}
        )
        SELECT q.query_id AS poi_id,
               COALESCE(r.target_id, -1) AS nearest_addr_id,
               COALESCE(r.distance_m, -1.0) AS nearest_addr_distance_m
        FROM q LEFT JOIN (SELECT * FROM ranked WHERE rank = 1) r USING (query_id)
    """


# ---------------------------------------------------------------------------
# Z-order layout — cluster-on-write + stats-pruned range scan
# ---------------------------------------------------------------------------
#
# The gate proves the layout is RESULT-TRANSPARENT: writing the point
# cloud range-clustered on the Morton key and scanning it back through a
# key-window predicate returns exactly the rows the oracle computes
# straight from the source table (the layout only changes which files a
# scan opens — pruning itself is asserted by tests/test_layout.py on the
# parquet footer stats). Window = a prefix-2 quad (lon [0,90), lat
# [-90,-45)) that the derived point cloud populates at every sf. Reference relationship: ES geohash-bucketed routing
# (mimir-base.json geo fields) is the reference's implicit layout.


def q_zorder_cluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.layout import write_spatially_clustered, zrange_scan

    pts = points_from_orders(spark, sf_dir)
    path = _gate_tmp(sf_dir, "zorder_pts")
    key = write_spatially_clustered(pts, path, res=12, n_files=8)
    lo, hi = _zorder_window()
    return zrange_scan(spark, path, lo, hi, key).select("point_id", key)


def _zorder_window() -> tuple[int, int]:
    from .tiles import morton_window

    return morton_window(2.35, -60.0, res=12, prefix_bits=2)


def _zorder_cluster_sql() -> str:
    from .tiles import morton_key_sql_cte

    lo, hi = _zorder_window()
    cte = morton_key_sql_cte(POINTS_FROM_ORDERS_SQL, "lon", "lat", 12)
    return f"""
    SELECT point_id, z_12 FROM ({cte})
    WHERE z_12 BETWEEN {lo} AND {hi}
    """


# ---------------------------------------------------------------------------
# S10 — partial-update MERGE (update-by-id), vs a DuckDB merge mirror
# ---------------------------------------------------------------------------
#
# merge_update semantics (sources/lifecycle.py:57-87, reference
# update-by-id path update.rs:11-39): matched keys merge column-wise
# (non-null update values win, null update fields keep the target's
# value), unmatched update keys INSERT null-padded to the target schema.
# The gate exercises all three branches; null outputs map to sentinels
# identically in both engines so the value-hash is null-free.


def q_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.lifecycle import merge_update

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    target = c.select(
        k.alias("id"),
        F.concat(F.lit("n"), k.cast("string")).alias("name"),
        F.concat(F.lit("c"), (k % 30).cast("string")).alias("city"),
        (k % 100).cast("double").alias("weight"),
    )
    matched = c.filter(k % 3 == 0).select(
        k.alias("id"),
        F.concat(F.lit("upd"), k.cast("string")).alias("name"),
        # every other matched update leaves city NULL -> target value wins
        F.when(k % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("uc"), (k % 30).cast("string")))
        .alias("city"),
    )
    inserts = c.filter(k % 97 == 0).select(
        (k + F.lit(10_000_000)).alias("id"),
        F.concat(F.lit("new"), k.cast("string")).alias("name"),
        F.lit(None).cast("string").alias("city"),
    )
    merged = merge_update(target, matched.unionByName(inserts), "id")
    return merged.select(
        "id",
        "name",
        F.coalesce("city", F.lit("-")).alias("city"),
        F.coalesce("weight", F.lit(-1.0)).alias("weight"),
    )


MERGE_UPDATE_SQL = """
    WITH t AS (
        SELECT CAST(c_custkey AS BIGINT) AS id,
               'n' || CAST(c_custkey AS VARCHAR) AS name,
               'c' || CAST(c_custkey % 30 AS VARCHAR) AS city,
               CAST(c_custkey % 100 AS DOUBLE) AS weight
        FROM customer
    ),
    u AS (
        SELECT CAST(c_custkey AS BIGINT) AS id,
               'upd' || CAST(c_custkey AS VARCHAR) AS name,
               CASE WHEN c_custkey % 6 = 0 THEN NULL
                    ELSE 'uc' || CAST(c_custkey % 30 AS VARCHAR) END AS city
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT) + 10000000,
               'new' || CAST(c_custkey AS VARCHAR), NULL
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT t.id,
           COALESCE(COALESCE(u.name, t.name), '-') AS name,
           COALESCE(COALESCE(u.city, t.city), '-') AS city,
           COALESCE(t.weight, -1.0) AS weight
    FROM t LEFT JOIN u ON t.id = u.id
    UNION ALL
    SELECT u.id, COALESCE(u.name, '-'), COALESCE(u.city, '-'), -1.0
    FROM u ANTI JOIN t ON t.id = u.id
"""


# ---------------------------------------------------------------------------
# input_hint API — vectorized Arrow span extraction over interleaved docs
# ---------------------------------------------------------------------------
#
# The north-rule input is an interleaved-docs table (doc_id, spans:
# array<struct<kind,text,media_ref,offset>>) with geometry extracted via
# vectorized Arrow UDFs. This gate synthesizes that exact table shape
# deterministically from orders (one media span + one geo span + one
# prose span per doc; every 7th geo span malformed), drives the
# mapInArrow extraction (operators/spans.py extract_geo_points_arrow),
# and checks it against the oracle: the same point cloud pushed through
# the same '%.6f' fixed-decimal text round-trip (printf then parse), so
# both engines format the bit-identical source double to the same string
# and re-parse it with a correctly-rounded parser — bit-exact output
# without depending on either engine's double->string shortest repr.


def q_geo_points_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.spans import extract_geo_points_arrow

    pts = points_from_orders(spark, sf_dir)
    k = F.col("point_id").cast("long")
    did = F.col("point_id").cast("string")
    geo_text = F.when(k % 7 == 0, F.lit("not-a-coord")).otherwise(
        F.format_string("%.6f;%.6f", F.col("lon"), F.col("lat"))
    )
    span = lambda kind, text, ref, off: F.struct(  # noqa: E731
        kind.alias("kind"), text.alias("text"),
        ref.alias("media_ref"), F.lit(off).cast("int").alias("offset"),
    )
    docs = pts.select(
        did.alias("doc_id"),
        F.array(
            span(F.lit("media"), F.lit(""), F.concat(F.lit("media:"), did), 0),
            span(F.lit("geo"), geo_text, F.lit(""), 1),
            span(F.lit("text"), F.lit("lorem ipsum"), F.lit(""), 2),
        ).alias("spans"),
    )
    return extract_geo_points_arrow(docs)


GEO_POINTS_ARROW_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL})
    SELECT CAST(point_id AS VARCHAR) AS doc_id,
           CAST(1 AS INT) AS span_offset,
           CAST(printf('%.6f', lon) AS DOUBLE) AS lon,
           CAST(printf('%.6f', lat) AS DOUBLE) AS lat
    FROM pts
    WHERE point_id % 7 <> 0
"""


EXTRA_QUERIES = {
    "osm_deps_closure": (q_osm_deps_closure, OSM_DEPS_CLOSURE_SQL),
    "admin_hierarchy": (q_admin_hierarchy, ADMIN_HIERARCHY_SQL),
    "admin_centroid_bbox": (q_admin_centroid_bbox, ADMIN_CENTROID_BBOX_SQL),
    "distance_to_polygon": (q_distance_to_polygon, _distance_oracle_sql()),
    "shape_filter_scoped": (q_shape_filter_scoped, _shape_filter_sql()),
    "stop_line_sort": (q_stop_line_sort, STOP_LINE_SORT_SQL),
    "weight_normalize": (q_weight_normalize, WEIGHT_NORMALIZE_SQL),
    "tag_codes_i18n": (q_tag_codes_i18n, TAG_CODES_I18N_SQL),
    "union_places_view": (q_union_places_view, UNION_PLACES_VIEW_SQL),
    "poi_classify": (q_poi_classify, POI_CLASSIFY_SQL),
    "bano_csv_roundtrip": (q_bano_csv_roundtrip, BANO_CSV_SQL),
    "cosmogony_jsonl_roundtrip": (q_cosmogony_jsonl_roundtrip, COSMOGONY_JSONL_SQL),
    "poi_nearest_addr": (q_poi_nearest_addr, _poi_nearest_addr_sql()),
    "zorder_cluster_scan": (q_zorder_cluster_scan, _zorder_cluster_sql()),
    "merge_update": (q_merge_update, MERGE_UPDATE_SQL),
    "geo_points_arrow": (q_geo_points_arrow, GEO_POINTS_ARROW_SQL),
}


# ---------------------------------------------------------------------------
# Curation: stratified sampling + sequence packing (operators/curation.py)
# ---------------------------------------------------------------------------


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quota sampling (quotas mode): 25 docs per lang,
    ranked by the portable LCG selection hash — deterministic across
    engines and cluster widths."""
    from .operators.curation import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    quotas = d.select("lang").distinct().withColumn("quota", F.lit(25))
    return stratified_sample(d, ("lang",), quotas=quotas).select(
        "doc_id", "lang", F.col("sample_h").cast("long").alias("sample_h")
    )


def q_hash_rate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateless 100-TB sampling path (rate mode): keep rows whose
    selection hash clears the rate threshold — a pure filter, no window,
    no shuffle, no exchange anywhere in the plan."""
    from .operators.curation import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    return stratified_sample(d, rate=0.2).select(
        "doc_id", "lang", F.col("sample_h").cast("long").alias("sample_h")
    )


def _curation_hash_sql() -> str:
    from .operators.curation import sample_hash_col

    return sample_hash_col("doc_id")


def _stratified_sample_sql() -> str:
    return f"""
    WITH h AS (
        SELECT doc_id, lang, {_curation_hash_sql()} AS sample_h FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, sample_h,
               row_number() OVER (PARTITION BY lang
                   ORDER BY sample_h ASC, doc_id ASC) AS rnk
        FROM h
    )
    SELECT doc_id, lang, CAST(sample_h AS BIGINT) AS sample_h
    FROM ranked WHERE rnk <= 25
    """


def _hash_rate_sample_sql() -> str:
    from .operators.curation import HASH_P

    return f"""
    SELECT doc_id, lang, CAST({_curation_hash_sql()} AS BIGINT) AS sample_h
    FROM documents
    WHERE {_curation_hash_sql()} < {int(0.2 * HASH_P)}
    """


_PACK_BUDGET = 200


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit token-budget packing per language shard: whitespace
    token counts (the token_count gate's engine-exact expression) packed
    at budget 200 — the applyInPandas sequential walk vs a DuckDB
    recursive-CTE replay of the identical next-fit recurrence."""
    from .operators.curation import pack_sequences

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"[ \t\r\n\x0b\f]+")
    n = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(F.size(toks))
    withn = d.select("lang", "doc_id", n.cast("long").alias("n_tokens"))
    return pack_sequences(withn, budget=_PACK_BUDGET, group_cols=("lang",)).select(
        "lang", "doc_id", "n_tokens",
        F.col("bin").cast("int").alias("bin"),
        F.col("bin_pos").cast("int").alias("bin_pos"),
    )


PACK_SEQUENCES_SQL = rf"""
    WITH RECURSIVE toks AS (
        SELECT lang, doc_id,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+'))
                END)::BIGINT AS n_tokens,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ),
    walk AS (
        SELECT lang, doc_id, n_tokens, rn,
               CASE WHEN n_tokens <= {_PACK_BUDGET} THEN 0 ELSE 1 END AS bin,
               n_tokens AS cum,
               0 AS bin_pos
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.doc_id, t.n_tokens, t.rn,
               CASE WHEN w.cum + t.n_tokens <= {_PACK_BUDGET}
                    THEN w.bin ELSE w.bin + 1 END,
               CASE WHEN w.cum + t.n_tokens <= {_PACK_BUDGET}
                    THEN w.cum + t.n_tokens ELSE t.n_tokens END,
               CASE WHEN w.cum + t.n_tokens <= {_PACK_BUDGET}
                    THEN w.bin_pos + 1 ELSE 0 END
        FROM walk w JOIN toks t ON t.lang = w.lang AND t.rn = w.rn + 1
    )
    SELECT lang, doc_id, n_tokens, CAST(bin AS INT) AS bin,
           CAST(bin_pos AS INT) AS bin_pos
    FROM walk
"""


EXTRA_QUERIES["stratified_sample"] = (q_stratified_sample, _stratified_sample_sql())
EXTRA_QUERIES["hash_rate_sample"] = (q_hash_rate_sample, _hash_rate_sample_sql())
EXTRA_QUERIES["pack_sequences"] = (q_pack_sequences, PACK_SEQUENCES_SQL)


# ---------------------------------------------------------------------------
# CCNet LM quality stratification (operators/textprep.unigram_ppl_buckets)
# ---------------------------------------------------------------------------


def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language unigram-LM perplexity scores + CCNet head/middle/tail
    ntile(3) buckets over the documents corpus."""
    from .operators.textprep import unigram_ppl_buckets

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_ppl_buckets(d.select("doc_id", "lang", "text"))


PPL_BUCKETS_SQL = r"""
    WITH nonempty AS (
        SELECT doc_id, lang, text FROM documents WHERE length(trim(text)) > 0
    ),
    exploded AS (
        SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+')) AS tok
        FROM nonempty
    ),
    counts AS (SELECT lang, tok, count(*) AS c FROM exploded GROUP BY lang, tok),
    lang_tot AS (
        SELECT lang, sum(c) AS total, count(*) AS vocab FROM counts GROUP BY lang
    ),
    nll AS (
        SELECT e.doc_id, e.lang,
               round(avg(ln(t.total + t.vocab) - ln(c.c + 1)), 6) AS ppl_score
        FROM exploded e
        JOIN counts c ON c.lang = e.lang AND c.tok = e.tok
        JOIN lang_tot t ON t.lang = e.lang
        GROUP BY e.doc_id, e.lang
    ),
    bucketed AS (
        SELECT doc_id, lang, ppl_score,
               ntile(3) OVER (PARTITION BY lang
                   ORDER BY ppl_score ASC, doc_id ASC) AS ppl_bucket
        FROM nll
    )
    SELECT d.doc_id, d.lang, b.ppl_score, CAST(b.ppl_bucket AS INT) AS ppl_bucket
    FROM documents d
    LEFT JOIN bucketed b ON b.doc_id = d.doc_id AND b.lang = d.lang
"""


EXTRA_QUERIES["ppl_buckets"] = (q_ppl_buckets, PPL_BUCKETS_SQL)


# ---------------------------------------------------------------------------
# Temperature-smoothed mixture sampling (operators/curation)
# ---------------------------------------------------------------------------


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """temperature_quotas(alpha=0.7, total=100) composed with
    stratified_sample quota mode: the full multilingual mix pipeline —
    head languages flattened, low-resource upsampled relative to share,
    selection deterministic by the portable hash."""
    from .operators.curation import stratified_sample, temperature_quotas

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    quotas = temperature_quotas(d, ("lang",), total=100, alpha=0.7)
    return stratified_sample(d, ("lang",), quotas=quotas).select(
        "doc_id", "lang", F.col("sample_h").cast("long").alias("sample_h")
    )


TEMPERATURE_MIX_SQL = f"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(n) AS corpus_n FROM counts),
    weighted AS (
        SELECT lang, n, pow(n / corpus_n, 0.7) AS w FROM counts, tot
    ),
    ws AS (SELECT sum(w) AS w_sum FROM weighted),
    quotas AS (
        SELECT lang,
               least(n, CAST(floor(round(100 * w / w_sum, 6)) AS INT)) AS quota
        FROM weighted, ws
    ),
    h AS (
        SELECT doc_id, lang, {_curation_hash_sql()} AS sample_h FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, sample_h,
               row_number() OVER (PARTITION BY lang
                   ORDER BY sample_h ASC, doc_id ASC) AS rnk
        FROM h
    )
    SELECT r.doc_id, r.lang, CAST(r.sample_h AS BIGINT) AS sample_h
    FROM ranked r JOIN quotas q ON q.lang = r.lang
    WHERE r.rnk <= q.quota
"""


EXTRA_QUERIES["temperature_mix"] = (q_temperature_mix, TEMPERATURE_MIX_SQL)


# ---------------------------------------------------------------------------
# Benchmark decontamination + vocabulary heavy hitters (operators/textprep)
# ---------------------------------------------------------------------------


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination flags with every 50th document standing in as the
    held-out benchmark: those documents (and any training doc sharing an
    8-gram with them) must flag contaminated; the rest stay clean."""
    from .operators.textprep import decontaminate_flags

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 50 == 0).select("text")
    return decontaminate_flags(d, bench, n=8, min_shared=1)


DECONTAMINATE_SQL = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\r\n\x0b\f]+') AS toks
        FROM documents
    ),
    pg AS (
        SELECT doc_id, unnest(list_distinct(
                   list_transform(range(1, len(toks) - 8 + 2),
                                  i -> array_to_string(toks[i:i+7], ' ')))) AS gram
        FROM t
    ),
    bg AS (SELECT DISTINCT gram FROM pg WHERE doc_id % 50 = 0),
    counts AS (
        SELECT pg.doc_id, count(*) AS n
        FROM pg JOIN bg USING (gram) GROUP BY pg.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_contaminated_grams,
           coalesce(c.n, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN counts c USING (doc_id)
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 token frequencies (tf + df), rank totally ordered
    by (tf desc, token asc) — TakeOrdered plan, k rows to the driver."""
    from .operators.textprep import vocab_topk

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return vocab_topk(d, k=20)


VOCAB_TOPK_SQL = r"""
    WITH nonempty AS (
        SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
    ),
    ex AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+')) AS token
        FROM nonempty
    ),
    agg AS (
        SELECT token, CAST(count(*) AS BIGINT) AS tf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM ex GROUP BY token
    ),
    ranked AS (
        SELECT token, tf, df,
               row_number() OVER (ORDER BY tf DESC, token ASC) AS rank
        FROM agg
    )
    SELECT token, tf, df, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 20
"""


EXTRA_QUERIES["decontaminate"] = (q_decontaminate, DECONTAMINATE_SQL)
EXTRA_QUERIES["vocab_topk"] = (q_vocab_topk, VOCAB_TOPK_SQL)
