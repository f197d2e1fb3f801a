"""Reverse geocoding as cell-ring-pruned kNN.

Re-expresses the reference's ``/reverse`` query — an Elasticsearch
``geo_distance`` filter (default radius 1000 m) sorted by arc distance
ascending with ``size=k`` (/root/reference/libs/mimir/src/adapters/
primary/common/dsl.rs:391-423, handlers.rs:344-384, api.rs:15-24) — as a
pure-Catalyst plan:

1. each query point explodes into the grid-cell disk covering its radius
   (the BKD-tree pre-filter role);
2. equi-join against targets keyed by the same-resolution cell —
   broadcastable when the query side is small (the common reverse-geocode
   shape: few queries × huge indexed point set), else a shuffled hash
   join co-partitioned on cell;
3. exact haversine refine + radius filter (JVM math, codegen);
4. top-k per query via row_number over (rounded distance, target id) —
   rounding pins cross-engine float determinism, the id breaks ties.

No Python UDF anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geometry import EARTH_RADIUS_M
from ..tiles import _RES_SHIFT, _I_SHIFT, _grid_n, M_PER_DEG, grid_cell_col


def haversine_col(lon1, lat1, lon2, lat2):
    """Haversine meters as a Column expression (same formula as
    geometry.haversine_sql, so oracles can reproduce it exactly)."""
    lon1, lat1, lon2, lat2 = (F.col(c) if isinstance(c, str) else c for c in (lon1, lat1, lon2, lat2))
    h = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    # clip like haversine_np/haversine_sql: near-antipodal rounding can
    # push h a few ulps above 1 and asin(sqrt(h)) would return NaN
    h = F.least(F.lit(1.0), F.greatest(F.lit(0.0), h))
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def reverse_geocode(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 1,
    radius_m: float = 1000.0,
    res: int = 7,
    query_id: str = "query_id",
    target_id: str = "target_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, lon, lat) × (target_id, lon, lat) → top-k neighbors.

    Returns (query_id, target_id, distance_m, rank), rank 1..k, only
    targets within radius_m (reference default 1000 m,
    config/query/default.toml:65-66; k default 1, api.rs:15).

    ``res`` must be coarse enough that one disk stays small; the ring
    count is derived per query row from its latitude.
    """
    # Disk enumeration in pure Catalyst — integer cell math + one
    # explode over a per-row cell array built with JVM higher-order
    # functions. No Python anywhere in the plan, so the same operator is
    # safe with millions of query rows (the G8 POI→address join runs it
    # with broadcast_queries=False).
    #
    # Ring counts are DECOUPLED per axis (mirrors
    # tiles._radius_ring_counts — same rule): __ki column rings from the
    # lon cell width at the query latitude, __kj row rings from the
    # fixed meridional height. A polar 1 km query then widens only the
    # lon direction (full wrap: ~size cells x a few rows) instead of
    # squaring a huge k into millions of cells. floor(delta/width)+1
    # rings cover the radius from any in-cell offset (+1 safety); the
    # width uses cos at the disk's WORST latitude so the spherical cap's
    # full lon extent is covered. __ki clamps at size//2 (full lon
    # wrap); __kj clamps at size (one over-pole reflection each way).
    # Rows past a pole REFLECT (jj mirrored, columns shifted half the
    # circle) — the over-the-pole neighbors the old row-clamp silently
    # dropped — and array_distinct removes the antipodal-column alias a
    # full wrap produces, so each (query, cell) pair is emitted once.
    n = _grid_n(res)
    size = 1 << n
    cell_h_m = 180.0 / size * M_PER_DEG
    # cos at the disk's WORST latitude (|lat| + radius in degrees), the
    # same rule as tiles._radius_ring_counts — cos at the query latitude
    # under-covers the spherical cap's lon extent for large radii and
    # silently drops in-radius neighbors (see the tiles.py comment)
    dlat_deg = radius_m / M_PER_DEG
    lat_far = F.least(F.abs(F.col("lat")) + F.lit(dlat_deg), F.lit(90.0))
    coslat = F.greatest(F.cos(F.radians(lat_far)), F.lit(1e-9))
    cell_w_m = F.lit(360.0 / size * M_PER_DEG) * coslat
    # clamp BEFORE narrowing to int: a planet-scale radius makes the
    # floor() a large BIGINT and ANSI mode would overflow the cast
    ki = F.least(
        F.floor(F.lit(radius_m) / cell_w_m) + F.lit(2), F.lit(size // 2)
    ).cast("int")
    kj = F.least(
        F.floor(F.lit(radius_m) / F.lit(cell_h_m)) + F.lit(2), F.lit(size)
    ).cast("int")
    i0 = F.least(
        F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * size), F.lit(0)),
        F.lit(size - 1),
    )
    j0 = F.least(
        F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * size), F.lit(0)),
        F.lit(size - 1),
    )

    # Output rows are exactly the pole-clipped direct range — a reflected
    # row jj' = 2*size-1-jr (north) or -1-jr (south) always lands back
    # inside [max(j0-kj,0), min(j0+kj,size-1)], so enumerating jj from
    # that interval (one exploded row per DISTINCT jj) cannot duplicate a
    # row. Reflection therefore only contributes COLUMNS: a row whose
    # reflected preimage is within the dj budget also gets the
    # half-circle-shifted column set. The per-row array is bounded by
    # 2*(2*ki+1) <= 2*size+2 elements (never the (2ki+1)(2kj+1) product),
    # so even a planet-radius polar query streams instead of
    # materializing one giant array.
    jlo = F.greatest(F.col("__j0") - F.col("__kj").cast("long"), F.lit(0))
    jhi = F.least(F.col("__j0") + F.col("__kj").cast("long"), F.lit(size - 1))
    di_arr = F.sequence(-F.col("__ki"), F.col("__ki"))
    direct_cols = F.transform(
        di_arr, lambda di: F.pmod(F.col("__i0") + di.cast("long"), F.lit(size))
    )
    refl_cols = F.transform(
        di_arr,
        lambda di: F.pmod(
            F.col("__i0") + di.cast("long") + F.lit(size // 2), F.lit(size)
        ),
    )
    # north preimage jr = 2*size-1-jj needs jr <= j0+kj; south preimage
    # jr = -1-jj needs jr >= j0-kj
    has_refl = (
        F.col("__jj") >= F.lit(2 * size - 1) - F.col("__j0") - F.col("__kj")
    ) | (F.col("__jj") <= F.col("__kj") - F.col("__j0") - F.lit(1))
    q = (
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col("lon").alias("__qlon"),
            F.col("lat").alias("__qlat"),
            ki.alias("__ki"),
            kj.alias("__kj"),
            i0.cast("long").alias("__i0"),
            j0.cast("long").alias("__j0"),
        )
        .withColumn("__jj", F.explode(F.sequence(jlo, jhi)))
        .withColumn(
            "__ii",
            F.explode(
                F.array_distinct(
                    F.when(has_refl, F.concat(direct_cols, refl_cols)).otherwise(
                        direct_cols
                    )
                )
            ),
        )
        .select(
            "__qid", "__qlon", "__qlat",
            (
                F.lit(res).cast("long") * F.lit(_RES_SHIFT)
                + F.col("__ii") * F.lit(_I_SHIFT)
                + F.col("__jj")
            ).alias("__cell"),  # antimeridian wrap via pmod above
        )
    )
    if broadcast_queries:
        q = F.broadcast(q)
    from .skew import ensure_parallelism

    # the target side carries the haversine refine over every candidate
    # pair — an under-split single-file scan must not serialize it
    targets = ensure_parallelism(targets)
    t = targets.select(
        F.col(target_id).alias("__tid"),
        F.col("lon").alias("__tlon"),
        F.col("lat").alias("__tlat"),
        grid_cell_col("lon", "lat", res).alias("__cell"),
    )
    dist = haversine_col("__qlon", "__qlat", "__tlon", "__tlat")
    pairs = (
        t.join(q, "__cell")
        .withColumn("distance_m", dist)
        .filter(F.col("distance_m") <= radius_m)
        # a target can land in several disk cells of the same query only
        # if disks overlap after explode — they can't (distinct cells per
        # query), so no dedup needed.
    )
    w = Window.partitionBy("__qid").orderBy(F.round("distance_m", 3).asc(), F.col("__tid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__tid").alias(target_id),
            F.round("distance_m", 3).alias("distance_m"),
            "rank",
        )
    )
