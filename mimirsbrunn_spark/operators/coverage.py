"""Raster↔vector coverage joins on the H3 grid (G16, per north rule).

Media-bearing spans are opaque binary assets (media_ref) with no
intrinsic coordinates; per the interleaved-document model their location
is the geo span *nearest by offset* within the same document (the span
sequence is order-significant). Tiling those onto the grid gives a
raster layer; joining it against the vector layer (admin polygon cell
covers) on cell id is the raster↔vector coverage join — cell-granular by
construction, like any raster algebra.

Not present in the reference (mimirsbrunn has no raster concept); the
grid machinery reuses operators/pip.py's admin cell cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tiles import _I_SHIFT, _RES_SHIFT, grid_cell_col


def media_points(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, offset, lon, lat): each media span located at
    its nearest-by-offset geo span in the same doc (ties → earlier span).
    Docs with no geo span contribute nothing (un-locatable media)."""
    s = F.col("s")
    spans = docs.select("doc_id", F.explode("spans").alias("s"))
    geo = (
        spans.filter(s["kind"] == "geo")
        .select(
            "doc_id",
            s["offset"].alias("geo_offset"),
            # F.get, not getItem: ANSI getItem(1) throws on a 1-element
            # split (no-';' text) — see operators/spans.extract_geo_points
            F.get(F.split(s["text"], ";"), 0).try_cast("double").alias("lon"),
            F.get(F.split(s["text"], ";"), 1).try_cast("double").alias("lat"),
        )
        .filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    )
    media = spans.filter(s["kind"] == "media").select(
        "doc_id", s["media_ref"].alias("media_ref"), s["offset"].alias("offset")
    )
    paired = media.join(geo, "doc_id")
    # media_ref in the key: offsets are span-sequence positions, unique
    # per doc in the interleaved model — but a hostile input where two
    # DISTINCT media spans share an offset must not silently drop one
    w = Window.partitionBy("doc_id", "offset", "media_ref").orderBy(
        F.abs(F.col("offset") - F.col("geo_offset")).asc(), F.col("geo_offset").asc()
    )
    return (
        paired.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "media_ref", "offset", "lon", "lat")
    )


def media_grid(docs: DataFrame, res: int = 7) -> DataFrame:
    """Raster layer: media assets per grid cell."""
    return media_points(docs).select(
        "doc_id", "media_ref", grid_cell_col("lon", "lat", res).alias("cell")
    )


def _ancestor_at(cell_col: F.Column, parent_res: int, res: int) -> F.Column:
    """Grid-cell ancestor at a *coarser* resolution — pure integer math
    (same layout as tiles.grid_parent_np), usable inside a join key.

    ``parent_res`` must be <= ``res``: Spark's shiftright masks the shift
    count (Java ``>>`` semantics), so a negative shift silently produces
    garbage keys instead of failing."""
    shift = res - parent_res
    if shift < 0:
        raise ValueError(f"parent_res {parent_res} must be <= cell res {res}")
    i = ((cell_col % F.lit(_RES_SHIFT)) / F.lit(_I_SHIFT)).cast("long")
    j = (cell_col % F.lit(_I_SHIFT)).cast("long")
    return (
        F.lit(parent_res).cast("long") * F.lit(_RES_SHIFT)
        + F.shiftright(i, shift) * F.lit(_I_SHIFT)
        + F.shiftright(j, shift)
    )


def cell_coverage_join(raster: DataFrame, admins: DataFrame, res: int) -> DataFrame:
    """Raster(cell, …)×vector coverage: join any cell-keyed raster layer
    against the admins' multi-resolution cell covers.

    For each cover resolution present, the coarser side is reprojected to
    the finer side's resolution via integer ancestor math and equi-joined
    — a union of broadcast hash joins, no geometry evaluation. When the
    cover is *finer* than the raster (small admins covered at res 8 vs a
    res-7 raster), the cover cells are rolled up to the raster resolution
    instead — shifting the raster down would need a negative shiftright,
    which Java bit-masks into garbage keys. Output: raster columns +
    admin_id, deduplicated per (admin, raster row)."""
    from .pip import admin_cell_cover

    cover = admin_cell_cover(admins).select(
        F.col("cell").alias("cov_cell"), F.col("id").alias("admin_id")
    )
    # the cover lineage is a per-admin WKB parse + Python cell
    # enumeration — without a persist it recomputes once for the
    # distinct-res collect plus once per resolution branch below (the
    # same reason attach_admins_partitioned persists its cover)
    cover = cover.persist()
    cov_res_levels = [
        int(r["cres"])
        for r in cover.select(
            (F.col("cov_cell") / _RES_SHIFT).cast("long").alias("cres")
        ).distinct().collect()
    ]
    raster_cols = raster.columns
    parts = []
    for cres in cov_res_levels:
        sub_cover = cover.filter((F.col("cov_cell") / _RES_SHIFT).cast("long") == cres)
        if cres <= res:
            sub = raster.withColumn(
                "cov_cell", _ancestor_at(F.col("cell"), cres, res)
            ).join(F.broadcast(sub_cover), "cov_cell")
        else:
            # cover finer than raster: roll the cover up to the raster res
            # (a raster cell intersects the admin iff it is the ancestor of
            # at least one cover cell); distinct to bound the join fan-out.
            rolled = sub_cover.select(
                _ancestor_at(F.col("cov_cell"), res, cres).alias("cell"), "admin_id"
            ).distinct()
            sub = raster.join(F.broadcast(rolled), "cell")
        parts.append(sub.select("admin_id", *raster_cols))
    if not parts:
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField("admin_id", T.StringType(), True)] + list(raster.schema.fields)
        )
        return raster.sparkSession.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # multi-res covers can produce the same (admin, row) pair twice
    return out.dropDuplicates(["admin_id", *raster_cols])


def coverage_join(docs: DataFrame, admins: DataFrame, res: int = 7) -> DataFrame:
    """Vector×raster coverage detail: (admin_id, cell, doc_id, media_ref)."""
    raster = media_grid(docs, res)
    return cell_coverage_join(raster, admins, res).select(
        "admin_id", "cell", "doc_id", "media_ref"
    )


def coverage_stats(docs: DataFrame, admins: DataFrame, res: int = 7) -> DataFrame:
    """Per-admin media coverage rollup: n_media, n_cells."""
    return coverage_join(docs, admins, res).groupBy("admin_id").agg(
        F.count("*").alias("n_media"), F.countDistinct("cell").alias("n_cells")
    )
