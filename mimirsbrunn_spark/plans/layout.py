"""Z-order spatial data layout: cluster-on-write + stats-pruned scans.

At 100 TB the dominant cost of a bbox- or cell-scoped query is how many
parquet files the scan opens. Writing rows range-clustered on a
space-filling-curve key gives every file a tight, near-disjoint
[min, max] key range, so a key-range predicate prunes most files from
footer stats alone — Spark's parquet reader skips whole row groups via
the pushed filter, and the same stats serve any other engine reading
the lake. This is the public OPTIMIZE-ZORDER pattern (Delta/Iceberg
docs, Geomesa Z2 index) expressed with stock Spark primitives: ONE
range shuffle (`repartitionByRange`) + `sortWithinPartitions` + write.
The key is `tiles.morton_key_col` — pure JVM, same (i, j) grid indices
as the quadtree cells, bit-interleaved so key-adjacent means
space-adjacent.

Reference relationship: mimirsbrunn's ES indices get spatial locality
from geohash-bucketed routing (config/elasticsearch/templates/
components/mimir-base.json geo fields); a parquet lake needs the
explicit curve key. Scans scoped by `tiles.morton_window` ranges replace
the ES geo_bounding_box prefilter (dsl.rs reverse/shape queries).
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tiles import with_morton_key


def write_spatially_clustered(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 12,
    n_files: int = 32,
    key_col: str | None = None,
) -> str:
    """Write ``df`` as parquet clustered on the Morton key of
    (``lon``, ``lat``) at ``res``; returns the key column name.

    ``repartitionByRange`` computes boundaries from a sample — one extra
    job over the input, then one shuffle; at 100 TB this is the write
    amplification you pay once so every later spatial scan prunes.
    ``key_col`` reuses an existing key column instead of recomputing.
    The key is built with the staged-projection form (`with_morton_key`)
    so the write stage stays inside whole-stage codegen.
    """
    key = key_col or f"z_{res}"
    d = df if key_col else with_morton_key(df, lon, lat, res, key=key)
    (
        d.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )
    return key


def zrange_scan(
    spark: SparkSession, path: str, lo: int, hi: int, key_col: str = "z_12"
) -> DataFrame:
    """Scan a clustered table for keys in [lo, hi] — the BETWEEN lands in
    the parquet scan's PushedFilters (asserted by tests), so non-matching
    files/row-groups are skipped from footer stats."""
    return spark.read.parquet(path).filter(F.col(key_col).between(int(lo), int(hi)))


def bbox_scan(
    spark: SparkSession,
    path: str,
    windows: list[tuple[int, int]],
    key_col: str = "z_12",
    refine: Column | None = None,
) -> DataFrame:
    """Scan by a union of Morton windows (a bbox decomposes into a few
    quad ranges — `tiles.morton_window` per covering quad) with an
    optional exact refine predicate on top; the window disjunction still
    pushes to the scan."""
    # no windows = nothing can match: emit an empty, schema-correct scan
    # instead of filter(None) (an all-rejected serving batch hits this)
    if not windows:
        return spark.read.parquet(path).filter(F.lit(False))
    cond = None
    for lo, hi in windows:
        c = F.col(key_col).between(int(lo), int(hi))
        cond = c if cond is None else cond | c
    out = spark.read.parquet(path).filter(cond)
    return out.filter(refine) if refine is not None else out


def file_key_ranges(path: str, key_col: str) -> list[tuple[str, int, int]]:
    """Per-file [min, max] of ``key_col`` straight from parquet footers
    (pyarrow) — the exact stats any engine's pruning consults."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[key_col]
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or st.min is None:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((f.name, min(mins), max(maxs)))
    return out


def pruned_file_fraction(path: str, lo: int, hi: int, key_col: str) -> float:
    """Fraction of files whose stats range misses [lo, hi] — i.e. the
    fraction a stats-pruning scan never opens."""
    ranges = file_key_ranges(path, key_col)
    if not ranges:
        return 0.0
    skipped = sum(1 for _, mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


def ranges_pruned_fraction(
    ranges: list[tuple[str, int, int]], windows: list[tuple[int, int]]
) -> float:
    """Pure intersection arithmetic over pre-read footer ranges — lets a
    serving loop read footers once and audit every batch for free."""
    if not ranges:
        return 0.0
    skipped = sum(
        1
        for _, mn, mx in ranges
        if all(mx < lo or mn > hi for lo, hi in windows)
    )
    return skipped / len(ranges)


def windows_pruned_fraction(
    path: str, windows: list[tuple[int, int]], key_col: str
) -> float:
    """Fraction of files pruned for a UNION of key windows (the
    `bbox_scan` shape) — a file survives if any window intersects its
    stats range."""
    return ranges_pruned_fraction(file_key_ranges(path, key_col), windows)


def _wrap_lon(lon: float) -> float:
    return ((lon + 180.0) % 360.0) - 180.0


def derive_query_windows(
    points: list[tuple[float, float]],
    radius_m: float,
    key_res: int = 12,
    prefix_bits: int = 6,
) -> list[tuple[int, int]]:
    """Merged Morton key windows covering the radius-padded disks of a
    (lon, lat) batch — the scan predicate `reverse_geocode_lake` feeds
    `bbox_scan`. Radius padding steps in quad-sized increments so any
    radius is covered, longitudes wrap at the antimeridian (matching the
    kNN's pmod ring wrap), and adjacent windows coalesce."""
    import math as _m

    from ..tiles import morton_window

    quad_w = 360.0 / (1 << prefix_bits)
    quad_h = 180.0 / (1 << prefix_bits)
    dlat = radius_m / 111_320.0

    def _steps(a: float, b: float, step: float):
        v = a
        while v < b:
            yield v
            v += step
        yield b

    wins: set[tuple[int, int]] = set()
    for lon, lat in points:
        # worst-case cos over the radius band (|lat|+dlat), so the lon
        # padding is conservative at any latitude in the disk
        coslat = max(_m.cos(_m.radians(min(abs(lat) + dlat, 89.9999))), 1e-9)
        # near the poles coslat -> 0 blows dlon into the millions of
        # degrees; past 180 deg the wrap already covers every lon quad,
        # so cap there (bounds the loop at ~2/quad_w iterations per row)
        dlon = min(radius_m / (111_320.0 * coslat), 180.0)
        for lo_ in _steps(lon - dlon, lon + dlon, quad_w):
            for la_ in _steps(lat - dlat, lat + dlat, quad_h):
                wins.add(
                    morton_window(
                        _wrap_lon(lo_),
                        min(max(la_, -90.0), 89.999999),
                        key_res,
                        prefix_bits,
                    )
                )
    merged: list[tuple[int, int]] = []
    for lo, hi in sorted(wins):
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(hi, merged[-1][1]))
        else:
            merged.append((lo, hi))
    return merged


def reverse_geocode_lake(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 1,
    radius_m: float = 1000.0,
    res: int = 7,
    key_col: str = "z_12",
    key_res: int | None = None,
    prefix_bits: int = 6,
    query_id: str = "query_id",
    target_id: str = "target_id",
    max_query_batch: int = 100_000,
    return_scan_info: bool = False,
) -> DataFrame | tuple[DataFrame, dict]:
    """Reverse geocode (operators/knn.reverse_geocode, reference
    /reverse api.rs:15) against a Z-clustered published address table,
    scanning ONLY the files whose Morton range intersects the query
    batch's radius-padded quads.

    At 100 TB the address table is the big side; a /reverse batch is
    small and spatially local, so the win is not touching the 99% of
    files outside the batch's neighborhoods. Window derivation is
    driver-side over the collected batch (bounded by ``max_query_batch``
    — a serving batch IS driver-small by contract; this operator refuses
    rather than silently collecting a corpus). Radius padding steps in
    quad-sized increments so any radius is covered, longitudes wrap at
    the antimeridian (matching the kNN's pmod ring wrap), and adjacent
    key windows are coalesced before they reach the scan predicate.
    """
    from ..operators.knn import reverse_geocode

    # the scan windows are derived in the key column's Morton space —
    # a res mismatch (e.g. a z_10 lake filtered with res-12 windows)
    # silently returns empty results, so key_res follows key_col's
    # write_spatially_clustered naming unless the caller overrides it
    if key_res is None:
        m = re.fullmatch(r"z_(\d+)", key_col)
        if not m:
            raise ValueError(
                f"cannot derive key_res from key_col {key_col!r} (expected "
                "the write_spatially_clustered 'z_<res>' convention); pass "
                "key_res explicitly"
            )
        key_res = int(m.group(1))

    # one bounded collect: limit(max+1) both detects oversize batches and
    # caps driver transfer even when the input is corpus-sized
    rows = (
        queries.select(F.col(query_id), "lon", "lat")
        .limit(max_query_batch + 1)
        .collect()
    )
    if len(rows) > max_query_batch:
        raise ValueError(
            f"query batch (>{max_query_batch}) exceeds max_query_batch "
            f"({max_query_batch}); reverse_geocode_lake derives scan windows "
            "driver-side — use reverse_geocode on a full scan for "
            "corpus-sized query sides"
        )
    # a single null/NaN/out-of-range coordinate must not kill the whole
    # batch with a driver TypeError inside window derivation — drop it
    # here (the streaming wrapper pre-filters with
    # coord_validity_condition; direct batch callers get the same guard)
    # and surface the count in the scan info
    import math as _m

    pts = [
        (r.lon, r.lat)
        for r in rows
        if r.lon is not None and r.lat is not None
        and _m.isfinite(r.lon) and _m.isfinite(r.lat)
        and -180.0 <= r.lon <= 180.0 and -90.0 <= r.lat <= 90.0
    ]
    merged = derive_query_windows(pts, radius_m, key_res, prefix_bits)
    targets = bbox_scan(spark, path, merged, key_col)
    out = reverse_geocode(
        queries, targets, k=k, radius_m=radius_m, res=res,
        query_id=query_id, target_id=target_id,
    )
    if return_scan_info:
        # windows + batch size from the one collect above, so callers
        # (jobs, streaming batch reports) never re-collect the queries
        return out, {
            "windows": merged,
            "n_queries": len(rows),
            "n_invalid_coords": len(rows) - len(pts),
        }
    return out
