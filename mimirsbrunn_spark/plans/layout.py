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
