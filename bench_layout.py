"""Z-order layout A/B at bench scale: does cluster-on-write actually
cut spatially-scoped scan cost, and by how much?

Two copies of the SAME extracted point cloud (~10M points from the 20M-doc
interleaved corpus, same `ensure_corpus` as bench_scaling/bench_simplify):

  flat      = repartition(N) write — every file spans ~the whole keyspace
  clustered = write_spatially_clustered — one repartitionByRange shuffle
              on the Morton key, sortWithinPartitions, write

then the same quad-window count (`tiles.morton_window`, prefix 4 → 1/256
of the keyspace around a dense-city point) is timed on both, interleaved
so co-tenant noise hits both layouts alike. Footer-stats pruning
fractions (`plans/layout.pruned_file_fraction`) are recorded alongside —
that fraction, not the local[32] wall clock, is what transfers to a
100-TB lake where unopened files are unread bytes.

Usage: python bench_layout.py [n_docs] [reps] [n_files]
Appends/replaces a LAYOUT-TABLE section in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.plans.layout import (
        pruned_file_fraction,
        write_spatially_clustered,
        zrange_scan,
    )
    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.tiles import morton_window, with_grid_cells

    spark = get_spark(app_name="bench_layout", cpus=32, shuffle_partitions=64)
    docs_path, _admins_path, n_docs = ensure_corpus(
        spark, n_docs / 1_500_000, REPO / ".bench_cache" / "scaling"
    )

    pts_path = REPO / ".bench_cache" / f"layout_pts_{n_docs}.parquet"
    if not (pts_path / "_SUCCESS").exists():
        docs = spark.read.parquet(docs_path)
        (
            with_grid_cells(extract_geo_points(docs), "lon", "lat")
            .select(
                F.concat_ws("#", "doc_id", "span_offset").alias("point_uid"),
                "lon", "lat",
            )
            .write.mode("overwrite").parquet(str(pts_path))
        )
    pts = spark.read.parquet(str(pts_path)).select("point_uid", "lon", "lat")
    n_points = pts.count()

    res = 12
    flat_path = str(REPO / ".bench_cache" / "layout_flat.parquet")
    clus_path = str(REPO / ".bench_cache" / "layout_zorder.parquet")

    t0 = time.perf_counter()
    key = write_spatially_clustered(pts, clus_path, res=res, n_files=n_files)
    t_clustered_write = round(time.perf_counter() - t0, 2)

    from mimirsbrunn_spark.tiles import with_morton_key

    t0 = time.perf_counter()
    (
        with_morton_key(pts, res=res)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(flat_path)
    )
    t_flat_write = round(time.perf_counter() - t0, 2)

    # window: the prefix-4 quad around a dense-city anchor (the corpus
    # clusters points near gen_admins city centers; 2.35/48.85 is one)
    lo, hi = morton_window(2.35, 48.85, res=res, prefix_bits=4)
    n_in_window = zrange_scan(spark, clus_path, lo, hi, key).count()
    n_in_flat = zrange_scan(spark, flat_path, lo, hi, key).count()
    assert n_in_window == n_in_flat, (n_in_window, n_in_flat)

    frac_clustered = round(pruned_file_fraction(clus_path, lo, hi, key), 4)
    frac_flat = round(pruned_file_fraction(flat_path, lo, hi, key), 4)

    def scan(path: str) -> float:
        t0 = time.perf_counter()
        zrange_scan(spark, path, lo, hi, key).count()
        return round(time.perf_counter() - t0, 3)

    def scan_payload(path: str) -> float:
        # decode the full row payload inside the window (what a serving
        # read actually does), not just the key column
        t0 = time.perf_counter()
        (
            zrange_scan(spark, path, lo, hi, key)
            .agg(
                F.sum(F.length("point_uid")),
                F.avg("lon"),
                F.avg("lat"),
            )
            .collect()
        )
        return round(time.perf_counter() - t0, 3)

    times = {"flat": [], "clustered": [], "flat_payload": [], "clustered_payload": []}
    for _ in range(reps):
        times["flat"].append(scan(flat_path))
        times["clustered"].append(scan(clus_path))
        times["flat_payload"].append(scan_payload(flat_path))
        times["clustered_payload"].append(scan_payload(clus_path))
    best = {k: min(v) for k, v in times.items()}

    # serving A/B: reverse geocode an 8-query batch against the lake —
    # full scan vs morton-window-pruned scan (same result, fewer files)
    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.plans.layout import reverse_geocode_lake

    anchors = [
        (0, 2.35, 48.85), (1, 2.36, 48.86), (2, -0.57, 44.84), (3, 5.37, 43.30),
        (4, 4.85, 45.75), (5, -1.55, 47.22), (6, 3.88, 43.61), (7, 7.27, 43.70),
    ]
    queries = spark.createDataFrame(anchors, "query_id long, lon double, lat double")

    def _lake():
        t0 = time.perf_counter()
        df = reverse_geocode_lake(
            spark, clus_path, queries, k=5, radius_m=5000.0, res=9,
            key_col=key, prefix_bits=6, target_id="point_uid",
        )
        n = df.count()
        return round(time.perf_counter() - t0, 3), n

    def _full():
        t0 = time.perf_counter()
        df = reverse_geocode(
            queries, spark.read.parquet(clus_path),
            k=5, radius_m=5000.0, res=9, target_id="point_uid",
        )
        n = df.count()
        return round(time.perf_counter() - t0, 3), n

    serve = {"full": [], "lake": []}
    serve_rows = set()
    for _ in range(reps):
        tf, nf = _full()
        tl, nl = _lake()
        serve_rows.add((nf, nl))
        serve["full"].append(tf)
        serve["lake"].append(tl)
    assert all(a == b for a, b in serve_rows), serve_rows
    serve_best = {kk: min(v) for kk, v in serve.items()}

    from mimirsbrunn_spark.plans.layout import (
        derive_query_windows,
        windows_pruned_fraction,
    )

    serve_windows = derive_query_windows(
        [(lo_, la_) for _, lo_, la_ in anchors], 5000.0, key_res=res, prefix_bits=6
    )
    serve_pruned = round(windows_pruned_fraction(clus_path, serve_windows, key), 4)

    report = {
        "n_points": n_points,
        "n_files": n_files,
        "res": res,
        "window_rows": n_in_window,
        "write_s": {"flat": t_flat_write, "clustered": t_clustered_write},
        "pruned_file_fraction": {"flat": frac_flat, "clustered": frac_clustered},
        "scan_times_s": times,
        "scan_best_s": best,
        "scan_speedup": round(best["flat"] / best["clustered"], 2),
        "payload_scan_speedup": round(
            best["flat_payload"] / best["clustered_payload"], 2
        ),
        "serve_times_s": serve,
        "serve_best_s": serve_best,
        "serve_speedup": round(serve_best["full"] / serve_best["lake"], 2),
        "serve_windows": len(serve_windows),
        "serve_pruned_file_fraction": serve_pruned,
    }
    print(json.dumps(report))

    md = REPO / "BENCH" / "BASELINE.md"
    text = md.read_text()
    block = (
        "<!-- LAYOUT-TABLE -->\n"
        "## Z-order layout A/B (cluster-on-write vs flat)\n\n"
        f"{n_points:,} points, {n_files} files each, Morton res {res}; window = "
        f"prefix-4 quad (1/256 keyspace) holding {n_in_window:,} rows; counts "
        "verified identical across layouts before timing.\n\n"
        "| layout | write (s) | files pruned by footer stats | key-count scan (s) | payload scan (s) |\n"
        "|---|---|---|---|---|\n"
        f"| flat repartition({n_files}) | {t_flat_write} | {frac_flat:.0%} | {times['flat']} best {best['flat']} | {times['flat_payload']} best {best['flat_payload']} |\n"
        f"| z-order clustered | {t_clustered_write} | {frac_clustered:.0%} | {times['clustered']} best {best['clustered']} | {times['clustered_payload']} best {best['clustered_payload']} |\n\n"
        f"Key-count speedup {report['scan_speedup']}x, **full-payload scan "
        f"speedup {report['payload_scan_speedup']}x** at local[32] where "
        "every file is page-cached; on a 100-TB lake the pruned fraction IS "
        "the unread-bytes fraction, so the transferable number is the stats "
        f"column ({frac_clustered:.0%} of files never opened vs "
        f"{frac_flat:.0%}). Write cost: the range shuffle added "
        f"{t_clustered_write - t_flat_write:+.2f}s over the flat write at "
        "this scale, paid once per table write.\n\n"
        "Serving A/B — `reverse_geocode` (G7) of an 8-query batch, k=5, "
        "5 km radius, against the same clustered lake: full-scan "
        f"{serve['full']} best {serve_best['full']}s vs Morton-window-pruned "
        f"(`reverse_geocode_lake`) {serve['lake']} best {serve_best['lake']}s "
        f"({report['serve_speedup']}x), identical result rows asserted every "
        f"rep. The pruned path's {len(serve_windows)} coalesced key windows "
        f"touch only **{1 - serve_pruned:.0%} of the lake's files** "
        f"(footer-stats check; {serve_pruned:.1%} pruned). At local[32] with "
        "the whole 1 GB lake page-cached, wall clock is a wash — the "
        "transferable number is the files-opened fraction: at 100 TB the "
        "full-scan variant reads the entire address table per serving batch, "
        "the pruned one reads the batch's neighborhoods.\n"
        "<!-- /LAYOUT-TABLE -->\n"
    )
    if "<!-- LAYOUT-TABLE -->" in text:
        text = re.sub(
            r"<!-- LAYOUT-TABLE -->.*?<!-- /LAYOUT-TABLE -->\n", block, text, flags=re.S
        )
    else:
        text += "\n" + block
    md.write_text(text)


if __name__ == "__main__":
    main()


