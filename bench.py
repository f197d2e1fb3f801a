"""Per-round benchmark: spatial-join + tile-assignment throughput.

Headline metric (BASELINE.json): docs/sec through the full pipeline —
interleaved docs → geo-span extraction → H3 res-7..12 tile encoding →
broadcast PIP admin attachment → rollup. Reference single-node baseline:
≈20-25k docs/s (BANO IDF ingest incl. ES bulk, BASELINE.md).

Runs on local[$SPARK_GRAFT_CPUS] (default 32) over a deterministic
synthetic interleaved corpus sized from the sf of $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), cached under .bench_cache/. Prints ONE
JSON line: {"metric", "value" (total wall sec), "unit": "sec",
"queries": {...per-stage sec...}, "sf", plus docs_per_sec context}.

Scaling-efficiency evidence (N vs 4N cores) lives in bench_scaling.py →
BENCH/BASELINE.md, not here (this script must stay single-session).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# --- self-diagnosing noise capture (VERDICT r04 #2) -------------------------
# BENCH_r04.json recorded a co-tenant-noise window as an apparent 31%
# regression and nothing in the artifact let a reader adjudicate it. Every
# rep now carries (a) /proc/loadavg stamps and (b) EXTERNAL cpu-seconds:
# host CPU delta (/proc/stat) minus this bench's own process tree
# (python + the live Spark JVM — RUSAGE_CHILDREN misses running children,
# so the tree is summed from /proc/*/stat). loadavg alone cannot
# adjudicate: the bench's own 32-thread bursts push it over any
# threshold; external cores measured DURING the rep can.


def _loadavg() -> list[float]:
    try:
        return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]
    except (OSError, ValueError):
        return []


def _host_cpu_sec() -> float:
    """Total busy cpu-seconds across the host (user+nice+sys+irq+steal)."""
    try:
        f = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
        busy = [0, 1, 2, 5, 6, 7]  # skip idle(3)/iowait(4)
        return sum(float(f[i]) for i in busy) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return 0.0


def _tree_cpu_sec() -> float:
    """cpu-seconds of this process + all live descendants (the Spark JVM
    and its python workers) from /proc/*/stat. Each process contributes
    utime+stime PLUS cutime+cstime: a worker that exits mid-rep vanishes
    from the live tree, but its time moves into its reaped parent's
    cutime/cstime, so the tree sum stays monotone and the rep delta never
    misattributes our own dead-child CPU to an external co-tenant."""
    tck = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for p in Path("/proc").iterdir():
        if not p.name.isdigit():
            continue
        try:
            st = (p / "stat").read_text()
        except OSError:
            continue
        # comm can contain spaces/parens: split after the LAST ')'
        rest = st.rsplit(")", 1)[-1].split()
        try:
            ppid = int(rest[1])
            cpu = sum(float(rest[i]) for i in (11, 12, 13, 14)) / tck
        except (ValueError, IndexError):
            continue
        procs[int(p.name)] = (ppid, cpu)
    mine = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _) in procs.items():
            if ppid in mine and pid not in mine:
                mine.add(pid)
                grew = True
    return sum(procs[pid][1] for pid in mine if pid in procs)


# external cores averaged over a rep above this ⇒ the rep is annotated
# noisy (a co-tenant was actively competing for the CPU during it)
# Calibrated against captured rep logs: truly quiet windows measure
# external_cpu_cores 0.0-0.1 (the tree subtraction excludes this bench's
# own 32-thread bursts — clean runs show 0.0 even at loadavg 8), while a
# drain window that inflated q9 by 3-10x measured 1.6-1.8 and slipped
# under the original 2.0 threshold. 1.0 separates the two regimes with
# an order of magnitude to spare on the quiet side.
NOISY_EXTERNAL_CORES = 1.0


def ensure_corpus(spark, sf: float, cache_root: Path) -> tuple[str, str, int]:
    """Deterministic interleaved corpus + octagon admins, cached parquet.

    The corpus itself is generated *distributed* (gen_docs_spark, pure JVM
    expressions) — the same way a 10^12-doc bench corpus would be
    synthesized on a real cluster."""
    from mimirsbrunn_spark import schemas
    from mimirsbrunn_spark.datagen import gen_admins, gen_docs_spark

    n_docs = max(int(1_500_000 * sf), 2000)
    out = cache_root / f"sf{sf}"
    docs_path, admins_path = out / "docs.parquet", out / "admins.parquet"
    marker = out / "_DONE"
    if not marker.exists():
        out.mkdir(parents=True, exist_ok=True)
        admins = gen_admins()
        sdf_a = spark.createDataFrame(
            [tuple(r) for r in admins.itertuples(index=False, name=None)], schema=schemas.ADMINS
        )
        sdf_a.coalesce(1).write.mode("overwrite").parquet(str(admins_path))
        n_files = max(8, min(64, n_docs // 40_000))
        gen_docs_spark(spark, n_docs, admins=admins).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(str(docs_path))
        marker.touch()
    return str(docs_path), str(admins_path), n_docs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # the synthetic flagship corpus (q1/q2/q7) can scale independently of
    # the sf_dir tables: SPARK_GRAFT_BENCH_SF=1 runs the 1.5M-doc corpus
    # (VERDICT r03 #6 evidence) while q3-q6/q8 stay on sf_dir
    bench_sf = float(os.environ.get("SPARK_GRAFT_BENCH_SF", sf))

    from pyspark.sql import functions as F

    from mimirsbrunn_spark.gate import (
        points_from_nation,
        points_from_orders,
        rect_admins_df,
    )
    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.tiles import with_grid_cells

    spark = get_spark(app_name="mimirsbrunn_bench", cpus=cpus, shuffle_partitions=cpus)
    docs_path, admins_path, n_docs = ensure_corpus(spark, bench_sf, REPO / ".bench_cache")

    docs = spark.read.parquet(docs_path)
    admins = spark.read.parquet(admins_path)
    docs.count()  # warm file listing / JVM

    # Spawn + warm all Python workers (numpy/pandas import, py-files unzip)
    # so per-query numbers reflect steady-state throughput, not interpreter
    # startup — the regime that matters at cluster scale.
    def _warm(it):
        import numpy  # noqa: F401

        yield from it

    spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(_warm, "id long").count()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    rep_log: dict[str, list[dict]] = {}

    def timed(name: str, fn, runs: int = 3):
        # best = the engine's capability on this shared host; median = the
        # robust cross-round comparator (co-tenant noise is bursty and can
        # double a single rep — see BENCH/BASELINE.md). Every rep is
        # stamped with loadavg + external-cpu so a noisy capture is
        # identifiable from the artifact alone (VERDICT r04 #2).
        obs = []
        reps = []
        for _ in range(runs):
            la0, host0, tree0 = _loadavg(), _host_cpu_sec(), _tree_cpu_sec()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            ext = max((_host_cpu_sec() - host0) - (_tree_cpu_sec() - tree0), 0.0)
            ext_cores = ext / dt if dt > 0 else 0.0
            obs.append(dt)
            reps.append({
                "sec": round(dt, 3),
                "loadavg_before": la0,
                "loadavg_after": _loadavg(),
                "external_cpu_cores": round(ext_cores, 2),
                "noisy": ext_cores > NOISY_EXTERNAL_CORES,
            })
        rep_log[name] = reps
        obs.sort()
        timings[name] = round(obs[0], 3)
        medians[name] = round(obs[len(obs) // 2] if runs % 2 else
                              (obs[runs // 2 - 1] + obs[runs // 2]) / 2, 3)

    # q1 — flagship: extract → tiles(7..12) → broadcast PIP → rollup.
    # Columns are projected down to what the join needs *before* the UDF
    # boundary (Catalyst cannot prune through mapInPandas).
    def q1():
        pts = with_grid_cells(extract_geo_points(docs), "lon", "lat")
        att = attach_admins(pts.select("h3_7", "lon", "lat"), admins, strategy="broadcast")
        return (
            att.select("h3_7", F.try_element_at("admin_ids", F.lit(1)).alias("admin_id"))
            .groupBy("admin_id")
            .agg(F.count("*").alias("n"), F.countDistinct("h3_7").alias("n_cells"))
            .count()
        )

    timed("q1_pipeline_full", q1, runs=5)

    # q2 — extraction + tile encoding only (JVM path ceiling)
    timed(
        "q2_extract_tiles",
        lambda: with_grid_cells(extract_geo_points(docs), "lon", "lat")
        .agg(F.sum(F.col("h3_12") % 1000000007), F.max("h3_7")).collect(),
    )

    # q3 — PIP against the gate rectangle hierarchy on derived points
    def q3():
        pts = points_from_orders(spark, sf_dir)
        att = attach_admins(pts, rect_admins_df(spark), strategy="broadcast")
        return att.select(F.explode("admin_ids")).count()

    timed("q3_pip_rect", q3)

    # q4 — reverse geocode kNN
    def q4():
        targets = points_from_orders(spark, sf_dir).withColumnRenamed("point_id", "target_id")
        return reverse_geocode(
            points_from_nation(spark, sf_dir), targets,
            k=3, radius_m=2_000_000.0, res=0,
        ).count()

    timed("q4_reverse_knn", q4)

    # q5 — exact dedup over the driver documents table
    def q5():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return d.groupBy(F.sha2("text", 256)).count().count()

    timed("q5_dedup_exact", q5)

    # q6 — MinHash+LSH near-dup candidate generation (shingle→minhash→
    # band→bucket-join) over the documents table + truncated mutants
    def q6():
        from mimirsbrunn_spark.operators.dedup import lsh_candidate_pairs

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        aug = d.select((F.col("doc_id") * 2).alias("pid"), "text").unionByName(
            d.select(
                (F.col("doc_id") * 2 + 1).alias("pid"),
                F.expr("substring(text, 1, (length(text) * 4) div 5)").alias("text"),
            )
        )
        return lsh_candidate_pairs(aug, id_col="pid").count()

    timed("q6_minhash_lsh", q6, runs=5)

    # q7 — the partitioned (beyond-broadcast-budget) PIP strategy on the
    # same flagship points: tracks the shuffle path's gap to q1 per round
    def q7():
        pts = with_grid_cells(extract_geo_points(docs), "lon", "lat").select(
            F.concat_ws("#", "doc_id", "span_offset").alias("point_uid"), "lon", "lat"
        )
        att = attach_admins(pts, admins, strategy="partitioned")
        return att.select(F.size("admin_ids")).groupBy().sum().collect()

    timed("q7_pip_partitioned", q7)

    # q8 — skew-safe as-of join with one key holding ~90% of events
    # (VERDICT r02 #5): clicks matched to the latest view per user through
    # the time-bucketed plan; user ids are collapsed so ~90% share key 0
    def q8():
        from mimirsbrunn_spark.operators.temporal import asof_join

        e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            F.when(F.pmod("user_id", F.lit(10)) < 9, F.lit(0))
            .otherwise(F.col("user_id")).alias("user_id"),
            "event_id", "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "us")
        views = e.filter(F.col("event_type") == "view").select("user_id", "event_id", "us")
        return asof_join(
            clicks, views, key="user_id", time_col="us", right_id="event_id", n_buckets=32
        ).count()

    timed("q8_asof_skew", q8)

    # q9 — forward-geocode scoring throughput (the ES-query replacement
    # path): full T1-T9 score expression + distributed top-k over a
    # 10x-replicated vocab places table (~150k places at sf0.1)
    def q9():
        from pyspark.sql import functions as FF

        from mimirsbrunn_spark.functions.geocode import forward_geocode
        from mimirsbrunn_spark.gate_geocode import geocode_places_df

        base = geocode_places_df(spark, sf_dir)
        places = base.crossJoin(spark.range(10).withColumnRenamed("id", "rep")).withColumn(
            "id", FF.col("id") * 10 + FF.col("rep")
        ).drop("rep")
        return forward_geocode(places, "St-Martin gare", k=50, query_type="fuzzy",
                               coord=(2.35, 48.85)).count()

    timed("q9_geocode_topk", q9)

    # q10 — SemDeDup decision throughput: committed-codebook cluster
    # assignment + within-cluster eps-ball pairs + components + keep
    # rule over the corpus ∪ perturbed copies (~10k vectors at sf0.1)
    def q10():
        from mimirsbrunn_spark.gate import QUERIES

        return QUERIES["semdedup_keep"][0](spark, sf_dir).count()

    timed("q10_semdedup", q10)

    # q11 — cross-document line dedup with reassembly over a
    # 10x-replicated multi-line corpus (~50k docs / 150k lines at
    # sf0.1): the groupBy + anti-join + ordered-rebuild shuffle chain
    def q11():
        from pyspark.sql import functions as FF

        from mimirsbrunn_spark.operators.textprep import dedup_lines

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs = (
            d.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
            .select(
                (FF.col("doc_id") * 10 + FF.col("rep")).alias("doc_id"),
                FF.concat_ws(
                    "\n",
                    FF.col("text"),
                    FF.concat(FF.lit("boilerplate footer block "), (FF.col("doc_id") % 7).cast("string")),
                    FF.concat(FF.lit("unique line "), (FF.col("doc_id") * 10 + FF.col("rep")).cast("string")),
                ).alias("text"),
            )
        )
        return dedup_lines(docs).count()

    timed("q11_line_dedup", q11)

    # headline value stays the q1-q6 suite (comparable across rounds);
    # q7 (new in r2) / q8 (new in r3) / q9 (new in r4) / q10+q11 (new
    # in r5) are reported alongside, not folded into the total
    extra = ("q7_pip_partitioned", "q8_asof_skew", "q9_geocode_topk",
             "q10_semdedup", "q11_line_dedup")
    total = round(sum(v for k, v in timings.items() if k not in extra), 3)
    docs_per_sec = round(n_docs / timings["q1_pipeline_full"], 1)
    n_noisy = sum(1 for reps in rep_log.values() for r in reps if r["noisy"])
    print(
        json.dumps(
            {
                "metric": "spatial-join+tile-assignment suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "sf": sf,
                "bench_sf": bench_sf,
                "n_docs": n_docs,
                "docs_per_sec_q1": docs_per_sec,
                "cpus": cpus,
                "reps": rep_log,
                "noisy_reps": n_noisy,
                "noise_note": (
                    "reps with external_cpu_cores > "
                    f"{NOISY_EXTERNAL_CORES} had a co-tenant competing for "
                    "CPU; best-of-reps from clean reps is the comparable "
                    "number (measurement protocol, BENCH/BASELINE.md)"
                ) if n_noisy else "",
            }
        )
    )


if __name__ == "__main__":
    main()
