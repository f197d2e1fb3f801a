"""Round-6 optimization instrumentation (guide §1): per-query sub-stage
isolation with the noop sink, so each change targets the operator that
actually burns the time. NOT the frozen driver bench — bench.py stays
untouched; numbers here are cited in OPTIMIZATION_r06.md.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]

Stages: q10parts q6parts q3parts q9parts q4parts (default: all).
Each stage prints one JSON line {"stage": ..., "timings": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, out: dict, name: str, fn, runs: int = 2):
    best = None
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"    {name}: {out[name]}", file=sys.stderr)


def q10parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.gate import QUERIES
    from mimirsbrunn_spark.operators.similarity import (
        _nearest_clusters,
        committed_codebook_path,
        semdedup,
    )

    out: dict = {}
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    near = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    aug = e.unionByName(near)
    cb = spark.read.parquet(str(committed_codebook_path(16, 3)))
    timed(spark, out, "aug_scan", lambda: noop(aug))
    timed(spark, out, "assign", lambda: noop(_nearest_clusters(aug, cb, 1, "vec_id", "embedding")))
    # pair volume: Σ|cluster|² (diagnostic count, one run)
    assigned = _nearest_clusters(aug, cb, 1, "vec_id", "embedding")
    sizes = assigned.groupBy("cluster").count().collect()
    out["n_vectors"] = sum(r["count"] for r in sizes)
    out["n_pairs_sigma_c2"] = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    out["max_cluster"] = max(r["count"] for r in sizes)
    timed(spark, out, "semdedup_full", lambda: noop(semdedup(aug, cb, eps=0.05)), runs=2)
    timed(spark, out, "q10_gate_count", lambda: QUERIES["semdedup_keep"][0](spark, sf_dir).count(), runs=1)
    return out


def q6parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.operators.dedup import (
        lsh_candidate_pairs,
        tokens_expr,
        with_minhash_signature,
    )

    out: dict = {}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = d.select((F.col("doc_id") * 2).alias("pid"), "text").unionByName(
        d.select(
            (F.col("doc_id") * 2 + 1).alias("pid"),
            F.expr("substring(text, 1, (length(text) * 4) div 5)").alias("text"),
        )
    )
    timed(spark, out, "scan", lambda: noop(aug))
    timed(
        spark, out, "tokenize",
        lambda: noop(aug.select("pid", F.expr(f"size({tokens_expr('text')})").alias("n"))),
    )
    filt = aug.select("pid", "text").filter(F.expr(f"size({tokens_expr('text')}) >= 3"))
    timed(spark, out, "signatures", lambda: noop(with_minhash_signature(filt, "text", 16)))
    timed(spark, out, "lsh_pairs_count", lambda: lsh_candidate_pairs(aug, id_col="pid").count())
    return out


def q3parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.gate import points_from_orders, rect_admins_df
    from mimirsbrunn_spark.operators.pip import attach_admins

    out: dict = {}
    pts = points_from_orders(spark, sf_dir)
    timed(spark, out, "points_scan", lambda: noop(pts))
    admins = rect_admins_df(spark)
    att = attach_admins(pts, admins, strategy="broadcast")
    timed(spark, out, "attach_noop", lambda: noop(att))
    timed(spark, out, "attach_explode_count", lambda: att.select(F.explode("admin_ids")).count())
    return out


def q9parts(spark, sf_dir):
    from pyspark.sql import functions as FF

    from mimirsbrunn_spark.functions.geocode import forward_geocode
    from mimirsbrunn_spark.gate_geocode import geocode_places_df

    out: dict = {}
    base = geocode_places_df(spark, sf_dir)
    places = base.crossJoin(spark.range(10).withColumnRenamed("id", "rep")).withColumn(
        "id", FF.col("id") * 10 + FF.col("rep")
    ).drop("rep")
    timed(spark, out, "places_scan", lambda: noop(places))
    timed(
        spark, out, "fuzzy_topk",
        lambda: forward_geocode(
            places, "St-Martin gare", k=50, query_type="fuzzy", coord=(2.35, 48.85)
        ).count(),
    )
    timed(
        spark, out, "prefix_topk",
        lambda: forward_geocode(
            places, "St-Martin gare", k=50, query_type="prefix", coord=(2.35, 48.85)
        ).count(),
    )
    return out


def q4parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.gate_points import points_from_nation, points_from_orders
    from mimirsbrunn_spark.operators.knn import reverse_geocode

    out: dict = {}
    targets = points_from_orders(spark, sf_dir).withColumnRenamed("point_id", "target_id")
    queries = points_from_nation(spark, sf_dir)
    full = reverse_geocode(queries, targets, k=3, radius_m=2_000_000.0, res=0)
    timed(spark, out, "knn_full_count", lambda: full.count())
    return out


def q7parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.tiles import with_grid_cells

    bench_sf = float(os.environ.get("SPARK_GRAFT_BENCH_SF", sf_dir.rstrip("/").rsplit("sf", 1)[-1]))
    docs_path, admins_path, _ = ensure_corpus(spark, bench_sf, REPO / ".bench_cache")
    docs = spark.read.parquet(docs_path)
    admins = spark.read.parquet(admins_path)
    out: dict = {}
    pts = with_grid_cells(extract_geo_points(docs), "lon", "lat").select(
        F.concat_ws("#", "doc_id", "span_offset").alias("point_uid"), "lon", "lat"
    )
    out["n_points"] = pts.count()
    timed(spark, out, "pts_noop", lambda: noop(pts))
    att = attach_admins(pts, admins, strategy="partitioned")
    timed(spark, out, "attach_full", lambda: att.select(F.size("admin_ids")).groupBy().sum().collect())
    return out


STAGES = {
    "q7parts": q7parts,
    "q10parts": q10parts,
    "q6parts": q6parts,
    "q3parts": q3parts,
    "q9parts": q9parts,
    "q4parts": q4parts,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(app_name="mimirsbrunn_bench_extra", cpus=cpus, shuffle_partitions=cpus)

    # warm python workers like bench.py
    def _warm(it):
        import numpy  # noqa: F401

        yield from it

    spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(_warm, "id long").count()

    names = sys.argv[1:] or list(STAGES)
    for name in names:
        print(f"== {name}", file=sys.stderr)
        t0 = time.perf_counter()
        res = STAGES[name](spark, sf_dir)
        res["_stage_wall"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"stage": name, "timings": res}))


if __name__ == "__main__":
    main()
