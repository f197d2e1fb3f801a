"""Dump .explain('formatted') for every bench query (round-6 evidence).

Usage: python plans/r06/dump_plans.py <suffix>   # suffix: before | after
Writes plans/r06/<query>_<suffix>.txt. Mirrors bench.py's query
definitions exactly (same inputs at $SPARK_GRAFT_SF_DIR, same corpus
cache) without timing anything.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

OUT = Path(__file__).resolve().parent


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    bench_sf = float(os.environ.get("SPARK_GRAFT_BENCH_SF", sf))

    from pyspark.sql import functions as F

    from bench import ensure_corpus
    from mimirsbrunn_spark.gate import QUERIES, points_from_nation, points_from_orders, rect_admins_df
    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.tiles import with_grid_cells

    spark = get_spark(app_name="mimirsbrunn_plans", cpus=cpus, shuffle_partitions=cpus)
    docs_path, admins_path, _ = ensure_corpus(spark, bench_sf, REPO / ".bench_cache")
    docs = spark.read.parquet(docs_path)
    admins = spark.read.parquet(admins_path)

    def q1():
        pts = with_grid_cells(extract_geo_points(docs), "lon", "lat")
        att = attach_admins(pts.select("h3_7", "lon", "lat"), admins, strategy="broadcast")
        return (
            att.select("h3_7", F.try_element_at("admin_ids", F.lit(1)).alias("admin_id"))
            .groupBy("admin_id")
            .agg(F.count("*").alias("n"), F.countDistinct("h3_7").alias("n_cells"))
        )

    def q2():
        return with_grid_cells(extract_geo_points(docs), "lon", "lat").agg(
            F.sum(F.col("h3_12") % 1000000007), F.max("h3_7")
        )

    def q3():
        pts = points_from_orders(spark, sf_dir)
        att = attach_admins(pts, rect_admins_df(spark), strategy="broadcast")
        return att.select(F.explode("admin_ids"))

    def q4():
        targets = points_from_orders(spark, sf_dir).withColumnRenamed("point_id", "target_id")
        return reverse_geocode(
            points_from_nation(spark, sf_dir), targets, k=3, radius_m=2_000_000.0, res=0
        )

    def q5():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return d.groupBy(F.sha2("text", 256)).count()

    def q6():
        from mimirsbrunn_spark.operators.dedup import lsh_candidate_pairs

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        aug = d.select((F.col("doc_id") * 2).alias("pid"), "text").unionByName(
            d.select(
                (F.col("doc_id") * 2 + 1).alias("pid"),
                F.expr("substring(text, 1, (length(text) * 4) div 5)").alias("text"),
            )
        )
        return lsh_candidate_pairs(aug, id_col="pid")

    def q7():
        pts = with_grid_cells(extract_geo_points(docs), "lon", "lat").select(
            F.concat_ws("#", "doc_id", "span_offset").alias("point_uid"), "lon", "lat"
        )
        return attach_admins(pts, admins, strategy="partitioned").select(F.size("admin_ids").alias("sz"))

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
        return asof_join(clicks, views, key="user_id", time_col="us", right_id="event_id", n_buckets=32)

    def q9():
        from mimirsbrunn_spark.functions.geocode import forward_geocode
        from mimirsbrunn_spark.gate_geocode import geocode_places_df

        base = geocode_places_df(spark, sf_dir)
        places = base.crossJoin(spark.range(10).withColumnRenamed("id", "rep")).withColumn(
            "id", F.col("id") * 10 + F.col("rep")
        ).drop("rep")
        return forward_geocode(places, "St-Martin gare", k=50, query_type="fuzzy", coord=(2.35, 48.85))

    def q10():
        return QUERIES["semdedup_keep"][0](spark, sf_dir)

    def q11():
        from mimirsbrunn_spark.operators.textprep import dedup_lines

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs10 = (
            d.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
                F.concat_ws(
                    "\n",
                    F.col("text"),
                    F.concat(F.lit("boilerplate footer block "), (F.col("doc_id") % 7).cast("string")),
                    F.concat(F.lit("unique line "), (F.col("doc_id") * 10 + F.col("rep")).cast("string")),
                ).alias("text"),
            )
        )
        return dedup_lines(docs10)

    builders = {
        "q1_pipeline_full": q1, "q2_extract_tiles": q2, "q3_pip_rect": q3,
        "q4_reverse_knn": q4, "q5_dedup_exact": q5, "q6_minhash_lsh": q6,
        "q7_pip_partitioned": q7, "q8_asof_skew": q8, "q9_geocode_topk": q9,
        "q10_semdedup": q10, "q11_line_dedup": q11,
    }
    only = set(sys.argv[2:])
    for name, b in builders.items():
        if only and name not in only:
            continue
        df = b()
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (OUT / f"{name}_{suffix}.txt").write_text(txt)
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
