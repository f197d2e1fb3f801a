"""Scalar functions (C2/C7/C8/C9/A3/W4) + physical-plan shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.functions import scalars as S


def test_codes_from_tags(spark):
    df = spark.createDataFrame(
        [({"ISO3166-1:alpha2": "FR", "ref:INSEE": "75056", "wikidata": "Q90", "name": "Paris"},)],
        "tags map<string,string>",
    )
    got = df.select(S.codes_from_tags("tags").alias("c")).collect()[0]["c"]
    assert got == {"ISO3166-1:alpha2": "FR", "ref:INSEE": "75056", "wikidata": "Q90"}
    cc = df.select(S.country_code_from_codes(S.codes_from_tags("tags")).alias("cc")).collect()[0]["cc"]
    assert cc == "fr"


def test_i18n_names_from_tags(spark):
    df = spark.createDataFrame(
        [({"name": "Paris", "name:ru": "Париж", "name:ja": "パリ", "name:xx": "nope"},)],
        "tags map<string,string>",
    )
    got = df.select(S.i18n_names_from_tags("tags", ["ru", "ja"]).alias("n")).collect()[0]["n"]
    assert got == {"ru": "Париж", "ja": "パリ"}


def test_i18n_labels_skips_default(spark):
    df = spark.createDataFrame(
        [("Tour Eiffel", {"ru": "Эйфелева башня"}, {"ru": "Париж", "ja": "パリ"})],
        "name string, names map<string,string>, city_names map<string,string>",
    )
    got = df.select(S.i18n_labels("name", "names", "city_names", ["ru", "ja"]).alias("l")).collect()[0]["l"]
    assert got["ru"] == "Эйфелева башня (Париж)"
    assert got["ja"] == "Tour Eiffel (パリ)"


def test_population_weight(spark):
    df = spark.createDataFrame(
        [({"population": "2148000"}, {}), ({}, {"population": "500"}), ({"population": "n/a"}, {})],
        "tags map<string,string>, center_tags map<string,string>",
    )
    got = [r["w"] for r in df.select(S.population_weight("tags", "center_tags").alias("w")).collect()]
    assert got == [2148000.0, 500.0, 0.0]


def test_human_sort_and_line_order(spark):
    df = spark.createDataFrame([("A2",), ("A10",), ("B1",), ("2",), ("10",)], "s string")
    keys = {r["s"]: r["k"] for r in df.select("s", S.human_sort_key("s").alias("k")).collect()}
    assert keys["2"] < keys["10"]
    assert keys["A2"] < keys["A10"] < keys["B1"]

    lines = [([
        {"sort_order": None, "code": "10", "name": "z"},
        {"sort_order": None, "code": "2", "name": "a"},
        {"sort_order": 1, "code": "99", "name": "m"},
    ],)]
    ldf = spark.createDataFrame(lines, "lines array<struct<sort_order:int,code:string,name:string>>")
    out = ldf.select(S.sort_lines("lines").alias("o")).collect()[0]["o"]
    assert [l["code"] for l in out] == ["99", "2", "10"]  # sort_order first, then human(code)


# ---------------------------------------------------------------------------
# physical plan shape — the Catalyst guarantees we rely on at 100 TB
# ---------------------------------------------------------------------------


def test_parquet_pushdown_and_pruning(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    plan = (
        df.filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_totalprice")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)" in plan
    # column pruning: the scan schema carries only the two selected columns
    assert "o_comment" not in plan


def test_knn_join_is_broadcast_no_python(spark):
    from mimirsbrunn_spark.gate import points_from_nation, points_from_orders
    from mimirsbrunn_spark.operators.knn import reverse_geocode

    q = points_from_nation(spark, "/root/testdata/sf0.01")
    t = points_from_orders(spark, "/root/testdata/sf0.01").withColumnRenamed("point_id", "target_id")
    plan = reverse_geocode(q, t, k=3, radius_m=2e6, res=0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the ENTIRE plan is JVM-side since the r02 Catalyst ring enumeration —
    # no Python eval on either side (required for the G8 POI×address reuse
    # where the query side is millions of rows).
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_knn_catalyst_disk_matches_python_helper(spark):
    """The Catalyst explode(sequence) disk enumerates exactly the cells of
    tiles.grid_cells_for_radius — verified by planting one target at every
    python-disk cell centre and requiring the operator to pair each with
    its own query (the equi-join can only see cells its Catalyst disk
    enumerated). Cases include antimeridian wrap and a high latitude."""
    from pyspark.sql import functions as F2

    from mimirsbrunn_spark.operators.knn import reverse_geocode
    from mimirsbrunn_spark.tiles import _I_SHIFT, _RES_SHIFT, _grid_n, grid_cells_for_radius

    cases = [(2.35, 48.86), (-179.995, 60.0), (12.5, 0.0), (17.3, 75.0)]
    res, radius = 8, 2500.0
    size = 1 << _grid_n(res)
    qdf = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(cases)], "query_id int, lon double, lat double"
    )
    rows, want = [], {}
    for qi, (lo, la) in enumerate(cases):
        disk = grid_cells_for_radius(lo, la, radius, res)
        want[qi] = len(disk)
        for c in disk:
            rem = c % _RES_SHIFT
            ci, cj = rem // _I_SHIFT, rem % _I_SHIFT
            rows.append((f"t{qi}_{c}", (ci + 0.5) / size * 360.0 - 180.0,
                         (cj + 0.5) / size * 180.0 - 90.0))
    tdf = spark.createDataFrame(rows, "target_id string, lon double, lat double")
    # disable the metric refine (big radius bound via same radius → keep the
    # same disk size) by filtering pairs ourselves: ask for a huge k and
    # count pairs whose target belongs to the same query's planted set.
    got = reverse_geocode(qdf, tdf, k=10_000_000, radius_m=radius * 4, res=res)
    hits = (
        got.filter(F2.split("target_id", "_").getItem(0) == F2.concat(F2.lit("t"), F2.col("query_id")))
        .groupBy("query_id").agg(F2.count("*").alias("n")).collect()
    )
    per_q = {r["query_id"]: r["n"] for r in hits}
    # every planted cell centre within 4*radius must be reachable through
    # the Catalyst disk of radius 4*radius (a strict superset of the python
    # disk of radius 1*radius) — if the Catalyst enumeration dropped or
    # mis-wrapped cells, some planted targets would be unreachable.
    import numpy as np

    from mimirsbrunn_spark.geometry import haversine_np

    for qi, (lo, la) in enumerate(cases):
        reachable = 0
        for tid, tlo, tla in rows:
            if not tid.startswith(f"t{qi}_"):
                continue
            if haversine_np(np.array([lo]), np.array([la]), np.array([tlo]), np.array([tla]))[0] <= radius * 4:
                reachable += 1
        assert per_q.get(qi, 0) == reachable


def test_flagship_has_single_shuffle_at_rollup(spark, fixtures_dir):
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.tiles import with_grid_cells

    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    admins = spark.read.parquet(f"{fixtures_dir}/admins.parquet")
    pts = with_grid_cells(extract_geo_points(docs), "lon", "lat").select("h3_7", "lon", "lat")
    att = attach_admins(pts, admins, strategy="broadcast")
    rollup = att.select("h3_7", F.try_element_at("admin_ids", F.lit(1)).alias("a")).groupBy("a").count()
    rollup.collect()  # finalize the AQE plan (codegen visible post-execution)
    plan = rollup._jdf.queryExecution().executedPlan().toString()
    # map-side join: the only shuffles are the final rollup plus (r6) an
    # optional leading RoundRobin rebalance of an under-split scan — the
    # ensure_parallelism defense; a fixture table is a single parquet
    # file, so the rebalance fires here. Still ZERO join shuffles.
    # (AQE prints the initial plan too, so count materialized shuffle stages)
    n_shuffles = plan.count("ShuffleQueryStage")
    # a rebalance exchange prints the REPARTITION_BY_NUM shuffle origin;
    # planner-required shuffles print ENSURE_REQUIREMENTS
    n_rebalance = plan.count("REPARTITION_BY_NUM")
    assert n_shuffles - min(n_rebalance, 1) == 1, plan
    assert "Join" not in plan
    # extraction/tiling runs inside whole-stage codegen ("*(n)" node prefix)
    assert "*(" in plan
    # column pruning reached the scan: only spans is read
    assert "ReadSchema: struct<spans:array" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join via bucketing (the brief's "bucketing for
    co-located joins"): two tables bucketed identically on the cell key
    must join AND aggregate with ZERO Exchange in the executed plan."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.plans import colocated_join_plan, write_bucketed

    pts = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("cell"), (F.col("id") * 2.0).alias("v")
    )
    dim = spark.range(97).select(F.col("id").alias("cell"), F.lit("z").alias("tag"))
    spark.sql("DROP TABLE IF EXISTS b_pts")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    write_bucketed(pts, "b_pts", ["cell"], n_buckets=8, sort_cols=["cell"])
    write_bucketed(dim, "b_dim", ["cell"], n_buckets=8, sort_cols=["cell"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = colocated_join_plan(spark, "b_pts", "b_dim", ["cell"])
        assert "Exchange" not in plan, plan
        agg = spark.table("b_pts").groupBy("cell").agg(F.sum("v").alias("s"))
        agg.collect()
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_pts")
        spark.sql("DROP TABLE IF EXISTS b_dim")


def test_compact_published_hits_target_file_count(spark, tmp_path):
    """Compaction publishes a NEW generation with ~size/target files and
    identical rows; readers pinned to the old generation are untouched."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.plans import compact_published
    from mimirsbrunn_spark.sources import publish_table, read_published

    base = str(tmp_path / "tables")
    df = spark.range(20000).select("id", (F.col("id") * 1.5).alias("v"))
    publish_table(df.repartition(37), base, "t")  # tiny-file pileup
    import pathlib

    root = pathlib.Path(base) / "t"
    import json

    gen0 = json.loads((root / "_CURRENT").read_text())["generation"]
    n0 = len(list((root / gen0).rglob("*.parquet")))
    assert n0 >= 37
    compact_published(spark, base, "t", target_file_mb=256)  # tiny data → 1 file
    gen1 = json.loads((root / "_CURRENT").read_text())["generation"]
    assert gen1 != gen0
    n1 = len(list((root / gen1).rglob("*.parquet")))
    assert n1 == 1
    assert read_published(spark, base, "t").count() == 20000


def test_forward_geocode_plan_is_topk_no_shuffle(spark):
    """q9 shape: the forward-geocode scoring query must compile to scan
    -> filter (matching condition) -> distributed top-k
    (TakeOrderedAndProject), with no Exchange and no Python in the
    plan — the whole T1-T9 score expression stays JVM-side."""
    from mimirsbrunn_spark.functions.geocode import forward_geocode
    from mimirsbrunn_spark.gate_geocode import geocode_places_df

    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    out = forward_geocode(places, "St-Martin gare", k=50, query_type="fuzzy",
                          coord=(2.35, 48.85))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # r6: the only exchange allowed is the ensure_parallelism rebalance
    # of an under-split scan (shuffle origin REPARTITION_BY_NUM) — the
    # scoring itself must stay shuffle-free: no planner-required
    # (ENSURE_REQUIREMENTS) exchange, no join
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, plan


def test_knn_over_pole_and_no_duplicate_pairs(spark):
    """r5 review regressions on the kNN disk: (1) an in-radius neighbor
    on the OTHER side of the pole (antipodal column, same lat row) must
    be found — the old row-clamp silently dropped it; (2) the full-wrap
    clamp must not emit the antipodal column twice, so each (query,
    target) pair appears exactly once; (3) a polar query must not
    explode a square polar disk (ki stays per-axis)."""
    from pyspark.sql import functions as F2

    from mimirsbrunn_spark.operators.knn import reverse_geocode

    # (1) over-the-pole nearest neighbor: ~889.6 m over the pole
    q = spark.createDataFrame([(0, 0.0, 89.996)], "query_id int, lon double, lat double")
    t = spark.createDataFrame(
        [(77, 180.0, 89.996), (78, 0.0, 89.0)],
        "target_id int, lon double, lat double",
    )
    got = reverse_geocode(q, t, k=2, radius_m=1000.0, res=7).collect()
    assert [r["target_id"] for r in got] == [77]
    assert abs(got[0]["distance_m"] - 889.559) < 0.01

    # (2) no duplicate pairs at full wrap: dense polar targets, one query
    targets = spark.range(400).select(
        F2.col("id").alias("target_id"),
        (F2.col("id") * 0.9 - 180.0).alias("lon"),
        F2.lit(89.9971).alias("lat"),
    )
    r = reverse_geocode(q, targets, k=400, radius_m=5000.0, res=7)
    dup = r.groupBy("query_id", "target_id").count().filter("count > 1").count()
    assert dup == 0
    # every one of the 400 ring targets is within 5 km of the pole query
    assert r.count() == 400


def test_lsh_pairs_plan_computes_signature_once_per_side(spark):
    """Regression pin for the sentinel-filter blowup (commit 75fb212): a
    filter on the derived minhash column gets predicate-pushed below the
    signature Projects with the whole k-aggregate array inlined into the
    predicate (~16 full tokenize+shingle+minhash chains per row per join
    side — a 300x wall regression at sf0.1 that gate scale never sees).
    The optimized plan must keep exactly one minhash-aggregate Project
    per join side and no signature arithmetic inside any Filter."""
    from mimirsbrunn_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x"), (3, None)], "pid long, text string"
    )
    plan = (
        lsh_candidate_pairs(df, id_col="pid")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # 16 signature slots x 2 join sides; the shingle transform inlines a
    # token-id aggregate per side; anything near the pre-fix 226 means
    # the predicate is re-inlining the signature chain
    assert plan.count("aggregate(") <= 40, plan.count("aggregate(")
    for line in plan.splitlines():
        if "Filter" in line:
            assert "aggregate(" not in line, line[:200]
