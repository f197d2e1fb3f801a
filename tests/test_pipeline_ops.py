"""Coverage join, checkpoint/lineage, sources, streaming, geocode."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        ("d1", [
            {"kind": "geo", "text": "10.0;10.0", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "media:aaa", "offset": 1},
            {"kind": "geo", "text": "50.0;50.0", "media_ref": "", "offset": 5},
            {"kind": "media", "text": "", "media_ref": "media:bbb", "offset": 4},
        ]),
        ("d2", [{"kind": "media", "text": "", "media_ref": "media:ccc", "offset": 0}]),  # no geo
        ("d3", [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0}]),
    ]
    from mimirsbrunn_spark.schemas import DOCS

    return spark.createDataFrame(rows, DOCS)


def test_media_points_nearest_offset(spark):
    from mimirsbrunn_spark.operators.coverage import media_points

    got = {(r["media_ref"]): (r["lon"], r["lat"]) for r in media_points(_docs(spark)).collect()}
    assert got["media:aaa"] == (10.0, 10.0)  # offset 1 → nearest geo at 0
    assert got["media:bbb"] == (50.0, 50.0)  # offset 4 → nearest geo at 5
    assert "media:ccc" not in got            # no geo span in doc


def test_coverage_stats(spark, fixtures_dir):
    from mimirsbrunn_spark.operators.coverage import coverage_stats

    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    admins = spark.read.parquet(f"{fixtures_dir}/admins.parquet")
    stats = coverage_stats(docs, admins, res=7).collect()
    assert len(stats) > 0
    for r in stats:
        assert r["n_media"] >= r["n_cells"] >= 1


def test_checkpoint_resume(spark, tmp_path):
    from mimirsbrunn_spark.plans import LineageLog, run_stage

    src = tmp_path / "src"
    spark.range(100).write.parquet(str(src))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(str(src)).withColumn("x", F.col("id") * 2)

    root = str(tmp_path / "ckpt")
    out1 = run_stage(spark, root, "double", [str(src)], build)
    assert out1.count() == 100 and calls["n"] == 1
    out2 = run_stage(spark, root, "double", [str(src)], build)
    assert out2.count() == 100 and calls["n"] == 1  # resume hit, not recomputed

    # input change → recompute
    spark.range(50).write.mode("append").parquet(str(src))
    out3 = run_stage(spark, root, "double", [str(src)], build)
    assert out3.count() == 150 and calls["n"] == 2

    log = LineageLog(root).records()
    events = [r["event"] for r in log]
    assert events == ["computed", "resume_hit", "computed"]
    manifest = json.loads((Path(root) / "double" / "manifest.json").read_text())
    assert manifest["rows"] == 150
    assert len(manifest["partitions"]) >= 1
    assert all("rows" in p for p in manifest["partitions"])


def test_bano_reader_drops_malformed(spark, tmp_path):
    from mimirsbrunn_spark.sources import read_bano_csv

    csv = tmp_path / "bano" / "x.csv"
    csv.parent.mkdir()
    csv.write_text(
        "751124517P-10,10,Rue Hector Malot,75012,Paris,OSM,48.845680,2.375735\n"
        "bad-row-with,too,few\n"
        "751124517P-11,12,,75012,Paris,OSM,48.84,2.37\n"  # empty street → dropped
        "751124517P-12,14,Place Allegre,19240,Allassac,OSM,45.25,1.47\n"
    )
    out = read_bano_csv(spark, str(tmp_path / "bano")).collect()
    streets = sorted(r["street"] for r in out)
    assert streets == ["Place Allegre", "Rue Hector Malot"]
    r = [x for x in out if x["street"] == "Rue Hector Malot"][0]
    assert (r["lat"], r["lon"]) == (48.845680, 2.375735)  # BANO order lat,lon


def test_publish_and_merge(spark, tmp_path):
    from mimirsbrunn_spark.sources import merge_update, publish_table, read_published

    base = str(tmp_path / "tables")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    publish_table(df1, base, "t")
    assert sorted(r["v"] for r in read_published(spark, base, "t").collect()) == ["a", "b"]
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id int, v string")
    publish_table(df2, base, "t")
    assert sorted(r["v"] for r in read_published(spark, base, "t").collect()) == ["a2", "c"]
    # generation pruning: at most keep_generations dirs remain
    gens = [d for d in (Path(base) / "t").iterdir() if d.name.startswith("gen_")]
    assert len(gens) <= 2

    merged = merge_update(df1, spark.createDataFrame([(2, "B"), (9, "z")], "id int, v string"), "id")
    got = {r["id"]: r["v"] for r in merged.collect()}
    assert got == {1: "a", 2: "B", 9: "z"}


def test_streaming_ingest_exactly_once(spark, fixtures_dir, tmp_path):
    from mimirsbrunn_spark.operators.spans import extract_geo_points
    from mimirsbrunn_spark.streaming import incremental_ingest_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs_dir = f"{fixtures_dir}/docs.parquet"
    q = incremental_ingest_stream(spark, docs_dir, out, ckpt)
    q.awaitTermination(120)
    expected = extract_geo_points(spark.read.parquet(docs_dir)).count()
    assert spark.read.parquet(out).count() == expected
    # rerun: no new files → no new rows (exactly-once)
    q2 = incremental_ingest_stream(spark, docs_dir, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected


def test_forward_geocode_fixture_examples(spark):
    from mimirsbrunn_spark.functions import forward_geocode, reverse_geocode_endpoint

    places = spark.createDataFrame(
        [
            ("addr:1", "addr", "14 Place Allegre", "14 Place Allegre (Allassac)", 0.1, 1.47, 45.25),
            ("addr:2", "addr", "2 Route du Chastang", "2 Route du Chastang (Allassac)", 0.1, 1.48, 45.26),
            ("street:1", "street", "Place Allegre", "Place Allegre (Allassac)", 0.2, 1.47, 45.25),
            ("admin:1", "admin", "Allassac", "Allassac", 0.5, 1.475, 45.255),
            ("poi:1", "poi", "Théâtre de Paris", "Théâtre de Paris (Paris)", 0.4, 2.33, 48.87),
        ],
        "id string, type string, name string, label string, weight double, lon double, lat double",
    )
    # limousin.feature: "14 Place Allègre" → the addr in top 1
    top = forward_geocode(places, "14 Place Allègre", k=1).collect()
    assert top[0]["id"] == "addr:1"
    # abbreviation via synonyms: "2 rte du chastang"
    top = forward_geocode(places, "2 rte du chastang", k=1).collect()
    assert top[0]["id"] == "addr:2"
    # single-word query excludes addresses (T5 house-number gate)
    top = forward_geocode(places, "allassac", k=3).collect()
    assert all(r["type"] != "addr" for r in top)
    assert top[0]["id"] == "admin:1"
    # accent-folding: Theatre matches Théâtre
    top = forward_geocode(places, "theatre paris", k=1).collect()
    assert top[0]["id"] == "poi:1"
    # reverse endpoint (G7): nearest addr/street to a coord within 1 km
    hits = reverse_geocode_endpoint(places, 1.4701, 45.2501, k=1, radius_m=1000.0).collect()
    assert len(hits) == 1 and hits[0]["target_id"] in ("addr:1", "street:1")


def test_coverage_cover_finer_than_raster(spark):
    """ADVICE r01: an admin small enough to be covered at res 8 (finer than
    the res-7 raster) must still match — the cover is rolled up to the
    raster res instead of shift-right-by-negative garbage."""
    import numpy as np

    from mimirsbrunn_spark.geometry import mp_to_wkb
    from mimirsbrunn_spark.operators.coverage import coverage_stats
    from mimirsbrunn_spark.schemas import DOCS

    sq = [[np.array([[12.33, 43.20], [12.35, 43.20], [12.35, 43.22], [12.33, 43.22]])]]
    admins = spark.createDataFrame(
        [("admin:small", "city", None, bytearray(mp_to_wkb(sq)))],
        "id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    docs = spark.createDataFrame(
        [
            ("d1", [
                {"kind": "geo", "text": "12.34;43.21", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": "media:x", "offset": 1},
            ]),
        ],
        DOCS,
    )
    # sanity: this admin really is covered at res 8 (finer than raster res 7)
    from mimirsbrunn_spark.geofinder import AdminGeoFinder
    from mimirsbrunn_spark.geometry import mp_bbox

    assert AdminGeoFinder()._pick_res(mp_bbox(sq)) == 8
    stats = coverage_stats(docs, admins, res=7).collect()
    assert len(stats) == 1
    assert stats[0]["admin_id"] == "admin:small" and stats[0]["n_media"] == 1


def test_merge_update_partial_schema_inserts(spark):
    """ADVICE r01: partial-document updates must still insert new-key rows
    (null-padded to the target schema), not silently drop them."""
    from mimirsbrunn_spark.sources import merge_update

    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id int, v string, w int")
    updates = spark.createDataFrame([(2, "B"), (9, "z")], "id int, v string")
    got = {r["id"]: (r["v"], r["w"]) for r in merge_update(target, updates, "id").collect()}
    assert got == {1: ("a", 10), 2: ("B", 20), 9: ("z", None)}

    import pytest as _pytest

    bad = spark.createDataFrame([(2, "B")], "id int, nosuch string")
    with _pytest.raises(ValueError):
        merge_update(target, bad, "id")
