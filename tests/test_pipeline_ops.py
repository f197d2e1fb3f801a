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

    # a tmp dir orphaned by a simulated crash (write succeeded, rename
    # didn't) must be reaped by ANY rerun — resume hit or recompute —
    # because nothing else ever deletes it, and at corpus scale it is a
    # full-size copy of the stage output
    stale = Path(root) / "double" / "data.tmp-deadbeef"
    stale.mkdir()
    (stale / "part-orphan.parquet").write_bytes(b"x")
    out_hit = run_stage(spark, root, "double", [str(src)], build)
    assert out_hit.count() == 100 and calls["n"] == 1  # still a resume hit
    assert not stale.exists()

    # input change → recompute (also reaps, via the same pre-check sweep)
    stale.mkdir()
    spark.range(50).write.mode("append").parquet(str(src))
    out3 = run_stage(spark, root, "double", [str(src)], build)
    assert out3.count() == 150 and calls["n"] == 2
    assert not stale.exists()
    assert not list((Path(root) / "double").glob("data.tmp-*"))

    log = LineageLog(root).records()
    events = [r["event"] for r in log]
    assert events == ["computed", "resume_hit", "resume_hit", "computed"]
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
            ("addr:1", "addr", "14 Place Allegre", "14 Place Allegre (Allassac)", "14", 0.1, 1.47, 45.25),
            ("addr:2", "addr", "2 Route du Chastang", "2 Route du Chastang (Allassac)", "2", 0.1, 1.48, 45.26),
            ("street:1", "street", "Place Allegre", "Place Allegre (Allassac)", None, 0.2, 1.47, 45.25),
            ("admin:1", "admin", "Allassac", "Allassac", None, 0.5, 1.475, 45.255),
            ("poi:1", "poi", "Théâtre de Paris", "Théâtre de Paris (Paris)", None, 0.4, 2.33, 48.87),
        ],
        "id string, type string, name string, label string, house_number string, "
        "weight double, lon double, lat double",
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


def _write_ntfs_fixture(root):
    root.mkdir(parents=True, exist_ok=True)
    (root / "stops.txt").write_text(
        "stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station\n"
        "SA:1,Gare Centrale,45.25,1.47,1,\n"
        "SA:2,Place Nord,45.30,1.50,1,\n"
        "SP:1,Quai A,45.2501,1.4701,0,SA:1\n"
        "SP:2,Quai B,45.2502,1.4702,0,SA:1\n"
        "SP:3,Quai C,45.3001,1.5001,0,SA:2\n"
        "SP:orphan,Isole,44.0,1.0,0,\n"
    )
    (root / "stop_times.txt").write_text(
        "trip_id,stop_id,arrival_time\n"
        "T:1,SP:1,08:00:00\nT:1,SP:2,08:05:00\nT:2,SP:2,09:00:00\nT:3,SP:3,10:00:00\n"
    )
    (root / "trips.txt").write_text(
        "trip_id,route_id,physical_mode_id\nT:1,R:1,PM:metro\nT:2,R:2,PM:bus\nT:3,R:3,PM:bus\n"
    )
    (root / "physical_modes.txt").write_text(
        "physical_mode_id,physical_mode_name\nPM:metro,Metro\nPM:bus,Bus\n"
    )


def test_ntfs_reader_through_stops_pipeline(spark, tmp_path):
    """S5: a synthetic NTFS CSV set drives stops_pipeline to the same
    result as the directly-built stops table (stops.rs:266-300)."""
    from mimirsbrunn_spark.operators.places import stops_pipeline
    from mimirsbrunn_spark.sources import read_ntfs_stops

    _write_ntfs_fixture(tmp_path / "ntfs")
    stops = read_ntfs_stops(spark, str(tmp_path / "ntfs"))
    got = {r["stop_area_id"]: r for r in stops.collect()}
    assert set(got) == {"SA:1", "SA:2"}
    assert got["SA:1"]["stop_point_ids"] == ["SP:1", "SP:2"]
    assert got["SA:1"]["physical_modes"] == ["Bus", "Metro"]  # via SP:2's trips
    assert got["SA:2"]["physical_modes"] == ["Bus"]

    direct = spark.createDataFrame(
        [
            ("SA:1", "Gare Centrale", 1.47, 45.25, ["SP:1", "SP:2"], ["Bus", "Metro"]),
            ("SA:2", "Place Nord", 1.50, 45.30, ["SP:3"], ["Bus"]),
        ],
        "stop_area_id string, name string, lon double, lat double, "
        "stop_point_ids array<string>, physical_modes array<string>",
    )
    from mimirsbrunn_spark.gate import rect_admins_df

    admins = rect_admins_df(spark)
    cols = ["stop_area_id", "name", "n_stop_points", "mode_weight", "weight", "label"]
    a = stops_pipeline(stops, admins).select(*cols).orderBy("stop_area_id").collect()
    b = stops_pipeline(direct, admins).select(*cols).orderBy("stop_area_id").collect()
    assert a == b


def test_navitia_poi_reader_through_pois_pipeline(spark, tmp_path):
    """S6: a navitia .poi file set (';'-separated) flows through
    pois_pipeline pre-typed — no F2 rule engine, name/postcode fallbacks
    from the properties map (pois.rs:110-125, poi.rs:214-223)."""
    from mimirsbrunn_spark.gate import rect_admins_df
    from mimirsbrunn_spark.operators.places import pois_pipeline
    from mimirsbrunn_spark.sources import read_navitia_pois

    root = tmp_path / "poi"
    root.mkdir()
    (root / "poi.txt").write_text(
        "poi_id;poi_type_id;poi_name;poi_lat;poi_lon\n"
        "P:1;amenity:townhall;Mairie;45.25;1.47\n"
        "P:2;leisure:park;;45.30;1.50\n"          # empty name → type-name fallback
        "P:bad;amenity:parking;Nowhere;;\n"        # unparsable coords dropped
        # unrecognized poi_type_id → into_poi fails, filter_map(.ok())
        # skips the POI (pois.rs:149,192-196) even with valid coords
        "P:untyped;bogus:type;Ghost;45.26;1.48\n"
    )
    (root / "poi_type.txt").write_text(
        "poi_type_id;poi_type_name\namenity:townhall;town hall\nleisure:park;park\n"
    )
    (root / "poi_properties.txt").write_text(
        "poi_id;key;value\n"
        "P:1;addr:postcode;19240\n"
        "P:1;wheelchair;yes\n"
        # a 'name' property must not crash map_concat (duplicate map key
        # under mapKeyDedupPolicy=EXCEPTION); the poi.txt name field wins
        "P:1;name;Hotel de Ville\n"
        # duplicate (poi_id, key) rows must not crash map_from_entries
        "P:2;wheelchair;no\n"
        "P:2;wheelchair;yes\n"
    )
    pois = read_navitia_pois(spark, str(root))
    assert pois.count() == 2
    tags1 = {r["osm_id"]: r["tags"] for r in pois.collect()}
    assert tags1["P:1"]["name"] == "Mairie"  # poi.txt field authoritative
    assert tags1["P:2"]["wheelchair"] == "yes"  # deterministic max dedup
    out = {r["osm_id"]: r for r in pois_pipeline(pois, rect_admins_df(spark)).collect()}
    assert out["P:1"]["name"] == "Mairie"
    assert out["P:1"]["zip_codes"] == ["19240"]           # property override
    assert out["P:1"]["poi_id"] == "poi:navitia:P:1"
    assert out["P:2"]["name"] == "park"                   # poi_type name fallback
    assert out["P:2"]["poi_type"]["id"] == "leisure:park"


def test_apply_dotted_updates(spark):
    """update.rs:45-75 semantics: dotted Set ops merge into nested docs,
    missing intermediate objects are created, other rows untouched."""
    import pytest as _pytest

    from mimirsbrunn_spark.sources.lifecycle import apply_dotted_updates

    target = spark.createDataFrame(
        [
            ("d1", {"city": {"postcode": None, "name": None}, "street": "rue A"}, "x"),
            ("d2", None, "y"),
            ("d3", {"city": {"postcode": "00000", "name": "Old"}, "street": "rue C"}, "z"),
        ],
        "id string, address struct<city:struct<postcode:string,name:string>,street:string>, v string",
    )
    ops = spark.createDataFrame(
        [
            ("d1", "address.city.postcode", "95600"),
            ("d1", "address.city.name", "Eaubonne"),
            ("d2", "address.city.name", "Nowhere"),  # null root struct → created
            ("d2", "v", "Y2"),                        # top-level column set
        ],
        "id string, ident string, value string",
    )
    got = {r["id"]: r for r in apply_dotted_updates(target, ops, "id").collect()}
    assert got["d1"]["address"]["city"]["postcode"] == "95600"
    assert got["d1"]["address"]["city"]["name"] == "Eaubonne"
    assert got["d1"]["address"]["street"] == "rue A"       # sibling preserved
    assert got["d2"]["address"]["city"]["name"] == "Nowhere"
    assert got["d2"]["address"]["street"] is None
    assert got["d2"]["v"] == "Y2"
    assert got["d3"]["address"]["city"]["name"] == "Old"   # untouched row
    assert got["d3"]["v"] == "z"

    bad = spark.createDataFrame([("d1", "address.nosuch.x", "1")], "id string, ident string, value string")
    with _pytest.raises(ValueError):
        apply_dotted_updates(target, bad, "id")


def test_geocodejson_assembly(spark):
    """C10 (geocoding.rs:10-131): place rows → GeoJSON Point features with
    a geocoding property block; driver envelope is a FeatureCollection."""
    import json

    from mimirsbrunn_spark.functions import geocodejson_response, to_geocodejson

    admins_t = ("array<struct<id:string,name:string,level:int,zone_type:string,"
                "zip_codes:array<string>,weight:double>>")
    df = spark.createDataFrame(
        [
            ("addr:2.37;48.84:20", "addr", "20 rue hector malot (Paris)", "20 rue hector malot",
             "20", "rue hector malot", ["75012"], "75112",
             [{"id": "admin:fr:75056", "name": "Paris", "level": 8, "zone_type": "city",
               "zip_codes": ["75012"], "weight": 0.3}],
             2.375735, 48.84568),
        ],
        f"id string, type string, label string, name string, house_number string, "
        f"street string, zip_codes array<string>, insee string, admins {admins_t}, "
        f"lon double, lat double",
    )
    feats = [r["feature"] for r in to_geocodejson(df).collect()]
    f = json.loads(feats[0])
    assert f["type"] == "Feature"
    assert f["geometry"] == {"type": "Point", "coordinates": [2.375735, 48.84568]}
    g = f["properties"]["geocoding"]
    assert g["id"] == "addr:2.37;48.84:20"
    assert g["housenumber"] == "20" and g["street"] == "rue hector malot"
    assert g["postcode"] == "75012" and g["city"] == "Paris" and g["citycode"] == "75112"
    assert g["administrative_regions"][0]["id"] == "admin:fr:75056"
    resp = json.loads(geocodejson_response(feats, q="20 rue hector malot"))
    assert resp["type"] == "FeatureCollection"
    assert resp["geocoding"] == {"version": "0.1.0", "query": "20 rue hector malot"}
    assert len(resp["features"]) == 1


def _split_events_by_time(spark, tmp_path, n_files=3):
    """Split the sf0.01 events into time-ordered files so an
    availableNow run sees multiple micro-batches and the watermark
    advances between them."""
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    qs = e.approxQuantile("__us", [i / n_files for i in range(1, n_files)], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    src = tmp_path / "events_stream"
    src.mkdir()
    for i in range(n_files):
        (
            e.filter((F.col("__us") > bounds[i]) & (F.col("__us") <= bounds[i + 1]))
            .drop("__us")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / f"part_{i}.parquet"))
        )
    # flatten: the file source wants files, not dirs — move parquet files up
    import shutil

    final = tmp_path / "events_src"
    final.mkdir()
    for i, d in enumerate(sorted(src.iterdir())):
        for f in d.glob("*.parquet"):
            shutil.copy(f, final / f"events_{i}.parquet")
    return str(final)


def test_streaming_windowed_counts_watermark(spark, tmp_path):
    """§2.10: watermark + windowed agg; every emitted window row equals
    the batch rollup of the same window (append mode emits only finalized
    windows, so the stream output is a subset of the batch result —
    nonempty because the watermark advances across micro-batches)."""
    from mimirsbrunn_spark.streaming import windowed_event_counts

    src = _split_events_by_time(spark, tmp_path)
    out, ckpt = str(tmp_path / "win_out"), str(tmp_path / "win_ckpt")
    q = windowed_event_counts(spark, src, out, ckpt, window="10 minutes",
                              watermark="30 minutes")
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )
    g = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"]) for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"]) for r in batch.collect()}
    assert len(g) > 0, "watermark never finalized any window"
    for k, v in g.items():
        assert b[k] == v, k
    # exactly-once on rerun: no new rows
    n0 = got.count()
    q2 = windowed_event_counts(spark, src, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n0


def test_streaming_stateful_sessionize_matches_batch(spark, tmp_path):
    """§2.10: applyInPandasWithState sessionization — every emitted
    (closed or timeout-flushed) session must appear in the batch
    operator's result with identical (n_events, duration_us)."""
    from mimirsbrunn_spark.gate import q_sessionize
    from mimirsbrunn_spark.streaming import stateful_sessionize_stream

    src = _split_events_by_time(spark, tmp_path)
    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")
    q = stateful_sessionize_stream(spark, src, out, ckpt, watermark="30 minutes")
    q.awaitTermination(600)
    got = spark.read.parquet(out).collect()
    assert len(got) > 0, "no sessions emitted"
    # batch truth keyed by (user, n_events, duration) — session_idx
    # numbering differs (stream numbers per arrival, batch per user
    # timeline) but the session CONTENTS must match
    batch = q_sessionize(spark, "/root/testdata/sf0.01").collect()
    batch_key = {}
    for r in batch:
        batch_key.setdefault((r["user_id"], r["n_events"], r["duration_us"]), 0)
        batch_key[(r["user_id"], r["n_events"], r["duration_us"])] += 1
    for r in got:
        k = (r["user_id"], r["n_events"], r["duration_us"])
        assert batch_key.get(k, 0) > 0, f"stream session {k} not in batch result"
        batch_key[k] -= 1
    # numbering continuity across idle timeout flushes: session_idx is
    # unique per user (state.remove() on timeout used to restart the
    # counter at 1, emitting duplicate (user_id, session_idx) pairs for
    # in-order data; the kernel now keeps the counter under a sentinel)
    seen_idx = set()
    for r in got:
        k = (r["user_id"], r["session_idx"])
        assert k not in seen_idx, f"duplicate session numbering {k}"
        seen_idx.add(k)


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF ANN: deterministic k-means training + probed re-rank; recall@3
    against exact cosine_topk must clear 0.7 at 4/16 probes and reach 1.0
    when probing every centroid (degenerates to brute force)."""
    from mimirsbrunn_spark.operators.similarity import cosine_topk, ivf_topk, train_ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 15)
    exact = {(r["query_vec"], r["neighbor_vec"]) for r in cosine_topk(queries, emb, k=3).collect()}
    cents = train_ivf_centroids(emb, n_centroids=16, iters=3)
    approx = {(r["query_vec"], r["neighbor_vec"])
              for r in ivf_topk(queries, emb, k=3, n_probe=4, centroids=cents).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall
    full = {(r["query_vec"], r["neighbor_vec"])
            for r in ivf_topk(queries, emb, k=3, n_probe=16, centroids=cents).collect()}
    assert full == exact


def test_resolve_osm_dependencies_transitive(spark):
    """S2: filtered object ids pull their members transitively
    (relation -> relation -> way -> nodes), each exactly once, cycles
    tolerated."""
    from mimirsbrunn_spark.sources import resolve_osm_dependencies

    seeds = spark.createDataFrame([("rel:1",), ("way:9",)], "osm_id string")
    members = spark.createDataFrame(
        [
            ("rel:1", "rel:2"),
            ("rel:2", "way:5"),
            ("rel:2", "rel:1"),   # cycle back
            ("way:5", "node:51"),
            ("way:5", "node:52"),
            ("way:9", "node:91"),
            ("rel:77", "way:5"),  # unrelated parent — never pulled
            ("way:88", "node:881"),  # unreachable
        ],
        "parent_id string, child_id string",
    )
    got = sorted(r["osm_id"] for r in resolve_osm_dependencies(seeds, members).collect())
    assert got == ["node:51", "node:52", "node:91", "rel:1", "rel:2", "way:5", "way:9"]


def test_geocode_zip_codes_array_matching(spark):
    """T3/T4 with array-typed zip_codes: zips are part of full_label
    (copy_to in the reference mapping), so "<street> <zip>" matches and
    the zip boosts the right city's address."""
    from mimirsbrunn_spark.functions.geocode import autocomplete

    places = spark.createDataFrame(
        [
            ("addr:a", "addr", "25 Quai de Montebello", "25 Quai de Montebello (Paris)", ["75005"], "25", 0.1, 2.3477, 48.8525),
            ("addr:b", "addr", "25 Quai de Montebello", "25 Quai de Montebello (Lyon)", ["69001"], "25", 0.1, 4.83, 45.77),
        ],
        "id string, type string, name string, label string, zip_codes array<string>, "
        "house_number string, weight double, lon double, lat double",
    )
    df, mode = autocomplete(places, "25 Quai de Montebello 75005", k=2)
    got = [r["id"] for r in df.collect()]
    assert mode == "prefix"          # the zip matches through full_label
    assert got[0] == "addr:a", got   # and boosts the 75005 address first
    assert got == ["addr:a"], got    # Lyon fails the operator-and condition


def test_neardup_components_and_canonical(spark):
    """Components over a hand-built pair graph: chain, triangle,
    singleton edge; canonical keep removes every non-minimum member."""
    from mimirsbrunn_spark.operators.dedup import dedup_keep_canonical, neardup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain → comp 1
         (10, 11), (11, 12), (10, 12),    # triangle → comp 10
         (20, 21)],                       # pair → comp 20
        "doc_a long, doc_b long",
    )
    comp = {r["doc_id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "doc_id long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [1, 10, 20, 99]  # one canonical per component + untouched 99


def test_asof_join_semantics(spark):
    """AS-OF join unit vectors: inclusive same-timestamp match, no-match
    null, greatest-id tie rule, per-key isolation, right attrs carried."""
    from mimirsbrunn_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "L1"), ("u1", 205, "L2"), ("u1", 50, "L0"), ("u2", 100, "L3")],
        "user string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 7, "a"), ("u1", 100, 9, "b"),   # tie at t=100 → id 9 wins
         ("u1", 200, 11, "c"), ("u2", 150, 13, "d")],
        "user string, t long, rid long, val string",
    )
    out = {r["lbl"]: r for r in asof_join(
        left, right, key="user", time_col="t", right_id="rid", right_cols=["val"]
    ).collect()}
    assert out["L1"]["rid_asof"] == 9 and out["L1"]["t_asof"] == 100  # inclusive + tie
    assert out["L1"]["val_asof"] == "b"
    assert out["L2"]["rid_asof"] == 11 and out["L2"]["val_asof"] == "c"
    assert out["L0"]["rid_asof"] is None and out["L0"]["t_asof"] is None
    assert out["L3"]["rid_asof"] is None  # u2's only view is later


def test_range_join_bucketized(spark):
    """Range join unit vectors: overlapping intervals, half-open bounds,
    values outside every interval; result equals the naive inequality
    join regardless of bucket width."""
    from mimirsbrunn_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 0.0), (2, 2.5), (3, 5.0), (4, 9.99), (5, 100.0)], "id long, value double"
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 5.0), (11, 2.0, 10.0), (12, 5.0, 6.0)], "iid long, lo double, hi double"
    )
    naive = {
        (r["id"], r["iid"])
        for r in left.join(iv, (left["value"] >= iv["lo"]) & (left["value"] < iv["hi"])).collect()
    }
    for w in (0.5, 3.0, 50.0):
        got = {(r["id"], r["iid"]) for r in range_join(left, iv, "value", bucket_width=w).collect()}
        assert got == naive, (w, got ^ naive)
    assert (1, 10) in naive and (3, 12) in naive and (3, 11) in naive
    assert all(i != 5 for i, _ in naive)          # 100.0 matches nothing
    assert (3, 10) not in naive                   # hi is exclusive


class _FakeGroupState:
    """Minimal GroupState stand-in for driving _sessionize_user directly."""

    def __init__(self, value=None, wm_ms=0):
        self._v = value
        self._wm = wm_ms
        self.hasTimedOut = False
        self.timeout = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts

    def getCurrentWatermarkMs(self):
        return self._wm


def test_sessionize_kernel_sorts_across_arrow_chunks():
    """ADVICE r02 (medium): a group's micro-batch can arrive as several
    Arrow chunks in arbitrary order; the kernel must sort GLOBALLY, not
    per chunk. Chunk 1 carries the LATER burst, chunk 2 the earlier one —
    per-chunk sorting would fold all 4 events into one session with
    time moving backwards; global sorting closes the early session."""
    import pandas as pd

    from mimirsbrunn_spark.streaming.sessions import SESSION_GAP_US, _sessionize_user

    t0 = 1_700_000_000_000_000  # us
    late_burst = pd.DataFrame({"us": [t0 + 2 * SESSION_GAP_US, t0 + 2 * SESSION_GAP_US + 60_000_000],
                               "event_id": [3, 4]})
    early_burst = pd.DataFrame({"us": [t0, t0 + 60_000_000], "event_id": [1, 2]})
    st = _FakeGroupState(wm_ms=0)
    out = list(_sessionize_user((7,), iter([late_burst, early_burst]), st))
    closed = pd.concat(out) if out else pd.DataFrame()
    assert len(closed) == 1, "early session must close when the gap is crossed"
    assert closed.iloc[0]["n_events"] == 2
    assert closed.iloc[0]["duration_us"] == 60_000_000
    last_us, start_us, n_events, _ = st.get  # open session = the late burst
    assert n_events == 2 and last_us - start_us == 60_000_000
    assert last_us == t0 + 2 * SESSION_GAP_US + 60_000_000


def test_sessionize_kernel_clamps_cross_batch_stragglers():
    """Cross-batch late-but-within-watermark arrival behind the open
    session's head: counted into the open session, session time never
    moves backwards (no negative durations)."""
    import pandas as pd

    from mimirsbrunn_spark.streaming.sessions import _sessionize_user

    t0 = 1_700_000_000_000_000
    st = _FakeGroupState(value=(t0 + 600_000_000, t0, 3, 1), wm_ms=0)
    straggler = pd.DataFrame({"us": [t0 + 300_000_000], "event_id": [9]})
    out = list(_sessionize_user((7,), iter([straggler]), st))
    assert out == []  # nothing closes
    last_us, start_us, n_events, session_idx = st.get
    assert (last_us, start_us, session_idx) == (t0 + 600_000_000, t0, 1)
    assert n_events == 4  # straggler counted, head not moved


def test_apply_dotted_updates_ordering(spark):
    """ADVICE r02: duplicate ops on one (key, ident) must be last-write-
    wins via an explicit 'seq' column — and must REFUSE (not pick an
    arbitrary row) when no ordering column exists."""
    import pytest

    from mimirsbrunn_spark.sources.lifecycle import apply_dotted_updates

    target = spark.createDataFrame([(1, "old")], "id long, name string")
    dup = spark.createDataFrame(
        [(1, "name", "second"), (1, "name", "first")], "id long, ident string, value string"
    )
    with pytest.raises(ValueError, match="seq"):
        apply_dotted_updates(target, dup, "id")
    seq = spark.createDataFrame(
        [(1, "name", "mid", 2), (1, "name", "last", 3), (1, "name", "first", 1)],
        "id long, ident string, value string, seq long",
    )
    got = apply_dotted_updates(target, seq, "id").collect()
    assert got[0]["name"] == "last"


def test_apply_dotted_updates_two_nested_sets_same_root(spark):
    """Two Set ops on different nested paths of the SAME root struct in
    one batch must both land (the second withColumn layers on the first
    update, never clobbers it back to the original), and the application
    order is the deterministic depth-then-name sort, not collect() order."""
    from mimirsbrunn_spark.sources.lifecycle import apply_dotted_updates

    target = spark.createDataFrame(
        [(1, ("orig_i", "orig_a", "keep"))],
        "id long, properties struct<image:string,alt:string,other:string>",
    )
    ups = spark.createDataFrame(
        [(1, "properties.image", "new_i"), (1, "properties.alt", "new_a")],
        "id long, ident string, value string",
    )
    out = apply_dotted_updates(target, ups, "id").collect()[0]["properties"]
    assert (out["image"], out["alt"], out["other"]) == ("new_i", "new_a", "keep")


def test_merge_update_refuses_duplicate_update_keys(spark):
    """A replayed/duplicated update batch must not fan the MERGE join out
    into duplicate published documents — refused loudly."""
    import pytest

    from mimirsbrunn_spark.sources.lifecycle import merge_update

    target = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id long, name string")
    with pytest.raises(ValueError, match="multiple rows for key"):
        merge_update(target, dup, "id")
    ok = merge_update(
        target, spark.createDataFrame([(1, "x")], "id long, name string"), "id"
    )
    assert {(r["id"], r["name"]) for r in ok.collect()} == {(1, "x"), (2, "b")}


def test_resolve_osm_dependencies_nonconvergence_raises(spark):
    """ADVICE r02: a frontier still expanding at max_depth must raise,
    never return a silently truncated closure."""
    import pytest

    from mimirsbrunn_spark.sources import resolve_osm_dependencies

    seeds = spark.createDataFrame([(1,)], "osm_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "parent_id long, child_id long"
    )
    with pytest.raises(ValueError, match="converge"):
        resolve_osm_dependencies(seeds, chain, max_depth=3)
    full = sorted(
        r["osm_id"] for r in resolve_osm_dependencies(seeds, chain, max_depth=8).collect()
    )
    assert full == [1, 2, 3, 4, 5, 6, 7]


def test_asof_join_bucketed_matches_single_window(spark):
    """VERDICT r02 #5: the time-bucketed skew-safe plan must equal the
    single-window plan exactly — including a 90%-hot key and carries
    across empty buckets — for several bucket counts."""
    import random

    from mimirsbrunn_spark.operators.temporal import asof_join

    rng = random.Random(42)
    # key 1 holds ~90% of rows; times cluster early so most buckets are
    # right-empty and the carry has to cross them
    lrows = [(1 if rng.random() < 0.9 else rng.randint(2, 5),
              rng.randint(0, 10_000), i) for i in range(800)]
    rrows = [(1 if rng.random() < 0.9 else rng.randint(2, 5),
              rng.randint(0, 3_000), 1000 + i) for i in range(300)]
    left = spark.createDataFrame(lrows, "k long, t long, lid long")
    right = spark.createDataFrame(rrows, "k long, t long, rid long")
    base = {
        (r["k"], r["t"], r["lid"]): (r["rid_asof"], r["t_asof"])
        for r in asof_join(left, right, "k", "t", "rid").collect()
    }
    for nb in (2, 7, 64):
        got = {
            (r["k"], r["t"], r["lid"]): (r["rid_asof"], r["t_asof"])
            for r in asof_join(left, right, "k", "t", "rid", n_buckets=nb).collect()
        }
        assert got == base, f"n_buckets={nb}: {dict(set(got.items()) ^ set(base.items()))}"


def test_range_join_span_guard(spark):
    """VERDICT r02 #4: a whole-domain degenerate interval must refuse at
    a small bucket_width (raise) or widen (rebucket) — never explode."""
    import pytest

    from mimirsbrunn_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 5.0), (2, 1e6)], "id long, value double")
    iv = spark.createDataFrame(
        [(10, 0.0, 2e6), (11, 4.0, 6.0)], "iid long, lo double, hi double"
    )
    with pytest.raises(ValueError, match="bucket"):
        range_join(left, iv, "value", bucket_width=1.0)
    got = {
        (r["id"], r["iid"])
        for r in range_join(left, iv, "value", bucket_width=1.0, on_wide="rebucket").collect()
    }
    assert got == {(1, 10), (1, 11), (2, 10)}
    # percentile-derived width (bucket_width=None) on sane spans just works
    sane = spark.createDataFrame(
        [(10, 0.0, 5.0), (11, 4.0, 10.0)], "iid long, lo double, hi double"
    )
    got2 = {(r["id"], r["iid"]) for r in range_join(left, sane, "value", bucket_width=None).collect()}
    assert got2 == {(1, 11)}  # 5.0 is outside [0, 5) — hi exclusive


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """§2.10: watermarked stream-stream interval join — the emitted
    (click, view) pairs must equal the batch inner interval join on the
    same input exactly (in-order files, within-watermark arrivals)."""
    from mimirsbrunn_spark.streaming import stream_click_view_join

    src = _split_events_by_time(spark, tmp_path)
    out, ckpt = str(tmp_path / "ssj_out"), str(tmp_path / "ssj_ckpt")
    # a generous watermark makes the equality exact regardless of the
    # file source's modification-time ordering under load (watermark
    # AGEING is exercised by the windowed/sessionize tests); and the
    # query must have actually terminated before the output is read
    q = stream_click_view_join(
        spark, src, out, ckpt, max_gap_minutes=15, watermark="30 days"
    )
    assert q.awaitTermination(900), "stream query did not terminate"
    got = {
        (r["user_id"], r["click_id"], r["view_id"], r["gap_us"])
        for r in spark.read.parquet(out).collect()
    }
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("us").alias("cus")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuser"), F.col("event_id").alias("view_id"),
        F.col("us").alias("vus"),
    )
    batch = {
        (r["user_id"], r["click_id"], r["view_id"], r["cus"] - r["vus"])
        for r in c.join(
            v,
            (c["user_id"] == v["vuser"]) & (v["vus"] <= c["cus"])
            & (v["vus"] >= c["cus"] - 15 * 60 * 1_000_000),
        ).collect()
    }
    assert len(batch) > 0, "fixture produced no in-gap pairs"
    assert got == batch, f"{len(got)} stream vs {len(batch)} batch"


def test_extract_geo_points_arrow_matches_catalyst(spark):
    """The mapInArrow extraction path must agree row-for-row with the
    Catalyst twin, including the parse edges: 'a;b;c' takes elements
    0/1, text without ';' is dropped, malformed numerics are dropped,
    out-of-range coordinates are dropped, geo-less docs vanish."""
    from mimirsbrunn_spark.operators.spans import (
        extract_geo_points,
        extract_geo_points_arrow,
    )
    from mimirsbrunn_spark.schemas import DOCS

    rows = [
        ("d1", [
            {"kind": "geo", "text": "10.5;-20.25", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "media:a", "offset": 1},
            {"kind": "geo", "text": "1;2;3", "media_ref": "", "offset": 2},
        ]),
        ("d2", [
            {"kind": "geo", "text": "181.0;10.0", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": "10.0;91.0", "media_ref": "", "offset": 1},
            {"kind": "geo", "text": "nolon", "media_ref": "", "offset": 2},
            {"kind": "geo", "text": "abc;10.0", "media_ref": "", "offset": 3},
            {"kind": "geo", "text": ";", "media_ref": "", "offset": 4},
            {"kind": "geo", "text": " 3.5 ;4", "media_ref": "", "offset": 5},
            # NUMERIC text without ';': the ANSI getItem(1) crash vector
            # (filter short-circuit only reaches lat when lon parses) —
            # must be silently dropped, not a job abort
            {"kind": "geo", "text": "3.5", "media_ref": "", "offset": 6},
        ]),
        ("d3", [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0}]),
        ("d4", []),
    ]
    docs = spark.createDataFrame(rows, DOCS)
    key = ["doc_id", "span_offset", "lon", "lat"]
    cat = sorted(tuple(r) for r in extract_geo_points(docs).select(*key).collect())
    arr = sorted(tuple(r) for r in extract_geo_points_arrow(docs).select(*key).collect())
    assert cat == arr
    assert ("d1", 2, 1.0, 2.0) in cat  # split semantics: 'a;b;c' -> (a, b)
    assert ("d2", 5, 3.5, 4.0) in cat  # whitespace-tolerant coercion
    assert {t[0] for t in cat} == {"d1", "d2"}
