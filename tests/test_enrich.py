"""Enrichment goldens, mirroring the reference's label/zip/weight tests
(labels.rs:190-366, places admin.rs:85-113 — see SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators import enrich as E


def _places_df(spark):
    admins_paris = [
        {"id": "admin:fr:75056", "name": "Paris", "level": 8, "zone_type": "city",
         "zip_codes": ["75012"], "weight": 0.3},
        {"id": "admin:fr:idf", "name": "Ile-de-France", "level": 4, "zone_type": "state_district",
         "zip_codes": [], "weight": 0.5},
    ]
    admins_ams = [
        {"id": "admin:nl:ams", "name": "Amsterdam", "level": 8, "zone_type": "city",
         "zip_codes": ["1017"], "weight": 0.4},
    ]
    rows = [
        ("20", "rue hector malot", admins_paris, 2.375735, 48.845680),
        ("573", "Herengracht", admins_ams, 4.9, 52.36),
        (None, "lonely road", [], 0.0, 0.0),
    ]
    schema = (
        "house_number string, street string, "
        "admins array<struct<id:string,name:string,level:int,zone_type:string,"
        "zip_codes:array<string>,weight:double>>, lon double, lat double"
    )
    return spark.createDataFrame(rows, schema)


def test_label_goldens(spark):
    # labels.rs:266-299 goldens, country-keyed C3 order: fr_addr
    # "20 rue hector malot (Paris)" (hn-first), nl_addr "Herengracht 573
    # (Amsterdam)" (street-first default_name, labels.rs:121-124)
    df = _places_df(spark).withColumn("cc", F.when(F.col("street") == "rue hector malot", "fr").otherwise("nl"))
    df = df.withColumn("name", E.format_addr_name("house_number", "street", F.col("cc")))
    out = {r["street"]: (r["name"], r["label"]) for r in
           df.withColumn("label", E.format_label("name")).collect()}
    assert out["rue hector malot"] == ("20 rue hector malot", "20 rue hector malot (Paris)")
    assert out["Herengracht"] == ("Herengracht 573", "Herengracht 573 (Amsterdam)")
    assert out["lonely road"] == ("lonely road", "lonely road")  # no city admin


def test_addr_name_country_templates(spark):
    # street-first when no country is known (the reference's default_name)
    df = spark.createDataFrame([("5", "Hauptstrasse")], "hn string, st string")
    got = df.select(
        E.format_addr_name("hn", "st").alias("default"),
        E.format_addr_name("hn", "st", "de").alias("de"),
        E.format_addr_name("hn", "st", "FR").alias("fr"),  # case-insensitive
        E.format_addr_name("hn", "st", "us").alias("us"),
    ).collect()[0]
    assert got["default"] == "Hauptstrasse 5"
    assert got["de"] == "Hauptstrasse 5"
    assert got["fr"] == "5 Hauptstrasse"
    assert got["us"] == "5 Hauptstrasse"


def test_zip_codes_from_admins(spark):
    # admin.rs:85-101: zips of the max level having nonempty zip_codes
    rows = [
        ([{"id": "a", "name": "x", "level": 8, "zone_type": "city", "zip_codes": ["75012", "75013"], "weight": 0.0},
          {"id": "b", "name": "y", "level": 4, "zone_type": "state", "zip_codes": ["75"], "weight": 0.0}],),
        ([{"id": "c", "name": "z", "level": 8, "zone_type": "city", "zip_codes": [], "weight": 0.0},
          {"id": "d", "name": "w", "level": 4, "zone_type": "state", "zip_codes": ["75"], "weight": 0.0}],),
        ([],),
    ]
    schema = ("admins array<struct<id:string,name:string,level:int,zone_type:string,"
              "zip_codes:array<string>,weight:double>>")
    df = spark.createDataFrame(rows, schema)
    got = [r["z"] for r in df.select(E.zip_codes_from_admins().alias("z")).collect()]
    assert got[0] == ["75012", "75013"]  # level 8 wins
    assert got[1] == ["75"]              # level-8 empty → falls to level 4
    assert got[2] == []


def test_weight_normalization_and_city_weight(spark):
    df = spark.createDataFrame([(2.8e9,), (7e8,), (-1.0,)], "w double")
    got = [r["n"] for r in df.select(E.normalize_weight("w").alias("n")).collect()]
    assert got == [1.0, 0.5, 0.0]
    pdf = _places_df(spark)
    got = [r["w"] for r in pdf.select(E.weight_from_city().alias("w")).collect()]
    assert got == [0.3, 0.4, 0.0]  # city weight, not the bigger state one


def test_zip_split_and_format(spark):
    df = spark.createDataFrame([("75012;;75011",), ("",)], "zip string")
    got = [r["z"] for r in df.select(E.split_zip_codes("zip").alias("z")).collect()]
    assert got == [["75011", "75012"], []]
    zdf = spark.createDataFrame([(["75011", "75012"],), (["75011"],), ([],)], "z array<string>")
    got = [r["f"] for r in zdf.select(E.format_zip_label("z").alias("f")).collect()]
    assert got == [" (75011-75012)", " (75011)", ""]


def test_addr_id_cleaning(spark):
    # bano.rs:130-137: whitespace stripped, [/.:;] → '-'
    df = spark.createDataFrame([(2.375735, 48.84568, "3 / 5"), (1.0, 2.0, "10Bis")],
                               "lon double, lat double, hn string")
    got = [r["i"] for r in df.select(E.addr_id("lon", "lat", "hn").alias("i")).collect()]
    assert got[0] == "addr:2.375735;48.84568:3-5"
    assert got[1] == "addr:1.0;2.0:10Bis"


def test_addr_id_strips_reference_exact_whitespace_set(spark):
    """bano.rs:135 replaces exactly [' ','\\t','\\r','\\n'] — NOT regex
    \\s, which would also strip \\x0B (vertical tab) and \\f (form
    feed), nor unicode spaces like NBSP: those survive into the id."""
    df = spark.createDataFrame(
        [
            (1.0, 2.0, " 12\tb\r\nis "),   # all four stripped chars
            (1.0, 2.0, "12\x0bbis"),        # vertical tab survives
            (1.0, 2.0, "12\fbis"),          # form feed survives
            (1.0, 2.0, "12\xa0bis"),      # NBSP survives
        ],
        "lon double, lat double, hn string",
    )
    got = [r["i"] for r in df.select(E.addr_id("lon", "lat", "hn").alias("i")).collect()]
    assert got[0] == "addr:1.0;2.0:12bis"
    assert got[1] == "addr:1.0;2.0:12\x0bbis"
    assert got[2] == "addr:1.0;2.0:12\fbis"
    assert got[3] == "addr:1.0;2.0:12\xa0bis"


def test_insee_fantoir(spark):
    df = spark.createDataFrame([("751124517P-10",), ("0123456789XYZ",)], "id string")
    insee, fantoir = E.insee_fantoir("id")
    got = df.select(insee.alias("a"), fantoir.alias("b")).collect()
    assert (got[0]["a"], got[0]["b"]) == ("75112", "751124517P")
    assert (got[1]["a"], got[1]["b"]) == ("1234", "0123456789")  # leading zeros stripped


def test_dedup_streets_and_unique_ids(spark):
    rows = [
        # same (name, city): earliest ingest order wins (relation before way)
        ("street:osm:way:12", "Rue A", "city1", 2),
        ("street:osm:relation:5", "Rue A", "city1", 1),
        # same id across two cities → suffixed
        ("street:osm:way:77", "Rue B", "city1", 3),
        ("street:osm:way:77", "Rue B", "city2", 4),
        # untouched single
        ("street:osm:way:99", "Rue C", "city3", 5),
    ]
    df = spark.createDataFrame(rows, "street_id string, name string, city_id string, ingest_order int")
    out = E.dedup_streets(df).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    assert len(by_name["Rue A"]) == 1
    assert by_name["Rue A"][0]["street_id"] == "street:osm:relation:5"
    ids_b = sorted(r["street_id"] for r in by_name["Rue B"])
    assert ids_b == ["street:osm:way:77-0", "street:osm:way:77-1"]
    assert by_name["Rue C"][0]["street_id"] == "street:osm:way:99"


def test_admin_id_retrocompat_and_oa_precision(spark):
    # admin.rs:140-147 + openaddresses.rs:101-117
    df = spark.createDataFrame(
        [("123", "75056", 2.3757351, 48.8456801, "10 Bis")],
        "osm string, insee string, lon double, lat double, hn string",
    )
    got = df.select(
        E.admin_id("osm").alias("plain"),
        E.admin_id("osm", "insee", french_id_retrocompatibility=True).alias("retro"),
        E.admin_id("osm", F.lit(None).cast("string"), french_id_retrocompatibility=True).alias("noinsee"),
        E.addr_id("lon", "lat", "hn").alias("full"),
        E.addr_id("lon", "lat", "hn", id_precision=5).alias("trimmed"),
    ).collect()[0]
    assert got["plain"] == "admin:osm:123"
    assert got["retro"] == "admin:fr:75056"
    assert got["noinsee"] == "admin:osm:123"
    assert got["full"] == "addr:2.3757351;48.8456801:10Bis"
    assert got["trimmed"] == "addr:2.37574;48.84568:10Bis"
