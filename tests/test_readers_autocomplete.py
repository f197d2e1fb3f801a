from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F


def test_openaddresses_reader(spark, tmp_path):
    from mimirsbrunn_spark.sources import read_openaddresses_csv

    d = tmp_path / "oa"
    d.mkdir()
    (d / "x.csv").write_text(
        "LON,LAT,NUMBER,STREET,UNIT,CITY,DISTRICT,REGION,POSTCODE,ID,HASH\n"
        "2.37,48.84,10,Rue Hector Malot,,Paris,,IDF,75012,oa1,h1\n"
        "bad,48.84,11,Rue X,,Paris,,IDF,75012,oa2,h2\n"
        "2.38,48.85,12,,,Paris,,IDF,75012,oa3,h3\n"
    )
    out = read_openaddresses_csv(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id"], r["lon"], r["lat"], r["street"]) == ("oa1", 2.37, 48.84, "Rue Hector Malot")


def test_cosmogony_jsonl_gz_reader(spark, tmp_path):
    from mimirsbrunn_spark.sources import read_cosmogony_jsonl

    d = tmp_path / "cosmo"
    d.mkdir()
    lines = (
        '{"id": "z1", "name": "Paris", "zone_type": "city"}\n'
        "this is not json\n"
        '{"id": "z2", "name": "IDF", "zone_type": "state"}\n'
    )
    with gzip.open(d / "zones.jsonl.gz", "wt") as f:
        f.write(lines)
    out = read_cosmogony_jsonl(
        spark, str(d), schema="id string, name string, zone_type string"
    ).filter(F.col("id").isNotNull()).collect()
    assert sorted(r["id"] for r in out) == ["z1", "z2"]


def test_autocomplete_prefix_then_fuzzy(spark):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    places = spark.createDataFrame(
        [
            ("street:1", "street", "Place Allegre", "Place Allegre (Allassac)", 0.2, 1.47, 45.25),
            ("admin:1", "admin", "Allassac", "Allassac", 0.5, 1.475, 45.255),
        ],
        "id string, type string, name string, label string, weight double, lon double, lat double",
    )
    df, mode = autocomplete(places, "place allegre", k=3)
    assert mode == "prefix" and df.collect()[0]["id"] == "street:1"
    # a query with mostly-unknown tokens falls back to fuzzy (any-token)
    df, mode = autocomplete(places, "xxqq zz yy allegre", k=3)
    assert mode == "fuzzy"
    assert df.collect()[0]["id"] == "street:1"
    # a fully-unknown query returns empty fuzzy (no crash)
    df, mode = autocomplete(places, "zzz qqq", k=3)
    assert mode == "fuzzy" and df.count() == 0


def test_read_table_seam(spark):
    """North-rule input seam: dotted catalog idents go through
    spark.read.table (Iceberg or any configured catalog), path-likes read
    as parquet, and fmt="iceberg" surfaces the missing-runtime error in
    this sandbox rather than silently falling back."""
    import pytest

    from mimirsbrunn_spark.sources import read_table

    # path-like → parquet
    df = read_table(spark, "/root/testdata/sf0.001/nation.parquet")
    assert df.count() == 25
    # dotted ident → catalog table (global temp view, no files involved)
    spark.range(3).createOrReplaceGlobalTempView("rt_seam_v")
    assert read_table(spark, "global_temp.rt_seam_v").count() == 3
    # forced parquet
    assert read_table(spark, "/root/testdata/sf0.001/region.parquet", fmt="parquet").count() == 5
    # forced iceberg: the runtime jar is absent from this image
    with pytest.raises(Exception):
        read_table(spark, "/root/testdata/sf0.001/nation.parquet", fmt="iceberg").count()
    with pytest.raises(ValueError, match="unknown fmt"):
        read_table(spark, "x", fmt="bogus")
