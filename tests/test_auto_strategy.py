"""strategy='auto' for the PIP join: dim-size-estimating dispatch
between the broadcast (map-side) and partitioned (shuffle) paths, with
results identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.datagen import write_fixtures
from mimirsbrunn_spark.operators.pip import (
    attach_admins,
    choose_pip_strategy,
    estimate_dim_bytes,
)


@pytest.fixture(scope="module")
def fixtures(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("auto_strategy")
    return write_fixtures(str(root), n_docs=400, spark=spark)


@pytest.fixture(scope="module")
def admins(spark, fixtures):
    return spark.read.parquet(fixtures["admins"]).cache()


def test_estimate_counts_wkb_and_meta(admins):
    est = estimate_dim_bytes(admins)
    n = admins.count()
    wkb = admins.select(F.sum(F.length("boundary_wkb"))).collect()[0][0]
    assert est >= wkb + n * 64
    assert est < wkb + n * 2048  # sane overhead bound


def test_choose_by_budget(admins):
    assert choose_pip_strategy(admins, broadcast_budget_bytes=1 << 30) == "broadcast"
    assert choose_pip_strategy(admins, broadcast_budget_bytes=16) == "partitioned"


def test_auto_equals_explicit_both_regimes(spark, fixtures, admins):
    from mimirsbrunn_spark.operators.spans import extract_geo_points

    docs = spark.read.parquet(fixtures["docs"])
    pts = extract_geo_points(docs).withColumn(
        "point_uid", F.concat_ws("#", "doc_id", "span_offset")
    )

    def canon(df):
        return sorted(
            (r["point_uid"], tuple(r["admin_ids"]))
            for r in df.select("point_uid", "admin_ids").collect()
        )

    want = canon(attach_admins(pts, admins, strategy="broadcast"))
    # huge budget -> auto takes the broadcast path
    got_b = canon(attach_admins(pts, admins, strategy="auto",
                                broadcast_budget_bytes=1 << 30))
    # tiny budget -> auto takes the partitioned path; answers identical
    got_p = canon(attach_admins(pts, admins, strategy="auto",
                                broadcast_budget_bytes=16))
    assert got_b == want
    assert got_p == want
