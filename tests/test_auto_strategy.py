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


def test_partitioned_accepts_non_string_point_ids(spark):
    """The refine/replay Arrow schemas carry the caller's id dtype (r5
    review): a bigint point id must survive the partitioned path and
    match broadcast, not crash at Arrow conversion."""
    import numpy as np

    from mimirsbrunn_spark.geometry import mp_to_wkb

    sq = np.array([(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0)])
    admins = spark.createDataFrame(
        [
            ("r:c", "country", None, mp_to_wkb([[sq]])),
            ("r:t", "city", "r:c", mp_to_wkb([[sq * 0.4]])),
        ],
        "id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    pts = spark.range(200).select(
        F.col("id").alias("point_uid"),  # LongType id
        ((F.col("id") % 20) * 0.45 - 4.0).alias("lon"),
        ((F.col("id") / 20).cast("int") * 0.9 - 4.0).alias("lat"),
    )
    full = {
        r["point_uid"]: sorted(r["admin_ids"])
        for r in attach_admins(pts, admins, strategy="broadcast").collect()
    }
    part = {
        r["point_uid"]: sorted(r["admin_ids"])
        for r in attach_admins(pts, admins, strategy="partitioned").collect()
    }
    assert full == part and len(full) == 200
    assert any(v for v in full.values())


def test_unknown_zone_type_ranks_after_known_not_keyerror(spark):
    """A zone_type outside the cosmogony enum (malformed dump, future
    variant) must not KeyError inside executors: it ranks after every
    known variant, ties broken by id (r5 review)."""
    from mimirsbrunn_spark.geofinder import zone_rank
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.geometry import mp_to_wkb
    import numpy as np

    assert zone_rank("country_subdivision") > zone_rank("non_administrative")
    assert zone_rank(None) < zone_rank("suburb")

    sq = np.array([(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0)])
    admins = spark.createDataFrame(
        [
            ("u:a", "country_subdivision", None, mp_to_wkb([[sq]])),
            ("u:b", "city", "u:a", mp_to_wkb([[sq * 0.5]])),
        ],
        "id string, zone_type string, parent_id string, boundary_wkb binary",
    )
    pts = spark.createDataFrame(
        [("p1", 0.0, 0.0)], "point_uid string, lon double, lat double"
    )
    for strategy in ("broadcast", "partitioned"):
        got = attach_admins(pts, admins, strategy=strategy).collect()
        # city ranks before the unknown type in the result order
        assert [r["admin_ids"] for r in got] == [["u:b", "u:a"]], strategy


def test_dim_token_sees_late_wkb_edits():
    """_dim_token digests the FULL boundary WKB (r5 review): moving a
    vertex past the first ring coordinates with unchanged length must
    change the token, or a long-lived worker's finder cache would serve
    stale geometry."""
    from mimirsbrunn_spark.operators.pip import _dim_token
    from mimirsbrunn_spark.geometry import mp_to_wkb
    import numpy as np

    ring_a = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 5.0), (0.0, 4.0)])
    ring_b = ring_a.copy()
    ring_b[3] = (2.0, 6.0)  # edit the 4th vertex only (byte offset > 64)
    rows_a = [("x", "city", None, mp_to_wkb([[ring_a]]))]
    rows_b = [("x", "city", None, mp_to_wkb([[ring_b]]))]
    assert len(rows_a[0][3]) == len(rows_b[0][3])
    assert _dim_token(rows_a) != _dim_token(rows_b)
