"""Forward-geocode gate extras beyond the auto-parametrized oracle rows
(test_gate_oracle covers geocode_prefix/fuzzy/search): the T5 single-word
address gate, the T9 prefix->fuzzy retry, and the cross-engine list
semantics the oracle generator relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.functions.geocode import autocomplete, forward_geocode
from mimirsbrunn_spark.gate_geocode import (
    PLACES_SQL,
    geocode_oracle_sql,
    geocode_places_df,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def places(spark):
    return geocode_places_df(spark, SF).cache()


def test_places_matches_sql(spark, places):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    a = places.toPandas().sort_values("id").reset_index(drop=True)
    b = con.execute(PLACES_SQL).df().sort_values("id").reset_index(drop=True)
    assert a.shape == b.shape
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for x, y in zip(av, bv):
            if isinstance(x, float):
                assert x == y or (x != x and y != y), (c, x, y)
            else:
                assert (x is None and y is None) or x == y, (c, x, y)


def test_single_token_excludes_addresses(spark, places):
    """T5 — dsl.rs:219-263, BOTH halves: a one-word query never returns
    addr docs; a multi-word query returns an addr only when its
    house_number matches a query token."""
    out = forward_geocode(places, "marche", k=50, query_type="prefix")
    types = {r["type"] for r in out.select("type").collect()}
    assert types and "addr" not in types
    # pick an addr whose number is '75' — the token also prefix-matches
    # every '750xx' zip, so the matching condition can't mask the gate
    addr = places.filter(
        (F.col("type") == "addr") & (F.col("house_number") == "75")
    ).orderBy("id").first()
    assert addr is not None, "fixture must contain an addr with hn 75"
    tok = addr["label"].split()[0]
    out2 = forward_geocode(places, f"{tok} 75", k=500, query_type="prefix")
    hns = {r["house_number"] for r in out2.filter(F.col("type") == "addr").collect()}
    assert "75" in hns, "the matching-number addr must pass the gate"
    assert hns == {"75"}, f"addrs with other numbers must be excluded, got {hns}"
    # multi-word query with NO number token: no addr can pass
    out3 = forward_geocode(places, f"{tok} ville", k=500, query_type="prefix")
    assert out3.filter(F.col("type") == "addr").count() == 0


def test_oracle_single_token_gate_matches(spark):
    """The oracle generator applies the same addr exclusion."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    sql = geocode_oracle_sql("marche", "prefix", k=50)
    got = con.execute(sql).df()
    assert len(got) > 0 and not (got["type"] == "addr").any()
    spark_out = forward_geocode(
        geocode_places_df(spark, SF), "marche", k=50, query_type="prefix"
    )
    assert spark_out.count() == len(got)


def test_autocomplete_retry_falls_back_to_fuzzy(spark, places):
    """T9 — handlers.rs:144-169: PREFIX finds nothing for a misspelling;
    the retry runs FUZZY and does."""
    df, mode = autocomplete(places, "egliz pont", k=10)
    assert mode == "fuzzy"
    assert df.count() > 0
    # a clean query resolves on the strict pass
    df2, mode2 = autocomplete(places, "St-Martin", k=10)
    assert mode2 == "prefix" and df2.count() > 0


def test_duckdb_list_semantics_match_spark(spark):
    """The two list primitives the oracle leans on: distinct-intersect
    counting and null-array propagation behave identically."""
    con = duckdb.connect()
    n_duck = con.execute(
        "SELECT len(list_intersect(['abc','bcd'], ['bcd','bcd','abc','xyz']))"
    ).fetchone()[0]
    n_spark = spark.sql(
        "SELECT size(array_intersect(array('abc','bcd'), array('bcd','bcd','abc','xyz')))"
    ).collect()[0][0]
    assert n_duck == n_spark == 2
    null_duck = con.execute(
        "SELECT CAST(list_contains(CAST(NULL AS VARCHAR[]), 'a') AS DOUBLE)"
    ).fetchone()[0]
    null_spark = spark.sql(
        "SELECT CAST(array_contains(CAST(NULL AS ARRAY<STRING>), 'a') AS DOUBLE)"
    ).collect()[0][0]
    assert null_duck is None and null_spark is None
