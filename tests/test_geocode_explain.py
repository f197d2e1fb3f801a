"""/autocomplete-explain port (handlers.rs:307-345, T10).

The reference builds the PREFIX DSL for q and asks ES to _explain the
score against one (doc_id, doc_type). Here every DSL clause is already
a column, so explain selects them — these tests pin:

- score identity: explain.score == forward_geocode.score bit-for-bit
  for the same document (same expression tree via _score_terms)
- the matched flag folds the T4 matching condition, T5 house-number
  gate, and G14 shape scope
- the validation surface (typed errors before any Spark work)
- a missing document explains to zero rows (the reference 404s)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.functions.bragi_api import ValidationError
from mimirsbrunn_spark.functions.geocode import (
    forward_geocode,
    forward_geocode_explain,
)

EXPLAIN_COLS = [
    "id", "type", "label", "matched",
    "match_score", "type_boost", "importance", "proximity", "score",
]


@pytest.fixture(scope="module")
def places(spark):
    rows = [
        ("addr:1", "addr", "14 Place Allègre", "14 Place Allègre (Allassac)", "14", 0.1, 1.476, 45.258),
        ("street:1", "street", "Rue du Puy Grasset", "Rue du Puy Grasset (Argentat)", None, 0.3, 1.938, 45.093),
        ("admin:1", "admin", "Allassac", "Allassac", None, 0.6, 1.476, 45.258),
        ("poi:1", "poi", "Gare d'Allassac", "Gare d'Allassac (Allassac)", None, 0.2, 1.477, 45.259),
    ]
    return spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, house_number string, "
        "weight double, lon double, lat double",
    )


def test_explain_score_matches_autocomplete(spark, places):
    q = "14 place allegre"
    top = {
        r["id"]: (r["match_score"], r["score"])
        for r in forward_geocode(places, q, k=10).collect()
    }
    assert "addr:1" in top
    ex = forward_geocode_explain(places, q, "addr:1", "addr").collect()
    assert len(ex) == 1
    row = ex[0].asDict()
    assert list(ex[0].asDict()) == EXPLAIN_COLS
    assert row["matched"] is True
    # bit-identical: both sides evaluate the same expression tree
    assert row["match_score"] == top["addr:1"][0]
    assert row["score"] == top["addr:1"][1]
    # additive decomposition holds exactly as floats sum left-to-right
    assert row["score"] == pytest.approx(
        row["match_score"] + row["type_boost"] + row["importance"] + row["proximity"]
    )
    assert row["proximity"] == 0.0  # no coord given


def test_explain_with_coord_adds_proximity(spark, places):
    row = forward_geocode_explain(
        places, "14 place allegre", "addr:1", "addr", coord=(1.476, 45.258)
    ).collect()[0]
    assert row["proximity"] > 0.0
    top = {r["id"]: r["score"] for r in
           forward_geocode(places, "14 place allegre", k=10, coord=(1.476, 45.258)).collect()}
    assert row["score"] == top["addr:1"]


def test_explain_unmatched_doc_still_returns_row(spark, places):
    # street:1 shares no token with the query → matched False, terms present
    row = forward_geocode_explain(places, "place allegre", "street:1", "street").collect()[0]
    assert row["matched"] is False
    assert row["type_boost"] > 0.0  # clause values still explained


def test_explain_house_number_gate(spark, places):
    # T5: single-token query never matches an addr — even a token its
    # label contains
    row = forward_geocode_explain(places, "allegre", "addr:1", "addr").collect()[0]
    assert row["matched"] is False
    # the same single token against a non-addr doc can match
    row2 = forward_geocode_explain(places, "allassac", "admin:1", "admin").collect()[0]
    assert row2["matched"] is True


def test_explain_shape_scope(spark, places):
    # square around Allassac; poi is scoped and inside → matched;
    # moving the square away → matched False via the shape clause
    import numpy as np

    near = [[np.array([[1.3, 45.1], [1.6, 45.1], [1.6, 45.4], [1.3, 45.4]])]]
    far = [[np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]])]]
    q = "gare allassac"
    inside = forward_geocode_explain(places, q, "poi:1", "poi", shape=(near, ["poi"])).collect()[0]
    outside = forward_geocode_explain(places, q, "poi:1", "poi", shape=(far, ["poi"])).collect()[0]
    assert inside["matched"] is True
    assert outside["matched"] is False
    # unscoped types pass through regardless (dsl.rs:425-471)
    admin_far = forward_geocode_explain(
        places, "allassac", "admin:1", "admin", shape=(far, ["poi"])
    ).collect()[0]
    assert admin_far["matched"] is True


def test_explain_missing_doc_zero_rows(spark, places):
    assert forward_geocode_explain(places, "place allegre", "addr:999", "addr").count() == 0


def test_explain_null_label_matched_is_false_not_null(spark):
    # a NULL label makes the matching condition SQL-NULL; /autocomplete
    # filters that row out, so explain must say false — never null
    places = spark.createDataFrame(
        [("poi:n", "poi", None, None, 0.2, 1.0, 45.0)],
        "id string, type string, name string, label string, weight double, lon double, lat double",
    )
    row = forward_geocode_explain(places, "any query", "poi:n", "poi").collect()[0]
    assert row["matched"] is False


@pytest.mark.parametrize("kwargs,err", [
    (dict(q="", doc_id="addr:1", doc_type="addr"), ValidationError),
    (dict(q="   ", doc_id="addr:1", doc_type="addr"), ValidationError),
    (dict(q="place", doc_id="", doc_type="addr"), ValidationError),
    (dict(q="place", doc_id="addr:1", doc_type=""), ValidationError),
])
def test_explain_validation(spark, places, kwargs, err):
    with pytest.raises(err):
        forward_geocode_explain(places, **kwargs)
