"""bragi request-validation parity (VERDICT r04 #3): each rejection the
reference's ForwardGeocoderQuery::filter / is_valid_zone_type /
ReverseGeocoderQuery deserialization produces has a typed-error
equivalent here, and every valid combination passes through."""

from __future__ import annotations

import pytest

from mimirsbrunn_spark.functions.bragi_api import (
    DEFAULT_LANG,
    DEFAULT_LIMIT_FORWARD,
    DEFAULT_LIMIT_REVERSE,
    TYPE_TO_ENGINE,
    InvalidRequestError,
    ValidationError,
    validate_forward_query,
    validate_reverse_query,
)


# --- forward: the reference's ensure! rejection vectors (api.rs:191-209) ---

REJECT_FORWARD = [
    # (kwargs, expected constraint fragment)
    (dict(q=""), "q.is_empty"),
    (dict(q="paris", lat=48.8), "both present or both absent"),
    (dict(q="paris", lon=2.3), "both present or both absent"),
    (dict(q="paris", lat=90.5, lon=2.3), "lat must be in [-90, 90]"),
    (dict(q="paris", lat=-91.0, lon=2.3), "lat must be in [-90, 90]"),
    (dict(q="paris", lat=48.8, lon=180.5), "lon must be in [-180, 180]"),
    (dict(q="paris", lat=48.8, lon=-200.0), "lon must be in [-180, 180]"),
    # routes.rs:102-113 zone/zone_type coupling
    (dict(q="paris", types=["zone"]), "'zone_type' must be specified"),
    (dict(q="paris", types=["zone"], zone_types=[]), "'zone_type' must be specified"),
    (dict(q="paris", limit=0), "positive integer"),
    (dict(q="paris", limit=-3), "positive integer"),
]


@pytest.mark.parametrize("kwargs,frag", REJECT_FORWARD)
def test_forward_rejections(kwargs, frag):
    with pytest.raises(ValidationError) as e:
        validate_forward_query(**kwargs)
    assert frag in str(e.value)


BAD_SHAPE_FORWARD = [
    dict(q=None),
    dict(q="paris", lat="abc", lon=2.3),
    dict(q="paris", lat=float("nan"), lon=2.3),
    dict(q="paris", types=["castle"]),
    dict(q="paris", zone_types=["galaxy"]),
    dict(q="paris", limit=2.5),
    dict(q="paris", limit=True),
    dict(q="paris", lang=""),
    # flattened Option<Proximity>: all three or none (api.rs:312-322)
    dict(q="paris", proximity_scale=1000.0),
    dict(q="paris", proximity_scale=1000.0, proximity_offset=10.0),
]


@pytest.mark.parametrize("kwargs", BAD_SHAPE_FORWARD)
def test_forward_deserialization_rejections(kwargs):
    with pytest.raises(InvalidRequestError):
        validate_forward_query(**kwargs)


ACCEPT_FORWARD = [
    dict(q="paris"),
    dict(q="paris", lat=48.8, lon=2.3),
    dict(q="paris", lat=-90.0, lon=180.0),  # inclusive bounds
    dict(q="paris", types=["street", "poi"]),
    dict(q="paris", types=["zone"], zone_types=["city"]),
    dict(q="paris", zone_types=["city", "state"]),  # zone_types without zone ok
    dict(q="paris", limit=1),
    dict(q="paris", lang="en"),
    dict(q="paris", proximity_scale=65000.0, proximity_offset=10000.0,
         proximity_decay=0.5),
]


@pytest.mark.parametrize("kwargs", ACCEPT_FORWARD)
def test_forward_accepts(kwargs):
    out = validate_forward_query(**kwargs)
    assert out["q"] == kwargs["q"]
    assert out["limit"] == kwargs.get("limit", DEFAULT_LIMIT_FORWARD)
    assert out["lang"] == kwargs.get("lang", DEFAULT_LANG)


# --- reverse (api.rs:215-226) ----------------------------------------------


def test_reverse_requires_lat_lon():
    for kw in (dict(lat=None, lon=2.3), dict(lat=48.8, lon=None),
               dict(lat=None, lon=None)):
        with pytest.raises(InvalidRequestError):
            validate_reverse_query(**kw)
    with pytest.raises(InvalidRequestError):
        validate_reverse_query(lat="x", lon=2.3)
    with pytest.raises(ValidationError):
        validate_reverse_query(lat=48.8, lon=2.3, limit=0)
    out = validate_reverse_query(lat=48.8, lon=2.3)
    assert out == {"lat": 48.8, "lon": 2.3, "limit": DEFAULT_LIMIT_REVERSE}
    # the reference adds NO range constraint on reverse lat/lon
    # (impl Validate for ReverseGeocoderQuery {}) — parity means we
    # accept out-of-range here too
    assert validate_reverse_query(lat=99.0, lon=250.0)["lat"] == 99.0


def test_type_mapping_covers_the_enum():
    assert set(TYPE_TO_ENGINE) == {
        "house", "poi", "public_transport:stop_area", "street", "zone", "city"
    }
    assert set(TYPE_TO_ENGINE.values()) <= {"addr", "poi", "stop", "street", "admin"}


# --- endpoints actually guarded (geocode.py) -------------------------------


def test_autocomplete_rejects_before_query(spark):
    from mimirsbrunn_spark.functions.geocode import autocomplete
    from mimirsbrunn_spark.gate_geocode import geocode_places_df

    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    with pytest.raises(ValidationError):
        autocomplete(places, "")
    with pytest.raises(ValidationError):
        autocomplete(places, "rue", coord=(2.3, 91.0))
    with pytest.raises(ValidationError):
        autocomplete(places, "rue", k=0)
    # a valid call still runs end-to-end
    df, mode = autocomplete(places, "rue", k=3)
    assert mode in ("prefix", "fuzzy") and df.count() > 0


def test_reverse_endpoint_rejects_before_query(spark):
    from mimirsbrunn_spark.functions.geocode import reverse_geocode_endpoint
    from mimirsbrunn_spark.gate_geocode import geocode_places_df

    places = geocode_places_df(spark, "/root/testdata/sf0.001")
    with pytest.raises(InvalidRequestError):
        reverse_geocode_endpoint(places, None, 48.8)
    with pytest.raises(InvalidRequestError):
        reverse_geocode_endpoint(places, "oops", 48.8)
    with pytest.raises(ValidationError):
        reverse_geocode_endpoint(places, 2.3, 48.8, k=0)
    with pytest.raises(InvalidRequestError):
        reverse_geocode_endpoint(places, 2.3, 48.8, radius_m=-5.0)
