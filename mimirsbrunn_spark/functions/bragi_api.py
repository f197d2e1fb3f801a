"""bragi request-validation surface (VERDICT r04 #3).

Port of the reference's typed request rejection, re-expressed as plain
Python callables raising typed errors in front of the query functions:

- ``ValidationError`` ≈ ``routes.rs:41 ValidationError`` (a constraint
  named in the error, rejected before any query runs)
- ``InvalidRequestError`` ≈ ``routes.rs: InvalidRequest`` with
  ``CannotDeserialize`` (shape/type of the parameters is wrong, e.g.
  lat present but not a number — what serde_qs rejects before
  ``Validate::filter`` even runs)
- ``validate_forward_query`` ≈ ``ForwardGeocoderQuery::filter``
  (api.rs:191-209) + ``is_valid_zone_type`` (routes.rs:102-113):
  q non-empty; lat⇔lon pairing; lat ∈ [-90, 90]; lon ∈ [-180, 180];
  type 'zone' requires a non-empty zone_type list; proximity
  scale/offset/decay all-or-none (the ``#[serde(flatten)]
  Option<Proximity>`` contract, api.rs:312-322)
- ``validate_reverse_query`` ≈ ``ReverseGeocoderQuery`` (api.rs:215-226):
  lat/lon are REQUIRED f64 (their absence or non-numeric shape is a
  deserialization rejection; the reference adds no further range
  constraint — ``impl Validate for ReverseGeocoderQuery {}``)

Defaults mirror api.rs:14-16: limit 10 (forward), 1 (reverse),
lang "fr". ``limit`` must be a positive integer in both — the reference
passes it to Elasticsearch's ``size`` which 400s on negatives; we
reject at validation with the same typed-error surface instead of at
query time.
"""

from __future__ import annotations

import math

# api.rs:272-286 (Type enum serde renames)
FORWARD_TYPES = frozenset(
    {"house", "poi", "public_transport:stop_area", "street", "zone", "city"}
)
# cosmogony ZoneType (the reference's zone_type values)
ZONE_TYPES = frozenset(
    {
        "suburb", "city_district", "city", "state_district", "state",
        "country_region", "country", "non_administrative",
    }
)

# bragi Type enum → this engine's place `type` column values (the
# reference routes these to ES doc types; ES7 folds city into admin)
TYPE_TO_ENGINE = {
    "house": "addr",
    "poi": "poi",
    "public_transport:stop_area": "stop",
    "street": "street",
    "zone": "admin",
    "city": "admin",
}

DEFAULT_LIMIT_FORWARD = 10  # api.rs DEFAULT_LIMIT_RESULT_ES
DEFAULT_LIMIT_REVERSE = 1  # api.rs DEFAULT_LIMIT_RESULT_REVERSE_API
DEFAULT_LANG = "fr"  # api.rs DEFAULT_LANG


class ValidationError(ValueError):
    """A named-constraint rejection (routes.rs ValidationError): the
    request parsed, but violates a documented constraint."""

    def __init__(self, constraint: str):
        self.constraint = constraint
        super().__init__(constraint)


class InvalidRequestError(ValueError):
    """The request shape is wrong (routes.rs InvalidRequest /
    CannotDeserialize): a parameter is missing or of the wrong type."""


def _ensure(cond: bool, constraint: str) -> None:
    if not cond:
        raise ValidationError(constraint)


def _numeric(v, name: str) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise InvalidRequestError(f"{name} must be a number")
    f = float(v)
    if not math.isfinite(f):
        raise InvalidRequestError(f"{name} must be finite")
    return f


def validate_forward_query(
    q: str,
    lat: float | None = None,
    lon: float | None = None,
    types: list[str] | None = None,
    zone_types: list[str] | None = None,
    limit: int = DEFAULT_LIMIT_FORWARD,
    lang: str = DEFAULT_LANG,
    proximity_scale: float | None = None,
    proximity_offset: float | None = None,
    proximity_decay: float | None = None,
) -> dict:
    """ForwardGeocoderQuery::filter (api.rs:191-209). Returns the
    normalized parameter dict on success; raises ValidationError /
    InvalidRequestError otherwise."""
    if not isinstance(q, str):
        raise InvalidRequestError("q must be a string")
    _ensure(len(q) > 0, "!self.q.is_empty()")
    _ensure(
        (lat is None) == (lon is None),
        "lat and lon parameters must either be both present or both absent",
    )
    if lat is not None:
        lat = _numeric(lat, "lat")
        lon = _numeric(lon, "lon")
        _ensure(-90.0 <= lat <= 90.0, "lat must be in [-90, 90]")
        _ensure(-180.0 <= lon <= 180.0, "lon must be in [-180, 180]")
    if types is not None:
        bad = [t for t in types if t not in FORWARD_TYPES]
        if bad:
            raise InvalidRequestError(f"unknown type {bad[0]!r}")
    if zone_types is not None:
        bad = [z for z in zone_types if z not in ZONE_TYPES]
        if bad:
            raise InvalidRequestError(f"unknown zone_type {bad[0]!r}")
    # routes.rs:102-113 is_valid_zone_type: querying type 'zone' requires
    # a non-empty zone_type list
    _ensure(
        (types is None or all(t != "zone" for t in types))
        or (zone_types is not None and len(zone_types) > 0),
        "'zone_type' must be specified when you query with 'type' parameter 'zone'",
    )
    if isinstance(limit, bool) or not isinstance(limit, int):
        raise InvalidRequestError("limit must be an integer")
    _ensure(limit > 0, "limit must be a positive integer")
    if not isinstance(lang, str) or not lang:
        raise InvalidRequestError("lang must be a non-empty string")
    # the flattened Option<Proximity> (api.rs:312-322): all three custom
    # curve parameters or none
    prox = (proximity_scale, proximity_offset, proximity_decay)
    given = [p for p in prox if p is not None]
    if given and len(given) != 3:
        raise InvalidRequestError(
            "proximity_scale, proximity_offset and proximity_decay must "
            "either all be present or all absent"
        )
    if given:
        proximity_scale = _numeric(proximity_scale, "proximity_scale")
        proximity_offset = _numeric(proximity_offset, "proximity_offset")
        proximity_decay = _numeric(proximity_decay, "proximity_decay")
        _ensure(proximity_scale > 0, "proximity_scale must be positive")
        _ensure(proximity_offset >= 0, "proximity_offset must be non-negative")
        _ensure(0.0 < proximity_decay < 1.0, "proximity_decay must be in (0, 1)")
    return {
        "q": q, "lat": lat, "lon": lon, "types": types,
        "zone_types": zone_types, "limit": limit, "lang": lang,
        "proximity": (proximity_scale, proximity_offset, proximity_decay)
        if given else None,
    }


def validate_reverse_query(
    lat: float, lon: float, limit: int = DEFAULT_LIMIT_REVERSE
) -> dict:
    """ReverseGeocoderQuery (api.rs:215-226): lat and lon are REQUIRED
    numbers (absence = deserialization rejection; the reference adds no
    range constraint beyond that)."""
    if lat is None or lon is None:
        raise InvalidRequestError("lat and lon are required")
    lat = _numeric(lat, "lat")
    lon = _numeric(lon, "lon")
    if isinstance(limit, bool) or not isinstance(limit, int):
        raise InvalidRequestError("limit must be an integer")
    _ensure(limit > 0, "limit must be a positive integer")
    return {"lat": lat, "lon": lon, "limit": limit}


def coord_validity_condition(lat_col: str = "lat", lon_col: str = "lon"):
    """Row-level coordinate validity as a pyspark Column — the batch/
    streaming analog of the per-request lat/lon validation (places/src/
    coord.rs:21-29: lat in [-90, 90], lon in [-180, 180], both present).
    Serving jobs filter on this at the request boundary and count the
    rejects, mirroring the reference's typed 400 per bad request."""
    from pyspark.sql import functions as F

    lat, lon = F.col(lat_col), F.col(lon_col)
    return (
        lat.isNotNull() & lon.isNotNull()
        & ~F.isnan(lat) & ~F.isnan(lon)
        & lat.between(-90.0, 90.0) & lon.between(-180.0, 180.0)
    )
