"""Randomized sweep of `zones_to_admins` (cosmogony2mimir's
Zone::into_admin, admin.rs:124-211) against a pure-Python oracle.

The scalars it composes (admin_id, split_zip_codes, population_weight,
codes/i18n extraction) are individually gate- or sweep-covered; this
sweep targets the COMPOSITION over zone shapes the ingest-job fixture
never produces: dangling / self / null parent links, the retro-compat
id taken by the PARENT join (a city parent must resolve to its
admin:fr id, not admin:osm), degenerate one-element centers (must fall
back to the boundary centroid), boundary-less and empty-boundary
zones, 3D GeoJSON positions, zones invalidated by null id/osm_id (and
their effect as parents), unparseable populations falling through to
center_tags, and multilingual name/label filtering.

Centroid VALUES are pinned by the geometry suites; here the oracle
calls the same `mp_centroid` on the python side — what this sweep
checks is the fallback WIRING (which rows get center vs centroid vs
null), not the shoelace arithmetic."""

from __future__ import annotations

import random

import numpy as np
import pytest

from mimirsbrunn_spark.geometry import mp_centroid
from mimirsbrunn_spark.sources.cosmogony import ZONES_SCHEMA, zones_to_admins

_NAMES = ["Paris", "Île-de-France", "León", "大阪市", ""]


def _square(rng: random.Random, three_d: bool):
    x0, y0 = rng.uniform(-170, 170), rng.uniform(-80, 80)
    w = rng.uniform(0.1, 2.0)
    ring = [
        [x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w], [x0, y0]
    ]
    if three_d:
        ring = [p + [rng.uniform(0, 100)] for p in ring]
    return [[ring]]


def _mk_zone(rng: random.Random, i: int, n: int) -> dict:
    tags = {}
    if rng.random() < 0.5:
        tags["ref:INSEE"] = f"{rng.randrange(1, 99):02d}{rng.randrange(999):03d}"
    if rng.random() < 0.4:
        tags["addr:postcode"] = rng.choice(["75012", "75012;75013;;75001", ";"])
    elif rng.random() < 0.3:
        tags["postal_code"] = "19240;19000"
    if rng.random() < 0.5:
        tags["population"] = rng.choice(["2145906", "not-a-number", "1e9", ""])
    if rng.random() < 0.3:
        tags["ISO3166-1:alpha2"] = rng.choice(["FR", "ES"])
    if rng.random() < 0.4:
        tags["name:fr"] = "nom-fr"
        tags["name:de"] = "nicht-gefiltert"  # not in langs → excluded
    center_tags = {"population": "52000"} if rng.random() < 0.3 else {}
    center = None
    r = rng.random()
    if r < 0.4:
        center = {"type": "Point",
                  "coordinates": [rng.uniform(-180, 180), rng.uniform(-90, 90)]}
    elif r < 0.5:
        center = {"type": "Point", "coordinates": [1.5]}  # degenerate: <2 elems
    boundary = None
    rb = rng.random()
    if rb < 0.55:
        boundary = {"type": "MultiPolygon",
                    "coordinates": _square(rng, three_d=rng.random() < 0.3)}
    elif rb < 0.65:
        boundary = {"type": "MultiPolygon", "coordinates": []}  # empty → no geom
    parent = rng.choice([None, i, rng.randrange(n), n + 50])  # self / valid / dangling
    return {
        "id": None if rng.random() < 0.06 else i,
        "osm_id": None if rng.random() < 0.06 else f"relation:{i}",
        "admin_level": rng.choice([None, 2, 4, 8]),
        "zone_type": rng.choice([None, "city", "state_district", "country"]),
        "name": rng.choice(_NAMES),
        "label": rng.choice([None, f"label-{i}"]),
        "parent": parent,
        "tags": tags,
        "center_tags": center_tags,
        "international_labels": (
            {"fr": "lib-fr", "pt": "lib-pt"} if rng.random() < 0.4 else None
        ),
        "center": center,
        "boundary": boundary,
    }


def _oracle_admin_id(z: dict, retro: bool) -> str:
    insee = z["tags"].get("ref:INSEE")
    if retro and z["zone_type"] == "city" and insee:
        return f"admin:fr:{insee}"
    return f"admin:osm:{z['osm_id']}"


def _oracle_weight(z: dict) -> float:
    def parse(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None
    pop = parse(z["tags"].get("population"))
    if pop is None:
        pop = parse(z["center_tags"].get("population"))
    if pop is None:
        pop = 0.0
    return min(max(pop / 1.4e9, 0.0), 1.0)


def _oracle_coord(z: dict):
    c = z["center"]
    if c is not None and c["coordinates"] is not None and len(c["coordinates"]) >= 2:
        return (c["coordinates"][0], c["coordinates"][1])
    b = z["boundary"]
    if b is not None and b["coordinates"]:
        mp = [
            [np.asarray([p[:2] for p in ring], dtype=np.float64) for ring in poly]
            for poly in b["coordinates"]
        ]
        lon, lat = mp_centroid(mp)
        return (float(lon), float(lat))
    return None


@pytest.mark.parametrize("seed,retro", [(23, True), (101, True), (167, False)])
def test_zones_to_admins_matches_into_admin_replay(spark, seed, retro):
    rng = random.Random(seed)
    n = 70
    zs = [_mk_zone(rng, i, n) for i in range(n)]
    zones = spark.createDataFrame(zs, ZONES_SCHEMA)
    out = zones_to_admins(zones, langs=("fr", "en"),
                          french_id_retrocompatibility=retro).collect()

    valid = {z["id"]: z for z in zs if z["id"] is not None and z["osm_id"] is not None}
    got = {}
    for r in out:
        got[r["id"]] = r
    assert len(out) == len(valid) == len(got), f"seed {seed}: row count / id dupes"

    for zid, z in valid.items():
        r = got[_oracle_admin_id(z, retro)]
        assert r["insee"] == z["tags"].get("ref:INSEE", ""), f"seed {seed} zone {zid}"
        assert r["level"] == (z["admin_level"] or 0)
        assert r["label"] == (z["label"] or z["name"])
        zraw = z["tags"].get("addr:postcode") or z["tags"].get("postal_code") or ""
        assert r["zip_codes"] == sorted(p for p in zraw.split(";") if p), (
            f"seed {seed} zone {zid}: zip_codes"
        )
        assert r["weight"] == pytest.approx(_oracle_weight(z)), f"seed {seed} zone {zid}"
        # parent resolution: the broadcast self-join must hand back the
        # PARENT's formatted id (retro-compat insee form for city parents),
        # null for dangling/null parents and parents invalidated upstream
        p = z["parent"]
        want_parent = (
            _oracle_admin_id(valid[p], retro) if p in valid else None
        )
        assert r["parent_id"] == want_parent, (
            f"seed {seed} zone {zid}: parent {p} -> {r['parent_id']!r}"
        )
        want_coord = _oracle_coord(z)
        if want_coord is None:
            assert r["coord"] is None, f"seed {seed} zone {zid}: coord should be null"
        else:
            assert r["coord"] is not None, f"seed {seed} zone {zid}: coord missing"
            assert (r["coord"]["lon"], r["coord"]["lat"]) == pytest.approx(want_coord)
        # bbox present iff a non-empty boundary crossed the Arrow stage
        has_geom = z["boundary"] is not None and bool(z["boundary"]["coordinates"])
        assert (r["bbox"] is not None) == has_geom
        assert (r["boundary_wkb"] is not None) == has_geom
        # i18n filtering: langs allowlist applied to names and labels
        if "name:fr" in z["tags"]:
            assert r["names"].get("fr") == "nom-fr" and "de" not in r["names"]
        if z["international_labels"]:
            assert r["labels"] == {"fr": "lib-fr"}
        iso = z["tags"].get("ISO3166-1:alpha2")
        assert r["country_codes"] == ([iso.lower()] if iso else [])
