"""Randomized sweep of the POI pipeline's F2 first-match rule engine +
naming/postcode/label/id block (poi.rs:134-147,214-223) against a pure-
Python oracle, over tag maps the unit vectors never produce: multiple
keys matching different rules at once (first rule in config order must
win), near-miss values, absent names, and explicit addr:postcode
overrides — driven through the REAL pois_pipeline (PIP attach included)
over the gate's closed-form rect admin dim so every expected zip/label
is computable without touching the engine's own geometry."""

from __future__ import annotations

import random

import pytest

from mimirsbrunn_spark.gate import _CITY_H, _CITY_W, rect_admins_df
from mimirsbrunn_spark.operators.places import DEFAULT_POI_RULES, pois_pipeline


def _mk_pois(rng: random.Random, n: int = 200) -> list[dict]:
    rows = []
    for r in range(n):
        tags: dict[str, str] = {}
        # 0-3 rule pairs in random order (dict insertion order is NOT
        # rule order — the engine must apply config order regardless)
        for key, value, _tid, _tn in rng.sample(DEFAULT_POI_RULES, rng.randrange(0, 4)):
            tags[key] = value
        if rng.random() < 0.3:  # near-miss: rule key, unknown value
            tags[rng.choice(["amenity", "leisure"])] = "nonsense"
        if rng.random() < 0.5:
            tags["name"] = rng.choice(["Café de la Gare", "公園", "P1", ""])
        if rng.random() < 0.4:
            tags["addr:postcode"] = str(rng.randrange(10000, 99999))
        if rng.random() < 0.3:
            tags["foo"] = "bar"
        i, j = rng.randrange(32), rng.randrange(16)
        u, v = rng.choice([0.1, 0.5, 0.9]), rng.choice([0.1, 0.5, 0.9])
        rows.append(
            {
                "osm_id": str(r),
                "kind": rng.choice(["node", "way", "relation", "navitia"]),
                "tags": tags,
                "lon": -180.0 + (i + u) * _CITY_W,
                "lat": -90.0 + (j + v) * _CITY_H,
                "_ij": (i, j),
            }
        )
    return rows


def _oracle(row: dict) -> dict | None:
    tags = row["tags"]
    match = next(
        ((tid, tname) for key, value, tid, tname in DEFAULT_POI_RULES
         if tags.get(key) == value),
        None,
    )
    if match is None:
        return None  # dropped: not a POI
    tid, tname = match
    # name fallback — note F.coalesce keeps an EMPTY string name
    name = tags["name"] if "name" in tags else tname
    i, j = row["_ij"]
    if "addr:postcode" in tags:
        zips = [tags["addr:postcode"]]
    elif (i + j) % 3 != 0:  # city zips (level 8) beat state zips (level 4)
        zips = [str(20000 + i * 16 + j)]
    else:
        zips = [str(30000 + (i // 4) * 4 + (j // 4))]
    label = f"{name} (city {i}_{j})"
    if row["kind"] == "navitia":
        pid = f"poi:navitia:{row['osm_id']}"
    else:
        pid = f"poi:osm:{row['kind']}:{row['osm_id']}"
    return {
        "poi_type_id": tid, "poi_type_name": tname, "name": name,
        "zips": zips, "label": label, "poi_id": pid,
    }


@pytest.mark.parametrize("seed", [11, 47, 83])
def test_pois_pipeline_matches_python_oracle(spark, seed):
    rows = _mk_pois(random.Random(seed))
    df = spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "_ij"} for r in rows],
        schema="osm_id string, kind string, tags map<string,string>, "
               "lon double, lat double",
    )
    out = {
        r["osm_id"]: r.asDict(recursive=True)
        for r in pois_pipeline(df, rect_admins_df(spark)).select(
            "osm_id", "poi_type", "name", "zip_codes", "label", "poi_id"
        ).collect()
    }
    expected = {r["osm_id"]: _oracle(r) for r in rows}
    kept = {k for k, v in expected.items() if v is not None}
    assert set(out) == kept, f"seed {seed}: classified set mismatch"
    for k in kept:
        want, g = expected[k], out[k]
        assert g["poi_type"]["id"] == want["poi_type_id"], (k, g, want)
        assert g["poi_type"]["name"] == want["poi_type_name"]
        assert g["name"] == want["name"], (k, g["name"], want["name"])
        assert g["zip_codes"] == want["zips"], (k, g["zip_codes"], want["zips"])
        assert g["label"] == want["label"]
        assert g["poi_id"] == want["poi_id"]
