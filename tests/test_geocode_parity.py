"""Cucumber-example parity: the reference's feature-file scenarios
(features/addresses/limousin.feature, admins/limousin.feature,
pois/limousin.feature, acceptance.feature elision cases) as parametrized
pytest over a synthetic places table carrying the same labels.

What's asserted is the *query semantics* — exact match, alias (synonym +
prefix), elision, zone-type filtering, top-k position — not the Limousin
data itself (the reference's fixture extracts are not shipped)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def limousin_places(spark):
    rows = [
        # addresses (label style "{hn} {street} ({city})")
        ("addr:1", "addr", "14 Place Allègre", "14 Place Allègre (Allassac)", 0.1, 1.476, 45.258),
        ("addr:2", "addr", "1470 Rue du Puy Grasset", "1470 Rue du Puy Grasset (Argentat-sur-Dordogne)", 0.1, 1.938, 45.093),
        ("addr:3", "addr", "32Bis Avenue du Limousin", "32Bis Avenue du Limousin (Arnac-Pompadour)", 0.1, 1.372, 45.411),
        ("addr:4", "addr", "2 Route du Chastang", "2 Route du Chastang (Argentat-sur-Dordogne)", 0.1, 1.935, 45.09),
        ("addr:5", "addr", "1042 Ruelle Bridaine", "1042 Ruelle Bridaine (Argentat-sur-Dordogne)", 0.1, 1.936, 45.091),
        # decoys with overlapping tokens
        ("addr:9", "addr", "15 Place Allègre", "15 Place Allègre (Allassac)", 0.1, 1.4761, 45.2581),
        # streets
        ("street:osm:relation:10811956", "street", "Rue de Pont-l'Abbé", "Rue de Pont-l'Abbé (Quimper)", 0.2, -4.11, 47.99),
        # admins
        ("admin:creuse", "admin", "Creuse", "Creuse", 0.5, 2.0, 46.0),
        ("admin:hv", "admin", "Haute-Vienne", "Haute-Vienne", 0.5, 1.25, 45.9),
        ("admin:limoges", "admin", "Limoges", "Limoges", 0.45, 1.26, 45.83),
        ("admin:stj", "admin", "Saint-Junien", "Saint-Junien", 0.3, 0.9, 45.88),
        ("admin:aubusson", "admin", "Aubusson", "Aubusson", 0.25, 2.16, 45.95),
        # poi
        ("poi:osm:node:6923972478", "poi", "Parking", "Parking (Saint-Merd-les-Oussines)", 0.2, 2.0703, 45.5973),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, weight double, lon double, lat double",
    )
    df = df.withColumn("zone_type", F.when(F.col("id").isin("admin:creuse", "admin:hv"), "state_district")
                       .when(F.col("type") == "admin", "city"))
    return df.cache()


# features/addresses/limousin.feature — exact match + aliases
@pytest.mark.parametrize(
    "query,expected,limit",
    [
        ("14 Place Allègre, Allassac", "addr:1", 1),
        ("Rue du Puy Grasset 1470", "addr:2", 1),
        ("32BIS Avenue du Limousin", "addr:3", 1),
        ("14 p Allègre, Allassac", "addr:1", 1),       # prefix alias
        ("1470 r du Puy Grasset", "addr:2", 1),        # prefix alias
        ("32BIS av du Limousin", "addr:3", 1),         # prefix alias
        ("2 rte du chastang", "addr:4", 1),            # synonym rte→route
        ("1042 rle bridaine", "addr:5", 1),            # synonym rle→ruelle
    ],
)
def test_address_examples(limousin_places, query, expected, limit):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(limousin_places, query, k=limit, types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert expected in got[:limit], f"{query!r} -> {got}"


# features/acceptance.feature — elision variants all hit the same street
@pytest.mark.parametrize(
    "query",
    [
        "rue de pont-l'abbé quimper",
        "rue de pont l abbé quimper",
        "rue de pont labbé quimper",
        "rue de pont abbé quimper",
    ],
)
def test_elision_examples(limousin_places, query):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(limousin_places, query, k=3, types=["street"])
    got = [r["id"] for r in df.collect()]
    assert "street:osm:relation:10811956" in got[:3], f"{query!r} -> {got}"


# features/admins/limousin.feature — exact match + zone_type filtering
@pytest.mark.parametrize(
    "query,expected,zone_types",
    [
        ("Creuse", "admin:creuse", None),
        ("Haute-Vienne", "admin:hv", None),
        ("Limoges", "admin:limoges", None),
        ("Saint-Junien", "admin:stj", None),
        ("Aubusson", "admin:aubusson", ["city"]),
        ("Haute-Vienne", "admin:hv", ["state_district"]),
    ],
)
def test_admin_examples(limousin_places, query, expected, zone_types):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    places = limousin_places
    if zone_types:
        places = places.filter(F.col("zone_type").isin(zone_types))
    df, _mode = autocomplete(places, query, k=1, types=["admin"])
    got = [r["id"] for r in df.collect()]
    assert got[:1] == [expected], f"{query!r} -> {got}"


def test_poi_example_with_location(limousin_places):
    # pois/limousin.feature: "parking saint merd" → the Parking near
    # 45.5973, 2.0703 in the first 5
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(limousin_places, "parking saint merd", k=5, types=["poi"])
    got = df.collect()
    assert any(r["id"] == "poi:osm:node:6923972478" for r in got)
    hit = [r for r in got if r["id"] == "poi:osm:node:6923972478"][0]
    assert abs(hit["lat"] - 45.5973) < 1e-6 and abs(hit["lon"] - 2.0703) < 1e-6


def test_get_by_id(limousin_places):
    # pois/limousin.feature /features endpoint: fetch by id (T11)
    hit = limousin_places.filter(
        F.col("id").isin(["poi:osm:node:6923972478"])
    ).collect()
    assert len(hit) == 1 and hit[0]["name"] == "Parking"
