"""Cucumber-example parity: the reference's feature-file scenarios
(features/addresses/limousin.feature, admins/limousin.feature,
pois/limousin.feature, acceptance.feature elision cases,
baseline.feature.fr elision outlines) as parametrized
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
        # addresses (label style "{hn} {street} ({city})"); house_number
        # carried as its own field, as the reference addr index does —
        # the T5 gate's multi-word half matches query tokens against it
        ("addr:1", "addr", "14 Place Allègre", "14 Place Allègre (Allassac)", "14", 0.1, 1.476, 45.258),
        ("addr:2", "addr", "1470 Rue du Puy Grasset", "1470 Rue du Puy Grasset (Argentat-sur-Dordogne)", "1470", 0.1, 1.938, 45.093),
        ("addr:3", "addr", "32Bis Avenue du Limousin", "32Bis Avenue du Limousin (Arnac-Pompadour)", "32Bis", 0.1, 1.372, 45.411),
        ("addr:4", "addr", "2 Route du Chastang", "2 Route du Chastang (Argentat-sur-Dordogne)", "2", 0.1, 1.935, 45.09),
        ("addr:5", "addr", "1042 Ruelle Bridaine", "1042 Ruelle Bridaine (Argentat-sur-Dordogne)", "1042", 0.1, 1.936, 45.091),
        # decoys with overlapping tokens
        ("addr:9", "addr", "15 Place Allègre", "15 Place Allègre (Allassac)", "15", 0.1, 1.4761, 45.2581),
        # streets
        ("street:osm:relation:10811956", "street", "Rue de Pont-l'Abbé", "Rue de Pont-l'Abbé (Quimper)", None, 0.2, -4.11, 47.99),
        # admins
        ("admin:creuse", "admin", "Creuse", "Creuse", None, 0.5, 2.0, 46.0),
        ("admin:hv", "admin", "Haute-Vienne", "Haute-Vienne", None, 0.5, 1.25, 45.9),
        ("admin:limoges", "admin", "Limoges", "Limoges", None, 0.45, 1.26, 45.83),
        ("admin:stj", "admin", "Saint-Junien", "Saint-Junien", None, 0.3, 0.9, 45.88),
        ("admin:aubusson", "admin", "Aubusson", "Aubusson", None, 0.25, 2.16, 45.95),
        # poi
        ("poi:osm:node:6923972478", "poi", "Parking", "Parking (Saint-Merd-les-Oussines)", None, 0.2, 2.0703, 45.5973),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, house_number string, "
        "weight double, lon double, lat double",
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


# ---------------------------------------------------------------------------
# round-2 depth: T3 multi-field, T4 minimum_should_match, T7 importance
# (features/idf/baseline.feature + the dsl.rs:284-301 fuzzy cases that
# could not pass with the round-1 single-label scorer)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def idf_places(spark):
    rows = [
        # admins with i18n labels + importance weights (baseline.feature:20-24;
        # labels.{lang} is copy_to'd into full_label so it participates in
        # the matching condition — mimir-dynamic-mappings.json i18n_labels)
        ("admin:osm:relation:7444", "admin", "Paris", None, None, "Paris",
         {"ru": "Париж", "es": "París"}, 0.9, 2.35, 48.85),
        ("admin:osm:relation:8649", "admin", "Île-de-France", None, None, "Île-de-France",
         {}, 0.7, 2.5, 48.7),
        ("admin:osm:relation:87922", "admin", "Saint-Denis", None, None, "Saint-Denis",
         {}, 0.3, 2.36, 48.94),
        # two same-named streets in different cities; one carries an
        # alt_name that repeats the query tokens (T3 ranking signal)
        ("street:osm:way:paix-a", "street", "Rue de la Paix", "rue paix royale", None,
         "Rue de la Paix (Paris)", {}, 0.2, 2.331, 48.869),
        ("street:osm:way:paix-b", "street", "Rue de la Paix", None, None,
         "Rue de la Paix (Pantin)", {}, 0.2, 2.41, 48.89),
        # street with a loc_name
        ("street:osm:way:champs", "street", "Avenue des Champs-Élysées", None,
         "les Champs", "Avenue des Champs-Élysées (Paris)", {}, 0.5, 2.307, 48.87),
        # addr (baseline.feature:34-35) — addr docs always carry their
        # house_number field in the reference index (the T5 gate's
        # multi-word half requires it to match a query token)
        ("addr:2.37715;48.846781:20", "addr", "20 Rue Hector Malot",
         None, None, "20 Rue Hector Malot (Paris)", {}, 0.1, 2.37715, 48.846781, "20"),
        # the dsl.rs:291-292 misspelt-one-word case target
        ("admin:osm:relation:vaureal", "admin", "Vauréal", None, None, "Vauréal",
         {}, 0.2, 2.03, 49.03, None),
    ]
    rows = [r if len(r) == 11 else r + (None,) for r in rows]
    df = spark.createDataFrame(
        rows,
        "id string, type string, name string, alt_name string, loc_name string, "
        "label string, labels map<string,string>, weight double, lon double, lat double, "
        "house_number string",
    )
    return df.cache()


@pytest.mark.parametrize(
    "query,expected",
    [
        ("paris", "admin:osm:relation:7444"),
        ("ile-de-france", "admin:osm:relation:8649"),
        ("saint-denis", "admin:osm:relation:87922"),
    ],
)
def test_idf_admin_exact_match(idf_places, query, expected):
    # baseline.feature "Admins exact match": first result
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _ = autocomplete(idf_places, query, k=1, types=["admin"])
    assert [r["id"] for r in df.collect()] == [expected], query


def test_idf_addr_exact_match(idf_places):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, mode = autocomplete(idf_places, "20 rue Hector Malot", k=1, types=["addr"])
    assert mode == "prefix"
    assert df.collect()[0]["id"] == "addr:2.37715;48.846781:20"


def test_alt_name_boosts_ranking(idf_places):
    # T3 (dsl.rs:86-91): alt_name participates in SCORING (boost 1.8) but
    # never in the matching condition (full_label is label+labels+zips
    # only). Two identically-labeled streets: the one whose alt_name
    # repeats the query tokens must rank first.
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, mode = autocomplete(idf_places, "rue de la paix", k=3, types=["street"])
    got = [r["id"] for r in df.collect()]
    assert mode == "prefix"
    assert got[0] == "street:osm:way:paix-a", got
    assert "street:osm:way:paix-b" in got


def test_loc_name_boosts_ranking(idf_places):
    # T3 (dsl.rs:92-97): loc_name "les Champs" adds score for its tokens
    from mimirsbrunn_spark.functions.geocode import forward_geocode

    df = forward_geocode(idf_places, "avenue des champs", k=3, types=["street"])
    got = [r["id"] for r in df.collect()]
    assert got[:1] == ["street:osm:way:champs"], got


def test_lang_labels_match(idf_places):
    # labels.{lang} is part of full_label (matching) AND of the
    # multi_match label group when lang is set (dsl.rs:98-101): the
    # russian label of Paris matches a russian query
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(idf_places, "Париж", k=1, types=["admin"], lang="ru")
    got = [r["id"] for r in df.collect()]
    assert got == ["admin:osm:relation:7444"], got


def test_fuzzy_misspelt_one_word(idf_places):
    # dsl.rs:284-301: a misspelt one-word request ("Vaureaal" for Vauréal)
    # is caught by the ngram minimum_should_match pass: 6 query 3-grams →
    # 4 required, 4 present in the label's gram set.
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, mode = autocomplete(idf_places, "Vaureaal", k=1, types=["admin"])
    assert mode == "fuzzy"
    assert [r["id"] for r in df.collect()] == ["admin:osm:relation:vaureal"]


def test_fuzzy_very_long_query(idf_places):
    # dsl.rs:293-295: "very long requests" — lots of extra tokens, the
    # 20<25% msm tier still matches the address
    from mimirsbrunn_spark.functions.geocode import autocomplete

    q = "Caisse Primaire Assurance Maladie 20 Rue Hector Malot 75012 Paris France"
    df, mode = autocomplete(idf_places, q, k=3, types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert "addr:2.37715;48.846781:20" in got, (mode, got)


def test_minimum_should_match_tiers():
    # dsl.rs:284-301 "1<-1 3<-2 9<-4 20<25%" and :302-309 "4<-1 7<-25%"
    from mimirsbrunn_spark.functions.geocode import _msm_fuzzy, _msm_search

    assert [_msm_fuzzy(n) for n in (1, 2, 3, 4, 9, 10, 20, 21, 40)] == [
        1, 1, 2, 2, 7, 6, 16, 5, 10]
    # negative "-25%" bounds the MISSING clauses (ES semantics): for
    # n > 7 the requirement is n - floor(0.25n), e.g. 8 → 6, 12 → 9
    assert [_msm_search(n) for n in (1, 4, 5, 7, 8, 12)] == [1, 4, 4, 6, 6, 9]


def test_importance_radius_interpolation():
    # dsl.rs:188-217: no coord → max-radius weights; with coord → weights
    # pulled toward the min-radius prefix set
    from mimirsbrunn_spark.functions.geocode import _zoom_weights

    no_coord = _zoom_weights("prefix", None)
    assert abs(no_coord["admin"] - 0.03) < 1e-9 and abs(no_coord["factor"] - 0.75) < 1e-9
    with_coord = _zoom_weights("prefix", (2.3, 48.8))
    assert 0.03 < with_coord["admin"] <= 0.12
    assert 0.4 <= with_coord["factor"] < 0.75
    fuzzy = _zoom_weights("fuzzy", (2.3, 48.8))
    assert fuzzy["admin"] <= with_coord["admin"]


def test_search_query_type(idf_places):
    # the /search shape (dsl.rs:302-309): fuzziness auto:4,8 + "4<-1 7<-25%"
    from mimirsbrunn_spark.functions.geocode import forward_geocode

    df = forward_geocode(idf_places, "20 rue hektor malot paris", k=3,
                         types=["addr"], query_type="search")
    got = [r["id"] for r in df.collect()]
    assert got[:1] == ["addr:2.37715;48.846781:20"], got


def test_shape_filter_scoped_passthrough(spark):
    # G14 (dsl.rs:425-471): scoped types must intersect the shape,
    # unlisted types pass through; boundary points count as intersecting.
    import numpy as np

    from mimirsbrunn_spark.functions.geocode import shape_filter

    square = [[np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]]
    places = spark.createDataFrame(
        [
            ("poi:in", "poi", 0.5, 0.5),
            ("poi:out", "poi", 2.0, 2.0),
            ("poi:edge", "poi", 0.5, 1.0),     # exactly on the top edge
            ("admin:out", "admin", 2.0, 2.0),  # unlisted type → passes
            ("addr:out", "addr", 5.0, 5.0),
        ],
        "id string, type string, lon double, lat double",
    )
    got = sorted(
        r["id"] for r in shape_filter(places, square, ["poi", "addr"]).collect()
    )
    assert got == ["admin:out", "poi:edge", "poi:in"]


# ---------------------------------------------------------------------------
# features/idf/geocoder-addresses.feature — the three query forms per
# address: "<hn> <street> <city>", "<hn> <street> <zip>", "<hn> <street>"
# at a coord. Each address gets a decoy twin in another city so the city
# token / zip / proximity boost must actually disambiguate.
# ---------------------------------------------------------------------------

_IDF_ADDRS = [
    # (street, hn, zip, city, lon, lat) — from geocoder-addresses.feature
    ("Avenue de l'Opéra", "34", "75002", "Paris", 2.33337, 48.868659),
    ("Rue des Deux Ponts", "19B", "75004", "Paris", 2.356355, 48.851728),
    ("Quai de Montebello", "25", "75005", "Paris", 2.347712, 48.852487),
    ("Rue Servandoni", "7T", "75006", "Paris", 2.334795, 48.850291),
    ("Rue de Bassano", "29", "75008", "Paris", 2.298874, 48.87042),
    ("Rue Blanche", "104", "75009", "Paris", 2.332395, 48.883345),
    ("Rue du Buisson Saint-Louis", "15", "75010", "Paris", 2.3735, 48.872447),
    ("Avenue Daumesnil", "91", "75012", "Paris", 2.379139, 48.845647),
    # r3 additions — more geocoder-addresses.feature rows, including
    # non-Paris cities (the city token is then NOT "Paris") and
    # accents/apostrophes exercising the analyzer
    ("Avenue des Terroirs de France", "54", "75012", "Paris", 2.389139, 48.832148),
    ("Rue de la Santé", "64", "75014", "Paris", 2.341136, 48.830622),
    ("Place Léon Deubel", "3", "75016", "Paris", 2.259248, 48.837899),
    ("Rue Gustave Doré", "7", "75017", "Paris", 2.302565, 48.88648),
    ("Rue de la Goutte d'Or", "57", "75018", "Paris", 2.350989, 48.885028),
    ("Avenue de Saint-Ouen", "80", "75018", "Paris", 2.327333, 48.892222),
    ("Rue du Général Brunet", "10", "75019", "Paris", 2.390874, 48.880406),
    ("Rue des Haies", "100", "75020", "Paris", 2.404295, 48.855644),
    ("Rue du Repos", "4", "75020", "Paris", 2.391937, 48.85815),
    ("Rue de la Belle Marie", "28", "77630", "Barbizon", 2.601323, 48.439768),
    ("Rue du Centre", "3", "77169", "Boissy-le-Châtel", 3.136898, 48.821008),
    ("Rue de la Grenouillère", "11", "77170", "Brie-Comte-Robert", 2.611226, 48.690539),
    ("Rue des Épis d'Or", "58", "77320", "Cerneux", 3.351117, 48.698393),
    ("Rue Jean Moulin", "16", "77420", "Champs-sur-Marne", 2.607726, 48.850439),
]


@pytest.fixture(scope="module")
def idf_addr_places(spark):
    rows = []
    for i, (street, hn, zipc, city, lon, lat) in enumerate(_IDF_ADDRS):
        name = f"{hn} {street}"
        # house_number carried as its own field, as in the reference addr
        # index — the T5 gate's multi-word half matches against it
        rows.append((f"addr:main:{i}", "addr", name, f"{name} ({city})", [zipc], hn, 0.1, lon, lat))
        # decoy twin: same hn+street in Meaux, different zip, ~40 km away
        rows.append((f"addr:meaux:{i}", "addr", name, f"{name} (Meaux)", ["77100"], hn, 0.1, lon + 0.55, lat + 0.08))
    return spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, zip_codes array<string>, "
        "house_number string, weight double, lon double, lat double",
    ).cache()


@pytest.mark.parametrize("idx", range(len(_IDF_ADDRS)))
def test_idf_addr_city_token(idf_addr_places, idx):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    street, hn, _zip, city, _lon, _lat = _IDF_ADDRS[idx]
    df, mode = autocomplete(idf_addr_places, f"{hn} {street} {city}", k=1, types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert got == [f"addr:main:{idx}"], (mode, got)


@pytest.mark.parametrize("idx", range(len(_IDF_ADDRS)))
def test_idf_addr_zip_token(idf_addr_places, idx):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    street, hn, zipc, _city, _lon, _lat = _IDF_ADDRS[idx]
    df, mode = autocomplete(idf_addr_places, f"{hn} {street} {zipc}", k=1, types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert got == [f"addr:main:{idx}"], (mode, got)


@pytest.mark.parametrize("idx", [0, 2, 5, 7, 12, 21])
def test_idf_addr_coord_proximity(idf_addr_places, idx):
    # no city/zip token: both twins pass the matching condition; the
    # T8 proximity boost around the query coord must pick the right one
    from mimirsbrunn_spark.functions.geocode import autocomplete

    street, hn, _zip, _city, lon, lat = _IDF_ADDRS[idx]
    df, _mode = autocomplete(idf_addr_places, f"{hn} {street}", k=2, coord=(lon, lat), types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert got[0] == f"addr:main:{idx}", got


def test_idf_addr_unaccented_query_matches_accented_name(idf_addr_places):
    # geocoder-addresses.feature row "58 Rue des Epis d'Or" — the query
    # is typed WITHOUT the accent, the indexed name carries "Épis": the
    # analyzer's fold must bridge them (T1)
    from mimirsbrunn_spark.functions.geocode import autocomplete

    idx = next(i for i, a in enumerate(_IDF_ADDRS) if "Épis" in a[0])
    df, _mode = autocomplete(idf_addr_places, "58 Rue des Epis d'Or 77320", k=1, types=["addr"])
    got = [r["id"] for r in df.collect()]
    assert got == [f"addr:main:{idx}"], got


# ---------------------------------------------------------------------------
# features/acceptance.feature — the remaining scenario outlines: simple
# street search, INCOMPLETE search ("rue hect", "rue hect mal") and
# abbreviation synonyms ("bd diderot", "av beaumarchais")
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def acceptance_streets(spark):
    rows = [
        ("id3234", "street", "Rue Hector Malot", "Rue Hector Malot (Paris)", 0.3, 2.376, 48.847),
        ("id_bd_diderot", "street", "Boulevard Diderot", "Boulevard Diderot (Paris)", 0.3, 2.373, 48.845),
        ("id_av_beaumarchais", "street", "Avenue Beaumarchais", "Avenue Beaumarchais (Montreuil)", 0.3, 2.44, 48.86),
        # decoys sharing tokens
        ("id_bd_voltaire", "street", "Boulevard Voltaire", "Boulevard Voltaire (Paris)", 0.3, 2.38, 48.86),
        ("id_rue_hector_b", "street", "Rue Hector Berlioz", "Rue Hector Berlioz (Paris)", 0.3, 2.39, 48.89),
        ("id_rue_malte", "street", "Rue de Malte", "Rue de Malte (Paris)", 0.3, 2.366, 48.866),
    ]
    return spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, weight double, lon double, lat double",
    ).cache()


@pytest.mark.parametrize(
    "query,expected,limit",
    [
        ("rue hector malot", "id3234", 3),       # simple street search
        ("rue hect", "id3234", 3),               # incomplete search
        ("rue hect mal", "id3234", 3),           # incomplete, two prefixes
        ("bd diderot", "id_bd_diderot", 3),      # abbreviation bd→boulevard
        ("av beaumarchais", "id_av_beaumarchais", 3),  # av→avenue
    ],
)
def test_acceptance_street_examples(acceptance_streets, query, expected, limit):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(acceptance_streets, query, k=limit, types=["street"])
    got = [r["id"] for r in df.collect()]
    assert expected in got[:limit], f"{query!r} -> {got}"


# ---------------------------------------------------------------------------
# features/baseline.feature.fr — the French baseline template. Its example
# tables ship with EMPTY id/limit columns in the reference (an unfilled
# template), so what's portable is the query *shapes*: the two elision
# outlines ("Recherche avec élision") whose variant sets don't appear in
# any other feature file. "av jeanne d'arc" additionally crosses the
# av→avenue synonym WITH elision in one query — T1's analyzer must apply
# both in the same pass.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def baseline_fr_places(spark):
    rows = [
        ("stop:austerlitz", "stop", "Gare d'Austerlitz", "Gare d'Austerlitz (Paris)", 0.6, 2.366, 48.842),
        ("street:jeanne_darc", "street", "Avenue Jeanne d'Arc", "Avenue Jeanne d'Arc (Paris)", 0.3, 2.364, 48.831),
        # decoys sharing tokens
        ("stop:gare_lyon", "stop", "Gare de Lyon", "Gare de Lyon (Paris)", 0.7, 2.373, 48.844),
        ("street:jeanne", "street", "Rue Jeanne", "Rue Jeanne (Paris)", 0.3, 2.35, 48.85),
    ]
    return spark.createDataFrame(
        rows,
        "id string, type string, name string, label string, weight double, lon double, lat double",
    ).cache()


@pytest.mark.parametrize(
    "query,expected",
    [
        ("gare d'austerlitz", "stop:austerlitz"),
        ("gare dausterlitz", "stop:austerlitz"),
        ("gare d austerlitz", "stop:austerlitz"),
        ("gare austerlitz", "stop:austerlitz"),
        ("av jeanne d'arc", "street:jeanne_darc"),
        ("av jeanne d arc", "street:jeanne_darc"),
        ("av jeanne darc", "street:jeanne_darc"),
        ("av jeanne arc", "street:jeanne_darc"),
    ],
)
def test_baseline_fr_elision_examples(baseline_fr_places, query, expected):
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _mode = autocomplete(baseline_fr_places, query, k=3)
    got = [r["id"] for r in df.collect()]
    assert expected in got[:3], f"{query!r} -> {got}"


def test_stop_search_and_find_by_id(spark):
    # features/stops/limousin.feature: "charles de gaulle" → stop_area:CDG
    # first (stop type boost 18.0); /features find-by-id with name check
    from mimirsbrunn_spark.functions.geocode import autocomplete

    places = spark.createDataFrame(
        [
            ("stop_area:CDG", "stop", "Charles de Gaulle", "Charles de Gaulle (Paris)", 0.7, 2.55, 49.01),
            ("stop_area:GDL", "stop", "Gare de Lyon", "Gare de Lyon (Paris)", 0.8, 2.373, 48.844),
            ("street:cdg", "street", "Avenue Charles de Gaulle", "Avenue Charles de Gaulle (Neuilly)", 0.2, 2.26, 48.88),
            ("admin:paris", "admin", "Paris", "Paris", 0.9, 2.35, 48.85),
        ],
        "id string, type string, name string, label string, weight double, lon double, lat double",
    )
    df, mode = autocomplete(places, "charles de gaulle", k=3, types=["stop"])
    got = [r["id"] for r in df.collect()]
    assert mode == "prefix" and got[0] == "stop_area:CDG", got
    # unrestricted: the stop's 18.0 type boost + stop importance beats the street
    df, _ = autocomplete(places, "charles de gaulle", k=3)
    got = [r["id"] for r in df.collect()]
    assert got[0] == "stop_area:CDG", got
    # T11 find-by-id
    hit = places.filter(F.col("id").isin(["stop_area:GDL"])).collect()
    assert len(hit) == 1 and hit[0]["name"] == "Gare de Lyon"


# ---------------------------------------------------------------------------
# features/idf/baseline.feature — the COMPLETE example table (VERDICT r04
# #6). Background datasets are synthesized as idf_places; each example row
# below is verbatim (query, id) from the feature file.
# ---------------------------------------------------------------------------

BASELINE_FEATURE_EXAMPLES = [
    # Scenario Outline "Admins exact match" (baseline.feature:16-27)
    ("admin", "paris", "admin:osm:relation:7444"),
    ("admin", "ile-de-france", "admin:osm:relation:8649"),
    ("admin", "saint-denis", "admin:osm:relation:87922"),
    # Scenario Outline "Addresses exact match" (baseline.feature:29-36)
    ("addr", "20 rue Hector Malot", "addr:2.37715;48.846781:20"),
]


@pytest.mark.parametrize("dtype,query,expected", BASELINE_FEATURE_EXAMPLES)
def test_idf_baseline_feature_table(idf_places, dtype, query, expected):
    """'When the user searches <datatype> for "<query>" / Then he finds
    "<id>" as the first result' — every example row of baseline.feature."""
    from mimirsbrunn_spark.functions.geocode import autocomplete

    df, _ = autocomplete(idf_places, query, k=1, types=[dtype])
    assert [r["id"] for r in df.collect()] == [expected], (dtype, query)


def test_doc_side_synonyms_canonicalize(spark):
    """The synonym filter runs in the reference's prefix/ngram analyzers
    at BOTH index and search time (mimir-base.json) — a doc labeled with
    an alias must be reachable by the alias query (identical text) AND by
    the canonical form. Before r5 the expansion was query-side only, so
    'bd diderot' could never match a doc tokenized [bd, diderot]."""
    from mimirsbrunn_spark.functions.geocode import forward_geocode

    places = spark.createDataFrame(
        [
            ("street:bd", "street", "Bd Diderot", "Bd Diderot (Paris)", None, 0.3, 2.39, 48.85),
            ("street:av", "street", "Av Mozart", "Av Mozart (Paris)", None, 0.3, 2.27, 48.85),
            ("poi:st", "poi", "St Martin", "St Martin (Paris)", None, 0.2, 2.35, 48.87),
        ],
        "id string, type string, name string, label string, house_number string, "
        "weight double, lon double, lat double",
    )
    # alias query — identical text must match itself
    got = [r["id"] for r in forward_geocode(places, "bd diderot", k=3).collect()]
    assert got[:1] == ["street:bd"], got
    # canonical query reaches the alias-labeled doc
    got = [r["id"] for r in forward_geocode(places, "boulevard diderot", k=3).collect()]
    assert got[:1] == ["street:bd"], got
    # and the other direction: canonical doc text, alias query
    got = [r["id"] for r in forward_geocode(places, "saint martin", k=3).collect()]
    assert got[:1] == ["poi:st"], got


def test_search_msm_rejects_low_overlap(idf_places):
    """dsl.rs:307 '4<-1 7<-25%' with ES negative-percentage semantics:
    an 8-token /search query needs 6 matching words — a doc sharing only
    2 of 8 must NOT pass the T4 gate (the inverted reading admitted it)."""
    from mimirsbrunn_spark.functions.geocode import forward_geocode

    q = "rue hector aaa bbb ccc ddd eee fff"  # 8 tokens, only 2 plausible
    df = forward_geocode(idf_places, q, k=10, query_type="search")
    assert df.count() == 0
