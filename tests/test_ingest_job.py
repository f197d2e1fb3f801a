"""The *2mimir job family (jobs/ingest_places.py + sources/cosmogony.py).

One consistent world — a city square inside a state square inside a
country — is ingested through every source binary the reference ships
(cosmogony2mimir, bano2mimir, openaddresses2mimir, osm2mimir,
ntfs2mimir, poi2mimir), in the reference's operational order, each
publishing a lake generation; the assertions pin Zone::into_admin
semantics (admin.rs:124-211) and the cross-source joins (PIP attach,
G8 nearest-address).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def _zone(idx, osm_id, level, ztype, name, parent, square, tags=None, center=None,
          intl=None):
    x0, y0, x1, y1 = square
    z = {
        "id": idx, "osm_id": osm_id, "admin_level": level, "zone_type": ztype,
        "name": name, "label": f"{name} (label)", "parent": parent,
        "tags": tags or {},
        "boundary": {
            "type": "MultiPolygon",
            "coordinates": [[[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]],
        },
    }
    if center is not None:
        z["center"] = {"type": "Point", "coordinates": list(center)}
    if intl is not None:
        z["international_labels"] = intl
    return z


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    zones = [
        _zone(0, "relation:100", 8, "city", "Ville-Test", 1, (1.0, 45.0, 2.0, 46.0),
              tags={"ref:INSEE": "19005", "addr:postcode": "19240;19130",
                    "population": "1000000", "name:en": "Testville",
                    "name:de": "Teststadt", "wikidata": "Q1"},
              center=(1.5, 45.5),
              intl={"en": "Testville (en)", "de": "nope"}),
        _zone(1, "relation:200", 6, "state", "Etat-Test", 2, (0.0, 44.0, 3.0, 47.0)),
        _zone(2, "relation:300", 2, "country", "Pays-Test", None, (-5.0, 40.0, 10.0, 52.0),
              tags={"ISO3166-1:alpha2": "FR", "population": "70000000"}),
    ]
    lines = [json.dumps(z) for z in zones] + ['{"broken']
    (d / "zones.jsonl").write_text("\n".join(lines) + "\n")

    (d / "bano").mkdir()
    # id,house_number,street,zip,city,src,lat,lon (lat BEFORE lon)
    (d / "bano" / "a.csv").write_text(
        "190050000A0001,14,Rue des Vignes,,Ville-Test,bano,45.5,1.5\n"
        "190050000B0002,2,Rue du Marche,19999,Ville-Test,bano,45.6,1.6\n"
        "190050000C0003,9,,,,bano,45.5,1.5\n"  # empty street -> dropped
    )

    (d / "oa").mkdir()
    (d / "oa" / "oa.csv").write_text(
        "LON,LAT,NUMBER,STREET,UNIT,CITY,DISTRICT,REGION,POSTCODE,ID,HASH\n"
        "1.7,45.7,5,Chemin Vert,,Ville-Test,,,19240,af83e0b9-cafe,h1\n"
    )

    (d / "poi").mkdir()
    (d / "poi" / "poi.txt").write_text(
        "poi_id;poi_type_id;poi_name;poi_lat;poi_lon\n"
        "P:1;amenity:townhall;Mairie;45.5;1.5\n"
    )
    (d / "poi" / "poi_type.txt").write_text(
        "poi_type_id;poi_type_name\namenity:townhall;town hall\n"
    )
    return d


def _run(src, inp, lake, *extra):
    import jobs.ingest_places as job

    job.main(["--source", src, "--input", str(inp), "--lake", str(lake), *extra])


def test_ingest_chain(spark, world, tmp_path_factory):
    from mimirsbrunn_spark.geometry import wkb_to_mp
    from mimirsbrunn_spark.sources import read_published

    lake = tmp_path_factory.mktemp("lake")

    # bano before cosmogony → the reference's ordering error, typed
    with pytest.raises(SystemExit):
        _run("bano", world / "bano", lake)

    # ---- cosmogony2mimir ----------------------------------------------
    _run("cosmogony", world / "zones.jsonl", lake)
    admins = {r["id"]: r for r in read_published(spark, str(lake), "admins").collect()}
    assert set(admins) == {"admin:fr:19005", "admin:osm:relation:200",
                           "admin:osm:relation:300"}
    city = admins["admin:fr:19005"]  # C6 retro-compat: city with INSEE
    assert city["insee"] == "19005" and city["level"] == 8
    assert city["parent_id"] == "admin:osm:relation:200"
    assert city["zip_codes"] == ["19130", "19240"]  # ';'-split sorted (C5)
    assert city["weight"] == pytest.approx(1e6 / 1.4e9)  # A2/A3
    assert city["coord"]["lon"] == 1.5 and city["coord"]["lat"] == 45.5
    assert (city["bbox"]["minx"], city["bbox"]["maxy"]) == (1.0, 46.0)
    assert dict(city["names"]) == {"en": "Testville"}  # C8, lang-filtered
    assert dict(city["labels"]) == {"en": "Testville (en)"}  # lang-filtered
    assert city["codes"]["wikidata"] == "Q1"
    mp = wkb_to_mp(bytes(city["boundary_wkb"]))
    assert mp[0][0][:, 0].min() == 1.0 and mp[0][0][:, 1].max() == 46.0
    country = admins["admin:osm:relation:300"]
    assert country["country_codes"] == ["fr"]  # C9
    assert country["parent_id"] is None
    # state: no center in the stream -> centroid fallback
    state = admins["admin:osm:relation:200"]
    assert state["coord"]["lon"] == pytest.approx(1.5)

    # ---- bano2mimir ----------------------------------------------------
    _run("bano", world / "bano", lake)
    addrs = {r["id"]: r for r in read_published(spark, str(lake), "addresses_fr").collect()}
    assert len(addrs) == 2  # empty-street row dropped (F4)
    a1 = addrs["190050000A0001"]
    assert a1["name"] == "14 Rue des Vignes"          # C3 fr: hn-first
    assert a1["label"] == "14 Rue des Vignes (Ville-Test)"  # C1
    assert a1["zip_codes"] == ["19130", "19240"]      # A1 fold from city
    assert a1["insee"] == "19005" and a1["fantoir"] == "190050000A"  # F6
    assert a1["addr_id"] == "addr:1.5;45.5:14"        # C6
    a2 = addrs["190050000B0002"]
    assert a2["zip_codes"] == ["19999"]               # own zip wins (C5)
    assert a1["weight"] == pytest.approx(1e6 / 1.4e9)  # A4 city weight

    # ---- openaddresses2mimir (distinct dataset; partitioned PIP) -------
    _run("openaddresses", world / "oa", lake,
         "--dataset", "oa", "--id-precision", "7",
         "--pip-strategy", "partitioned")
    oa = read_published(spark, str(lake), "addresses_oa").collect()
    assert len(oa) == 1
    assert oa[0]["insee"] is None and oa[0]["fantoir"] is None  # no F6 for OA
    assert oa[0]["addr_id"] == "addr:1.7000000;45.7000000:5"    # C6 fixed-point
    # both datasets coexist (munin_addr_{dataset} under one alias)
    import jobs.ingest_places as jobmod

    assert jobmod.read_all_addresses(spark, str(lake)).count() == 3

    # ---- osm2mimir (streets, pre-converted parquet) --------------------
    from mimirsbrunn_spark.schemas import STREETS_RAW

    rows = [
        (1, "way", "Rue des Vignes", "residential", None,
         [{"lon": 1.5, "lat": 45.5}, {"lon": 1.51, "lat": 45.5}]),
        (2, "way", "Rue des Vignes", "residential", None,
         [{"lon": 1.52, "lat": 45.5}]),      # same name+city -> merged (W1)
        (3, "way", "Rue du Bus", "bus_stop", None,
         [{"lon": 1.5, "lat": 45.5}]),       # F1 exclusion
    ]
    streets_raw = tmp_path_factory.mktemp("osm") / "streets.parquet"
    spark.createDataFrame(rows, STREETS_RAW).write.parquet(str(streets_raw))
    _run("osm", streets_raw, lake)
    streets = read_published(spark, str(lake), "streets").collect()
    assert len(streets) == 1
    assert streets[0]["street_id"] == "street:osm:way:1"  # min id wins (W1)
    assert streets[0]["city_id"] == "admin:fr:19005"

    # ---- ntfs2mimir ----------------------------------------------------
    from tests.test_pipeline_ops import _write_ntfs_fixture

    ntfs = tmp_path_factory.mktemp("ntfs")
    _write_ntfs_fixture(ntfs)
    _run("ntfs", ntfs, lake)
    stops = {r["stop_area_id"]: r for r in
             read_published(spark, str(lake), "stops").collect()}
    assert set(stops) == {"SA:1", "SA:2"}
    # fixture stops sit inside the city square -> label carries the city
    assert stops["SA:1"]["label"].endswith("(Ville-Test)")

    # ---- poi2mimir (after addresses -> G8 nearest join) ----------------
    _run("poi", world / "poi", lake)
    pois = read_published(spark, str(lake), "pois").collect()
    assert len(pois) == 1
    assert pois[0]["poi_id"] == "poi:navitia:P:1"
    assert pois[0]["nearest_addr_id"] == "addr:1.5;45.5:14"
    assert pois[0]["label"] == "Mairie (Ville-Test)"


def test_query_and_ctl_cli(spark, world, tmp_path_factory, capsys):
    """src/bin/query.rs + ctlmimir.rs over the lake: the union view from
    published tables, T1-T9 autocomplete from the CLI, GeocodeJSON out,
    template install + config/status echo."""
    import jobs.ctl as ctl
    import jobs.ingest_places  # noqa: F401  (registers sys.path)
    import jobs.query as q

    lake = tmp_path_factory.mktemp("qlake")
    _run("cosmogony", world / "zones.jsonl", lake)
    _run("bano", world / "bano", lake)
    capsys.readouterr()  # drain the ingest report lines

    # line output: the BANO address ranks first for its own street query
    # (the union view carries the C6 addr_id as the place id)
    q.main(["14 rue des vignes", "--lake", str(lake)])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t")[1:4] == [
        "addr", "addr:1.5;45.5:14", "14 Rue des Vignes (Ville-Test)"
    ]

    # GeocodeJSON FeatureCollection (C10) — rich columns survive the
    # union, so the Feature carries admins/citycode/housenumber
    q.main(["14 rue des vignes", "--lake", str(lake), "--json"])
    body = json.loads(capsys.readouterr().out)
    assert body["type"] == "FeatureCollection"
    assert body["geocoding"]["query"] == "14 rue des vignes"
    props = body["features"][0]["properties"]["geocoding"]
    assert props["id"] == "addr:1.5;45.5:14"
    assert props["housenumber"] == "14"
    assert props["citycode"] == "19005"
    assert props["city"] == "Ville-Test"
    assert [a["id"] for a in props["administrative_regions"]] == [
        "admin:fr:19005", "admin:osm:relation:200", "admin:osm:relation:300"
    ]

    # --lang reaches the i18n labels through the union (T3 labels.{lang})
    q.main(["testville", "--lake", str(lake), "--type", "admin", "--lang", "en"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out and out[0].split("\t")[2] == "admin:fr:19005"

    # typed rejections exit non-zero BEFORE any Spark work
    with pytest.raises(SystemExit):
        q.main(["x", "--lake", str(lake), "--lat", "45.0"])  # lone lat
    with pytest.raises(SystemExit):
        q.main(["x", "--lake", str(lake), "--type", "house"])  # unknown type

    # ctl: config echo, template install (no Iceberg jar → DDL persisted
    # with the lake), status green
    ctl.main(["config", "--lake", str(lake)])
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["tables"] == ["admins", "docs"]
    ctl.main(["run", "--lake", str(lake)])
    res = json.loads(capsys.readouterr().out)
    assert res["applied"] == [] and len(res["written"]) == 2
    ddl = (lake / "_templates" / "docs.sql").read_text()
    assert "USING iceberg" in ddl and "bucket(256, doc_id)" in ddl
    ctl.main(["status", "--lake", str(lake)])
    status = json.loads(capsys.readouterr().out)
    assert status["elasticsearch"]["health"] == "green"


def test_zones_without_boundary_or_id_are_handled(spark, tmp_path):
    from mimirsbrunn_spark.sources.cosmogony import ZONES_SCHEMA, zones_to_admins
    from mimirsbrunn_spark.sources.readers import read_cosmogony_jsonl

    lines = [
        json.dumps({"id": 0, "osm_id": "relation:1", "zone_type": "city",
                    "name": "NoShape"}),          # no boundary, no center
        json.dumps({"osm_id": "relation:2", "name": "NoId"}),  # dropped
    ]
    (tmp_path / "z.jsonl").write_text("\n".join(lines) + "\n")
    out = zones_to_admins(
        read_cosmogony_jsonl(spark, str(tmp_path / "z.jsonl"), schema=ZONES_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == "admin:osm:relation:1"
    assert r["boundary_wkb"] is None and r["bbox"] is None and r["coord"] is None
    assert r["level"] == 0 and r["insee"] == ""
    assert r["label"] == "NoShape"  # label falls back to name
