"""Adversarial sweep of the CSV/JSONL source readers (S3/S4) — the
user-malformed-input surface (bano.rs:44-53, openaddresses.rs:41-52,
addr_reader.rs:73-157 drop-and-log semantics).

Two layers:
- a randomized python-csv ↔ Spark round-trip: rows written with the
  stdlib ``csv`` module (QUOTE_MINIMAL — fields with embedded commas get
  quoted exactly like the reference's csv crate writes them) must come
  back value-exact, with the documented drops (empty/whitespace street,
  non-finite-coord) and nothing else;
- targeted nasties: wrong column counts, non-numeric coords, gz
  transparency, recursive directory walk, unicode, blank lines.

Out of scope by documented dialect choice: quoted fields containing
literal newlines (the Rust csv crate accepts them; Spark's splittable
line-based reader requires multiLine=true, which forces whole-file
parses — unacceptable at 100 TB, and address sources do not produce
them) and literal double-quote characters inside fields (escape-dialect
differences between writers)."""

from __future__ import annotations

import csv
import gzip
import random

import pytest

from mimirsbrunn_spark.sources.readers import (
    read_bano_csv,
    read_cosmogony_jsonl,
    read_openaddresses_csv,
)

_STREET_POOL = [
    "Rue Hector Malot",
    "Place de l'Église",
    "Avenue du 8 Mai, 1945",  # embedded comma → csv-quoted
    "østergade",
    "улица Ленина",
    "祇園町南側",
    "  Main St  ",  # inner padding survives (only EMPTY/whitespace-only drops)
    "",  # dropped
    "   ",  # whitespace-only → dropped
]
_CITY_POOL = ["Paris", "PARIS, 12E", "", "León", "大阪"]


def _bano_rows(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": f"75112_{i:04d}",
                "house_number": rng.choice(["10", "10 bis", "", "7T"]),
                "street": rng.choice(_STREET_POOL),
                "zip": rng.choice(["75012", "", "AB-12"]),
                "city": rng.choice(_CITY_POOL),
                "src": "OSM",
                "lat": round(rng.uniform(-90, 90), 6),
                "lon": round(rng.uniform(-180, 180), 6),
            }
        )
    return rows


@pytest.mark.parametrize("seed", [3, 47])
def test_bano_roundtrip_python_csv_writer(spark, tmp_path, seed):
    """Every row the stdlib csv module writes must come back value-exact,
    minus exactly the empty-street drops — a quoting/locale/float-format
    divergence between writer and reader shows up as a value diff."""
    rng = random.Random(seed)
    rows = _bano_rows(rng, 60)
    src = tmp_path / "bano" / "part.csv"
    src.parent.mkdir()
    with open(src, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)  # QUOTE_MINIMAL: commas in fields get quoted
        for r in rows:
            w.writerow(
                [r["id"], r["house_number"], r["street"], r["zip"], r["city"],
                 r["src"], repr(r["lat"]), repr(r["lon"])]
            )
    got = {r["id"]: r for r in read_bano_csv(spark, str(tmp_path / "bano")).collect()}
    expected = {r["id"]: r for r in rows if r["street"].strip()}
    assert set(got) == set(expected), f"seed {seed}: survivor set diverged"
    for k, e in expected.items():
        g = got[k]
        assert g["street"] == e["street"], f"seed {seed} {k}: street mangled"
        assert g["city"] == (e["city"] or None)  # Spark csv: empty string → null
        assert (g["lat"], g["lon"]) == (e["lat"], e["lon"]), f"seed {seed} {k}: coords"
        assert g["house_number"] == (e["house_number"] or None)


def test_bano_malformed_shapes_drop_not_crash(spark, tmp_path):
    d = tmp_path / "bano"
    nested = d / "sub" / "deep"
    nested.mkdir(parents=True)
    (d / "a.csv").write_text(
        "ok-1,10,Rue A,75012,Paris,OSM,48.8,2.3\n"
        "short,row\n"  # too few columns → dropped
        "long-1,10,Rue B,75012,Paris,OSM,48.8,2.3,EXTRA,COLS\n"  # too many → dropped
        "bad-lat,10,Rue C,75012,Paris,OSM,not-a-number,2.3\n"  # unparsable double → dropped
        "\n"  # blank line → ignored
        'q-1,10,"Avenue, quoted",75012,"PARIS, 12E",OSM,45.2,1.4\n'
    )
    # gz transparency + recursive walk: a nested gz member must be read
    with gzip.open(nested / "b.csv.gz", "wt", encoding="utf-8") as f:
        f.write("gz-1,12,祇園町,605,京都,OSM,35.0,135.77\n")
    got = {r["id"]: r for r in read_bano_csv(spark, str(d)).collect()}
    assert set(got) == {"ok-1", "q-1", "gz-1"}
    assert got["q-1"]["street"] == "Avenue, quoted"
    assert got["q-1"]["city"] == "PARIS, 12E"
    assert got["gz-1"]["street"] == "祇園町"


@pytest.mark.parametrize("seed", [19])
def test_openaddresses_roundtrip_and_coord_gate(spark, tmp_path, seed):
    """Headered OA: rows with unparsable/missing coords drop via try_cast
    (not a job abort — ANSI would throw on a plain cast), survivors map
    onto the BANO-shaped schema value-exact with src pinned to OA."""
    rng = random.Random(seed)
    src = tmp_path / "oa" / "x.csv"
    src.parent.mkdir()
    header = ["LON", "LAT", "NUMBER", "STREET", "UNIT", "CITY",
              "DISTRICT", "REGION", "POSTCODE", "ID", "HASH"]
    rows, expected = [], {}
    for i in range(40):
        rid = f"oa-{i}"
        street = rng.choice(_STREET_POOL)
        bad_coord = rng.random() < 0.25
        lon = "garbage" if bad_coord else repr(round(rng.uniform(-180, 180), 6))
        lat = repr(round(rng.uniform(-90, 90), 6))
        rows.append([lon, lat, str(i), street, "", rng.choice(_CITY_POOL),
                     "", "", "75012", rid, "h"])
        if not bad_coord and street.strip():
            expected[rid] = (street, float(lon), float(lat))
    with open(src, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    got = {r["id"]: r for r in read_openaddresses_csv(spark, str(tmp_path / "oa")).collect()}
    assert set(got) == set(expected), f"seed {seed}: OA survivor set diverged"
    for rid, (street, lon, lat) in expected.items():
        g = got[rid]
        assert (g["street"], g["lon"], g["lat"], g["src"]) == (street, lon, lat, "OA")


def test_cosmogony_jsonl_drops_corrupt_lines(spark, tmp_path):
    src = tmp_path / "zones.jsonl"
    src.write_text(
        '{"id": "z1", "name": "Paris"}\n'
        "{not json at all\n"
        '{"id": "z2", "name": "Lyon"}\n'
        '{"id": "z3", "name": "broken\n'  # unterminated string → dropped
    )
    got = read_cosmogony_jsonl(spark, str(src)).select("id", "name").collect()
    assert sorted((r["id"], r["name"]) for r in got if r["id"] is not None) == [
        ("z1", "Paris"),
        ("z2", "Lyon"),
    ]
