"""Randomized sweep of the address-enrichment block (C1/C3/C5/C6/F6 +
A1/A4 + attach_admin_structs resolution) against a test-local pure-
Python oracle, over input shapes the `addr_enrich` gate's closed-form
generator never produces: null/empty/whitespace-only house numbers,
unicode street names, zip strings with empty segments, unknown and
duplicated admin ids, admins with null names/levels/weights/zip arrays,
uppercase and unknown country codes, and \\x0B-bearing house numbers
(the addr-id charset is the reference's exact [ \\t\\r\\n], NOT regex
\\s — a vertical tab must SURVIVE into the id, bano.rs:130-137).

The oracle reimplements the reference semantics (labels.rs:8-20,75-124;
admin.rs:85-101; street.rs:74-133; bano.rs:56-137) directly over Python
rows — independent of every Column expression under test.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimirsbrunn_spark.operators.enrich import (
    HN_FIRST_COUNTRIES,
    attach_admin_structs,
    dedup_streets,
    enrich_addresses,
    format_zip_label,
)

# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

_STREETS = [
    None, "", "Rue de l'Église", "østergade", "улица Ленина", "祇園町",
    "Main St", "Herengracht", "rue du 8 mai 1945",
]
_HNS = [
    None, "", "  ", "12", " 12 ", "1\tb/2", "3;x.y:z/w", "12\x0bbis",
    "²³ bis", "7 ter",
]
_ZIPS = [None, "", ";", "75001", ";;75003;;", "a;Z;0", "9;9;9"]
_CCS = [None, "fr", "FR", "nl", "US", "gb", "zz", "Ca", ""]
_IDS = [None, "", "0750112345AB", "00000", "abc", "123456789012345"]


def _mk_admins(rng: random.Random, n: int = 25) -> list[dict]:
    out = []
    for i in range(n):
        zt = rng.choice([None, "city", "city", "state", "country", "suburb"])
        zc_shape = rng.random()
        if zc_shape < 0.25:
            zc = None
        elif zc_shape < 0.45:
            zc = []
        else:
            zc = [
                "".join(rng.choice("AB0123456789") for _ in range(rng.randrange(1, 6)))
                for _ in range(rng.randrange(1, 4))
            ]
        out.append(
            {
                "id": f"A{i}",
                "name": rng.choice([None, f"nm {i}", f"Ville-{i}", f"町{i}"]),
                "level": rng.choice([None, rng.randrange(2, 11)]),
                "zone_type": zt,
                "zip_codes": zc,
                "weight": rng.choice([None, 0.0, rng.random()]),
            }
        )
    return out


def _mk_rows(rng: random.Random, admin_ids: list[str], n: int = 220) -> list[dict]:
    rows = []
    for r in range(n):
        n_att = rng.randrange(0, 7)
        att = [
            rng.choice(admin_ids) if rng.random() < 0.85 else f"UNKNOWN{rng.randrange(5)}"
            for _ in range(n_att)
        ]
        rows.append(
            {
                "row_id": r,
                "id": rng.choice(_IDS + ["".join(rng.choice("0123456789") for _ in range(rng.randrange(1, 15)))]),
                "house_number": rng.choice(_HNS),
                "street": rng.choice(_STREETS),
                "zip": rng.choice(_ZIPS),
                "cc": rng.choice(_CCS),
                "lon": rng.randint(-180_000_000, 180_000_000) / 1e6,
                "lat": rng.randint(-90_000_000, 90_000_000) / 1e6,
                "admin_ids": att,
            }
        )
    return rows


# ---------------------------------------------------------------------------
# pure-Python oracle (reference semantics, independent of the Columns)
# ---------------------------------------------------------------------------


def _oracle(row: dict, dim: dict[str, dict]) -> dict:
    admins = [dim[a] for a in row["admin_ids"] if a in dim]
    city = next((a for a in admins if a["zone_type"] == "city"), None)

    # C3 name: Spark trim() strips ONLY U+0020, not \t/\x0b
    hn, st, cc = row["house_number"], row["street"], row["cc"]
    trimmed = hn.strip(" ") if hn is not None else None
    if hn is None or trimmed == "":
        name = st
    else:
        first = cc is not None and cc.lower() in HN_FIRST_COUNTRIES
        parts = [trimmed, st] if first else [st, trimmed]
        name = " ".join(p for p in parts if p is not None)

    # C1 label: F.concat is null if ANY argument is null
    if city is not None:
        label = None if (name is None or city["name"] is None) else f"{name} ({city['name']})"
    else:
        label = name

    # C5 own zips (split ';', drop empties, sort) else A1 fold
    own = None
    if row["zip"] is not None:
        own = sorted(p for p in row["zip"].split(";") if p != "")
    if own:
        zips = own
    else:
        with_zips = [a for a in admins if a["zip_codes"]]
        if not with_zips:
            zips = []
        else:
            levels = [a["level"] for a in with_zips if a["level"] is not None]
            mx = max(levels) if levels else None
            zips = [z for a in with_zips if a["level"] == mx and mx is not None
                    for z in a["zip_codes"]]

    # A4 weight
    weight = city["weight"] if city is not None else 0.0

    # F6 insee/fantoir
    rid = row["id"]
    insee = re.sub(r"^0+", "", rid[:5]) if rid is not None else None
    fantoir = rid[:10] if rid is not None else None

    # C6 addr id (precision 6; exact [ \t\r\n] strip — \x0b SURVIVES)
    if hn is None:
        addr = None
    else:
        cleaned = re.sub(r"[/.:;]", "-", re.sub(r"[ \t\r\n]+", "", hn))
        addr = f"addr:{row['lon']:.6f};{row['lat']:.6f}:{cleaned}"

    # C4 zip label over the final zips
    if not zips:
        zl = ""
    elif len(zips) == 1:
        zl = f" ({zips[0]})"
    else:
        zl = f" ({zips[0]}-{zips[-1]})"

    return {
        "name": name, "label": label, "zips_csv": ",".join(zips),
        "weight": weight, "insee": insee, "fantoir": fantoir,
        "addr_id": addr, "zip_label": zl,
    }


_ADMIN_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("level", T.IntegerType(), True),
    T.StructField("zone_type", T.StringType(), True),
    T.StructField("zip_codes", T.ArrayType(T.StringType()), True),
    T.StructField("weight", T.DoubleType(), True),
])

_ROW_SCHEMA = T.StructType([
    T.StructField("row_id", T.LongType(), False),
    T.StructField("id", T.StringType(), True),
    T.StructField("house_number", T.StringType(), True),
    T.StructField("street", T.StringType(), True),
    T.StructField("zip", T.StringType(), True),
    T.StructField("cc", T.StringType(), True),
    T.StructField("lon", T.DoubleType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("admin_ids", T.ArrayType(T.StringType()), False),
])


@pytest.mark.parametrize("seed", [7, 23, 61, 131])
def test_enrich_matches_python_oracle(spark, seed):
    rng = random.Random(seed)
    admins = _mk_admins(rng)
    rows = _mk_rows(rng, [a["id"] for a in admins])
    dim = {a["id"]: a for a in admins}

    adf = spark.createDataFrame(admins, schema=_ADMIN_SCHEMA)
    rdf = spark.createDataFrame(rows, schema=_ROW_SCHEMA)
    out = enrich_addresses(
        attach_admin_structs(rdf, adf), country_code=F.col("cc"), id_precision=6
    ).select(
        "row_id", "name", "label",
        F.concat_ws(",", "zip_codes").alias("zips_csv"),
        "weight", "insee", "fantoir", "addr_id",
        format_zip_label("zip_codes").alias("zip_label"),
    )
    got = {r["row_id"]: r.asDict() for r in out.collect()}
    assert len(got) == len(rows)
    for row in rows:
        want = _oracle(row, dim)
        g = got[row["row_id"]]
        for k, v in want.items():
            assert g[k] == v, (
                f"seed {seed} row {row['row_id']} field {k}: engine={g[k]!r} "
                f"oracle={v!r} input={row!r}"
            )


def test_attach_structs_duplicate_identical_rows(spark):
    """Exact duplicate input rows share the content uid by construction —
    each copy must still come back, with identical resolved admins."""
    rng = random.Random(5)
    admins = _mk_admins(rng, n=8)
    adf = spark.createDataFrame(admins, schema=_ADMIN_SCHEMA)
    dup = {
        "row_id": 0, "id": "x", "house_number": "1", "street": "s",
        "zip": None, "cc": "fr", "lon": 1.0, "lat": 2.0,
        "admin_ids": ["A1", "A3", "A1"],
    }
    rdf = spark.createDataFrame([dup, dict(dup), dict(dup)], schema=_ROW_SCHEMA)
    out = attach_admin_structs(rdf, adf).select(
        F.transform("admins", lambda a: a["id"]).alias("ids")
    ).collect()
    assert len(out) == 3
    assert all(r["ids"] == ["A1", "A3", "A1"] for r in out)


# ---------------------------------------------------------------------------
# W1/W2 street dedup sweep
# ---------------------------------------------------------------------------


def _streets(rng: random.Random, n: int = 150) -> list[dict]:
    names = [f"S{i}" for i in range(12)]
    cities = [f"c{i}" for i in range(8)]
    orders = list(range(n))
    rng.shuffle(orders)
    return [
        {
            # id keyed by name ONLY so cross-city collisions (the W2
            # suffix case) occur while (id, city) stays unique post-dedup
            "street_id": f"s:{nm}", "name": nm, "city_id": ct,
            "ingest_order": orders[i],
        }
        for i, (nm, ct) in enumerate(
            (rng.choice(names), rng.choice(cities)) for _ in range(n)
        )
    ]


def _dedup_oracle(rows: list[dict]) -> set[tuple]:
    best: dict[tuple, dict] = {}
    for r in rows:
        k = (r["name"], r["city_id"])
        if k not in best or r["ingest_order"] < best[k]["ingest_order"]:
            best[k] = r
    by_id: dict[str, list[dict]] = {}
    for r in best.values():
        by_id.setdefault(r["street_id"], []).append(r)
    out = set()
    for sid, grp in by_id.items():
        grp.sort(key=lambda r: r["city_id"])
        for i, r in enumerate(grp):
            final = f"{sid}-{i}" if len(grp) > 1 else sid
            out.add((final, r["name"], r["city_id"], r["ingest_order"]))
    return out


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_dedup_streets_matches_oracle(spark, seed):
    rows = _streets(random.Random(seed))
    df = spark.createDataFrame(rows)
    got = {
        (r["street_id"], r["name"], r["city_id"], r["ingest_order"])
        for r in dedup_streets(df).collect()
    }
    assert got == _dedup_oracle(rows)
