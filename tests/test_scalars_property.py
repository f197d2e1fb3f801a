"""Randomized sweeps for the scalar family (SURVEY §2.8): the W4
natural-sort CONTRACT (same non-digit skeleton ⇒ engine key order ==
numeric order, leading zeros ignored, runs far beyond any fixed pad
width), sort_lines (nulls-last sort_order then natural code), and the
tag-map extractors C2/C7/C8/C9/A3 against dict-comprehension oracles
over adversarial key shapes (prefix near-misses, empty suffixes,
unparseable populations)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.functions.scalars import (
    codes_from_tags,
    country_code_from_codes,
    human_sort_key,
    i18n_labels,
    i18n_names_from_tags,
    population_weight,
    sort_lines,
)

# ---------------------------------------------------------------------------
# W4 — natural sort
# ---------------------------------------------------------------------------

_SKELETONS = ["L{}", "T {} b {}", "{}", "bus {}-{}", "m{}x{}y{}"]


def _fill(rng: random.Random, skel: str) -> tuple[str, tuple[int, ...]]:
    nums = []
    parts = skel.split("{}")
    s = parts[0]
    for p in parts[1:]:
        n = rng.choice([rng.randrange(0, 30), rng.randrange(0, 10**6),
                        rng.randrange(10**15, 10**19)])
        pad = "0" * rng.randrange(0, 3)  # leading zeros must not matter
        s += pad + str(n) + p
        nums.append(n)
    return s, tuple(nums)


@pytest.mark.parametrize("seed", [13, 59])
def test_human_sort_key_numeric_contract(spark, seed):
    rng = random.Random(seed)
    cases = []
    for fam, skel in enumerate(_SKELETONS):
        for _ in range(14):
            s, nums = _fill(rng, skel)
            cases.append({"fam": fam, "s": s, "nums": nums})
    df = spark.createDataFrame(
        [{"fam": c["fam"], "i": i, "s": c["s"]} for i, c in enumerate(cases)]
    )
    keys = {
        r["i"]: r["k"]
        for r in df.select("i", human_sort_key("s").alias("k")).collect()
    }
    by_fam: dict[int, list[int]] = {}
    for i, c in enumerate(cases):
        by_fam.setdefault(c["fam"], []).append(i)
    for fam, idxs in by_fam.items():
        for a in idxs:
            for b in idxs:
                na, nb = cases[a]["nums"], cases[b]["nums"]
                if na == nb:
                    assert keys[a] == keys[b], (cases[a]["s"], cases[b]["s"])
                elif na < nb:
                    assert keys[a] < keys[b], (
                        f"seed {seed}: {cases[a]['s']!r} (nums {na}) must sort "
                        f"before {cases[b]['s']!r} (nums {nb})"
                    )


def test_human_sort_key_unbounded_run_length(spark):
    """Digit runs past ANY fixed pad width keep numeric order: a fixed-width
    length prefix (lpad) silently truncates the length string once runs
    exceed the pad width, making '9'*10000 sort after '1'*10001. The
    two-level length-of-length prefix has no such cap."""
    rows = [
        {"i": 0, "s": "9" * 9999},
        {"i": 1, "s": "9" * 10000},   # length '10000' overflows a 4-wide pad
        {"i": 2, "s": "1" * 10001},   # larger number, longer run
        {"i": 3, "s": "0" * 50 + "9" * 10000},  # leading zeros ignored
        {"i": 4, "s": "stop " + "9" * 10000},
        {"i": 5, "s": "stop " + "1" * 10001},
    ]
    keys = {
        r["i"]: r["k"]
        for r in spark.createDataFrame(rows)
        .select("i", human_sort_key("s").alias("k"))
        .collect()
    }
    assert keys[0] < keys[1] < keys[2]
    assert keys[3] == keys[1]
    assert keys[4] < keys[5]


@pytest.mark.parametrize("seed", [29, 101])
def test_sort_lines_nulls_last_then_natural_code(spark, seed):
    rng = random.Random(seed)
    lines = []
    used = set()
    for i in range(40):
        n = rng.randrange(0, 10**6)
        while n in used:
            n = rng.randrange(0, 10**6)
        used.add(n)
        lines.append(
            {
                "sort_order": rng.choice([None, rng.randrange(0, 50) * 100 + i]),
                "code": "0" * rng.randrange(0, 2) + str(n),
                "name": f"line {i}",
            }
        )
    df = spark.createDataFrame(
        [{"lines": lines}],
        schema="lines array<struct<sort_order:int, code:string, name:string>>",
    )
    got = df.select(sort_lines("lines").alias("x")).collect()[0]["x"]
    expect = sorted(
        lines,
        key=lambda l: (
            l["sort_order"] if l["sort_order"] is not None else 2**60,
            int(l["code"]),
        ),
    )
    assert [(r["sort_order"], r["code"]) for r in got] == [
        (e["sort_order"], e["code"]) for e in expect
    ]


# ---------------------------------------------------------------------------
# C7/C8/C9/A3/C2 — tag-map extractors
# ---------------------------------------------------------------------------

_LANGS = ["fr", "en", "pt-BR"]


def _mk_tags(rng: random.Random) -> dict[str, str]:
    pool = [
        ("ISO3166-1:alpha2", rng.choice(["FR", "NL", "US"])),
        ("ISO3166-2", "FR-IDF"),
        ("ref:INSEE", "75056"),
        ("ref", "plain-ref-no-colon"),
        ("refoo", "near-miss"),
        ("wikidata", "Q90"),
        ("wikidata2", "near-miss"),
        ("name:fr", "Paris"),
        ("name:en", "Paris EN"),
        ("name:pt-BR", "Paris BR"),
        ("name:frx", "near-miss-lang"),
        ("name:", "empty-suffix"),
        ("name", "default"),
        ("population", rng.choice(["12345", " 123 ", "1e3", "abc", "", "-5"])),
        ("foo", "bar"),
    ]
    return dict(rng.sample(pool, rng.randrange(0, len(pool) + 1)))


def _try_float(v: str | None) -> float | None:
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


@pytest.mark.parametrize("seed", [7, 43, 97])
def test_tag_extractors_match_dict_oracles(spark, seed):
    rng = random.Random(seed)
    rows = [{"i": i, "tags": _mk_tags(rng), "ctags": _mk_tags(rng)} for i in range(120)]
    df = spark.createDataFrame(
        rows, schema="i long, tags map<string,string>, ctags map<string,string>"
    )
    out = {
        r["i"]: r.asDict(recursive=True)
        for r in df.select(
            "i",
            codes_from_tags("tags").alias("codes"),
            i18n_names_from_tags("tags", _LANGS).alias("names"),
            country_code_from_codes(codes_from_tags("tags")).alias("cc"),
            population_weight("tags", "ctags").alias("pop"),
        ).collect()
    }
    for row in rows:
        t, ct, g = row["tags"], row["ctags"], out[row["i"]]
        codes = {
            k: v for k, v in t.items()
            if k.startswith("ISO3166") or k.startswith("ref:") or k == "wikidata"
        }
        assert g["codes"] == codes, (row["i"], g["codes"], codes)
        names = {k[5:]: v for k, v in t.items()
                 if k.startswith("name:") and k[5:] in _LANGS}
        assert g["names"] == names, (row["i"], g["names"], names)
        cc = codes.get("ISO3166-1:alpha2")
        assert g["cc"] == (cc.lower() if cc is not None else None)
        pop = _try_float(t.get("population"))
        if pop is None:
            pop = _try_float(ct.get("population"))
        assert g["pop"] == (pop if pop is not None else 0.0), (row["i"], t, ct)


@pytest.mark.parametrize("seed", [5, 71])
def test_i18n_labels_matches_oracle(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(120):
        name = rng.choice(["Gare", "Café 9", "町"])
        names = {
            lang: rng.choice([None, f"{name}-{lang}"]) for lang in rng.sample(_LANGS, rng.randrange(0, 4))
        }
        names = {k: v for k, v in names.items() if v is not None}
        cities = {
            lang: f"city-{lang}" for lang in rng.sample(_LANGS, rng.randrange(0, 4))
        }
        rows.append({"i": i, "name": name, "names": names, "cities": cities})
    df = spark.createDataFrame(
        rows,
        schema="i long, name string, names map<string,string>, cities map<string,string>",
    )
    got = {
        r["i"]: r.asDict(recursive=True)["labels"]
        for r in df.select(
            "i", i18n_labels("name", "names", "cities", _LANGS).alias("labels")
        ).collect()
    }
    for row in rows:
        want = {}
        for lang in _LANGS:
            ln = row["names"].get(lang, row["name"])
            lc = row["cities"].get(lang)
            label = f"{ln} ({lc})" if lc is not None else ln
            if label != row["name"]:
                want[lang] = label
        assert got[row["i"]] == want, (row, got[row["i"]], want)
