"""Randomized cross-engine property check for the geocode oracle
generator: for a deterministic corpus of query shapes (vocab words,
synonyms, accents, elision, punctuation, misspellings, digits, every
query_type, with/without coord), the real forward_geocode top-k must
equal the generated DuckDB oracle row-for-row — the same compare the
driver gate applies, swept across many more query shapes than the four
registered gates."""

from __future__ import annotations

import random

import duckdb
import pytest

from mimirsbrunn_spark.functions.geocode import _query_tokens
from mimirsbrunn_spark.gate_geocode import (
    VOCAB,
    _run,
    geocode_oracle_sql,
)

SF = "/root/testdata/sf0.001"

_ACCENTED = {"eglise": "église", "marche": "marché", "chateau": "château", "gare": "gâre"}
_MISSPELL = {"martin": "martn", "eglise": "eglize", "fontaine": "fontane", "victor": "viktor"}


def _corpus() -> list[tuple[str, str, tuple | None]]:
    rng = random.Random(20260817)
    cases: list[tuple[str, str, tuple | None]] = []
    for i in range(24):
        n = rng.choice([1, 2, 2, 3])
        words = rng.sample(VOCAB, n)
        qt = rng.choice(["prefix", "fuzzy", "search"])
        styled = []
        for w in words:
            r = rng.random()
            if r < 0.2 and w in _ACCENTED:
                styled.append(_ACCENTED[w])
            elif r < 0.35 and qt == "fuzzy" and w in _MISSPELL:
                styled.append(_MISSPELL[w])
            elif r < 0.45:
                styled.append(w.capitalize())
            else:
                styled.append(w)
        joiner = rng.choice([" ", " ", "-", ", "])
        q = joiner.join(styled)
        if rng.random() < 0.25:
            q = "l'" + q
        if rng.random() < 0.2:
            q = q + " 75" + str(rng.randrange(10))
        coord = (2.35, 48.85) if rng.random() < 0.4 else None
        cases.append((q, qt, coord))
    # fixed edge shapes on top of the random sweep
    cases += [
        ("st martin", "prefix", None),            # synonym expansion
        ("SAINT-MARTIN", "prefix", None),         # case + punctuation
        ("mairie", "prefix", None),               # synonym -> 2 tokens (hotel de ville)
        ("zz", "fuzzy", None),                    # sub-min_gram token
        ("fontaine", "search", (0.0, 0.0)),       # 1 token + coord, addr excluded
        ("---", "prefix", None),                  # empty after normalize
    ]
    return cases


@pytest.mark.parametrize("q,qt,coord", _corpus())
def test_oracle_matches_engine(spark, q, qt, coord):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    sql = geocode_oracle_sql(q, qt, coord=coord, k=25)
    want = con.execute(sql).df()
    if not _query_tokens(q):
        assert want.empty
        return
    got = _run(spark, SF, q, qt, coord=coord, k=25).toPandas()
    assert got.shape == want.shape, (q, qt, got.shape, want.shape)
    cols = sorted(got.columns)
    a = got[cols].sort_values(by=cols).reset_index(drop=True)
    b = want[cols].sort_values(by=cols).reset_index(drop=True)
    for c in cols:
        for x, y in zip(a[c], b[c]):
            if isinstance(x, float):
                assert float(x) == float(y) or (x != x and y != y), (q, qt, c, x, y)
            else:
                assert x == y, (q, qt, c, x, y)
