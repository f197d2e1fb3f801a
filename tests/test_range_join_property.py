"""Randomized sweep of the bucketed ``range_join`` against a DuckDB
inequality join, over shapes the gate's datagen avoids: negative
values (floor-bucket sign behavior), zero-width and inverted
intervals, values exactly on lo/hi boundaries (half-open semantics),
fractional bucket widths, and nested/overlapping interval stacks."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from mimirsbrunn_spark.operators.temporal import range_join


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("bucket_width", [1.0, 2.5, None])
def test_range_join_matches_duckdb(spark, seed, bucket_width):
    rng = random.Random(900 + seed)
    vals = [(i, round(rng.uniform(-20, 20), 1)) for i in range(250)]
    ivs = []
    for j in range(60):
        lo = round(rng.uniform(-20, 20), 1)
        span = rng.choice([0.0, 0.3, 1.0, 5.0, 12.0])
        ivs.append((j, lo, round(lo + span, 1)))
    # boundary-exact rows: value == lo (must match) and value == hi (must not)
    ivs.append((60, 3.0, 9.0))
    vals += [(9001, 3.0), (9002, 9.0)]
    lpdf = pd.DataFrame(vals, columns=["vid", "v"])
    ipdf = pd.DataFrame(ivs, columns=["iid", "lo", "hi"])

    out = range_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(ipdf),
        value_col="v",
        bucket_width=bucket_width,
    )
    got = {(r["vid"], r["iid"]) for r in out.select("vid", "iid").collect()}

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("i", ipdf)
    want = {
        (a, b)
        for a, b in con.execute(
            "SELECT vid, iid FROM l JOIN i ON l.v >= i.lo AND l.v < i.hi"
        ).fetchall()
    }
    assert got == want, f"{len(got ^ want)} differing pairs: {sorted(got ^ want)[:5]}"
    assert (9001, 60) in got and (9002, 60) not in got
