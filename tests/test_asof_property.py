"""Randomized sweep of ``asof_join`` — single-window AND skew-bucketed
plans — against DuckDB's native ASOF LEFT JOIN, over adversarial event
shapes the gate's datagen never produces: heavy timestamp ties (many
right rows per (key, time) exercising the greatest-id tie rule), exact
left==right time equality (inclusive boundary), 90%-hot keys, keys
present on only one side, left rows before any right row, negative
times, and an all-identical-timestamp set (zero time span, the bucketed
plan's span guard)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from mimirsbrunn_spark.operators.temporal import asof_join


def _events(rng: random.Random, n: int):
    keys = ["hot"] * 9 + ["k1", "k2", "k3", "left_only", "right_only"]
    # small time domain → many exact collisions
    times = [rng.randrange(-5, 40) for _ in range(n)]
    left, right = [], []
    for i, t in enumerate(times):
        k = rng.choice(keys)
        if k == "left_only" or (k != "right_only" and rng.random() < 0.5):
            left.append((k, t, i))
        else:
            right.append((k, t, i))
    return (
        pd.DataFrame(left, columns=["k", "t", "lid"]),
        pd.DataFrame(right, columns=["k", "t", "rid"]),
    )


def _oracle(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> set:
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    rows = con.execute(
        """
        WITH rd AS (SELECT k, t, max(rid) AS rid FROM r GROUP BY k, t)
        SELECT l.k, l.t, l.lid, rd.rid
        FROM l ASOF LEFT JOIN rd ON l.k = rd.k AND l.t >= rd.t
        """
    ).fetchall()
    return {(k, t, lid, rid) for k, t, lid, rid in rows}


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n_buckets", [None, 3])
def test_asof_matches_duckdb_on_tie_heavy_events(spark, seed, n_buckets):
    rng = random.Random(400 + seed)
    lpdf, rpdf = _events(rng, 300)
    out = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        key="k",
        time_col="t",
        right_id="rid",
        n_buckets=n_buckets,
    )
    got = {
        (r["k"], r["t"], r["lid"], r["rid_asof"])
        for r in out.select("k", "t", "lid", "rid_asof").collect()
    }
    want = _oracle(lpdf, rpdf)
    assert got == want, (
        f"seed {seed} buckets {n_buckets}: {len(got ^ want)} differing rows; "
        f"example: {sorted(got ^ want)[:4]}"
    )


def test_asof_zero_time_span(spark):
    """Every row at the same instant: the bucketed plan's span guard and
    the inclusive boundary + greatest-id tie rule all at once."""
    lpdf = pd.DataFrame([("a", 7, i) for i in range(5)], columns=["k", "t", "lid"])
    rpdf = pd.DataFrame([("a", 7, 100 + i) for i in range(3)], columns=["k", "t", "rid"])
    for nb in (None, 4):
        out = asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            key="k", time_col="t", right_id="rid", n_buckets=nb,
        )
        got = {(r["lid"], r["rid_asof"]) for r in out.collect()}
        assert got == {(i, 102) for i in range(5)}, (nb, got)
