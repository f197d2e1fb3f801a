"""Randomized sweep of batch sessionization (q_sessionize vs its DuckDB
oracle, the `sessionize_events` gate pair) over event shapes the gate's
datagen never produces: gaps landing EXACTLY on the 30-minute boundary
(same session — the break is strictly `>`), boundary+1µs (new session),
duplicate timestamps per user (event_id tiebreak in the lag window),
single-event users, users whose entire stream is one instant, and rows
written to parquet in shuffled (non-time) order so the window sort is
actually load-bearing."""

from __future__ import annotations

import random

import duckdb
import pytest

from mimirsbrunn_spark.gate import SESSIONIZE_SQL, q_sessionize

GAP_US = 30 * 60 * 1_000_000
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _events(rng: random.Random):
    """[(event_id, user_id, us)] with boundary-exact gaps and ties."""
    rows = []
    eid = 0
    for user in range(12):
        n = rng.choice([1, 1, 3, 8, 20])
        us = BASE_US + rng.randrange(0, 10**9)
        for _ in range(n):
            rows.append((eid, user, us))
            eid += 1
            step = rng.choice(
                [0, 0, 1, 999, GAP_US - 1, GAP_US, GAP_US, GAP_US + 1, 3 * GAP_US]
            )
            us += step
    rng.shuffle(rows)  # parquet order != time order
    return rows


@pytest.mark.parametrize("seed", [5, 17, 29, 43])
def test_sessionize_matches_duckdb_on_boundary_gaps(spark, seed, tmp_path):
    rng = random.Random(seed)
    rows = _events(rng)
    sf_dir = str(tmp_path / f"sess_{seed}")
    spark.createDataFrame(
        [(e, u, us) for e, u, us in rows],
        "event_id long, user_id long, us long",
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(us) as ts"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        (r["user_id"], r["session_idx"], r["n_events"], r["duration_us"])
        for r in q_sessionize(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(SESSIONIZE_SQL).fetchall()}
    assert got == want, (
        f"seed {seed}: {len(got ^ want)} differing rows; "
        f"example: {sorted(got ^ want)[:4]}"
    )
    # the boundary shapes actually occurred: some user must have a
    # multi-event session (exact-30min gap folded in) and some a burst
    # of single-instant sessions
    assert any(n > 1 for _, _, n, _ in want)
    assert any(d == 0 for _, _, n, d in want if n > 1) or any(
        n == 1 for _, _, n, _ in want
    )
