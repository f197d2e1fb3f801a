"""Randomized boundary-exact sweep of the stream-stream interval join:
views planted EXACTLY at click_ts - gap (inclusive bound), 1µs inside,
1µs outside, at click_ts itself, and 1µs after (exclusive), plus
duplicate per-user timestamps — streamed through the real watermarked
left-outer join and compared against a pure-Python interval oracle.
The sessionize sweep pinned the session gap bounds; this pins the
join's ``click_ts - gap <= view_ts <= click_ts`` bounds the same way."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

GAP_US = 15 * 60 * 1_000_000
_BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _mk_events(rng: random.Random) -> list[dict]:
    events = []
    eid = 0
    for user in range(30):
        t0 = rng.randrange(0, 10**9)
        for c in range(rng.randrange(1, 4)):
            cus = t0 + c * rng.randrange(1, 3) * GAP_US * 3
            eid += 1
            events.append({"event_id": eid, "us": cus, "user_id": user,
                           "event_type": "click"})
            for delta in rng.sample(
                [-GAP_US, -GAP_US + 1, -GAP_US - 1, 0, 1, -1,
                 -GAP_US // 2, GAP_US],
                rng.randrange(2, 7),
            ):
                eid += 1
                events.append({"event_id": eid, "us": cus + delta,
                               "user_id": user, "event_type": "view"})
            if rng.random() < 0.3:  # duplicate-timestamp view pair
                eid += 1
                events.append({"event_id": eid, "us": cus - 1,
                               "user_id": user, "event_type": "view"})
    return events


def _oracle(events: list[dict]) -> set[tuple]:
    out = set()
    views = [e for e in events if e["event_type"] == "view"]
    for c in (e for e in events if e["event_type"] == "click"):
        matched = False
        for v in views:
            if v["user_id"] == c["user_id"] and c["us"] - GAP_US <= v["us"] <= c["us"]:
                out.add((c["user_id"], c["event_id"], v["event_id"],
                         c["us"] - v["us"]))
                matched = True
        if not matched:
            out.add((c["user_id"], c["event_id"], None, None))
    return out


@pytest.mark.parametrize("seed", [31, 113])
def test_stream_interval_join_boundary_exact(spark, tmp_path, seed):
    from mimirsbrunn_spark.streaming import stream_click_view_join

    rng = random.Random(seed)
    events = _mk_events(rng)
    rows = [
        (e["event_id"], _BASE + dt.timedelta(microseconds=e["us"]),
         e["user_id"], e["event_type"], 0.0, "")
        for e in sorted(events, key=lambda e: e["us"])
    ]
    # far-future flush pair advances both watermarks past all real state
    max_us = max(e["us"] for e in events)
    rows += [
        (10**9 + 1, _BASE + dt.timedelta(microseconds=max_us, days=100), -1, "click", 0.0, ""),
        (10**9 + 2, _BASE + dt.timedelta(microseconds=max_us, days=100), -1, "view", 0.0, ""),
    ]
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    import shutil
    from pathlib import Path

    src = tmp_path / f"events_src_{seed}"
    src.mkdir()
    stage = tmp_path / f"stage_{seed}"  # outside src: the file stream
    # reads every parquet under its dir, staging inside would double-feed
    # three time-ordered files so the watermark advances between batches
    n = len(rows)
    for i, chunk in enumerate([rows[: n // 3], rows[n // 3: 2 * n // 3], rows[2 * n // 3:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(stage / f"p{i}")
        )
        for f in Path(stage / f"p{i}").glob("*.parquet"):
            shutil.copy(f, src / f"events_{i}.parquet")

    out, ckpt = str(tmp_path / f"out_{seed}"), str(tmp_path / f"ckpt_{seed}")
    q = stream_click_view_join(
        spark, str(src), out, ckpt, max_gap_minutes=15,
        watermark="30 minutes", how="left_outer",
    )
    assert q.awaitTermination(900), "stream query did not terminate"
    got = {
        (r["user_id"], r["click_id"], r["view_id"], r["gap_us"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] >= 0
    }
    want = _oracle(events)
    only_got, only_want = got - want, want - got
    assert got == want, (
        f"seed {seed}: stream-only={sorted(only_got)[:5]} "
        f"oracle-only={sorted(only_want)[:5]}"
    )
