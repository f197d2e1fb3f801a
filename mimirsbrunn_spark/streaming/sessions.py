"""Event-time streaming over the events table: watermarked windowed
aggregation + custom stateful sessionization.

The reference has no event-time streaming (SURVEY §2.10); these are the
Structured-Streaming counterparts of the batch `sessionize_events` gate
(gate.py q_sessionize — lag + cumulative sum) for a corpus that arrives
continuously:

- ``windowed_event_counts``: tumbling/sliding event-time windows with a
  watermark; append mode emits each window exactly once, when the
  watermark passes its end — the canonical late-data-tolerant rollup.
- ``stateful_sessionize_stream``: per-user session tracking with
  ``applyInPandasWithState`` — the same >gap-minutes break rule as the
  batch operator; closed sessions are emitted as they close, the open
  session per user lives in state and is flushed by event-time timeout
  once the watermark passes its gap horizon.

Parity contract (narrowed per ADVICE r02): with a watermark delay of W,
the stream's emitted sessions equal the batch operator's sessions when
each user's events are in order ACROSS micro-batches and at most W late.
Disorder WITHIN a micro-batch is fully handled (all Arrow chunks of the
group are concatenated and globally sorted before replay). An event that
arrives in a LATER micro-batch behind the open session's head but still
inside the watermark is clamped into the open session — counted, never
moving session time backwards (durations stay non-negative) — which is a
documented divergence from batch for cross-batch disorder. Arrivals
later than W are dropped, as in any watermarked system.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matching the batch gate


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watermarked per-(window, event_type) counts, append mode: a window
    row is emitted exactly once, after the watermark passes its end."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", F.round("value_sum", 6).alias("value_sum"),
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def _session_rows(user_id, sessions):
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_idx": [s[0] for s in sessions],
            "n_events": [s[1] for s in sessions],
            "duration_us": [s[2] for s in sessions],
        }
    )


def _sessionize_user(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Per-user stateful kernel. State: (last_us, start_us, n_events,
    session_idx) of the OPEN session. Emits a row per CLOSED session,
    with the same (user_id, session_idx, n_events, duration_us) shape as
    the batch operator."""
    user_id = key[0]
    if state.hasTimedOut:
        # watermark passed the open session's gap horizon: flush it —
        # but KEEP the session_idx counter in state (sentinel last_us=-1
        # = no open session). state.remove() here would restart the
        # user's numbering at 1 after every idle flush, emitting
        # duplicate (user_id, session_idx) rows for perfectly in-order
        # data. The kept state is 4 longs per user with no timeout set,
        # bounded by the distinct-user count.
        last_us, start_us, n_events, session_idx = state.get
        state.update((-1, -1, 0, session_idx))
        yield _session_rows(user_id, [(session_idx, n_events, last_us - start_us)])
        return

    if state.exists:
        last_us, start_us, n_events, session_idx = state.get
    else:
        last_us = start_us = -1
        n_events = 0
        session_idx = 0

    closed = []
    # rows older than the watermark are dropped (standard watermark
    # semantics — Spark does not pre-filter late rows for arbitrary
    # stateful ops, so the kernel enforces it; such rows would otherwise
    # time-travel an open session backwards)
    wm_us = state.getCurrentWatermarkMs() * 1000
    # A group's micro-batch rows can span several Arrow chunks in arbitrary
    # order (maxRecordsPerBatch, multi-partition input) — concatenate and
    # sort ONCE so intra-batch disorder never corrupts sessions (ADVICE r02).
    frames = [pdf for pdf in pdf_iter if len(pdf)]
    if frames:
        batch = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        for us in batch.sort_values(["us", "event_id"])["us"].to_numpy():
            us = int(us)
            if us < wm_us:
                continue
            if last_us < 0:
                session_idx += 1
                start_us, last_us, n_events = us, us, 1
            elif us < last_us:
                # cross-batch late-but-within-watermark arrival behind the
                # open session's head: clamp into the open session (count
                # it, never move session time backwards — durations stay
                # non-negative; see the module parity contract)
                n_events += 1
            elif us - last_us > SESSION_GAP_US:
                closed.append((session_idx, n_events, last_us - start_us))
                session_idx += 1
                start_us, last_us, n_events = us, us, 1
            else:
                last_us = us
                n_events += 1

    if last_us < 0:
        # every row in this batch was late-dropped and there is no open
        # session to keep — nothing to store
        return
    state.update((last_us, start_us, n_events, session_idx))
    # flush the open session once event time moves past its gap; Spark
    # requires the timeout to sit at or after the current watermark
    horizon = last_us // 1000 + SESSION_GAP_US // 1000
    state.setTimeoutTimestamp(max(horizon, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield _session_rows(user_id, closed)


def stateful_sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source stream → per-user stateful sessionization
    (applyInPandasWithState, event-time timeout)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    prepped = (
        stream.withWatermark("ts", watermark)
        .select(
            "user_id", "event_id", "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    sessions = prepped.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType="user_id long, session_idx long, n_events long, duration_us long",
        stateStructType="last_us long, start_us long, n_events long, session_idx long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
