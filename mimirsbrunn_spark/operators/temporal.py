"""Temporal joins over event streams: AS-OF join.

Spark has no built-in as-of join (the lakehouse staple: each left row
matched to the latest right row at or before it, per key). The reference
has none either — this is a training-data-pipeline operator per the
brief ("as-of join, range join" as custom-operator examples).

Implementation is the classic union-and-fill plan, fully Catalyst:

1. tag the right rows 0 and the left rows 1 and union them;
2. one window per key ordered by (time, tag, right-row id):
   ``last(right_attr, ignorenulls=True)`` fills every left row with the
   most recent right row at or before it (tag ordering makes a
   same-timestamp right row visible to the left row — inclusive
   semantics, matching DuckDB/‌pandas ``merge_asof`` with
   allow_exact_matches);
3. keep the left rows.

ONE shuffle (the window partition), no join node at all, no Python.
Ties on the right side (same key+time) resolve to the greatest right id
— and the oracle pre-dedupes the right side the same way, making the
gate engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_id: str,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    n_buckets: int | None = None,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.time <= left.time`` in the same ``key`` group (inclusive).

    Returns the left rows + the matched right id (``{right_id}{suffix}``,
    null when no earlier right row exists) + requested right columns
    (suffixed) + ``{time_col}{suffix}`` of the match.

    Skew (VERDICT r02): the default plan is ONE window per key — a hot
    key (one user with 10^8 events) lands on one reducer and a window
    cannot be AQE-split. ``n_buckets=N`` switches to the time-bucketed
    plan: the time domain is split into N ranges, the fill window runs
    per (key, bucket) — the hot key now spreads over N tasks — and
    cross-bucket continuity is restored by injecting, per (key, bucket),
    one synthetic right row carrying the last right state of all EARLIER
    buckets (computed as-of on the tiny per-bucket aggregate, never on
    the raw data). Results are identical to the single-window plan
    (gate ``events_asof`` runs the bucketed path against the native-ASOF
    oracle). Requires a numeric ``time_col`` when bucketed."""
    left_cols = left_cols if left_cols is not None else [
        c for c in left.columns if c not in (key, time_col)
    ]
    right_cols = right_cols or []

    # right side deduped to one row per (key, time): greatest id wins —
    # the deterministic tie rule the oracle mirrors
    w_dedup = Window.partitionBy(key, time_col).orderBy(F.col(right_id).desc())
    r = (
        right.select(key, time_col, right_id, *right_cols)
        .withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    tagged_r = r.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("__tag"),
        F.col(right_id).alias("__rid"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema[right_id].dataType).alias("__rid"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        *left_cols,
    )
    union = tagged_r.unionByName(tagged_l)

    part_cols = [key]
    if n_buckets:
        bounds = (
            left.select(F.min(time_col).alias("lo"), F.max(time_col).alias("hi"))
            .unionByName(r.select(F.min(time_col).alias("lo"), F.max(time_col).alias("hi")))
            .select(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
            .collect()[0]
        )
        lo, hi = bounds["lo"], bounds["hi"]
        span = max(float(hi - lo), 1e-12) if lo is not None else 1.0

        def bcol(t):
            # monotonic in t and deterministic — which bucket a row lands
            # in only affects balance, never results
            return F.least(
                F.lit(n_buckets - 1),
                F.floor((t - F.lit(lo)).cast("double") * n_buckets / F.lit(span)),
            ).cast("long")

        r_b = r.withColumn("__b", bcol(F.col(time_col)))
        # last right state per (key, occupied bucket) — tiny
        payload = F.struct(
            F.col(time_col).alias("t"),
            F.col(right_id).alias("rid"),
            *[F.col(c).alias(c) for c in right_cols],
        )
        last_r = r_b.groupBy(key, "__b").agg(
            F.max_by(payload, F.struct(F.col(time_col), F.col(right_id))).alias("__s")
        )
        # buckets where left rows live — map-side-combined distinct
        lb = left.select(key, bcol(F.col(time_col)).alias("__b")).distinct()
        # as-of on the aggregates: carry for left bucket b = last right
        # state of buckets < b (right buckets become visible at __b + 1)
        w_carry = (
            Window.partitionBy(key)
            .orderBy(F.col("__bk").asc(), F.col("__src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = (
            last_r.select(key, (F.col("__b") + 1).alias("__bk"), F.lit(0).alias("__src"),
                          F.lit(None).cast("long").alias("__b"), F.col("__s"))
            .unionByName(
                lb.select(key, F.col("__b").alias("__bk"), F.lit(1).alias("__src"),
                          F.col("__b"), F.lit(None).cast(last_r.schema["__s"].dataType).alias("__s"))
            )
            .withColumn("__cs", F.last("__s", ignorenulls=True).over(w_carry))
            .filter((F.col("__src") == 1) & F.col("__cs").isNotNull())
            .select(key, "__b", "__cs")
        )
        injected = carry.select(
            F.col(key),
            F.col("__cs.t").alias(time_col),
            F.lit(0).alias("__tag"),
            F.col("__cs.rid").alias("__rid"),
            *[F.col(f"__cs.{c}").alias(f"__r_{c}") for c in right_cols],
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
            F.col("__b"),
        )
        # synthetic rows carry times from earlier buckets, so they sort
        # first inside their bucket and never collide with in-bucket rows
        union = union.withColumn("__b", bcol(F.col(time_col))).unionByName(injected)
        part_cols = [key, "__b"]

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(time_col).asc(), F.col("__tag").asc(), F.col("__rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        union
        .withColumn("__m_rid", F.last("__rid", ignorenulls=True).over(w))
        .withColumn("__m_time", F.last(F.when(F.col("__tag") == 0, F.col(time_col)), ignorenulls=True).over(w))
    )
    for c in right_cols:
        filled = filled.withColumn(
            f"__m_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("__tag") == 1).select(
        key,
        time_col,
        *left_cols,
        F.col("__m_rid").alias(f"{right_id}{suffix}"),
        F.col("__m_time").alias(f"{time_col}{suffix}"),
        *[F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = 1.0,
    max_buckets_per_interval: int = 4096,
    on_wide: str = "raise",
) -> DataFrame:
    """Interval (range) join without the naive cross product: each
    interval explodes to the fixed-width buckets it overlaps, the left
    side lands in exactly ONE bucket, and the match is a bucket equi-join
    + exact half-open filter ``lo <= value < hi``.

    Pairs are unique by construction (one bucket per left row), so no
    dedup shuffle; cost is |left| + |intervals| x (span/bucket_width)
    instead of |left| x |intervals|. Pick ``bucket_width`` near the
    median interval span (``bucket_width=None`` derives exactly that from
    a percentile_approx over the spans); AQE skew-splits hot buckets.

    Span guard (VERDICT r02): one degenerate whole-domain interval at a
    small bucket_width explodes to millions of rows from a single input —
    the same failure class the ngram-Jaccard cartesian guard refuses. If
    the WIDEST interval would explode to more than
    ``max_buckets_per_interval`` buckets, the operator raises
    (``on_wide="raise"``, default — pick a sane width or split the
    degenerate interval upstream) or widens the bucket to fit
    (``on_wide="rebucket"`` — coarser pruning for everyone, never a
    blow-up). The one-pass span scan that powers the guard is the only
    eager action in the plan."""
    stats = intervals.select(
        F.max(F.col(hi_col) - F.col(lo_col)).alias("max_span"),
        F.percentile_approx(F.col(hi_col) - F.col(lo_col), 0.5).alias("p50_span"),
    ).collect()[0]
    max_span = float(stats["max_span"] if stats["max_span"] is not None else 0.0)
    if bucket_width is None:
        bucket_width = max(float(stats["p50_span"] or 0.0), 1e-12)
    worst = max_span / float(bucket_width) + 1.0
    if worst > max_buckets_per_interval:
        if on_wide == "rebucket":
            bucket_width = max_span / (max_buckets_per_interval - 1)
        else:
            raise ValueError(
                f"widest interval (span {max_span}) would explode to ~{int(worst)} buckets "
                f"at bucket_width={bucket_width} (cap {max_buckets_per_interval}); pass a "
                "wider bucket_width, on_wide='rebucket', or split the degenerate interval"
            )
    b_left = left.withColumn(
        "__b", F.floor(F.col(value_col) / F.lit(float(bucket_width))).cast("long")
    )
    b_int = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(float(bucket_width))).cast("long"),
                F.floor(F.col(hi_col) / F.lit(float(bucket_width))).cast("long"),
            )
        ),
    )
    return (
        b_left.join(b_int, "__b")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__b")
    )
