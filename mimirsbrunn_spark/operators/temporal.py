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
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.time <= left.time`` in the same ``key`` group (inclusive).

    Returns the left rows + the matched right id (``{right_id}{suffix}``,
    null when no earlier right row exists) + requested right columns
    (suffixed) + ``{time_col}{suffix}`` of the match."""
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
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("__tag").asc(), F.col("__rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        tagged_r.unionByName(tagged_l)
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
    bucket_width: float = 1.0,
) -> DataFrame:
    """Interval (range) join without the naive cross product: each
    interval explodes to the fixed-width buckets it overlaps, the left
    side lands in exactly ONE bucket, and the match is a bucket equi-join
    + exact half-open filter ``lo <= value < hi``.

    Pairs are unique by construction (one bucket per left row), so no
    dedup shuffle; cost is |left| + |intervals| x (span/bucket_width)
    instead of |left| x |intervals|. Pick ``bucket_width`` near the
    median interval span; AQE skew-splits hot buckets."""
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
