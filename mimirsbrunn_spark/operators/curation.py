"""Training-mix curation operators: deterministic stratified sampling
and token-budget sequence packing.

Two more staples between dedup/filtering and the tokenizer in a
large-scale training-data pipeline:

- ``stratified_sample`` — draw a per-stratum subset (language / source /
  modality quotas) deterministically: selection is a pure function of
  the row id via a portable integer hash, so the sample is reproducible
  across runs, engines and cluster widths, and is oracle-exact in SQL.
  Two modes with very different scale profiles:
  * ``rate=`` (the 100-TB path): keep rows whose hash falls under the
    rate threshold — a stateless JVM filter, NO shuffle, no window, no
    state; expected-rate sampling exactly like production corpus
    subsampling (hash-mod sharding).
  * ``quotas=`` (exact counts): rank by hash within each stratum and
    take the first n — one window per stratum. Strata counts are
    normally small (languages × sources); a pathologically hot stratum
    ranks on a single reducer chain, the documented trade-off for exact
    cardinality (use ``rate`` when exactness isn't required).

- ``pack_sequences`` — next-fit token-budget packing: within each
  deterministic shard (the ``group_cols``), walk documents in id order
  and append to the current bin while the running token sum fits,
  else open a new bin. The walk is inherently sequential, so this is
  the textbook ``applyInPandas`` custom operator: parallel ACROSS
  shards, a tight vectorized-ish loop WITHIN one (Arrow-batched, one
  pass, no per-row Python UDF in a Catalyst expression). Oversize
  documents (tokens > budget) isolate into their own bin by the same
  rule, never silently truncated. At 100 TB the shard key is the unit
  of parallelism — pack within (lang, source, shard_id) where shard_id
  = hash-mod of the id, giving arbitrarily many independent packers;
  bin ids are only unique per shard, exactly like real sequence-packing
  jobs that pack per input split.

Reference analogue: mimirsbrunn's import pipelines stream places in
stable id order and batch them into fixed-size Elasticsearch bulk
requests (`libs/mimir/src/adapters/secondary/elasticsearch/storage.rs`
insert_documents chunking) — pack_sequences is the same
deterministic-order batching with a token budget instead of a byte one.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# portable LCG hash (the MINHASH_A/B family's constants pattern): exact
# integer arithmetic in Spark SQL and DuckDB alike
HASH_A, HASH_C, HASH_P = 1_103_515_245, 12_345, 2_147_483_647


def sample_hash_col(id_col: str) -> str:
    """SQL text of the portable selection hash — shared with the oracle."""
    return f"(({HASH_A} * {id_col} + {HASH_C}) % {HASH_P} + {HASH_P}) % {HASH_P}"


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str] = ("lang",),
    quotas: DataFrame | None = None,
    rate: float | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling. Exactly one of ``quotas`` (a
    small DataFrame of strata_cols + ``quota`` int, broadcast-joined;
    strata absent from it contribute nothing) or ``rate`` (0..1 global
    hash-threshold filter, stateless). Returns the input rows plus the
    selection hash column ``sample_h`` (useful for reproducible
    follow-up splits)."""
    if (quotas is None) == (rate is None):
        raise ValueError("pass exactly one of quotas= or rate=")
    h = F.expr(sample_hash_col(id_col))
    out = df.withColumn("sample_h", h)
    if rate is not None:
        # stateless scale path: no shuffle, no window — the predicate is
        # an integer expression over the id evaluated inside the scan's
        # whole-stage-codegen span (not a parquet pushdown: the hash is
        # computed, but there is no exchange anywhere in the plan)
        return out.filter(F.col("sample_h") < int(rate * HASH_P))
    w = Window.partitionBy(*strata_cols).orderBy(F.col("sample_h").asc(), F.col(id_col).asc())
    return (
        out.withColumn("sample_rank", F.row_number().over(w))
        .join(F.broadcast(quotas), list(strata_cols))
        .filter(F.col("sample_rank") <= F.col("quota"))
        .drop("sample_rank", "quota")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_cols: Sequence[str] = ("lang",),
) -> DataFrame:
    """Next-fit sequence packing within each ``group_cols`` shard.

    Walks the shard's rows in ``id_col`` order keeping a running token
    sum; a row joins the current bin if the sum stays <= ``budget``,
    else it opens the next bin. Deterministic given the input rows.
    Returns group_cols + (id, tokens, bin, bin_pos): ``bin`` numbers
    increase densely per shard and ``bin_pos`` is the 0-based position
    within the bin. Note (ADVICE r05): when a shard's FIRST document is
    already over ``budget`` the walk opens bin 1 immediately, so bin 0
    is skipped in that shard — the recurrence (which the DuckDB oracle
    replays verbatim) is the contract, not a bins-start-at-0 guarantee.
    """
    gcols = list(group_cols)
    fields = df.select(*gcols, id_col, tokens_col).schema
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields]
        + ["bin int", "bin_pos int"]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, poss = [], []
        cur_bin, cur_sum, cur_pos = 0, 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if cur_sum + t <= budget:
                cur_sum += t
                cur_pos = cur_pos + 1 if bins and bins[-1] == cur_bin else 0
            else:
                cur_bin += 1
                cur_sum = t
                cur_pos = 0
            bins.append(cur_bin)
            poss.append(cur_pos)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        pdf["bin_pos"] = pd.Series(poss, dtype="int32")
        return pdf

    return (
        df.select(*gcols, id_col, tokens_col)
        .groupBy(*gcols)
        .applyInPandas(pack, schema=out_schema)
    )


def temperature_quotas(
    df: DataFrame,
    strata_cols: Sequence[str] = ("lang",),
    total: int = 100,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-smoothed mixture quotas — the multilingual training
    mix staple (XLM / mBERT exponential smoothing; Conneau & Lample
    2019 §3.1): stratum probabilities p_l are re-weighted to p_l^alpha
    and renormalized, flattening the head so low-resource strata are
    upsampled relative to their share. Returns strata_cols + ``quota``:
    floor(total * q_l) capped at the stratum's size, ready to feed
    ``stratified_sample(quotas=)``.

    The power/normalize arithmetic is rounded at 1e-6 before the floor
    (the repo's cross-engine float protocol — pow may differ by an ulp
    between libm builds; 1e-6 is orders of magnitude above that).

    One tiny aggregate: counts per stratum (strata counts are small by
    construction — languages × sources), then driver-free column math.
    """
    counts = df.groupBy(*strata_cols).agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("corpus_n"))
    weighted = counts.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.pow(F.col("n") / F.col("corpus_n"), F.lit(alpha))
    )
    wsum = weighted.agg(F.sum("w").alias("w_sum"))
    return (
        weighted.crossJoin(F.broadcast(wsum))
        .withColumn(
            "quota",
            F.least(
                F.col("n"),
                F.floor(F.round(F.lit(total) * F.col("w") / F.col("w_sum"), 6)).cast("int"),
            ).cast("int"),
        )
        .select(*strata_cols, "quota")
    )
