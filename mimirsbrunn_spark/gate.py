"""Driver-contract gate queries: Spark plans + exact DuckDB oracles.

The driver's correctness gate (CORRECTNESS_r{N}.json) runs each
``queries()[name]`` on Spark at sf0.01 and compares row-count, schema and
an order-insensitive value hash against ``oracle_sql()[name]`` run by
DuckDB over the same parquet views. Floating math must therefore be
*bit-identical* across engines: every expression here is either integer
arithmetic or a sequence of IEEE-754 double ops written identically on
both sides (same structure ⇒ same rounding), with outputs rounded where
a libm-dependent function (sin/cos/asin) enters.

Geo inputs are derived deterministically from the driver's TPC-H-ish
tables (no external data): ``orders`` → a 15k-point cloud, ``nation`` →
25 query points, via integer multiply-mod arithmetic that both engines
evaluate exactly.

The admin dimension for the PIP gate is a closed-form, perfectly nested
rectangle hierarchy (4 countries ⊃ 32 states ⊃ 512 cities tiling the
whole globe), built as real WKB polygons on the Spark side — so the gate
exercises the *actual* attach_admins machinery — while the oracle
computes the expected attachment in closed form (floor division).
With perfect nesting and one admin per zone type containing any point,
the reference's G5 semantics (zone-type dedup + hierarchy memoization,
/root/reference/src/admin_geofinder.rs:220-269) reduce to exactly these
three admins in zone-rank order — the tricky overlap/memoization cases
are covered by the ported unit vectors in tests/test_geofinder.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geometry import haversine_sql, mp_to_wkb
from .tiles import grid_cell_col, grid_cell_sql

# ---------------------------------------------------------------------------
# deterministic point clouds (exact in both engines)
# ---------------------------------------------------------------------------

from .gate_points import (  # noqa: F401 — re-exported for gate modules/tests
    POINTS_FROM_NATION_SQL,
    POINTS_FROM_ORDERS_SQL,
    points_from_nation,
    points_from_orders,
)

# ---------------------------------------------------------------------------
# closed-form rectangle admin hierarchy (whole-globe tiling)
# ---------------------------------------------------------------------------

_CITY_W, _CITY_H = 11.25, 11.25      # 32 × 16 cities
_STATE_W, _STATE_H = 45.0, 45.0      # 8 × 4 states
_COUNTRY_W, _COUNTRY_H = 180.0, 90.0  # 2 × 2 countries


def _rect_ring(x0, y0, w, h):
    return np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)], dtype=np.float64)


def rect_admins_df(spark: SparkSession) -> DataFrame:
    """The gate's admin dimension as real WKB polygons (548 admins),
    carrying enrichment columns (name/level/zips/weight) with closed-form
    values so enrichment gate queries have exact SQL oracles:

    - city (i,j): name ``city i_j``, weight ((i*16+j)%100)/200, zips
      ``[str(20000+i*16+j)]`` unless (i+j)%3==0 (then empty → the A1 fold
      must fall back to the state's zips);
    - state (i,j): name ``state i_j``, weight 0.6, zips [str(30000+i*4+j)];
    - country: weight 0.9, no zips."""
    rows = []
    for i in range(2):
        for j in range(2):
            rows.append((f"adm:c:{i}:{j}", f"country {i}_{j}", 2, "country", None, [], 0.9,
                         mp_to_wkb([[_rect_ring(-180 + i * 180.0, -90 + j * 90.0, 180.0, 90.0)]])))
    for i in range(8):
        for j in range(4):
            parent = f"adm:c:{i // 4}:{j // 2}"
            rows.append((f"adm:s:{i}:{j}", f"state {i}_{j}", 4, "state", parent,
                         [str(30000 + i * 4 + j)], 0.6,
                         mp_to_wkb([[_rect_ring(-180 + i * 45.0, -90 + j * 45.0, 45.0, 45.0)]])))
    for i in range(32):
        for j in range(16):
            parent = f"adm:s:{i // 4}:{j // 4}"
            zips = [] if (i + j) % 3 == 0 else [str(20000 + i * 16 + j)]
            weight = ((i * 16 + j) % 100) / 200.0
            rows.append((f"adm:t:{i}:{j}", f"city {i}_{j}", 8, "city", parent, zips, weight,
                         mp_to_wkb([[_rect_ring(-180 + i * _CITY_W, -90 + j * _CITY_H, _CITY_W, _CITY_H)]])))
    return spark.createDataFrame(
        rows,
        schema="id string, name string, level int, zone_type string, parent_id string, "
        "zip_codes array<string>, weight double, boundary_wkb binary",
    )


# oracle: closed-form expected attachment, one row per (point, admin, pos)
PIP_ORACLE_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    idx AS (
        SELECT point_id,
               CAST(floor((lon + 180.0) / {_CITY_W}) AS INT) AS ti,
               CAST(floor((lat + 90.0) / {_CITY_H}) AS INT) AS tj
        FROM pts
    )
    SELECT point_id, 'adm:t:' || ti || ':' || tj AS admin_id, 1 AS pos FROM idx
    UNION ALL
    SELECT point_id, 'adm:s:' || (ti // 4) || ':' || (tj // 4) AS admin_id, 2 AS pos FROM idx
    UNION ALL
    SELECT point_id, 'adm:c:' || (ti // 16) || ':' || (tj // 8) AS admin_id, 3 AS pos FROM idx
"""


# ---------------------------------------------------------------------------
# query builders (each returns a DataFrame; SQL oracle alongside)
# ---------------------------------------------------------------------------


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_orders(spark, sf_dir)
    return pts.select(
        "point_id",
        grid_cell_col("lon", "lat", 7),
        grid_cell_col("lon", "lat", 9),
        grid_cell_col("lon", "lat", 12),
    )


TILE_ASSIGN_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL})
    SELECT point_id,
           {grid_cell_sql('lon', 'lat', 7)} AS h3_7,
           {grid_cell_sql('lon', 'lat', 9)} AS h3_9,
           {grid_cell_sql('lon', 'lat', 12)} AS h3_12
    FROM pts
"""


def q_tile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_orders(spark, sf_dir)
    return (
        pts.select(grid_cell_col("lon", "lat", 7))
        .groupBy("h3_7")
        .agg(F.count("*").alias("n_points"))
    )


TILE_HIST_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL})
    SELECT {grid_cell_sql('lon', 'lat', 7)} AS h3_7, COUNT(*) AS n_points
    FROM pts GROUP BY 1
"""


def _attach(spark, sf_dir, strategy):
    from .operators.pip import attach_admins

    pts = points_from_orders(spark, sf_dir).withColumn(
        "point_uid", F.col("point_id").cast("string")
    )
    attached = attach_admins(pts, rect_admins_df(spark), strategy=strategy)
    return attached.select(
        "point_id", F.posexplode("admin_ids").alias("pos0", "admin_id")
    ).select("point_id", "admin_id", (F.col("pos0") + 1).alias("pos"))


def q_pip_admins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PIP machinery (broadcast strategy) vs closed-form oracle."""
    return _attach(spark, sf_dir, "broadcast")


def q_pip_admins_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract through the shuffled cogroup path."""
    return _attach(spark, sf_dir, "partitioned")


def q_pip_city_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points per city admin — PIP output feeding a groupBy."""
    att = _attach(spark, sf_dir, "broadcast")
    return (
        att.filter(F.col("pos") == 1)
        .groupBy("admin_id")
        .agg(F.count("*").alias("n_points"))
    )


PIP_CITY_AGG_SQL = f"""
    WITH att AS ({PIP_ORACLE_SQL})
    SELECT admin_id, COUNT(*) AS n_points FROM att WHERE pos = 1 GROUP BY 1
"""


def q_reverse_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.knn import reverse_geocode

    queries = points_from_nation(spark, sf_dir)
    targets = points_from_orders(spark, sf_dir).withColumnRenamed("point_id", "target_id")
    return reverse_geocode(
        queries, targets, k=3, radius_m=2_000_000.0, res=0,
        query_id="query_id", target_id="target_id",
    )


REVERSE_KNN_SQL = f"""
    WITH q AS ({POINTS_FROM_NATION_SQL}),
    t AS ({POINTS_FROM_ORDERS_SQL}),
    pairs AS (
        SELECT q.query_id, t.point_id AS target_id,
               {haversine_sql('q.lon', 'q.lat', 't.lon', 't.lat')} AS d
        FROM q, t
    ),
    ranked AS (
        SELECT query_id, target_id, round(d, 3) AS distance_m,
               row_number() OVER (PARTITION BY query_id ORDER BY round(d, 3) ASC, target_id ASC) AS rank
        FROM pairs WHERE d <= 2000000.0
    )
    SELECT query_id, target_id, distance_m, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# text / dedup / similarity queries over the documents & embeddings tables
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by full text: representative id + group size."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("rep_doc"), F.count("*").alias("n_copies")
    ).select("rep_doc", "n_copies")


DEDUP_EXACT_SQL = """
    SELECT min(doc_id) AS rep_doc, COUNT(*) AS n_copies
    FROM documents GROUP BY text
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"[ \t\r\n\x0b\f]+")
    n = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(F.size(toks))
    return d.select("doc_id", n.cast("long").alias("n_tokens"))


TOKEN_COUNT_SQL = r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+')) END::BIGINT AS n_tokens
    FROM documents
"""


# BPE-ish pretokenizer (the GPT-2 pattern's shape, lookahead-free so the
# same regex runs under Java regex AND RE2): contraction suffixes,
# space?+letter-run, space?+digit-run, space?+punct-run. Whitespace-only
# runs are not tokens.
BPE_TOKEN_RX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\r\n\x0b\f']+"


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counting (the budget estimator a training
    pipeline runs before tokenizing for real): count BPE-pretokenizer
    matches — JVM regexp_extract_all, no Python."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RX), F.lit(0))
    return d.select(
        "doc_id", F.size(F.coalesce(toks, F.array())).cast("long").alias("n_bpe_tokens")
    )


TOKEN_COUNT_BPE_SQL = rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(coalesce(text, ''), '{BPE_TOKEN_RX.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
"""


# a small fixed english stopword list (quality heuristics don't need NLTK)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
]


def q_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio quality signal (the third leg of the brief's
    length/punct/stopword triple): fraction of lowercase whitespace
    tokens that are stopwords — pure higher-order array SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.trim("text")), r"[ \t\r\n\x0b\f]+"), lambda x: x != "")
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        sw.cast("long").alias("n_stopwords"),
        F.when(n > 0, F.round(sw.cast("double") / n.cast("double"), 6)).otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


STOPWORD_RATIO_SQL = rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '[ \t\r\n\x0b\f]+'), x -> x != '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x IN ({", ".join("'" + w + "'" for w in STOPWORDS)}))) AS BIGINT) AS n_stopwords,
           CASE WHEN len(toks) > 0
                THEN round(len(list_filter(toks, x -> x IN ({", ".join("'" + w + "'" for w in STOPWORDS)})))::DOUBLE / len(toks), 6)
                ELSE 0.0 END AS stopword_ratio
    FROM t
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic doc quality: length, mean token length, punctuation ratio
    (integer counts + one rounded division — engine-exact)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.col("text")
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    toks = F.split(F.trim(text), r"[ \t\r\n\x0b\f]+")
    n_tokens = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    score = F.round(
        (F.lit(1.0) - n_punct.cast("double") / (n_chars + F.lit(1)).cast("double"))
        * F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        n_punct.cast("long").alias("n_punct"),
        n_tokens.cast("long").alias("n_tokens"),
        score.alias("quality"),
    )


QUALITY_SCORE_SQL = r"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars_m,
           (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::BIGINT AS n_punct,
           (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+')) END)::BIGINT AS n_tokens,
           round((1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
                        / (length(text) + 1)::DOUBLE)
                 * least((CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+')) END)::DOUBLE / 50.0,
                         1.0), 6) AS quality
    FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash of the first 32 chars (document
    fingerprinting) — pure integer fold, JVM-side via higher-order fns."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = F.expr(
        "aggregate(transform(sequence(1, least(length(text), 32)),"
        " i -> ascii(substring(text, i, 1))),"
        " 0L, (acc, c) -> (acc * 31 + c) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


DOC_FINGERPRINT_SQL = """
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(range(1, least(length(text), 32) + 1),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
    FROM documents
"""


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic stand-in): count exact
    occurrences of per-language markers, argmax with pinned tie-break."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def count_marker(m):
        return (F.length(padded) - F.length(F.regexp_replace(padded, f" {m} ", ""))) / (len(m) + 2)

    en = (count_marker("the") + count_marker("and") + count_marker("of")).cast("long")
    fr = (count_marker("le") + count_marker("la") + count_marker("et")).cast("long")
    de = (count_marker("der") + count_marker("und") + count_marker("die")).cast("long")
    guess = (
        F.when((en >= fr) & (en >= de) & (en > 0), "en")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return d.select("doc_id", en.alias("en_hits"), fr.alias("fr_hits"), de.alias("de_hits"), guess.alias("lang_guess"))


def _marker_sql(m):
    return (
        f"((length(p) - length(replace(p, ' {m} ', ''))) / {len(m) + 2})"
    )


LANG_GUESS_SQL = f"""
    WITH prep AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
    hits AS (
        SELECT doc_id,
               ({_marker_sql('the')} + {_marker_sql('and')} + {_marker_sql('of')})::BIGINT AS en_hits,
               ({_marker_sql('le')} + {_marker_sql('la')} + {_marker_sql('et')})::BIGINT AS fr_hits,
               ({_marker_sql('der')} + {_marker_sql('und')} + {_marker_sql('die')})::BIGINT AS de_hits
        FROM prep
    )
    SELECT doc_id, en_hits, fr_hits, de_hits,
           CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
                WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
                WHEN de_hits > 0 THEN 'de'
                ELSE 'und' END AS lang_guess
    FROM hits
"""


def q_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for the first 50 vectors —
    sequential fold dot products (bit-identical across engines)."""
    from .operators.similarity import _cosine_fold

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.filter(F.col("vec_id") < 50).alias("a")
    b = e.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_vec"),
            F.col("b.vec_id").alias("neighbor_vec"),
            # zero-norm-guarded cosine (see operators/similarity._cosine_fold)
            F.round(F.expr(_cosine_fold("a.embedding", "b.embedding")), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_vec").orderBy(F.col("cosine").desc(), F.col("neighbor_vec").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


EMBED_COSINE_SQL = """
    WITH terms AS (
        SELECT a.vec_id AS query_vec, b.vec_id AS neighbor_vec,
               list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(a.embedding) + 1),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (x, y) -> x + y) AS dot,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(a.embedding) + 1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)), (x, y) -> x + y)) AS na,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(b.embedding) + 1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)), (x, y) -> x + y)) AS nb
        FROM embeddings a, embeddings b
        WHERE a.vec_id < 50 AND a.vec_id != b.vec_id
    ),
    pairs AS (
        -- zero-norm guard mirrors operators/similarity._cosine_fold
        SELECT query_vec, neighbor_vec,
               round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dot / (na * nb) END, 6) AS cosine
        FROM terms
    ),
    ranked AS (
        SELECT query_vec, neighbor_vec, cosine,
               row_number() OVER (PARTITION BY query_vec ORDER BY cosine DESC, neighbor_vec ASC) AS rank
        FROM pairs
    )
    SELECT query_vec, neighbor_vec, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization over the events table: a session breaks after a
    >30-minute gap per user (classic lag + cumulative-sum window plan —
    the batch analog of session_window in streaming). Timestamps are
    compared as epoch microseconds (exact integers in both engines)."""
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP_NTZ; cast to TIMESTAMP (session TZ pinned to UTC
    # in get_spark, and the driver compares epochs) before unix_micros
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sessions = (
        e.withColumn("new_s", new_session)
        .withColumn("session_idx", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"),
             F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("start_us"),
             F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("end_us"))
        .select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


SESSIONIZE_SQL = """
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN us - lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           max(us) - min(us) AS duration_us
    FROM sess GROUP BY user_id, session_idx
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join over the events table: every click matched to the
    latest view at-or-before it per user, through the SKEW-SAFE
    time-bucketed plan (operators/temporal.asof_join n_buckets=8 — per
    (key, bucket) windows + carry injection, so a hot key splits across
    reducers) vs DuckDB's native ASOF LEFT JOIN. Bucketed-vs-single-window
    equivalence is additionally pinned in pytest."""
    from .operators.temporal import asof_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "us")
    views = e.filter(F.col("event_type") == "view").select("user_id", "event_id", "us")
    out = asof_join(clicks, views, key="user_id", time_col="us", right_id="event_id", n_buckets=8)
    return out.select(
        "user_id",
        F.col("event_id").cast("long").alias("click_id"),
        F.col("event_id_asof").cast("long").alias("view_id"),
        (F.col("us") - F.col("us_asof")).cast("long").alias("gap_us"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events matched to the value intervals they
    fall in, via bucketized pruning (operators/temporal.range_join) vs a
    plain inequality join in DuckDB."""
    from .operators.temporal import range_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("interval_id"),
        (F.col("n_nationkey").cast("double") * 3.0).alias("lo"),
        (F.col("n_nationkey").cast("double") * 3.0 + 5.0).alias("hi"),
    )
    out = range_join(e, n, value_col="value", bucket_width=4.0)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("interval_id").cast("long").alias("interval_id"),
    )


EVENTS_RANGE_JOIN_SQL = """
    WITH iv AS (
        SELECT n_nationkey AS interval_id,
               n_nationkey * 3.0 AS lo, n_nationkey * 3.0 + 5.0 AS hi
        FROM nation
    )
    SELECT CAST(e.event_id AS BIGINT) AS event_id,
           CAST(iv.interval_id AS BIGINT) AS interval_id
    FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
"""


EVENTS_ASOF_SQL = """
    WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    clicks AS (SELECT user_id, event_id, us FROM ev WHERE event_type = 'click'),
    views_d AS (
        SELECT user_id, us, max(event_id) AS vid
        FROM ev WHERE event_type = 'view' GROUP BY user_id, us
    )
    SELECT c.user_id,
           CAST(c.event_id AS BIGINT) AS click_id,
           CAST(v.vid AS BIGINT) AS view_id,
           CAST(c.us - v.us AS BIGINT) AS gap_us
    FROM clicks c ASOF LEFT JOIN views_d v
      ON c.user_id = v.user_id AND c.us >= v.us
"""


def q_geohash6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell assignment (tiles.geohash_sql_expr — the cell scheme
    behind ES's historical geo pre-filter, closed-form base32): the SAME
    generated SQL string runs in Spark and DuckDB, the strongest parity
    form; the scalar/numpy reimplementation cross-checks it in pytest
    against canonical vectors."""
    from .tiles import geohash_col

    pts = points_from_orders(spark, sf_dir)
    return pts.select("point_id", geohash_col("lon", "lat", 6))


def _geohash6_sql() -> str:
    from .tiles import geohash_sql_expr

    return (
        f"SELECT point_id, {geohash_sql_expr('lon', 'lat', 6)} AS geohash6 "
        f"FROM ({POINTS_FROM_ORDERS_SQL})"
    )


def q_repetition_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition: duplicate-3-gram fraction
    (operators/textprep.repetition_ngram_stats) vs the identical
    list-transform pipeline in DuckDB."""
    from .operators.textprep import repetition_ngram_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_ngram_stats(d, n=3)


REPETITION_3GRAM_SQL = r"""
    WITH t AS (
        -- coalesce: NULL text counts as an empty doc, mirroring the
        -- engine's null-as-empty convention (adversarial-corpus sweep)
        SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\r\n\x0b\f]+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - 3 + 2),
                              i -> array_to_string(toks[i:i+2], ' ')) AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
                ELSE 0.0 END AS dup_fraction
    FROM g
"""


def q_shared_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication across the corpus: per document, how
    many of its distinct 8-grams appear in >= 2 documents
    (operators/textprep.shared_ngram_doc_flags — explode + one shuffle,
    never all-pairs)."""
    from .operators.textprep import shared_ngram_doc_flags

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shared_ngram_doc_flags(d, n=8, min_docs=2)


SHARED_NGRAM_DOCS_SQL = r"""
    WITH t AS (
        -- coalesce: NULL text counts as an empty doc, mirroring the
        -- engine's null-as-empty convention (adversarial-corpus sweep)
        SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '[ \t\r\n\x0b\f]+') AS toks
        FROM documents
    ),
    pg AS (
        SELECT doc_id, unnest(list_distinct(
                   list_transform(range(1, len(toks) - 8 + 2),
                                  i -> array_to_string(toks[i:i+7], ' ')))) AS gram
        FROM t
    ),
    shared AS (SELECT gram FROM pg GROUP BY gram HAVING count(*) >= 2),
    counts AS (
        SELECT pg.doc_id, count(*) AS n_shared_grams
        FROM pg JOIN shared USING (gram) GROUP BY pg.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(c.n_shared_grams, 0) AS BIGINT) AS n_shared_grams
    FROM documents d LEFT JOIN counts c USING (doc_id)
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (operators/textprep.scrub_pii) over documents with
    deterministically synthesized emails/phones (both engines build the
    identical augmented text, then scrub with the identical regexes —
    written in the Java-regex ∩ RE2 common dialect)."""
    from .operators.textprep import scrub_pii

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1 555 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return scrub_pii(d)


def _pii_scrub_sql() -> str:
    from .operators.textprep import EMAIL_RX, PHONE_RX

    return f"""
    WITH t AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or +1 555 '
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{EMAIL_RX}', '<EMAIL>', 'g'),
                          '{PHONE_RX}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{EMAIL_RX}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RX}')) AS BIGINT) AS n_phones
    FROM t
    """


def q_s2_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 cell assignment (vectorized numpy via pandas UDF), now with an
    EXACT DuckDB oracle: the 16-level Hilbert interleave is unrolled as a
    recursive CTE over the inlined 1024-entry lookup table (see
    tiles.s2_cell_oracle_sql — verified bit-exact on 150k points), so the
    round-2 ``no_oracle`` row is a full rows+schema+hash gate."""
    from .tiles import s2_cell_pandas_udf

    pts = points_from_orders(spark, sf_dir)
    return pts.select("point_id", s2_cell_pandas_udf(16)(F.col("lon"), F.col("lat")).alias("s2_cell"))


def _s2_tiles_sql() -> str:
    from .tiles import s2_cell_oracle_sql

    return s2_cell_oracle_sql(POINTS_FROM_ORDERS_SQL, level=16, id_col="point_id")


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set quality flags (full §A1.1 set: word count, mean
    word length, symbol ratio, bullet/ellipsis lines, alpha-word
    fraction, English stop-word presence) — integer-exact flags, no FP
    divisions. Bullet threshold is the paper's >90% (ADVICE r04)."""
    from .operators.textprep import gopher_quality_flags

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_flags(d)


GOPHER_QUALITY_SQL = r"""
    WITH base AS (
        SELECT doc_id, text,
               (text IS NULL OR length(trim(text)) = 0) AS empty,
               regexp_split_to_array(trim(text), '[ \t\r\n\x0b\f]+') AS words,
               regexp_split_to_array(text, '\r?\n') AS lines
        FROM documents
    ), c AS (
        SELECT doc_id,
               (CASE WHEN empty THEN 0 ELSE len(words) END)::BIGINT AS n_words,
               (CASE WHEN empty THEN 0
                     ELSE list_sum(list_transform(words, w -> length(w))) END)::BIGINT
                 AS total_word_len,
               (CASE WHEN empty THEN 0
                     ELSE len(regexp_extract_all(text, '#|\.\.\.')) END)::BIGINT AS n_sym,
               (CASE WHEN empty THEN 0
                     ELSE len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) END)::BIGINT
                 AS n_alpha_words,
               (CASE WHEN empty THEN 0 ELSE len(lines) END)::BIGINT AS n_lines,
               (CASE WHEN empty THEN 0
                     ELSE len(list_filter(lines, l -> regexp_matches(l, '^[ \t\r\n\x0b\f]*[-*•]'))) END)::BIGINT
                 AS n_bullet_lines,
               (CASE WHEN empty THEN 0
                     ELSE len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\z'))) END)::BIGINT
                 AS n_ellipsis_lines,
               (CASE WHEN empty THEN 0
                     ELSE len(list_filter(words, w -> list_contains(
                          ['the','be','to','of','and','that','have','with'],
                          lower(w)))) END)::BIGINT AS n_stop_words
        FROM base
    )
    SELECT doc_id, n_words, total_word_len, n_sym, n_alpha_words, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_stop_words,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (total_word_len >= 3 * n_words AND total_word_len <= 10 * n_words)
             AS ok_mean_word_len,
           (10 * n_sym < greatest(n_words, 1)) AS ok_symbol_ratio,
           (10 * n_bullet_lines <= 9 * n_lines) AS ok_bullet_lines,
           (10 * n_ellipsis_lines <= 3 * n_lines) AS ok_ellipsis_lines,
           (5 * n_alpha_words >= 4 * n_words) AS ok_alpha_words,
           (n_stop_words >= 2) AS ok_stop_words,
           ((n_words >= 50 AND n_words <= 100000)
            AND (total_word_len >= 3 * n_words AND total_word_len <= 10 * n_words)
            AND (10 * n_sym < greatest(n_words, 1))
            AND (10 * n_bullet_lines <= 9 * n_lines)
            AND (10 * n_ellipsis_lines <= 3 * n_lines)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (n_stop_words >= 2)) AS gopher_pass
    FROM c
"""


QUERIES = {
    "tile_assign": (q_tile_assign, TILE_ASSIGN_SQL),
    "gopher_quality": (q_gopher_quality, GOPHER_QUALITY_SQL),
    "tile_hist_h3_7": (q_tile_hist, TILE_HIST_SQL),
    "pip_admins": (q_pip_admins, PIP_ORACLE_SQL),
    "pip_admins_partitioned": (q_pip_admins_partitioned, PIP_ORACLE_SQL),
    "pip_city_agg": (q_pip_city_agg, PIP_CITY_AGG_SQL),
    "reverse_knn": (q_reverse_knn, REVERSE_KNN_SQL),
    "dedup_exact": (q_dedup_exact, DEDUP_EXACT_SQL),
    "token_count": (q_token_count, TOKEN_COUNT_SQL),
    "token_count_bpe": (q_token_count_bpe, TOKEN_COUNT_BPE_SQL),
    "quality_score": (q_quality_score, QUALITY_SCORE_SQL),
    "stopword_ratio": (q_stopword_ratio, STOPWORD_RATIO_SQL),
    "doc_fingerprint": (q_doc_fingerprint, DOC_FINGERPRINT_SQL),
    "lang_guess": (q_lang_guess, LANG_GUESS_SQL),
    "embed_cosine_topk": (q_embed_cosine_topk, EMBED_COSINE_SQL),
    "s2_tiles": (q_s2_tiles, _s2_tiles_sql()),
    "geohash6": (q_geohash6, _geohash6_sql()),
    "repetition_3gram": (q_repetition_3gram, REPETITION_3GRAM_SQL),
    "shared_ngram_docs": (q_shared_ngram_docs, SHARED_NGRAM_DOCS_SQL),
    "pii_scrub": (q_pii_scrub, _pii_scrub_sql()),
    "sessionize_events": (q_sessionize, SESSIONIZE_SQL),
    "events_asof": (q_events_asof, EVENTS_ASOF_SQL),
    "events_range_join": (q_events_range_join, EVENTS_RANGE_JOIN_SQL),
}

from .gate_dedup import DEDUP_QUERIES  # noqa: E402
from .gate_extra import EXTRA_QUERIES  # noqa: E402
from .gate_geocode import GEOCODE_QUERIES  # noqa: E402
from .gate_media import MEDIA_QUERIES  # noqa: E402
from .gate_octagon import octagon_queries  # noqa: E402
from .gate_places import PLACES_QUERIES  # noqa: E402

QUERIES.update(DEDUP_QUERIES)
QUERIES.update(PLACES_QUERIES)
QUERIES.update(octagon_queries())
QUERIES.update(GEOCODE_QUERIES)
QUERIES.update(EXTRA_QUERIES)
QUERIES.update(MEDIA_QUERIES)
