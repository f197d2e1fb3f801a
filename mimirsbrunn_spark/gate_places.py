"""Gate queries + DuckDB oracles for enrichment, streets, stops, ANN.

All geo inputs derive from driver tables (orders/customer/nation) via
exact integer arithmetic; the rect admin hierarchy's enrichment columns
(gate.rect_admins_df) are closed-form, so every expected label / zip /
weight is computable in SQL by floor division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gate import (
    POINTS_FROM_ORDERS_SQL,
    _CITY_H,
    _CITY_W,
    points_from_orders,
    rect_admins_df,
)

# closed-form admin attributes by floor-div indices (must mirror rect_admins_df)
_IDX_SQL = f"""
        SELECT point_id, lon, lat,
               CAST(floor((lon + 180.0) / {_CITY_W}) AS INT) AS ti,
               CAST(floor((lat + 90.0) / {_CITY_H}) AS INT) AS tj
        FROM pts
"""
_CITY_ZIPS = "(CASE WHEN (ti + tj) % 3 = 0 THEN NULL ELSE CAST(20000 + ti * 16 + tj AS VARCHAR) END)"
_STATE_ZIP = "CAST(30000 + (ti // 4) * 4 + (tj // 4) AS VARCHAR)"
_CITY_W8 = "(((ti * 16 + tj) % 100) / 200.0)"


# ---------------------------------------------------------------------------
# address enrichment (bano path through real operators)
# ---------------------------------------------------------------------------


def q_addr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """points → attach → resolve admin structs → enrich: name/label (C1/
    C3 country-keyed order: even rows France = hn-first, odd rows NL =
    street-first, per labels.rs:121-124 + the fr/nl goldens), zip fold
    (A1 + C5 own-zip precedence), weight (A4)."""
    from .operators.enrich import attach_admin_structs, enrich_addresses
    from .operators.pip import attach_admins

    admins = rect_admins_df(spark)
    pts = points_from_orders(spark, sf_dir).select(
        "point_id", "lon", "lat",
        (F.col("point_id") % 200 + 1).cast("string").alias("house_number"),
        F.concat(F.lit("Street "), (F.col("point_id") % 50).cast("string")).alias("street"),
        # every 7th row carries its own zip list (takes precedence over A1)
        F.when(F.col("point_id") % 7 == 0, F.lit("99001;99002")).otherwise(F.lit("")).alias("zip"),
        F.format_string("%011d", F.col("point_id")).alias("id"),
        F.when(F.col("point_id") % 2 == 0, F.lit("fr")).otherwise(F.lit("nl")).alias("cc"),
    )
    out = enrich_addresses(
        attach_admin_structs(attach_admins(pts, admins, strategy="broadcast"), admins),
        country_code=F.col("cc"),
    )
    return out.select(
        "point_id", "name", "label",
        F.concat_ws(",", "zip_codes").alias("zips"),
        F.round("weight", 6).alias("weight"),
        "insee",
    )


ADDR_ENRICH_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    idx AS ({_IDX_SQL}),
    base AS (
        SELECT point_id, ti, tj,
               (CASE WHEN point_id % 2 = 0
                     THEN CAST(point_id % 200 + 1 AS VARCHAR) || ' Street ' || CAST(point_id % 50 AS VARCHAR)
                     ELSE 'Street ' || CAST(point_id % 50 AS VARCHAR) || ' ' || CAST(point_id % 200 + 1 AS VARCHAR)
                END) AS name,
               'city ' || ti || '_' || tj AS city_name,
               {_CITY_ZIPS} AS city_zip,
               {_STATE_ZIP} AS state_zip,
               {_CITY_W8} AS weight,
               (CASE WHEN point_id % 7 = 0 THEN '99001,99002' ELSE NULL END) AS own_zips,
               format('{{:011d}}', point_id) AS idstr
        FROM idx
    )
    SELECT point_id, name,
           name || ' (' || city_name || ')' AS label,
           coalesce(own_zips, city_zip, state_zip) AS zips,
           round(weight, 6) AS weight,
           regexp_replace(substr(idstr, 1, 5), '^0+', '') AS insee
    FROM base
"""


# ---------------------------------------------------------------------------
# J2 — INSEE override join (admin.rs INSEE-keyed replacement): when the
# row carries an INSEE matching an admin, that admin replaces all
# attached admins of its level (others kept, override appended).
# ---------------------------------------------------------------------------


def q_insee_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every third point carries the INSEE of a pseudo-random city
    (50000 + (point_id*11) % 512 → city (k//16, k%16)); after the J2 join
    its level-8 attachment must be that city, others untouched."""
    from .operators.enrich import attach_admin_structs
    from .operators.pip import attach_admins
    from .operators.places import insee_override

    admins = rect_admins_df(spark).withColumn(
        "insee",
        F.when(
            F.col("zone_type") == "city",
            (F.lit(50000) + F.expr("CAST(split(id, ':')[2] AS INT) * 16 + CAST(split(id, ':')[3] AS INT)")).cast("string"),
        ),
    )
    pts = points_from_orders(spark, sf_dir).withColumn(
        "insee",
        F.when(
            F.col("point_id") % 3 == 0,
            (F.lit(50000) + (F.col("point_id").cast("long") * 11) % 512).cast("string"),
        ),
    )
    attached = attach_admin_structs(attach_admins(pts, admins, strategy="broadcast"), admins)
    out = insee_override(attached, admins)
    return out.select(
        "point_id",
        F.array_join(F.array_sort(F.transform("admins", lambda a: a["id"])), ",").alias("admin_ids_csv"),
        F.size("admins").alias("n_admins"),
    )


INSEE_OVERRIDE_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    idx AS ({_IDX_SQL}),
    base AS (
        SELECT point_id,
               (CASE WHEN point_id % 3 = 0
                     THEN (CAST(point_id AS BIGINT) * 11) % 512 END) AS k,
               ti, tj
        FROM idx
    )
    SELECT point_id,
           array_to_string(list_sort([
               CASE WHEN k IS NOT NULL
                    THEN 'adm:t:' || (k // 16) || ':' || (k % 16)
                    ELSE 'adm:t:' || ti || ':' || tj END,
               'adm:s:' || (ti // 4) || ':' || (tj // 4),
               'adm:c:' || (ti // 16) || ':' || (tj // 8)
           ]), ',') AS admin_ids_csv,
           3 AS n_admins
    FROM base
"""


# ---------------------------------------------------------------------------
# C6/J4/F6 — id normalization: addr id with fixed-point precision
# (openaddresses.rs variant), french retro-compat admin ids
# (admin.rs:140-147), INSEE/FANTOIR slicing (bano.rs:56-63).
# ---------------------------------------------------------------------------


def q_id_norm_retro(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.enrich import addr_id, admin_id, insee_fantoir

    pts = points_from_orders(spark, sf_dir).select(
        "point_id", "lon", "lat",
        F.concat(
            (F.col("point_id") % 90).cast("string"), F.lit(" "),
            F.element_at(
                F.array(F.lit("b/2"), F.lit("t.3"), F.lit("c;4"), F.lit("bis")),
                (F.col("point_id") % 4 + 1).cast("int"),
            ),
        ).alias("hn"),
        F.format_string("%011d", F.col("point_id")).alias("id11"),
        F.concat(F.lit("r"), F.col("point_id").cast("string")).alias("osm_id"),
        F.when(
            F.col("point_id") % 5 == 0,
            F.concat(F.lit("751"), (F.col("point_id") % 100).cast("string")),
        ).alias("fr_insee"),
    )
    insee, fantoir = insee_fantoir("id11")
    return pts.select(
        "point_id",
        addr_id("lon", "lat", "hn", id_precision=6).alias("addr_id"),
        insee.alias("insee"),
        fantoir.alias("fantoir"),
        admin_id("osm_id", "fr_insee", french_id_retrocompatibility=True).alias("admin_id"),
    )


ID_NORM_RETRO_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    base AS (
        SELECT point_id, lon, lat,
               CAST(point_id % 90 AS VARCHAR) || ' ' ||
                   (['b/2', 't.3', 'c;4', 'bis'])[CAST(point_id % 4 AS INT) + 1] AS hn,
               printf('%011d', point_id) AS id11,
               'r' || CAST(point_id AS VARCHAR) AS osm_id,
               (CASE WHEN point_id % 5 = 0
                     THEN '751' || CAST(point_id % 100 AS VARCHAR) END) AS fr_insee
        FROM pts
    )
    SELECT point_id,
           'addr:' || printf('%.6f', lon) || ';' || printf('%.6f', lat) || ':' ||
               regexp_replace(regexp_replace(hn, '[ \t\r\n]+', '', 'g'), '[/.:;]', '-', 'g') AS addr_id,
           regexp_replace(substr(id11, 1, 5), '^0+', '') AS insee,
           substr(id11, 1, 10) AS fantoir,
           (CASE WHEN fr_insee IS NOT NULL AND length(fr_insee) > 0
                 THEN 'admin:fr:' || fr_insee
                 ELSE 'admin:osm:' || osm_id END) AS admin_id
    FROM base
"""


# ---------------------------------------------------------------------------
# C4/C5 — zip parsing (';'-split, drop empties, sort) and zip label
# formatting ("(z)" single / "(z1-z2)" range, osm_reader/admin.rs:62-85).
# ---------------------------------------------------------------------------


def q_zip_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.enrich import format_zip_label, split_zip_codes

    pts = points_from_orders(spark, sf_dir).select(
        "point_id",
        F.element_at(
            F.array(
                F.lit(""),
                F.lit("75001"),
                F.concat(F.lit("75010;750"), (F.col("point_id") % 10).cast("string")),
                F.concat(F.lit(";75003;;750"), (F.col("point_id") % 7).cast("string"), F.lit(";75002")),
            ),
            (F.col("point_id") % 4 + 1).cast("int"),
        ).alias("zip_raw"),
    )
    zips = split_zip_codes("zip_raw")
    return pts.select(
        "point_id",
        F.array_join(zips, ",").alias("zips_csv"),
        format_zip_label(zips).alias("zip_label"),
    )


ZIP_LABELS_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    base AS (
        SELECT point_id,
               ListT.l AS zip_raw
        FROM pts,
        LATERAL (SELECT (['', '75001',
                          '75010;750' || CAST(point_id % 10 AS VARCHAR),
                          ';75003;;750' || CAST(point_id % 7 AS VARCHAR) || ';75002'
                         ])[CAST(point_id % 4 AS INT) + 1] AS l) AS ListT
    ),
    split AS (
        SELECT point_id,
               list_sort(list_filter(string_split(zip_raw, ';'), x -> x <> '')) AS zips
        FROM base
    )
    SELECT point_id,
           coalesce(array_to_string(zips, ','), '') AS zips_csv,
           (CASE WHEN len(zips) = 0 THEN ''
                 WHEN len(zips) = 1 THEN ' (' || zips[1] || ')'
                 ELSE ' (' || zips[1] || '-' || zips[len(zips)] || ')' END) AS zip_label
    FROM split
"""


# ---------------------------------------------------------------------------
# streets pipeline (F1 + G10 + G6 + W1 through real operators)
# ---------------------------------------------------------------------------


def q_streets_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ways with 3 nodes (middle = base point); colliding names force
    (name, city) dedup with min-osm-id-wins; every 13th way is an
    excluded bus_stop (F1)."""
    from .operators.places import streets_pipeline

    pts = points_from_orders(spark, sf_dir)
    raw = pts.select(
        F.col("point_id").cast("long").alias("osm_id"),
        F.lit("way").alias("kind"),
        F.concat(F.lit("S"), (F.col("point_id") % 300).cast("string")).alias("name"),
        F.when(F.col("point_id") % 13 == 0, F.lit("bus_stop")).otherwise(F.lit("residential")).alias("highway"),
        F.lit(None).cast("string").alias("public_transport"),
        F.array(
            F.struct((F.col("lon") - 1e-4).alias("lon"), F.col("lat").alias("lat")),
            F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat")),
            F.struct((F.col("lon") + 1e-4).alias("lon"), F.col("lat").alias("lat")),
        ).alias("node_points"),
    )
    admins = rect_admins_df(spark)
    out = streets_pipeline(raw, admins)
    return out.select(
        "street_id", "name", "city_id",
        F.size("branch_admin_ids").alias("n_admins"),
    )


STREETS_DEDUP_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    idx AS ({_IDX_SQL}),
    valid AS (
        SELECT point_id, ti, tj, 'S' || CAST(point_id % 300 AS VARCHAR) AS name,
               'adm:t:' || ti || ':' || tj AS city_id
        FROM idx WHERE point_id % 13 != 0
    ),
    dedup AS (
        SELECT name, city_id, min(point_id) AS osm_id
        FROM valid GROUP BY name, city_id
    )
    SELECT 'street:osm:way:' || CAST(osm_id AS VARCHAR) AS street_id,
           name, city_id, 3 AS n_admins
    FROM dedup
"""


# ---------------------------------------------------------------------------
# stop weights (A6/A7/J7 through stops_pipeline)
# ---------------------------------------------------------------------------

_MODES = ["Bus", "Tramway", "Metro", "RapidTransit", "Ferry"]
# reference config values (config/ntfs2mimir/default.toml): RapidTransit
# and Ferry are both 8.0 there
_MODE_W = {"Bus": 1.0, "Tramway": 2.0, "Metro": 5.0, "RapidTransit": 8.0, "Ferry": 8.0}


def q_stop_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.places import stops_pipeline

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    base = c.select(
        F.col("c_custkey").alias("ck"),
        ((k * 48271) % 360_000_000 / 1_000_000.0 - 180.0).alias("lon"),
        ((k * 16807 + 3) % 180_000_000 / 1_000_000.0 - 90.0).alias("lat"),
    )
    raw = base.select(
        F.concat(F.lit("SA:"), F.col("ck").cast("string")).alias("stop_area_id"),
        F.concat(F.lit("stop "), F.col("ck").cast("string")).alias("name"),
        "lon", "lat",
        F.transform(
            F.sequence(F.lit(1), (F.col("ck") % 7 + 1).cast("int")),
            lambda i: F.concat(F.lit("sp:"), i.cast("string")),
        ).alias("stop_point_ids"),
        F.array(
            F.element_at(
                F.array(*[F.lit(m) for m in _MODES]), (F.col("ck") % 5 + 1).cast("int")
            )
        ).alias("physical_modes"),
    )
    out = stops_pipeline(raw, rect_admins_df(spark))
    return out.select(
        "stop_area_id",
        "n_stop_points",
        F.round("mode_weight", 6).alias("mode_weight"),
        F.round("weight", 6).alias("weight"),
    )


_MODE_CASE = "CASE ck % 5 WHEN 0 THEN 1.0 WHEN 1 THEN 2.0 WHEN 2 THEN 5.0 WHEN 3 THEN 8.0 ELSE 8.0 END"

# make_weight parity (stops.rs:138-160): the RAW per-area mode sum is
# averaged with the city weight — no max normalization anywhere in the
# reference path (its count/max initialize_weights has no callers)
STOP_WEIGHTS_SQL = f"""
    WITH base AS (
        SELECT c_custkey AS ck,
               (CAST(c_custkey AS BIGINT) * 48271) % 360000000 / 1000000.0 - 180.0 AS lon,
               (CAST(c_custkey AS BIGINT) * 16807 + 3) % 180000000 / 1000000.0 - 90.0 AS lat
        FROM customer
    ),
    pts AS (
        SELECT ck, lon, lat, ck % 7 + 1 AS n_sp, {_MODE_CASE} AS mode_sum,
               CAST(floor((lon + 180.0) / {_CITY_W}) AS INT) AS ti,
               CAST(floor((lat + 90.0) / {_CITY_H}) AS INT) AS tj
        FROM base
    )
    SELECT 'SA:' || CAST(ck AS VARCHAR) AS stop_area_id,
           n_sp AS n_stop_points,
           round(mode_sum, 6) AS mode_weight,
           round((mode_sum + {_CITY_W8}) / 2.0, 6) AS weight
    FROM pts
"""


# ---------------------------------------------------------------------------
# ANN (LSH-bucketed cosine top-k through operators/similarity.py)
# ---------------------------------------------------------------------------


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(
        emb.filter(F.col("vec_id") < 20), emb, k=3, bits=6, tables=4, dim=64
    ).select("query_vec", "neighbor_vec", "cosine", F.col("rank").cast("int").alias("rank"))


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the training/serving split (VERDICT r02 #1a): the
    iterative k-means quantizer trains ONCE and persists a quantized
    (cluster, centroid) codebook parquet (resources/); serving — nearest-
    centroid assignment, probing and exact re-rank — is a pure-Catalyst
    join + window plan over the codebook, so this gate now has an EXACT
    DuckDB oracle (the codebook values are inlined as literals). In-
    session iterative training recall stays pinned by pytest
    test_ivf_topk_recall_vs_bruteforce.

    The codebook is the COMMITTED model artifact (resources/, read-only)
    — the same file the oracle inlines — so Spark and DuckDB are
    structurally guaranteed to probe with identical centroids at every
    scale factor (ADVICE r03 #1: the former per-sf_dir training made the
    pair diverge whenever sf_dir != sf0.01). Per-corpus training remains
    available via load_or_train_codebook (content-hash-keyed cache)."""
    from .operators.similarity import committed_codebook_path, ivf_topk, load_or_train_codebook

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    p = committed_codebook_path(16, 3)
    cb = (
        spark.read.parquet(str(p))
        if p.exists()
        else load_or_train_codebook(spark, sf_dir, n_centroids=16, iters=3)
    )
    return ivf_topk(
        emb.filter(F.col("vec_id") < 20), emb, k=3, n_probe=4, centroids=cb
    ).select("query_vec", "neighbor_vec", "cosine", F.col("rank").cast("int").alias("rank"))


def _ivf_sql(n_probe: int = 4, k: int = 3):
    """Exact DuckDB oracle for q_ivf_ann: inline the committed codebook
    artifact (repr-roundtrip double literals) — the SAME file q_ivf_ann
    serves from, at any sf_dir — mirror the assignment / probe windows
    and the fold cosine bit-for-bit. Returns None (rows-only fallback)
    only if the committed codebook parquet is absent."""
    from .operators.similarity import committed_codebook_path

    p = committed_codebook_path(16, 3)
    if not p.exists():
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    rows = ",".join(
        f"({c}, [{','.join(repr(float(v)) for v in vec)}]::DOUBLE[])"
        for c, vec in zip(t.column("cluster").to_pylist(), t.column("centroid").to_pylist())
    )
    return f"""
    WITH cb(cluster, centroid) AS (VALUES {rows}),
    scored AS (
      SELECT e.vec_id, cb.cluster, e.embedding,
             row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_duck_cosine('e.embedding', 'cb.centroid')} DESC, cb.cluster ASC) AS rn
      FROM embeddings e CROSS JOIN cb
    ),
    assigned AS (SELECT vec_id, cluster, embedding FROM scored WHERE rn = 1),
    probes AS (
      SELECT vec_id, cluster, embedding FROM scored WHERE rn <= {n_probe} AND vec_id < 20
    ),
    cand AS (
      SELECT p.vec_id AS query_vec, a.vec_id AS neighbor_vec,
             p.embedding AS qe, a.embedding AS ce
      FROM probes p JOIN assigned a USING (cluster)
      WHERE p.vec_id <> a.vec_id
    ),
    rescored AS (
        SELECT query_vec, neighbor_vec,
               round({_duck_cosine('qe', 'ce')}, 6) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT query_vec, neighbor_vec, cosine,
               row_number() OVER (PARTITION BY query_vec ORDER BY cosine DESC, neighbor_vec ASC) AS rank
        FROM rescored
    )
    SELECT query_vec, neighbor_vec, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _duck_hp(t: int, b: int) -> str:
    x = f"({t} * 1009 + {b} * 101 + i)"
    return f"(((1103515245::BIGINT * {x} + 12345) % 2147483647) / 2147483647.0 - 0.5)"


def _duck_sig(t: int, bits: int = 6) -> str:
    terms = []
    for b in range(bits):
        dot = (
            "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, 64),"
            f" i -> embedding[i + 1]::DOUBLE * {_duck_hp(t, b)})), (a, v) -> a + v)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _ann_sql(bits: int = 6, tables: int = 4) -> str:
    sig_rows = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS lsh_table, {_duck_sig(t, bits)} AS sig FROM embeddings"
        for t in range(tables)
    )
    return f"""
    WITH sigs AS ({sig_rows}),
    cand AS (
        SELECT DISTINCT a.vec_id AS query_vec, b.vec_id AS neighbor_vec,
               a.embedding AS qe, b.embedding AS ce
        FROM sigs a JOIN sigs b USING (lsh_table, sig)
        WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
    ),
    scored AS (
        SELECT query_vec, neighbor_vec,
               round({_duck_cosine('qe', 'ce')}, 6) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT query_vec, neighbor_vec, cosine,
               row_number() OVER (PARTITION BY query_vec ORDER BY cosine DESC, neighbor_vec ASC) AS rank
        FROM scored
    )
    SELECT query_vec, neighbor_vec, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine >= 0.25 among the
    corpus ∪ noise-free self-copies (vec_id+10000), guaranteeing true
    near-dups exist; the detector is the dedup decision, not top-k."""
    from .operators.similarity import _cosine_fold

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    aug = e.select("vec_id", "embedding").unionByName(
        e.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    a, b = aug.alias("a"), aug.alias("b")
    cos = F.round(F.expr(_cosine_fold("a.embedding", "b.embedding")), 6)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


def _duck_cosine(qe: str, ce: str, dim: int = 64) -> str:
    """Guarded DuckDB cosine mirroring operators/similarity._cosine_fold
    (zero-norm vectors -> 0.0, never NaN)."""
    dot = (
        f"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {dim + 1}),"
        f" i -> {qe}[i]::DOUBLE * {ce}[i]::DOUBLE)), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {dim + 1}),"
        f" i -> {qe}[i]::DOUBLE * {qe}[i]::DOUBLE)), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {dim + 1}),"
        f" i -> {ce}[i]::DOUBLE * {ce}[i]::DOUBLE)), (x, y) -> x + y))"
    )
    return f"(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END)"


EMBED_NEARDUP_SQL = f"""
    WITH aug AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_duck_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.25
"""


def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION near-dup threshold path (lsh_neardup_pairs):
    signature buckets → exact cosine >= 0.95 in-bucket, verified
    hash-exact against the brute-force ground truth. Near-dups are the
    corpus plus slightly-perturbed copies (element 1 + 0.05, vec_id +
    10000, double-cast in both engines so the arithmetic is bit-equal);
    at 0.95 random cross-pairs are impossible (7+ sigma for dim-64
    noise), so exact-recall is a property of the fixed sf data, checked
    here, not a distributional hope."""
    from .operators.similarity import lsh_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    near = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    aug = e.unionByName(near)
    return lsh_neardup_pairs(aug, threshold=0.95, bits=6, tables=4, dim=64)


EMBED_NEARDUP_LSH_SQL = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
        FROM embeddings
    ),
    aug AS (
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT vec_id + 10000 AS vec_id,
               list_prepend(embedding[1] + 0.05, embedding[2:]) AS embedding
        FROM base
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_duck_cosine('a.embedding', 'b.embedding')}, 6) AS cosine
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.95
"""


# ---------------------------------------------------------------------------
# raster↔vector coverage join (G16 machinery) vs closed-form cover oracle
# ---------------------------------------------------------------------------


def q_coverage_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-derived point raster (res 7) joined against the rect admins'
    multi-res cell covers via the real cell_coverage_join (integer
    ancestor reprojection, no geometry). The rect hierarchy aligns
    exactly to cell boundaries, so membership — including shared
    boundary cells — has a closed form the oracle reproduces."""
    from .operators.coverage import cell_coverage_join
    from .tiles import grid_cell_col

    pts = points_from_orders(spark, sf_dir)
    raster = pts.select("point_id", grid_cell_col("lon", "lat", 7).alias("cell"))
    joined = cell_coverage_join(raster, rect_admins_df(spark), res=7)
    return joined.select("point_id", "admin_id").distinct()


# cover geometry (see rect_admins_df): cities covered at res2 (9×17 cells,
# ranges [8ti, 8ti+8]×[16tj, 16tj+16]), states and countries at res0
# (states [8si,8si+8]×[16sj,16sj+16]; countries [32ci,32ci+32]×[32cj,32cj+32],
# right edges clamped to the grid). A raster res-7 cell reprojects by
# integer shifts: res2 = >>5, res0 = >>7. Boundary cells belong to both
# neighbors (i%step==0 → also the left/lower admin).
COVERAGE_CELLS_SQL = f"""
    WITH pts AS ({POINTS_FROM_ORDERS_SQL}),
    cells AS (
        SELECT point_id,
               least(greatest(CAST(floor((lon + 180.0) / 360.0 * 8192.0) AS BIGINT), 0), 8191) AS i7,
               least(greatest(CAST(floor((lat + 90.0) / 180.0 * 8192.0) AS BIGINT), 0), 8191) AS j7
        FROM pts
    ),
    proj AS (
        SELECT point_id, i7 // 32 AS i2, j7 // 32 AS j2, i7 // 128 AS i0, j7 // 128 AS j0
        FROM cells
    ),
    cities AS (
        SELECT point_id, 'adm:t:' || ti || ':' || tj AS admin_id
        FROM proj,
             unnest(list_concat([i2 // 8], CASE WHEN i2 % 8 = 0 AND i2 // 8 - 1 >= 0 THEN [i2 // 8 - 1] ELSE [] END)) AS a(ti),
             unnest(list_concat([j2 // 16], CASE WHEN j2 % 16 = 0 AND j2 // 16 - 1 >= 0 THEN [j2 // 16 - 1] ELSE [] END)) AS b(tj)
    ),
    states AS (
        SELECT point_id, 'adm:s:' || si || ':' || sj AS admin_id
        FROM proj,
             unnest(list_concat([i0 // 8], CASE WHEN i0 % 8 = 0 AND i0 // 8 - 1 >= 0 THEN [i0 // 8 - 1] ELSE [] END)) AS a(si),
             unnest(list_concat([j0 // 16], CASE WHEN j0 % 16 = 0 AND j0 // 16 - 1 >= 0 THEN [j0 // 16 - 1] ELSE [] END)) AS b(sj)
    ),
    countries AS (
        SELECT point_id, 'adm:c:' || ci || ':' || cj AS admin_id
        FROM proj,
             unnest(list_concat([i0 // 32], CASE WHEN i0 % 32 = 0 AND i0 // 32 - 1 >= 0 THEN [i0 // 32 - 1] ELSE [] END)) AS a(ci),
             unnest(list_concat([j0 // 32], CASE WHEN j0 % 32 = 0 AND j0 // 32 - 1 >= 0 THEN [j0 // 32 - 1] ELSE [] END)) AS b(cj)
    )
    SELECT DISTINCT point_id, admin_id FROM (
        SELECT * FROM cities UNION ALL SELECT * FROM states UNION ALL SELECT * FROM countries
    )
"""


PLACES_QUERIES = {
    "addr_enrich": (q_addr_enrich, ADDR_ENRICH_SQL),
    "insee_override": (q_insee_override, INSEE_OVERRIDE_SQL),
    "id_norm_retro": (q_id_norm_retro, ID_NORM_RETRO_SQL),
    "zip_labels": (q_zip_labels, ZIP_LABELS_SQL),
    "streets_dedup": (q_streets_dedup, STREETS_DEDUP_SQL),
    "stop_weights": (q_stop_weights, STOP_WEIGHTS_SQL),
    "ann_lsh_topk": (q_ann_lsh, _ann_sql()),
    "ivf_ann_topk": (q_ivf_ann, _ivf_sql()),
    "embed_neardup_pairs": (q_embed_neardup, EMBED_NEARDUP_SQL),
    "embed_neardup_lsh": (q_embed_neardup_lsh, EMBED_NEARDUP_LSH_SQL),
    "coverage_cells": (q_coverage_cells, COVERAGE_CELLS_SQL),
}


# ---------------------------------------------------------------------------
# SemDeDup — cluster-bucketed semantic dedup decision (Abbas et al. 2023)
# ---------------------------------------------------------------------------


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the corpus ∪ perturbed self-copies (the
    embed_neardup_lsh augmentation: element 1 + 0.05, vec_id + 10000,
    double-cast in both engines): every (v, v+10000) pair is a semantic
    duplicate at eps=0.05, so each component must keep exactly one
    member — the one FARTHEST from its cluster centroid (the paper's
    keep rule). Serves from the committed codebook artifact, the same
    file the oracle inlines (the ivf_ann_topk serving pattern)."""
    from .operators.similarity import (
        committed_codebook_path,
        load_or_train_codebook,
        semdedup,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    near = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    aug = e.unionByName(near)
    p = committed_codebook_path(16, 3)
    cb = (
        spark.read.parquet(str(p))
        if p.exists()
        else load_or_train_codebook(spark, sf_dir, n_centroids=16, iters=3)
    )
    return semdedup(aug, cb, eps=0.05).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("component").cast("long").alias("component"),
        F.col("keep"),
    )


def _semdedup_sql(eps: float = 0.05):
    """Exact DuckDB oracle for q_semdedup: inline the committed codebook,
    mirror the argmax assignment (raw-double order, cluster-asc ties),
    the within-cluster eps-ball pairs on round(cosine, 6), the recursive
    min-label closure, and the keep-the-farthest-from-centroid window.
    None (rows-only fallback) only if the committed codebook is absent."""
    from .operators.similarity import committed_codebook_path

    p = committed_codebook_path(16, 3)
    if not p.exists():
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    rows = ",".join(
        f"({c}, [{','.join(repr(float(v)) for v in vec)}]::DOUBLE[])"
        for c, vec in zip(t.column("cluster").to_pylist(), t.column("centroid").to_pylist())
    )
    threshold = repr(round(1.0 - eps, 6))
    return f"""
    WITH RECURSIVE base AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
        FROM embeddings
    ),
    aug AS (
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT vec_id + 10000 AS vec_id,
               list_prepend(embedding[1] + 0.05, embedding[2:]) AS embedding
        FROM base
    ),
    cb(cluster, centroid) AS (VALUES {rows}),
    scored AS (
        SELECT a.vec_id, a.embedding, cb.cluster,
               {_duck_cosine('a.embedding', 'cb.centroid')} AS c,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY {_duck_cosine('a.embedding', 'cb.centroid')} DESC,
                            cb.cluster ASC) AS rn
        FROM aug a CROSS JOIN cb
    ),
    assigned AS (
        SELECT vec_id, embedding, cluster, round(c, 6) AS ccos,
               sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range(1, 65),
                        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
                    (x, y) -> x + y)) AS nv
        FROM scored WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM assigned a JOIN assigned b USING (cluster)
        WHERE a.vec_id < b.vec_id
          AND round(CASE WHEN a.nv * b.nv = 0 THEN 0.0 ELSE
                list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
                    (x, y) -> x + y) / (a.nv * b.nv) END, 6) >= {threshold}
    ),
    edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION SELECT vb AS src, va AS dst FROM pairs
    ),
    reach AS (
        SELECT DISTINCT src AS vec_id, src AS r FROM edges
        UNION
        SELECT re.vec_id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r
    ),
    comps AS (SELECT vec_id, min(r) AS component FROM reach GROUP BY vec_id),
    ranked AS (
        SELECT c.vec_id, c.component,
               row_number() OVER (PARTITION BY c.component
                   ORDER BY a.ccos ASC, c.vec_id ASC) AS rn
        FROM comps c JOIN assigned a USING (vec_id)
    )
    SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
           CAST(a.cluster AS INT) AS cluster,
           CAST(coalesce(r.component, a.vec_id) AS BIGINT) AS component,
           (r.vec_id IS NULL OR r.rn = 1) AS keep
    FROM assigned a LEFT JOIN ranked r USING (vec_id)
    """


PLACES_QUERIES["semdedup_keep"] = (q_semdedup, _semdedup_sql())


# ---------------------------------------------------------------------------
# int8 scalar quantization (operators/similarity.quantize_int8 / int8_topk)
# ---------------------------------------------------------------------------


def q_int8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization itself, hashed code-for-code: per-vector scale +
    posexploded int8 codes (floor(x/scale + 0.5), engine-exact by
    construction — no SQL round() half-case ambiguity)."""
    from .operators.similarity import quantize_int8

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    return quantize_int8(e).select(
        "vec_id", "scale", F.posexplode("codes").alias("slot", "code")
    ).select("vec_id", "scale", F.col("slot").cast("int").alias("slot"),
             F.col("code").cast("int").alias("code"))


INT8_CODES_SQL = """
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
    ),
    s AS (
        SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v
    ),
    q AS (
        SELECT vec_id, amax / 127.0 AS scale,
               CASE WHEN amax = 0 THEN list_transform(e, x -> 0)
                    ELSE list_transform(e, x -> CAST(floor(x / (amax / 127.0) + 0.5) AS INT))
               END AS codes
        FROM s
    )
    SELECT vec_id, scale, CAST(sl.slot AS INT) AS slot,
           CAST(codes[sl.slot + 1] AS INT) AS code
    FROM q, (SELECT unnest(range(0, 64)) AS slot) sl
"""


def q_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine over the int8-dequantized vectors (the 4×-cheaper
    serving representation) for the vec_id < 20 query set — the scoring
    kernel a 100-TB tier holds in memory; recall vs float32 is pinned
    in pytest, exactness of the quantized score is gated here."""
    from .operators.similarity import int8_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    return int8_topk(e.filter(F.col("vec_id") < 20), e, k=3).select(
        "query_vec", "neighbor_vec", "cosine", F.col("rank").cast("int").alias("rank")
    )


INT8_TOPK_SQL = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
    ),
    s AS (
        SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v
    ),
    dq AS (
        SELECT vec_id,
               CASE WHEN amax = 0 THEN list_transform(e, x -> 0.0)
                    ELSE list_transform(e,
                         x -> CAST(floor(x / (amax / 127.0) + 0.5) AS INT) * (amax / 127.0))
               END AS e
        FROM s
    ),
    cand AS (
        SELECT a.vec_id AS query_vec, b.vec_id AS neighbor_vec,
               round({_duck_cosine('a.e', 'b.e')}, 6) AS cosine
        FROM dq a JOIN dq b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 20
    ),
    ranked AS (
        SELECT query_vec, neighbor_vec, cosine,
               row_number() OVER (PARTITION BY query_vec
                   ORDER BY cosine DESC, neighbor_vec ASC) AS rank
        FROM cand
    )
    SELECT query_vec, neighbor_vec, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
"""


PLACES_QUERIES["embed_int8_codes"] = (q_int8_codes, INT8_CODES_SQL)
PLACES_QUERIES["int8_ann_topk"] = (q_int8_topk, INT8_TOPK_SQL)


# ---------------------------------------------------------------------------
# Product quantization (operators/similarity.pq_encode / pq_adc_topk)
# ---------------------------------------------------------------------------


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding code-for-code: every vector's 8 subspace argmin codes
    against the committed M=8/K=16 codebook artifact (the same file the
    oracle inlines), posexploded to (vec_id, subspace, code)."""
    from .operators.similarity import load_or_train_pq_codebook, pq_encode

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cb = load_or_train_pq_codebook(spark, sf_dir)
    return pq_encode(e, cb).select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    ).select(
        "vec_id",
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )


def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-3 for the vec_id < 20 query set: float query vs
    PQ-encoded corpus — the 32x-compressed serving tier. Approximation
    quality vs exact L2 is pinned in pytest; exactness of the ADC
    arithmetic is gated here."""
    from .operators.similarity import (
        load_or_train_pq_codebook,
        pq_adc_topk,
        pq_encode,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cb = load_or_train_pq_codebook(spark, sf_dir)
    codes = pq_encode(e, cb)
    return pq_adc_topk(e.filter(F.col("vec_id") < 20), codes, cb, k=3).select(
        "query_vec", "neighbor_vec", "adc_dist", F.col("rank").cast("int").alias("rank")
    )


def _pq_cb_values():
    from .operators.similarity import committed_pq_codebook_path

    p = committed_pq_codebook_path()
    if not p.exists():
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    return ",".join(
        f"({m}, {c}, [{','.join(repr(float(v)) for v in vec)}]::DOUBLE[])"
        for m, c, vec in zip(
            t.column("subspace").to_pylist(),
            t.column("code").to_pylist(),
            t.column("centroid").to_pylist(),
        )
    )


_DUCK_SUB_D2 = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 9),"
    " i -> ({s}[i] - {c}[i]) * ({s}[i] - {c}[i]))), (x, y) -> x + y)"
)


def _pq_encode_cte() -> str:
    """Shared encode CTE text: v → per-subspace slices → argmin codes."""
    sub = "list_transform(range(1, 9), i -> e[m.subspace * 8 + i])"
    d2 = _DUCK_SUB_D2.format(s="sub.s", c="cb.centroid")
    return f"""
    v AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
    ),
    sub AS (
        SELECT vec_id, m.subspace, {sub} AS s
        FROM v, (SELECT unnest(range(0, 8)) AS subspace) m
    ),
    scored AS (
        SELECT sub.vec_id, sub.subspace, cb.code,
               row_number() OVER (PARTITION BY sub.vec_id, sub.subspace
                   ORDER BY {d2} ASC, cb.code ASC) AS rn
        FROM sub JOIN cb ON cb.subspace = sub.subspace
    ),
    codes AS (SELECT vec_id, subspace, code FROM scored WHERE rn = 1)
    """


def _pq_codes_sql():
    vals = _pq_cb_values()
    if vals is None:
        return None
    return f"""
    WITH cb(subspace, code, centroid) AS (VALUES {vals}),
    {_pq_encode_cte()}
    SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(code AS INT) AS code
    FROM codes
    """


def _pq_ann_sql(k: int = 3):
    vals = _pq_cb_values()
    if vals is None:
        return None
    qd2 = _DUCK_SUB_D2.format(s="qsub.s", c="cb.centroid")
    qsub = "list_transform(range(1, 9), i -> e[m.subspace * 8 + i])"
    return f"""
    WITH cb(subspace, code, centroid) AS (VALUES {vals}),
    {_pq_encode_cte()},
    qsub AS (
        SELECT vec_id AS query_vec, m.subspace, {qsub} AS s
        FROM v, (SELECT unnest(range(0, 8)) AS subspace) m
        WHERE vec_id < 20
    ),
    qtable AS (
        SELECT qsub.query_vec, qsub.subspace, cb.code, {qd2} AS qd2
        FROM qsub JOIN cb ON cb.subspace = qsub.subspace
    ),
    dist AS (
        SELECT t.query_vec, c.vec_id AS neighbor_vec,
               round(sum(t.qd2), 6) AS adc_dist
        FROM codes c
        JOIN qtable t ON t.subspace = c.subspace AND t.code = c.code
        WHERE t.query_vec <> c.vec_id
        GROUP BY t.query_vec, c.vec_id
    ),
    ranked AS (
        SELECT query_vec, neighbor_vec, adc_dist,
               row_number() OVER (PARTITION BY query_vec
                   ORDER BY adc_dist ASC, neighbor_vec ASC) AS rank
        FROM dist
    )
    SELECT query_vec, neighbor_vec, adc_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


PLACES_QUERIES["pq_codes"] = (q_pq_codes, _pq_codes_sql())
PLACES_QUERIES["pq_ann_topk"] = (q_pq_ann_topk, _pq_ann_sql())
