"""Gate queries + DuckDB oracles for the dedup/similarity operators.

Near-dup inputs are synthesized deterministically from the driver's
``documents`` view: each doc is unioned with a truncated mutant (first
4/5 of its text), guaranteeing near-dup pairs exist — computed
identically in both engines (pure integer/string ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    P,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    with_minhash_signature,
    with_simhash,
)

# ---------------------------------------------------------------------------
# DuckDB fragments mirroring operators/dedup.py exactly
# ---------------------------------------------------------------------------

_DUCK_TOKENS = r"list_filter(string_split_regex(lower(trim(text)), '[ \t\r\n\x0b\f]+'), x -> x != '')"

_DUCK_TOK_IDS = (
    f"list_transform({_DUCK_TOKENS}, tok ->"
    " list_reduce(list_prepend(0::BIGINT,"
    " list_transform(range(1, least(length(tok), 7) + 1),"
    " i -> ascii(substr(tok, i, 1))::BIGINT % 256)),"
    f" (a, c) -> a * 256 + c) % {P})"
)

_DUCK_SHINGLES = (
    "CASE WHEN len(tok_ids) >= 3 THEN"
    " list_transform(range(1, len(tok_ids) - 1),"
    f" i -> (tok_ids[i] * 961 + tok_ids[i + 1] * 31 + tok_ids[i + 2]) % {P})"
    " ELSE [] END"
)


def _duck_minhash(j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return (
        f"list_reduce(list_prepend({P}::BIGINT,"
        f" list_transform(shingles, s -> ({a}::BIGINT * s + {b}) % {P})),"
        " (m, x) -> least(m, x))"
    )


def _duck_band(b: int, rows: int = 4) -> str:
    terms = " + ".join(
        f"mh[{b * rows + r + 1}] * {31 ** (rows - 1 - r)}" for r in range(rows)
    )
    return f"({terms}) % {P}"


def _duck_simhash(bits: int = 16) -> str:
    terms = " + ".join(
        "(CASE WHEN 2 * list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(tok_ids, t -> (t // {1 << j}) % 2)),"
        f" (a, x) -> a + x) > len(tok_ids) THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"CASE WHEN len(tok_ids) = 0 THEN 0 ELSE ({terms}) END"


# augmented corpus: each doc + a truncated mutant (guaranteed near-dups)
AUG_SQL = """
    SELECT doc_id * 2 AS pid, text FROM documents
    UNION ALL
    SELECT doc_id * 2 + 1 AS pid, substr(text, 1, (length(text) * 4) // 5) AS text
    FROM documents
"""


def _aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orig = d.select((F.col("doc_id") * 2).alias("pid"), "text")
    mut = d.select(
        (F.col("doc_id") * 2 + 1).alias("pid"),
        F.expr("substring(text, 1, (length(text) * 4) div 5)").alias("text"),
    )
    return orig.unionByName(mut)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sig = with_minhash_signature(d, k=16)
    return sig.select(
        "doc_id", F.posexplode("minhash").alias("slot", "mh_value")
    )


MINHASH_SIG_SQL = f"""
    WITH ids AS (SELECT doc_id, {_DUCK_TOK_IDS} AS tok_ids FROM documents),
    sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM ids),
    sig AS (SELECT doc_id,
            [{', '.join(_duck_minhash(j) for j in range(16))}] AS mh
            FROM sh)
    SELECT doc_id, CAST(s.slot AS INT) AS slot, mh[s.slot + 1] AS mh_value
    FROM sig, (SELECT unnest(range(0, 16)) AS slot) s
"""


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(_aug_docs(spark, sf_dir), id_col="pid", k=16, bands=4).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
    )


LSH_PAIRS_SQL = f"""
    WITH aug AS ({AUG_SQL}),
    ids AS (SELECT pid, {_DUCK_TOK_IDS} AS tok_ids FROM aug),
    sh AS (SELECT pid, {_DUCK_SHINGLES} AS shingles FROM ids),
    sig AS (SELECT pid, [{', '.join(_duck_minhash(j) for j in range(16))}] AS mh FROM sh),
    buckets AS (
        SELECT pid, b.band, CASE b.band
            WHEN 0 THEN {_duck_band(0)} WHEN 1 THEN {_duck_band(1)}
            WHEN 2 THEN {_duck_band(2)} ELSE {_duck_band(3)} END AS bh
        FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
        WHERE mh[1] < {P}
    )
    SELECT DISTINCT a.pid AS doc_a, b.pid AS doc_b
    FROM buckets a JOIN buckets b USING (band, bh)
    WHERE a.pid < b.pid
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return with_simhash(d, bits=16).select("doc_id", "simhash")


SIMHASH_SQL = f"""
    WITH ids AS (SELECT doc_id, {_DUCK_TOK_IDS} AS tok_ids FROM documents)
    SELECT doc_id, CAST({_duck_simhash(16)} AS BIGINT) AS simhash FROM ids
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _aug_docs(spark, sf_dir), id_col="pid", threshold=0.35, max_id=60
    ).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        "n_inter", "n_union", "jaccard",
    )


NGRAM_JACCARD_SQL = f"""
    WITH aug AS ({AUG_SQL}),
    ids AS (SELECT pid, {_DUCK_TOK_IDS} AS tok_ids FROM aug WHERE pid < 60),
    sh AS (SELECT pid, list_sort(list_distinct({_DUCK_SHINGLES})) AS sh FROM ids),
    pairs AS (
        SELECT a.pid AS doc_a, b.pid AS doc_b,
               len(list_intersect(a.sh, b.sh)) AS n_inter,
               len(list_distinct(list_concat(a.sh, b.sh))) AS n_union
        FROM sh a, sh b WHERE a.pid < b.pid
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           CAST(n_inter AS INT) AS n_inter, CAST(n_union AS INT) AS n_union,
           round(n_inter / n_union, 6) AS jaccard
    FROM pairs
    WHERE n_union > 0 AND n_inter::DOUBLE / n_union >= 0.35
"""


def q_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end production dedup pipeline: MinHash-LSH candidate
    pairs → exact n-gram Jaccard verify over ONLY those pairs (the
    candidates= API — no cartesian anywhere)."""
    docs = _aug_docs(spark, sf_dir)
    cands = lsh_candidate_pairs(docs, id_col="pid", k=16, bands=4)
    return ngram_jaccard_pairs(
        docs, id_col="pid", threshold=0.35, candidates=cands
    ).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        "n_inter", "n_union", "jaccard",
    )


NGRAM_JACCARD_LSH_SQL = f"""
    WITH aug AS ({AUG_SQL}),
    ids AS (SELECT pid, {_DUCK_TOK_IDS} AS tok_ids FROM aug),
    shx AS (SELECT pid, {_DUCK_SHINGLES} AS shingles FROM ids),
    sig AS (SELECT pid, [{', '.join(_duck_minhash(j) for j in range(16))}] AS mh FROM shx),
    buckets AS (
        SELECT pid, b.band, CASE b.band
            WHEN 0 THEN {_duck_band(0)} WHEN 1 THEN {_duck_band(1)}
            WHEN 2 THEN {_duck_band(2)} ELSE {_duck_band(3)} END AS bh
        FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
        WHERE mh[1] < {P}
    ),
    cand AS (
        SELECT DISTINCT a.pid AS doc_a, b.pid AS doc_b
        FROM buckets a JOIN buckets b USING (band, bh)
        WHERE a.pid < b.pid
    ),
    sh AS (SELECT pid, list_sort(list_distinct(shingles)) AS sh FROM shx),
    scored AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.sh, b.sh)) AS n_inter,
               len(list_distinct(list_concat(a.sh, b.sh))) AS n_union
        FROM cand c
        JOIN sh a ON a.pid = c.doc_a
        JOIN sh b ON b.pid = c.doc_b
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           CAST(n_inter AS INT) AS n_inter, CAST(n_union AS INT) AS n_union,
           round(n_inter / n_union, 6) AS jaccard
    FROM scored
    WHERE n_union > 0 AND n_inter::DOUBLE / n_union >= 0.35
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components (min-label propagation)
    over the MinHash-LSH candidate pair graph — the dedup DECISION stage.
    Iterative Spark joins vs an exact DuckDB recursive-CTE closure."""
    from .operators.dedup import neardup_components

    docs = _aug_docs(spark, sf_dir)
    pairs = lsh_candidate_pairs(docs, id_col="pid", k=16, bands=4)
    return neardup_components(pairs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


DEDUP_COMPONENTS_SQL = f"""
    WITH RECURSIVE aug AS ({AUG_SQL}),
    ids AS (SELECT pid, {_DUCK_TOK_IDS} AS tok_ids FROM aug),
    sh AS (SELECT pid, {_DUCK_SHINGLES} AS shingles FROM ids),
    sig AS (SELECT pid, [{', '.join(_duck_minhash(j) for j in range(16))}] AS mh FROM sh),
    buckets AS (
        SELECT pid, b.band, CASE b.band
            WHEN 0 THEN {_duck_band(0)} WHEN 1 THEN {_duck_band(1)}
            WHEN 2 THEN {_duck_band(2)} ELSE {_duck_band(3)} END AS bh
        FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
        WHERE mh[1] < {P}
    ),
    cand AS (
        SELECT DISTINCT a.pid AS doc_a, b.pid AS doc_b
        FROM buckets a JOIN buckets b USING (band, bh)
        WHERE a.pid < b.pid
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION SELECT doc_b AS src, doc_a AS dst FROM cand
    ),
    reach AS (
        SELECT DISTINCT src AS doc_id, src AS r FROM edges
        UNION
        SELECT re.doc_id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY doc_id
"""


DEDUP_QUERIES = {
    "minhash_signature": (q_minhash_sig, MINHASH_SIG_SQL),
    "minhash_lsh_pairs": (q_lsh_pairs, LSH_PAIRS_SQL),
    "simhash16": (q_simhash, SIMHASH_SQL),
    "ngram_jaccard_pairs": (q_ngram_jaccard, NGRAM_JACCARD_SQL),
    "ngram_jaccard_lsh": (q_ngram_jaccard_lsh, NGRAM_JACCARD_LSH_SQL),
    "dedup_components": (q_dedup_components, DEDUP_COMPONENTS_SQL),
}


# ---------------------------------------------------------------------------
# Cross-document line dedup (CCNet/C4-style) with reassembly
# ---------------------------------------------------------------------------

# multi-line corpus synthesized identically in both engines: the sf docs
# are single-line, so each doc becomes 3 lines — its own text, a
# boilerplate footer shared by every doc in the same (doc_id % 7) class
# (guaranteed cross-doc duplicate), and a unique signature line
_LINE_AUG = (
    "boilerplate footer block ",  # shared within each mod-7 class
    "unique signature line of doc ",  # never shared
)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style cross-document line dedup with in-place document
    reassembly (operators/textprep.dedup_lines): boilerplate lines
    (trimmed text in >= 2 distinct docs, >= 10 chars) removed, survivors
    re-joined in original order. The boilerplate footer (1/7 of the
    corpus each) must vanish from every doc; unique signature lines and
    sub-threshold lines must survive verbatim."""
    from .operators.textprep import dedup_lines

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit(_LINE_AUG[0]), (F.col("doc_id") % 7).cast("string")),
            F.concat(F.lit(_LINE_AUG[1]), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return dedup_lines(docs, min_docs=2, min_chars=10)


LINE_DEDUP_SQL = f"""
    WITH docs2 AS (
        SELECT doc_id,
               text || chr(10) || '{_LINE_AUG[0]}' || CAST(doc_id % 7 AS VARCHAR)
                    || chr(10) || '{_LINE_AUG[1]}' || CAST(doc_id AS VARCHAR) AS text
        FROM documents
    ),
    split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs2),
    lines0 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ls) + 1),
                      i -> {{'pos': i, 'line': ls[i]}})) AS s
        FROM split
    ),
    elig AS (
        SELECT doc_id, s.pos AS pos, s.line AS line,
               CASE WHEN len(trim(s.line)) >= 10 THEN trim(s.line) END AS k
        FROM lines0
    ),
    dup AS (
        SELECT k FROM elig WHERE k IS NOT NULL
        GROUP BY k HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
        SELECT e.doc_id, e.pos, e.line
        FROM elig e LEFT JOIN dup d ON e.k = d.k
        WHERE d.k IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS n_lines FROM elig GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS text,
           CAST(t.n_lines AS INT) AS n_lines,
           CAST(t.n_lines - coalesce(r.n_kept, 0) AS INT) AS n_removed
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


DEDUP_QUERIES["line_dedup"] = (q_line_dedup, LINE_DEDUP_SQL)
