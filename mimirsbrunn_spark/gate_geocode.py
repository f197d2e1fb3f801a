"""Driver gates for the forward-geocode scoring path (T1-T9).

Until round 4 the bragi /autocomplete scoring semantics — analyzers
(T1), multi-field string query (T3), matching conditions (T4), type
boost (T6), importance (T7), proximity decay (T8) — were verified only
by pytest unit vectors and the ported feature examples. These gates
drive the REAL ``functions.geocode.forward_geocode`` operator through
the driver's Spark-vs-DuckDB hash compare on a deterministic places
table derived from ``customer`` by exact integer arithmetic.

The DuckDB oracle is *generated* from the same Python constants
(STRING_BOOSTS / TYPE_BOOSTS / IMPORTANCE weights / SYNONYMS) and the
same query-token list (``_query_tokens``) that parameterize the Spark
plan, mirroring the expression tree term by term in DuckDB's lambda
dialect — the same technique as ``geohash_sql_expr`` and the octagon
ray-cast oracle. Reference scoring semantics:
/root/reference/libs/mimir/src/adapters/primary/common/dsl.rs:73-389.

Cross-engine determinism notes:
- every string op (lower/translate/regexp/split/levenshtein/ngram) is
  integer-or-codepoint exact in both engines;
- score arithmetic mirrors the Python loop's left-associated order, so
  both engines evaluate the identical IEEE double sequence; the two
  libm-backed terms (log1p vs ln(1+x), exp in the proximity decay)
  agree to <=1 ulp and the emitted scores are rounded to 6 decimals
  with inter-row gaps >= 1e-4, so ranking cannot flip;
- DuckDB ``list_intersect`` and Spark ``array_intersect`` both return
  the distinct common elements, so the fuzzy minimum_should_match gram
  counting is identical (probed in tests/test_gate_geocode.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.geocode import (
    GLOBAL_BOOST,
    IMPORTANCE_TYPES,
    PROXIMITY_WEIGHT,
    PROXIMITY_WEIGHT_FUZZY,
    STRING_BOOSTS,
    STRING_GLOBAL,
    SYNONYMS,
    TYPE_BOOSTS,
    _auto_fuzz,
    _char_ngrams,
    _msm_fuzzy,
    _msm_search,
    _query_tokens,
    _zoom_weights,
    forward_geocode,
)
from .geometry import haversine_sql

# ---------------------------------------------------------------------------
# deterministic places table from `customer` (exact integer arithmetic)
# ---------------------------------------------------------------------------

VOCAB = [
    "rue", "avenue", "saint", "martin", "grand", "place", "pont", "eglise",
    "port", "marche", "petit", "moulin", "gare", "chateau", "fontaine", "victor",
]
_TYPES = ["admin", "street", "addr", "poi"]


def geocode_places_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Places with 3-word vocab names so every query faces exact, prefix
    and edit-distance near-miss competitors; NULL weights every 11th row
    exercise the `missing` branch of field_value_factor."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    v = F.array(*[F.lit(w) for w in VOCAB])
    k = F.col("c_custkey")
    w1 = F.element_at(v, (k % 16 + 1).cast("int"))
    w2 = F.element_at(v, (F.expr("c_custkey div 16") % 16 + 1).cast("int"))
    w3 = F.element_at(v, (F.expr("c_custkey div 256") % 16 + 1).cast("int"))
    name = F.concat_ws(" ", w1, w2, w3)
    typ = F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (k % 4 + 1).cast("int"))
    return c.select(
        k.alias("id"),
        typ.alias("type"),
        name.alias("name"),
        F.when(
            k % 5 == 0,
            F.concat_ws(" ", F.element_at(v, (F.expr("c_custkey div 3") % 16 + 1).cast("int")), w1),
        ).alias("alt_name"),
        F.concat(name, F.lit(" ville"), (k % 40).cast("string")).alias("label"),
        (F.lit(75000) + k % 120).cast("string").alias("zip_codes_str"),
        F.when(typ == "addr", (k % 300 + 1).cast("string")).alias("house_number"),
        F.when(k % 11 == 0, F.lit(None).cast("double"))
        .otherwise((k % 997).cast("double") / 997.0).alias("weight"),
        ((k * 37 % 3600).cast("double") / 10.0 - 180.0 + 0.05).alias("lon"),
        ((k * 53 % 1700).cast("double") / 10.0 - 85.0 + 0.05).alias("lat"),
    )


_V_SQL = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
_T_SQL = "[" + ", ".join(f"'{t}'" for t in _TYPES) + "]"

PLACES_SQL = f"""
        SELECT c_custkey AS id,
               {_T_SQL}[CAST(c_custkey % 4 AS INT) + 1] AS type,
               {_V_SQL}[CAST(c_custkey % 16 AS INT) + 1]
                 || ' ' || {_V_SQL}[CAST((c_custkey // 16) % 16 AS INT) + 1]
                 || ' ' || {_V_SQL}[CAST((c_custkey // 256) % 16 AS INT) + 1] AS name,
               (CASE WHEN c_custkey % 5 = 0
                     THEN {_V_SQL}[CAST((c_custkey // 3) % 16 AS INT) + 1]
                          || ' ' || {_V_SQL}[CAST(c_custkey % 16 AS INT) + 1]
                END) AS alt_name,
               {_V_SQL}[CAST(c_custkey % 16 AS INT) + 1]
                 || ' ' || {_V_SQL}[CAST((c_custkey // 16) % 16 AS INT) + 1]
                 || ' ' || {_V_SQL}[CAST((c_custkey // 256) % 16 AS INT) + 1]
                 || ' ville' || CAST(c_custkey % 40 AS VARCHAR) AS label,
               CAST(75000 + c_custkey % 120 AS VARCHAR) AS zip_codes_str,
               (CASE WHEN c_custkey % 4 = 2 THEN CAST(c_custkey % 300 + 1 AS VARCHAR) END)
                 AS house_number,
               (CASE WHEN c_custkey % 11 = 0 THEN NULL
                     ELSE CAST(c_custkey % 997 AS DOUBLE) / 997.0 END) AS weight,
               CAST(c_custkey * 37 % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05 AS lon,
               CAST(c_custkey * 53 % 1700 AS DOUBLE) / 10.0 - 85.0 + 0.05 AS lat
        FROM customer
"""

# ---------------------------------------------------------------------------
# DuckDB mirror of the scoring expression tree
# ---------------------------------------------------------------------------

_TRANS_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ"
_TRANS_DST = "aaaaaaceeeeiiiinooooouuuuyyoa"


def _syn_sql(toks: str) -> str:
    """DuckDB mirror of geocode.expand_synonyms: per-token CASE through
    the same SYNONYMS constant, flattened (doc-side canonicalization —
    the synonym filter runs index-side in the reference analyzers)."""
    cases = " ".join(
        "WHEN '{a}' THEN [{words}]".format(
            a=a, words=", ".join(f"'{w}'" for w in c.split())
        )
        for a, c in SYNONYMS.items()
    )
    return f"flatten(list_transform({toks}, t -> CASE t {cases} ELSE [t] END))"


def _toks_sql(col_sql: str) -> str:
    """DuckDB mirror of geocode._tokens_of: T1 analyzer, split, synonym
    canonicalization."""
    norm = (
        f"regexp_replace(trim(regexp_replace(translate(lower({col_sql}), "
        f"'{_TRANS_SRC}', '{_TRANS_DST}'), '\\b[ld]''', '', 'g')), "
        "'[-''(),.;:]', ' ', 'g')"
    )
    return _syn_sql(f"list_filter(regexp_split_to_array({norm}, ' +'), x -> x <> '')")


def _field_score_sql(q_tokens: list[str], toks: str, fuzzy: bool = False) -> str:
    """Mirror of geocode.field_score over a precomputed token-array col."""
    terms = []
    for t in q_tokens:
        exact = f"CAST(list_contains({toks}, '{t}') AS DOUBLE)"
        prefix = f"CAST(len(list_filter({toks}, x -> starts_with(x, '{t}'))) > 0 AS DOUBLE) * 0.5"
        cred = f"greatest({exact}, {prefix})"
        fz = _auto_fuzz(t)
        if fuzzy and fz > 0:
            lev = (
                f"CAST(len(list_filter({toks}, x -> levenshtein(x, '{t}') <= {fz})) > 0"
                f" AS DOUBLE) * 0.7"
            )
            cred = f"greatest({cred}, {lev})"
        terms.append(cred)
    return "coalesce(0.0 + " + " + ".join(terms) + ", 0.0)"


def _string_query_sql(
    q_tokens: list[str], query_type: str, has_coord: bool, lang_toks: str | None = None
) -> str:
    """Mirror of geocode.string_query_score for the places schema above
    (name, alt_name, label, zip_codes_str, house_number present; no
    loc_name). With ``lang_toks`` the label group becomes
    best(label, labels.{lang}) exactly as lang_variant() composes it.
    Group order matches the Python loop."""
    label_fs = _field_score_sql(q_tokens, "label_toks")
    if lang_toks is not None:
        label_fs = f"greatest(({label_fs}), ({_field_score_sql(q_tokens, lang_toks)}))"
    groups = [
        f"({_field_score_sql(q_tokens, 'name_toks')}) * {STRING_BOOSTS['name']!r}",
        f"({_field_score_sql(q_tokens, 'alt_toks')}) * {STRING_BOOSTS['alt_name']!r}",
        f"({label_fs}) * {STRING_BOOSTS['label']!r}",
        f"({_field_score_sql(q_tokens, 'zip_toks')}) * {STRING_BOOSTS['zip_codes']!r}",
        f"({_field_score_sql(q_tokens, 'hn_toks')}) * {STRING_BOOSTS['house_number']!r}",
    ]
    if query_type != "search":
        groups.append(
            f"({_field_score_sql(q_tokens, 'label_toks')}) * {STRING_BOOSTS['label_prefix']!r}"
        )
    if query_type == "fuzzy":
        b = STRING_BOOSTS["label_ngram_with_coord"] if has_coord else STRING_BOOSTS["label_ngram"]
        groups.append(f"({_field_score_sql(q_tokens, 'label_toks', fuzzy=True)}) * {b!r}")
    return "(" + " + ".join(groups) + f") * {STRING_GLOBAL!r}"


_NGRAMS_SQL = (
    "flatten(list_transform(full_toks, tok -> "
    "CASE WHEN length(tok) >= 3 THEN "
    "list_transform(generate_series(1, length(tok) - 2), i -> substr(tok, CAST(i AS INT), 3)) "
    "ELSE CAST([] AS VARCHAR[]) END))"
)


def _matching_sql(q_tokens: list[str], query_type: str) -> str:
    """Mirror of geocode.matching_condition over `full_toks`."""

    def tok_hit(t: str) -> str:
        return f"len(list_filter(full_toks, x -> x = '{t}' OR starts_with(x, '{t}'))) > 0"

    if query_type == "prefix":
        return "(" + " AND ".join(f"({tok_hit(t)})" for t in q_tokens) + ")"
    if query_type == "fuzzy":
        grams = sorted({g for t in q_tokens for g in _char_ngrams(t)})
        if not grams:
            return "FALSE"
        need = _msm_fuzzy(len(grams))
        lit = "[" + ", ".join(f"'{g}'" for g in grams) + "]"
        return f"(len(list_intersect({lit}, {_NGRAMS_SQL})) >= {need})"
    need = _msm_search(len(q_tokens))
    hits = []
    for t in q_tokens:
        fz = _auto_fuzz(t, low=4, high=8)
        h = tok_hit(t)
        if fz > 0:
            h = f"({h}) OR (len(list_filter(full_toks, x -> levenshtein(x, '{t}') <= {fz})) > 0)"
        hits.append(f"CAST(({h}) AS INT)")
    return "((0 + " + " + ".join(hits) + f") >= {need})"


def _importance_sql(query_type: str, coord) -> str:
    """Mirror of geocode.importance_boost (weights are Python constants
    shared by both engines via _zoom_weights)."""
    w = _zoom_weights(query_type, coord)
    type_w = (
        "(CASE type "
        + " ".join(f"WHEN '{t}' THEN CAST({v!r} AS DOUBLE)" for t, v in IMPORTANCE_TYPES.items())
        + " END)"
    )
    fvf = f"(coalesce(weight, {w['missing']!r}) * {w['factor']!r})"
    boost = f"coalesce({type_w}, 0.0) * {fvf}"
    if query_type != "fuzzy":
        admin = (
            f"(CASE WHEN type = 'admin' THEN ln(1.0 + coalesce(weight, 0.0) * 1000000.0)"
            f" * {w['admin']!r} ELSE 0.0 END)"
        )
        boost = f"({boost}) + {admin}"
    return f"({boost})"


def _type_boost_sql() -> str:
    case = (
        "(CASE type "
        + " ".join(f"WHEN '{t}' THEN CAST({v!r} AS DOUBLE)" for t, v in TYPE_BOOSTS.items())
        + " END)"
    )
    return f"coalesce({case} * {GLOBAL_BOOST!r}, 0.0)"


def geocode_oracle_sql(
    q: str, query_type: str, coord=None, k: int = 40, lang: bool = False
) -> str:
    """Full forward_geocode oracle: analyzer CTE -> matching condition ->
    score assembly -> top-k with rank, mirroring forward_geocode exactly.

    ``lang=True`` mirrors the i18n places table (geocode_places_lang_df):
    the labels.{fr} map value participates in the label group via
    best-of-fields and in full_label (copy_to of every i18n label)."""
    q_tokens = _query_tokens(q)
    if not q_tokens:
        # forward_geocode returns places.limit(0); mirror the empty shape
        return (
            "SELECT CAST(NULL AS BIGINT) AS rank, CAST(NULL AS BIGINT) AS id, "
            "CAST(NULL AS VARCHAR) AS type, CAST(NULL AS DOUBLE) AS match_score, "
            "CAST(NULL AS DOUBLE) AS score WHERE FALSE"
        )
    string_sql = _string_query_sql(
        q_tokens, query_type, coord is not None, lang_toks="fr_toks" if lang else None
    )
    score = f"({string_sql}) + {_type_boost_sql()} + {_importance_sql(query_type, coord)}"
    if coord is not None:
        lam = math.log(0.4) / 130_000.0
        hav = haversine_sql(repr(coord[0]), repr(coord[1]), "lon", "lat")
        prox = f"exp({lam!r} * greatest(({hav}) - 20000.0, 0.0))"
        # FUZZY boosts the decay by weight_fuzzy (dsl.rs:162-165)
        prox_w = PROXIMITY_WEIGHT_FUZZY if query_type == "fuzzy" else PROXIMITY_WEIGHT
        score = f"({score}) + ({prox}) * {prox_w!r}"
    # both halves of build_house_number_condition (dsl.rs:219-263):
    # single-word → no addresses at all; multi-word → an address must
    # have a house_number token among the query tokens
    if len(q_tokens) > 1:
        toks_lit = "[" + ", ".join(f"'{t}'" for t in q_tokens) + "]"
        addr_gate = (
            f"AND (type <> 'addr' OR len(list_intersect(hn_toks, {toks_lit})) > 0)"
        )
    else:
        addr_gate = "AND type <> 'addr'"
    fr_col = (
        ", (CASE WHEN id % 3 = 0 THEN label || ' le bourg' END) AS fr_label" if lang else ""
    )
    fr_toks = f", {_toks_sql('fr_label')} AS fr_toks" if lang else ""
    # full_label parts order mirrors full_label_tokens: label, labels.*, zips
    full = (
        "list_concat(list_concat(label_toks, coalesce(fr_toks, CAST([] AS VARCHAR[]))), zip_toks)"
        if lang
        else "list_concat(label_toks, zip_toks)"
    )
    return f"""
    WITH places0 AS ({PLACES_SQL}),
    places AS (SELECT *{fr_col} FROM places0),
    tok AS (
        SELECT *,
               {_toks_sql('name')} AS name_toks,
               {_toks_sql('alt_name')} AS alt_toks,
               {_toks_sql('label')} AS label_toks,
               {_toks_sql('zip_codes_str')} AS zip_toks,
               {_toks_sql('house_number')} AS hn_toks
               {fr_toks}
        FROM places
    ),
    full_tok AS (
        SELECT *, {full} AS full_toks FROM tok
    ),
    scored AS (
        SELECT id, type,
               ({string_sql}) AS match_raw,
               ({score}) AS score_raw
        FROM full_tok
        WHERE ({_matching_sql(q_tokens, query_type)}) {addr_gate}
    ),
    top AS (
        SELECT id, type, match_raw, score_raw,
               row_number() OVER (ORDER BY score_raw DESC, id ASC) AS rank
        FROM scored
        QUALIFY rank <= {k}
    )
    SELECT rank, id, type,
           round(match_raw, 6) AS match_score,
           round(score_raw, 6) AS score
    FROM top
    """


# ---------------------------------------------------------------------------
# gate queries (run the REAL operator)
# ---------------------------------------------------------------------------


def geocode_places_lang_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Places with an i18n ``labels`` map: every third row carries a
    French label variant appending ' le bourg' (mimir-dynamic-mappings
    i18n_labels copy_to semantics)."""
    p = geocode_places_df(spark, sf_dir)
    return p.withColumn(
        "labels",
        F.when(
            F.col("id") % 3 == 0,
            F.create_map(F.lit("fr"), F.concat(F.col("label"), F.lit(" le bourg"))),
        ),
    )


def _run(spark: SparkSession, sf_dir: str, q: str, query_type: str, coord=None,
         k: int = 40, lang: str | None = None) -> DataFrame:
    places = geocode_places_lang_df(spark, sf_dir) if lang else geocode_places_df(spark, sf_dir)
    res = forward_geocode(places, q, k=k, coord=coord, query_type=query_type, lang=lang)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return res.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "type",
        F.round("match_score", 6).alias("match_score"),
        F.round("score", 6).alias("score"),
    )


def q_geocode_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX pass: synonym 'St'->saint (T1), operator-and matching (T4),
    field boosts + label_prefix group (T3), type boost (T6), importance
    with admin log1p (T7), NULL-weight missing branch."""
    return _run(spark, sf_dir, "St-Martin", "prefix")


def q_geocode_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY retry with a coord: ngram minimum_should_match '1<-1 3<-2
    9<-4 20<25%' (T4), levenshtein AUTO credit + ngram-with-coord boost
    (T3), no admin term (T7 fuzzy), exp proximity decay x 0.4 (T8)."""
    return _run(spark, sf_dir, "l'Eglise du Pont", "fuzzy", coord=(2.35, 48.85))


def q_geocode_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/search shape: word-level AUTO:4,8 fuzziness with '4<-1 7<-25%'
    (T4), no label_prefix/ngram groups (T3 search branch)."""
    return _run(spark, sf_dir, "gare Victor", "search")


# ---------------------------------------------------------------------------
# C10 — GeocodeJSON assembly gate
# ---------------------------------------------------------------------------


def q_geocodejson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — run the REAL to_geocodejson serializer (JVM to_json with
    null-field dropping, geocoding.rs:70-110 field mapping) and observe
    the result through re-extraction: the geocoding object's key
    SEQUENCE (which fields serde would skip), postcode = first zip,
    city = the city-zone admin (NOT the first array element — the input
    lists the state first), citycode = insee, region count, and the
    geometry coordinates round-tripped through the JSON text."""
    from .functions.geocodejson import to_geocodejson

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    typ = F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (k % 4 + 1).cast("int"))
    inp = c.select(
        F.concat(F.lit("place:"), k.cast("string")).alias("id"),
        typ.alias("type"),
        F.concat(F.lit("Label "), (k % 97).cast("string")).alias("label"),
        F.concat(F.lit("Name "), (k % 89).cast("string")).alias("name"),
        F.when(typ == "addr", (k % 300 + 1).cast("string")).alias("house_number"),
        F.when(typ.isin("addr", "street"), F.concat(F.lit("Rue "), (k % 53).cast("string"))).alias("street"),
        F.when(k % 3 > 0, F.array((F.lit(75000) + k % 120).cast("string"), F.lit("99999"))).alias("zip_codes"),
        F.when(k % 2 == 0, F.lpad((k % 100).cast("string"), 5, "0")).alias("insee"),
        F.when(
            k % 4 > 0,
            F.array(
                F.struct(
                    F.concat(F.lit("admin:fr:state:"), (k % 7).cast("string")).alias("id"),
                    F.concat(F.lit("Etat "), (k % 7).cast("string")).alias("name"),
                    F.lit(4).alias("level"),
                    F.lit("state_district").alias("zone_type"),
                    F.array(F.lit("30000")).alias("zip_codes"),
                    F.lit(0.25).alias("weight"),
                ),
                F.struct(
                    F.concat(F.lit("admin:fr:city:"), (k % 50).cast("string")).alias("id"),
                    F.concat(F.lit("Ville "), (k % 50).cast("string")).alias("name"),
                    F.lit(8).alias("level"),
                    F.lit("city").alias("zone_type"),
                    F.array((F.lit(20000) + k % 50).cast("string")).alias("zip_codes"),
                    F.lit(0.5).alias("weight"),
                ),
            ),
        ).alias("admins"),
        F.when(
            typ == "poi",
            F.struct(
                F.lit("poi_type:amenity").alias("id"), F.lit("Amenity").alias("name")
            ),
        ).alias("poi_type"),
        ((k * 37 % 3600).cast("double") / 10.0 - 180.0 + 0.05).alias("lon"),
        ((k * 53 % 1700).cast("double") / 10.0 - 85.0 + 0.05).alias("lat"),
    )
    feats = to_geocodejson(inp)
    g = F.get_json_object(F.col("feature"), "$.properties.geocoding")
    return feats.select(
        F.get_json_object("feature", "$.properties.geocoding.id").alias("id"),
        F.concat_ws(",", F.json_object_keys(g)).alias("gkeys"),
        F.get_json_object("feature", "$.properties.geocoding.label").alias("label"),
        F.get_json_object("feature", "$.properties.geocoding.postcode").alias("postcode"),
        F.get_json_object("feature", "$.properties.geocoding.city").alias("city"),
        F.get_json_object("feature", "$.properties.geocoding.citycode").alias("citycode"),
        F.coalesce(
            F.json_array_length(
                F.get_json_object("feature", "$.properties.geocoding.administrative_regions")
            ),
            F.lit(-1),
        ).alias("n_regions"),
        F.round(
            F.get_json_object("feature", "$.geometry.coordinates[0]").cast("double"), 6
        ).alias("lon"),
        F.round(
            F.get_json_object("feature", "$.geometry.coordinates[1]").cast("double"), 6
        ).alias("lat"),
    )


GEOCODEJSON_SQL = """
    SELECT 'place:' || CAST(c_custkey AS VARCHAR) AS id,
           'id,type,label,name'
             || (CASE WHEN c_custkey % 4 = 2 THEN ',housenumber' ELSE '' END)
             || (CASE WHEN c_custkey % 4 IN (1, 2) THEN ',street' ELSE '' END)
             || (CASE WHEN c_custkey % 3 > 0 THEN ',postcode' ELSE '' END)
             || (CASE WHEN c_custkey % 4 > 0 THEN ',city' ELSE '' END)
             || (CASE WHEN c_custkey % 2 = 0 THEN ',citycode' ELSE '' END)
             || (CASE WHEN c_custkey % 4 > 0 THEN ',administrative_regions' ELSE '' END)
             || (CASE WHEN c_custkey % 4 = 3 THEN ',poi_types' ELSE '' END)
             AS gkeys,
           'Label ' || CAST(c_custkey % 97 AS VARCHAR) AS label,
           (CASE WHEN c_custkey % 3 > 0 THEN CAST(75000 + c_custkey % 120 AS VARCHAR) END)
             AS postcode,
           (CASE WHEN c_custkey % 4 > 0 THEN 'Ville ' || CAST(c_custkey % 50 AS VARCHAR) END)
             AS city,
           (CASE WHEN c_custkey % 2 = 0
                 THEN lpad(CAST(c_custkey % 100 AS VARCHAR), 5, '0') END) AS citycode,
           (CASE WHEN c_custkey % 4 > 0 THEN 2 ELSE -1 END) AS n_regions,
           round(CAST(c_custkey * 37 % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05, 6) AS lon,
           round(CAST(c_custkey * 53 % 1700 AS DOUBLE) / 10.0 - 85.0 + 0.05, 6) AS lat
    FROM customer
"""


def q_geocode_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i18n branch: labels.{fr} participates in the label group via
    best-of-fields (T3 lang_variant) and in full_label matching (the
    mapping's copy_to), so 'bourg' only matches rows with a French
    label variant."""
    return _run(spark, sf_dir, "bourg Martin", "prefix", lang="fr")


def q_geocode_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 retry control flow through the driver gate: 'eglize' is a
    prefix of NO vocabulary token (z vs s), so the strict PREFIX pass is
    empty at every scale factor and autocomplete must fall through to
    FUZZY — the gate compares the RETRY's output against the fuzzy
    oracle, so a broken retry (returning the empty strict result, or
    re-running prefix) hash-mismatches."""
    from .functions.geocode import autocomplete

    places = geocode_places_df(spark, sf_dir)
    res, mode = autocomplete(places, "eglize pont", k=40)
    if mode != "fuzzy":  # defensive: surface a wrong mode as a wrong row count
        return res.limit(0)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return res.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "type",
        F.round("match_score", 6).alias("match_score"),
        F.round("score", 6).alias("score"),
    )


GEOCODE_QUERIES = {
    "geocode_prefix": (q_geocode_prefix, geocode_oracle_sql("St-Martin", "prefix")),
    "geocode_fuzzy": (
        q_geocode_fuzzy,
        geocode_oracle_sql("l'Eglise du Pont", "fuzzy", coord=(2.35, 48.85)),
    ),
    "geocode_search": (q_geocode_search, geocode_oracle_sql("gare Victor", "search")),
    "geocode_lang": (
        q_geocode_lang,
        geocode_oracle_sql("bourg Martin", "prefix", lang=True),
    ),
    "geocodejson_features": (q_geocodejson, GEOCODEJSON_SQL),
    "geocode_retry_fuzzy": (q_geocode_retry, geocode_oracle_sql("eglize pont", "fuzzy")),
}
