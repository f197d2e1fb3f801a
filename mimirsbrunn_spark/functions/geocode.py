"""Query-side geocoding: the bragi /autocomplete semantics as DataFrame
score columns (SURVEY §2.9, scope = fixture parity, not BM25 parity).

The reference compiles query params into an Elasticsearch DSL
(/root/reference/libs/mimir/src/adapters/primary/common/dsl.rs); our
"DSL" is a scored DataFrame: candidate filter (T4/T5 matching
conditions) → additive boost columns (T6 type boost, T7 importance,
T8 proximity decay) → orderBy(score desc).limit(k) (W3). Every score
term is a plain column — the reference's /explain endpoint (T10)
degenerates to selecting the term columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.knn import haversine_col

# T6 — type boosts (config/query/default.toml:2-10)
TYPE_BOOSTS = {"addr": 30.0, "admin": 19.0, "stop": 18.0, "poi": 1.5, "street": 1.0}
GLOBAL_BOOST = 0.025

# T1 — the reference's synonym groups (mimir-base.json:~synonyms), each
# alias mapped to its canonical token. Short aliases NOT in this list
# ("p" → place, "r" → rue, "av" → avenue) match through prefix scoring
# instead — exactly how the reference resolves them (edge-ngram .prefix
# field), see the alias examples in features/addresses/limousin.feature.
SYNONYMS = {
    "cc": "centre commercial",
    "ld": "lieu-dit",
    "st": "saint",
    "ste": "sainte",
    "bvd": "boulevard",
    "bld": "boulevard",
    "bd": "boulevard",
    "pt": "pont",
    "rle": "ruelle",
    "rte": "route",
    "vla": "villa",
    "fac": "universite",
    "ufr": "universite",
    "faculte": "universite",
    "chu": "hopital",
    "chr": "hopital",
    "mairie": "hotel de ville",
    "grandchamp": "grand-champ",
}


def normalize_text(col: Column | str) -> Column:
    """T1 analyzer core: lowercase + asciifold (accent strip) + elision
    (French l'/d' prefixes, word_elision analyzer)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    folded = F.translate(
        lowered,
        "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ",
        "aaaaaaceeeeiiiinooooouuuuyyoa",
    )
    elided = F.regexp_replace(folded, r"\b[ld]'", "")
    return F.regexp_replace(F.trim(elided), r"[-']", " ")


def expand_synonyms(tokens: Column) -> Column:
    """Token-level synonym expansion (flatMap through the synonym map)."""
    expr = None
    mapping = F.create_map(
        *[F.lit(x) for kv in SYNONYMS.items() for x in kv]
    )
    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.coalesce(F.split(F.element_at(mapping, t), " "), F.array(t)),
        )
    )


def _query_tokens(q: str) -> list[str]:
    import unicodedata

    folded = "".join(
        c for c in unicodedata.normalize("NFD", q.lower()) if unicodedata.category(c) != "Mn"
    )
    folded = folded.replace("-", " ").replace("'", " ")
    out = []
    for t in folded.split():
        out.extend(SYNONYMS.get(t, t).split())
    return out


def score_expr(q_tokens: list[str], label_col: str = "label") -> Column:
    """T3/T4-ish additive match score on the normalized label:
    +1 per query token contained as a token, +0.5 per token that prefixes
    a label token (the edge-ngram 'prefix' field role)."""
    label_toks = F.split(normalize_text(label_col), " ")
    score = F.lit(0.0)
    for t in q_tokens:
        exact = F.array_contains(label_toks, t).cast("double")
        prefix = (
            F.exists(label_toks, lambda x: x.startswith(t)).cast("double") * F.lit(0.5)
        )
        score = score + F.greatest(exact, prefix)
    return score


def proximity_boost(lon: float, lat: float, scale_m: float = 130_000.0,
                    offset_m: float = 20_000.0, decay: float = 0.4) -> Column:
    """T8 — exp decay around the query coord (dsl.rs:354-389; defaults
    scale 130 km / offset 20 km / decay 0.4, config/query/default.toml)."""
    import math

    dist = haversine_col(F.lit(lon), F.lit(lat), F.col("lon"), F.col("lat"))
    lam = math.log(decay) / scale_m
    return F.exp(F.lit(lam) * F.greatest(dist - F.lit(offset_m), F.lit(0.0)))


def forward_geocode(
    places: DataFrame,
    q: str,
    k: int = 10,
    coord: tuple[float, float] | None = None,
    types: list[str] | None = None,
) -> DataFrame:
    """bragi /autocomplete over a unified places table with columns
    (id, type, name, label, weight, lon, lat [, house_number]).

    PREFIX pass first; FUZZY (relaxed: any-token) fallback when empty is
    the caller's loop, mirroring handlers.rs:144-169 (T9)."""
    q_tokens = _query_tokens(q)
    if types:
        places = places.filter(F.col("type").isin(types))

    # T5 — single-word queries never match addresses (house-number gate)
    if len(q_tokens) <= 1:
        places = places.filter(F.col("type") != "addr")

    type_boost = F.create_map(
        *[F.lit(x) for kv in TYPE_BOOSTS.items() for x in kv]
    )[F.col("type")] * F.lit(GLOBAL_BOOST)

    match = score_expr(q_tokens)
    importance = F.log1p(F.coalesce(F.col("weight"), F.lit(0.0)) * F.lit(1e6)) / F.lit(
        14.0
    )  # T7 — log1p(weight*1e6) admin importance, normalized
    score = match * (F.lit(1.0) + type_boost) + importance
    if coord is not None:
        score = score * proximity_boost(coord[0], coord[1])

    min_required = max(1, len(q_tokens) - (1 if len(q_tokens) >= 3 else 0))
    return (
        places.withColumn("match_score", match)
        .filter(F.col("match_score") >= F.lit(float(min_required) * 0.5))
        .withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def autocomplete(
    places: DataFrame,
    q: str,
    k: int = 10,
    coord: tuple[float, float] | None = None,
    types: list[str] | None = None,
):
    """T9 — the bragi /autocomplete retry loop (handlers.rs:144-169):
    PREFIX pass first; when it returns nothing, the FUZZY pass relaxes
    the token-coverage threshold (the ES side relaxes via ngram
    minimum_should_match; our score floor plays that role).

    Returns (DataFrame, mode) where mode is 'prefix' or 'fuzzy'."""
    strict = forward_geocode(places, q, k=k, coord=coord, types=types)
    if len(strict.take(1)) > 0:  # existence probe, not a full count
        return strict, "prefix"
    q_tokens = _query_tokens(q)
    base = places
    if types:
        base = base.filter(F.col("type").isin(types))
    if len(q_tokens) <= 1:
        base = base.filter(F.col("type") != "addr")
    match = score_expr(q_tokens)
    fuzzy = (
        base.withColumn("match_score", match)
        .filter(F.col("match_score") >= 0.5)  # any token hit
        .withColumn("score", match)
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    return fuzzy, "fuzzy"


def reverse_geocode_endpoint(
    places: DataFrame, lon: float, lat: float, k: int = 1, radius_m: float = 1000.0
) -> DataFrame:
    """bragi /reverse (G7): nearest street/addr within radius, arc-distance
    sorted — a thin wrapper over operators.knn against one query point."""
    from ..operators.knn import reverse_geocode

    spark = places.sparkSession
    queries = spark.createDataFrame([(0, float(lon), float(lat))], "query_id int, lon double, lat double")
    targets = places.filter(F.col("type").isin(["addr", "street"])).withColumnRenamed(
        "id", "target_id"
    )
    hits = reverse_geocode(queries, targets, k=k, radius_m=radius_m, res=7)
    return hits.join(
        places.withColumnRenamed("id", "target_id"), "target_id"
    ).select("target_id", "type", "label", "distance_m", "rank")
