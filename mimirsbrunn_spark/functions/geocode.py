"""Query-side geocoding: the bragi /autocomplete semantics as DataFrame
score columns (SURVEY §2.9).

The reference compiles query params into an Elasticsearch DSL
(/root/reference/libs/mimir/src/adapters/primary/common/dsl.rs); our
"DSL" is a scored DataFrame mirroring the same bool-query structure:

    score = string_query (T3: per-field boosts, dsl.rs:73-135)
          + type boost   (T6: dsl.rs:336-350)
          + importance   (T7: per-type field_value_factor + admin log1p,
                          radius-interpolated weights, dsl.rs:188-217,
                          :315-334, :605-659)
          + proximity    (T8: exp decay × weight, dsl.rs:354-389)
    filtered by the matching condition (T4, dsl.rs:265-312) and the
    house-number gate (T5).

Every score term is a plain column — the reference's /explain endpoint
(T10) degenerates to selecting the term columns. BM25 magnitudes are not
reproduced (no IDF statistics in a scan-time model); RELATIVE field
boosts and the additive bool structure are, which is what the reference's
own feature examples exercise.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.knn import haversine_col

# T6 — type boosts (config/query/default.toml:2-10)
TYPE_BOOSTS = {"addr": 30.0, "admin": 19.0, "stop": 18.0, "poi": 1.5, "street": 1.0}
GLOBAL_BOOST = 0.025

# T3 — string-query per-field boosts (config/query/default.toml:12-24)
STRING_BOOSTS = {
    "name": 1.8,
    "alt_name": 1.8,
    "loc_name": 1.8,
    "label": 0.6,
    "label_prefix": 0.6,
    "zip_codes": 1.0,
    "house_number": 0.001,
    "label_ngram": 1.8,
    "label_ngram_with_coord": 3.8,
}
# string_query.global = 0.00083 against BM25 magnitudes of O(10); our
# coverage scores are O(1) per field, so fold the nominal magnitude in.
STRING_GLOBAL = 0.00083 * 12.0

# T7 — importance weights (config/query/default.toml:26-47)
IMPORTANCE_TYPES = {"addr": 0.5, "admin": 0.5, "poi": 0.5, "stop": 1.0, "street": 0.5}
RADIUS_RANGE = (100.0, 10_000.0)
MIN_RADIUS_PREFIX = {"admin": 0.12, "factor": 0.4, "missing": 0.0}
MIN_RADIUS_FUZZY = {"admin": 0.03, "factor": 0.15, "missing": 0.0}
MAX_RADIUS = {"admin": 0.03, "factor": 0.75, "missing": 0.0}
PROXIMITY_WEIGHT = 0.4
PROXIMITY_WEIGHT_FUZZY = 0.4  # proximity.weight_fuzzy, default.toml:52

# T1 — the reference's synonym groups (mimir-base.json:~synonyms), each
# alias mapped to its canonical token. Short aliases NOT in this list
# ("p" → place, "r" → rue, "av" → avenue) match through prefix scoring
# instead — exactly how the reference resolves them (edge-ngram .prefix
# field), see the alias examples in features/addresses/limousin.feature.
SYNONYMS = {
    # values are stored PRE-TOKENIZED (space-separated, no hyphens): doc
    # tokens are split on '-', so an expansion like "lieu-dit" could
    # never match anything
    "cc": "centre commercial",
    "ld": "lieu dit",
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
    "grandchamp": "grand champ",
}


def load_query_settings(path: str) -> dict:
    """Parse a bragi query-settings TOML (config/query/default.toml
    shape) into the override dict ``forward_geocode(settings=...)``
    accepts. The reference deserializes the same file into QuerySettings
    (settings.rs); type key 'address' maps to our 'addr'. Values parse
    as plain floats — tests/test_query_settings.py pins that parsing the
    vendored reference default.toml reproduces this module's constants
    exactly."""
    import tomllib

    with open(path, "rb") as f:
        q = tomllib.load(f)["query"]
    tq, sq, iq = q["type_query"], q["string_query"], q["importance_query"]
    w = iq["weights"]

    def _typekeys(d: dict) -> dict:
        return {("addr" if k == "address" else k): float(v) for k, v in d.items()}

    decay = iq["proximity"]["decay"]
    func = decay.get("func", "exp")
    if func != "exp":
        # ES supports gauss/linear too; this engine implements the exp
        # decay the reference config ships — refuse rather than silently
        # scoring with the wrong curve
        raise ValueError(f"unsupported proximity decay func {func!r}; only 'exp'")
    return {
        "type_boosts": _typekeys(tq["boosts"]),
        "global_boost": float(tq["global"]),
        "string_boosts": {k: float(v) for k, v in sq["boosts"].items()},
        "string_global": float(sq["global"]),
        "importance_types": _typekeys(
            {k: v for k, v in w.items() if k in ("address", "admin", "poi", "stop", "street")}
        ),
        "radius_range": tuple(float(x) for x in w["radius_range"]),
        "min_radius_prefix": {k: float(v) for k, v in w["min_radius_prefix"].items()},
        "min_radius_fuzzy": {k: float(v) for k, v in w["min_radius_fuzzy"].items()},
        "max_radius": {k: float(v) for k, v in w["max_radius"].items()},
        "proximity_weight": float(iq["proximity"]["weight"]),
        "proximity_weight_fuzzy": float(iq["proximity"]["weight_fuzzy"]),
        "proximity_scale_m": float(decay["scale"]) * 1000.0,  # config unit: km
        "proximity_offset_m": float(decay["offset"]) * 1000.0,
        "proximity_decay": float(decay["decay"]),
        "reverse_radius_m": float(q["reverse_query"]["radius"]),
    }


def normalize_text(col: Column | str) -> Column:
    """T1 analyzer core: lowercase + asciifold (accent strip) + elision
    (French l'/d' prefixes, word_elision analyzer) + punctuation → space
    (the ES standard tokenizer splits on punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    folded = F.translate(
        lowered,
        "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ",
        "aaaaaaceeeeiiiinooooouuuuyyoa",
    )
    elided = F.regexp_replace(folded, r"\b[ld]'", "")
    return F.regexp_replace(F.trim(elided), r"[-'(),.;:]", " ")


def expand_synonyms(tokens: Column) -> Column:
    """Token-level synonym canonicalization (flatMap through the synonym
    map). Applied to DOC-side token arrays: the reference's ``synonym``
    filter sits in the ``prefix``/``prefix_elision``/
    ``ngram_with_synonyms`` analyzers (mimir-base.json), which run at
    BOTH index and search time — the engine's query side canonicalizes
    in ``_query_tokens``, so the doc side must canonicalize identically
    or a doc labeled "Bd Diderot" is unreachable by the query
    "bd diderot" (the query expands to "boulevard", the doc keeps "bd",
    and neither exact nor prefix nor 3-gram matching can bridge it)."""
    mapping = F.create_map(*[F.lit(x) for kv in SYNONYMS.items() for x in kv])
    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.coalesce(F.split(F.element_at(mapping, t), " "), F.array(t)),
        )
    )


# python mirror of normalize_text's fold table — query- and doc-side
# analysis MUST agree char-for-char or identical text fails to match
# itself (the old query-side NFD strip folded š that the doc table
# keeps, and could not decompose the œ/æ ligatures the table folds)
_FOLD_TABLE = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿœæ", "aaaaaaceeeeiiiinooooouuuuyyoa"
)


def _query_tokens(q: str) -> list[str]:
    import re

    folded = q.lower().translate(_FOLD_TABLE)
    # elision BEFORE punctuation strip, exactly like normalize_text —
    # otherwise l'eglise leaves a stray "l" token that ANDs to nothing
    folded = re.sub(r"\b[ld]'", "", folded)
    for ch in "-'(),.;:":
        folded = folded.replace(ch, " ")
    out = []
    for t in folded.split():
        out.extend(SYNONYMS.get(t, t).split())
    return out


def _tokens_of(col_name: str) -> Column:
    """Doc-side token array: T1 analyzer + synonym canonicalization (the
    same SYNONYMS map `_query_tokens` applies query-side, so both sides
    always agree — see expand_synonyms)."""
    return expand_synonyms(
        F.filter(F.split(normalize_text(col_name), " +"), lambda x: x != "")
    )


def _auto_fuzz(token: str, low: int = 3, high: int = 6) -> int:
    """ES `fuzziness: AUTO` edit budget: 0 below `low` chars, 1 below
    `high`, else 2 (AUTO default 3,6; "auto:4,8" for SEARCH)."""
    n = len(token)
    return 0 if n < low else (1 if n < high else 2)


def field_score(
    q_tokens: list[str], field: str, fuzzy: bool = False, toks: Column | None = None
) -> Column:
    """Per-field token-coverage score: +1 exact token, +0.5 prefix hit
    (the edge-ngram .prefix role), and with ``fuzzy`` +0.7 within the
    AUTO edit budget. Null fields score 0. ``toks`` supplies a prebuilt
    token array (the i18n map-value variants), keeping one scoring
    expression for every field."""
    if toks is None:
        toks = _tokens_of(field)
    score = F.lit(0.0)
    for t in q_tokens:
        exact = F.array_contains(toks, t).cast("double")
        prefix = F.exists(toks, lambda x: x.startswith(t)).cast("double") * F.lit(0.5)
        cred = F.greatest(exact, prefix)
        if fuzzy and _auto_fuzz(t) > 0:
            fz = F.exists(
                toks, lambda x: F.levenshtein(x, F.lit(t)) <= F.lit(_auto_fuzz(t))
            ).cast("double") * F.lit(0.7)
            cred = F.greatest(cred, fz)
        score = score + cred
    return F.coalesce(score, F.lit(0.0))


def string_query_score(
    df: DataFrame, q_tokens: list[str], query_type: str, lang: str | None, has_coord: bool,
    boosts: dict | None = None, global_boost: float | None = None,
    toks_map: dict | None = None,
) -> Column:
    """T3 — build_string_query (dsl.rs:73-135): a bool-should of
    multi_match groups; each group scores best-of-fields × its boost.
    Optional columns (alt_name, loc_name, names/labels maps, zip_codes,
    house_number) participate when present. ``toks_map`` supplies
    prebuilt per-field token-array Columns (the r6 CSE path) — without
    it every score group re-tokenizes its field (HOF chains are outside
    Catalyst's subexpression elimination)."""
    cols = set(df.columns)
    B = boosts or STRING_BOOSTS
    G = STRING_GLOBAL if global_boost is None else global_boost * 12.0
    tm = toks_map or {}

    def fs(field: str, fuzzy: bool = False) -> Column:
        return field_score(q_tokens, field, fuzzy=fuzzy, toks=tm.get(field))

    def best(fields: list[Column]) -> Column:
        out = fields[0]
        for f in fields[1:]:
            out = F.greatest(out, f)
        return out

    def lang_variant(map_col: str) -> list[Column]:
        if lang and map_col in cols:
            tmp = F.try_element_at(F.col(map_col), F.lit(lang))
            toks = expand_synonyms(
                F.filter(F.split(normalize_text(tmp), " +"), lambda x: x != "")
            )
            return [field_score(q_tokens, map_col, toks=toks)]
        return []

    groups = []
    if "name" in cols:
        groups.append(best([fs("name")] + lang_variant("names")) * B["name"])
    if "alt_name" in cols:
        groups.append(fs("alt_name") * B["alt_name"])
    if "loc_name" in cols:
        groups.append(fs("loc_name") * B["loc_name"])
    groups.append(best([fs("label")] + lang_variant("labels")) * B["label"])
    if "zip_codes_str" in cols:
        groups.append(fs("zip_codes_str") * B["zip_codes"])
    elif "zip_codes" in cols:
        # lowercase like full_label_tokens does for the SAME array — raw
        # values here would let an alphanumeric postcode ('1234AB') pass
        # the T4 gate yet contribute 0 to this score group
        zt = F.transform(
            F.coalesce(F.col("zip_codes"), F.array().cast("array<string>")),
            lambda z: F.lower(z),
        )
        zscore = F.lit(0.0)
        for t in q_tokens:
            zscore = zscore + F.array_contains(zt, t).cast("double")
        groups.append(zscore * B["zip_codes"])
    if "house_number" in cols:
        groups.append(fs("house_number") * B["house_number"])
    if query_type != "search":
        groups.append(fs("label") * B["label_prefix"])
    if query_type == "fuzzy":
        b = B["label_ngram_with_coord"] if has_coord else B["label_ngram"]
        groups.append(fs("label", fuzzy=True) * b)
    total = groups[0]
    for g in groups[1:]:
        total = total + g
    return total * F.lit(G)


# -- T4 matching conditions (dsl.rs:265-312) --------------------------------


def _msm_fuzzy(n: int) -> int:
    """minimum_should_match "1<-1 3<-2 9<-4 20<25%" over ngram clauses."""
    if n <= 1:
        return n
    if n <= 3:
        return n - 1
    if n <= 9:
        return n - 2
    if n <= 20:
        return n - 4
    return max(1, int(n * 0.25))


def _msm_search(n: int) -> int:
    """minimum_should_match "4<-1 7<-25%" (SEARCH on full_label_extra,
    dsl.rs:307). ES negative-percentage semantics: "-25%" bounds the
    MISSING clauses, so for n > 7 the requirement is n - floor(0.25*n)
    (e.g. 8 tokens → 6 required), NOT floor(0.25*n) — the inverted
    reading would admit documents sharing only 2 of 8 words."""
    if n <= 4:
        return n
    if n <= 7:
        return n - 1
    return max(1, n - int(n * 0.25))


def full_label_tokens(df: DataFrame, label_toks: Column | None = None) -> Column:
    """The ``full_label`` field: label + every i18n label + zip_codes,
    via copy_to in the reference mapping (mimir-base.json:147-151,
    215-219; mimir-dynamic-mappings.json i18n_labels). This — and only
    this — is what the T4 matching conditions see; name/alt_name/loc_name
    influence scores, never matching. ``label_toks`` supplies a prebuilt
    label token column (the r6 CSE path) — same expression, evaluated
    once."""
    cols = set(df.columns)
    parts = [label_toks if label_toks is not None else _tokens_of("label")]
    if "labels" in cols:
        parts.append(
            F.flatten(
                F.transform(
                    F.coalesce(F.map_values(F.col("labels")), F.array().cast("array<string>")),
                    lambda v: expand_synonyms(
                        F.filter(F.split(normalize_text(v), " +"), lambda x: x != "")
                    ),
                )
            )
        )
    if "zip_codes_str" in cols:
        parts.append(_tokens_of("zip_codes_str"))
    elif "zip_codes" in cols:  # array form, as the place pipelines emit
        parts.append(
            F.transform(
                F.coalesce(F.col("zip_codes"), F.array().cast("array<string>")),
                lambda z: F.lower(z),
            )
        )
    # null-safe fold: copy_to semantics — a NULL field contributes no
    # tokens; a bare concat would instead nullify the whole full_label
    # (and with it the matching condition) whenever any part is NULL
    empty = F.array().cast("array<string>")
    out = F.coalesce(parts[0], empty)
    for p in parts[1:]:
        out = F.concat(out, F.coalesce(p, empty))
    return out


def _char_ngrams(token: str, n: int = 3) -> list[str]:
    return [token[i:i + n] for i in range(len(token) - n + 1)]


def _ngrams_of_tokens(toks: Column) -> Column:
    return F.flatten(
        F.transform(
            toks,
            # min_gram=3: shorter tokens emit nothing (a start>stop
            # sequence() would count DOWN in Spark, hence the guard)
            lambda tok: F.when(
                F.length(tok) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length(tok) - 2),
                    lambda i: tok.substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def matching_condition(q_tokens: list[str], query_type: str, toks: Column) -> Column:
    """T4 — the gate that a document must pass before boosts matter.

    PREFIX: every query token exact-or-prefix matches a full-label token
    (``operator: and`` on full_label.prefix, dsl.rs:276-283).
    FUZZY: ngram-level minimum_should_match "1<-1 3<-2 9<-4 20<25%"
    (dsl.rs:284-301) — query character-3-grams against the label's
    3-gram set, distinct-gram counting (the analyzer's min_gram=3 drops
    shorter words, so "zz"-style noise tokens cost nothing).
    SEARCH: word-level with AUTO:4,8 fuzziness and "4<-1 7<-25%"
    (dsl.rs:302-309).

    ``toks`` is the full_label token array (full_label_tokens)."""

    def _tok_hit(t):
        return F.exists(toks, lambda x: (x == t) | x.startswith(t))

    def _lev_hit(t, fz):
        return F.exists(toks, lambda x: F.levenshtein(x, F.lit(t)) <= F.lit(fz))

    if query_type == "prefix":
        cond = F.lit(True)
        for t in q_tokens:
            cond = cond & _tok_hit(t)
        return cond
    if query_type == "fuzzy":
        grams = sorted({g for t in q_tokens for g in _char_ngrams(t)})
        if not grams:
            return F.lit(False)
        need = _msm_fuzzy(len(grams))
        label_grams = _ngrams_of_tokens(toks)
        matched = F.size(
            F.array_intersect(F.array(*[F.lit(g) for g in grams]), label_grams)
        )
        return matched >= F.lit(need)
    # search
    need = _msm_search(len(q_tokens))
    matched = F.lit(0)
    for t in q_tokens:
        fz = _auto_fuzz(t, low=4, high=8)
        hit = _tok_hit(t)
        if fz > 0:
            hit = hit | _lev_hit(t, fz)
        matched = matched + hit.cast("int")
    return matched >= F.lit(need)


# -- T7 importance (dsl.rs:188-217, 315-334, 605-659) ------------------------


def _zoom_weights(query_type: str, coord, proximity_scale_offset=None,
                  min_radius=None, max_radius=None, radius_range=None) -> dict:
    """Linear interpolation of (admin, factor, missing) between the
    min-radius and max-radius weight sets on ln1p(radius)
    (build_weight_depending_on_radius, dsl.rs:188-217).

    Reference parity (ADVICE r02): dsl.rs:195 always interpolates from
    ``min_radius_prefix`` — the config's ``min_radius_fuzzy`` block is
    never read by build_weight_depending_on_radius — so fuzzy queries use
    MIN_RADIUS_PREFIX here too. MIN_RADIUS_FUZZY is kept as the parsed
    config value only (config/query/default.toml parity)."""
    min_w = min_radius or MIN_RADIUS_PREFIX
    max_w = max_radius or MAX_RADIUS
    if coord is None:
        ratio = 1.0
    else:
        scale, offset = proximity_scale_offset or (130_000.0, 20_000.0)
        lo, hi = radius_range or RADIUS_RANGE
        radius = min(max((offset + scale) / 1000.0, lo), hi)  # km→ the toml's unit
        ratio = (math.log1p(radius) - math.log1p(lo)) / (math.log1p(hi) - math.log1p(lo))
    return {
        k: (1.0 - ratio) * min_w[k] + ratio * max_w[k] for k in ("admin", "factor", "missing")
    }


def importance_boost(query_type: str, coord, proximity_scale_offset=None,
                     type_weights: dict | None = None, min_radius=None,
                     max_radius=None, radius_range=None) -> Column:
    """T7 — the bool-should importance functions, summed:
    build_with_weight (per-type weight × field_value_factor) always, the
    admin log1p function except in FUZZY, both with radius-interpolated
    weights."""
    w = _zoom_weights(query_type, coord, proximity_scale_offset,
                      min_radius=min_radius, max_radius=max_radius,
                      radius_range=radius_range)
    tw = type_weights or IMPORTANCE_TYPES
    type_w = F.create_map(*[F.lit(x) for kv in tw.items() for x in kv])[F.col("type")]
    fvf = F.coalesce(F.col("weight"), F.lit(w["missing"])) * F.lit(w["factor"])
    boost = F.coalesce(type_w, F.lit(0.0)) * fvf
    if query_type != "fuzzy":
        admin_term = F.when(
            F.col("type") == "admin",
            F.log1p(F.coalesce(F.col("weight"), F.lit(0.0)) * F.lit(1e6)) * F.lit(w["admin"]),
        ).otherwise(F.lit(0.0))
        boost = boost + admin_term
    return boost


def proximity_boost(lon: float, lat: float, scale_m: float = 130_000.0,
                    offset_m: float = 20_000.0, decay: float = 0.4) -> Column:
    """T8 — exp decay around the query coord (dsl.rs:354-389; defaults
    scale 130 km / offset 20 km / decay 0.4, config/query/default.toml)."""
    dist = haversine_col(F.lit(lon), F.lit(lat), F.col("lon"), F.col("lat"))
    lam = math.log(decay) / scale_m
    return F.exp(F.lit(lam) * F.greatest(dist - F.lit(offset_m), F.lit(0.0)))


def score_expr(q_tokens: list[str], label_col: str = "label") -> Column:
    """Back-compat single-field score (round-1 surface): coverage on the
    label with prefix credit — equivalent to field_score(label)."""
    return field_score(q_tokens, label_col)


def _house_number_gate(columns, q_tokens: list[str]) -> Column:
    """T5 — BOTH halves of build_house_number_condition (dsl.rs:219-263)
    as one Column, shared by forward_geocode and its /explain twin so
    the two can never desynchronize: single-word queries never match
    addresses; multi-word queries match an address only if its
    house_number matches a query token (ES `match` on the analyzed
    house_number field = any-token overlap). Tables without a
    house_number column cannot satisfy the match half, mirroring the
    reference where a missing field never matches."""
    if len(q_tokens) <= 1 or "house_number" not in columns:
        return F.col("type") != "addr"
    q_arr = F.array(*[F.lit(t) for t in q_tokens])
    hn_match = F.exists(_tokens_of("house_number"), lambda x: F.array_contains(q_arr, x))
    return (F.col("type") != "addr") | F.coalesce(hn_match, F.lit(False))


def forward_geocode(
    places: DataFrame,
    q: str,
    k: int = 10,
    coord: tuple[float, float] | None = None,
    types: list[str] | None = None,
    lang: str | None = None,
    query_type: str = "prefix",
    shape: tuple | None = None,
    settings: dict | None = None,
) -> DataFrame:
    """bragi /autocomplete over a unified places table with columns
    (id, type, name, label, weight, lon, lat [+ optional alt_name,
    loc_name, names map, labels map, zip_codes_str, house_number]).

    ``query_type``: "prefix" (default first pass), "fuzzy" (the retry,
    T9), "search" (the /search endpoint shape).
    ``shape``: optional (multipolygon, scope_types) — the G14 geo_shape
    filter (scoped types restricted to the shape, others pass)."""
    q_tokens = _query_tokens(q)
    if not q_tokens:
        return places.limit(0).withColumn("match_score", F.lit(0.0)).withColumn("score", F.lit(0.0))
    if types:
        places = places.filter(F.col("type").isin(types))
    if shape is not None:
        places = shape_filter(places, shape[0], shape[1])

    # T5 house-number gate (shared Column — see _house_number_gate)
    places = places.filter(_house_number_gate(places.columns, q_tokens))

    # the T1-T9 score expression is the heavy per-row work of this path:
    # rebalance an under-split scan so it runs machine-wide (no-op on
    # cluster-parallel inputs; after the cheap filters so pushdown-able
    # predicates stay adjacent to the scan — guide §2.5/§6)
    from ..operators.skew import ensure_parallelism

    places = ensure_parallelism(places)

    out_cols = list(places.columns) + ["match_score", "score"]
    places_aug, cond, string_score, score = _score_terms(
        places, q_tokens, query_type, coord, lang, settings
    )

    return (
        places_aug.filter(cond)
        .withColumn("match_score", string_score)
        .withColumn("score", score)
        .select(*out_cols)  # drop the __toks_* CSE helper columns
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def _score_terms(
    places: DataFrame,
    q_tokens: list[str],
    query_type: str,
    coord: tuple[float, float] | None,
    lang: str | None,
    settings: dict | None,
    explain: bool = False,
):
    """The shared score assembly of forward_geocode and its /explain
    twin. Returns (places_aug, cond, match_score, score) — or, with
    ``explain=True``, (places_aug, cond, terms) where terms maps each
    additive component to its column (the T10 surface: every DSL clause
    is a plain column).

    r6 manual CSE: every scored field's token array (T1 analyzer +
    synonyms — a translate/regexp/split/transform/flatten chain) is
    projected ONCE as a hidden ``__toks_*`` column on the returned
    ``places_aug`` and every score term references the column. Higher-
    order-function subtrees are excluded from Catalyst's subexpression
    elimination, so without this the label alone was re-analyzed ~6×
    per row (guide §1.2 per-task work). Same expressions, same values —
    callers must evaluate the returned Columns against ``places_aug``
    and drop the helper columns from their output."""
    s = settings or {}
    cols = set(places.columns)
    tok_fields = [
        f for f in ("name", "alt_name", "loc_name", "label", "house_number", "zip_codes_str")
        if f in cols
    ]
    places_aug = places
    toks_map: dict = {}
    for f in tok_fields:
        hc = f"__toks_{f}"
        places_aug = places_aug.withColumn(hc, _tokens_of(f))
        toks_map[f] = F.col(hc)
    places_aug = places_aug.withColumn(
        "__toks_full", full_label_tokens(places, label_toks=toks_map.get("label"))
    )
    cond = matching_condition(q_tokens, query_type, F.col("__toks_full"))
    string_score = string_query_score(
        places, q_tokens, query_type, lang, coord is not None,
        boosts=s.get("string_boosts"), global_boost=s.get("string_global"),
        toks_map=toks_map,
    )
    tb = s.get("type_boosts", TYPE_BOOSTS)
    gb = s.get("global_boost", GLOBAL_BOOST)
    type_boost = (
        F.create_map(*[F.lit(x) for kv in tb.items() for x in kv])[F.col("type")]
        * F.lit(gb)
    )
    # the reference's build_weight_depending_on_radius derives its radius
    # from the SAME proximity curve (offset+scale) the decay term uses
    # (dsl.rs:188-217) — settings overriding the curve must move both
    # terms together (ADVICE r04)
    prox_so = None
    if "proximity_scale_m" in s or "proximity_offset_m" in s:
        prox_so = (
            s.get("proximity_scale_m", 130_000.0),
            s.get("proximity_offset_m", 20_000.0),
        )
    type_boost_t = F.coalesce(type_boost, F.lit(0.0))
    importance_t = importance_boost(
        query_type, coord,
        proximity_scale_offset=prox_so,
        type_weights=s.get("importance_types"),
        min_radius=s.get("min_radius_prefix"),
        max_radius=s.get("max_radius"),
        radius_range=s.get("radius_range"),
    )
    score = string_score + type_boost_t + importance_t
    proximity_t = F.lit(0.0)
    if coord is not None:
        # dsl.rs build_boosts:162-165 — PREFIX|SEARCH boost the decay by
        # proximity.weight, FUZZY by the separate proximity.weight_fuzzy
        # (both 0.4 in the shipped default.toml, but independently
        # overridable settings keys)
        if query_type == "fuzzy":
            prox_w = s.get("proximity_weight_fuzzy", PROXIMITY_WEIGHT_FUZZY)
        else:
            prox_w = s.get("proximity_weight", PROXIMITY_WEIGHT)
        proximity_t = proximity_boost(
            coord[0], coord[1],
            scale_m=s.get("proximity_scale_m", 130_000.0),
            offset_m=s.get("proximity_offset_m", 20_000.0),
            decay=s.get("proximity_decay", 0.4),
        ) * F.lit(prox_w)
        score = score + proximity_t
    if explain:
        return places_aug, cond, {
            "match_score": string_score,
            "type_boost": type_boost_t,
            "importance": importance_t,
            "proximity": proximity_t,
            "score": score,
        }
    return places_aug, cond, string_score, score


def autocomplete(
    places: DataFrame,
    q: str,
    k: int = 10,
    coord: tuple[float, float] | None = None,
    types: list[str] | None = None,
    lang: str | None = None,
    settings: dict | None = None,
):
    """T9 — the bragi /autocomplete retry loop (handlers.rs:144-169):
    PREFIX pass first; when it returns nothing, retry as FUZZY (ngram
    minimum_should_match matching condition + ngram-boosted scoring).

    Request validation runs FIRST (ForwardGeocoderQuery::filter,
    api.rs:191-209 — q non-empty, lat⇔lon pairing, ranges, positive
    limit), raising the typed errors from functions.bragi_api instead of
    silently proceeding (VERDICT r04 #3). ``types`` here are ENGINE type
    names (admin/street/addr/poi/stop); the bragi Type-enum surface and
    its zone/zone_type coupling live in bragi_api.validate_forward_query.

    Returns (DataFrame, mode) where mode is 'prefix' or 'fuzzy'."""
    from .bragi_api import validate_forward_query

    validate_forward_query(
        q,
        lat=coord[1] if coord is not None else None,
        lon=coord[0] if coord is not None else None,
        limit=k,
        lang=lang if lang is not None else "fr",
    )
    strict = forward_geocode(places, q, k=k, coord=coord, types=types, lang=lang,
                             query_type="prefix", settings=settings)
    # persist before the existence probe: take(1) executes the full
    # scan+score+top-k; without the persist the caller's collect() would
    # run the whole PREFIX plan a second time. The persisted set is at
    # most k rows (forward_geocode limits), so the cache is tiny.
    strict = strict.persist()
    if len(strict.take(1)) > 0:  # existence probe, not a full count
        return strict, "prefix"
    strict.unpersist()
    fuzzy = forward_geocode(places, q, k=k, coord=coord, types=types, lang=lang,
                            query_type="fuzzy", settings=settings)
    return fuzzy, "fuzzy"


def forward_geocode_explain(
    places: DataFrame,
    q: str,
    doc_id: str,
    doc_type: str,
    coord: tuple[float, float] | None = None,
    lang: str | None = None,
    settings: dict | None = None,
    shape: tuple | None = None,
) -> DataFrame:
    """bragi /autocomplete-explain (handlers.rs:307-345,
    ForwardGeocoderExplainQuery api.rs:32-59): build the PREFIX query
    for ``q`` and explain its score against ONE document — the ES
    _explain call degenerates here to selecting the score-term columns
    (T10) for the (doc_id, doc_type) row.

    Returns one row (or zero if the document does not exist):
    (id, type, label, matched, match_score, type_boost, importance,
    proximity, score). ``matched`` folds the T4 matching condition, the
    T5 house-number gate, and the G14 shape scope — exactly the clauses
    that would have kept the doc in /autocomplete's result set; the term
    columns use the SAME expression tree as forward_geocode
    (``_score_terms``), so explain.score == autocomplete.score
    bit-for-bit."""
    from .bragi_api import ValidationError, validate_forward_query

    validate_forward_query(
        q,
        lat=coord[1] if coord is not None else None,
        lon=coord[0] if coord is not None else None,
        limit=10,
        lang=lang if lang is not None else "fr",
    )
    if not doc_id or not isinstance(doc_id, str):
        raise ValidationError("doc_id must be a non-empty string")
    if not doc_type or not isinstance(doc_type, str):
        raise ValidationError("doc_type must be a non-empty string")

    q_tokens = _query_tokens(q)
    if not q_tokens:
        raise ValidationError("q must contain at least one token")
    doc = places.filter((F.col("id") == doc_id) & (F.col("type") == doc_type))

    # T5 house-number gate — the SAME Column forward_geocode filters on
    gate = _house_number_gate(places.columns, q_tokens)
    in_shape = F.lit(True)
    if shape is not None:
        kept = shape_filter(doc, shape[0], shape[1]).select(
            F.col("id").alias("__shape_id")
        )
        doc = doc.join(
            F.broadcast(kept), doc["id"] == F.col("__shape_id"), "left"
        )
        in_shape = F.col("__shape_id").isNotNull()

    doc, cond, terms = _score_terms(
        doc, q_tokens, "prefix", coord, lang, settings, explain=True
    )
    return doc.select(
        "id",
        "type",
        "label",
        # coalesce: NULL label/name fields make the matching condition
        # SQL-NULL — /autocomplete's filter() already treats that as
        # not-matched, so explain must report false, never null
        F.coalesce(cond & gate & in_shape, F.lit(False)).alias("matched"),
        *[v.alias(k) for k, v in terms.items()],
    )


def reverse_geocode_endpoint(
    places: DataFrame, lon: float, lat: float, k: int = 1, radius_m: float = 1000.0
) -> DataFrame:
    """bragi /reverse (G7): nearest street/addr within radius, arc-distance
    sorted — a thin wrapper over operators.knn against one query point.

    Validation first (ReverseGeocoderQuery, api.rs:215-226): lat/lon
    required numbers, positive limit — typed errors, not silent
    behavior (VERDICT r04 #3)."""
    from ..operators.knn import reverse_geocode
    from .bragi_api import InvalidRequestError, validate_reverse_query

    v = validate_reverse_query(lat, lon, k)
    lon, lat = v["lon"], v["lat"]
    if not isinstance(radius_m, (int, float)) or isinstance(radius_m, bool) or radius_m <= 0:
        raise InvalidRequestError("radius_m must be a positive number")

    spark = places.sparkSession
    queries = spark.createDataFrame([(0, float(lon), float(lat))], "query_id int, lon double, lat double")
    targets = places.filter(F.col("type").isin(["addr", "street"])).withColumnRenamed(
        "id", "target_id"
    )
    hits = reverse_geocode(queries, targets, k=k, radius_m=radius_m, res=7)
    return hits.join(
        places.withColumnRenamed("id", "target_id"), "target_id"
    ).select("target_id", "type", "label", "distance_m", "rank")


def shape_filter(places: DataFrame, shape_mp, scope_types: list[str]) -> Column | DataFrame:
    """G14 — build_shape_query (dsl.rs:438-471): places whose type is in
    ``scope_types`` must intersect the query shape; unlisted types pass
    through unfiltered (the should-of-must/must_not structure).

    The shape is a query-side multipolygon (geometry.MultiPolygon). The
    plan is a two-branch union: unscoped rows pass through a pure-JVM
    filter; only the scoped, bbox-passing branch pays the exact
    vectorized point-in-polygon (Arrow-batched pandas UDF —
    boundary-inclusive like ES geo_shape intersects). Putting the UDF
    inside one OR filter instead would make Catalyst extract it into an
    ArrowEvalPython node evaluated for EVERY input row, defeating the
    bbox prefilter entirely."""
    from ..geometry import mp_bbox, points_intersect_multipolygon

    bb = mp_bbox(shape_mp)
    in_scope = F.col("type").isin(scope_types)
    bbox_ok = (
        (F.col("lon") >= bb[0]) & (F.col("lon") <= bb[2])
        & (F.col("lat") >= bb[1]) & (F.col("lat") <= bb[3])
    )

    @F.pandas_udf("boolean")
    def _intersects(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            points_intersect_multipolygon(lon.to_numpy(), lat.to_numpy(), shape_mp)
        )

    passthrough = places.filter(~in_scope)
    scoped = places.filter(in_scope & bbox_ok).filter(
        _intersects(F.col("lon"), F.col("lat"))
    )
    return passthrough.unionByName(scoped)
