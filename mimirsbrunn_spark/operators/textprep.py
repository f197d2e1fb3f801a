"""Corpus text-preparation operators: repetition filtering, exact-substring
duplicate flagging, PII scrubbing.

Three more staples of a large-scale training-data pipeline (alongside
operators/dedup.py's MinHash/SimHash/Jaccard family and gate.py's
language-ID/quality/token gates):

- ``repetition_ngram_stats`` — the Gopher-style within-document
  repetition signal: the fraction of a document's n-grams that are
  duplicates. High values mark boilerplate/spam for filtering.
- ``shared_ngram_doc_flags`` — the exact-substring-duplication family
  (C4 line dedup / "exact substring dedup"): documents sharing a long
  n-gram with other documents, found by exploding per-document DISTINCT
  shingles and counting documents per shingle. One shuffle on the
  shingle key, linear in corpus size — never all-pairs.
- ``scrub_pii`` — email/phone masking with counts, as vectorized JVM
  regex (regexp_replace / regexp_count); patterns are written in the
  common Java-regex ∩ RE2 dialect so the DuckDB oracle runs them
  verbatim.

All three are pure Catalyst (no Python in the plan) and have exact
DuckDB oracles in the driver gate.

Scale notes: shingles travel as strings here so the oracle is
engine-exact; at 100 TB pass ``hash_shingles=True`` to shuffle 8-byte
xxhash64 keys instead (collision over 10^12 distinct shingles is
possible but only inflates the shared-count by 1 — flagging tolerance,
not correctness of dedup decisions, and the gate keeps the exact
string path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RX = r"\+[0-9]{1,3} [0-9]{3} [0-9]{4}"

# Whitespace class that means the same thing in Java regex and RE2:
# Java \s includes \x0B where RE2's does not, so a bare \s in a pattern
# mirrored across the engine and a DuckDB oracle silently diverges on
# vertical-tab-bearing text (same cross-engine class as the CRLF
# ellipsis fix). WS_RX feeds python-API patterns (and DuckDB SQL, which
# does not unescape string literals); WS_RX_SQL is the doubled form for
# Spark-SQL-embedded expr strings (Spark SQL unescapes '\\t' -> '\t').
WS_RX = r"[ \t\r\n\x0b\f]"
WS_RX_SQL = r"[ \\t\\r\\n\\x0b\\f]"

# Rae et al. 2021 §A1.1 stop-word rule: a document must contain at least
# 2 occurrences of these words (case-folded, whitespace-token match).
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _tokens(text_col):
    return F.split(F.trim(text_col), WS_RX + "+")


def repetition_ngram_stats(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicate-n-gram fraction (Gopher repetition filter):
    (id, n_ngrams, n_distinct, dup_fraction). dup_fraction = 1 −
    distinct/total over whitespace-token n-grams; 0 for docs shorter
    than n tokens."""
    toks = _tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.expr(
            f"transform(sequence(1, size(split(trim({text_col}), '{WS_RX_SQL}+')) - {n} + 1),"
            f" i -> concat_ws(' ', slice(split(trim({text_col}), '{WS_RX_SQL}+'), i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = docs.select(F.col(id_col), grams.alias("__grams"))
    total = F.size("__grams")
    distinct = F.size(F.array_distinct("__grams"))
    return d.select(
        id_col,
        total.cast("long").alias("n_ngrams"),
        distinct.cast("long").alias("n_distinct"),
        F.when(
            total > 0,
            F.round(F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


def shared_ngram_doc_flags(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_shingles: bool = False,
) -> DataFrame:
    """Exact-substring duplication across the corpus: for each document,
    the number of its distinct n-grams that also appear in at least
    ``min_docs - 1`` OTHER documents. (id, n_shared_grams) for every
    document (0 = clean). Plan: per-doc distinct shingles (map-side) →
    one shuffle keyed by shingle → doc-count per shingle → semi-join
    back — linear, never all-pairs."""
    toks_sql = f"split(trim({text_col}), '{WS_RX_SQL}+')"
    grams = F.when(
        F.size(_tokens(F.col(text_col))) >= n,
        F.expr(
            f"transform(sequence(1, size({toks_sql}) - {n} + 1),"
            f" i -> concat_ws(' ', slice({toks_sql}, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = docs.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )
    if hash_shingles:
        per_doc = per_doc.select(id_col, F.xxhash64("gram").alias("gram"))
    shared = (
        per_doc.groupBy("gram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    counts = (
        per_doc.join(shared, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias("n_shared_grams"),
        )
    )


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mask emails and phone numbers: (id, scrubbed, n_emails, n_phones).
    Pure JVM regex — regexp_count + regexp_replace over the common
    Java-regex ∩ RE2 dialect (no lookaround), so the identical patterns
    run in the DuckDB oracle."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(t, F.lit(EMAIL_RX), F.lit("<EMAIL>")),
            F.lit(PHONE_RX),
            F.lit("<PHONE>"),
        ).alias("scrubbed"),
        F.regexp_count(t, F.lit(EMAIL_RX)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RX)).cast("long").alias("n_phones"),
    )


def scrub_pii_spans(docs: DataFrame, kinds: tuple = ("text",)) -> DataFrame:
    """PII scrub applied IN-PLACE over the interleaved spans column: the
    text of spans whose kind is in ``kinds`` is email/phone-masked; kind,
    media_ref and offset (and the array order) are untouched, so the
    structural span invariant (span_structure_fingerprint) holds across
    this stage by construction while the full text fingerprint is
    EXPECTED to differ for scrubbed docs. Pure Catalyst (transform +
    regexp_replace inside the lambda), schema-preserving — the output is
    a drop-in docs table for every downstream stage."""

    def rewrite(s):
        scrubbed = F.regexp_replace(
            F.regexp_replace(s["text"], F.lit(EMAIL_RX), F.lit("<EMAIL>")),
            F.lit(PHONE_RX),
            F.lit("<PHONE>"),
        )
        return F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"].isin(*kinds), scrubbed).otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    return docs.withColumn("spans", F.transform("spans", rewrite))


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_words: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1) as
    pure-Catalyst integer counts + flag columns — the full rule set
    beyond the length/punct score of q_quality_score:

    - word count within [min_words, max_words]
    - mean word length within [3, 10] chars
    - symbol-to-word ratio ('#' or '...') < 0.1
    - <= 90% of lines start with a bullet, <= 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - at least ``min_stop_words`` occurrences of the paper's English
      stop words (the/be/to/of/and/that/have/with; occurrence-count
      semantics, matching the public DataTrove reproduction; set 0 for
      non-English corpora)

    Every flag is an INTEGER comparison (10*n_sym < n_words, not
    n_sym/n_words < 0.1), so the columns are engine-exact with no FP
    divisions; the per-doc HOFs run inside whole-stage codegen with no
    shuffle — the shape that survives a 100-TB corpus unchanged."""
    text = F.col(text_col)
    c = _gopher_counts(text, F.split(F.trim(text), WS_RX + "+"), F.split(text, r"\r?\n"))
    return docs.select(
        "doc_id",
        c["n_words"].alias("n_words"),
        c["total_wl"].alias("total_word_len"),
        c["n_sym"].alias("n_sym"),
        c["n_alpha"].alias("n_alpha_words"),
        c["n_lines"].alias("n_lines"),
        c["n_bullet"].alias("n_bullet_lines"),
        c["n_ellipsis"].alias("n_ellipsis_lines"),
        c["n_stop"].alias("n_stop_words"),
        ((c["n_words"] >= min_words) & (c["n_words"] <= max_words)).alias("ok_word_count"),
        ((c["total_wl"] >= 3 * c["n_words"]) & (c["total_wl"] <= 10 * c["n_words"])).alias("ok_mean_word_len"),
        (10 * c["n_sym"] < F.greatest(c["n_words"], F.lit(1))).alias("ok_symbol_ratio"),
        (10 * c["n_bullet"] <= 9 * c["n_lines"]).alias("ok_bullet_lines"),
        (10 * c["n_ellipsis"] <= 3 * c["n_lines"]).alias("ok_ellipsis_lines"),
        (5 * c["n_alpha"] >= 4 * c["n_words"]).alias("ok_alpha_words"),
        (c["n_stop"] >= min_stop_words).alias("ok_stop_words"),
        _gopher_conj(c, min_words, max_words, min_stop_words).alias("gopher_pass"),
    )


def _gopher_counts(text, words, lines) -> dict:
    """The Gopher count expressions over caller-supplied ``words``/
    ``lines`` array Columns (either the raw split expressions, or
    lambda-bound copies — see gopher_pass_predicate). Single source of
    truth so the flags table and the filter predicate cannot drift."""
    # null-safe: a NULL text must count as empty, not leak NULL through
    # the guard (size(split(NULL)) is -1, regexp_count(NULL) is NULL —
    # a null-text doc would otherwise emit n_words=-1 and
    # ok_bullet_lines=true instead of empty-doc zeros)
    empty = text.isNull() | (F.length(F.trim(text)) == 0)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS])

    def _guard(col):
        return F.when(empty, F.lit(0)).otherwise(col).cast("long")

    return {
        "n_words": _guard(F.size(words)),
        "total_wl": _guard(F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))),
        "n_sym": _guard(F.regexp_count(text, F.lit(r"#|\.\.\."))),
        "n_alpha": _guard(F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))),
        "n_lines": _guard(F.size(lines)),
        "n_bullet": _guard(F.size(F.filter(lines, lambda l: l.rlike("^" + WS_RX + "*[-*•]")))),
        # \z not $: lines are split on \r?\n so CRLF corpora count like
        # LF ones, and \z pins ABSOLUTE end in both Java and RE2 — Java's
        # bare $ also matches before a final \r/\n inside the string,
        # which silently diverges from the RE2 oracle on stray-\r lines
        "n_ellipsis": _guard(F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\z")))),
        "n_stop": _guard(F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))),
    }


def _gopher_conj(c: dict, min_words: int, max_words: int, min_stop_words: int):
    return (
        (c["n_words"] >= min_words) & (c["n_words"] <= max_words)
        & (c["total_wl"] >= 3 * c["n_words"]) & (c["total_wl"] <= 10 * c["n_words"])
        & (10 * c["n_sym"] < F.greatest(c["n_words"], F.lit(1)))
        & (10 * c["n_bullet"] <= 9 * c["n_lines"])
        & (10 * c["n_ellipsis"] <= 3 * c["n_lines"])
        & (5 * c["n_alpha"] >= 4 * c["n_words"])
        & (c["n_stop"] >= min_stop_words)
    )


def gopher_pass_predicate(
    text,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_words: int = 2,
):
    """``gopher_pass`` as ONE boolean Column over a text expression — the
    shape the production doc-dropping stage wants (equal row set to
    ``gopher_quality_flags(...).filter("gopher_pass")``, pinned by test).

    Two scale properties the flags-table + join spelling lacks:

    - **No self-join.** Filtering the corpus directly replaces the
      flags-projection + left-semi join back on doc_id — at corpus scale
      that join is a full shuffle of BOTH sides purely to re-associate
      rows that never left their partitions.
    - **Counts bound once per row.** The word/line arrays are bound as a
      lambda variable (``exists`` over a one-element struct array), so
      however Catalyst moves or substitutes this predicate (filter
      pushdown inlines derived columns into the pushed predicate — the
      q6 LSH lesson, see operators/dedup.lsh_candidate_pairs), the
      tokenize/line-split runs once and each count scans the bound
      array once. Interpreted HOF predicates get no codegen
      subexpression elimination, so unshared spellings pay one full
      text scan per count reference (~6× for n_words alone).
    """
    text = F.col(text) if isinstance(text, str) else text
    bound = F.array(
        F.struct(
            F.split(F.trim(text), WS_RX + "+").alias("words"),
            F.split(text, r"\r?\n").alias("lines"),
        )
    )
    return F.exists(
        bound,
        lambda b: _gopher_conj(
            _gopher_counts(text, b["words"], b["lines"]),
            min_words, max_words, min_stop_words,
        ),
    )


# ---------------------------------------------------------------------------
# Cross-document line dedup (CCNet / C4 style) with document reassembly
# ---------------------------------------------------------------------------


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """Cross-document line deduplication with in-place reassembly — the
    CCNet paragraph-dedup / C4 boilerplate-line-removal staple
    (Wenzek et al. 2020 §3.1; Raffel et al. 2020 §2.2): a line whose
    trimmed text occurs in >= ``min_docs`` DISTINCT documents is
    boilerplate (nav bars, cookie banners, license footers) and is
    removed from every document; each document's surviving lines are
    re-joined in original order.

    Lines shorter than ``min_chars`` after trimming are never dedup
    candidates (blank lines and one-word connectives are legitimately
    frequent) — they survive verbatim, preserving the document's shape.

    Plan shape (pure Catalyst): split → posexplode → groupBy(line-key)
    countDistinct for the duplicated-key set → ONE left join flagging
    each line (a boilerplate hit or not) → ONE groupBy(doc) that
    rebuilds the surviving text AND counts totals/removals together.
    Three shuffles, keyed (line-key, line-key, doc-id), all linear in
    corpus size — never all-pairs, and the duplicated-key set stays
    distributed (a join, NOT a broadcast or driver collect: at 10^12
    docs the boilerplate set is itself huge). At 100 TB the same
    ``hash_shingles`` option as ``shared_ngram_doc_flags`` applies in
    spirit: key the join by xxhash64(line) to shuffle 8-byte keys (the
    gate keeps the exact string path so the DuckDB oracle is
    engine-exact).

    Returns one row per input document: (id, text [cleaned], n_lines,
    n_removed) — documents whose every line was removed come back with
    empty text, n_removed = n_lines.
    """
    key = F.trim(F.col("line"))
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn(
        # null key = ineligible line: null never equi-joins, so the
        # dup-flag join below passes these through untouched
        "k",
        F.when(F.length(key) >= min_chars, key),
    )
    dup_keys = (
        lines.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("k", F.lit(True).alias("_dup"))
    )
    flagged = lines.join(dup_keys, "k", "left").withColumn(
        "_dup", F.coalesce("_dup", F.lit(False))
    )
    # single per-doc aggregation: ordered rebuild of the survivors and
    # the total/removed counts in one pass (no separate totals groupBy
    # + doc-keyed re-join — at corpus scale those were two more full
    # exchanges for numbers this aggregate already knows)
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("_dup"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(text_col),
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.col("_dup").cast("int")).cast("int").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# CCNet-style LM quality stratification (unigram perplexity buckets)
# ---------------------------------------------------------------------------


def unigram_ppl_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's quality stratification (Wenzek et al. 2020 §3.3) with the
    KenLM 5-gram replaced by a corpus-trained unigram model — the same
    decision structure (score each document by per-language LM negative
    log-likelihood, split each language into equal head/middle/tail
    buckets) with training expressible inside the engine:

    - train: per-language Laplace-smoothed unigram probabilities
      p(tok|lang) = (c+1)/(total+vocab) — one groupBy over the exploded
      token stream (the "train" shuffle, vocabulary-sized output);
    - score: each document's mean -ln p over its tokens, rounded at 1e-6
      (the repo's cross-engine float protocol: ln on exact integers is
      bit-identical libm in both engines; the per-doc mean is a short
      double sum, orders of magnitude above the partial-sum-order ulp);
    - bucket: ntile(n) per language ordered by (score, id) — a total
      order, so the equal-frequency split is deterministic and
      engine-exact. Bucket 1 = head (lowest perplexity) … n = tail,
      CCNet's exact downstream contract (they keep head+middle for
      training, route tail to filtering).

    Documents with zero tokens are returned with NULL score and bucket —
    callers route them to the length filters where they belong.

    Plan: explode → train groupBy (shuffle on (lang, tok)) → score join
    (shuffle on (lang, tok), vocabulary dim) → per-doc agg (shuffle on
    id) → per-lang window. Linear end-to-end, never all-pairs; the
    vocabulary join is the standard count-dim pattern and broadcasts
    when the vocab is small.
    """
    toks = F.split(F.trim(F.col(text_col)), WS_RX + "+")
    exploded = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        id_col, lang_col, F.explode(toks).alias("tok")
    )
    counts = exploded.groupBy(lang_col, "tok").agg(F.count("*").alias("c"))
    lang_tot = counts.groupBy(lang_col).agg(
        F.sum("c").alias("total"), F.count("*").alias("vocab")
    )
    nll = (
        exploded.join(counts, [lang_col, "tok"])
        .join(lang_tot, lang_col)
        .withColumn(
            "nlp",
            F.log(F.col("total") + F.col("vocab")) - F.log(F.col("c") + F.lit(1)),
        )
        .groupBy(id_col, lang_col)
        .agg(F.round(F.avg("nlp"), 6).alias("ppl_score"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("ppl_score").asc(), F.col(id_col).asc())
    scored = nll.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    return (
        docs.select(id_col, lang_col)
        .join(scored, [id_col, lang_col], "left")
        .select(
            id_col,
            lang_col,
            "ppl_score",
            F.col("ppl_bucket").cast("int").alias("ppl_bucket"),
        )
    )


def dedup_lines_spans(
    docs: DataFrame,
    kinds: tuple = ("text",),
    min_docs: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """Cross-document line dedup applied IN-PLACE over the interleaved
    spans column — ``dedup_lines`` lifted to the corpus schema the same
    way ``scrub_pii_spans`` lifts the PII scrub: the text of spans whose
    kind is in ``kinds`` has its boilerplate lines (trimmed text in >=
    ``min_docs`` distinct documents, >= ``min_chars`` chars) removed and
    the survivors re-joined in order; kind, media_ref, offset and the
    span array order are untouched, so the structural span invariant
    holds across this stage by construction while the full-text
    fingerprint is EXPECTED to differ exactly for the rewritten docs.

    Unlike the per-row scrub this is a corpus-global decision, so the
    plan carries the same shuffles as ``dedup_lines`` (line-key count,
    anti-join, per-span ordered rebuild) plus one map-collect per doc to
    splice rewritten texts back into the array — all keyed (line-key or
    doc_id), linear, never all-pairs; the duplicate-line set stays
    distributed (anti-join, no broadcast/collect).
    """
    spans_lines = (
        docs.select("doc_id", F.posexplode("spans").alias("span_pos", "s"))
        .filter(F.col("s.kind").isin(*kinds))
        .select(
            "doc_id",
            "span_pos",
            F.posexplode(F.split(F.coalesce(F.col("s.text"), F.lit("")), "\n")).alias(
                "pos", "line"
            ),
        )
    )
    key = F.trim(F.col("line"))
    lines = spans_lines.withColumn("k", F.when(F.length(key) >= min_chars, key))
    dup_keys = (
        lines.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count_distinct(F.col("doc_id")).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("k")
    )
    rebuilt = (
        lines.join(dup_keys, "k", "left_anti")
        .groupBy("doc_id", "span_pos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("new_text")
        )
    )
    rewrites = rebuilt.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("span_pos", "new_text"))).alias(
            "_rewrites"
        )
    )

    def rewrite(s, i):
        new = F.element_at(F.col("_rewrites"), i.cast("int"))
        return F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"].isin(*kinds), F.coalesce(new, F.lit(""))).otherwise(
                s["text"]
            ).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    return (
        docs.join(rewrites, "doc_id", "left")
        .withColumn("spans", F.transform("spans", rewrite))
        .drop("_rewrites")
    )


def _distinct_grams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) — each document's DISTINCT whitespace-token n-grams
    (the shared_ngram_doc_flags shingle stage, factored for reuse)."""
    toks_sql = f"split(trim({text_col}), '{WS_RX_SQL}+')"
    grams = F.when(
        F.size(_tokens(F.col(text_col))) >= n,
        F.expr(
            f"transform(sequence(1, size({toks_sql}) - {n} + 1),"
            f" i -> concat_ws(' ', slice({toks_sql}, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))


def decontaminate_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 §4 / PaLM App. D staple):
    flag training documents that share at least ``min_shared`` distinct
    token n-grams with a held-out benchmark corpus, so evaluation data
    can be scrubbed from the training mix. Returns one row per training
    document: (id, n_contaminated_grams, contaminated) — downstream
    drops or audits the flagged rows.

    Plan: both corpora reduce to DISTINCT per-doc n-grams (map-side),
    the benchmark side further to a DISTINCT gram set, then ONE join
    keyed by gram + a per-doc count — linear in both corpora, never
    all-pairs, and the benchmark gram set stays distributed (a real
    benchmark suite is millions of grams; no broadcast/collect). The
    same 8-byte ``hash_shingles`` trade documented on
    ``shared_ngram_doc_flags`` applies at 100 TB.
    """
    doc_grams = _distinct_grams(docs, n, id_col, text_col)
    bench_grams = (
        _distinct_grams(
            benchmark.select(F.col(bench_text_col).alias("text")).withColumn(
                "_bid", F.monotonically_increasing_id()
            ),
            n,
            "_bid",
            "text",
        )
        .select("gram")
        .distinct()
    )
    counts = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_grams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) >= min_shared).alias(
                "contaminated"
            ),
        )
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global vocabulary heavy hitters: the k most frequent whitespace
    tokens with total and document frequencies — the corpus-analysis
    staple behind tokenizer training, stop-word induction and quality
    debugging. (token, tf, df, rank); rank by (tf desc, token asc) — a
    total order, engine-exact.

    Plan: explode → ONE groupBy(token) computing tf + df together →
    global top-k. The top-k is a TakeOrdered over the aggregated
    vocabulary (k rows to the driver, not the vocabulary); the single
    full shuffle is the token groupBy, linear in corpus tokens.
    """
    toks = _tokens(F.col(text_col))
    exploded = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.explode(toks).alias("token")
    )
    agg = exploded.groupBy("token").agg(
        F.count("*").alias("tf"), F.count_distinct(F.col(id_col)).alias("df")
    )
    # orderBy+limit plans as TakeOrderedAndProject — per-partition
    # partial top-k, k rows to the driver, never the vocabulary. The
    # rank window then runs over only those k survivors (a global
    # window BEFORE the limit would funnel the whole vocab through one
    # partition).
    top = agg.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "tf", "df", F.col("rank").cast("int").alias("rank")
    )
