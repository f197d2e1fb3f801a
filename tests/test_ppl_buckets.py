"""Unit coverage for operators/textprep.unigram_ppl_buckets — the CCNet
LM quality stratification: empty-doc routing, per-language training
isolation, bucket ordering (head = most-probable text).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_empty_docs_get_null_score_and_bucket(spark):
    from mimirsbrunn_spark.operators.textprep import unigram_ppl_buckets

    docs = _docs(spark, [(1, "en", "real words here"), (2, "en", "   "), (3, "en", "")])
    out = {r["doc_id"]: r for r in unigram_ppl_buckets(docs).collect()}
    assert out[1]["ppl_score"] is not None
    assert out[2]["ppl_score"] is None and out[2]["ppl_bucket"] is None
    assert out[3]["ppl_score"] is None
    assert len(out) == 3  # empty docs still returned, one row per doc


def test_head_bucket_is_most_probable(spark):
    from mimirsbrunn_spark.operators.textprep import unigram_ppl_buckets

    # doc 1 repeats the corpus-dominant token -> lowest mean NLL -> head;
    # doc 3 is all hapaxes -> tail
    docs = _docs(
        spark,
        [
            (1, "en", "common common common common"),
            (2, "en", "common rare1 common rare2"),
            (3, "en", "only unique tokens appear once"),
        ],
    )
    out = {r["doc_id"]: r for r in unigram_ppl_buckets(docs, n_buckets=3).collect()}
    assert out[1]["ppl_bucket"] == 1
    assert out[3]["ppl_bucket"] == 3
    assert out[1]["ppl_score"] < out[2]["ppl_score"] < out[3]["ppl_score"]


def test_languages_train_independently(spark):
    from mimirsbrunn_spark.operators.textprep import unigram_ppl_buckets

    # identical text in two languages must score against ITS language's
    # model: the en corpus makes "shared" dominant, the fr corpus makes
    # it a hapax among many -> different scores for the same text
    docs = _docs(
        spark,
        [
            (1, "en", "shared shared shared"),
            (2, "en", "shared shared other"),
            (3, "fr", "shared shared shared"),
            (4, "fr", "un deux trois quatre cinq six sept huit"),
        ],
    )
    out = {r["doc_id"]: r for r in unigram_ppl_buckets(docs).collect()}
    assert out[1]["ppl_score"] != out[3]["ppl_score"]
    # buckets are per-language: each language has its own bucket 1
    assert out[1]["ppl_bucket"] == 1 and out[3]["ppl_bucket"] == 1


def test_equal_frequency_split(spark):
    from mimirsbrunn_spark.operators.textprep import unigram_ppl_buckets

    docs = _docs(spark, [(i, "en", f"tok{i % 4} tok{i % 7} filler") for i in range(30)])
    out = unigram_ppl_buckets(docs, n_buckets=3).toPandas()
    sizes = out.groupby("ppl_bucket").size()
    assert sizes.max() - sizes.min() <= 1  # ntile equal-frequency contract
