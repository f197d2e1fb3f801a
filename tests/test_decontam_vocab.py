"""Unit coverage for decontaminate_flags (benchmark n-gram
decontamination) and vocab_topk (global token heavy hitters) —
operators/textprep.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.textprep import decontaminate_flags, vocab_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH_SENT = "the quick brown fox jumps over the lazy dog"  # 9 tokens -> 8-grams exist


class TestDecontaminate:
    def test_flags_exact_and_embedded_overlap(self, spark):
        docs = _docs(
            spark,
            [
                (1, BENCH_SENT),  # verbatim benchmark copy
                (2, f"prefix words here {BENCH_SENT} suffix trailing"),  # embedded
                (3, "a completely clean document with no benchmark overlap at all"),
                (4, "the quick brown fox stops here"),  # shares only < 8-gram spans
            ],
        )
        bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
        out = {r["doc_id"]: r for r in decontaminate_flags(docs, bench, n=8).collect()}
        assert out[1]["contaminated"] and out[1]["n_contaminated_grams"] == 2
        assert out[2]["contaminated"]
        assert not out[3]["contaminated"] and out[3]["n_contaminated_grams"] == 0
        assert not out[4]["contaminated"]  # sub-n overlap is not contamination

    def test_min_shared_threshold(self, spark):
        docs = _docs(spark, [(1, BENCH_SENT)])
        bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
        # the 9-token sentence has exactly 2 distinct 8-grams
        strict = decontaminate_flags(docs, bench, n=8, min_shared=3).collect()[0]
        assert strict["n_contaminated_grams"] == 2 and not strict["contaminated"]

    def test_short_docs_never_flag(self, spark):
        docs = _docs(spark, [(1, "too short"), (2, "")])
        bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
        out = decontaminate_flags(docs, bench, n=8).collect()
        assert len(out) == 2 and not any(r["contaminated"] for r in out)


class TestVocabTopk:
    def test_counts_and_rank_order(self, spark):
        docs = _docs(spark, [(1, "a a a b b c"), (2, "a b z"), (3, "   ")])
        out = vocab_topk(docs, k=3).collect()
        assert [(r["token"], r["tf"], r["df"], r["rank"]) for r in out] == [
            ("a", 4, 2, 1),
            ("b", 3, 2, 2),
            ("c", 1, 1, 3),  # tf tie with z -> token asc wins
        ]

    def test_k_truncates_deterministically(self, spark):
        docs = _docs(spark, [(1, " ".join(f"tok{i}" for i in range(50)))])
        out = vocab_topk(docs, k=10).collect()
        assert len(out) == 10
        # all tf=1: the cut is by token asc — a total order, stable
        assert [r["token"] for r in out] == sorted(
            (f"tok{i}" for i in range(50))
        )[:10]

    def test_plan_is_take_ordered(self, spark):
        docs = _docs(spark, [(i, "w x y") for i in range(100)])
        df = vocab_topk(docs, k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
