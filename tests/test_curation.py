"""Unit coverage for operators/curation.py (stratified sampling +
next-fit sequence packing) — the branches the document-corpus gates
can't isolate: oversize-bin isolation, mode validation, no-exchange
plan shape for the rate path, cross-run determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


class TestStratifiedSample:
    def test_mode_validation(self, spark):
        from mimirsbrunn_spark.operators.curation import stratified_sample

        d = _docs(spark, [(1, "en")])
        q = d.select("lang").distinct().withColumn("quota", F.lit(1))
        with pytest.raises(ValueError):
            stratified_sample(d)  # neither
        with pytest.raises(ValueError):
            stratified_sample(d, quotas=q, rate=0.5)  # both

    def test_quota_mode_exact_counts_and_determinism(self, spark):
        from mimirsbrunn_spark.operators.curation import stratified_sample

        d = _docs(spark, [(i, "en" if i % 3 else "fr") for i in range(60)])
        q = d.select("lang").distinct().withColumn("quota", F.lit(7))
        a = stratified_sample(d, ("lang",), quotas=q)
        counts = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 7, "fr": 7}
        # pure function of the ids: same rows on a re-run
        b = stratified_sample(d, ("lang",), quotas=q)
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(r["doc_id"] for r in b.collect())

    def test_quota_exceeding_stratum_size_takes_all(self, spark):
        from mimirsbrunn_spark.operators.curation import stratified_sample

        d = _docs(spark, [(1, "de"), (2, "de")])
        q = d.select("lang").distinct().withColumn("quota", F.lit(99))
        assert stratified_sample(d, ("lang",), quotas=q).count() == 2

    def test_rate_mode_no_exchange_and_threshold(self, spark):
        from mimirsbrunn_spark.operators.curation import (
            HASH_P,
            stratified_sample,
        )

        d = _docs(spark, [(i, "en") for i in range(500)])
        s = stratified_sample(d, rate=0.3)
        plan = s._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        rows = s.collect()
        assert all(r["sample_h"] < int(0.3 * HASH_P) for r in rows)
        # selection is id-determined: subset relation holds across rates
        wider = {r["doc_id"] for r in stratified_sample(d, rate=0.6).collect()}
        assert {r["doc_id"] for r in rows} <= wider


class TestPackSequences:
    def _toks(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")

    def test_next_fit_walk(self, spark):
        from mimirsbrunn_spark.operators.curation import pack_sequences

        d = self._toks(
            spark,
            [(1, "en", 60), (2, "en", 30), (3, "en", 20), (4, "en", 95), (5, "en", 10)],
        )
        out = {r["doc_id"]: r for r in pack_sequences(d, budget=100).collect()}
        # 60+30 fits; +20 overflows -> bin 1 holds 20+95? no: 20, then 95
        # overflows -> bin 2; 10 joins bin 2 (95+10 > 100? yes -> bin 3)
        assert [(out[i]["bin"], out[i]["bin_pos"]) for i in (1, 2, 3, 4, 5)] == [
            (0, 0), (0, 1), (1, 0), (2, 0), (3, 0),
        ]

    def test_oversize_doc_isolated(self, spark):
        from mimirsbrunn_spark.operators.curation import pack_sequences

        d = self._toks(spark, [(1, "en", 50), (2, "en", 500), (3, "en", 40)])
        out = {r["doc_id"]: r for r in pack_sequences(d, budget=100).collect()}
        assert out[2]["bin"] not in (out[1]["bin"], out[3]["bin"])
        assert out[2]["bin_pos"] == 0
        # the oversize row never merges forward either
        assert out[3]["bin"] == out[2]["bin"] + 1

    def test_oversize_first_row(self, spark):
        from mimirsbrunn_spark.operators.curation import pack_sequences

        d = self._toks(spark, [(1, "en", 500), (2, "en", 40)])
        out = {r["doc_id"]: r for r in pack_sequences(d, budget=100).collect()}
        assert out[1]["bin"] == 1 and out[1]["bin_pos"] == 0
        assert out[2]["bin"] == 2

    def test_groups_pack_independently(self, spark):
        from mimirsbrunn_spark.operators.curation import pack_sequences

        d = self._toks(spark, [(1, "en", 80), (2, "fr", 80), (3, "en", 80), (4, "fr", 15)])
        out = pack_sequences(d, budget=100).collect()
        en = sorted((r["doc_id"], r["bin"]) for r in out if r["lang"] == "en")
        fr = sorted((r["doc_id"], r["bin"]) for r in out if r["lang"] == "fr")
        assert en == [(1, 0), (3, 1)]  # 80+80 splits
        assert fr == [(2, 0), (4, 0)]  # 80+15 packs

    def test_bin_sums_within_budget_unless_singleton(self, spark):
        from mimirsbrunn_spark.operators.curation import pack_sequences

        rows = [(i, "en", (i * 37) % 90 + 5) for i in range(60)]
        out = pack_sequences(self._toks(spark, rows), budget=120).toPandas()
        sums = out.groupby("bin")["n_tokens"].agg(["sum", "count"])
        over = sums[sums["sum"] > 120]
        assert (over["count"] == 1).all()


class TestTemperatureQuotas:
    def test_alpha_flattens_head(self, spark):
        from mimirsbrunn_spark.operators.curation import temperature_quotas

        d = _docs(spark, [(i, "en" if i < 80 else "fr") for i in range(100)])
        q1 = {r["lang"]: r["quota"] for r in temperature_quotas(d, total=50, alpha=1.0).collect()}
        q05 = {r["lang"]: r["quota"] for r in temperature_quotas(d, total=50, alpha=0.5).collect()}
        # alpha=1 reproduces corpus proportions; lower alpha moves quota
        # from the head language to the tail one
        assert q1 == {"en": 40, "fr": 10}
        assert q05["en"] < 40 and q05["fr"] > 10

    def test_quota_capped_at_stratum_size(self, spark):
        from mimirsbrunn_spark.operators.curation import temperature_quotas

        d = _docs(spark, [(1, "de"), (2, "de"), (3, "en")])
        q = {r["lang"]: r["quota"] for r in temperature_quotas(d, total=1000, alpha=0.7).collect()}
        assert q["de"] <= 2 and q["en"] <= 1

    def test_alpha_zero_is_uniform(self, spark):
        from mimirsbrunn_spark.operators.curation import temperature_quotas

        d = _docs(spark, [(i, "en" if i < 90 else "fr") for i in range(100)])
        q = {r["lang"]: r["quota"] for r in temperature_quotas(d, total=20, alpha=0.0).collect()}
        assert q == {"en": 10, "fr": 10}
