"""Span-sequence invariant: fingerprints, the text-prep rewrite stage,
and the production job's abort-on-mutilation gate (VERDICT r03 #2).

The north rule requires every stage to preserve the per-row span
sequence (kind, text, media_ref, order). A text-rewriting stage (PII
scrub) legitimately changes text — so the gate splits: STRUCTURE
(kind, media_ref, offset, order) must always hold; full-text equality
must hold when no rewriting stage ran, and its diff count is the
rewrite's reported, expected effect.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.spans import (
    span_invariant_violations,
    span_structure_violations,
)
from mimirsbrunn_spark.operators.textprep import scrub_pii_spans


@pytest.fixture(scope="module")
def pii_docs(spark, fixtures_dir, tmp_path_factory):
    """Fixture docs with PII injected into the first text span of half
    the docs (datagen text spans are clean words, so the scrub would
    otherwise be a no-op and the expected-diff assertion vacuous)."""
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    injected = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(
                    (s["kind"] == "text") & (s["offset"] == 0)
                    & (F.crc32(F.col("doc_id")) % 2 == 0),
                    F.concat(s["text"], F.lit(" contact bob@example.com now")),
                ).otherwise(s["text"]).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    out = str(tmp_path_factory.mktemp("pii") / "docs.parquet")
    injected.write.mode("overwrite").parquet(out)
    return out


def test_scrub_preserves_structure_rewrites_text(spark, pii_docs):
    docs = spark.read.parquet(pii_docs)
    scrubbed = scrub_pii_spans(docs)
    assert span_structure_violations(docs, scrubbed) == 0
    changed = span_invariant_violations(docs, scrubbed)
    n_pii = docs.filter(
        F.exists("spans", lambda s: s["text"].contains("bob@example.com"))
    ).count()
    assert n_pii > 0 and changed == n_pii
    assert scrubbed.filter(
        F.exists("spans", lambda s: s["text"].contains("bob@example.com"))
    ).count() == 0
    assert scrubbed.filter(
        F.exists("spans", lambda s: s["text"].contains("<EMAIL>"))
    ).count() == n_pii


def test_structure_violations_catch_drop_and_reorder(spark, fixtures_dir):
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    multi = docs.filter(F.size("spans") >= 2)
    n = multi.count()
    assert n > 0
    dropped = multi.withColumn("spans", F.slice("spans", 1, F.size("spans") - 1))
    assert span_structure_violations(multi, dropped) == n
    reordered = multi.withColumn("spans", F.reverse("spans"))
    assert span_structure_violations(multi, reordered) == n
    # media_ref retarget is also structural
    media = multi.filter(F.exists("spans", lambda s: s["kind"] == "media"))
    retargeted = media.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                F.when(s["kind"] == "media", F.lit("media:EVIL"))
                .otherwise(s["media_ref"]).alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    assert span_structure_violations(media, retargeted) == media.count()


def _run_job(pii_docs, fixtures_dir, out, text_prep):
    import jobs.index_corpus as job

    job.main([
        "--docs", pii_docs, "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", out, "--res", "7", "--text-prep", text_prep,
    ])
    return json.loads((Path(out) / "run_report.json").read_text())


def test_job_pii_prep_end_to_end(spark, pii_docs, fixtures_dir, tmp_path):
    report = _run_job(pii_docs, fixtures_dir, str(tmp_path / "out"), "pii")
    assert report["structure_violations"] == 0
    assert report["text_prep"] == "pii"
    assert report["docs_text_rewritten"] > 0
    assert report["points"] > 0


def test_job_aborts_on_mutilating_stage(spark, pii_docs, fixtures_dir, tmp_path, monkeypatch):
    """A stage that drops a span must hard-abort the publish."""
    import mimirsbrunn_spark.operators.textprep as tp

    def evil_scrub(docs, kinds=("text",)):
        return docs.withColumn(
            "spans",
            F.when(F.size("spans") >= 2, F.slice("spans", 1, F.size("spans") - 1))
            .otherwise(F.col("spans")),
        )

    monkeypatch.setattr(tp, "scrub_pii_spans", evil_scrub)
    with pytest.raises(SystemExit, match="span-STRUCTURE invariant"):
        _run_job(pii_docs, fixtures_dir, str(tmp_path / "out_evil"), "pii")


def test_job_gopher_filter_end_to_end(spark, pii_docs, fixtures_dir, tmp_path):
    """--quality-filter gopher drops low-quality docs, survivors pass
    the span gates byte-identical, and the dropped count is reported."""
    import jobs.index_corpus as job

    out = str(tmp_path / "out_gq")
    # --gopher-min-stop 0: the datagen corpus is French-street-vocabulary,
    # so the English stop-word rule is disabled here (the driver gate's
    # documents table exercises it with the default 2)
    job.main([
        "--docs", pii_docs, "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", out, "--res", "7",
        "--quality-filter", "gopher", "--gopher-min-words", "3",
        "--gopher-min-stop", "0",
    ])
    report = json.loads((Path(out) / "run_report.json").read_text())
    assert report["quality_filter"] == "gopher"
    assert report["structure_violations"] == 0
    assert "invariant_violations" not in report  # hardcoded key removed (VERDICT r04)
    assert report["points"] > 0
    n_docs = spark.read.parquet(pii_docs).count()
    assert 0 <= report["docs_dropped_by_quality"] < n_docs
    # a harsh threshold must drop strictly more docs
    out2 = str(tmp_path / "out_gq_harsh")
    job.main([
        "--docs", pii_docs, "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", out2, "--res", "7",
        "--quality-filter", "gopher", "--gopher-min-words", "10000",
        "--gopher-min-stop", "0",
    ])
    report2 = json.loads((Path(out2) / "run_report.json").read_text())
    assert report2["docs_dropped_by_quality"] == n_docs
    assert report2["points"] == 0


def test_allow_missing_after_tolerates_drops_only(spark, fixtures_dir):
    """allow_missing_after lets a doc-DROPPING stage pass its expected
    drops without the job pre-aligning the wide source table to the
    survivors via a full-corpus semi-join — but it must still flag
    invented docs (after-only) and changed span sequences."""
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    n = docs.count()
    survivors = docs.filter(F.abs(F.xxhash64("doc_id")) % 3 == 0)
    n_drop = n - survivors.count()
    assert n_drop > 0

    # drops: counted strictly, ignored when allowed
    assert span_structure_violations(docs, survivors) == n_drop
    assert span_structure_violations(docs, survivors, allow_missing_after=True) == 0
    assert span_invariant_violations(docs, survivors, allow_missing_after=True) == 0

    # an invented doc is a violation in BOTH modes
    invented = survivors.unionByName(
        survivors.limit(1).withColumn("doc_id", F.concat(F.col("doc_id"), F.lit(":invented")))
    )
    assert span_structure_violations(docs, invented, allow_missing_after=True) == 1

    # a rewritten survivor still trips the text-sequence gate
    rewritten = survivors.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.concat(s["text"], F.lit("!")).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    assert span_invariant_violations(
        docs, rewritten, allow_missing_after=True
    ) == survivors.count()
    # ...but not the structure gate (text is not structural)
    assert span_structure_violations(docs, rewritten, allow_missing_after=True) == 0


def test_nulled_spans_on_survivor_is_a_violation(spark, fixtures_dir):
    """A SURVIVING doc whose spans column got nulled must be flagged even in
    allow_missing_after mode: its fingerprint hashes to NULL
    (to_json(NULL) is NULL), and a presence check keyed on the fingerprint
    column would misread that as a legitimate drop. Presence must come
    from the join key, not the hash."""
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    one_id = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    nulled = docs.withColumn(
        "spans",
        F.when(F.col("doc_id") == one_id, F.lit(None)).otherwise(F.col("spans")),
    )
    assert span_structure_violations(docs, nulled, allow_missing_after=True) == 1
    assert span_invariant_violations(docs, nulled, allow_missing_after=True) == 1
    assert span_structure_violations(docs, nulled) == 1
    # symmetric: NULL->real is also a change, and NULL->NULL is not
    assert span_structure_violations(nulled, docs, allow_missing_after=True) == 1
    assert span_structure_violations(nulled, nulled, allow_missing_after=True) == 0
