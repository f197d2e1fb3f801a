"""Span-preserving cross-document line dedup (dedup_lines_spans) and
its production-job stage (--text-prep line_dedup): structure invariant
by construction, boilerplate removed corpus-wide, media spans and
non-boilerplate text untouched.
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
from mimirsbrunn_spark.operators.textprep import dedup_lines_spans

FOOTER = "standard legal boilerplate footer line"


@pytest.fixture(scope="module")
def boiler_docs(spark, fixtures_dir, tmp_path_factory):
    """Fixture docs with a shared boilerplate line appended to the first
    text span of half the docs (datagen spans are single-line unique
    word soup, so the dedup would otherwise be a no-op and the
    expected-diff assertion vacuous)."""
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
                    F.concat(s["text"], F.lit(f"\n{FOOTER}")),
                ).otherwise(s["text"]).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    out = str(tmp_path_factory.mktemp("boiler") / "docs.parquet")
    injected.write.mode("overwrite").parquet(out)
    return out


def test_spans_dedup_preserves_structure_rewrites_text(spark, boiler_docs):
    docs = spark.read.parquet(boiler_docs)
    out = dedup_lines_spans(docs)
    assert span_structure_violations(docs, out) == 0
    n_boiler = docs.filter(
        F.exists("spans", lambda s: s["text"].contains(FOOTER))
    ).count()
    assert n_boiler > 0
    # every boilerplate-bearing doc was rewritten (the datagen corpus
    # may carry a few naturally cross-doc-duplicated word-soup lines on
    # top — the exact changed==dup_docs identity is pinned in the next
    # test; here: at least the injected footer class, never fewer)
    assert span_invariant_violations(docs, out) >= n_boiler
    assert out.filter(
        F.exists("spans", lambda s: s["text"].contains(FOOTER))
    ).count() == 0
    # corpus-UNIQUE first lines of rewritten spans survive intact (a
    # first line that itself collides across docs is legitimately
    # removable, so restrict to the unique ones)
    firsts = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(
        (F.col("s.kind") == "text") & F.col("s.text").contains(FOOTER)
    ).select("doc_id", F.trim(F.split("s.text", "\n")[0]).alias("first"))
    all_lines = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "text").select(
        "doc_id", F.explode(F.split("s.text", "\n")).alias("line")
    ).select("doc_id", F.trim("line").alias("k"))
    uniq = all_lines.groupBy("k").agg(
        F.count_distinct("doc_id").alias("nd")
    ).filter(F.col("nd") == 1).select("k")
    unique_firsts = [r["first"] for r in firsts.join(
        uniq, firsts["first"] == uniq["k"]).collect()]
    assert unique_firsts  # the injected half has unique word-soup leads
    kept = set(
        r["t"] for r in out.select(
            F.explode("spans").alias("s")
        ).filter(F.col("s.kind") == "text").select(F.trim(F.col("s.text")).alias("t")).collect()
    )
    assert all(f in kept for f in unique_firsts)


def test_spans_dedup_media_untouched_roundtrip_when_clean(spark, fixtures_dir):
    docs = spark.read.parquet(f"{fixtures_dir}/docs.parquet")
    out = dedup_lines_spans(docs)
    assert span_structure_violations(docs, out) == 0
    # datagen corpus has no cross-doc duplicate lines >= 10 chars within
    # a single fixture half? it MAY — assert only that untouched docs
    # round-trip byte-exact: rewritten count equals docs whose text
    # actually contained a corpus-duplicated line
    changed = span_invariant_violations(docs, out)
    lines = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "text").select(
        "doc_id", F.explode(F.split("s.text", "\n")).alias("line")
    ).select("doc_id", F.trim("line").alias("k"))
    dup_docs = (
        lines.filter(F.length("k") >= 10)
        .groupBy("k").agg(F.count_distinct("doc_id").alias("nd"),
                          F.collect_set("doc_id").alias("ids"))
        .filter(F.col("nd") >= 2)
        .select(F.explode("ids").alias("doc_id")).distinct().count()
    )
    assert changed == dup_docs


def test_job_line_dedup_end_to_end(spark, boiler_docs, fixtures_dir, tmp_path):
    import jobs.index_corpus as job

    out = str(tmp_path / "out_ld")
    job.main([
        "--docs", boiler_docs, "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", out, "--res", "7", "--text-prep", "line_dedup",
    ])
    report = json.loads((Path(out) / "run_report.json").read_text())
    assert report["structure_violations"] == 0
    assert report["text_prep"] == "line_dedup"
    assert report["docs_text_rewritten"] > 0
    assert report["points"] > 0
    # the dedup is observable end-to-end: re-applying the stage op to
    # the input corpus leaves nothing footer-bearing (the job publishes
    # points/coverage, not the corpus — the rewritten table lives in
    # the stage checkpoint consumed by downstream stages)
    docs = spark.read.parquet(boiler_docs)
    assert dedup_lines_spans(docs).filter(
        F.exists("spans", lambda s: s["text"].contains(FOOTER))
    ).count() == 0


def test_job_line_dedup_composes_with_gopher(spark, boiler_docs, fixtures_dir, tmp_path):
    """Both optional stages together: the line-dedup rewrite feeds the
    Gopher doc filter; survivors are footer-free AND above the word
    floor, the report carries both stages' effects, and the span
    structure gate holds across the composition."""
    import jobs.index_corpus as job

    out = str(tmp_path / "out_ld_gq")
    job.main([
        "--docs", boiler_docs, "--admins", f"{fixtures_dir}/admins.parquet",
        "--out", out, "--res", "7", "--text-prep", "line_dedup",
        "--quality-filter", "gopher", "--gopher-min-words", "3",
        "--gopher-min-stop", "0",
    ])
    report = json.loads((Path(out) / "run_report.json").read_text())
    assert report["structure_violations"] == 0
    assert report["text_prep"] == "line_dedup"
    assert report["quality_filter"] == "gopher"
    assert report["docs_text_rewritten"] > 0
    assert report["points"] > 0
