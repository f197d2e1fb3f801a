"""Production job: index an interleaved-document corpus.

Run: spark-submit --py-files mimirsbrunn_spark.zip jobs/index_corpus.py \
        --docs <parquet/iceberg path> --admins <path> --out <dir> [--resume]

The cosmogony2mimir + bano2mimir shape (SURVEY §3) over the interleaved
corpus: every stage goes through plans.checkpoint.run_stage, so a killed
run resumes past completed stages (north rule), and each stage leaves a
lineage/metrics record. Stage outputs publish atomically via the
generation/pointer protocol.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--admins", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--res", type=int, nargs="+", default=[7, 8, 9, 10, 11, 12])
    ap.add_argument(
        "--fmt", choices=["auto", "iceberg", "parquet"], default="auto",
        help="input table format: auto (catalog ident or parquet path), "
             "iceberg (requires the iceberg-spark runtime), parquet",
    )
    ap.add_argument(
        "--strategy", choices=["auto", "broadcast", "partitioned"], default="auto",
        help="PIP join strategy: auto (measure the admin dim, broadcast when "
             "it fits the budget, else partitioned), broadcast (admin dim "
             "fits executor memory) or partitioned (beyond broadcast budget "
             "— salted cogroup refine)",
    )
    ap.add_argument(
        "--simplify-tolerance", type=float, default=None,
        help="opt-in Douglas-Peucker boundary simplification (degrees) applied "
             "to the admin dim before attachment — shrinks the WKB the "
             "partitioned refine ships per salt; attachments may change within "
             "~tolerance of a boundary",
    )
    ap.add_argument(
        "--geocodejson", action="store_true",
        help="also publish the attached points as GeocodeJSON feature lines",
    )
    ap.add_argument(
        "--text-prep", choices=["none", "pii", "line_dedup"], default="none",
        help="opt-in corpus text preparation applied before indexing: "
             "pii = email/phone masking over text spans (span structure "
             "is gate-checked unchanged; text is expected to differ)",
    )
    ap.add_argument(
        "--quality-filter", choices=["none", "gopher"], default="none",
        help="opt-in doc-DROPPING stage before indexing: gopher = the "
             "full Gopher rule set over the doc's concatenated text "
             "spans; surviving docs are gate-checked span-identical and "
             "the dropped count is reported as the stage's effect",
    )
    ap.add_argument(
        "--gopher-min-words", type=int, default=50,
        help="word-count lower bound for --quality-filter gopher",
    )
    ap.add_argument(
        "--gopher-min-stop", type=int, default=2,
        help="minimum occurrences of the Gopher English stop words "
             "(the/be/to/of/and/that/have/with) for --quality-filter "
             "gopher; set 0 for non-English corpora",
    )
    ap.add_argument(
        "--output-layout", choices=["plain", "zorder"], default="plain",
        help="zorder = publish points_indexed range-clustered on the "
             "res-12 Morton key (plans/layout.py): one extra range "
             "shuffle at write time, then any bbox/cell-scoped reader "
             "prunes non-matching files from parquet footer stats alone",
    )
    ap.add_argument(
        "--output-files", type=int, default=32,
        help="target file count for --output-layout zorder",
    )
    ap.add_argument(
        "--skew-sample", type=float, default=0.05,
        help="sample fraction for the run-report skew metrics (the skew "
             "ratio is scale-invariant under uniform sampling; 1.0 = exact "
             "full-corpus histogram)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mimirsbrunn_spark.operators.coverage import coverage_stats
    from mimirsbrunn_spark.operators.pip import attach_admins
    from mimirsbrunn_spark.operators.skew import skew_report
    from mimirsbrunn_spark.operators.spans import (
        extract_geo_points,
        span_invariant_violations,
        span_structure_violations,
    )
    from mimirsbrunn_spark.plans import run_stage
    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.sources import publish_table, read_table
    from mimirsbrunn_spark.tiles import s2_cell_pandas_udf, with_grid_cells

    spark = get_spark(app_name="index_corpus", cpus=args.cpus)
    docs = read_table(spark, args.docs, fmt=args.fmt)
    admins = read_table(spark, args.admins, fmt=args.fmt)
    if args.simplify_tolerance:
        from mimirsbrunn_spark.operators.pip import simplify_admin_boundaries

        admins = simplify_admin_boundaries(admins, args.simplify_tolerance).drop(
            "n_vertices_before", "n_vertices_after"
        )
    ckpt = str(Path(args.out) / "_checkpoints")

    # optional doc-REWRITING stage; everything downstream consumes its
    # output, and the invariant gate below runs ACROSS it (VERDICT r03
    # #2: the gate must protect a stage that emits a docs table, not
    # compare the untouched input against itself)
    if args.text_prep == "pii":
        from mimirsbrunn_spark.operators.textprep import scrub_pii_spans

        corpus = run_stage(
            spark, ckpt, "text_prep_pii", [args.docs],
            lambda: scrub_pii_spans(docs),
        )
    elif args.text_prep == "line_dedup":
        # cross-document boilerplate line removal (CCNet/C4), span-
        # preserving: structure (kind, media_ref, offset, order) is
        # untouched by construction, text rewrites are the stage's
        # reported effect — same contract as the PII stage
        from mimirsbrunn_spark.operators.textprep import dedup_lines_spans

        corpus = run_stage(
            spark, ckpt, "text_prep_line_dedup", [args.docs],
            lambda: dedup_lines_spans(docs),
        )
    else:
        corpus = docs

    # optional doc-DROPPING stage: Gopher rules over the concatenated
    # text spans; survivors pass through byte-identical (gate-checked
    # below), the dropped count is the stage's reported effect
    if args.quality_filter == "gopher":
        from mimirsbrunn_spark.operators.textprep import gopher_pass_predicate

        def _gopher(src):
            doc_text = F.concat_ws(
                " ",
                F.transform(
                    F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ),
            )
            # direct predicate filter — no flags projection, no left-semi
            # join back on doc_id (a full shuffle of both sides at corpus
            # scale); row set pinned equal to the flags-table spelling by
            # test_gopher_rules.test_predicate_equals_flags_filter
            return src.filter(
                gopher_pass_predicate(
                    doc_text,
                    min_words=args.gopher_min_words,
                    min_stop_words=args.gopher_min_stop,
                )
            )

        pre = corpus
        corpus = run_stage(
            spark, ckpt, "quality_filter_gopher", [args.docs],
            lambda: _gopher(pre),
            # v2: CRLF-aware gopher line split + ANSI-safe geo extraction
            # changed stage outputs on edge inputs — stale v1 checkpoints
            # must not be resumed
            version=f"v2:{args.text_prep}:minw{args.gopher_min_words}:mins{args.gopher_min_stop}",
        )

    points = run_stage(
        spark, ckpt, "extract_points", [args.docs],
        lambda: with_grid_cells(extract_geo_points(corpus), "lon", "lat", args.res).withColumn(
            "s2_cell", s2_cell_pandas_udf(16)(F.col("lon"), F.col("lat"))
        ),
        version=f"v2:{args.text_prep}:{args.quality_filter}{args.gopher_min_words}:{args.gopher_min_stop}",
    )

    # version salt mirrors extract_points: attach_admins consumes the
    # points table, whose content changes with the text-prep / quality
    # knobs even though its raw [docs, admins] inputs do not (ADVICE r04)
    attached = run_stage(
        spark, ckpt, "attach_admins", [args.docs, args.admins],
        lambda: attach_admins(
            points.withColumn("point_uid", F.concat_ws("#", "doc_id", "span_offset")),
            admins, strategy=args.strategy,
        ),
        version=f"v2:{args.text_prep}:{args.quality_filter}{args.gopher_min_words}:{args.gopher_min_stop}:st{args.simplify_tolerance}",
    )

    cov = run_stage(
        spark, ckpt, "coverage", [args.docs, args.admins],
        lambda: coverage_stats(corpus, admins, res=args.res[0]),
        version=f"v2:{args.text_prep}:{args.quality_filter}{args.gopher_min_words}:{args.gopher_min_stop}:st{args.simplify_tolerance}",
    )

    # invariant gates before publish (north rule: span sequence preserved).
    # Structural invariant (kind, media_ref, offset, order) must hold
    # across EVERY stage that emits a docs table — including a text-prep
    # rewrite; the full-text fingerprint must additionally hold when no
    # rewriting stage ran, and its diff count is the text-prep stage's
    # EXPECTED, reported effect otherwise.
    source_docs = read_table(spark, args.docs, fmt=args.fmt)
    n_dropped = 0
    allow_drops = args.quality_filter != "none"
    if allow_drops:
        # a filtering stage legitimately removes docs: the fingerprint
        # gates tolerate before-only rows (allow_missing_after) instead
        # of pre-aligning the WIDE source table to survivors with a
        # full-corpus semi-join — stages only drop, never add, so the
        # drop count is the count difference
        n_dropped = source_docs.count() - corpus.count()
    struct_violations = span_structure_violations(
        source_docs, corpus, allow_missing_after=allow_drops
    )
    if struct_violations:
        raise SystemExit(
            f"span-STRUCTURE invariant violated for {struct_violations} docs "
            "(span dropped/reordered/retyped); aborting publish"
        )
    text_changed = span_invariant_violations(
        source_docs, corpus, allow_missing_after=allow_drops
    )
    if args.text_prep == "none" and text_changed:
        raise SystemExit(
            f"span-sequence invariant violated for {text_changed} docs; aborting publish"
        )

    if args.output_layout == "zorder":
        # layout is result-transparent (gate zorder_cluster_scan); the
        # published generation additionally carries the z_12 key column
        # so scoped readers can push a morton_window range to the scan
        from mimirsbrunn_spark.tiles import with_morton_key

        out_points = (
            with_morton_key(attached, res=12)
            .repartitionByRange(args.output_files, F.col("z_12"))
            .sortWithinPartitions("z_12")
        )
    else:
        out_points = attached
    publish_table(out_points, args.out, "points_indexed")
    publish_table(cov, args.out, "coverage")
    if args.geocodejson:
        from mimirsbrunn_spark.functions import to_geocodejson

        features = to_geocodejson(
            attached.select(
                F.col("point_uid").alias("id"),
                F.lit("addr").alias("type"),
                F.col("point_uid").alias("name"),
                F.col("point_uid").alias("label"),
                "lon", "lat",
            )
        )
        publish_table(features, args.out, "geocodejson")
    report = {
        "points": attached.count(),
        "coverage_admins": cov.count(),
        # sampled (not full-corpus) occupancy stats: a metrics dict must
        # not cost an extra full aggregation at 10^12 docs (VERDICT r04)
        "skew": skew_report(points, sample_fraction=args.skew_sample),
        "structure_violations": struct_violations,
        "text_prep": args.text_prep,
        "docs_text_rewritten": text_changed if args.text_prep != "none" else 0,
        "quality_filter": args.quality_filter,
        "docs_dropped_by_quality": n_dropped,
        "output_layout": args.output_layout,
    }
    (Path(args.out) / "run_report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
