"""Serving job: reverse geocode query batches against a published,
Z-clustered address lake.

Run: spark-submit --py-files mimirsbrunn_spark.zip jobs/serve_reverse.py \
        --lake <clustered parquet path | published base dir with --name> \
        --queries <parquet of (query_id, lon, lat)> --out <dir> \
        [--stream --checkpoint <dir>] [--k 1] [--radius-m 1000] ...

The operational pairing of jobs/index_corpus.py: index publishes the
address table clustered on the Morton key (--zorder-output), this job
answers ``/reverse`` batches against it (bragi handlers.rs:344-384 →
ES geo_distance DSL, re-expressed as `plans/layout.reverse_geocode_lake`
— footer-stats file pruning + cell-ring kNN). --stream switches to the
Structured Streaming micro-batch server (`streaming/serving.py`), which
drains available query files exactly-once and exits. A _run_report.json
records query/result counts and the files-opened fraction — the metric
that transfers to a 100-TB lake.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lake", required=True, help="clustered parquet path, or a published base dir (with --name)")
    ap.add_argument("--name", default=None, help="published table name under --lake; resolves the _CURRENT generation")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default=None, help="required with --stream")
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--radius-m", type=float, default=1000.0)
    ap.add_argument("--res", type=int, default=7)
    ap.add_argument("--key-col", default="z_12")
    ap.add_argument("--key-res", type=int, default=None,
                    help="Morton res of --key-col; derived from its z_<res> name when omitted")
    ap.add_argument("--prefix-bits", type=int, default=6)
    ap.add_argument("--target-id", default="target_id")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimirsbrunn_spark.functions.bragi_api import ValidationError

    # request-boundary parameter validation (bragi routes.rs / api.rs:
    # limit must be positive, radius a positive number) — reject before
    # any Spark work, with the same typed-error surface as the endpoints
    if args.k <= 0:
        raise ValidationError("limit must be a positive integer")
    if not args.radius_m > 0:
        raise ValidationError("radius_m must be positive")

    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(app_name="serve_reverse", cpus=args.cpus)

    from mimirsbrunn_spark.status import MetricsRegistry, status_response

    from mimirsbrunn_spark.sources.lifecycle import resolve_generation

    lake_path = args.lake
    if args.name is not None:
        lake_path = str(resolve_generation(Path(args.lake) / args.name))

    metrics = MetricsRegistry()
    t_serve = time.monotonic()

    if args.stream:
        if not args.checkpoint:
            ap.error("--stream requires --checkpoint")
        from mimirsbrunn_spark.streaming.serving import reverse_geocode_stream

        q = reverse_geocode_stream(
            spark, args.queries, lake_path, args.out, args.checkpoint,
            k=args.k, radius_m=args.radius_m, res=args.res,
            key_col=args.key_col, key_res=args.key_res,
            prefix_bits=args.prefix_bits,
            target_id=args.target_id,
        )
        q.awaitTermination()
        batch_reports = [
            json.loads(p.read_text())
            for p in sorted(Path(args.out).glob("batch_id=*/_batch_report.json"))
        ]
        # a clean zero-batch run (empty/new queries dir) never creates
        # --out; report n_results=0 instead of a PATH_NOT_FOUND crash
        n_results = (
            spark.read.parquet(args.out).count()
            if any(Path(args.out).glob("batch_id=*"))
            else 0
        )
        nq = sum(r["n_queries"] for r in batch_reports)
        report = {
            "mode": "stream",
            "n_results": n_results,
            "n_batches": len(batch_reports),
            "n_queries": nq,
            "n_rejected": sum(r["n_rejected"] for r in batch_reports),
            # query-weighted: the fraction of lake files a query's batch opened
            "lake_files_pruned_fraction": round(
                sum(r["lake_files_pruned_fraction"] * r["n_queries"] for r in batch_reports) / nq, 4
            ) if nq else None,
        }
        # one histogram observation per micro-batch, one counter tick per
        # query (prometheus_handler.rs series; a query row = one /reverse)
        for r in batch_reports:
            metrics.inc_request("reverse", status=200, n=r["n_queries"])
            metrics.inc_request("reverse", status=400, n=r["n_rejected"])
            if "duration_s" in r:
                metrics.observe_duration("reverse", r["duration_s"])
    else:
        from mimirsbrunn_spark.functions.bragi_api import coord_validity_condition
        from mimirsbrunn_spark.plans.layout import (
            reverse_geocode_lake,
            windows_pruned_fraction,
        )

        queries = spark.read.parquet(args.queries)
        n_in = queries.count()
        valid = queries.filter(coord_validity_condition())
        out, info = reverse_geocode_lake(
            spark, lake_path, valid,
            k=args.k, radius_m=args.radius_m, res=args.res,
            key_col=args.key_col, key_res=args.key_res,
            prefix_bits=args.prefix_bits,
            target_id=args.target_id, return_scan_info=True,
        )
        out.write.mode("overwrite").parquet(args.out)
        n_results = spark.read.parquet(args.out).count()
        report = {
            "mode": "batch",
            "n_queries": info["n_queries"],
            "n_rejected": n_in - info["n_queries"],
            "n_results": n_results,
            "n_scan_windows": len(info["windows"]),
            "lake_files_pruned_fraction": round(
                windows_pruned_fraction(lake_path, info["windows"], args.key_col), 4
            ),
        }
        metrics.inc_request("reverse", status=200, n=info["n_queries"])
        metrics.inc_request("reverse", status=400, n=n_in - info["n_queries"])
        metrics.observe_duration("reverse", time.monotonic() - t_serve)
    # Underscore prefix so Spark's parquet reader skips it when re-reading
    # --out as a dataset (same convention as _SUCCESS). A zero-batch
    # stream run never created --out; the reports still belong there.
    Path(args.out).mkdir(parents=True, exist_ok=True)
    Path(args.out, "_run_report.json").write_text(json.dumps(report, indent=2))
    # /metrics + /status, file-published (handlers.rs:386-414): the .prom
    # text is scrape-ready; the status body has the reference's exact keys.
    metrics.write(Path(args.out, "_metrics.prom"))
    if args.name is not None:
        Path(args.out, "_status.json").write_text(
            json.dumps(status_response(spark, args.lake, [args.name]), indent=2)
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
