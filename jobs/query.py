"""Command-line forward geocoding over a published lake (src/bin/query.rs).

The reference's `query` binary builds the PREFIX DSL for a search string
(optionally with a proximity coord), runs it against the munin aliases,
and prints the results. Same surface here over the lake:

    spark-submit --py-files mimirsbrunn_spark.zip jobs/query.py \
        --lake /lake "rue hector malot" [--lat 48.85 --lon 2.35] \
        [--limit 10] [--lang fr] [--type street --type addr] [--json]

Builds the J8 union view from whatever tables are published (admins,
every addresses_* dataset, streets, stops, pois), runs the T1-T9
autocomplete (PREFIX → FUZZY retry, request validation in front), and
prints one line per hit — or, with --json, the full GeocodeJSON
FeatureCollection (C10). Validation failures exit non-zero with the
typed message, like clap/serde rejection in the reference.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# rich columns forwarded through the union when a table carries them, so
# --lang i18n matching (T3 names/labels best-of-fields), the house-number
# boost, and the full C10 Feature (admins/insee/level) all work from the
# CLI, not just the indexer path
RICH_COLS = [
    # NOT zip_codes_str: the zip_codes array already rides in PLACE_COLS
    # and a typed-null zip_codes_str column would shadow the array path
    # in full_label_tokens
    "names", "labels", "alt_name", "loc_name",
    "house_number", "street", "insee", "level", "zone_type", "admins",
    "poi_type",
]


def build_places(spark, lake: str, types=None):
    from mimirsbrunn_spark.operators.union_view import places_view
    from mimirsbrunn_spark.sources import read_published
    from mimirsbrunn_spark.sources.lifecycle import read_published_union

    def opt(name):
        try:
            return read_published(spark, lake, name)
        except FileNotFoundError:
            return None

    return places_view(
        spark,
        addrs=read_published_union(spark, lake, "addresses_"),
        streets=opt("streets"),
        admins=opt("admins"),
        pois=opt("pois"),
        stops=opt("stops"),
        types=types,
        extra_cols=RICH_COLS,
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Querying the lake from the commandline")
    ap.add_argument("q", help="search string")
    ap.add_argument("--lake", required=True)
    ap.add_argument("--lat", type=float, default=None)
    ap.add_argument("--lon", type=float, default=None)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--lang", default="fr")
    ap.add_argument("--type", action="append", dest="types", default=None,
                    help="restrict to engine place types (repeatable)")
    ap.add_argument("--json", action="store_true",
                    help="print a GeocodeJSON FeatureCollection instead of lines")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimirsbrunn_spark.functions.bragi_api import (
        InvalidRequestError,
        ValidationError,
        validate_forward_query,
    )

    ENGINE_TYPES = {"addr", "street", "admin", "poi", "stop"}
    coord = None
    if args.lat is not None or args.lon is not None:
        coord = (args.lon, args.lat)  # validation rejects a lone one
    # validate BEFORE any Spark/lake work: a malformed request must not
    # pay SparkSession startup + footer reads of every published table
    try:
        if args.types:
            bad = set(args.types) - ENGINE_TYPES
            if bad:
                raise ValidationError(
                    f"unknown place types {sorted(bad)}; valid: {sorted(ENGINE_TYPES)}"
                )
        validate_forward_query(
            args.q,
            lat=args.lat, lon=args.lon,
            limit=args.limit, lang=args.lang,
        )
    except (ValidationError, InvalidRequestError) as e:
        raise SystemExit(f"invalid query: {e}")

    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(app_name="query", cpus=args.cpus)
    places = build_places(spark, args.lake, types=args.types)

    from mimirsbrunn_spark.functions.geocode import autocomplete

    try:
        hits, mode = autocomplete(
            places, args.q, k=args.limit, coord=coord,
            types=args.types, lang=args.lang,
        )
    except (ValidationError, InvalidRequestError) as e:
        raise SystemExit(f"invalid query: {e}")

    if args.json:
        from mimirsbrunn_spark.functions.geocodejson import (
            geocodejson_response,
            to_geocodejson,
        )

        feats = [r["feature"] for r in to_geocodejson(hits).collect()]
        print(geocodejson_response(feats, q=args.q))
    else:
        for i, r in enumerate(hits.collect(), 1):
            print(f"{i}\t{r['type']}\t{r['id']}\t{r['label']}\t{r['score']:.4f}")
        print(f"# mode={mode}", file=sys.stderr)


if __name__ == "__main__":
    main()
