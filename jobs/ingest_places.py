"""The *2mimir ingest family as one parameterized spark-submit job.

The reference ships per-source indexer binaries (src/bin/: cosmogony2mimir,
bano2mimir, openaddresses2mimir, osm2mimir, ntfs2mimir, poi2mimir), each
reading its source format, enriching against the already-indexed admins,
and bulk-indexing into a fresh ES index behind an alias swap. This job is
the same operational surface on the lake:

    spark-submit --py-files mimirsbrunn_spark.zip jobs/ingest_places.py \
        --source cosmogony --input zones.jsonl.gz --lake /lake
    ... --source bano          --input bano/*.csv  --lake /lake
    ... --source openaddresses --input oa/*.csv    --lake /lake
    ... --source osm           --input streets.parquet --lake /lake
    ... --source ntfs          --input ntfs_dir/   --lake /lake
    ... --source poi           --input poi_dir/    --lake /lake

Ingest order mirrors the reference's: cosmogony first (it publishes the
`admins` dim every other source attaches against); addresses before POIs
if the POI nearest-address join (G8) should find anything. Every publish
is the S9 generation + atomic `_CURRENT` swap, so serving never observes
a half-written table, and a failed run leaves the previous generation
live — the alias-dance guarantee of the reference's indexers
(storage.rs:129-205).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLE_FOR_SOURCE = {
    "cosmogony": "admins",
    # address sources publish per-dataset tables (the reference's
    # munin_addr_{dataset} indices under one alias,
    # configuration.rs root_doctype_dataset): bano + openaddresses with
    # distinct --dataset values coexist; same dataset = replace.
    "bano": "addresses_{dataset}",
    "openaddresses": "addresses_{dataset}",
    "osm": "streets",
    "ntfs": "stops",
    "poi": "pois",
}


def read_all_addresses(spark, lake: str):
    """Union every published addresses_* dataset table (the alias view
    over per-dataset indices, J8). Returns None when none exist."""
    from mimirsbrunn_spark.sources.lifecycle import read_published_union

    return read_published_union(spark, lake, "addresses_")


def _load_admins(spark, lake: str, admins_table: str):
    from mimirsbrunn_spark.sources import read_published

    try:
        return read_published(spark, lake, admins_table)
    except (OSError, ValueError, KeyError, TypeError) as e:
        raise SystemExit(
            f"no published '{admins_table}' table under {lake} — run "
            f"--source cosmogony first (the reference's indexers likewise "
            f"require admins to be indexed before addresses/streets/pois): {e}"
        )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, choices=sorted(TABLE_FOR_SOURCE))
    ap.add_argument("--input", required=True)
    ap.add_argument("--lake", required=True, help="publish root (S9 generation protocol)")
    ap.add_argument("--table", default=None,
                    help="override the published table name (default per --source)")
    ap.add_argument("--admins-table", default="admins")
    ap.add_argument("--dataset", default="fr",
                    help="dataset suffix for address tables (the reference's "
                         "container dataset); distinct values coexist in the lake")
    ap.add_argument("--langs", default="fr,en")
    ap.add_argument("--no-french-id-retrocompatibility", action="store_true")
    ap.add_argument("--country-code", default="fr",
                    help="C3 name-template key for address ingest")
    ap.add_argument("--id-precision", type=int, default=0,
                    help="OpenAddresses fixed-point id precision (C6); 0 = raw")
    ap.add_argument("--pip-strategy", default="auto",
                    choices=["auto", "broadcast", "partitioned"])
    ap.add_argument("--keep-generations", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimirsbrunn_spark.session import get_spark
    from mimirsbrunn_spark.sources import publish_table

    spark = get_spark(app_name=f"{args.source}2mimir", cpus=args.cpus)
    table = args.table or TABLE_FOR_SOURCE[args.source].format(dataset=args.dataset)
    langs = tuple(s.strip() for s in args.langs.split(",") if s.strip())

    if args.source == "cosmogony":
        from mimirsbrunn_spark.sources.cosmogony import ZONES_SCHEMA, zones_to_admins
        from mimirsbrunn_spark.sources.readers import read_cosmogony_jsonl

        # cache: zones_to_admins scans the source from three subtrees
        # (the slim id-map broadcast, base, and the geometry branch) —
        # without this the gzip JSONL is parsed three times
        zones = read_cosmogony_jsonl(spark, args.input, schema=ZONES_SCHEMA).cache()
        out = zones_to_admins(
            zones,
            langs=langs,
            french_id_retrocompatibility=not args.no_french_id_retrocompatibility,
        )
    elif args.source in ("bano", "openaddresses"):
        from pyspark.sql import functions as F

        from mimirsbrunn_spark.operators.enrich import (
            attach_admin_structs,
            enrich_addresses,
        )
        from mimirsbrunn_spark.operators.pip import attach_admins
        from mimirsbrunn_spark.sources.readers import (
            read_bano_csv,
            read_openaddresses_csv,
        )

        admins = _load_admins(spark, args.lake, args.admins_table)
        if args.source == "bano":
            raw = read_bano_csv(spark, args.input)
        else:
            raw = read_openaddresses_csv(spark, args.input)
        # the partitioned refine keys its gather/replay on point_uid
        # (same pattern as jobs/index_corpus.py)
        raw = raw.withColumn(
            "point_uid", F.concat_ws("#", "id", "lon", "lat", "house_number")
        )
        attached = attach_admins(raw, admins, strategy=args.pip_strategy)
        out = enrich_addresses(
            attach_admin_structs(attached, admins),
            country_code=F.lit(args.country_code),
            # F6 insee/fantoir slicing is a BANO id property; OA ids are
            # hashes and the reference leaves the fields empty
            id_is_fantoir=(args.source == "bano"),
            id_precision=args.id_precision,
        ).drop("point_uid")
    elif args.source == "osm":
        from mimirsbrunn_spark.operators.places import streets_pipeline

        admins = _load_admins(spark, args.lake, args.admins_table)
        # OSM arrives pre-converted to the streets parquet shape
        # (SURVEY §2.1 S1: ways + node coord arrays + tags)
        out = streets_pipeline(spark.read.parquet(args.input), admins)
    elif args.source == "ntfs":
        from mimirsbrunn_spark.operators.places import stops_pipeline
        from mimirsbrunn_spark.sources.readers import read_ntfs_stops

        admins = _load_admins(spark, args.lake, args.admins_table)
        out = stops_pipeline(read_ntfs_stops(spark, args.input), admins)
    else:  # poi
        from mimirsbrunn_spark.operators.places import pois_pipeline
        from mimirsbrunn_spark.sources.readers import read_navitia_pois

        admins = _load_admins(spark, args.lake, args.admins_table)
        # no addresses yet is benign (reference keeps POIs without one);
        # a CORRUPT addresses pointer is NOT — read_all_addresses lets
        # that propagate instead of masking lake damage as absence
        addresses = read_all_addresses(spark, args.lake)
        out = pois_pipeline(
            read_navitia_pois(spark, args.input), admins, addresses=addresses
        )

    gen = publish_table(out, args.lake, table, keep_generations=args.keep_generations)
    n = spark.read.parquet(gen).count()
    report = {"source": args.source, "table": table, "generation": gen, "rows": n}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
