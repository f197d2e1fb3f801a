"""ctlmimir (src/bin/ctlmimir.rs): install the schema templates, print
the resolved configuration, report storage status.

The reference's ctl pushes the component/index templates from its
config dir into Elasticsearch before any indexer runs
(utils/template.rs update_templates) and can echo its resolved settings.
Lake mapping:

    spark-submit jobs/ctl.py run    --lake /lake [--catalog corpus]
    spark-submit jobs/ctl.py config --lake /lake
    spark-submit jobs/ctl.py status --lake /lake

``run`` materializes the S12 install set (`schemas.corpus_install_ddl`):
with an Iceberg catalog on the session it executes each CREATE TABLE,
otherwise it writes the DDL files under ``{lake}/_templates/`` so the
install set ships with the lake (the committed-DDL protocol,
COVERAGE S12). ``config`` prints the resolved settings as JSON
(ctlmimir's Command::Config). ``status`` prints the /status body.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["run", "config", "status"])
    ap.add_argument("--lake", required=True)
    ap.add_argument("--catalog", default="corpus",
                    help="Iceberg namespace for the install DDL")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimirsbrunn_spark import __version__, schemas
    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(app_name="ctl", cpus=args.cpus)
    ddl = schemas.corpus_install_ddl(catalog_ns=args.catalog)

    if args.cmd == "config":
        print(json.dumps({
            "version": __version__,
            "spark": spark.version,
            "lake": args.lake,
            "catalog_ns": args.catalog,
            "tables": sorted(ddl),
        }, indent=2))
        return
    if args.cmd == "status":
        from mimirsbrunn_spark.status import status_response

        print(json.dumps(status_response(spark, args.lake), indent=2))
        return

    # run: update_templates. Iceberg catalog present → execute; only the
    # catalog-ABSENT condition falls back to persisting the DDL with the
    # lake — any other failure (missing namespace, permissions, bad
    # catalog config) propagates, as the reference's update_templates
    # fails loudly rather than pretending the install happened.
    applied, written = [], []
    for name, stmt in sorted(ddl.items()):
        try:
            spark.sql(stmt)
            applied.append(name)
        except Exception as e:
            msg = str(e)
            jar_absent = "DATA_SOURCE_NOT_FOUND" in msg or (
                "iceberg" in msg.lower() and "data source" in msg.lower()
            )
            if not jar_absent:
                raise
            out = Path(args.lake) / "_templates" / f"{name}.sql"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(stmt + "\n")
            written.append(str(out))
    print(json.dumps({"applied": applied, "written": written}))


if __name__ == "__main__":
    main()
