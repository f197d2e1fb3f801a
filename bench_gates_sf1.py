"""Heavy gate families at sf1 — 100x the driver's gate scale
(VERDICT r04 #4).

The driver ships deterministic tables at sf{0.001,0.01,0.1} only
(TESTDATA.md, read-only). This script synthesizes an sf1-shaped set by
deterministic 10x key-remapped replication of the sf0.1 tables
(new_key = old_key + rep * (max_key + 1), rep in 0..9): every gate
derives its point clouds / vocab places / shingle sets from the KEY
columns, so replication yields genuinely new points and places, and
both sides of each gate (Spark query and DuckDB oracle) read the SAME
scaled parquet — the comparison stays exact, only 10x bigger.

Scaled: orders (PIP rectangle + octagon clouds), customer (geocode
places), documents (dedup/LSH corpus). Every other table is copied
unchanged so the fixture dir registers the full view set.

Run: python bench_gates_sf1.py           (build + run + record)
Gate selection: the families the verdict names — PIP both strategies,
octagon both strategies, the dedup/LSH family, the geocode family.
Appends a GATES-SF1 section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent
SRC = Path("/root/testdata/sf0.1")
OUT = REPO / ".bench_cache" / "gate_sf1"
SCALE = 10
SCALED_KEYS = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "documents": "doc_id",
}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# the verdict's named families (test ids in tests/test_gate_oracle.py)
GATE_SELECT = (
    "pip_admins or octagon or pip_city_agg "
    "or dedup or minhash or simhash or jaccard or geocode"
)


def build() -> None:
    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = SRC / f"{t}.parquet"
        if not src.exists():
            continue
        dst = OUT / f"{t}.parquet"
        key = SCALED_KEYS.get(t)
        if key is None:
            shutil.copyfile(src, dst)
            continue
        # one part file per replication: a single ~30MB parquet maps to
        # ONE Spark input partition (maxPartitionBytes), serializing the
        # interpreted-HOF gates at sf1 — a directory of SCALE files keeps
        # every gate plan parallel, exactly like a real multi-file table
        if dst.exists() and dst.is_file():
            dst.unlink()
        dst.mkdir(parents=True, exist_ok=True)
        n = con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}')"
        ).fetchone()[0]
        for rep in range(SCALE):
            con.execute(
                f"""
                COPY (
                  SELECT * REPLACE ({key} + {rep} * {int(n)} AS {key})
                  FROM read_parquet('{src}')
                  ORDER BY {key}
                ) TO '{dst}/part-{rep:02d}.parquet' (FORMAT PARQUET)
                """
            )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/*.parquet')"
        ).fetchone()[0]
        print(f"scaled {t}: {rows} rows in {SCALE} files")
    (OUT / "_DONE").touch()


def main() -> None:
    build()
    env = dict(os.environ, SPARK_GRAFT_GATE_SF_DIR=str(OUT))
    la0 = Path("/proc/loadavg").read_text().split()[:3]
    t0 = time.perf_counter()
    log = REPO / ".bench_cache" / "gates_sf1_pytest.log"
    with open(log, "w") as lf:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_gate_oracle.py",
             "-v", "--durations=0", "-k", GATE_SELECT, "-p", "no:cacheprovider"],
            cwd=REPO, env=env, stdout=lf, stderr=subprocess.STDOUT, text=True,
        )
    wall = time.perf_counter() - t0
    la1 = Path("/proc/loadavg").read_text().split()[:3]
    out_text = log.read_text()
    tail = "\n".join(out_text.strip().splitlines()[-3:])
    print(tail)
    m = re.search(r"(\d+) passed", out_text)
    n_pass = int(m.group(1)) if m else 0
    ok = proc.returncode == 0 and n_pass > 0
    report = {
        "gates_passed": n_pass,
        "rc": proc.returncode,
        "wall_sec": round(wall, 1),
        "loadavg_before": la0,
        "loadavg_after": la1,
        "sf_dir": str(OUT),
    }
    print(json.dumps(report))
    if not ok:
        print(out_text[-4000:])
        sys.exit(1)

    md = REPO / "BENCH" / "BASELINE.md"
    text = md.read_text()
    block = (
        "<!-- GATES-SF1 -->\n"
        "## Heavy gate families at sf1 (100x driver gate scale)\n\n"
        "Deterministic 10x key-remapped replication of the sf0.1 tables "
        "(orders -> 1.5M rows, customer -> 150k, documents -> 50k; "
        "`bench_gates_sf1.py`), Spark query vs exact DuckDB oracle on the "
        "same parquet. Families: PIP rectangle + octagon (broadcast AND "
        "partitioned — the partitioned path running its DEFAULT auto "
        "banded refine), the dedup/LSH family, the geocode family.\n\n"
        f"**{n_pass} gate comparisons, all green** in {report['wall_sec']} s "
        f"wall (loadavg {la0[0]}→{la1[0]}).\n"
        "<!-- /GATES-SF1 -->\n"
    )
    if "<!-- GATES-SF1 -->" in text:
        text = re.sub(r"<!-- GATES-SF1 -->.*?<!-- /GATES-SF1 -->\n", block, text, flags=re.S)
    else:
        text += "\n" + block
    md.write_text(text)


if __name__ == "__main__":
    main()
