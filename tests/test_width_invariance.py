"""Cluster-width determinism regression test.

The north rule pins "matching join output rows and tile assignments"
across cluster sizes (N and 4N executors). BENCH/BASELINE.md records the
2.4M-doc evidence run (8 vs 32 cores, hash-identical published tables);
this test pins the property permanently at CI scale so a future change
that lets parallelism leak into results (a nondeterministic tie-break, a
partition-order-dependent aggregate, a random salt) fails the suite
instead of only the next manual evidence run.

The full production job (`jobs/index_corpus.py`: PII span rewrite →
Gopher doc filter → span extraction → H3 7-12 + S2 tiling → PIP admin
attach → Z-order cluster-on-write publish) runs in two SEPARATE driver
processes at local[2] and local[8] over the same fixture corpus, then
both published generations are compared with an order-insensitive
whole-row hash. Subprocesses are required for a real width change: an
in-process ``job.main()`` would reuse the test session regardless of
``--cpus`` (``SparkSession.builder.getOrCreate``).

Reference relationship: the reference's indexing output is asserted
stable by its integration fixtures on a single node
(tests/bragi_filters.rs); width-stability is the property that statement
has to become on a multi-executor Spark cluster.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_job_at_width(docs: str, admins: str, out: str, cpus: int) -> dict:
    env = dict(os.environ)
    # the job derives master from --cpus unless SPARK_GRAFT_MASTER leaks
    # in from the harness — strip it so the width under test is real
    env.pop("SPARK_GRAFT_MASTER", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    res = subprocess.run(
        [
            sys.executable, str(REPO / "jobs" / "index_corpus.py"),
            "--docs", docs, "--admins", admins, "--out", out,
            "--cpus", str(cpus),
            "--text-prep", "pii",
            "--quality-filter", "gopher",
            "--gopher-min-words", "3", "--gopher-min-stop", "0",
            "--output-layout", "zorder", "--output-files", "4",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert res.returncode == 0, f"job at local[{cpus}] failed:\n{res.stderr[-3000:]}"
    return json.loads((Path(out) / "run_report.json").read_text())


def _published_hash(base: str, table: str) -> tuple[list[str], int, int]:
    """(sorted columns, row count, order-insensitive whole-row hash) of
    the _CURRENT generation, via DuckDB (independent of Spark)."""
    import duckdb

    gen = json.loads((Path(base) / table / "_CURRENT").read_text())["generation"]
    glob = f"{base}/{table}/{gen}/*.parquet"
    con = duckdb.connect()
    cols = sorted(
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{glob}')"
        ).fetchall()
    )
    n, h = con.execute(
        f"SELECT count(*), sum(hash(t::VARCHAR)::hugeint) FROM "
        f"(SELECT {', '.join(cols)} FROM read_parquet('{glob}')) t"
    ).fetchone()
    return cols, n, int(h)


def test_job_output_invariant_across_widths(fixtures_dir, tmp_path):
    docs = f"{fixtures_dir}/docs.parquet"
    admins = f"{fixtures_dir}/admins.parquet"
    out_n = str(tmp_path / "w2")
    out_4n = str(tmp_path / "w8")

    rep_n = _run_job_at_width(docs, admins, out_n, cpus=2)
    rep_4n = _run_job_at_width(docs, admins, out_4n, cpus=8)

    # the run reports agree on every deterministic field (skew is sampled)
    for key in ("points", "coverage_admins", "structure_violations",
                "docs_text_rewritten", "docs_dropped_by_quality"):
        assert rep_n[key] == rep_4n[key], key
    assert rep_n["points"] > 0  # the corpus survived the filter

    # published tables are hash-identical order-insensitively
    for table in ("points_indexed", "coverage"):
        cols_n, n_n, h_n = _published_hash(out_n, table)
        cols_4n, n_4n, h_4n = _published_hash(out_4n, table)
        assert cols_n == cols_4n, table
        assert n_n == n_4n, table
        assert h_n == h_4n, f"{table}: width-dependent output"
    # the Z-order key column made it into the published schema
    cols_n, _, _ = _published_hash(out_n, "points_indexed")
    assert "z_12" in cols_n
