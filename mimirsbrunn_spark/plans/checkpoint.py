"""Checkpoint / lineage / metrics layer (north rule: resume-from-failure).

The reference's index lifecycle (create timestamped container → bulk →
publish-by-alias-swap, /root/reference/libs/mimir/src/domain/ports/
primary/generate_index.rs:69-85, storage.rs:129-205) gives it atomic
publish but no mid-run resume: a crashed *2mimir run restarts from zero.
Our engine checkpoints every stage:

- each stage writes its output parquet to ``{root}/{stage}/data`` and,
  on success, a ``manifest.json`` carrying the *input fingerprint*
  (hash of input paths/sizes/mtimes + a stage-version salt), row count, wall
  time, and per-partition (per-output-file) row counts — the lineage
  record;
- a rerun recomputes the fingerprint; on match it returns the
  checkpointed output without recomputation (resume past completed
  stages), on mismatch it recomputes and atomically replaces.

Atomicity: write to ``data.tmp-{nonce}`` then rename over ``data`` —
the parquet-directory analog of the reference's alias swap. (With an
Iceberg catalog on the classpath the same interface maps to snapshot
commits; the jar is absent in this image, so the directory protocol is
the default backend.)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _input_fingerprint(spark: SparkSession, inputs: list[str], salt: str = "") -> str:
    """Deterministic hash of input file listings (path, size, mtime_ns)
    + salt. Cheap (driver-side listing, no data read); mtime makes a
    same-size rewrite invalidate the checkpoint — (path, size) alone
    would silently resume over changed data. The hashing scheme is
    shared with the codebook cache key (``fingerprint.stat_fingerprint``)."""
    from ..fingerprint import stat_fingerprint

    files = []
    for path in sorted(inputs):
        p = Path(path)
        if p.is_dir():
            for f in sorted(p.rglob("*")):
                if f.is_file() and not f.name.startswith(("_", ".")):
                    files.append((str(f.relative_to(p)), f.stat()))
        elif p.is_file():
            files.append((p.name, p.stat()))
    return stat_fingerprint(files, salt=salt)


class LineageLog:
    """Append-only lineage/metrics records, one JSON line per stage run."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.path = self.root / "_lineage.jsonl"

    def append(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def records(self) -> list[dict]:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines() if line]


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    inputs: list[str],
    build: "callable[[], DataFrame]",
    version: str = "v1",
    repartition: int | None = None,
) -> DataFrame:
    """Idempotent, resumable stage execution.

    Returns the stage output DataFrame, recomputing only when the input
    fingerprint changed (or no checkpoint exists)."""
    stage_dir = Path(root) / stage
    data_dir = stage_dir / "data"
    manifest_path = stage_dir / "manifest.json"
    log = LineageLog(root)
    fp = _input_fingerprint(spark, inputs, salt=f"{stage}:{version}")

    # reap tmp dirs orphaned by a crash between write and rename — at
    # corpus scale a failed run's tmp is a full-size copy of the stage
    # output, and nothing else ever deletes it (single-driver protocol,
    # so anything tmp-named here is dead by construction); before the
    # resume check so a permanently-resuming stage can't shelter one
    if stage_dir.exists():
        for stale in stage_dir.glob("data.tmp-*"):
            shutil.rmtree(stale, ignore_errors=True)

    if manifest_path.exists():
        try:
            manifest = json.loads(manifest_path.read_text())
        except json.JSONDecodeError:
            manifest = {}
        if manifest.get("fingerprint") == fp and data_dir.exists():
            log.append(
                {"stage": stage, "event": "resume_hit", "fingerprint": fp, "ts": time.time()}
            )
            return spark.read.parquet(str(data_dir))

    t0 = time.perf_counter()
    df = build()
    if repartition:
        df = df.repartition(repartition)
    tmp = stage_dir / f"data.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(str(tmp))
    wall = time.perf_counter() - t0

    out = spark.read.parquet(str(tmp))
    per_file = [
        {"file": os.path.basename(r["f"]), "rows": r["n"]}
        for r in out.groupBy(F.input_file_name().alias("f")).agg(F.count("*").alias("n")).collect()
    ]
    n_rows = sum(p["rows"] for p in per_file)

    # drop the OLD manifest before touching data: a crash after the data
    # swap but before the new manifest write must leave NO manifest (rerun
    # recomputes) — leaving the stale one could false-resume over the new
    # data if the inputs are later reverted to the old fingerprint
    if manifest_path.exists():
        manifest_path.unlink()
    if data_dir.exists():
        shutil.rmtree(data_dir)
    os.rename(tmp, data_dir)
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "rows": n_rows,
        "wall_sec": round(wall, 3),
        "partitions": per_file,
        "inputs": sorted(inputs),
        "version": version,
        "ts": time.time(),
    }
    manifest_path.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    log.append({**manifest, "event": "computed", "partitions": len(per_file)})
    return spark.read.parquet(str(data_dir))
