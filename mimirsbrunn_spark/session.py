"""SparkSession factory tuned for the local[N] sandbox.

Designed so the same code runs unchanged on a multi-executor cluster:
nothing here assumes local mode except the master URL default, which is
overridable via SPARK_GRAFT_CPUS / an explicit ``master=`` argument
(a real deployment passes ``--master yarn``/k8s through spark-submit and
this builder only applies the SQL confs).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mimirsbrunn_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-oriented defaults.

    - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
      — our urban-core H3 skew defense at cluster scale.
    - Arrow on for pandas UDF transport (no per-row Python anywhere).
    - shuffle.partitions ~ cores locally; on a real cluster AQE coalesces
      from a higher initial number.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # NOTE: keep the local heap moderate — empirically a 48g heap makes
        # local[32] *slower* than local[8] on this box (GC/alloc overhead on
        # allocation-heavy explode workloads); 12g is ample for our
        # broadcasts and leaves RAM to the OS page cache.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        # managed (bucketed) tables live outside the repo by default
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the spark-submit --py-files pattern).

    Zips mimirsbrunn_spark and addPyFile's it so Python workers can unpickle
    our UDF closures regardless of the driver's cwd / a cluster's nodes."""
    pkg_dir = Path(__file__).resolve().parent
    marker = "_mimirsbrunn_pyfiles_shipped"
    if getattr(spark.sparkContext, marker, False):
        return
    # write to a unique temp file, then atomically rename: two drivers on
    # one host (parallel pytest workers, concurrent spark-submit jobs)
    # sharing a fixed path would race — one copies a half-written zip and
    # every UDF task dies with ImportError on a corrupt archive
    zpath = Path(tempfile.gettempdir()) / "mimirsbrunn_spark_pyfiles.zip"
    fd, tmp = tempfile.mkstemp(suffix=".zip", dir=str(zpath.parent))
    os.close(fd)
    try:
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
        os.replace(tmp, zpath)
    except BaseException:
        Path(tmp).unlink(missing_ok=True)
        raise
    spark.sparkContext.addPyFile(str(zpath))
    setattr(spark.sparkContext, marker, True)


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
