"""SparkSession factory.

Defaults are chosen for correctness-stable local runs that still express
the plan shapes we want on a real cluster:

- AQE on (runtime coalescing / skew-join splitting at scale),
- Arrow on (vectorized pandas-UDF exchange for the Python-side operators),
- session timezone UTC (parity with the DuckDB oracle),
- shuffle partitions sized to the local core count; on a 1000-executor
  cluster the same code runs with AQE picking the effective parallelism.
"""

from __future__ import annotations

import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession

# ship_package state: zip built once per process, shipped once per
# SparkContext (keyed by applicationId — a stopped/restarted context
# gets a fresh ship).
_SHIP_LOCK = threading.Lock()
_SHIPPED_APPS: set[str] = set()
_PKG_ZIP: str | None = None


def _build_pkg_zip() -> str:
    """Zip the installed ``etl_extractor_spark`` package (sources only,
    no __pycache__) into the process temp dir, once per process."""
    global _PKG_ZIP
    if _PKG_ZIP is not None and os.path.exists(_PKG_ZIP):
        return _PKG_ZIP
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, tmp = tempfile.mkstemp(
        prefix="etl_extractor_spark_", suffix=".zip"
    )
    os.close(fd)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    _PKG_ZIP = tmp
    return tmp


def ship_package(spark: SparkSession) -> None:
    """Make ``etl_extractor_spark`` importable inside Python WORKERS
    (mapInPandas / applyInPandas / UDTF closures reference repo
    modules) regardless of the driver process cwd or the cluster
    deploy mode.

    In local mode the workers inherit the driver's environment only
    when the driver happens to run from the repo root with PYTHONPATH
    set; on a real cluster (non-local executors) closures referencing
    repo modules fail with worker-side ModuleNotFoundError unless the
    package is shipped. ``sc.addPyFile`` of a package zip is the
    canonical fix: the zip lands on every executor's Python path.
    Idempotent per SparkContext; ~one zip build per process."""
    sc = spark.sparkContext
    app = sc.applicationId
    with _SHIP_LOCK:
        if app in _SHIPPED_APPS:
            return
        sc.addPyFile(_build_pkg_zip())
        _SHIPPED_APPS.add(app)


def get_spark(
    app_name: str = "etl-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # keep wide plans (e.g. the 128-column MinHash signature agg)
        # inside whole-stage codegen; default cutoff is 100 fields
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # reclaim reliable-checkpoint files as their RDDs are GC'd —
        # without it checkpoint dirs grow for the process lifetime
        # (operators/checkpoints.py carries the vanilla-session story)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The driver hands us its own SparkSession for ``entry()``/``queries()``;
    these are the conf keys that are safe to set post-start.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    ship_package(spark)
    return spark
