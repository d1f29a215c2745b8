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

from pyspark.sql import SparkSession


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
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The driver hands us its own SparkSession for ``entry()``/``queries()``;
    these are the conf keys that are safe to set post-start.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark
