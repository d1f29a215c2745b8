"""Parquet table layer — the engine's staging/gold storage format.

The reference staged everything in a SQLite file (SURVEY §1.1,
reference load/load_to_staging.py:4-5); our staging zone is parquet:
columnar, splittable, predicate-pushdown-capable, the only sane choice
at 100 TB. Tables are referenced by directory + name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_extractor_spark import TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; normalize nanosecond parquet timestamps.

    Spark has no nanosecond timestamp type (SPARK-40819) — TIMESTAMP
    (NANOS) columns are read as raw long nanos via the
    ``nanosAsLong`` conf, then converted here to microsecond
    timestamps with floor division, matching how DuckDB (the oracle)
    truncates ns → µs on read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP_NTZ (wall clock), not TIMESTAMP (instant): parquet
        # ns timestamps are not-adjusted-to-UTC, and Spark reads the
        # other tables' ms timestamps as NTZ too — this keeps every
        # date derivation session-timezone-independent.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, CAST(ts / 1000 AS BIGINT),"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view so spark.sql() plans over them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
