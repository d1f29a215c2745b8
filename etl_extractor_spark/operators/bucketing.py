"""Bucketed (co-located) joins — the K4 index analog for big⋈big joins.

At 100 TB the expensive join is fact⋈fact (or fact⋈large-dim) where
neither side broadcasts. Writing both sides bucketed on the join key
(same bucket count) lets Spark's sort-merge join read matching buckets
directly — NO Exchange on either side, the single biggest shuffle
saving available for repeated joins on stable keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: tuple[str, str]
) -> DataFrame:
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[key[0]] == r[key[1]])


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (test/
    introspection helper — a co-located join must show zero)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
