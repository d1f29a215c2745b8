"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition a (possibly single-partition) input to
    the session's core count before compute-heavy or row-multiplying
    work (shingle explosion, signature hashing, pairwise scoring).

    Small parquet inputs arrive as ONE partition (one file, one row
    group), which would serialize everything downstream on a single
    core. One cheap narrow-input shuffle buys full parallelism for the
    expensive stage — the same reasoning holds on a 1000-executor
    cluster when a stage's input is few-partitioned but its compute is
    super-linear in rows.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
