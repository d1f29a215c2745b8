"""Salted skew operators produce results identical to the plain plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_extractor_spark.operators.skew import salted_join, salted_sum_count
from etl_extractor_spark.sources.parquet import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"), "value", "event_id"
    )
    salted = salted_sum_count(e, ["user_id"], "value", salt_from="event_id")
    plain = e.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    got = {r["user_id"]: (r["sum_value"], r["n_rows"]) for r in salted.collect()}
    want = {r["user_id"]: (r["sum_value"], r["n_rows"]) for r in plain.collect()}
    assert got == want


def test_salted_join_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"), "c_name"
    )
    ee = e.select(F.col("user_id").cast("long").alias("user_id"), "event_id")
    salted = salted_join(ee, c, "user_id", "c_custkey", n_salt=8, salt_from="event_id")
    plain = ee.join(c, ee.user_id == c.c_custkey)
    assert salted.count() == plain.count()
    got = sorted((r["event_id"], r["c_name"]) for r in salted.collect())
    want = sorted((r["event_id"], r["c_name"]) for r in plain.collect())
    assert got == want


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling: a hot key that hashes 90% of
    rows into one shuffle partition gets split into parallel sub-joins
    (SortMergeJoin(skew=true) in the final adaptive plan). This is the
    zero-code-change complement to the explicit salting operators —
    thresholds here are scaled down to express the same decision AQE
    takes at 100 TB with its defaults."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        left = (
            spark.range(0, 100_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100),
            )
            .withColumn("pay", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(0, 100).withColumnRenamed("id", "k").withColumn(
            "name", F.concat(F.lit("n"), F.col("k").cast("string"))
        )
        j = left.join(right, "k").select("k", "pay", "name")
        assert len(j.collect()) == 100_000  # drives THIS dataset's execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
