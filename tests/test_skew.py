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
