"""Statistical aggregation queries + the SQL-text query surface.

- revenue_percentiles: exact interpolated percentiles (Spark
  ``percentile`` ≡ DuckDB ``quantile_cont``)
- lineitem_stats: stddev/correlation/covariance aggregates
- sql_star_revenue: the SAME SQL text executed by spark.sql() and by
  the DuckDB oracle — demonstrating the engine's SQL-surface parity
  (views registered from the parquet zone, Catalyst plans the text)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table, register_views


def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    pct = F.percentile("o_totalprice", F.lit([0.25, 0.5, 0.9]))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.round(pct[0], 4).alias("p25"),
            F.round(pct[1], 4).alias("p50"),
            F.round(pct[2], 4).alias("p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_PCT_SQL = """
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


LINEITEM_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS std_price,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


# one SQL text, two engines — the dialect-neutral star query
_SQL_STAR = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def sql_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_STAR)


QUERIES = {
    "revenue_percentiles": revenue_percentiles,
    "lineitem_stats": lineitem_stats,
    "sql_star_revenue": sql_star_revenue,
}

ORACLES = {
    "revenue_percentiles": REVENUE_PCT_SQL,
    "lineitem_stats": LINEITEM_STATS_SQL,
    "sql_star_revenue": _SQL_STAR,
}
