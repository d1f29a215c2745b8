"""Data-cleaning / record-linkage queries.

- winsorize_prices : per-group percentile capping (outlier handling)
- fuzzy_name_pairs : blocked Levenshtein similarity join (record
                     linkage — the blocking key bounds the candidate
                     pairs exactly like LSH does for dedup)
- order_quartiles  : ntile quartile assignment per segment
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table


def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap l_extendedprice at the per-returnflag [p05, p95] band and
    report the effect — the standard robust-statistics cleaning step.
    Percentiles via one grouped agg, applied with a broadcast join
    (never a per-row window over the fact)."""
    l = load_table(spark, sf_dir, "lineitem")
    pct = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
    )
    capped = l.join(F.broadcast(pct), "l_returnflag").select(
        "l_returnflag",
        F.greatest(F.least(F.col("l_extendedprice"), F.col("p95")), F.col("p05")).alias(
            "capped"
        ),
        (
            (F.col("l_extendedprice") > F.col("p95"))
            | (F.col("l_extendedprice") < F.col("p05"))
        ).cast("long").alias("was_capped"),
    )
    return capped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("was_capped").alias("n_capped"),
        F.round(F.avg("capped"), 4).alias("avg_capped"),
    )


WINSORIZE_SQL = """
WITH pct AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS p05,
         quantile_cont(l_extendedprice, 0.95) AS p95
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       count(*) AS n,
       CAST(sum(CASE WHEN l_extendedprice > p95 OR l_extendedprice < p05
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
       round(avg(greatest(least(l_extendedprice, p95), p05)), 4) AS avg_capped
FROM lineitem l JOIN pct ON l.l_returnflag = pct.l_returnflag
GROUP BY 1
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: supplier names within Levenshtein distance 5 of
    a customer name, blocked on the numeric suffix length to bound the
    candidate space (a real pipeline blocks on phonetic/sorted-
    neighborhood keys the same way)."""
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"), "c_name"
    )
    # SALTED join on the block key: name length is single-valued on
    # these name shapes, so a plain shuffle join funnels the whole
    # cross product through ONE reducer (observed: sf1 sweep wedged on
    # a single task for >20 min). Salting spreads every hot block over
    # n_salt reducers; both sides SCALE with SF, so no broadcast
    # (guarded by test_no_forced_broadcast_on_sf_scaled_tables).
    from etl_extractor_spark.operators.common import fan_out
    from etl_extractor_spark.operators.skew import salted_join

    blocked = salted_join(
        fan_out(c).withColumn("len_c", F.length("c_name")),
        s.withColumn("len_s", F.length("s_name")),
        "len_c",
        "len_s",
        n_salt=32,
        salt_from="c_custkey",
    )
    return (
        blocked.withColumn("dist", F.levenshtein("s_name", "c_name"))
        .filter(F.col("dist") <= 5)
        .select("s_suppkey", "s_name", "c_custkey", "c_name", F.col("dist").cast("long").alias("dist"))
    )


FUZZY_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(levenshtein(s_name, c_name) AS BIGINT) AS dist
FROM supplier JOIN customer ON len(s_name) = len(c_name)
WHERE levenshtein(s_name, c_name) <= 5
"""


def order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile binning of order value within each segment."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            "o_totalprice",
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


QUARTILES_SQL = """
WITH q AS (
  SELECT c_mktsegment,
         CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
         o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, quartile, count(*) AS n,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi
FROM q GROUP BY 1, 2
"""


QUERIES = {
    "winsorize_prices": winsorize_prices,
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "order_quartiles": order_quartiles,
}

ORACLES = {
    "winsorize_prices": WINSORIZE_SQL,
    "fuzzy_name_pairs": FUZZY_SQL,
    "order_quartiles": QUARTILES_SQL,
}


def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: given a deterministic erasure
    request list (users with ``user_id % 7 == 3`` — stand-in for the
    legal request table), count how many rows each table would lose,
    cascading through the FK graph: events by user_id, orders by
    o_custkey (same key domain), lineitem through its order. This is
    the pre-delete dry-run every GDPR/CCPA pipeline runs before the
    actual MERGE DELETE (which `sinks/merge.py` implements).

    Plan shape (100 TB): the request list is tiny relative to the
    corpus — every probe is a small-side join the optimizer turns into
    a broadcast; the lineitem cascade joins on l_orderkey, the fact's
    natural key, so it rides existing partitioning. Facts are scanned
    once each; no wide shuffle anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    reqs = (
        ev.filter((F.col("user_id") % 7) == 3)
        .select(F.col("user_id").alias("uid"))
        .distinct()
    )
    ev_row = ev.join(reqs, ev.user_id == reqs.uid, "left").agg(
        F.lit("events").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.count("uid").alias("rows_erased"),
    )
    od_row = od.join(reqs, od.o_custkey == reqs.uid, "left").agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.count("uid").alias("rows_erased"),
    )
    erased_orders = od.join(reqs, od.o_custkey == reqs.uid, "semi").select(
        F.col("o_orderkey").alias("ok")
    )
    li_row = li.join(erased_orders, li.l_orderkey == erased_orders.ok, "left").agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.count("ok").alias("rows_erased"),
    )
    return (
        ev_row.unionByName(od_row)
        .unionByName(li_row)
        .withColumn("rows_kept", F.col("rows_total") - F.col("rows_erased"))
    )


ERASURE_AUDIT_SQL = """
WITH reqs AS (
  SELECT DISTINCT user_id AS uid FROM events WHERE user_id % 7 = 3
), eo AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT uid FROM reqs)
)
SELECT 'events' AS table_name,
       count(*) AS rows_total,
       count(CASE WHEN user_id IN (SELECT uid FROM reqs) THEN 1 END) AS rows_erased,
       count(*) - count(CASE WHEN user_id IN (SELECT uid FROM reqs) THEN 1 END) AS rows_kept
FROM events
UNION ALL
SELECT 'orders', count(*),
       count(CASE WHEN o_custkey IN (SELECT uid FROM reqs) THEN 1 END),
       count(*) - count(CASE WHEN o_custkey IN (SELECT uid FROM reqs) THEN 1 END)
FROM orders
UNION ALL
SELECT 'lineitem', count(*),
       count(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM eo) THEN 1 END),
       count(*) - count(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM eo) THEN 1 END)
FROM lineitem
"""

QUERIES["user_erasure_audit"] = user_erasure_audit
ORACLES["user_erasure_audit"] = ERASURE_AUDIT_SQL


def woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence categorical encoding (credit-scoring /
    feature-engineering standard): per category of
    (c_mktsegment, o_orderpriority), WOE = ln(P(cat|good)/P(cat|bad))
    with good = fulfilled orders (o_orderstatus = 'F'). The encoding
    table is what a model-training pipeline joins back onto the fact —
    producing it is one grouped count + one broadcast-scalar totals
    join; all inputs to the ln are exact integer counts, the ln itself
    is a single rounded double per category."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", (F.col("o_orderstatus") == "F").alias("good")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o.o_custkey == c.c_custkey)
    cat = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.sum(F.col("good").cast("long")).alias("n_good"),
        F.sum((~F.col("good")).cast("long")).alias("n_bad"),
    )
    tot = j.agg(
        F.sum(F.col("good").cast("long")).alias("t_good"),
        F.sum((~F.col("good")).cast("long")).alias("t_bad"),
    )
    return cat.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "o_orderpriority",
        "n_good",
        "n_bad",
        # products in DOUBLE before the ratio: n*total long products
        # overflow past ~3e9x3e9 rows (ANSI runtime error); the double
        # form matches the oracle's n_good * 1.0 * t_bad arithmetic.
        F.round(
            F.log(
                (F.col("n_good").cast("double") * F.col("t_bad").cast("double"))
                / (F.col("n_bad").cast("double") * F.col("t_good").cast("double"))
            ),
            4,
        ).alias("woe"),
    )


WOE_SQL = """
WITH j AS (
  SELECT c_mktsegment, o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS good
  FROM orders JOIN customer ON o_custkey = c_custkey
), cat AS (
  SELECT c_mktsegment, o_orderpriority,
         CAST(sum(good) AS BIGINT) AS n_good,
         CAST(sum(1 - good) AS BIGINT) AS n_bad
  FROM j GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(good) AS BIGINT) AS t_good,
         CAST(sum(1 - good) AS BIGINT) AS t_bad
  FROM j
)
SELECT c_mktsegment, o_orderpriority, n_good, n_bad,
       round(ln((n_good * 1.0 * t_bad) / (n_bad * 1.0 * t_good)), 4) AS woe
FROM cat, tot
"""

QUERIES["woe_encoding"] = woe_encoding
ORACLES["woe_encoding"] = WOE_SQL


K_ANON = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (market segment, nation, order year): how many QI equivalence
    classes fall below k=5 members — the re-identification risk
    report a privacy review runs before releasing an 'anonymized'
    extract (Sweeney 2002). One grouped count + one summary fold;
    at 100 TB the QI group-by is the only shuffle and its cardinality
    is the product of QI domains, not row count."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year(F.to_date("o_orderdate")).alias("yr")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    qi = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name", "yr")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("sz") < K_ANON).cast("long")).alias("risky_groups"),
        F.sum(F.when(F.col("sz") < K_ANON, F.col("sz")).otherwise(0)).alias(
            "risky_rows"
        ),
        F.min("sz").alias("min_group"),
        F.max("sz").alias("max_group"),
    )


K_ANONYMITY_SQL = f"""
WITH qi AS (
  SELECT c_mktsegment, n_name, year(CAST(o_orderdate AS DATE)) AS yr,
         count(*) AS sz
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3
)
SELECT count(*) AS n_groups,
       CAST(sum(CASE WHEN sz < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
       CAST(sum(CASE WHEN sz < {K_ANON} THEN sz ELSE 0 END) AS BIGINT) AS risky_rows,
       CAST(min(sz) AS BIGINT) AS min_group,
       CAST(max(sz) AS BIGINT) AS max_group
FROM qi
"""

QUERIES["k_anonymity_audit"] = k_anonymity_audit
ORACLES["k_anonymity_audit"] = K_ANONYMITY_SQL


L_DIV = 3  # minimum distinct sensitive values per QI class


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE'06 — the
    successor check to k-anonymity): a QI equivalence class can be
    k-anonymous yet still leak if everyone in it shares the same
    SENSITIVE value. Over the same QI tuple as ``k_anonymity_audit``
    (market segment, nation, order year) with o_orderpriority as the
    sensitive attribute: per-class distinct-sensitive count l, report
    classes with l < L_DIV and the global l distribution. Same scale
    shape as the k audit — one QI group-by (cardinality = product of
    QI domains) + one summary fold."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.to_date("o_orderdate")).alias("yr"),
        "o_orderpriority",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    qi = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name", "yr")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("o_orderpriority").alias("l"),
        )
    )
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("l") < L_DIV).cast("long")).alias("low_diversity_groups"),
        F.sum(
            F.when(F.col("l") < L_DIV, F.col("sz")).otherwise(0)
        ).cast("long").alias("exposed_rows"),
        F.min("l").cast("long").alias("min_l"),
        F.max("l").cast("long").alias("max_l"),
    )


L_DIVERSITY_SQL = f"""
WITH qi AS (
  SELECT c_mktsegment, n_name, year(CAST(o_orderdate AS DATE)) AS yr,
         count(*) AS sz,
         count(DISTINCT o_orderpriority) AS l
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN l < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT) AS low_diversity_groups,
       CAST(sum(CASE WHEN l < {L_DIV} THEN sz ELSE 0 END) AS BIGINT) AS exposed_rows,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(max(l) AS BIGINT) AS max_l
FROM qi
"""

QUERIES["l_diversity_audit"] = l_diversity_audit
ORACLES["l_diversity_audit"] = L_DIVERSITY_SQL
