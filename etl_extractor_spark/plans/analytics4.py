"""Analytics wave 4 — query shapes rounding out the general engine.

Beyond-reference extensions (the reference at /root/reference has no
analytics layer beyond the single star-join in test.py:13-44; its DW
exists to serve exactly these workloads, README.md:21-35): keep-latest
compaction reads, percent-of-total windows, time-range (RANGE interval)
frames, nucleus-style vocabulary coverage, co-occurrence self-joins,
exact heavy hitters, equi-width histograms, and robust (MAD) outlier
detection. All compared output is integer-exact (cents / fixed-point)
so the DuckDB oracle hash-matches bit-for-bit.

Scale notes are per-query; the common theme: one hash shuffle per
logical regrouping, windows partitioned by the same key as the shuffle
that precedes them, and scalar thresholds broadcast — never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.functions import textstats as ts
from etl_extractor_spark.sources.parquet import load_table

def _cents():
    return F.round(F.col("o_totalprice") * 100, 0).cast("long")

# ---------------------------------------------------------------------------
# 1. Keep-latest-per-key (CDC / compaction read shape)
# ---------------------------------------------------------------------------


def orders_latest_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order row per customer — the canonical keep-latest dedup
    that a CDC mirror or compacted upsert table serves on read.

    One shuffle on ``o_custkey``; the row_number window rides the same
    partitioning. At 100 TB this is the read path of `merge_cdc_apply`
    (sinks/merge.py) expressed as a query: no global sort, per-key state
    is one row.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("last_order_date"),
            "o_orderstatus",
            _cents().alias("price_cents"),
        )
    )


LATEST_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date,
       o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# 2. Percent-of-total window (partition-frame aggregate)
# ---------------------------------------------------------------------------


def nation_revenue_share_bps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue, in integer basis
    points — the ratio_to_report shape.

    Revenue is summed as per-line cents (BIGINT, exact). The nation agg
    shuffles on the join key chain; the region-total window is a
    partition-only frame over the tiny nation-level aggregate, so the
    window state is O(nations), not O(lineitem).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    line_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per_nation = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(line_cents).alias("nation_cents"))
    )
    return per_nation.withColumn(
        "share_bps",
        F.expr("nation_cents * 10000 div sum(nation_cents) over (partition by r_name)"),
    ).select("r_name", "n_name", "nation_cents", "share_bps")


NATION_SHARE_SQL = """
WITH per_nation AS (
  SELECT r_name, n_name,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS nation_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, CAST(nation_cents AS BIGINT) AS nation_cents,
       CAST(nation_cents * 10000 // sum(nation_cents) OVER (PARTITION BY r_name) AS BIGINT) AS share_bps
FROM per_nation
"""

# ---------------------------------------------------------------------------
# 3. Time-range window frame (RANGE BETWEEN INTERVAL)
# ---------------------------------------------------------------------------


def customer_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: that customer's total spend in the trailing 30 days
    (inclusive) — a RANGE frame over event time, not a ROWS frame, so
    peers at the same timestamp aggregate together and gaps in the
    series are handled by value, not by row offset.

    Spark expresses the interval frame as ``rangeBetween`` over epoch
    seconds; one shuffle on ``o_custkey``, per-key state bounded by the
    30-day horizon (the frame slides, it never rebuilds).
    """
    o = load_table(spark, sf_dir, "orders")
    from etl_extractor_spark.functions.dates import ntz_epoch_seconds

    # wall-clock epoch seconds: unix_timestamp() is session-zone-
    # dependent, and a 30-day range frame spanning a DST transition
    # would mis-include/exclude boundary rows under a DST zone
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(ntz_epoch_seconds("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate", _cents().alias("price_cents"))
        .withColumn("trailing_30d_cents", F.sum("price_cents").over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "price_cents",
            "trailing_30d_cents",
        )
    )


TRAILING_30D_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_30d_cents
FROM orders
"""

# ---------------------------------------------------------------------------
# 4. Nucleus-style vocabulary coverage (cumulative-mass cutoff)
# ---------------------------------------------------------------------------


def token_coverage_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: how many distinct tokens (taken most-frequent
    first) cover ≥90% of the token mass — the top-p/nucleus cutoff used
    to size vocabularies and spot low-diversity corpora.

    One token-count aggregate, then windows partitioned by ``lang`` over
    the (small) per-language vocabulary — the heavy explode/count never
    passes through a window. Cutoff test is integer (cum*10 ≥ total*9).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.col("lang"), F.explode(ts.tokens("text")).alias("token")).filter(
        F.length("token") > 0
    )
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w_ord = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    w_all = Window.partitionBy("lang")
    ranked = counts.select(
        "lang",
        "cnt",
        F.row_number().over(w_ord).alias("rnk"),
        F.sum("cnt").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.min(F.when(F.col("cum") * 10 >= F.col("total") * 9, F.col("rnk"))).alias(
            "tokens_p90"
        ),
    )


TOKEN_COVERAGE_SQL = r"""
WITH toks AS (
  SELECT lang,
         unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), counts AS (
  SELECT lang, token, count(*) AS cnt FROM toks WHERE len(token) > 0
  GROUP BY lang, token
), ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rnk,
         sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS total
  FROM counts
)
SELECT lang, count(*) AS vocab,
       min(CASE WHEN cum * 10 >= total * 9 THEN rnk END) AS tokens_p90
FROM ranked GROUP BY lang
"""

# ---------------------------------------------------------------------------
# 5. Co-occurrence self-join (market-basket shape)
# ---------------------------------------------------------------------------


def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often two event types co-occur for the same user on the same
    day — the market-basket / co-view shape.

    Distinct (user, day, type) first, THEN the self-join: the join
    explodes pairs per basket, so shrinking baskets to distinct items
    before joining bounds the blowup at |types|² per user-day. Both
    sides shuffle on the same (user_id, day) key.
    """
    e = load_table(spark, sf_dir, "events")
    basket = e.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_days"))
    )


COOCCURRENCE_SQL = """
WITH basket AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS pair_days
FROM basket a
JOIN basket b ON a.user_id = b.user_id AND a.day = b.day
            AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""

# ---------------------------------------------------------------------------
# 6. Exact heavy hitters (scalar threshold, broadcast)
# ---------------------------------------------------------------------------


def heavy_hitter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts appearing in more than 0.1% of all lineitems — exact heavy
    hitters with the threshold derived from the data itself.

    The total is a one-row aggregate cross-joined (broadcast) into the
    per-part counts — no ``collect()`` round-trip, the whole plan stays
    on the cluster and the threshold never hits the driver.
    """
    l = load_table(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 1000 > F.col("total"))
        .select("l_partkey", "cnt")
    )


HEAVY_HITTERS_SQL = """
WITH counts AS (
  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
), t AS (SELECT sum(cnt) AS total FROM counts)
SELECT l_partkey, cnt FROM counts, t WHERE cnt * 1000 > total
"""

# ---------------------------------------------------------------------------
# 7. Equi-width histogram (integer-exact binning)
# ---------------------------------------------------------------------------


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bucket equi-width histogram of order value over [0, 600k),
    binned on integer cents so bucket edges are exact (no float-boundary
    flips between engines).

    A single partial+final hash agg: 60 groups regardless of table
    size — the canonical profile/sketch scan at 100 TB.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.expr("cast(round(o_totalprice * 100, 0) as bigint) div 1000000"), F.lit(59)) + 1
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(_cents()).alias("min_cents"),
            F.max(_cents()).alias("max_cents"),
        )
    )


PRICE_HISTOGRAM_SQL = """
SELECT least(CAST(round(o_totalprice * 100) AS BIGINT) // 1000000, 59) + 1 AS bucket,
       count(*) AS n_orders,
       min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
       max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
FROM orders
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# 8. Robust outliers via MAD (median absolute deviation)
# ---------------------------------------------------------------------------


def mad_outliers_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: count orders whose price deviates from the
    group median by more than 3× the median absolute deviation — the
    robust z-score filter that survives the heavy tails a mean/stddev
    gate does not.

    Two exact-percentile aggregates over the same ``o_orderpriority``
    partitioning (medians of integers are k or k.5 — doubled to stay in
    BIGINT, so the 3×MAD comparison is integer-exact). Group count is
    tiny; each pass is one shuffle of pre-aggregated state.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents().alias("cents")
    )
    med = o.groupBy("o_orderpriority").agg(
        (2 * F.percentile("cents", F.lit(0.5))).cast("long").alias("median_cents_x2")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "dev_x2", F.abs(2 * F.col("cents") - F.col("median_cents_x2"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        (2 * F.percentile("dev_x2", F.lit(0.5))).cast("long").alias("mad_cents_x4")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("median_cents_x2").alias("median_cents_x2"),
            F.max("mad_cents_x4").alias("mad_cents_x4"),
            F.sum(
                F.when(2 * F.col("dev_x2") > 3 * F.col("mad_cents_x4"), 1).otherwise(0)
            ).alias("outliers"),
        )
    )


MAD_OUTLIERS_SQL = """
WITH o AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), med AS (
  SELECT o_orderpriority,
         CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS median_cents_x2
  FROM o GROUP BY o_orderpriority
), dev AS (
  SELECT o.o_orderpriority, cents, median_cents_x2,
         abs(2 * cents - median_cents_x2) AS dev_x2
  FROM o JOIN med USING (o_orderpriority)
), mad AS (
  SELECT o_orderpriority,
         CAST(2 * quantile_cont(dev_x2, 0.5) AS BIGINT) AS mad_cents_x4
  FROM dev GROUP BY o_orderpriority
)
SELECT o_orderpriority, count(*) AS n_orders,
       max(median_cents_x2) AS median_cents_x2,
       max(mad_cents_x4) AS mad_cents_x4,
       CAST(sum(CASE WHEN 2 * dev_x2 > 3 * mad_cents_x4 THEN 1 ELSE 0 END) AS BIGINT) AS outliers
FROM dev JOIN mad USING (o_orderpriority)
GROUP BY o_orderpriority
"""


QUERIES = {
    "orders_latest_per_customer": orders_latest_per_customer,
    "nation_revenue_share_bps": nation_revenue_share_bps,
    "customer_trailing_30d_spend": customer_trailing_30d_spend,
    "token_coverage_p90": token_coverage_p90,
    "event_type_cooccurrence": event_type_cooccurrence,
    "heavy_hitter_parts": heavy_hitter_parts,
    "price_histogram": price_histogram,
    "mad_outliers_by_priority": mad_outliers_by_priority,
}

ORACLES = {
    "orders_latest_per_customer": LATEST_PER_CUSTOMER_SQL,
    "nation_revenue_share_bps": NATION_SHARE_SQL,
    "customer_trailing_30d_spend": TRAILING_30D_SQL,
    "token_coverage_p90": TOKEN_COVERAGE_SQL,
    "event_type_cooccurrence": COOCCURRENCE_SQL,
    "heavy_hitter_parts": HEAVY_HITTERS_SQL,
    "price_histogram": PRICE_HISTOGRAM_SQL,
    "mad_outliers_by_priority": MAD_OUTLIERS_SQL,
}


def customer_year_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the join type the rest of the query
    library doesn't exercise (semi/anti/left/inner are covered): order
    counts per customer for 1995 vs 1996, outer-joined so
    one-sided customers survive with nulls, classified with the
    coalesce pattern every reconciliation report uses. Both inputs
    aggregate before the join, so the shuffle carries one row per
    (customer, year) — never raw orders."""
    o = load_table(spark, sf_dir, "orders")

    def year_counts(year: int, alias: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = year_counts(1995, "n_1995")
    b = year_counts(1996, "n_1996")
    return (
        a.join(b, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
            F.when((F.col("n_1995").isNotNull()) & (F.col("n_1996").isNotNull()), "both")
            .when(F.col("n_1995").isNotNull(), "only_1995")
            .otherwise("only_1996")
            .alias("status"),
        )
    )


CUSTOMER_YEAR_RECON_SQL = """
WITH a AS (
  SELECT o_custkey, count(*) AS n_1995 FROM orders
  WHERE year(o_orderdate) = 1995 GROUP BY o_custkey
), b AS (
  SELECT o_custkey, count(*) AS n_1996 FROM orders
  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
)
SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
       coalesce(n_1995, 0) AS n_1995,
       coalesce(n_1996, 0) AS n_1996,
       CASE WHEN n_1995 IS NOT NULL AND n_1996 IS NOT NULL THEN 'both'
            WHEN n_1995 IS NOT NULL THEN 'only_1995'
            ELSE 'only_1996' END AS status
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""

QUERIES.update({"customer_year_reconciliation": customer_year_reconciliation})
ORACLES.update({"customer_year_reconciliation": CUSTOMER_YEAR_RECON_SQL})


def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated top-N per row via ``DataFrame.lateralJoin`` (Spark 4):
    for each AUTOMOBILE-segment customer, their 2 largest orders.
    Catalyst DECORRELATES the per-row subquery into a ranked join —
    there is no per-customer loop at execution time, so the shape
    scales like any partitioned-window top-k. Oracle = DuckDB's native
    LATERAL. Deterministic tie-break (totalprice desc, orderkey asc)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    o = load_table(spark, sf_dir, "orders")
    sub = (
        o.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )
    return c.lateralJoin(sub).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


LATERAL_TOP_ORDERS_SQL = """
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(t.o_orderkey AS BIGINT) AS o_orderkey,
       round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 2) t
WHERE c.c_mktsegment = 'AUTOMOBILE'
"""

QUERIES.update({"lateral_top_orders": lateral_top_orders})
ORACLES.update({"lateral_top_orders": LATERAL_TOP_ORDERS_SQL})


def topk_orders_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-group top-k via the two-phase salted plan
    (operators/skew.py::salted_topk): 5 order priorities × ~300k rows
    each at sf1 is exactly the few-groups/many-rows shape where a
    single per-group window funnels everything through 5 reducers.
    Phase 1 ranks within (priority, salt-of-orderkey) 64-way parallel
    and keeps 3 rows per bucket; phase 2 re-ranks 5×64×3 rows. The
    oracle is the naive single-window formulation — equality proves
    the decomposition is lossless."""
    from etl_extractor_spark.operators.skew import salted_topk

    o = load_table(spark, sf_dir, "orders")
    return salted_topk(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        "o_totalprice",
        "o_orderkey",
        k=3,
    ).select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "rk",
    )


TOPK_SALTED_SQL = """
SELECT o_orderpriority,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey DESC) AS BIGINT) AS rk
FROM orders
QUALIFY rk <= 3
"""

QUERIES.update({"topk_orders_salted": topk_orders_salted})
ORACLES.update({"topk_orders_salted": TOPK_SALTED_SQL})


ZS_WIN = 20   # trailing events in the reference window
ZS_MIN = 10   # minimum window size to score


def rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming-style anomaly flagging: an event is an
    outlier when it deviates > 3σ from the user's OWN trailing-20-event
    history (window ends at the PREVIOUS event — the score never sees
    the value it judges). The z-test is evaluated ENTIRELY in integer
    arithmetic on cents: (n·x − Σ)² > 9·(n·Σx² − Σ²) is algebraically
    (x − μ)² > (3σ)² with every term exact — no sqrt, no division, no
    float boundary for engines to disagree on. Magnitudes: cents ≤
    ~5·10⁴, n ≤ 20 ⇒ every term ≤ ~10¹⁴, far inside BIGINT.

    Scale shape: one hash-exchange on user_id, one sort per partition —
    the same plan as any per-user window; the flag is map-side after
    the window."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_WIN, -1)
    )
    scored = e.select(
        "user_id",
        "event_id",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
    )
    x, n, s1, s2 = (F.col(c) for c in ("cents", "n_win", "s1", "s2"))
    dev = n * x - s1
    var_n3 = n * s2 - s1 * s1
    return (
        scored.filter((n >= ZS_MIN) & (dev * dev > 9 * var_n3))
        .select(
            "user_id",
            "event_id",
            "cents",
            n.cast("long").alias("n_win"),
        )
    )


ROLLING_ZSCORE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), scored AS (
  SELECT user_id, event_id, cents,
         count(*) OVER w AS n_win,
         sum(cents) OVER w AS s1,
         sum(cents * cents) OVER w AS s2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ZS_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_id, cents,
       CAST(n_win AS BIGINT) AS n_win
FROM scored
WHERE n_win >= {ZS_MIN}
  AND (n_win * cents - s1) * (n_win * cents - s1) > 9 * (n_win * s2 - s1 * s1)
"""

QUERIES.update({"rolling_zscore_outliers": rolling_zscore_outliers})
ORACLES.update({"rolling_zscore_outliers": ROLLING_ZSCORE_SQL})


# ---------------------------------------------------------------------------
# Exponential-decay trailing revenue (exact integer weights)
# ---------------------------------------------------------------------------

DECAY_HORIZON = 30  # days a sale keeps contributing
DECAY_HALFLIFE = 3  # weight halves every 3 days: w(k) = 2^(9 - k div 3)


def decayed_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trailing revenue per order day — the
    freshness-weighted KPI behind trending/decay scoring (same shape
    as a decayed click counter). EWMA is inherently sequential
    (y_t = a*x_t + (1-a)*y_{t-1}), which does not distribute; the
    standard scale-out reformulation is CONTRIBUTION EXPANSION: each
    day's revenue emits its future contributions (here a 30-day
    horizon, weight halving every 3 days), and one group-by folds
    them. That is a map-side 30x expand of the ALREADY-AGGREGATED
    daily table (tiny) + one shuffle — no sequential scan, no window
    over an unbounded frame, identical on 1 or 1000 executors.

    Weights are exact powers of two (512 >> (k div 3)) and revenue is
    integer cents, so the decayed sum is bit-exact in both engines;
    max magnitude ~ daily_cents * 512 * 30 stays far under BIGINT even
    at SF 10000.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    daily = o.groupBy("o_orderdate").agg(F.sum(_cents()).alias("rev_cents"))
    contrib = daily.select(
        "o_orderdate",
        "rev_cents",
        F.explode(F.sequence(F.lit(0), F.lit(DECAY_HORIZON - 1))).alias("k"),
    ).select(
        F.date_add("o_orderdate", F.col("k")).alias("day"),
        (
            F.col("rev_cents")
            * F.pow(F.lit(2.0), F.lit(9) - F.floor(F.col("k") / DECAY_HALFLIFE)).cast(
                "long"
            )
        ).alias("w"),
    )
    dec = contrib.groupBy("day").agg(F.sum("w").alias("decayed_cents"))
    return daily.join(dec, daily.o_orderdate == dec.day).select(
        F.col("o_orderdate").alias("day"), "rev_cents", "decayed_cents"
    )


DECAYED_REVENUE_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
), contrib AS (
  SELECT day + CAST(k AS INTEGER) AS tday,
         rev_cents * CAST(pow(2, 9 - k // {DECAY_HALFLIFE}) AS BIGINT) AS w
  FROM daily,
       LATERAL (SELECT unnest(generate_series(0, {DECAY_HORIZON - 1})) AS k)
), dec AS (
  SELECT tday, CAST(sum(w) AS BIGINT) AS decayed_cents FROM contrib GROUP BY 1
)
SELECT d.day, d.rev_cents, x.decayed_cents
FROM daily d JOIN dec x ON x.tday = d.day
"""

QUERIES.update({"decayed_daily_revenue": decayed_daily_revenue})
ORACLES.update({"decayed_daily_revenue": DECAYED_REVENUE_SQL})


# ---------------------------------------------------------------------------
# Salted two-phase exact COUNT DISTINCT
# ---------------------------------------------------------------------------


def distinct_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user counts under the SALTED two-phase
    scheme: phase 1 deduplicates (type, salt, user) — the hot event
    type's dedup work spreads over 16 reducers instead of one — and
    phase 2 sums per-salt distinct counts, which is exact because the
    salt is derived FROM the user id (pmod(user, 16)): each distinct
    user lands in exactly one salt bucket, so bucket counts partition
    the distinct set. This is the count-distinct sibling of
    `topk_orders_salted` — the pattern that keeps a skewed
    billion-user distinct from funneling through one reducer. The
    oracle is the naive COUNT(DISTINCT), proving the two-phase
    decomposition exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").alias("u"), F.pmod("user_id", F.lit(16)).alias("_salt")
    )
    phase1 = ev.distinct()  # (type, salt implied by u, u)
    per_salt = phase1.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("d")
    )
    return per_salt.groupBy("event_type").agg(
        F.sum("d").alias("n_distinct_users")
    )


DISTINCT_SALTED_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY event_type
"""

QUERIES.update({"distinct_users_salted": distinct_users_salted})
ORACLES.update({"distinct_users_salted": DISTINCT_SALTED_SQL})


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# ---------------------------------------------------------------------------

SNAP_V1_CUTOFF = "1998-01-01"
SNAP_V2_CUTOFF = "2000-01-01"


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table versions derived
    deterministically from orders: v1 = orders before 1998; v2 = the
    pre-2000 window with 'P'-status rows archived out (deletes) and
    urgent orders repriced (+1.00, updates). The diff is ONE
    full-outer join on the key with row-class tagging — the
    reconciliation read `sinks/merge.py`'s CDC apply writes, and the
    audit every snapshot-based lakehouse job runs after a restatement.
    Counts per class; integer cents comparison, no float equality."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    v1 = o.filter(F.col("d") < F.lit(SNAP_V1_CUTOFF).cast("date")).select(
        F.col("o_orderkey").alias("k1"), F.col("cents").alias("c1")
    )
    v2 = (
        o.filter(
            (F.col("d") < F.lit(SNAP_V2_CUTOFF).cast("date"))
            & (F.col("o_orderstatus") != "P")
        )
        .select(
            F.col("o_orderkey").alias("k2"),
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("cents") + 100
            )
            .otherwise(F.col("cents"))
            .alias("c2"),
        )
    )
    diff = v1.join(v2, F.col("k1") == F.col("k2"), "full_outer").select(
        F.when(F.col("k1").isNull(), F.lit("added"))
        .when(F.col("k2").isNull(), F.lit("deleted"))
        .when(F.col("c1") != F.col("c2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n_rows"))


SNAPSHOT_DIFF_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, o_orderstatus, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), v1 AS (
  SELECT o_orderkey AS k1, cents AS c1 FROM o WHERE d < DATE '{SNAP_V1_CUTOFF}'
), v2 AS (
  SELECT o_orderkey AS k2,
         CASE WHEN o_orderpriority = '1-URGENT' THEN cents + 100 ELSE cents END AS c2
  FROM o WHERE d < DATE '{SNAP_V2_CUTOFF}' AND o_orderstatus <> 'P'
), diff AS (
  SELECT CASE WHEN k1 IS NULL THEN 'added'
              WHEN k2 IS NULL THEN 'deleted'
              WHEN c1 <> c2 THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM v1 FULL OUTER JOIN v2 ON k1 = k2
)
SELECT change, count(*) AS n_rows FROM diff GROUP BY change
"""

QUERIES.update({"snapshot_diff": snapshot_diff})
ORACLES.update({"snapshot_diff": SNAPSHOT_DIFF_SQL})


# ---------------------------------------------------------------------------
# SCD2 point-in-time resolution
# ---------------------------------------------------------------------------

SCD_V1 = "1995-01-01"
SCD_V2 = "1998-01-01"


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history + point-in-time fact resolution in one query: the
    customer dimension is versioned with the engine's own
    `operators/scd.py` merge (v1 load 1995-01-01; 1998-01-01 batch
    migrates every custkey % 3 == 0 to segment 'MIGRATED'), then each
    order resolves the version valid AT ITS ORDER DATE — the
    as-of-history join every auditable warehouse needs and wholesale
    dimension replacement (the reference's approach) cannot answer.
    Output: revenue by point-in-time segment and order year.

    The PIT join is key-equi + a [valid_from, valid_to) range residual
    — per key it touches at most the version count (2 here, bounded
    small always), so it executes as a normal hash join with a cheap
    residual filter, not a range explosion. The oracle rebuilds the
    exact version table in SQL (both scd2_merge paths — changed and
    unchanged keys — are therefore hash-certified)."""
    from etl_extractor_spark.operators.scd import scd2_initial, scd2_merge

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim_v1 = scd2_initial(c, "c_custkey", ["c_mktsegment"], SCD_V1)
    updates = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MIGRATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    dim = scd2_merge(dim_v1, updates, "c_custkey", ["c_mktsegment"], SCD_V2)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        _cents().alias("cents"),
    )
    pit = o.join(
        dim,
        (o.o_custkey == dim.c_custkey)
        & (F.col("d") >= F.col("valid_from"))
        & (F.col("d") < F.col("valid_to")),
    )
    return (
        pit.groupBy("c_mktsegment", F.year("d").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


SCD2_PIT_SQL = f"""
WITH dim AS (
  -- v1 rows: migrated keys closed at the v2 load date, others open
  SELECT c_custkey, c_mktsegment,
         DATE '{SCD_V1}' AS valid_from,
         CASE WHEN c_custkey % 3 = 0 THEN DATE '{SCD_V2}'
              ELSE DATE '9999-12-31' END AS valid_to
  FROM customer
  UNION ALL
  -- v2 versions for the migrated keys
  SELECT c_custkey, 'MIGRATED', DATE '{SCD_V2}', DATE '9999-12-31'
  FROM customer WHERE c_custkey % 3 = 0
), o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
)
SELECT c_mktsegment,
       CAST(year(d) AS BIGINT) AS order_year,
       count(*) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM o JOIN dim ON o_custkey = c_custkey
                AND d >= valid_from AND d < valid_to
GROUP BY 1, 2
"""

QUERIES.update({"scd2_point_in_time": scd2_point_in_time})
ORACLES.update({"scd2_point_in_time": SCD2_PIT_SQL})
