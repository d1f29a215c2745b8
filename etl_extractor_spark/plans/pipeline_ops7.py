"""Round-9 second wave: mergeable exact-distinct bitmap rollup (the
roaring-bitmap warehouse pattern, certified against plain COUNT
DISTINCT), split-conformal prediction intervals (exact order-statistic
calibration + held-out coverage), late-arriving-dimension backfill
(the two-phase DW enrichment the reference's star loader would need
the day its dim extract lags the fact extract), and — in later
batches — IPF raking weights, graph modularity, Holt linear
forecasting, and the 14th certified stream (conditional last-wins
streaming upsert).

Reference provenance: the reference pipeline (nilfredb/ETL-Extractor,
extract/*.py + main.py:97-306) loads dims and facts in one shot with
no late-arrival handling, no distinct-count rollups and no
forecasting; these are the operators its DW surface grows into at
100 TB, built Spark-first with the repo's cross-engine arithmetic
conventions (integer sufficient statistics, multiply-before-divide,
integer floor division, pinned constants over data-derived ones).

Registry placement: appended AFTER pipeline_ops6 in
plans/registry._MODULES AND defer-tiered at pseudo-round-2
(``registry._DEFER_RANK``), exactly like pipeline_ops6: the r9 sweep
window is fully booked (22 deferred ops4/ops5 first-times + the 28
oldest-r2 stale re-checks); pseudo-r2 names tie with the real r2-era
names and sort behind ALL of them (and behind ops6, by stable module
order), so these names stay out of the r9 window and enter the r10
rotation after the 15 remaining real-r2 names and the 8 ops6 names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _md5_bucket_sql(key_expr: str, mod: int) -> str:
    """DuckDB SQL for the repo's cross-engine md5 bucket (first 8 hex
    digits of md5(CAST(key AS VARCHAR)) as a BIGINT, mod ``mod``).
    The nibble fold itself comes from stats._hex8_to_int_sql — the
    one canonical copy (review catch: this module's first cut was the
    5th re-implementation; if the hash convention ever changes,
    scattered copies silently diverge on split membership)."""
    from etl_extractor_spark.plans.stats import _hex8_to_int_sql

    nibbles = _hex8_to_int_sql(f"md5(CAST({key_expr} AS VARCHAR))")
    return f"(({nibbles}) % {mod})"


def _md5_bucket_col(key: F.Column, mod: int) -> F.Column:
    """Spark twin of _md5_bucket_sql (functions/dates-style column
    builder): pmod(conv(md5(key)[:8], 16, 10), mod)."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(mod),
    )


_CENTS = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731


# --- 1. Mergeable exact-distinct bitmap rollup ---------------------------------
#
# COUNT(DISTINCT key) GROUP BY g shuffles every raw (g, key) pair —
# at 100 TB that is the full fact-table key traffic. The warehouse
# fix (roaring bitmaps in Druid/ClickHouse/Snowflake) represents each
# group's key set as a bitmap whose per-partition partials OR
# together. This is that plan in pure Catalyst: key → (word, bit),
# bit_or partial per (group, word) — map-side combinable, one 8-byte
# word per 63-key block per group crosses the wire — then
# sum(bit_count). 63-bit words keep every shift ≤ 62 (1<<63 overflows
# DuckDB's BIGINT left shift and flips Spark's sign bit — measured,
# see tests).

_BM_WORD = 63


def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ordering customers per (nation, order-year) via the
    mergeable-bitmap plan, certified against plain COUNT(DISTINCT):
    c_custkey → (word = key div 63, bit = key % 63); partial
    bit_or(1<<bit) per (nation, year, word) — Spark's partial
    aggregation ORs each map partition's contribution before the
    shuffle, so per (group, word-block) exactly one BIGINT crosses —
    then sum(bit_count(word)) per group.

    100 TB: the shuffle carries ≤ |groups|·⌈keyspace/63⌉ words
    regardless of row count (vs every raw pair for COUNT DISTINCT);
    for dense surrogate keys (this repo's dims are row_number-keyed,
    operators/dims.py:43) occupancy is high and the bitmap is within
    8·63/64 bits per key of information-optimal. Sparse/huge domains
    want the KMV/HLL/Theta sketches already certified in
    pipeline_ops3 — this is the EXACT member of that family."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").cast("int").alias("order_year")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    words = (
        rows.select(
            "n_name",
            "order_year",
            F.expr(f"c_custkey div {_BM_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(1L, CAST(c_custkey % {_BM_WORD} AS INT))"
            ).alias("bit_val"),
        )
        .groupBy("n_name", "order_year", "word_idx")
        .agg(F.expr("bit_or(bit_val)").alias("bm"))
    )
    return (
        words.groupBy("n_name", "order_year")
        .agg(
            F.sum(F.expr("bit_count(bm)")).cast("long").alias("n_customers")
        )
        .select(
            F.col("n_name").alias("nation"), "order_year", "n_customers"
        )
        .orderBy("nation", "order_year")
    )


QUERIES["bitmap_distinct_rollup"] = bitmap_distinct_rollup
# The oracle is the SEMANTIC truth (plain COUNT DISTINCT), not the
# bitmap SQL — the hash match certifies the bitmap decomposition.
ORACLES["bitmap_distinct_rollup"] = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    ORDER BY nation, order_year
"""


# --- 2. Split-conformal prediction intervals ------------------------------------
#
# Distribution-free interval calibration (Vovk; Angelopoulos & Bates
# 2021 survey): fit any predictor on a train split, take the
# ⌈(n+1)(1−α)⌉-th smallest absolute residual on a disjoint
# calibration split as the interval half-width q, and the marginal
# coverage of ŷ ± q on fresh data is ≥ 1−α. Everything here is
# integer-exact: cents, an exact order statistic (no interpolating
# percentile), and the repo's md5 split so both engines agree on
# membership.

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1 → 90% target


def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment split-conformal calibration of a per-segment
    mean-cents predictor: md5(o_orderkey) % 4 → buckets 0,1 train /
    2 calibration / 3 test. q_seg = k-th smallest |residual| on the
    calibration split with k = min(n_cal, ceil((n_cal+1)·0.9));
    coverage_bps counts test rows with |y − ŷ| ≤ q_seg. The oracle
    re-derives the whole chain in SQL, so the hash match pins split
    membership, the floor-divided predictor, the exact order
    statistic, and the coverage count.

    100 TB: one SF-scaled orders⋈customer join for segment labels
    (shuffle on the join key), then per-segment aggregates; the order
    statistic is a per-segment sort of the CALIBRATION split only
    (25% of rows, grouped into 5 segments — skew-free since segments
    are uniform); predictor and q are |segments|-row frames, joined
    back broadcast-small."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _CENTS("o_totalprice").alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rows = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            "cents",
            _md5_bucket_col(F.col("o_orderkey"), 4).alias("bucket"),
        )
        .persist()
    )
    # NOTE (r11): an eager rows.count() was A/B'd against this lazy
    # persist (the broadcast-subtree cold-cache race class) and
    # REJECTED — the extra pass costs ~0.3 s every run while the race
    # spike is rare and filtered by the bench's min-of-2 (interleaved
    # mins: lazy 1.94 vs eager 2.53).
    train = rows.filter(F.col("bucket") <= 1)
    pred = train.groupBy("seg").agg(
        F.expr("sum(cents) div count(1)").alias("pred_cents"),
        F.count(F.lit(1)).cast("long").alias("n_train"),
    )
    calib = (
        rows.filter(F.col("bucket") == 2)
        .join(F.broadcast(pred), "seg")
        .select(
            "seg",
            "n_train",
            F.abs(F.col("cents") - F.col("pred_cents")).alias("resid"),
        )
    )
    w = Window.partitionBy("seg").orderBy("resid")
    # k = min(n, ceil((n+1)·(1−alpha))) derived from the PINNED alpha
    # constants (review catch: the first cut hardcoded the 9, leaving
    # _CONF_ALPHA_NUM decorative — a changed alpha would have silently
    # certified the wrong quantile on BOTH engines)
    _keep = _CONF_ALPHA_DEN - _CONF_ALPHA_NUM
    k_expr = (
        f"least(n_cal, ({_keep} * (n_cal + 1) + {_CONF_ALPHA_DEN} - 1)"
        f" div {_CONF_ALPHA_DEN})"
    )
    q = (
        calib.withColumn("pos", F.row_number().over(w).cast("long"))
        .withColumn(
            "n_cal", F.count(F.lit(1)).over(Window.partitionBy("seg"))
        )
        .filter(F.col("pos") == F.expr(k_expr))
        .select(
            "seg",
            "n_train",
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("resid").alias("q_resid_cents"),
        )
    )
    test = rows.filter(F.col("bucket") == 3).join(
        F.broadcast(pred.select("seg", "pred_cents")), "seg"
    )
    cov = test.join(F.broadcast(q), "seg").groupBy(
        "seg", "n_train", "n_cal", "q_resid_cents"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            (
                F.abs(F.col("cents") - F.col("pred_cents"))
                <= F.col("q_resid_cents")
            ).cast("long")
        ).alias("n_covered"),
    )
    out = cov.select(
        F.col("seg").alias("mktsegment"),
        "n_train",
        "n_cal",
        "q_resid_cents",
        "n_test",
        "n_covered",
        F.expr("n_covered * 10000 div n_test").alias("coverage_bps"),
    ).orderBy("mktsegment")
    # NOTE: rows stays persisted across the caller's action (the
    # repo-wide pattern) — unpersisting here would drop the cache
    # before the lazy plan ever runs and the train/calib/test branches
    # would each re-run the orders⋈customer join.
    return out


QUERIES["conformal_interval_coverage"] = conformal_interval_coverage
ORACLES["conformal_interval_coverage"] = f"""
    WITH rows_b AS (
      SELECT c_mktsegment AS seg,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             {_md5_bucket_sql('o_orderkey', 4)} AS bucket
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), pred AS (
      SELECT seg, CAST(sum(cents) // count(*) AS BIGINT) AS pred_cents,
             count(*)::BIGINT AS n_train
      FROM rows_b WHERE bucket <= 1 GROUP BY seg
    ), calib AS (
      SELECT r.seg, p.n_train, abs(r.cents - p.pred_cents) AS resid
      FROM rows_b r JOIN pred p USING (seg) WHERE r.bucket = 2
    ), q AS (
      SELECT seg, n_train, n_cal, resid AS q_resid_cents
      FROM (
        SELECT seg, n_train, resid,
               row_number() OVER (PARTITION BY seg ORDER BY resid) AS pos,
               count(*) OVER (PARTITION BY seg)::BIGINT AS n_cal
        FROM calib
      )
      WHERE pos = least(n_cal, ({_CONF_ALPHA_DEN - _CONF_ALPHA_NUM} * (n_cal + 1) + {_CONF_ALPHA_DEN} - 1) // {_CONF_ALPHA_DEN})
    )
    SELECT q.seg AS mktsegment, q.n_train, q.n_cal, q.q_resid_cents,
           count(*)::BIGINT AS n_test,
           CAST(sum(CASE WHEN abs(r.cents - p.pred_cents) <= q.q_resid_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN abs(r.cents - p.pred_cents) <= q.q_resid_cents
                         THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
             AS coverage_bps
    FROM rows_b r
    JOIN pred p USING (seg) JOIN q ON q.seg = r.seg
    WHERE r.bucket = 3
    GROUP BY 1, 2, 3, 4
    ORDER BY mktsegment
"""


# --- 3. Late-arriving-dimension backfill ----------------------------------------
#
# The reference's star loader (main.py:97-306) joins facts to dims in
# one shot and would drop or mis-key facts whose dim row hasn't
# landed yet. The standard DW fix: phase 1 enriches against the dim
# snapshot and parks misses under a sentinel; when the late dim batch
# arrives, phase 2 re-joins ONLY the parked rows. Fixture: the dim
# snapshot is customers with c_custkey % 10 != 0 (a deterministic
# "10% of the dim extract is late"); the late batch is the
# complement.


def late_arriving_dim_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase enrichment of orders against a customer dim whose
    c_custkey % 10 == 0 rows arrive late: phase 1 left-joins the
    snapshot (misses → sentinel nation -1, parked), phase 2 joins the
    parked subset against the late batch and stamps was_backfilled=1.
    Output: per (nation, was_backfilled) order counts + revenue. The
    oracle is the one-shot full join with the backfill flag derived
    arithmetically — a hash match certifies the two-phase plan loses
    nothing, double-counts nothing, and routes exactly the late keys
    through phase 2.

    100 TB: phase 1 is the ordinary fact⋈dim shuffle join; phase 2
    touches only the parked rows (the late fraction of the fact — a
    filter on the phase-1 output that Catalyst pushes to the union
    branch), joined against the late dim batch which is small by
    construction (a day's dim churn, broadcastable in production; NOT
    broadcast here because the fixture's late batch is SF-scaled).
    Parked rows carry their fact columns, so phase 2 never re-reads
    the fact table."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _CENTS("o_totalprice").alias("cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    snap = cust.filter(F.col("c_custkey") % 10 != 0)
    late = cust.filter(F.col("c_custkey") % 10 == 0)
    ph1 = o.join(snap, o["o_custkey"] == snap["c_custkey"], "left").select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.coalesce(F.col("c_nationkey"), F.lit(-1)).alias("nationkey"),
    )
    matched = ph1.filter(F.col("nationkey") != -1).withColumn(
        "was_backfilled", F.lit(0)
    )
    parked = ph1.filter(F.col("nationkey") == -1).drop("nationkey")
    backfilled = (
        parked.join(late, parked["o_custkey"] == late["c_custkey"], "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "cents",
            F.coalesce(F.col("c_nationkey"), F.lit(-1)).alias("nationkey"),
        )
        .withColumn("was_backfilled", F.lit(1))
    )
    enriched = matched.unionByName(backfilled)
    return (
        enriched.join(
            F.broadcast(nat), enriched["nationkey"] == nat["n_nationkey"]
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("was_backfilled").cast("int").alias("was_backfilled"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("nation", "was_backfilled")
    )


QUERIES["late_arriving_dim_backfill"] = late_arriving_dim_backfill
ORACLES["late_arriving_dim_backfill"] = """
    SELECT n_name AS nation,
           CAST(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS was_backfilled,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    ORDER BY nation, was_backfilled
"""


# --- 4. Graph modularity of the nation partition --------------------------------
#
# Newman modularity Q = Σ_c [ e_c/m − (D_c/2m)² ] of the purchase
# graph (distinct customer↔supplier edges — the same graph pagerank /
# degrees / k-core certify) under the nation partition (customers AND
# suppliers both carry nations). Fixture measured NON-degenerate
# before building (house rule): m=1444 / internal=59 at sf0.001,
# m=48518 / internal=1938 at sf0.01 — sparse (m ∝ SF) with ~4%
# internal mass. The co-supplier projection was measured OUT: it is
# the COMPLETE graph at every SF (C(n_supp, 2) edges — quadratic and
# structureless).


def graph_modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation modularity contributions of the purchase graph:
    internal edge count e_c, degree mass D_c, and q_contrib_micro =
    floor((4·m·e_c − D_c²) / (4·m²) · 1e6). The division runs as ONE
    identical exactly-rounded DOUBLE sequence over exact int64 inputs
    on both engines (the repo's no-ceiling final-scalar recipe —
    products are computed in double too, so there is no int64 4·m²
    wrap to outgrow: every factor is exact and IEEE ops round
    identically).

    100 TB: the edge build is the ordinary fact⋈fact distinct (shuffle
    on orderkey, then on the pair); degrees are two groupBys; the
    per-nation rollup shuffles ≤ |nations| rows. m joins in as a
    broadcast 1-row aggregate (the only crossJoin shape the repo
    allows)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .persist()
    )
    # NOTE (r11): eager e.count() A/B'd and REJECTED (lazy min 2.47 /
    # mean 2.69 vs eager 2.77 / 3.61 interleaved) — the guaranteed
    # extra fact⋈fact pass outweighs the occasional cold-cache race
    # on this line.
    m1 = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    labeled = (
        e.join(cust, e["ck"] == cust["c_custkey"])
        .join(supp, e["sk"] == supp["s_suppkey"])
        .select("ck", "sk", "c_nationkey", "s_nationkey")
    )
    internal = (
        labeled.filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    deg_c = (
        e.groupBy("ck")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(cust, F.col("ck") == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum("d").cast("long").alias("deg"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
        )
    )
    deg_s = (
        e.groupBy("sk")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(supp, F.col("sk") == supp["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum("d").cast("long").alias("deg"),
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        )
    )
    per_nat = (
        deg_c.select(
            "nationkey", "deg", "n_customers", F.lit(0).cast("long").alias("n_suppliers")
        )
        .unionByName(
            deg_s.select(
                "nationkey",
                "deg",
                F.lit(0).cast("long").alias("n_customers"),
                "n_suppliers",
            )
        )
        .groupBy("nationkey")
        .agg(
            F.sum("deg").cast("long").alias("degree_sum"),
            F.sum("n_customers").cast("long").alias("n_customers"),
            F.sum("n_suppliers").cast("long").alias("n_suppliers"),
        )
        .join(internal, "nationkey", "left")
        .na.fill({"internal_edges": 0})
    )
    return (
        per_nat.crossJoin(F.broadcast(m1))
        .join(F.broadcast(nat), F.col("nationkey") == nat["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            "n_suppliers",
            "internal_edges",
            "degree_sum",
            F.floor(
                (
                    F.lit(4.0) * F.col("m").cast("double")
                    * F.col("internal_edges").cast("double")
                    - F.col("degree_sum").cast("double")
                    * F.col("degree_sum").cast("double")
                )
                / (
                    F.lit(4.0) * F.col("m").cast("double")
                    * F.col("m").cast("double")
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("q_contrib_micro"),
        )
        .orderBy("nation")
    )


QUERIES["graph_modularity_nations"] = graph_modularity_nations
ORACLES["graph_modularity_nations"] = """
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), m1 AS (
      SELECT count(*)::BIGINT AS m FROM e
    ), internal AS (
      SELECT c_nationkey AS nationkey, count(*)::BIGINT AS internal_edges
      FROM e
      JOIN customer ON ck = c_custkey
      JOIN supplier ON sk = s_suppkey
      WHERE c_nationkey = s_nationkey
      GROUP BY 1
    ), deg_c AS (
      SELECT c_nationkey AS nationkey, sum(d)::BIGINT AS deg,
             count(*)::BIGINT AS n_customers
      FROM (SELECT ck, count(*)::BIGINT AS d FROM e GROUP BY ck)
      JOIN customer ON ck = c_custkey
      GROUP BY 1
    ), deg_s AS (
      SELECT s_nationkey AS nationkey, sum(d)::BIGINT AS deg,
             count(*)::BIGINT AS n_suppliers
      FROM (SELECT sk, count(*)::BIGINT AS d FROM e GROUP BY sk)
      JOIN supplier ON sk = s_suppkey
      GROUP BY 1
    ), per_nat AS (
      SELECT nationkey, sum(deg)::BIGINT AS degree_sum,
             sum(n_customers)::BIGINT AS n_customers,
             sum(n_suppliers)::BIGINT AS n_suppliers
      FROM (
        SELECT nationkey, deg, n_customers, 0::BIGINT AS n_suppliers FROM deg_c
        UNION ALL
        SELECT nationkey, deg, 0::BIGINT AS n_customers, n_suppliers FROM deg_s
      )
      GROUP BY 1
    )
    SELECT n_name AS nation, p.n_customers, p.n_suppliers,
           coalesce(i.internal_edges, 0)::BIGINT AS internal_edges,
           p.degree_sum,
           CAST(floor(
             (4.0 * (SELECT m FROM m1)::DOUBLE * coalesce(i.internal_edges, 0)::DOUBLE
              - p.degree_sum::DOUBLE * p.degree_sum::DOUBLE)
             / (4.0 * (SELECT m FROM m1)::DOUBLE * (SELECT m FROM m1)::DOUBLE)
             * 1000000.0) AS BIGINT) AS q_contrib_micro
    FROM per_nat p
    LEFT JOIN internal i USING (nationkey)
    JOIN nation ON nationkey = n_nationkey
    ORDER BY nation
"""


# --- 5. IPF raking weights (source-mix calibration) ------------------------------
#
# Iterative proportional fitting (Deming & Stephan 1940): reweight
# the (lang × source) cells of the documents corpus so both marginal
# mass vectors approach uniform targets — the calibration step a
# training-data pipeline runs before source mixing when the crawl's
# observed mix differs from the recipe's target mix. Two pinned
# rounds (lang step then source step, twice), exactly unrolled in the
# oracle. Each step publishes ONE micro-quantized integer factor per
# margin value (floor(target/mass · 1e6) over exact int64 inputs as
# an identical double sequence — the cuped-θ pattern), then applies
# it in pure int64 (w·f div 1e6): both engines agree bit-for-bit at
# every step, so drift cannot compound.

_IPF_ROUNDS = 2


def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) raking weights after _IPF_ROUNDS rounds of
    IPF toward uniform lang and source margins. w starts at 1e6
    micro-units per doc; each step scales every cell in a margin
    group by that group's published micro-factor. Output: cell doc
    count, final per-doc weight, and final cell mass.

    100 TB: ONE corpus-scaled groupBy builds the (lang × source) cell
    frame — |L|·|S| rows regardless of corpus size; the 4 scaling
    steps are groupBy+join arithmetic on that constant-size frame
    (persisted — lineage would otherwise re-run the corpus pass per
    step). int64 headroom: w·f stays exact while w < 9.2e12 micro
    (f ≈ 1e6); masses are ≤ N·1e6·max(w/1e6) — sums go through
    DECIMAL(38) guards nothing here because n·w ≤ 5e11 per cell and
    Σ ≤ 5e14 at sf1000 — documented, not load-bearing."""
    d = load_table(spark, sf_dir, "documents").select("lang", "source")
    cells = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        # |L|·|S| rows total: collapse to ONE partition so the 4
        # scaling steps don't each schedule 200-partition micro-stages
        # (the corpus-scaled work — the groupBy above — stays
        # distributed; only the constant-size arithmetic serializes)
        .coalesce(1)
        .withColumn("w", F.lit(1_000_000).cast("long"))
        .persist()
    )
    # NOTE (r11): eager cells.count() A/B'd and REJECTED (nop/lazy
    # mins 1.75/2.14 vs eager 1.80 with worse means) — the 1-partition
    # frame's cache race costs less than a guaranteed extra pass.
    margins = cells.agg(
        (F.sum("n_docs") * 1_000_000).cast("long").alias("total_mass"),
        F.countDistinct("lang").cast("long").alias("n_lang"),
        F.countDistinct("source").cast("long").alias("n_source"),
    )
    cur = cells.crossJoin(F.broadcast(margins)).select(
        "lang",
        "source",
        "n_docs",
        "w",
        F.expr("total_mass div n_lang").alias("t_lang"),
        F.expr("total_mass div n_source").alias("t_source"),
    )
    for _ in range(_IPF_ROUNDS):
        for dim, tgt in (("lang", "t_lang"), ("source", "t_source")):
            grp = cur.groupBy(dim).agg(
                F.sum(F.col("n_docs") * F.col("w")).cast("long").alias("mass")
            )
            cur = (
                cur.join(F.broadcast(grp), dim)
                .withColumn(
                    "f",
                    F.floor(
                        F.col(tgt).cast("double")
                        / F.col("mass").cast("double")
                        * F.lit(1000000.0)
                    ).cast("long"),
                )
                .withColumn("w", F.expr("w * f div 1000000"))
                .drop("mass", "f")
            )
    return cur.select(
        "lang",
        "source",
        "n_docs",
        F.col("w").alias("w_micro"),
        (F.col("n_docs") * F.col("w")).cast("long").alias("cell_mass_micro"),
    ).orderBy("lang", "source")


QUERIES["ipf_raking_weights"] = ipf_raking_weights


def _ipf_oracle_sql() -> str:
    """Unrolled CTE chain mirroring the Spark loop step-for-step."""
    steps = []
    prev = "c0"
    idx = 0
    for _ in range(_IPF_ROUNDS):
        for dim, tgt in (("lang", "t_lang"), ("source", "t_source")):
            idx += 1
            steps.append(
                f"""g{idx} AS MATERIALIZED (
      SELECT {dim}, CAST(sum(n_docs * w) AS BIGINT) AS mass
      FROM {prev} GROUP BY {dim}
    ), c{idx} AS MATERIALIZED (
      SELECT c.lang, c.source, c.n_docs,
             (c.w * CAST(floor(CAST(c.{tgt} AS DOUBLE) / CAST(g.mass AS DOUBLE)
                                * 1000000.0) AS BIGINT)) // 1000000 AS w,
             c.t_lang, c.t_source
      FROM {prev} c JOIN g{idx} g USING ({dim})
    )"""
            )
            prev = f"c{idx}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH c0 AS MATERIALIZED (
      SELECT lang, source, count(*)::BIGINT AS n_docs,
             1000000::BIGINT AS w,
             ((SELECT count(*) FROM documents) * 1000000)
               // (SELECT count(DISTINCT lang) FROM documents) AS t_lang,
             ((SELECT count(*) FROM documents) * 1000000)
               // (SELECT count(DISTINCT source) FROM documents) AS t_source
      FROM documents GROUP BY lang, source
    ),
    {chain}
    SELECT lang, source, n_docs, w AS w_micro,
           CAST(n_docs * w AS BIGINT) AS cell_mass_micro
    FROM {prev}
    ORDER BY lang, source
"""


ORACLES["ipf_raking_weights"] = _ipf_oracle_sql()


# --- 6. Holt linear-trend forecast (per-nation weekly revenue) -------------------
#
# Holt's linear method (the trend member of the exponential-smoothing
# family; ses_forecast_nation certified the level-only member). The
# recurrence is inherently sequential IN TIME but embarrassingly
# parallel ACROSS series — the distributable shape: one corpus pass
# builds the per-nation weekly aggregate (≤ ~370 weeks per nation at
# ANY scale factor — the calendar bounds it, not the row count), then
# applyInPandas runs the bounded integer loop per nation. Pinned
# smoothing constants; all state in int64 cents; TRUNCATING division
# toward zero on both sides (DuckDB's // truncates — measured
# (-7)//2 = -3 — while Python's // floors, so the Python loop uses
# the explicit _tdiv; the trend term goes negative on this fixture,
# making the distinction load-bearing) keeps both engines
# bit-identical at every step, so drift cannot compound across the
# ~360 iterations.

_HOLT_A_NUM = 3  # alpha = 0.3
_HOLT_B_NUM = 1  # beta  = 0.1
_HOLT_DEN = 10


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` (and
    Spark's ``div``) semantics, NOT Python's flooring ``//``."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Holt linear smoothing of weekly revenue cents:
    l1 = y1, b1 = y2 − y1, then for t ≥ 2
    l_t = (3·y_t + 7·(l+b)) // 10, b_t = ((l_t − l) + 9·b) // 10,
    with the 1-step-ahead absolute-error sum accumulated from t = 2
    (e_2 ≡ 0 under this init, documented). Output: final state, the
    4-week-ahead forecast l + 4·b, and the SAE. Nations with a
    single week are excluded on both sides (b is undefined).

    100 TB: the only corpus-scaled work is the weekly groupBy; the
    applyInPandas stage shuffles |nations|·|weeks| AGGREGATE rows and
    loops over ≤ ~370 ints per group. The oracle unrolls the same
    recurrence as a DuckDB recursive CTE (lockstep over nations,
    ≤ ~370 iterations)."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
        _CENTS("o_totalprice").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    weekly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "wk")
        .agg(F.sum("cents").cast("long").alias("y"))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("wk")
        ys = [int(v) for v in pdf["y"]]  # Python ints: floor-div semantics
        if len(ys) < 2:
            return pd.DataFrame(
                columns=[
                    "nation",
                    "n_weeks",
                    "l_final_cents",
                    "b_final_cents",
                    "fc4_cents",
                    "sae_cents",
                ]
            ).astype(
                {
                    "nation": "object",
                    "n_weeks": "int64",
                    "l_final_cents": "int64",
                    "b_final_cents": "int64",
                    "fc4_cents": "int64",
                    "sae_cents": "int64",
                }
            )
        level, trend = ys[0], ys[1] - ys[0]
        sae = 0
        for y in ys[1:]:
            pred = level + trend
            sae += abs(y - pred)
            new_level = _tdiv(
                _HOLT_A_NUM * y + (_HOLT_DEN - _HOLT_A_NUM) * pred, _HOLT_DEN
            )
            trend = _tdiv(
                _HOLT_B_NUM * (new_level - level)
                + (_HOLT_DEN - _HOLT_B_NUM) * trend,
                _HOLT_DEN,
            )
            level = new_level
        return pd.DataFrame(
            {
                "nation": [pdf["nation"].iloc[0]],
                "n_weeks": [len(ys)],
                "l_final_cents": [level],
                "b_final_cents": [trend],
                "fc4_cents": [level + 4 * trend],
                "sae_cents": [sae],
            }
        )

    out_schema = (
        "nation string, n_weeks long, l_final_cents long, "
        "b_final_cents long, fc4_cents long, sae_cents long"
    )
    return (
        weekly.groupBy("nation")
        .applyInPandas(_holt, out_schema)
        .orderBy("nation")
    )


QUERIES["holt_linear_forecast"] = holt_linear_forecast
ORACLES["holt_linear_forecast"] = f"""
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT n_name AS nation, date_trunc('week', o_orderdate) AS wk,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), ord_s AS MATERIALIZED (
      SELECT nation, y,
             row_number() OVER (PARTITION BY nation ORDER BY wk) AS rn,
             count(*) OVER (PARTITION BY nation)::BIGINT AS n
      FROM s
    ), rec AS (
      SELECT a.nation, 2::BIGINT AS t, a.n,
             a.y AS l, b.y - a.y AS b, 0::BIGINT AS sae,
             b.y AS y_cur
      FROM ord_s a JOIN ord_s b ON a.nation = b.nation AND b.rn = 2
      WHERE a.rn = 1 AND a.n >= 2
      UNION ALL
      SELECT r.nation, r.t + 1, r.n,
             ({_HOLT_A_NUM} * r.y_cur + {_HOLT_DEN - _HOLT_A_NUM} * (r.l + r.b)) // {_HOLT_DEN},
             ({_HOLT_B_NUM} * ((({_HOLT_A_NUM} * r.y_cur + {_HOLT_DEN - _HOLT_A_NUM} * (r.l + r.b)) // {_HOLT_DEN}) - r.l)
              + {_HOLT_DEN - _HOLT_B_NUM} * r.b) // {_HOLT_DEN},
             r.sae + abs(r.y_cur - (r.l + r.b)),
             nxt.y
      FROM rec r LEFT JOIN ord_s nxt ON nxt.nation = r.nation AND nxt.rn = r.t + 1
      WHERE r.t <= r.n
    )
    SELECT nation, n AS n_weeks, l AS l_final_cents, b AS b_final_cents,
           l + 4 * b AS fc4_cents, sae AS sae_cents
    FROM rec WHERE t = n + 1
    ORDER BY nation
"""


# --- 7. Streaming SCD1 latest-state replay (14th certified stream) ---------------
#
# A streaming-maintained Type-1 dimension: the per-user LATEST event
# (argmax by (ts_ntz, event_id) — a total order, so the reduction is
# associative+commutative and the replay is batch-order independent).
# The state is a struct-max — mergeable exactly like the counter
# states of the other incremental streams, so the existing
# foreachBatch incremental-agg sink applies unchanged: each
# micro-batch partial-argmaxes itself, then merges into the standing
# parquet state keyed by user.


def streaming_scd1_latest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow replay of the streaming SCD1 dimension: events
    stream → struct(ts_ntz, event_id, type, value) → incremental
    max-merge per user_id (+ a lifetime event count). The oracle is
    the batch argmax (row_number over ts DESC, event_id DESC) — a
    hash match certifies last-wins resolution, the deterministic
    tiebreak, and the count, independent of micro-batch boundaries.

    100 TB: state is |users| rows in executor-written parquet — no
    driver-memory sink, no streaming state store (the argmax happens
    per batch as a batch plan inside foreachBatch); the batch-id
    watermark makes replayed uncommitted batches no-ops. The struct
    comparator never reaches the payload fields (event_id is unique),
    so payload doubles ride along without affecting the order."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.sinks.incremental import read_state
    from etl_extractor_spark.streaming import events_stream as SE

    base = pid_scratch_dir("spark_graft_scd1_replay_")
    shutil.rmtree(base, ignore_errors=True)
    ev = SE.events_stream(spark, sf_dir).select(
        "user_id",
        F.struct(
            F.col("ts_ntz").alias("ts"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("etype"),
            F.col("value").alias("val"),
        ).alias("latest"),
    )
    SE.run_streaming_incremental_agg(
        ev,
        f"{base}/state",
        f"{base}/ckpt",
        keys=["user_id"],
        measures={"latest": ("max", "latest"), "n_events": ("count", "*")},
    )
    st = read_state(spark, f"{base}/state")
    return st.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("latest.eid").cast("long").alias("last_event_id"),
        F.col("latest.etype").alias("last_event_type"),
        F.col("latest.val").alias("last_value"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("user_id")


QUERIES["streaming_scd1_latest_replay"] = streaming_scd1_latest_replay
ORACLES["streaming_scd1_latest_replay"] = """
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             -- epoch_us truncates TIMESTAMP_NS to the same microsecond
             -- grid as the stream's ts_ntz (ts div 1000) — ordering on
             -- raw ns would break ties differently than the Spark
             -- struct-argmax on a nanos fixture (review catch; inert
             -- on the committed µs files, load-bearing on ns ones)
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id)::BIGINT AS n
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           value AS last_value,
           n AS n_events
    FROM r WHERE rn = 1
    ORDER BY user_id
"""


# --- 8. Type-widening schema-evolution scan --------------------------------------
#
# The sibling of ops6's add-a-column scan and ops5's partition-spec
# evolution: a column whose physical type WIDENED between file
# generations (INT → BIGINT). Spark's parquet mergeSchema REFUSES
# this (CANNOT_MERGE_SCHEMAS, measured — see tests), so the engine
# supplies what the scanner won't: probe each generation's footer
# schema, compute the widened target by rule (int ⊔ bigint = bigint,
# float ⊔ double = double), read each generation with explicit casts,
# and unionByName.

_WIDEN_RANK = {"integer": 1, "long": 2, "float": 11, "double": 12}


def _widened_type(a: str, b: str) -> str:
    """Join of two physical types in the widening lattice; identical
    types pass through, unknown pairs raise (no silent narrowing)."""
    if a == b:
        return a
    fam_a = "f" if a in ("float", "double") else "i"
    fam_b = "f" if b in ("float", "double") else "i"
    if fam_a != fam_b or a not in _WIDEN_RANK or b not in _WIDEN_RANK:
        raise ValueError(f"no widening rule for {a} vs {b}")
    return a if _WIDEN_RANK[a] >= _WIDEN_RANK[b] else b


def schema_widening_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a two-generation table whose qty column widened INT →
    BIGINT: gen v1 holds even orderkeys with cents as INT-truncated
    kilocents (values < 2^31 by construction), gen v2 holds odd
    orderkeys with full BIGINT cents. The widened read casts v1 to
    the target BIGINT schema (kilocents × 1000 restores cents — the
    generation carries coarser units, a real migration shape) and
    unions. Certified against the base-table rule.

    100 TB: per-generation reads are ordinary pruned parquet scans;
    the footer probe reads ONE footer per generation, not per file
    (generations share a schema by construction — the writer enforces
    it). The cast is map-side."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _CENTS("o_totalprice").alias("cents"), "o_orderstatus"
    ).persist()  # two generation writes below — one corpus pass, not two
    path = pid_scratch_dir("spark_graft_widen_scan_")
    shutil.rmtree(path, ignore_errors=True)
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.expr("CAST(cents div 1000 AS INT)").alias("qty"),
        "o_orderstatus",
    ).write.mode("overwrite").parquet(path + "/gen=v1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", F.col("cents").alias("qty"), "o_orderstatus"
    ).write.mode("overwrite").parquet(path + "/gen=v2")

    gens = ["v1", "v2"]
    frames = [spark.read.parquet(f"{path}/gen={g}") for g in gens]
    target: dict = {}
    for fr in frames:
        for fld in fr.schema.fields:
            t = fld.dataType.simpleString()
            t = {"int": "integer", "bigint": "long"}.get(t, t)
            target[fld.name] = (
                _widened_type(target[fld.name], t) if fld.name in target else t
            )
    widened = [
        fr.select(
            *[F.col(name).cast(target[name]).alias(name) for name in target]
        )
        for fr in frames
    ]
    merged = widened[0]
    for fr in widened[1:]:
        merged = merged.unionByName(fr)
    # v1's qty is kilocents — restore units via the generation key
    # (encoded in the orderkey parity, as the oracle derives it)
    restored = merged.select(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("qty") * 1000)
        .otherwise(F.col("qty"))
        .alias("cents_restored"),
    )
    return (
        restored.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents_restored").cast("long").alias("revenue_cents_approx"),
        )
        .orderBy("status")
    )


QUERIES["schema_widening_scan"] = schema_widening_scan
ORACLES["schema_widening_scan"] = """
    SELECT o_orderstatus AS status,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CASE WHEN o_orderkey % 2 = 0
                    THEN (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          // 1000) * 1000
                    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               END) AS BIGINT) AS revenue_cents_approx
    FROM orders
    GROUP BY 1 ORDER BY status
"""


# --- 9. Bitmap intersection retention (bitmap set-ops) ---------------------------
#
# The second half of the bitmap family: intersection. Year-over-year
# customer retention is COUNT(DISTINCT a ∩ b) per consecutive year
# pair — as bitmaps it is word-aligned AND + popcount, with the same
# one-word-per-63-key-block shuffle bound as the rollup. This is the
# operation warehouse bitmap indexes exist for (funnel/retention
# set-ops without re-shuffling raw keys).


def bitmap_intersection_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year ordering-customer retention via bitmap AND:
    build per-(year, word) customer bitmaps once, self-join on
    word_idx for consecutive years, popcount the ANDed words. The
    oracle is the plain distinct-key self-join — the hash match
    certifies the set algebra (and that a customer absent from a
    63-key block in either year contributes nothing: inner join on
    word_idx is exactly bitmap AND's zero-absorption).

    100 TB: the bitmaps are built in ONE corpus pass (same shuffle as
    bitmap_distinct_rollup); the retention join touches
    |years|·⌈keyspace/63⌉ word rows — independent of row count. The
    raw-key alternative shuffles every (year, custkey) pair TWICE
    (once per join side)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    )
    words = (
        o.select(
            "yr",
            F.expr(f"o_custkey div {_BM_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(1L, CAST(o_custkey % {_BM_WORD} AS INT))"
            ).alias("bit_val"),
        )
        .groupBy("yr", "word_idx")
        .agg(F.expr("bit_or(bit_val)").alias("bm"))
        .persist()
    )
    # eager build (r11): three consumers (per_year + both self-join
    # sides) race the cold cache otherwise — the documented
    # concurrent-consumer re-evaluation class.
    words.count()
    per_year = words.groupBy("yr").agg(
        F.sum(F.expr("bit_count(bm)")).cast("long").alias("n_cust")
    )
    a, b = words.alias("a"), words.alias("b")
    retained = (
        a.join(
            b,
            (F.col("a.word_idx") == F.col("b.word_idx"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .select(
            F.col("a.yr").alias("year_from"),
            F.expr("bit_count(a.bm & b.bm)").alias("pc"),
        )
        .groupBy("year_from")
        .agg(F.sum("pc").cast("long").alias("n_retained"))
        # parity with the oracle's key-equality join, which emits NO
        # group for a year pair with zero common customers — the
        # word-level join can still match on shared 63-key BLOCKS and
        # would emit n_retained=0 there (review catch; latent on this
        # fixture's ~80% retention, divergent on disjoint year pairs)
        .filter(F.col("n_retained") > 0)
    )
    pa, pb = per_year.alias("pa"), per_year.alias("pb")
    return (
        retained.join(pa, F.col("pa.yr") == F.col("year_from"))
        .join(pb, F.col("pb.yr") == F.col("year_from") + 1)
        .select(
            "year_from",
            (F.col("year_from") + 1).cast("int").alias("year_to"),
            F.col("pa.n_cust").alias("n_from"),
            F.col("pb.n_cust").alias("n_to"),
            "n_retained",
            F.expr("n_retained * 10000 div pa.n_cust").alias("retention_bps"),
        )
        .orderBy("year_from")
    )


QUERIES["bitmap_intersection_retention"] = bitmap_intersection_retention
ORACLES["bitmap_intersection_retention"] = """
    WITH cy AS MATERIALIZED (
      SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS y, o_custkey AS k
      FROM orders
    ), per AS (
      SELECT y, count(*)::BIGINT AS n FROM cy GROUP BY y
    ), ret AS (
      SELECT a.y AS year_from, count(*)::BIGINT AS n_retained
      FROM cy a JOIN cy b ON a.k = b.k AND b.y = a.y + 1
      GROUP BY 1
    )
    SELECT r.year_from, CAST(r.year_from + 1 AS INTEGER) AS year_to,
           pa.n AS n_from, pb.n AS n_to, r.n_retained,
           r.n_retained * 10000 // pa.n AS retention_bps
    FROM ret r
    JOIN per pa ON pa.y = r.year_from
    JOIN per pb ON pb.y = r.year_from + 1
    ORDER BY year_from
"""


# --- 10. Streaming exact-reach bitmap replay (15th certified stream) -------------
#
# The EXACT twin of streaming_kmv_reach_replay: daily distinct-user
# reach maintained as per-(day, word) bitmap state via the
# incremental-agg sink's new bit_or measure (OR is associative,
# commutative AND idempotent — the strongest replay-safety class in
# _MERGEABLE; a re-delivered batch is a no-op even WITHOUT the
# batch-id watermark, which still guards the count-style measures).


def streaming_bitmap_reach_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow replay of streaming exact daily reach: events
    stream → (day, user-word, bit) → foreachBatch bit_or-merge into
    parquet state → read-time popcount rollup per day. Shares the
    semantics of a plain per-day COUNT(DISTINCT user_id) — the oracle
    IS that query, so the hash match certifies the streaming bitmap
    maintenance end to end.

    100 TB: state is |days|·⌈users/63⌉ words — bounded by the key
    domain, not the event volume; each micro-batch partial-ORs itself
    map-side before the merge. Day comes from ts_ntz (wall clock), so
    the replay is session-timezone independent."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.sinks.incremental import read_state
    from etl_extractor_spark.streaming import events_stream as SE

    base = pid_scratch_dir("spark_graft_bmreach_replay_")
    shutil.rmtree(base, ignore_errors=True)
    ev = SE.events_stream(spark, sf_dir).select(
        F.to_date("ts_ntz").cast("string").alias("day"),
        F.expr(f"user_id div {_BM_WORD}").alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST(user_id % {_BM_WORD} AS INT))").alias(
            "bit_val"
        ),
    )
    SE.run_streaming_incremental_agg(
        ev,
        f"{base}/state",
        f"{base}/ckpt",
        keys=["day", "word_idx"],
        measures={"bm": ("bit_or", "bit_val")},
    )
    st = read_state(spark, f"{base}/state")
    return (
        st.groupBy("day")
        .agg(F.sum(F.expr("bit_count(bm)")).cast("long").alias("n_users"))
        .orderBy("day")
    )


QUERIES["streaming_bitmap_reach_replay"] = streaming_bitmap_reach_replay
ORACLES["streaming_bitmap_reach_replay"] = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1 ORDER BY day
"""


# --- 11. Blocking-quality audit (sampled pair completeness / reduction ratio) ----
#
# The measurement the editdist blocking scheme (pipeline_ops5) rests
# on: does (brand, size) blocking actually retain the true near-dup
# pairs (pair completeness) while pruning the pair space (reduction
# ratio)? Exact PC needs the TRUE match set — quadratic — so the
# audit runs on a FIXED-SIZE deterministic sample (md5-ranked first
# N parts): C(N,2) pairs at ANY scale factor, the standard production
# ER-audit shape (Christen 2012, ch. 7).

_BQ_SAMPLE_N = 300  # C(300,2) = 44 850 pairs — bounded at every SF


def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair completeness and reduction ratio of TWO blocking schemes
    on the md5-ranked first _BQ_SAMPLE_N parts — true matches are
    levenshtein(name_a, name_b) ≤ 2 over ALL sampled pairs (brute
    force, bounded by the fixed sample):

    - ``brand_size`` — pipeline_ops5's (p_brand, p_size) scheme.
      MEASURED on this corpus: PC ≈ 0 bps (sf0.001) / 8 bps (sf0.01)
      at RR ≈ 99.9% — the part-name vocabulary is tiny (64 distinct
      names over 2000 parts at sf0.01), so near-dup names live in
      DIFFERENT brands and brand blocking cannot see them. The
      within-block dedup editdist_name_join certifies is real; this
      audit prices what it does NOT cover (fixture honesty, same
      convention as the CUPED ρ≈0 row).
    - ``name_token`` — the standard ER key (first token of the
      matched attribute). Measured PC 6112 bps at RR 8740 bps on
      sf0.01 — the recall/pruning trade the metric exists to expose.

    100 TB: the sample is a rank-N order statistic over md5(key) —
    one corpus pass + a 300-row frame; the quadratic work is C(300,2)
    regardless of SF (the standard production ER-audit shape,
    Christen 2012 ch. 7)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    # orderBy().limit() plans as TakeOrderedAndProject — a distributed
    # top-K (review catch: the first cut used an UNPARTITIONED window
    # row_number, which funnels the whole part table through one task
    # — the exact single-partition shape the repo's plan guards exist
    # to ban). Ties impossible: p_partkey is unique in the sort key.
    ranked = (
        p.withColumn("h", F.md5(F.col("p_partkey").cast("string")))
        .orderBy("h", "p_partkey")
        .limit(_BQ_SAMPLE_N)
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    flags = (
        a.join(
            F.broadcast(b), F.col("a.p_partkey") < F.col("b.p_partkey")
        )  # bounded 300-row side: broadcast is size-safe at every SF
        .select(
            (
                (F.col("a.p_brand") == F.col("b.p_brand"))
                & (F.col("a.p_size") == F.col("b.p_size"))
            ).cast("long").alias("b_brand"),
            (
                F.split_part(F.col("a.p_name"), F.lit(" "), F.lit(1))
                == F.split_part(F.col("b.p_name"), F.lit(" "), F.lit(1))
            ).cast("long").alias("b_token"),
            (
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2
            ).cast("long").alias("is_true"),
        )
    )
    pairs = flags.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("brand_size").alias("scheme"),
                    F.col("b_brand").alias("blocked"),
                ),
                F.struct(
                    F.lit("name_token").alias("scheme"),
                    F.col("b_token").alias("blocked"),
                ),
            )
        ).alias("s"),
        "is_true",
    ).select("s.scheme", "s.blocked", "is_true")
    return (
        pairs.groupBy("scheme")
        .agg(
            F.lit(_BQ_SAMPLE_N).cast("long").alias("n_sampled"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("is_true").cast("long").alias("n_true"),
            F.sum("blocked").cast("long").alias("n_blocked"),
            F.sum(F.col("blocked") * F.col("is_true")).cast("long").alias(
                "n_true_blocked"
            ),
            F.expr(
                "CASE WHEN sum(is_true) = 0 THEN -1 "
                "ELSE sum(blocked * is_true) * 10000 div sum(is_true) END"
            ).cast("long").alias("pc_bps"),
            F.expr(
                "(count(1) - sum(blocked)) * 10000 div count(1)"
            ).cast("long").alias("rr_bps"),
        )
        .orderBy("scheme")
    )


QUERIES["blocking_quality_audit"] = blocking_quality_audit
ORACLES["blocking_quality_audit"] = f"""
    WITH ranked AS MATERIALIZED (
      SELECT p_partkey, p_name, p_brand, p_size
      FROM (
        SELECT *, row_number() OVER (
          ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey) AS pos
        FROM part
      ) WHERE pos <= {_BQ_SAMPLE_N}
    ), flags AS (
      SELECT CASE WHEN a.p_brand = b.p_brand AND a.p_size = b.p_size
                  THEN 1 ELSE 0 END AS b_brand,
             CASE WHEN split_part(a.p_name, ' ', 1)
                       = split_part(b.p_name, ' ', 1)
                  THEN 1 ELSE 0 END AS b_token,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                  THEN 1 ELSE 0 END AS is_true
      FROM ranked a JOIN ranked b ON a.p_partkey < b.p_partkey
    ), pairs AS (
      SELECT 'brand_size' AS scheme, b_brand AS blocked, is_true FROM flags
      UNION ALL
      SELECT 'name_token' AS scheme, b_token AS blocked, is_true FROM flags
    )
    SELECT scheme,
           {_BQ_SAMPLE_N}::BIGINT AS n_sampled,
           count(*)::BIGINT AS n_pairs,
           CAST(sum(is_true) AS BIGINT) AS n_true,
           CAST(sum(blocked) AS BIGINT) AS n_blocked,
           CAST(sum(blocked * is_true) AS BIGINT) AS n_true_blocked,
           CAST(CASE WHEN sum(is_true) = 0 THEN -1
                ELSE sum(blocked * is_true) * 10000 // sum(is_true) END
                AS BIGINT) AS pc_bps,
           CAST((count(*) - sum(blocked)) * 10000 // count(*) AS BIGINT)
             AS rr_bps
    FROM pairs
    GROUP BY scheme ORDER BY scheme
"""


# --- 12. Purged time-series split audit -------------------------------------------
#
# Purged K-fold with embargo (de Prado 2018 ch. 7): temporal CV where
# train rows within G days of the test interval are PURGED so label
# leakage across the boundary can't inflate eval metrics — the split
# a forecasting pipeline (ses/holt/seasonal backtests above) should
# be evaluated under. Folds = order years (the fixture's natural
# bounded fold key); embargo pinned.

_PURGE_EMBARGO_DAYS = 30


def purged_time_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold audit of the purged year-fold split on orders: each
    fold's test set is its year, train is everything ≥ G days outside
    the year's [min, max] test-date envelope, purged is the embargo
    band. Output: sizes + the measured min train-to-test-envelope gap
    (in days) — both engines compute it, and the guard test asserts
    it is ≥ G everywhere (leakage-freedom as a measured value, not a
    promise).

    100 TB: folds are a ≤|years|-row broadcast; the classify pass is
    one corpus scan per K (inherent to K-fold — every fold's train
    set is distinct); per-fold aggregates shuffle |folds| rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    folds = (
        o.groupBy(F.col("yr").alias("fold_year"))
        .agg(F.min("d").alias("t_lo"), F.max("d").alias("t_hi"))
    )
    g = F.lit(_PURGE_EMBARGO_DAYS)
    labeled = o.crossJoin(F.broadcast(folds)).select(
        "fold_year",
        F.when(F.col("yr") == F.col("fold_year"), F.lit("test"))
        .when(
            (F.datediff(F.col("t_lo"), F.col("d")) >= g)
            | (F.datediff(F.col("d"), F.col("t_hi")) >= g),
            F.lit("train"),
        )
        .otherwise(F.lit("purged"))
        .alias("role"),
        F.greatest(
            F.datediff(F.col("t_lo"), F.col("d")),
            F.datediff(F.col("d"), F.col("t_hi")),
        ).alias("gap_days"),
    )
    return (
        labeled.groupBy("fold_year")
        .agg(
            F.sum((F.col("role") == "test").cast("long")).cast("long").alias("n_test"),
            F.sum((F.col("role") == "train").cast("long")).cast("long").alias("n_train"),
            F.sum((F.col("role") == "purged").cast("long")).cast("long").alias("n_purged"),
            F.min(
                F.when(F.col("role") == "train", F.col("gap_days"))
            ).cast("long").alias("min_train_gap_days"),
        )
        .orderBy("fold_year")
    )


QUERIES["purged_time_split_audit"] = purged_time_split_audit
ORACLES["purged_time_split_audit"] = f"""
    WITH o AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(year(o_orderdate) AS INTEGER) AS yr
      FROM orders
    ), folds AS (
      SELECT yr AS fold_year, min(d) AS t_lo, max(d) AS t_hi
      FROM o GROUP BY yr
    ), labeled AS (
      SELECT f.fold_year,
             CASE WHEN o.yr = f.fold_year THEN 'test'
                  WHEN datediff('day', o.d, f.t_lo) >= {_PURGE_EMBARGO_DAYS}
                    OR datediff('day', f.t_hi, o.d) >= {_PURGE_EMBARGO_DAYS}
                  THEN 'train' ELSE 'purged' END AS role,
             greatest(datediff('day', o.d, f.t_lo),
                      datediff('day', f.t_hi, o.d)) AS gap_days
      FROM o CROSS JOIN folds f
    )
    SELECT fold_year,
           CAST(sum(CASE WHEN role = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN role = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN role = 'purged' THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(min(CASE WHEN role = 'train' THEN gap_days END) AS BIGINT)
             AS min_train_gap_days
    FROM labeled
    GROUP BY fold_year ORDER BY fold_year
"""


# --- 13. Snapshot-expiry lifecycle (COW compaction + retention) -------------------
#
# Completes the manifest store's lifecycle: write → append → MOR
# delete → COPY-ON-WRITE compaction (new snapshot, old files stay —
# unlike the in-place compact_with_manifest, history survives) →
# expire_snapshots (drop old snapshots, unlink files only they
# reference) — the Iceberg rewrite_data_files + expire_snapshots
# loop. The oracle certifies the CURRENT view is unchanged through
# the whole lifecycle; the guard test pins the disk effects (old
# files gone, expired time travel raises, idempotence).


def manifest_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders through the full retention lifecycle: v0 = even
    orderkeys, v1 = append odd, v2 = MOR-delete keys ≡ 0 (mod 97),
    v3 = copy-on-write compaction, then expire to keep_last=1. The
    returned rollup reads the post-expiry table; the oracle computes
    the same rollup from the base table minus the deleted keys — a
    hash match certifies deletes were absorbed (not resurrected) by
    the COW rewrite AND that expiry removed no live data.

    100 TB: every step is O(its own change) — the delete commit is
    O(deleted keys), the COW rewrite is one pass of the CURRENT view
    (the price of physical absorption, paid once per retention
    window), expiry is manifest set-algebra + unlinks."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.sinks.compact import compact_copy_on_write
    from etl_extractor_spark.sinks.manifest import (
        expire_snapshots,
        read_merge_on_read,
        write_equality_deletes,
        write_with_manifest,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        _CENTS("o_totalprice").alias("cents"),
        "o_orderstatus",
    ).persist()
    path = pid_scratch_dir("spark_graft_snap_expiry_")
    shutil.rmtree(path, ignore_errors=True)
    write_with_manifest(
        spark, o.filter(F.col("o_orderkey") % 2 == 0), path, ["o_orderkey"]
    )
    write_with_manifest(
        spark,
        o.filter(F.col("o_orderkey") % 2 == 1),
        path,
        ["o_orderkey"],
        mode="append",
    )
    write_equality_deletes(
        spark,
        path,
        o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
    )
    compact_copy_on_write(spark, path)
    expire_snapshots(path, keep_last=1)
    cur = read_merge_on_read(spark, path)
    return (
        cur.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("status")
    )


QUERIES["manifest_snapshot_expiry"] = manifest_snapshot_expiry
ORACLES["manifest_snapshot_expiry"] = """
    SELECT o_orderstatus AS status,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    WHERE o_orderkey % 97 <> 0
    GROUP BY 1 ORDER BY status
"""


# --- 14. Bucket-pruned point lookup ------------------------------------------------
#
# The read-side payoff of bucketing that bucketed_join_colocated's
# join shape doesn't show: an equality predicate on the bucket column
# lets Spark's FileSourceStrategy plan ONLY the matching bucket
# (SelectedBucketsCount: 1 out of N in the scan node — plan-guarded
# in tests). The B-tree-index lookup analog for the reference's
# staging-index DDL (reference load_to_staging.py:7-16), at lake
# scale: a point read touches 1/N of the files with zero index
# maintenance.


_BPL_BUCKETS = 16


_BPL_SCAN_CONF = "spark.sql.sources.bucketing.autoBucketedScan.enabled"


def _bucket_lookup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy pruned-lookup plan: write the bucketed table, probe the
    key (bounded ONE-scalar collect — bucket pruning happens at PLAN
    time, so the key must be a literal in the filter; a broadcast-
    join key would read every bucket), return the filtered rollup.
    Callers must have _BPL_SCAN_CONF = false while the plan is
    OPTIMIZED (i.e. at action time), else Spark drops to a plain
    scan — with autoBucketedScan on (default) it disables bucketed
    reads when no exchange is avoided, and pruning only applies to
    bucketed scans (measured: "Bucketed: false (disabled by query
    planner)", zero pruning)."""
    from etl_extractor_spark.operators.bucketing import write_bucketed
    from etl_extractor_spark.operators.common import pid_scratch_dir

    base = pid_scratch_dir("spark_graft_bpl_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS graft_bpl LOCATION '{base}'")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", _CENTS("o_totalprice").alias("cents")
    )
    write_bucketed(o, "graft_bpl.orders_pt", "o_custkey", _BPL_BUCKETS)
    key = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 7 == 0)
        .agg(F.max("o_custkey"))
        .collect()[0][0]
    )
    t = spark.table("graft_bpl.orders_pt")
    return (
        t.filter(F.col("o_custkey") == F.lit(int(key)))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("spend_cents"),
        )
        .orderBy("priority")
    )


def bucket_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order profile of ONE customer read from a table
    bucketed on o_custkey: the scan plans only the key's bucket
    (SelectedBucketsCount 1/_BPL_BUCKETS, plan-guarded in tests via
    _bucket_lookup_df). The probed key is the largest custkey ≡ 0
    (mod 7) — data-derived but deterministic on both engines. The
    pruned plan EXECUTES inside this call (materialized to scratch)
    while the scan conf is flipped, and the conf is restored before
    returning — a registered query must not leave session-wide plan
    state behind (review catch: the first cut left autoBucketedScan
    off for the session, making every later bucketed query's plan
    depend on bench execution order). Oracle = the same profile from
    the base table."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir

    prev = spark.conf.get(_BPL_SCAN_CONF, "true")
    out = pid_scratch_dir("spark_graft_bpl_result_")
    shutil.rmtree(out, ignore_errors=True)
    spark.conf.set(_BPL_SCAN_CONF, "false")
    try:
        _bucket_lookup_df(spark, sf_dir).write.mode("overwrite").parquet(out)
    finally:
        spark.conf.set(_BPL_SCAN_CONF, prev)
    return spark.read.parquet(out).orderBy("priority")


QUERIES["bucket_pruned_lookup"] = bucket_pruned_lookup
ORACLES["bucket_pruned_lookup"] = """
    WITH k AS (
      SELECT max(o_custkey) AS k FROM orders WHERE o_custkey % 7 = 0
    )
    SELECT o_orderpriority AS priority,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS spend_cents
    FROM orders, k
    WHERE o_custkey = k.k
    GROUP BY 1 ORDER BY priority
"""


# --- 15. Positional deletes (merge-on-read, physical row coordinates) -------------
#
# The second Iceberg delete-file kind: EQUALITY deletes (ops5/ops6
# lifecycle) subtract by key value; POSITIONAL deletes subtract ONE
# physical row — (file, row_index) — which is the only way to remove
# a specific member of a set of duplicate rows without rewriting the
# file. Readers attach Spark's _metadata.file_name / row_index at
# scan time and anti-join the coordinates (guard test pins the
# duplicate-row semantic equality deletes cannot express).


def positional_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders through a positional-delete commit: positions are
    DERIVED from a deterministic predicate (o_orderkey ≡ 0 mod 97 —
    scan once with metadata columns, project the coordinates), then
    committed as a positional delete file and read back through the
    MOR reader. The oracle filters the base table by the same
    predicate — a hash match certifies the coordinate derivation, the
    delete commit, and the coordinate anti-join end to end (position
    arithmetic has no SQL-visible form, so the predicate bridge is
    what makes the machinery oracle-checkable).

    100 TB: the commit is O(deleted rows); the read pays one
    broadcast anti-join on (file, pos) until a compaction absorbs it
    (compact_copy_on_write reads through this same MOR path, so
    positional deletes are absorbed exactly like equality ones)."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.sinks.manifest import (
        _with_pos_meta,
        read_merge_on_read,
        write_positional_deletes,
        write_with_manifest,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        _CENTS("o_totalprice").alias("cents"),
        "o_orderstatus",
    )
    path = pid_scratch_dir("spark_graft_posdel_")
    shutil.rmtree(path, ignore_errors=True)
    write_with_manifest(spark, o, path, ["o_orderkey"])
    pos = (
        _with_pos_meta(spark.read.parquet(path))
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("_pd_file").alias("file_name"),
            F.col("_pd_pos").alias("pos"),
        )
    )
    write_positional_deletes(spark, path, pos)
    cur = read_merge_on_read(spark, path)
    return (
        cur.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("status")
    )


QUERIES["positional_delete_scan"] = positional_delete_scan
ORACLES["positional_delete_scan"] = """
    SELECT o_orderstatus AS status,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    WHERE o_orderkey % 97 <> 0
    GROUP BY 1 ORDER BY status
"""


def _register_defer() -> None:
    """Foot-of-module hook: rank this module's names as pseudo-round-2
    stale (see module docstring). Must run AFTER every QUERIES[...]
    binding."""
    from etl_extractor_spark.plans import registry as _registry

    _registry._DEFER_RANK.update({k: 2 for k in QUERIES})


_register_defer()
