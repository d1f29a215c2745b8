"""Graph-analytics queries over the purchase graph.

The bipartite customer↔supplier graph is derived from orders ⋈
lineitem (an edge per DISTINCT trading pair, both directions so
neither side is a dead-end sink). Two queries:

- ``pagerank_purchase_graph``: 3 damped rounds of the integer-exact
  join-iterated PageRank (operators/graph.py), top-25 hubs. The
  oracle UNROLLS the same three rounds as CTEs — every contribution
  floor-division and damping step is recomputed by DuckDB, so a hash
  match certifies the whole iteration chain, not just the final sort.
- ``purchase_graph_degrees``: degree-distribution profile per node
  type — the graph-shape sanity check (skew detection: a power-law
  head here predicts hot keys in the iteration joins).

100 TB: the edge list build is the usual pushed-down join; each
PageRank round is one src-keyed join + one dst-keyed aggregation
(bucket the edge list by src to make the rank exchange the only
shuffle). Integer ranks are summation-order-independent — the same
number on 1 executor or 1000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.operators.graph import pagerank_integer
from etl_extractor_spark.sources.parquet import load_table

PR_ITER = 3
PR_TOPN = 25


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = pagerank_integer(_purchase_edges(spark, sf_dir), iterations=PR_ITER)
    w = Window.orderBy(F.desc("rank_micro"), F.asc("node"))
    return (
        r.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= PR_TOPN)
        .select(
            "node",
            F.substring("node", 1, 1).alias("node_type"),
            "rank_micro",
            "pos",
        )
    )


_EDGES_SQL = """
e0 AS (
  SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c,
                  'S' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM e0
  UNION ALL
  SELECT s AS src, c AS dst FROM e0
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY 1
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
)"""


def _pagerank_sql() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITER + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r.rank_micro // d.deg) AS s
  FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY 1
), r{i} AS (
  SELECT n.node,
         CAST(150000 + (85 * coalesce(c{i}.s, 0)) // 100 AS BIGINT) AS rank_micro
  FROM nodes n LEFT JOIN c{i} USING (node)
)"""
        )
        prev = f"r{i}"
    return (
        "WITH "
        + _EDGES_SQL.lstrip()
        + """, r0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes
), """
        + ", ".join(rounds)
        + f"""
SELECT node, substr(node, 1, 1) AS node_type, rank_micro,
       CAST(row_number() OVER (ORDER BY rank_micro DESC, node ASC) AS BIGINT) AS pos
FROM {prev} QUALIFY pos <= {PR_TOPN}
"""
    )


def purchase_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _purchase_edges(spark, sf_dir)
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy(F.substring("src", 1, 1).alias("node_type"), "deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


DEGREES_SQL = (
    "WITH "
    + _EDGES_SQL.lstrip()
    + """
SELECT substr(src, 1, 1) AS node_type, deg, count(*) AS n_nodes
FROM deg GROUP BY 1, 2
"""
)

QUERIES = {
    "pagerank_purchase_graph": pagerank_purchase_graph,
    "purchase_graph_degrees": purchase_graph_degrees,
}

ORACLES = {
    "pagerank_purchase_graph": _pagerank_sql(),
    "purchase_graph_degrees": DEGREES_SQL,
}


def triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part co-purchase graph (parts
    ordered together in at least one order). Triangles are the basic
    community/cohesion signal — clustering coefficients, spam-graph
    detection, and feature engineering all start here.

    Scale path: DEGREE-ORDERED ORIENTATION (Schank-Wagner; MapReduce
    formulation Suri & Vassilvitskii WWW'11). Each undirected edge is
    oriented from the lower-(degree, id) endpoint to the higher, so
    every triangle is counted from exactly one wedge and the wedge
    self-join materializes sum(out_deg^2) pairs with out-degree
    bounded by O(sqrt(m)) — the hub that would explode a naive wedge
    join has huge IN-degree but small OUT-degree. The closing-edge
    probe is a semi-equi-join on (v, w). The oracle counts the same
    triangles with the naive a<b<c 3-way join — identical sets, so a
    hash match certifies the orientation trick is lossless.

    Orientation keys are packed as ``deg * 2^32 + node`` (single
    BIGINT compare in the join condition; part keys stay < 2^32 far
    past SF 1000) — no global row_number ranking, nothing driver-side.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("n", (F.col("deg") * F.lit(1 << 32) + F.col("n")).alias("rk"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    keyed = (
        und.join(du, F.col("u") == F.col("du.n"))
        .join(dv, F.col("v") == F.col("dv.n"))
        .select("u", "v", F.col("du.rk").alias("rku"), F.col("dv.rk").alias("rkv"))
    )
    o = keyed.select(
        F.when(F.col("rku") < F.col("rkv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("rku") < F.col("rkv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.least("rku", "rkv").alias("rks"),
        F.greatest("rku", "rkv").alias("rkd"),
    )
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.rkd") < F.col("e2.rkd")),
    ).select(
        F.col("e1.src").alias("x"),
        F.col("e1.dst").alias("y"),
        F.col("e2.dst").alias("z"),
    )
    tri = wedges.join(
        e3,
        (F.col("y") == F.col("e3.src")) & (F.col("z") == F.col("e3.dst")),
        "semi",
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("p_partkey"))
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


TRIANGLE_SQL = """
WITH pe AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM pe e1
  JOIN pe e2 ON e1.v = e2.u
  JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT x AS p FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT p AS p_partkey, count(*) AS n_tri FROM nodes GROUP BY 1
"""

QUERIES["triangle_participation"] = triangle_participation
ORACLES["triangle_participation"] = TRIANGLE_SQL
