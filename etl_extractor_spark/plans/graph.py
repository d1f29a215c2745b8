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
