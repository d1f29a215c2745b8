"""Graph analytics operators: join-based iterative PageRank.

Complements the dedup clustering components (large-star/small-star in
``operators/dedup.py``) with a rank-propagation shape: each iteration
is ONE co-partitioned join (rank ⋈ edges on src) plus ONE aggregation
(sum of contributions by dst) — the canonical Pregel-as-joins
formulation that scales to 100 TB edge lists without any driver-side
state. No analog exists in the 828-LoC pandas reference; this extends
the engine's training-data surface (graph-signal quality weighting à
la page-level PageRank features in web-corpus curation).

Determinism contract: ranks live in integer micro-units and every
division is integer floor division, so results are bit-exact across
engines, partitionings, and cluster sizes — float PageRank would
accumulate summation-order noise and could not be oracle-checked.

Scale notes: the per-iteration join is on the edge src key; with the
edge list bucketed by src the rank exchange is the only shuffle per
round. Lineage is cut with a reliable ``checkpoint(eager=True)`` each round
(without it Catalyst re-optimization cost doubles per iteration —
measured in the connected-components work, see operators/dedup.py).
Iteration count is bounded and explicit: PageRank's use here is a
quality FEATURE, not an exact eigenvector — 3 damped rounds already
separate hubs from leaves, matching how corpus pipelines use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_extractor_spark.operators.checkpoints import reliable_checkpoint


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> DataFrame:
    """Damped PageRank over a directed edge list (columns ``src``,
    ``dst``; pre-deduplicated) in integer micro-units.

    Per round: contribution = rank DIV out_degree per out-edge;
    new rank = (1-d)·unit + (d·Σ contributions) DIV 100. Nodes with no
    in-edges keep the base term via the left join. Returns
    (node, rank_micro)."""
    # Materialize the edge list ONCE, with the out-degree already on
    # each edge row (one src-partitioned window during the checkpoint
    # build — no per-round deg join; r11 guide §2.4/§3). The node
    # frame is checkpointed too: the loop's base-term left join
    # references it every round.
    from pyspark.sql import Window

    edges = reliable_checkpoint(
        edges.withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
    )
    nodes = reliable_checkpoint(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = unit * (100 - damping_pct) // 100
    r = nodes.select("node", F.lit(unit).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        contrib = edges.join(r, edges["src"] == r["node"]).select(
            F.col("dst").alias("node"),
            F.expr("rank_micro DIV deg").alias("c"),
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = nodes.join(s, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) DIV 100")
            )
            .cast("long")
            .alias("rank_micro"),
        )
        # No per-round checkpoint (r11): each round references the
        # previous rank frame exactly once and both loop-invariant
        # frames are checkpointed leaves, so lineage is LINEAR in the
        # bounded iteration count — the exponential-reoptimization
        # hazard applied to multi-reference rounds. The whole rank
        # iteration is one plan/one job; identical per-round edge and
        # node exchanges dedup via ReusedExchange.
    return r
