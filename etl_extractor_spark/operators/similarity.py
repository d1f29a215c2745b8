"""Similarity search over embedding columns (array<float>).

Operators:
- cosine topk, brute force: broadcast the (small) query set against the
  corpus — a broadcast nested-loop join; each corpus partition scores
  its rows against every query independently (no shuffle of the corpus),
  then a per-query top-k via windowed rank over only the scored pairs.
  At 100 TB this is the exact-scoring baseline you run on a sampled or
  pre-filtered candidate set.
- IVF-style blocked search: restrict scoring to a coarse partition (the
  ``label`` column here stands in for an IVF cluster assignment) —
  score only same-block pairs; the shuffle is on the block key.
- random-hyperplane LSH (SimHash for vectors): 16-bit signatures from
  FIXED literal hyperplanes (seeded numpy, embedded as constants in the
  plan AND in the DuckDB oracle, so the approximate path still has an
  exact oracle); bucket-equality join generates candidates.

All dot products are Catalyst ``aggregate``/``zip_with`` expressions on
double — JVM-side, no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
EMB_DIM = 64
_rng = np.random.default_rng(42)
PLANES: list[list[float]] = _rng.standard_normal((N_PLANES, EMB_DIM)).tolist()


def as_double(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
        )
    )
    from etl_extractor_spark.operators.common import fan_out

    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos_sim"), "rank")
    )


def topk_cosine_np(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched numpy (mapInPandas) — the
    vectorized form of ``topk_cosine`` for when the scoring loop is the
    bottleneck: one B×D slab multiply per (batch, query) instead of
    per-row HOF expression evaluation, ~memory-bandwidth throughput.

    Same contract and SAME bit-exact results as ``topk_cosine``: dots
    and norms are computed as SEQUENTIAL left-to-right float64 sums
    (``np.cumsum`` along the vector axis), which reproduces the
    ``F.aggregate`` fold's operand order exactly — so both variants
    hash-match the one DuckDB oracle. (``np.dot`` would use pairwise/
    BLAS summation — up to 1 ulp off, enough to flip a round(4) at a
    .xxxx5 boundary.)

    The query set is collected to the driver and closed over (it is
    broadcast-small by contract, same as the ``F.broadcast`` in the
    expression variant); the corpus streams through executors as Arrow
    batches and never shuffles. Each batch emits only its local top-k
    per query, so the final global rank runs over
    |queries| × k × |batches| candidate rows, never the corpus.
    """
    from etl_extractor_spark.operators.common import fan_out

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [int(r[0]) for r in q_rows]
    q_mat = np.array([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    # sequential sum-of-squares, matching norm()'s fold order
    q_norm = np.sqrt(np.cumsum(q_mat * q_mat, axis=1)[:, -1])

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_nid"].to_numpy(dtype="int64")
            c_mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_vec"]],
                dtype=np.float64,
            )
            c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                prod = c_mat * q_mat[qi]
                dots = np.cumsum(prod, axis=1)[:, -1]
                cos = dots / (q_norm[qi] * c_norm)
                mask = ids != qid
                cid, cc = ids[mask], cos[mask]
                if len(cid) == 0:
                    continue
                # local top-k by (score desc, id asc); ties preserved
                order = np.lexsort((cid, -cc))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cid[order].tolist())
                out_s.extend(cc[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "_cos": out_s}
            )

    c = fan_out(corpus).select(
        F.col(id_col).alias("_nid"), F.col(vec_col).alias("_vec")
    )
    candidates = c.mapInPandas(
        score_batches, "query_id long, neighbor_id long, _cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos_sim"), "rank")
    )


def blocked_pairs_cosine(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All within-block pairs with cosine — the IVF-style scale path:
    the join key is the coarse block, so pair generation never crosses
    blocks and the shuffle is one hash partition per block."""
    from etl_extractor_spark.operators.common import fan_out

    df = fan_out(df)
    a = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        as_double(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        as_double(vec_col).alias("vb"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "block",
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("cos_raw"),
        )
    )


def lsh_signature(vec_col: Column) -> Column:
    """16-bit random-hyperplane signature as an int: bit b = 1 iff
    dot(v, plane_b) > 0. Planes are module-level literals (seed 42)."""
    sig = F.lit(0)
    for b, plane in enumerate(PLANES):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, p) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit)
    return sig


def ivf_kmeans_topk(
    df: DataFrame,
    query_pred,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF with LEARNED centroids: fit KMeans over the corpus, assign
    every vector (and query) to its nearest centroid, then brute-force
    score only within the query's cluster — the real ANN scale path
    (the ``label``-blocked variant fakes the cluster assignment; this
    one learns it).

    Recall < 1 by design (nearest neighbor may live in an adjacent
    cluster); the test bounds recall against the exact brute force.
    Not SQL-expressible → rows-only driver check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col).alias("vec_id"),
        as_double(vec_col).alias("arr"),
    ).withColumn("features", array_to_vector("arr"))
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(feats)
    assigned = model.transform(feats).select("vec_id", "arr", F.col("prediction").alias("cluster"))

    queries = assigned.filter(query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"),
        F.col("arr").alias("qv"),
        F.col("cluster").alias("qc"),
    )
    corpus = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("arr").alias("cv"),
        "cluster",
    )
    scored = (
        corpus.join(F.broadcast(queries), (F.col("cluster") == F.col("qc")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cos_sim"), "rank")
    )


def lsh_buckets(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    from etl_extractor_spark.operators.common import fan_out

    df = fan_out(df)
    return df.select(
        F.col(id_col).alias("vec_id"),
        lsh_signature(as_double(vec_col)).cast("long").alias("bucket"),
    )


def maxsim_ivf_topk(
    vectors: DataFrame,
    centroids: list,
    *,
    group: int = 8,
    qmod: int = 20,
    qvecs: int = 2,
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """Parameterized ColBERT-style MaxSim with IVF coarse pruning — the
    production-shape generalization of ``plans/similarity.
    maxsim_ivf_pruned`` (which pins 4 literal centroids for its DuckDB
    oracle). ``centroids`` is a trained coarse codebook (any k_coarse;
    the 100 TB path trains it offline on a sample and broadcasts it);
    each multi-vector group is assigned by its REPRESENTATIVE vector
    (min(vec_id) within the group) to its argmax-cosine cluster, and
    its query vectors are the ``qvecs`` smallest vec_ids — BOTH
    selections well-defined for ANY id layout, not just contiguous
    ids (where they coincide with the vec_id % group == 0 /
    % group < qvecs forms the pinned HOF reference
    ``plans/similarity.maxsim_ivf_pruned`` uses). Queries probe
    their top-``nprobe`` clusters, and late interaction runs only on
    same-cluster pairs — the interaction pair space divides by
    ~k_coarse/nprobe. Docs carry ONE cluster, so a (query, doc) pair
    joins at most once regardless of nprobe (no dedup pass needed).
    Assignment is a broadcast crossJoin against the k_coarse-row
    codebook (map-side, no shuffle); the only wide exchanges are the
    per-qvec max-reduce and the final top-k window, both keyed on
    query group. Probe harness: tools/probe_maxsim_coarse_k.py
    (measured recall/latency curve in BASELINE.md)."""
    grouped = vectors.select(
        F.expr(f"vec_id div {group}").alias("grp"),
        "vec_id",
        as_double("embedding").alias("v"),
    )
    # Coarse assignment is VECTORIZED (Arrow pandas_udf, one matmul per
    # batch against the closure-shipped codebook), not a crossJoin of
    # HOF cosine expressions: the r5 probe measured the expression form
    # at O(groups × k_coarse) interpreted evals — 57 s of the 200k-vec
    # run at k_coarse=256 was assignment, inverting the pruning win.
    # One matmul makes assignment ~free at any k_coarse, which is what
    # lets the latency curve actually FALL as the codebook grows.
    cn = np.array(centroids, dtype=np.float64)
    cn = cn / np.linalg.norm(cn, axis=1, keepdims=True)
    n_probe = min(nprobe, len(cn))

    @F.pandas_udf("array<bigint>")
    def _probe(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        # stable argsort on -sim ⇒ ties break toward the lower
        # cluster_id, matching the (desc cos, asc cluster_id) window
        idx = np.argsort(-(m @ cn.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.astype("int64")))

    from etl_extractor_spark.operators.common import fan_out as _fan

    # Representative = min(vec_id) per group (min_by: one partial-
    # aggregable pass, map-side combined). The earlier vec_id % group
    # == 0 filter silently DROPPED any group missing that exact id from
    # both join sides — correct only under a contiguous-id layout.
    reps = _fan(
        grouped.groupBy("grp").agg(F.min_by("v", "vec_id").alias("v"))
    ).select("grp", _probe("v").alias("probes"))
    doc_cl = reps.select("grp", F.element_at("probes", 1).alias("cluster_id"))
    q_cl = reps.filter(F.col("grp") % qmod == 0).select(
        F.col("grp").alias("q_grp"), F.explode("probes").alias("qc")
    )
    # fan_out BEFORE the candidate join too: doc_cl is broadcast-small,
    # so without it the interaction stage would inherit the raw file's
    # (often single) partitioning and serialize the heavy compute
    g = _fan(grouped).join(doc_cl, "grp")
    # Query vectors = the qvecs SMALLEST vec_ids within each query
    # group (rank window over the contract-small query subset), not
    # vec_id % group < qvecs — the same layout-independence fix as the
    # min_by representative: a gap layout must not silently produce
    # zero query vectors (review catch; under contiguous ids the two
    # selections coincide).
    from pyspark.sql import Window as _W

    qrank = F.row_number().over(_W.partitionBy("grp").orderBy("vec_id"))
    q = F.broadcast(
        grouped.filter(F.col("grp") % qmod == 0)
        .withColumn("qr", qrank)
        .filter(F.col("qr") <= qvecs)
        .select(
            F.col("grp").alias("q_grp"),
            F.col("vec_id").alias("q_vec"),
            F.col("v").alias("qv"),
        )
        .join(q_cl, "q_grp")
    )
    per_qvec = (
        g.join(
            q,
            (F.col("cluster_id") == F.col("qc")) & (F.col("grp") != F.col("q_grp")),
        )
        .select(
            "q_grp",
            F.col("grp").alias("d_grp"),
            "q_vec",
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
        .groupBy("q_grp", "d_grp", "q_vec")
        .agg(F.max("c").alias("best"))
    )
    scored = per_qvec.groupBy("q_grp", "d_grp").agg(F.sum("best").alias("maxsim"))
    w = Window.partitionBy("q_grp").orderBy(F.desc("maxsim"), F.asc("d_grp"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_grp").alias("query_group"),
            F.col("d_grp").alias("doc_group"),
            F.round("maxsim", 4).alias("maxsim"),
            "rank",
        )
    )
