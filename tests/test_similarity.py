"""ANN variants vs the exact brute force: precision is exact within
probed buckets, recall is bounded below."""

from __future__ import annotations

from etl_extractor_spark.plans.similarity import knn_ivf_kmeans, knn_topk_cosine


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_kmeans_recall_vs_bruteforce(spark, sf_dir):
    exact = _neighbors(knn_topk_cosine(spark, sf_dir))
    approx = _neighbors(knn_ivf_kmeans(spark, sf_dir))
    assert set(approx) == set(exact)  # every query answered
    recalls = [
        len(approx[q] & exact[q]) / len(exact[q]) for q in exact
    ]
    avg_recall = sum(recalls) / len(recalls)
    # single-probe IVF over random vectors: recall well above random
    # chance (5/500) but below 1.0 by construction
    assert avg_recall >= 0.2, f"avg recall {avg_recall:.2f} suspiciously low"
    for q, ns in approx.items():
        assert len(ns) <= 5


def test_int8_quantization_preserves_cosine(spark, sf_dir):
    """int8 symmetric quantization must be nearly lossless for
    similarity work: cosine(dequantized, original) >= 0.995 for every
    vector (the property that justifies shipping int8 codes to the ANN
    index instead of float32)."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.sources.parquet import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    deq = F.transform(
        "v",
        lambda x: F.floor(x / F.col("_s") + F.lit(0.5)) * F.col("_s"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    worst = (
        e.withColumn("_s", scale)
        .withColumn("_d", deq)
        .select(
            (
                dot(F.col("v"), F.col("_d"))
                / F.sqrt(dot(F.col("v"), F.col("v")) * dot(F.col("_d"), F.col("_d")))
            ).alias("cos")
        )
        .agg(F.min("cos"))
        .first()[0]
    )
    assert worst >= 0.995, worst
