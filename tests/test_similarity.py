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
