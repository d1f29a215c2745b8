"""Incremental IVF index: ingestion without refit, probe-limited
search with bounded recall against exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_extractor_spark.operators.similarity import topk_cosine
from etl_extractor_spark.operators.similarity_incremental import (
    build_ivf_index,
    ingest_vectors,
    query_topk,
)
from etl_extractor_spark.sources.parquet import load_table

K = 5
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    build = emb.filter(F.col("vec_id") % 2 == 0)
    arrival = emb.filter(F.col("vec_id") % 2 == 1)
    stats = build_ivf_index(spark, path, build, n_clusters=N_CLUSTERS)
    assert stats["vectors"] == build.count()
    n = ingest_vectors(spark, path, arrival, batch_id=0)
    assert n == arrival.count()
    return path


def test_ingest_replay_is_noop(spark, emb, index):
    again = ingest_vectors(
        spark, index, emb.filter(F.col("vec_id") % 2 == 1), batch_id=0
    )
    assert again == 0
    total = spark.read.parquet(index + "/vectors").count()
    assert total == emb.count()  # every vector indexed exactly once


def test_probe_limited_search_recall(spark, emb, index):
    """nprobe=2 of 8 buckets: each query scores ~25% of the corpus yet
    keeps most true neighbors; full probing is exact."""
    qpred = F.col("vec_id") < 10
    queries = emb.filter(qpred)
    exact = topk_cosine(emb, queries, k=K)
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }

    approx = query_topk(spark, index, queries, k=K, nprobe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, recall  # 2/8 buckets probed

    full = query_topk(spark, index, queries, k=K, nprobe=N_CLUSTERS)
    got_full = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert got_full == truth  # probing everything degrades to exact
