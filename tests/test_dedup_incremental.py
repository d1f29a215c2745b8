"""Incremental MinHash index: per-batch pairs accumulate to exactly
the one-shot batch result; replays are no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_extractor_spark.operators.dedup import minhash_lsh_pairs
from etl_extractor_spark.operators.dedup_incremental import (
    index_stats,
    ingest_batch,
)
from etl_extractor_spark.sources.parquet import load_table


def _pairset(df):
    return {
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_incremental_ingest_equals_one_shot(spark, docs, tmp_path):
    index = str(tmp_path / "idx")
    b0 = docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
    b1 = docs.filter(F.pmod("doc_id", F.lit(3)) == 1)
    b2 = docs.filter(F.pmod("doc_id", F.lit(3)) == 2)

    got = set()
    for i, b in enumerate([b0, b1, b2]):
        got |= _pairset(
            ingest_batch(spark, index, b, "doc_id", "text", batch_id=i)
        )

    want = _pairset(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert got == want and len(want) > 0

    stats = index_stats(spark, index)
    # every doc long enough to shingle is indexed
    assert stats["docs"] == docs.filter(F.length("text") >= 30).count()
    assert stats["last_batch"] == 2


def test_replay_is_noop(spark, docs, tmp_path):
    index = str(tmp_path / "idx2")
    b0 = docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
    first = ingest_batch(spark, index, b0, "doc_id", "text", batch_id=0)
    n_docs = index_stats(spark, index)["docs"]
    assert first.count() >= 0
    replay = ingest_batch(spark, index, b0, "doc_id", "text", batch_id=0)
    assert replay.count() == 0
    assert index_stats(spark, index)["docs"] == n_docs  # no double-index


def test_streaming_minhash_dedup_matches_batch(spark, docs, tmp_path):
    """Documents streamed file-by-file through the index accumulate the
    same pair set as the one-shot batch operator."""
    import os

    from etl_extractor_spark.streaming import events_stream as SE

    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    index = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    n = SE.run_streaming_minhash_dedup(stream, index, ckpt)
    assert n >= 2

    got = _pairset(spark.read.parquet(os.path.join(index, "pairs")).drop("batch_id"))
    want = _pairset(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert got == want and len(want) > 0
