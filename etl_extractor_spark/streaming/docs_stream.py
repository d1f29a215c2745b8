"""Structured Streaming over the documents table: the crawl-frontier
URL dedup twin.

A crawler's frontier is exactly this shape at 100 TB: an unbounded
stream of fetched pages whose URLs must be canonicalized and
deduplicated INCREMENTALLY — the batch formulation
(``plans/web_curation.py::url_canonical_dedup``) re-expressed as a
streaming aggregation, sharing the same canonicalization Column
expressions so the two paths cannot drift. The per-canonical-URL
(min doc_id, count) state is a streaming agg keyed on the canonical
string; on a real frontier the key-space is bounded by retention, or
the aggregation runs in update mode into a keyed store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.plans.web_curation import _raw_url, canonicalize_url


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over documents.parquet (schema probed from a
    batch read; glob path so the file source gets a directory
    basePath, same trick as events_stream)."""
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return spark.readStream.schema(schema).parquet(f"{sf_dir}/documents.[p]arquet")


def streaming_url_frontier(stream: DataFrame) -> DataFrame:
    """Incremental canonical-URL dedup state: per canonical URL the
    first-seen doc_id and the duplicate count — identical output to
    the batch ``url_canonical_dedup`` under complete mode."""
    urls = stream.select(
        "doc_id",
        canonicalize_url(_raw_url(F.col("doc_id"), F.col("source"))).alias(
            "canonical_url"
        ),
    )
    return urls.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )
