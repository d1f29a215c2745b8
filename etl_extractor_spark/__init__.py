"""etl_extractor_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference system
(nilfredb/ETL-Extractor, surveyed in SURVEY.md) as an idiomatic Spark
engine: declarative DataFrame/SQL plans optimized by Catalyst, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, event windowing) a 100 TB deployment needs.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC)
    config      JSON settings loader / source registry config
    sources/    CSV / JDBC / JSON-API / parquet readers
    sinks/      overwrite / append / partitioned writers
    functions/  scalar Column helpers (text, dates, casts, text-stats)
    operators/  dims, facts, dedup, similarity, events, multimodal
    plans/      the query library exposed through __spark_entry__
    streaming/  Structured Streaming twins of the batch event ops
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
