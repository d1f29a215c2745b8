"""Additional file-format sources/sinks: ORC, JSON-lines, raw text.

The reference's source surface is CSV + SQL + REST-JSON (SURVEY §2.1).
A warehouse ingests whatever lands; these round out the format matrix
with the readers Spark ships natively (no extra packages in this
container — avro would need spark-avro and is gated out):

- ORC: the other splittable columnar format; same pushdown/pruning
  properties as parquet, common in Hive-lineage estates.
- JSON-lines: one JSON object per line — splittable (unlike a single
  JSON array document), the standard log/ML-corpus interchange format.
  Schema is inferred by sampling unless pinned; always pin in
  production (inference is a full extra pass over the data at scale —
  ``samplingRatio`` bounds it).
- text: one row per line (``value`` column) — the raw-corpus entry
  point for the text-analysis operators.

All readers return plain DataFrames; everything downstream (dedup,
quality, dedup, star schema) is format-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """JSON-lines read. With no schema, inference costs an extra pass
    over ``sampling_ratio`` of the data — pin the schema at scale.
    Malformed lines go to PERMISSIVE-mode nulls rather than failing the
    job (coerce-don't-fail, reference api_extractor.py:12-28 parity)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("samplingRatio", sampling_ratio)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """One row per line (or per file with ``whole_file``) in a
    ``value`` string column."""
    return spark.read.option("wholetext", whole_file).text(path)
