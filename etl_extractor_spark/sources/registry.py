"""Config-driven source registry (S5/X4).

The reference routes sources from config/settings.json — keys ending
``_csv`` become CSV reads, plus one DB query and one API URL (reference
main.py:21-25,63-74). We keep the same config shape but resolve each
key to a reader callable returning a (lazy) DataFrame. Per-source error
isolation (X2): a failing source logs and yields an empty frame, never
aborts the pipeline.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_extractor_spark.functions.text import standardize_columns
from etl_extractor_spark.sources.csv import read_csv
from etl_extractor_spark.sources.json_api import read_json_records

log = logging.getLogger(__name__)

Reader = Callable[[SparkSession], DataFrame]


class SourceRegistry:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._readers: dict[str, Reader] = {}

    def register(self, key: str, reader: Reader) -> None:
        self._readers[key] = reader

    def register_from_config(self, cfg: dict) -> None:
        for key, value in cfg.items():
            if key.endswith("_csv"):
                name = key[: -len("_csv")]
                self._readers[name] = (
                    lambda s, path=value: read_csv(s, path)
                )
            elif key == "api_url":
                self._readers["api"] = (
                    lambda s, url=value: read_json_records(s, url)
                )
            elif key == "parquet_dir":
                from etl_extractor_spark.sources.parquet import load_tables

                for name, df in load_tables(self.spark, value).items():
                    self._readers[name] = lambda s, d=df: d

    def read_all(self) -> dict[str, DataFrame]:
        """Extract every registered source; isolate per-source failures."""
        out: dict[str, DataFrame] = {}
        for key, reader in self._readers.items():
            try:
                out[key] = standardize_columns(reader(self.spark))
            except Exception as exc:  # X2: warn + continue
                log.warning("source %s failed: %s", key, exc)
        return out
