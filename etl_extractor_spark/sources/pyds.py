"""Python Data Source API (PySpark 4) — the REST-envelope contract as
a first-class ``spark.read.format(...)`` source.

``records_to_df`` (sources/json_api.py) parallelizes a driver-fetched
payload; this module is the SCALE path for file-shaped envelope data:
a custom ``DataSource`` (pyspark.sql.datasource, new in Spark 4) whose
reader splits a directory of ``{"data": [...]}`` JSON files into one
InputPartition PER FILE, so unwrap + flatten runs in parallel Python
workers on the executors — no driver-side bottleneck, no collect.

Reference parity: extract/api_extractor.py:12-28 (envelope unwrap,
non-dict entries dropped, nested objects flattened to dotted columns —
the same `_unwrap_envelope`/`_flatten` helpers are reused, so the two
paths cannot drift).

Usage::

    spark.dataSource.register(EnvelopeJsonDataSource)
    df = (spark.read.format("envelope_json")
          .schema("id bigint, name string")   # or rely on option-free default
          .option("path", "/data/api_dump")
          .load())

At 100 TB: each file is an independent partition (the natural unit for
API-dump directories); Spark schedules them across executors like any
other scan, and the yielded-tuple iterator streams rows without
materializing a file's records list twice.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from etl_extractor_spark.sources.json_api import _flatten, _unwrap_envelope


class EnvelopeJsonDataSource(DataSource):
    """``format("envelope_json")``: directory of REST-envelope JSON files."""

    @classmethod
    def name(cls) -> str:
        return "envelope_json"

    def schema(self) -> str:
        # Default when the caller does not pass .schema(...): the
        # reference API's minimal record shape.
        return "id bigint, name string"

    def reader(self, schema) -> "EnvelopeJsonReader":
        return EnvelopeJsonReader(schema, dict(self.options))


class EnvelopeJsonReader(DataSourceReader):
    def __init__(self, schema, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("envelope_json requires .option('path', <dir or glob>)")
        self._fields = [f.name for f in schema.fields]
        self._pattern = (
            os.path.join(path, "*.json") if os.path.isdir(path) else path
        )

    def partitions(self):  # one partition per file — the split unit
        files = sorted(glob.glob(self._pattern))
        if not files:
            return [InputPartition(None)]  # empty frame, reference parity
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        # Runs on executors' Python workers; errors → empty partition
        # (reference parity: a bad API response never fails the run).
        if partition.value is None:
            return
        try:
            with open(partition.value, encoding="utf-8") as fh:
                payload = json.load(fh)
        except (OSError, ValueError):
            return
        for rec in _unwrap_envelope(payload):
            flat = _flatten(rec)
            yield tuple(flat.get(name) for name in self._fields)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(EnvelopeJsonDataSource)
