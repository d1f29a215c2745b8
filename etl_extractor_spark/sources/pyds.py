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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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

    def writer(self, schema, overwrite: bool) -> "EnvelopeJsonWriter":
        return EnvelopeJsonWriter(schema, dict(self.options), overwrite)

    def simpleStreamReader(self, schema) -> "EnvelopeJsonStreamReader":
        return EnvelopeJsonStreamReader(schema, dict(self.options))

    def streamWriter(self, schema, overwrite: bool) -> "EnvelopeJsonStreamWriter":
        return EnvelopeJsonStreamWriter(schema, dict(self.options))


class EnvelopeJsonReader(DataSourceReader):
    def __init__(self, schema, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("envelope_json requires .option('path', <dir or glob>)")
        self._fields = [f.name for f in schema.fields]
        self._pattern = (
            os.path.join(path, "*.json") if os.path.isdir(path) else path
        )
        self._pushed: list = []  # filters this scan evaluates itself

    def pushFilters(self, filters):
        """Filter pushdown (Spark 4.1 Python Data Source API): consume
        the comparison shapes the scan can evaluate on the flattened
        record — rows are dropped INSIDE the per-file read, so Spark
        never materializes them — and hand everything else back for
        post-scan evaluation. At 100 TB this is the difference between
        shipping a source's full API dump through the scan and shipping
        the selected slice."""
        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            IsNotNull,
        )
        for f in filters:
            # only top-level (possibly dotted) attributes: path len 1
            if isinstance(f, supported) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f

    @staticmethod
    def _keep(f, row: dict) -> bool:
        v = row.get(f.attribute[0])
        if isinstance(f, IsNotNull):
            return v is not None
        if v is None:
            return False  # comparisons with null are never true
        if isinstance(f, EqualTo):
            return v == f.value
        if isinstance(f, GreaterThan):
            return v > f.value
        if isinstance(f, GreaterThanOrEqual):
            return v >= f.value
        if isinstance(f, LessThan):
            return v < f.value
        return v <= f.value  # LessThanOrEqual

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
            if all(self._keep(f, flat) for f in self._pushed):
                yield tuple(flat.get(name) for name in self._fields)


def _unflatten(rec: dict) -> dict:
    """Inverse of json_api._flatten: dotted keys back to nested dicts."""
    out: dict = {}
    for k, v in rec.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


class _EnvelopeCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int) -> None:
        self.path = path
        self.n = n


class EnvelopeJsonWriter(DataSourceWriter):
    """K-side of the envelope contract: each task writes its partition
    as ONE ``{"data": [...]}`` file (dotted columns re-nested, the
    exact inverse of the read path), so a directory written here is
    readable by ``EnvelopeJsonReader`` — and by the reference's own API
    consumers. Tasks write HIDDEN temp files (a retried or speculative
    task attempt must never leave a reader-visible orphan — only
    successful tasks' messages reach ``commit``); ``commit`` renames
    them to their final ``part-<seq>.json`` names and seals the
    directory with a ``_SUCCESS`` manifest listing files + row counts;
    ``abort`` removes the temps — the usual job-commit protocol, in
    ~40 lines of Python."""

    def __init__(self, schema, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("envelope_json requires .option('path', <dir>)")
        self._dir = path
        self._fields = [f.name for f in schema.fields]
        # Driver-side (runs before any task): overwrite clears prior data
        if overwrite and os.path.isdir(path):
            for f in glob.glob(os.path.join(path, "*.json")):
                os.remove(f)
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _EnvelopeCommit:
        import uuid

        path = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}")
        recs = [
            _unflatten({f: v for f, v in zip(self._fields, row)})
            for row in iterator
        ]
        with open(path, "w", encoding="utf-8") as fh:
            json.dump({"data": recs}, fh)
        return _EnvelopeCommit(path, len(recs))

    def commit(self, messages) -> None:
        manifest = {}
        for seq, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self._dir, f"part-{seq:05d}.json")
            os.replace(m.path, final)
            manifest[final] = m.n
        with open(os.path.join(self._dir, "_SUCCESS"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class EnvelopeJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the envelope reader: tails a directory of
    envelope files as a Structured Streaming source.

    Offset contract: files arrive under MONOTONICALLY INCREASING names
    (the writer's ``part-...`` names and any timestamped API dump
    satisfy this); the offset is just ``{"last": <max name read>}`` —
    O(1) state no matter how many files have ever arrived, unlike a
    seen-set offset which grows without bound on a long-lived stream.
    ``read(start)`` picks up every file lexicographically after
    ``last``; ``readBetweenOffsets`` replays a (start, end] window
    deterministically for recovery, which is exactly the exactly-once
    contract Structured Streaming asks of a source."""

    def __init__(self, schema, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("envelope_json requires .option('path', <dir>)")
        self._dir = path
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files_after(self, last: str, upto: str | None = None) -> list[str]:
        names = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(self._dir, "*.json"))
        )
        return [n for n in names if n > last and (upto is None or n <= upto)]

    def _rows(self, names: list[str]):
        for name in names:
            try:
                with open(os.path.join(self._dir, name), encoding="utf-8") as fh:
                    payload = json.load(fh)
            except (OSError, ValueError):
                continue  # bad file: skipped, reference error contract
            for rec in _unwrap_envelope(payload):
                flat = _flatten(rec)
                yield tuple(flat.get(f) for f in self._fields)

    def read(self, start: dict):
        # iter over a materialized list: the SimpleStream runner calls
        # next() (needs an iterator) AND pickles the prefetched rows
        # into its offset cache (generators don't pickle)
        new = self._files_after(start.get("last", ""))
        if not new:
            return iter([]), start
        return iter(list(self._rows(new))), {"last": new[-1]}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(
            self._rows(self._files_after(start.get("last", ""), end.get("last", "")))
        )


class EnvelopeJsonStreamWriter(DataSourceStreamWriter):
    """Streaming sink: tasks write their partition to hidden temp files
    (invisible to the ``*.json`` readers); ``commit(messages, batchId)``
    renames them to ``batch-<batchId>-<seq>.json`` — a replayed batch
    re-commits to the SAME names, so recovery overwrites instead of
    duplicating (exactly-once on a rename-atomic shared filesystem; on
    an object store you would seal via manifest like the batch writer's
    ``_SUCCESS``). ``abort`` removes the temps — a failed batch leaves
    no torn output."""

    def __init__(self, schema, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("envelope_json requires .option('path', <dir>)")
        self._dir = path
        self._fields = [f.name for f in schema.fields]
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _EnvelopeCommit:
        import uuid

        path = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}")
        recs = [
            _unflatten({f: v for f, v in zip(self._fields, row)}) for row in iterator
        ]
        with open(path, "w", encoding="utf-8") as fh:
            json.dump({"data": recs}, fh)
        return _EnvelopeCommit(path, len(recs))

    def commit(self, messages, batchId: int) -> None:
        for seq, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self._dir, f"batch-{batchId:08d}-{seq:05d}.json")
            os.replace(m.path, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine).
    Python-source filter pushdown ships behind a flag in Spark 4.1;
    a reader that implements pushFilters() FAILS when the flag is off,
    so registration flips it for this session (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EnvelopeJsonDataSource)
