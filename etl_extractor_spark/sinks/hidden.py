"""Hidden partitioning (Iceberg's partition-transform model): the
table is physically partitioned by a DERIVED value — here
``_p_month = year*100 + month`` of a date column — but readers never
see or mention the partition column. The table records its transform
in a ``_hidden.json`` sidecar, and the range reader maps a predicate
on the SOURCE column to partition bounds itself, so every date-range
query gets directory-level pruning without the query author knowing
the layout. This is the difference from Hive-style partitioning,
where forgetting to ALSO filter on the partition column silently
scans the whole table — the classic full-scan footgun at 100 TB.

Reference provenance: the reference re-reads whole tables per run
(extract/*.py:4-28); transform-recorded pruning is what its date-
windowed loads need first at warehouse scale.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDECAR = "_hidden.json"
_PCOL = "_p_month"


def write_month_partitioned(
    spark: SparkSession, df: DataFrame, path: str, date_col: str
) -> dict:
    """Write ``df`` physically partitioned by the hidden month
    transform of ``date_col`` and record the transform in the
    sidecar. The partition column is engine-owned: callers never
    reference it."""
    part = (
        F.year(F.col(date_col)) * 100 + F.month(F.col(date_col))
    ).cast("int")
    df.withColumn(_PCOL, part).write.mode("overwrite").partitionBy(
        _PCOL
    ).parquet(path)
    meta = {"version": 1, "transform": "month", "source": date_col, "col": _PCOL}
    fd, tmp = tempfile.mkstemp(prefix=_SIDECAR + ".", dir=path)
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, _SIDECAR))
    return meta


def read_date_range(
    spark: SparkSession, path: str, lo: str, hi: str
) -> DataFrame:
    """Range scan with TRANSFORM-AWARE pruning: the caller supplies
    only the date bounds; the reader derives the partition-value
    bounds from the recorded transform and filters on the partition
    column itself — Catalyst turns that into PartitionFilters, so
    out-of-range month directories are never listed or read (plan-
    guarded). The exact date predicate still applies on the rows
    (month pruning is a superset at the boundary months)."""
    with open(os.path.join(path, _SIDECAR)) as fh:
        meta = json.load(fh)
    if meta["transform"] != "month":
        raise ValueError(f"unknown hidden transform {meta['transform']!r}")
    m_lo = int(lo[:4]) * 100 + int(lo[5:7])
    m_hi = int(hi[:4]) * 100 + int(hi[5:7])
    src = meta["source"]
    return (
        spark.read.parquet(path)
        .filter((F.col(_PCOL) >= m_lo) & (F.col(_PCOL) <= m_hi))
        .filter((F.col(src) >= F.lit(lo)) & (F.col(src) <= F.lit(hi)))
        .drop(_PCOL)
    )
