"""Z-order (Morton-curve) clustered layout over plain parquet.

A table laid out by ``repartitionByRange(col)`` prunes well on that
one column and not at all on any other. Interleaving the bits of
several columns into one Morton code and range-laying-out by THAT
gives every participating column a bounded [min, max] per file, so the
``_manifest.json`` skipping from ``sinks.manifest`` prunes on ALL of
them — the same effect as Delta's ``OPTIMIZE ZORDER BY`` or an
Iceberg sort order, with no table-format dependency.

Scale behavior: the z-value is a pure per-row JVM expression (bit
shifts and adds inside whole-stage codegen), the layout costs exactly
one range shuffle (same as any clustered write), and each column's
min/max bounds are harvested from parquet footers as usual. With b
bits per column and k columns, a point predicate on one column touches
~``n_files^((k-1)/k)`` files instead of all of them.

The reference's nearest feature is its B-tree staging indexes
(reference load/load_to_staging.py:7-16); z-order is the
multi-column-locality analog that works on immutable columnar files.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.sinks.manifest import write_with_manifest


def _bucket_expr(name: str, lo: int, hi: int, bits: int) -> Column:
    """Scale integer column ``name`` from [lo, hi] to [0, 2^bits) with
    exact integer arithmetic (no doubles — layout is reproducible)."""
    span = int(hi) - int(lo) + 1
    return F.expr(
        f"(CAST(`{name}` AS BIGINT) - {int(lo)}) * {1 << bits} div {span}"
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i*k + j."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long") * F.lit(
                1 << (i * k + j)
            )
    return z


def zvalue(df: DataFrame, zcols: list[str], bits: int = 10) -> Column:
    """Morton-code expression for ``zcols`` (integer columns), scaling
    each to ``bits`` bits via its global min/max (one scalar agg)."""
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zcols],
        *[F.max(c).alias(f"hi_{c}") for c in zcols],
    ).first()
    buckets = [
        _bucket_expr(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits) for c in zcols
    ]
    return _interleave(buckets, bits)


def write_zordered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    zcols: list[str],
    n_files: int = 16,
    bits: int = 10,
    stats_cols: list[str] | None = None,
) -> dict[str, Any]:
    """Write ``df`` clustered on the Morton curve of ``zcols`` and
    persist the skipping manifest with per-file stats on those columns.

    One range shuffle on the z-value (range boundaries sampled by
    Spark's RangePartitioner), in-partition sort so parquet row groups
    inherit the locality, then footer harvest → ``_manifest.json``.
    """
    z = zvalue(df, zcols, bits)
    laid = (
        df.withColumn("_zval", z)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
    return write_with_manifest(
        spark, laid, path, stats_cols=sorted(set(stats_cols or []) | set(zcols))
    )
