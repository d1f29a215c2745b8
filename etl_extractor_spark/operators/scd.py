"""Slowly-changing-dimension (type 2) merge — warehouse upsert without
a transactional table format.

The reference replaces dimensions wholesale on every run (reference
load/load_to_staging.py:4-5), losing history. The warehouse-grade
alternative is SCD2: each business key carries versioned rows with
[valid_from, valid_to) ranges and an is_current flag. With plain
parquet (no Delta/Iceberg MERGE in this container) the merge is a
full-outer join + union, written with partition overwrite — the same
logical plan a MERGE INTO compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_initial(updates: DataFrame, key: str, attrs: list[str], load_date: str) -> DataFrame:
    return updates.select(
        key,
        *attrs,
        F.lit(load_date).cast("date").alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    load_date: str,
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension:

    - unchanged current rows: kept as-is
    - changed keys: current row closed (valid_to = load_date), new
      version appended
    - brand-new keys: inserted as current
    - historical (non-current) rows: passed through untouched

    One full-outer join on the key + a union — two shuffles total,
    independent of history depth (history rows never join).
    """
    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    u = updates.select(
        F.col(key).alias("_uk"), *[F.col(a).alias(f"_u_{a}") for a in attrs]
    )
    changed_pred = F.lit(False)
    for a in attrs:
        changed_pred = changed_pred | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))

    joined = current.join(u, current[key] == F.col("_uk"), "fullouter")

    kept = joined.filter(F.col("_uk").isNull()).select(*dim.columns)
    unchanged = joined.filter(
        F.col("_uk").isNotNull() & F.col(key).isNotNull() & ~changed_pred
    ).select(*dim.columns)
    closed = joined.filter(
        F.col("_uk").isNotNull() & F.col(key).isNotNull() & changed_pred
    ).select(
        key,
        *attrs,
        F.col("valid_from"),
        F.lit(load_date).cast("date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_versions = joined.filter(
        F.col("_uk").isNotNull() & (F.col(key).isNull() | changed_pred)
    ).select(
        F.col("_uk").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.lit(load_date).cast("date").alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return history.unionByName(kept).unionByName(unchanged).unionByName(closed).unionByName(new_versions)
