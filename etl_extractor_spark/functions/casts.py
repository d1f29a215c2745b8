"""Coercing casts with sentinel defaults (F6, F7, F8, F13).

The reference's universal pattern is ``pd.to_numeric(errors="coerce")
.fillna(default)`` (reference main.py:217-221,261-264). Spark's cast
already returns null on failure, so each helper is
``coalesce(cast, lit(default))`` — pure codegen, null-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_extractor_spark.functions.text import ColumnOrName, _col


def to_double_or(c: ColumnOrName, default: float = 0.0) -> Column:
    return F.coalesce(_col(c).cast("double"), F.lit(float(default)))


def to_long_or(c: ColumnOrName, default: int = -1) -> Column:
    return F.coalesce(_col(c).cast("long"), F.lit(int(default)))


def to_string_or(c: ColumnOrName, default: str = "-1") -> Column:
    """F8 — replicates the *intent* (null → sentinel), not pandas'
    accidental ``astype(str)`` → ``"nan"`` artifact (SURVEY §2.7 F8)."""
    return F.coalesce(_col(c).cast("string"), F.lit(default))
