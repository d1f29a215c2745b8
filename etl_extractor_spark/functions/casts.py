"""Coercing casts with sentinel defaults (F6, F7, F8, F13).

The reference's universal pattern is ``pd.to_numeric(errors="coerce")
.fillna(default)`` (reference main.py:217-221,261-264). Under Spark 4's
default ANSI mode a plain ``cast`` THROWS on malformed input, so these
helpers use ``try_cast`` — null on failure — then
``coalesce(..., lit(default))``. Pure codegen, null-safe, ANSI-proof.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_extractor_spark.functions.text import ColumnOrName, _col


def to_double_or(c: ColumnOrName, default: float = 0.0) -> Column:
    """Pinned to Spark's cast semantics, which trim ASCII control
    chars and whitespace (any char ≤ U+0020) before parsing — so
    ``"0\\x1f"`` parses as 0.0 where Python ``float()`` would raise.
    Documented divergence from pandas ``to_numeric`` in FIXTURES.md;
    kept because it stays pure codegen (no UDF pre-filter)."""
    return F.coalesce(_col(c).try_cast("double"), F.lit(float(default)))


def to_long_or(c: ColumnOrName, default: int = -1) -> Column:
    return F.coalesce(_col(c).try_cast("long"), F.lit(int(default)))


def to_string_or(c: ColumnOrName, default: str = "-1") -> Column:
    """F8 — replicates the *intent* (null → sentinel), not pandas'
    accidental ``astype(str)`` → ``"nan"`` artifact (SURVEY §2.7 F8)."""
    return F.coalesce(_col(c).try_cast("string"), F.lit(default))
