"""Text scalar functions (F1, F3, F9, F10, F11).

All are Column-expression helpers — they compile into Catalyst
expressions inside whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: ColumnOrName) -> Column:
    """F1: cast to string, collapse whitespace runs to one space, trim.

    Parity with the reference's normalize_text (reference
    transform/clean_data.py:4-7). Collapse BEFORE trim: Spark's trim
    strips only ASCII spaces, so an input like "\\r" would survive a
    leading trim and collapse to " " instead of "" (caught by the
    hypothesis property test).

    Whitespace class: ASCII ``\\s`` ([ \\t\\n\\x0b\\f\\r]) — Java regex
    and DuckDB's RE2 agree on this; pandas' Python-re ``\\s`` would also
    strip Unicode whitespace (U+00A0 etc.). Documented divergence from
    the reference (SURVEY §7.3: replicate intent, pin engine parity).
    """
    return F.trim(F.regexp_replace(_col(c).cast("string"), r"\s+", " "))


def truncate(c: ColumnOrName, n: int = 2000) -> Column:
    """F11: trim then cap length (reference main.py:265-267)."""
    return F.substring(F.trim(_col(c).cast("string")), 1, n)


def prefixed_key(c: ColumnOrName, prefix: str, width: int = 3) -> Column:
    """F9+F10: the reference's business-key synthesis — ``"C" +
    str(int(id)).zfill(3)`` (reference main.py:103-105).

    Width is configurable because zfill(3) stops padding (but keeps
    working) past 999; lpad truncates instead, so we pick a width wide
    enough for the key domain at the target scale.
    """
    return F.concat(F.lit(prefix), F.lpad(_col(c).cast("long").cast("string"), width, "0"))


def standardize_columns(df: DataFrame) -> DataFrame:
    """F3: lowercase/strip/underscore every column name (reference
    transform/clean_data.py:12-15). Plan-time rename — zero cost."""
    return df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])
