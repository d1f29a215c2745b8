"""Date scalar functions (F2, F4, F5, F12).

Spark casts behave like the reference's ``errors="coerce"``: an
unparseable value becomes null, which we then default with coalesce —
never an exception (SURVEY §4.2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_extractor_spark.functions.text import ColumnOrName, _col


def parse_date(c: ColumnOrName) -> Column:
    """F2: invalid → null (= pd.to_datetime coerce). try_to_timestamp,
    because under ANSI mode (Spark 4 default) to_timestamp throws."""
    return F.try_to_timestamp(_col(c))


def fecha_key(c: ColumnOrName, default: int = -1) -> Column:
    """F5: date → int YYYYMMDD; unparseable → sentinel (reference
    main.py:204-206)."""
    return F.coalesce(
        F.date_format(parse_date(c), "yyyyMMdd").cast("long"), F.lit(default)
    )


def date_dim_columns(c: ColumnOrName) -> dict[str, Column]:
    """F4/F12: calendar attribute set for the date dimension (reference
    transform/clean_data.py:17-29). English month/day names match the
    DuckDB oracle's monthname()/dayname()."""
    col = _col(c)
    return {
        "fecha_key": F.date_format(col, "yyyyMMdd").cast("long"),
        "anio": F.year(col).cast("long"),
        "mes": F.month(col).cast("long"),
        "dia": F.dayofmonth(col).cast("long"),
        "trimestre": F.quarter(col).cast("long"),
        "mes_nombre": F.date_format(col, "MMMM"),
        "dia_semana": F.date_format(col, "EEEE"),
    }


_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_epoch_micros(c: ColumnOrName) -> Column:
    """Microseconds since 1970-01-01 as pure WALL-CLOCK arithmetic on a
    TIMESTAMP_NTZ column — session-timezone-INDEPENDENT, unlike
    ``unix_micros(cast(ts as timestamp))`` which first reinterprets the
    wall clock in the session zone (shifting bucket boundaries by the
    UTC offset, and by a different amount across DST). Matches DuckDB's
    ``epoch_us(ts)`` for the same wall-clock values."""
    return F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), _col(c))


def ntz_epoch_seconds(c: ColumnOrName) -> Column:
    """Seconds since 1970-01-01, wall-clock (see ntz_epoch_micros)."""
    return F.timestamp_diff("SECOND", F.expr(_NTZ_EPOCH), _col(c))


def ntz_from_epoch_micros(c: Column) -> Column:
    """Inverse of ntz_epoch_micros: micros → TIMESTAMP_NTZ wall clock
    (``timestamp_micros`` would produce an instant that date_format
    then renders in the session zone)."""
    return F.timestamp_add("MICROSECOND", c, F.expr(_NTZ_EPOCH))
