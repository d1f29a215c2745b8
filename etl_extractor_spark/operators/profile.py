"""Table profiling — per-column statistics in one scan.

Data-quality profiling is table stakes for an ETL engine: null rates,
cardinalities, and value ranges drive schema validation and anomaly
alerts. Everything is computed in ONE aggregation pass (all columns'
stats as parallel aggregate expressions), then unpivoted to a long
(column, metric) layout — never one scan per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: rows, nulls, distinct, min, max
    (min/max stringified so heterogeneous column types coexist)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({n}, {args}) as (column, n_rows, n_null, n_distinct, min_value, max_value)".format(
            n=len(cols),
            args=", ".join(
                f"'{c}', __n, __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
                for c in cols
            ),
        )
    )
    return stacked
