"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query (SURVEY §3.3 analog)
at sf0.001; ``queries()``/``oracle_sql()`` expose the full operator
library from etl_extractor_spark.plans with DuckDB oracles.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_extractor_spark.plans.registry import all_oracles, all_queries  # noqa: E402
from etl_extractor_spark.plans.tpch import q5_regional_revenue  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q5_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here get the
    driver's weaker rows-only check (approximate/non-SQL ops)."""
    return all_oracles()
