"""Central query registry — the single source for __spark_entry__.

Each plan module exports ``QUERIES`` (name → fn(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL, or absent for
non-SQL-expressible ops which get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Ordered so the driver's (possibly capped) CORRECTNESS sweep verifies
# the not-yet-driver-verified modules first: SURVEY-§2 parity anchors,
# then the LLM-pipeline suites, then the analytics modules whose
# oracles were retyped in r2, then the r1-green TPC-H modules last.
_MODULES = (
    "etl_extractor_spark.plans.parity",
    "etl_extractor_spark.plans.dedup",
    "etl_extractor_spark.plans.similarity",
    "etl_extractor_spark.plans.events",
    "etl_extractor_spark.plans.multimodal",
    "etl_extractor_spark.plans.text_analysis",
    "etl_extractor_spark.plans.corpus_quality",
    "etl_extractor_spark.plans.analytics2",
    "etl_extractor_spark.plans.analytics3",
    "etl_extractor_spark.plans.analytics4",
    "etl_extractor_spark.plans.stats",
    "etl_extractor_spark.plans.cleaning",
    "etl_extractor_spark.plans.corpus_prep",
    "etl_extractor_spark.plans.tpch",
    "etl_extractor_spark.plans.tpch2",
    "etl_extractor_spark.plans.tpch3",
    "etl_extractor_spark.plans.tpch4",
)


def all_queries() -> dict[str, QueryFn]:
    import importlib

    out: dict[str, QueryFn] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue  # module not built yet
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    import importlib

    out: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        out.update(getattr(mod, "ORACLES", {}))
    return out
