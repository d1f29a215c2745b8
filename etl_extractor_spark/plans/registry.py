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


# Emitted ahead of module order: the queries a capped correctness sweep
# must reach — every SURVEY-§2 parity anchor, the LLM-pipeline suites,
# and the four oracles whose integer typing was fixed in round 2.
# (Names not present in any module are skipped harmlessly.)
_PRIORITY = (
    # parity (SURVEY §2 anchors)
    "star_join_detail", "profile_orders", "orders_systematic_sample",
    "orders_stratified_sample", "dim_customer", "dim_product",
    "dim_source", "dim_date", "fact_conformed", "fact_enriched",
    "fk_modulo_fold", "scalar_bounds", "surrogate_suppliers",
    "window_top_orders",
    # dedup
    "dedup_exact", "dedup_clusters", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_minhash_lsh_oph", "dedup_simhash",
    # similarity
    "knn_topk_cosine", "knn_topk_cosine_np", "sim_histogram",
    "embedding_near_dup", "ann_lsh_buckets", "knn_ivf_kmeans",
    "semdedup_keep",
    # events
    "events_tumbling", "events_totals_salted", "events_asof_click",
    "events_interval_join", "events_gapfill_rollup", "events_sliding",
    "events_sessionize", "events_sessionize_pandas", "events_json_stats",
    # multimodal
    "multimodal_meta", "multimodal_png_roundtrip", "multimodal_features",
    "multimodal_resize", "multimodal_frames",
    # round-2 retyped oracles (driver hash-failed on int typing in r1)
    "cube_docs", "lang_metrics_unpivot", "label_centroids",
    "user_value_trend",
    # text/corpus headliners
    "text_quality", "corpus_prep_stats", "source_mix_resample",
    "gopher_repetition", "exactsubstr_spans",
)


def _ordered(out: dict) -> dict:
    head = {k: out[k] for k in _PRIORITY if k in out}
    return head | {k: v for k, v in out.items() if k not in head}


def all_queries() -> dict[str, QueryFn]:
    import importlib

    out: dict[str, QueryFn] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue  # module not built yet
        out.update(getattr(mod, "QUERIES", {}))
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    import importlib

    out: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        out.update(getattr(mod, "ORACLES", {}))
    return _ordered(out)
