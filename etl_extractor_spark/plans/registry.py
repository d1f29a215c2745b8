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
    "etl_extractor_spark.plans.pii",
    "etl_extractor_spark.plans.corpus_prep",
    "etl_extractor_spark.plans.web_curation",
    "etl_extractor_spark.plans.graph",
    "etl_extractor_spark.plans.recursive",
    "etl_extractor_spark.plans.roundtrip",
    "etl_extractor_spark.plans.training_prep",
    "etl_extractor_spark.plans.tpch",
    "etl_extractor_spark.plans.tpch2",
    "etl_extractor_spark.plans.tpch3",
    "etl_extractor_spark.plans.tpch4",
)


# Emitted ahead of module order: the queries a capped (~50/round)
# CORRECTNESS sweep must reach. Round-3 rotation: every query that has
# never appeared in a driver run (r1+r2 checked 96 of 134) leads,
# followed by the round-3-new round-trip/twin queries, then a small
# regression canary of previously-green anchors. (Names not present in
# any module are skipped harmlessly.)
_PRIORITY = (
    # --- never driver-checked (r1+r2 union): text/corpus suite
    "bpe_pair_counts", "bpe_apply_merge", "winnow_fingerprints",
    "char_entropy", "unigram_lm_score", "decontaminate_ngrams",
    "doc_sentiment", "chunk_documents", "lang_detect",
    "doc_fingerprints", "corpus_stats_by_lang", "token_frequencies",
    "docs_pivot_lang_source", "approx_distinct_tokens",
    # --- never driver-checked: dedup/similarity/events
    "dedup_simhash_md5", "dedup_simhash_md5_pairs",
    "embedding_quantize_int8", "hll_user_reach", "events_asof_click_tol",
    # --- never driver-checked: analytics3/4, stats, cleaning
    "orders_quality_report", "key_skew_profile",
    "quality_violation_sample", "user_activity_gaps",
    "orders_latest_per_customer", "nation_revenue_share_bps",
    "customer_trailing_30d_spend", "token_coverage_p90",
    "event_type_cooccurrence", "heavy_hitter_parts", "price_histogram",
    "mad_outliers_by_priority", "customer_year_reconciliation",
    "revenue_percentiles", "lineitem_stats", "sql_star_revenue",
    "winsorize_prices", "fuzzy_name_pairs", "order_quartiles",
    # --- round-3-new: environmental-op round-trips + deterministic twins
    "csv_roundtrip", "json_envelope_unwrap", "jdbc_roundtrip",
    "orders_stratified_sample_hash", "knn_ivf_fixed",
    "bm25_scores", "pack_sequences", "dataset_split_hash",
    # --- round-3-new, second wave: PII / VARIANT / Python Data Source /
    #     as-of trio completion / corpus planning
    "pii_redaction", "pii_prevalence_by_source", "events_variant_stats",
    "pyds_envelope_scan", "events_asof_next_click",
    "events_asof_nearest_click", "mixture_epochs", "vocab_growth_by_source",
    "shuffle_deterministic", "lateral_top_orders",
    # --- round-3-new, third wave: web-corpus curation + retrieval eval
    "url_canonical_dedup", "doc_quality_logreg", "cluster_representatives",
    "bigram_lm_score", "ann_recall_at_k", "split_leakage_audit",
    "pagerank_purchase_graph", "purchase_graph_degrees",
    "topk_orders_salted", "curriculum_order", "doc_length_p99_filter",
    "hashed_feature_vectors", "chunk_sliding_stride", "oov_rate",
    "rerank_bm25_hash_stub", "top_session_paths", "pmi_collocations",
    "knn_label_agreement", "contrastive_negatives",
    "rolling_zscore_outliers",
    # --- round-3, fourth wave: corpus-global cleaning, governance,
    #     graph cohesion, decayed KPIs
    "common_paragraph_filter", "user_erasure_audit",
    "triangle_participation", "decayed_daily_revenue",
    "doc_tree_depth", "doc_subtree_rollup", "pq_adc_topk", "ivfpq_adc_topk",
    "events_rate_limit", "bpe_train_rounds", "pii_luhn_cards",
    "parquet_schema_evolution", "part_association_rules",
    "nation_revenue_trend", "orc_roundtrip", "bootstrap_revenue_ci",
    "woe_encoding", "phrase_search_postings", "ab_test_zscore",
    "distinct_users_salted", "snapshot_diff", "dedup_containment",
    "bpe_segment_docs", "scd2_point_in_time", "orders_nested_lines",
    "customer_order_streaks", "k_anonymity_audit", "multimodal_dhash",
    "dpp_partitioned_join", "bucketed_join_colocated",
    "source_similarity_kmv", "psi_price_drift", "chi2_segment_status",
    "jsonl_roundtrip", "compaction_roundtrip", "sql_udf_margin",
    "weighted_sample_orders", "user_active_coverage", "embedding_dbscan",
    "theil_sen_nation_trend", "benford_first_digit",
    # --- regression canary (green in r1/r2; re-pin a few anchors)
    "q5_regional_revenue", "fact_conformed", "dedup_minhash_lsh",
    "dedup_minhash_lsh_oph", "star_join_detail", "text_quality",
    "knn_topk_cosine_np", "events_sessionize",
)


def _ordered(out: dict) -> dict:
    head = {k: out[k] for k in _PRIORITY if k in out}
    return head | {k: v for k, v in out.items() if k not in head}


def _load(attr: str) -> tuple[dict, bool]:
    """Returns (registry, complete): ``complete`` is False if any plan
    module failed to import — a partial registry must NOT be memoized,
    or a transiently-missing dependency would permanently hide its
    queries from this process."""
    import importlib

    out: dict = {}
    complete = True
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            complete = False
            continue  # module not importable right now
        out.update(getattr(mod, attr, {}))
    return _ordered(out), complete


# Registry hygiene at 134+ queries: the 17-module import walk runs once;
# repeated driver calls to __spark_entry__.queries() are O(1). A fresh
# dict is returned each call so callers may mutate their copy safely.
_CACHE: dict[str, dict] = {}


def all_queries() -> dict[str, QueryFn]:
    if "QUERIES" not in _CACHE:
        out, complete = _load("QUERIES")
        if not complete:
            return out  # partial: retry imports next call, don't memoize
        _CACHE["QUERIES"] = out
    return dict(_CACHE["QUERIES"])


def all_oracles() -> dict[str, str]:
    if "ORACLES" not in _CACHE:
        out, complete = _load("ORACLES")
        if not complete:
            return out
        _CACHE["ORACLES"] = out
    return dict(_CACHE["ORACLES"])
