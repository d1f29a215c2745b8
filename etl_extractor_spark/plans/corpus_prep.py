"""Training-corpus preparation pipeline — the composed end-to-end
shape a 100 TB LLM-data run takes, as ONE declarative plan:

    quality gate → exact dedup (keep min id per content hash)
                 → near-dup removal (MinHash-LSH clusters, keep
                   canonical member)
                 → per-language corpus stats

Each stage is an operator verified elsewhere on its own oracle
(text_quality, dedup_exact, dedup_clusters); this query verifies the
COMPOSITION against a single DuckDB oracle (recursive-CTE transitive
closure over the filtered+deduped set).

Scale shape: the quality gate and hash dedup are map + one shuffle;
near-dup runs banded LSH on the (already reduced) survivor set; the
final stats are a partial-aggregated groupBy on lang — no stage holds
more than the survivor fraction of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.functions import textstats as ts
from etl_extractor_spark.functions.text import normalize_text
from etl_extractor_spark.operators import dedup as D
from etl_extractor_spark.plans.dedup import SHINGLE_K, THRESHOLD
from etl_extractor_spark.sources.parquet import load_table

QUALITY_MIN = 1.4005  # off the binary/decimal grid: no ulp-boundary docs


def corpus_prep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        ts.quality_score("text").alias("quality"),
        ts.token_count("text").alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    # exact dedup: canonical (min) id per normalized-content hash
    h = F.md5(F.lower(normalize_text("text")).cast("binary"))
    w = Window.partitionBy(h)
    exact_kept = (
        scored.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )

    # near-dup removal: keep each cluster's canonical member
    clusters = D.dedup_cluster_assignments(
        exact_kept, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD
    )
    kept = exact_kept.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    )

    # avg via exact DECIMAL sum of per-doc 4-dp-rounded scores: double
    # summation is order-dependent (1-ulp flips at round boundaries
    # between engines); decimal addition is exact and associative.
    qdec = F.round("quality", 4).cast("decimal(14,4)")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(qdec).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_quality"),
    )


CORPUS_PREP_SQL = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id, text, lang,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, text, lang,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
          + len(list_distinct(toks)) * 1.0 / len(toks) * 0.5
          + least(len(list_filter(toks, x -> list_contains(['the','a','and','of'], x)))
                  * 1.0 / len(toks) * 5.0, 0.5)) AS quality
  FROM t
  WHERE (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
         + len(list_distinct(toks)) * 1.0 / len(toks) * 0.5
         + least(len(list_filter(toks, x -> list_contains(['the','a','and','of'], x)))
                 * 1.0 / len(toks) * 5.0, 0.5)) >= {QUALITY_MIN}
), exact_kept AS (
  SELECT * FROM (
    SELECT s.*,
           min(doc_id) OVER (
             PARTITION BY md5(lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g'))))
           ) AS keep_id
    FROM scored s
  ) WHERE doc_id = keep_id
), sh AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_K}) AS s
  FROM exact_kept,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(text) - {SHINGLE_K - 1}))) AS i)
  WHERE len(text) >= {SHINGLE_K}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE c * 1.0 / (sa.n + sb.n - c) >= {THRESHOLD}
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, m) AS (
  SELECT doc_id, doc_id FROM exact_kept
  UNION
  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node
), canon AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING node = min(m)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(round(quality, 4) AS DECIMAL(14,4))) AS DOUBLE)
             / count(*), 4) AS avg_quality
FROM exact_kept JOIN canon USING (doc_id)
GROUP BY 1
"""


_MIX_C = 2654435761  # Knuth multiplicative constant, shared with the oracle


def source_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source mixing (the T5/data-mixture trick,
    temperature t = 0.5): a source contributing n_s documents is
    downsampled with acceptance rate sqrt(min_n / n_s) (≤ 1 by construction), so
    dominant sources shrink toward the smaller ones instead of drowning
    them. Selection is a deterministic multiplicative-hash bucket on
    doc_id — reproducible across engines, reruns, and cluster sizes; no
    rand(), no state.

    Two aggregations: per-source counts (tiny — one row per source,
    broadcast back), then the row-local acceptance filter, which pushes
    into the scan on everything except the joined-in rate. sqrt is
    IEEE-correctly-rounded in both engines, so the per-mille thresholds
    match bit-for-bit.

    Output: per-source kept counts + the applied per-mille rate.
    """
    d = load_table(spark, sf_dir, "documents")
    # The synthetic corpus has uniform per-source counts, so the size
    # signal is amplified by a deterministic per-source weight (numeric
    # suffix + 1) standing in for real-world source-size skew — the
    # arithmetic the operator exists for stays fully exercised.
    wgt = F.regexp_extract("source", r"(\d+)", 1).cast("long") + 1
    counts = d.groupBy("source").agg(
        (F.count(F.lit(1)) * F.first(wgt)).alias("n_s")
    )
    min_n = counts.agg(F.min("n_s").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        "n_s",
        F.least(
            F.lit(1000).cast("long"),
            F.floor(F.lit(1000.0) * F.sqrt(F.col("min_n") / F.col("n_s"))).cast("long"),
        ).alias("rate_pm"),
    )
    # Reduce doc_id mod 1000 BEFORE the Knuth multiply: pmod(x*C, 1000)
    # == pmod(pmod(x,1000)*C, 1000), and the reduced product caps at
    # 999*C ~ 2.7e12 — no BIGINT overflow (ANSI runtime error) even for
    # doc_ids past 3.5e9 on a 100 TB corpus.
    bucket = F.pmod(F.pmod(F.col("doc_id"), F.lit(1000)) * F.lit(_MIX_C), F.lit(1000))
    return (
        d.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_pm"))
        .groupBy("source", "rate_pm")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


SOURCE_MIX_SQL = rf"""
WITH counts AS (
  SELECT source,
         count(*) * (CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) + 1) AS n_s
  FROM documents GROUP BY source
), rates AS (
  SELECT source, n_s,
         least(1000, CAST(floor(1000.0 * sqrt(
             (SELECT min(n_s) FROM counts) * 1.0 / n_s)) AS BIGINT)) AS rate_pm
  FROM counts
)
SELECT d.source, r.rate_pm, count(*) AS n_kept
FROM documents d JOIN rates r USING (source)
WHERE (((d.doc_id % 1000) * {_MIX_C}) % 1000 + 1000) % 1000 < r.rate_pm
GROUP BY d.source, r.rate_pm
"""


QUERIES = {
    "corpus_prep_stats": corpus_prep_stats,
    "source_mix_resample": source_mix_resample,
}
ORACLES = {
    "corpus_prep_stats": CORPUS_PREP_SQL,
    "source_mix_resample": SOURCE_MIX_SQL,
}


TOKEN_BUDGET = 10_000_000  # tokens the training run will consume


def mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture → dataloader config: given per-source token counts and
    temperature-smoothed target weights (t=0.5, same smoothing as
    ``source_mix_resample`` but on TOKENS, the unit training actually
    budgets), compute how many epochs of each source a TOKEN_BUDGET
    run implies — the number that says "this source will repeat 8×,
    cap it" (the Muennighoff data-constrained-scaling dial).

    One tiny aggregate (|sources| rows) does all the math — the corpus
    is scanned and tokenized ONCE (the z normalizer is a global window
    over the |sources|-row aggregate, not a second aggregate over a
    re-instantiated subtree, which Spark would re-scan). Doubles are
    pinned cross-engine by the floor(x*K + 0.5) fixed-point rule
    (Spark HALF_UP vs DuckDB banker's rounding never meet a tie)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(ts.tokens("text"))).cast("long").alias("n_tokens"),
    )
    # global window over the tiny post-agg frame (|sources| rows)
    w_all = Window.partitionBy()
    return (
        counts.withColumn(
            "z", F.sum(F.sqrt(F.col("n_tokens").cast("double"))).over(w_all)
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            # weight in per-mille: sqrt(n_s) / sum_j sqrt(n_j)
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) / F.col("z") * 1000 + 0.5)
            .cast("long")
            .alias("weight_pm"),
            # epochs×100 this budget implies for the source
            F.floor(
                F.lit(TOKEN_BUDGET)
                * (F.sqrt(F.col("n_tokens").cast("double")) / F.col("z"))
                / F.col("n_tokens")
                * 100
                + 0.5
            )
            .cast("long")
            .alias("epochs_x100"),
        )
        .orderBy("source")
    )


MIXTURE_EPOCHS_SQL = f"""
WITH counts AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\\s+', ' ', 'g')), ' '))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
), z AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM counts)
SELECT source,
       n_docs,
       n_tokens,
       CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) / z * 1000 + 0.5) AS BIGINT) AS weight_pm,
       CAST(floor({TOKEN_BUDGET} * (sqrt(CAST(n_tokens AS DOUBLE)) / z) / n_tokens * 100 + 0.5) AS BIGINT) AS epochs_x100
FROM counts, z
ORDER BY source
"""

QUERIES["mixture_epochs"] = mixture_epochs
ORACLES["mixture_epochs"] = MIXTURE_EPOCHS_SQL
