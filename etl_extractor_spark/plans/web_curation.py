"""Web-corpus curation queries: URL canonicalization dedup, model-based
quality gating, and canonical-document selection per near-dup cluster.

Three stages every CommonCrawl-style pipeline runs that the existing
dedup/quality suites don't cover yet (reference parity: these extend
the cleaning surface of `transform/clean_data.py:4-29` to web-corpus
scale; no analog exists in the 828-LoC reference itself):

- ``url_canonical_dedup``   : URL-level exact dedup after
                              canonicalization (lowercase scheme+host,
                              strip www./default ports/fragments/
                              tracking params, tidy the query string,
                              drop trailing slashes). The documents
                              table has no URL column, so both engines
                              SYNTHESIZE the same deterministic raw URL
                              from (source, doc_id) — the oracle
                              therefore pins the canonicalization chain
                              itself, rule by rule.
- ``doc_quality_logreg``    : fixed-weight logistic-regression quality
                              gate (the shape of fastText/classifier
                              filtering à la GPT-3/LLaMA corpus prep).
                              The logit is computed ENTIRELY in integer
                              micro-units (all features are rationals
                              with denominator n_tokens), so the
                              keep/drop decision is bit-exact across
                              engines — no float-boundary flakiness.
                              The sigmoid is monotone, so thresholding
                              the logit IS thresholding the
                              probability; we never materialize exp().
- ``cluster_representatives``: near-dup clusters (MinHash pairs →
                              connected components) reduced to one
                              KEPT document each — highest composite
                              quality wins, doc_id breaks ties — the
                              "which copy do we keep" step between
                              dedup and training.

100 TB notes: URL canonicalization is a map-only expression chain
(one shuffle for the group-by on the canonical key, AQE-coalesced);
the logreg gate is map-only (no shuffle at all — it composes with any
downstream scan); representative selection shuffles once on cluster_id
after the clusters are computed, and the quality join is on doc_id —
the same key the cluster assignment already carries, so at scale it
rides the existing partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.functions import textstats as ts
from etl_extractor_spark.operators import dedup as D
from etl_extractor_spark.sources.parquet import load_table

# ---------------------------------------------------------------- URLs

_TRACKING_RE = "(utm_[a-z]+|fbclid|gclid)=[^&#]*"


def _raw_url(doc_id: F.Column, source: F.Column) -> F.Column:
    """Deterministic messy URL from (source, doc_id) — mixed case,
    optional www./:443, tracking params, optional fragment. Collides
    post-canonicalization whenever (source, doc_id%40) match (the %5
    page param is implied by %40)."""
    s = lambda e: e.cast("string")  # noqa: E731
    return F.concat(
        F.lit("HTTPS://"),
        F.when(doc_id % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.upper(source),
        F.lit(".Example.COM"),
        F.when(doc_id % 2 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Articles/"),
        s(doc_id % 40),
        F.lit("/?utm_source=feed&page="),
        s(doc_id % 5),
        F.lit("&fbclid=x"),
        s(doc_id % 7),
        F.lit("&utm_campaign=c"),
        s(doc_id % 3),
        F.when(doc_id % 4 == 0, F.concat(F.lit("#sec-"), s(doc_id % 6))).otherwise(
            F.lit("")
        ),
    )


def canonicalize_url(u: F.Column) -> F.Column:
    """RFC-3986-flavored normalization chain (each step map-only):
    1. strip fragment  2. lowercase scheme+authority  3. drop www.
    4. drop default ports  5. drop tracking params + tidy ?/& debris
    6. drop slash-before-query and trailing slash."""
    u1 = F.regexp_replace(u, "#.*$", "")
    auth = F.regexp_extract(u1, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    # substring after the authority: length() is exact on the extracted
    # prefix, so no second regex pass is needed.
    rest = F.substring(u1, F.length(auth) + 1, F.lit(1 << 30))
    auth = F.regexp_replace(
        F.replace(F.lower(auth), F.lit("://www."), F.lit("://")),
        ":(443|80)$",
        "",
    )
    rest = F.regexp_replace(rest, _TRACKING_RE, "")
    rest = F.regexp_replace(rest, "&+", "&")
    rest = F.replace(rest, F.lit("?&"), F.lit("?"))
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "/\\?", "?")
    rest = F.regexp_replace(rest, "/$", "")
    return F.concat(auth, rest)


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        canonicalize_url(_raw_url(F.col("doc_id"), F.col("source"))).alias(
            "canonical_url"
        ),
    )
    return urls.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


URL_CANONICAL_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://'
         || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
         || upper(source) || '.Example.COM'
         || CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END
         || '/Articles/' || CAST(doc_id % 40 AS VARCHAR)
         || '/?utm_source=feed&page=' || CAST(doc_id % 5 AS VARCHAR)
         || '&fbclid=x' || CAST(doc_id % 7 AS VARCHAR)
         || '&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)
         || CASE WHEN doc_id % 4 = 0
                 THEN '#sec-' || CAST(doc_id % 6 AS VARCHAR) ELSE '' END AS u
  FROM documents
), steps AS (
  SELECT doc_id, regexp_replace(u, '#.*$', '') AS u1,
         regexp_extract(regexp_replace(u, '#.*$', ''),
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', 0) AS auth
  FROM raw
), parts AS (
  SELECT doc_id,
         regexp_replace(replace(lower(auth), '://www.', '://'),
                        ':(443|80)$', '') AS auth,
         substr(u1, strlen(auth) + 1) AS rest
  FROM steps
), cleaned AS (
  SELECT doc_id, auth,
         regexp_replace(
           regexp_replace(
             replace(
               regexp_replace(
                 regexp_replace(rest, '(utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
                 '&+', '&', 'g'),
               '?&', '?'),
             '[?&]+$', ''),
           '/\?', '?') AS rest
  FROM parts
)
SELECT auth || regexp_replace(rest, '/$', '') AS canonical_url,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM cleaned
GROUP BY 1
"""

# ------------------------------------------------- logistic quality gate

# Integer micro-unit weights: logit = (W_TTR·distinct + W_SW·stop_hits
# + W_LEN·chars) / n_tokens - BIAS, all over denominator n_tokens so
# one integer division computes the exact floor.
W_TTR = 2_000_000
W_SW = 1_500_000
W_LEN = 120_000
BIAS = 1_700_000


def doc_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight logistic quality gate; keep = logit >= 0.

    The features (type-token ratio, stopword ratio, avg token length)
    are all counts over n_tokens, so ``(W·counts) DIV n - BIAS`` is the
    exact floored micro-logit — integer arithmetic end-to-end, immune
    to cross-engine libm drift. Map-only: composes with any scan."""
    return quality_logit(load_table(spark, sf_dir, "documents"))


def quality_logit(d: DataFrame) -> DataFrame:
    """The gate itself, batch/stream-agnostic (zero shuffles ⇒ runs
    unchanged under Structured Streaming append mode — pinned by
    ``test_streaming_quality_gate_matches_batch``)."""
    t = F.col("_toks")
    markers = F.array(*[F.lit(m) for m in ts.EN_MARKERS])
    return (
        d.withColumn("_toks", ts.tokens("text"))
        .select(
            "doc_id",
            F.size(t).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
            F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
            .cast("long")
            .alias("n_stop"),
            F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                f"({W_TTR} * n_distinct + {W_SW} * n_stop + {W_LEN} * n_chars)"
                f" DIV n_tokens - {BIAS}"
            ).alias("logit_micro"),
        )
        .withColumn("keep", F.col("logit_micro") >= 0)
    )


_MARKER_LIST = ", ".join(f"'{m}'" for m in ts.EN_MARKERS)

QUALITY_LOGREG_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), feats AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(toks, x -> x IN ({_MARKER_LIST}))) AS BIGINT) AS n_stop,
         CAST(list_sum(list_transform(toks, x -> strlen(x))) AS BIGINT) AS n_chars
  FROM t
)
SELECT doc_id, n_tokens,
       ({W_TTR} * n_distinct + {W_SW} * n_stop + {W_LEN} * n_chars)
         // n_tokens - {BIAS} AS logit_micro,
       ({W_TTR} * n_distinct + {W_SW} * n_stop + {W_LEN} * n_chars)
         // n_tokens - {BIAS} >= 0 AS keep
FROM feats
"""

# ------------------------------------------- cluster representatives

SHINGLE_K = 30
THRESHOLD = 0.5


def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One kept doc per near-dup cluster: max composite quality wins,
    min doc_id breaks ties. Reuses the MinHash-pairs → large-star/
    small-star component assignment and the text_quality score (both
    independently oracle-pinned), so this query certifies the
    SELECTION step: window over cluster_id, rank 1."""
    from etl_extractor_spark.plans.text_analysis import text_quality

    d = load_table(spark, sf_dir, "documents")
    clusters = D.dedup_cluster_assignments(
        d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD
    )
    q = text_quality(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "n_members",
            F.col("quality").alias("rep_quality"),
        )
    )


def _cluster_reps_sql() -> str:
    from etl_extractor_spark.plans.dedup import DEDUP_CLUSTERS_SQL
    from etl_extractor_spark.plans.text_analysis import TEXT_QUALITY_SQL

    return (
        "WITH clusters AS (\n"
        + DEDUP_CLUSTERS_SQL
        + "\n), q AS (\n"
        + TEXT_QUALITY_SQL
        + """
), ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rk,
         CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS n_members
  FROM clusters c JOIN q USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, n_members, quality AS rep_quality
FROM ranked WHERE rk = 1
"""
    )


QUERIES = {
    "url_canonical_dedup": url_canonical_dedup,
    "doc_quality_logreg": doc_quality_logreg,
    "cluster_representatives": cluster_representatives,
}

ORACLES = {
    "url_canonical_dedup": URL_CANONICAL_SQL,
    "doc_quality_logreg": QUALITY_LOGREG_SQL,
    "cluster_representatives": _cluster_reps_sql(),
}
