"""Text-analysis queries over the documents table.

Training-data pipeline staples: token statistics, quality scoring,
language-ID heuristic, content fingerprinting — all pure Catalyst
expressions with exact DuckDB oracles pinning the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.functions import textstats as ts
from etl_extractor_spark.functions.text import normalize_text
from etl_extractor_spark.sources.parquet import load_table
from etl_extractor_spark.operators.checkpoints import reliable_checkpoint


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token stats + composite quality score.

    The token array is materialized ONCE (`_toks` projection boundary)
    and every stat derives from it — the per-stat helpers each re-run
    `split(regexp_replace(...))`, and Spark's subexpression elimination
    does not reliably collapse repeated HOF trees across projections
    (r1 bench showed 9× on exactly that). CollapseProject keeps the
    boundary because `_toks` is non-cheap and referenced 5×.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("_toks")
    nt = F.size(t)
    markers = F.array(*[F.lit(m) for m in ts.EN_MARKERS])
    sw_hits = F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
    ttr_raw = F.size(F.array_distinct(t)) / nt
    sw_raw = sw_hits / nt
    len_band = (
        F.when((nt >= 10) & (nt <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return d.withColumn("_toks", ts.tokens("text")).select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        ts.bpe_token_count("text").alias("n_bpe_tokens"),
        F.round(ttr_raw, 4).alias("ttr"),
        F.round(
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x)) / nt, 4
        ).alias("avg_tok_len"),
        F.round(sw_raw, 4).alias("stop_ratio"),
        F.round(
            len_band + ttr_raw * 0.5 + F.least(sw_raw * 5.0, F.lit(0.5)), 4
        ).alias("quality"),
    )


TEXT_QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks,
         text
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
         len(list_distinct(toks)) * 1.0 / len(toks) AS ttr_raw,
         round(list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks), 4) AS avg_tok_len,
         len(list_filter(toks, x -> list_contains(['the','a','and','of'], x))) * 1.0 / len(toks) AS sw_raw,
         CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END AS len_band
  FROM t
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       round(ttr_raw, 4) AS ttr, avg_tok_len,
       round(sw_raw, 4) AS stop_ratio,
       round(len_band + ttr_raw * 0.5 + least(sw_raw * 5.0, 0.5), 4) AS quality
FROM s
"""


def lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic vs the labeled lang column."""
    d = load_table(spark, sf_dir, "documents")
    scores = ts.lang_scores("text")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        scores["en"].alias("score_en"),
        scores["es"].alias("score_es"),
        scores["de"].alias("score_de"),
        ts.lang_id("text").alias("lang_pred"),
    )


LANG_DETECT_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of'], x))) AS BIGINT) AS score_en,
         CAST(len(list_filter(toks, x -> list_contains(['el','la','de','y'], x))) AS BIGINT) AS score_es,
         CAST(len(list_filter(toks, x -> list_contains(['der','die','und','ist'], x))) AS BIGINT) AS score_de
  FROM t
)
SELECT doc_id, lang AS lang_label, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en > 0 THEN 'en'
            WHEN score_es >= score_de AND score_es > 0 THEN 'es'
            WHEN score_de > 0 THEN 'de'
            ELSE 'unknown' END AS lang_pred
FROM s
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per doc + corpus-level duplicate-signal agg
    by source: fingerprint, then count docs per (source, fingerprint)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.col("source"),
            ts.fingerprint("text").alias("fp"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


DOC_FINGERPRINTS_SQL = r"""
SELECT doc_id, source,
       md5(lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')))) AS fp,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
"""


def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate text stats by language facet (groupBy over derived
    columns — partial aggregation before the shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        ts.token_count("text").alias("n_tokens"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_tokens").alias("max_tokens"),
    )


CORPUS_STATS_SQL = r"""
WITH t AS (
  SELECT lang,
         CAST(len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
         CAST(n_chars AS DOUBLE) AS n_chars
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(avg(n_tokens), 4) AS avg_tokens,
       round(avg(n_chars), 4) AS avg_chars,
       max(n_tokens) AS max_tokens
FROM t GROUP BY lang
"""


def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count (explode + agg + top-k): the canonical
    row-multiplying operator — partial counts before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ts.tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


TOKEN_FREQ_SQL = r"""
SELECT token, count(*) AS freq
FROM (
  SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
)
WHERE len(token) > 0
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""


def docs_pivot_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): document counts for lang × source facets."""
    d = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    return (
        d.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, langs)
    )


DOCS_PIVOT_SQL = """
SELECT source,
       CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS de,
       CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS en,
       CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS es,
       CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
       CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS zh
FROM documents
GROUP BY source
"""


def approx_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct count — the 100 TB path for
    cardinality estimation (rows-only: HLL implementations differ
    between engines, so there is no exact oracle; the batch test bounds
    the error against the exact count instead)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(ts.tokens("text")).alias("token"))
    return toks.agg(
        F.approx_count_distinct("token", rsd=0.01).alias("approx_tokens"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def doc_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentiment via the Arrow-vectorized pandas UDF — oracle-pinned to
    the equivalent SQL, proving the Python path's exact semantics."""
    from etl_extractor_spark.functions.sentiment import sentiment_label, sentiment_score

    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", sentiment_score("text").alias("sentiment"))
    return scored.select(
        "doc_id", "sentiment", sentiment_label(F.col("sentiment")).alias("label")
    )


DOC_SENTIMENT_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         round((len(list_filter(toks, x -> list_contains(['fast','small','value'], x)))
              - len(list_filter(toks, x -> list_contains(['slow','big','dup'], x))))
              * 1.0 / greatest(len(toks), 1), 4) AS sentiment
  FROM t
)
SELECT doc_id, sentiment,
       CASE WHEN sentiment > 0.02 THEN 'positive'
            WHEN sentiment < -0.02 THEN 'negative'
            ELSE 'neutral' END AS label
FROM s
"""


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token chunking via Python UDTF (lateral join): one row per
    50-token chunk per document."""
    from etl_extractor_spark.functions.chunking import register_chunker

    register_chunker(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
        FROM documents d, LATERAL chunk_tokens(d.doc_id, d.text) c
        """
    )


CHUNK_DOCUMENTS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       array_to_string(toks[(i * 50 + 1):((i + 1) * 50)], ' ') AS chunk_text,
       CAST(len(toks[(i * 50 + 1):((i + 1) * 50)]) AS BIGINT) AS n_tokens
FROM t, LATERAL (
  SELECT unnest(generate_series(0, CAST(ceil(len(toks) / 50.0) AS INT) - 1)) AS i
)
"""


QUERIES = {
    "text_quality": text_quality,
    "doc_sentiment": doc_sentiment,
    "chunk_documents": chunk_documents,
    "lang_detect": lang_detect,
    "doc_fingerprints": doc_fingerprints,
    "corpus_stats_by_lang": corpus_stats_by_lang,
    "token_frequencies": token_frequencies,
    "docs_pivot_lang_source": docs_pivot_lang_source,
    "approx_distinct_tokens": approx_distinct_tokens,
}

ORACLES = {
    "text_quality": TEXT_QUALITY_SQL,
    "doc_sentiment": DOC_SENTIMENT_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "lang_detect": LANG_DETECT_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
    "corpus_stats_by_lang": CORPUS_STATS_SQL,
    "token_frequencies": TOKEN_FREQ_SQL,
    "docs_pivot_lang_source": DOCS_PIVOT_SQL,
    # approx_distinct_tokens: rows-only (HLL sketches are engine-specific)
}


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner statistic of BPE tokenizer TRAINING, distributed: count
    adjacent character pairs across every token occurrence in the
    corpus and surface the top-20 merge candidates (deterministic
    lexical tie-break). One explode → groupBy — partial aggregation
    eats the pair stream map-side, so the shuffle carries only the
    (tiny) distinct-pair space. The full BPE loop is this query
    re-run over re-segmented tokens per merge round.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(ts.tokens("text")).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("pair", "n", F.col("rnk").cast("long").alias("rnk"))
    )


BPE_PAIR_SQL = r"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), pairs AS (
  SELECT substr(tok, i, 2) AS pair
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tok) - 1)) AS i)
  WHERE len(tok) >= 2
), counted AS (
  SELECT pair, count(*) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rnk
FROM counted QUALIFY rnk <= 20
"""


WINNOW_K = 8  # k-gram length
WINNOW_W = 4  # winnowing window (guarantee: any match >= k+w-1 chars is caught)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a window
    of w consecutive hashes, keep each window's minimum. Guarantees any
    exact match of length >= k+w-1 shares a fingerprint, while storing
    ~2/(w+1) of the hashes — the storage/recall dial for 100 TB
    fingerprint indexes. Hash = md5-prefix so both engines order
    identically; per-doc output keeps the comparison compact.
    """
    d = load_table(spark, sf_dir, "documents")
    n = F.length("norm")
    grams = (
        d.select("doc_id", F.lower(normalize_text("text")).alias("norm"))
        .filter(n >= WINNOW_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n - WINNOW_K + 1),
                    lambda i: F.col("norm").substr(i, F.lit(WINNOW_K)),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", "pos", F.substring(F.md5("gram"), 1, 16).alias("h"))
    )
    wspec = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    )
    cnt = Window.partitionBy("doc_id")
    selected = (
        grams.withColumn("win_min", F.min("h").over(wspec))
        .withColumn("n_grams", F.count(F.lit(1)).over(cnt))
        # only full windows (classic winnowing); pos is 0-BASED from
        # posexplode, so the last full window starts at n_grams - W
        .filter(F.col("pos") <= F.col("n_grams") - WINNOW_W)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.countDistinct("win_min").alias("n_fingerprints"),
            F.min("win_min").alias("min_fp"),
            F.max("win_min").alias("max_fp"),
        )
    )
    return selected.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_fingerprints").cast("long").alias("n_fingerprints"),
        "min_fp",
        "max_fp",
    )


WINNOW_SQL = rf"""
WITH norm AS (
  SELECT doc_id, lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g'))) AS s
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, substr(md5(substr(s, i, {WINNOW_K})), 1, 16) AS h,
         len(s) - {WINNOW_K} + 1 AS n_grams
  FROM norm, LATERAL (SELECT unnest(generate_series(1, len(s) - {WINNOW_K} + 1)) AS i)
  WHERE len(s) >= {WINNOW_K}
), mins AS (
  SELECT doc_id, pos, n_grams,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS win_min
  FROM grams
)
SELECT doc_id,
       CAST(max(n_grams) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT win_min) AS BIGINT) AS n_fingerprints,
       min(win_min) AS min_fp,
       max(win_min) AS max_fp
FROM mins
WHERE pos < n_grams - {WINNOW_W - 1} + 1
GROUP BY doc_id
"""


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document character distribution —
    the cheap degenerate-text detector (base64 blobs score high,
    aaaa-padding scores near 0). Explode → two aggregations, both
    partial-aggregated; entropy surfaces rounded to 4 decimals."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(F.split(F.lower(normalize_text("text")), "")).alias("c"),
    ).filter(F.length("c") > 0)
    counts = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    tot = Window.partitionBy("doc_id")
    p = F.col("k") / F.sum("k").over(tot)
    return (
        counts.withColumn("term", -p * F.log2(p))
        .groupBy("doc_id")
        .agg(F.round(F.sum("term"), 4).alias("entropy_bits"))
    )


CHAR_ENTROPY_SQL = r"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g'))), '')) AS c
  FROM documents
), counts AS (
  SELECT doc_id, c, count(*) AS k FROM chars WHERE len(c) > 0 GROUP BY doc_id, c
), probs AS (
  SELECT doc_id, k * 1.0 / sum(k) OVER (PARTITION BY doc_id) AS p FROM counts
)
SELECT doc_id, round(sum(-p * log2(p)), 4) AS entropy_bits
FROM probs GROUP BY doc_id
"""

def bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE TRAINING round, distributed: find the most frequent
    adjacent pair (round 1), fuse it everywhere in the symbolized
    corpus, and emit the post-merge top-20 pair counts — the state
    after two rounds of the BPE loop. The winning pair rides a
    broadcast scalar join into a row-local replace; no driver-side
    loop state beyond the one-row winner.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(ts.tokens("text")).alias("tok")).filter(
        F.length("tok") >= 2
    )
    # symbolize: "abc" -> "a b c" (space-separated symbol workspace)
    sym = toks.select(
        F.concat_ws(" ", F.split(F.col("tok"), "(?!^)(?=.)")).alias("s")
    )
    first_pairs = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("tok") - 1),
                    lambda i: F.col("tok").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w1 = Window.orderBy(F.desc("n"), F.asc("pair"))
    top1 = (
        first_pairs.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") == 1)
        .select(
            F.concat(
                F.substring("pair", 1, 1), F.lit(" "), F.substring("pair", 2, 1)
            ).alias("spaced"),
            F.col("pair").alias("fused"),
        )
    )
    merged = sym.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("s"), F.col("spaced"), F.col("fused")).alias("s")
    )
    # Guard size(syms) < 2: Spark's sequence(1, 0) is the DESCENDING
    # array [1, 0], so the transform would index out of bounds (ANSI
    # runtime error on 4.x) for any token that fused into a single
    # symbol — e.g. a standalone token equal to the winning pair.
    # DuckDB's generate_series(1, 0) is empty, so only Spark needs it.
    post = merged.select(F.split("s", " ").alias("syms")).select(
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN CAST(array() AS array<string>)"
                " ELSE transform(sequence(1, size(syms) - 1),"
                " i -> concat(syms[i - 1], '|', syms[i])) END"
            )
        ).alias("pair")
    )
    w2 = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        post.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 20)
        .select("pair", "n", F.col("rnk").cast("long").alias("rnk"))
    )


BPE_APPLY_SQL = r"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
  ) WHERE len(tok) >= 2
), first_pairs AS (
  SELECT substr(tok, i, 2) AS pair, count(*) AS n
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tok) - 1)) AS i)
  GROUP BY pair
), top1 AS (
  SELECT substr(pair, 1, 1) || ' ' || substr(pair, 2, 1) AS spaced, pair AS fused
  FROM first_pairs ORDER BY n DESC, pair ASC LIMIT 1
), sym AS (
  SELECT list_aggregate(string_split(tok, ''), 'string_agg', ' ') AS s FROM toks
), merged AS (
  SELECT replace(s, (SELECT spaced FROM top1), (SELECT fused FROM top1)) AS s FROM sym
), post AS (
  SELECT syms[i] || '|' || syms[i + 1] AS pair
  FROM (SELECT string_split(s, ' ') AS syms FROM merged),
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
), counted AS (
  SELECT pair, count(*) AS n FROM post GROUP BY pair
)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rnk
FROM counted QUALIFY rnk <= 20
"""


QUERIES.update(
    {
        "bpe_pair_counts": bpe_pair_counts,
        "bpe_apply_merge": bpe_apply_merge,
        "winnow_fingerprints": winnow_fingerprints,
        "char_entropy": char_entropy,
    }
)
ORACLES.update(
    {
        "bpe_pair_counts": BPE_PAIR_SQL,
        "bpe_apply_merge": BPE_APPLY_SQL,
        "winnow_fingerprints": WINNOW_SQL,
        "char_entropy": CHAR_ENTROPY_SQL,
    }
)


def vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary stats per source: total token volume N,
    vocabulary size V, and the implied growth exponent ln(V)/ln(N) —
    the one-glance diagnostic for synthetic/templated text (tiny beta:
    vocabulary saturated; ~0.5: natural-language growth). Explode →
    one partial-aggregated groupBy; distinct-count is the only
    shuffle-heavy term and it rides the same hash partitioning."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(ts.tokens("text")).alias("tok"))
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            # fixed-point floor(x*K+0.5), the repo's cross-engine
            # rounding rule — plain round() differs on half-ties
            (
                F.floor(F.log("vocab") / F.log("n_tokens") * 10000 + 0.5) / 10000
            ).alias("heaps_beta"),
        )
        .orderBy("source")
    )


VOCAB_GROWTH_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
)
SELECT source,
       count(*) AS n_tokens,
       count(DISTINCT tok) AS vocab,
       floor(ln(count(DISTINCT tok)) / ln(count(*)) * 10000 + 0.5) / 10000 AS heaps_beta
FROM toks
GROUP BY source
ORDER BY source
"""

QUERIES["vocab_growth_by_source"] = vocab_growth_by_source
ORACLES["vocab_growth_by_source"] = VOCAB_GROWTH_SQL


CHUNK_W = 64  # sliding chunk width (tokens)
CHUNK_S = 48  # stride (tokens) → 16-token overlap


def chunk_sliding_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window chunking: width-64 token chunks every
    48 tokens (16-token overlap so no sentence is split across a
    retrieval boundary without context). Pure Catalyst — one
    ``sequence`` of chunk starts per doc, one explode; no UDTF, no
    join. Each chunk carries its token length and an md5 content hash
    (the downstream embedding-cache key). Trailing partial chunks are
    kept: retrieval must cover the document tail."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("_toks")
    starts = F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(CHUNK_S))
    return (
        d.withColumn("_toks", ts.tokens("text"))
        .select("doc_id", t.alias("_toks"), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.least(
                F.lit(CHUNK_W), F.size("_toks") - F.col("start") + 1
            ).cast("long").alias("n_tokens"),
            F.md5(F.array_join(F.slice("_toks", F.col("start"), CHUNK_W), " ")).alias(
                "chunk_hash"
            ),
        )
    )


CHUNK_SLIDING_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       CAST(least({CHUNK_W}, len(toks) - (1 + i * {CHUNK_S}) + 1) AS BIGINT) AS n_tokens,
       md5(array_to_string(toks[(1 + i * {CHUNK_S}):(1 + i * {CHUNK_S}) + {CHUNK_W - 1}], ' ')) AS chunk_hash
FROM t, LATERAL (
  SELECT unnest(generate_series(0,
      CAST(floor((greatest(len(toks), 1) - 1) * 1.0 / {CHUNK_S}) AS BIGINT))) AS i)
"""


OOV_VOCAB_K = 1000


def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus' own
    top-1000 token vocabulary (count desc, token asc tie-break) — the
    tokenizer-fit signal: a doc full of OOV tokens is junk, another
    script, or markup. Two-phase vocab count, broadcast vocab join,
    integer basis points."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(ts.tokens("text")).alias("tok"))
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("_in"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.expr("n_oov * 10000 DIV n_tokens").alias("oov_bps"),
        )
    )


OOV_RATE_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rk
    FROM tok GROUP BY tok
  ) WHERE rk <= {OOV_VOCAB_K}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS oov_bps
FROM tok LEFT JOIN vocab v USING (tok)
GROUP BY doc_id
"""

QUERIES["chunk_sliding_stride"] = chunk_sliding_stride
ORACLES["chunk_sliding_stride"] = CHUNK_SLIDING_SQL
QUERIES["oov_rate"] = oov_rate
ORACLES["oov_rate"] = OOV_RATE_SQL


BPE_ROUNDS = 3


def bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL iterative BPE training, ``BPE_ROUNDS`` merge rounds
    distributed end-to-end — the loop `bpe_apply_merge` unrolls once,
    now run to a (small) vocabulary: each round counts adjacent symbol
    pairs corpus-wide, picks the winner (n DESC, pair ASC — the
    deterministic argmax), fuses it EVERYWHERE, and repeats on the
    re-segmented corpus. Emits the learned merge table
    (round, pair, n) — i.e. the tokenizer vocabulary delta.

    Representation (r4 — VERDICT task 7, ~vocab-sized rounds): the
    working set is the DISTINCT token vocabulary with occurrence
    FREQUENCIES, segmented ONCE into a symbol ARRAY carried (and
    checkpointed) across rounds — never re-split from text. This is
    the classic trainer layout (Sennrich et al. ACL'16 train on word
    counts): pair counts are sum(freq) per adjacent symbol pair, so
    each round's work is O(|vocab|), not O(|occurrences|) — the Zipf
    gap that made the old per-occurrence loop 51.9 s at sf1.

    - the fuse is a left-to-right stack fold over the symbol array
      (aggregate HOF): merge x into the accumulator tail when
      (tail, x) == (a, b) — exactly BPE's canonical leftmost-first
      non-overlapping fuse (runs like ``A A A`` merge once).
    - the winning pair rides a broadcast 1-row join into the fuse
      (no driver collect); the vocab is reliably checkpointed each round
      so the plan stays flat (lineage discipline proven by the
      PageRank/components operators).

    Scale: each round is one pair-count shuffle over the DISTINCT pair
    space (map-side partial agg eats the stream) + one map-only fuse
    over the vocabulary. Rounds are inherently sequential — that is
    BPE, not the engine. The oracle unrolls all rounds as DuckDB CTEs
    over the same (token, freq) representation, so the loop's
    composition is hash-certified, not just one round.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(ts.tokens("text")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split(F.col("tok"), "(?!^)(?=.)").alias("syms"), "freq")
    )
    rounds = []
    for r in range(1, BPE_ROUNDS + 1):
        pairs = vocab.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) < 2"
                    " THEN CAST(array() AS array<struct<a:string,b:string>>)"
                    " ELSE transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b)) END"
                )
            ).alias("p"),
            "freq",
        )
        counts = pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
            F.sum("freq").alias("n")
        )
        # orderBy().limit(1) compiles to TakeOrderedAndProject — a
        # distributed per-partition top-1 + tiny driver merge, never
        # the single-partition funnel a global row_number window is.
        top1 = counts.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1)
        rounds.append(
            top1.select(
                F.lit(r).cast("long").alias("round"),
                F.concat("a", F.lit("|"), "b").alias("pair"),
                "n",
            )
        )
        # LEFT join on true, not crossJoin: an empty top1 (a round with
        # no pairs anywhere — fully-fused vocab) must pass rows through
        # untouched, not annihilate them (crossJoin with an empty side
        # produces ZERO rows — review catch, same family as the
        # sequence(1,0) ANSI trap). Stack-fold fuse: tail==a and x==b
        # merge; the merged symbol a||b is strictly longer than a, so
        # it can never re-match as the left element within this pass —
        # leftmost-first semantics hold even for A A A runs.
        vocab = (
            vocab.join(F.broadcast(top1), F.lit(True), "left")
            .select(
                F.when(F.col("a").isNull(), F.col("syms"))
                .otherwise(
                    F.expr(
                        "aggregate(syms, CAST(array() AS array<string>),"
                        " (out, x) -> CASE WHEN size(out) > 0"
                        "   AND element_at(out, -1) = a AND x = b"
                        "  THEN concat(slice(out, 1, size(out) - 1),"
                        "              array(concat(a, b)))"
                        "  ELSE concat(out, array(x)) END)"
                    )
                )
                .alias("syms"),
                "freq",
            )
        )
        vocab = reliable_checkpoint(vocab)
    out = rounds[0]
    for t in rounds[1:]:
        out = out.unionByName(t)
    return out


def _bpe_train_sql() -> str:
    # same (distinct token, freq) working set as the Spark loop: the
    # two-space symbol-string replace is DuckDB's formulation of the
    # array stack-fold — identical leftmost-first fuse semantics.
    head = r"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
  ) WHERE len(tok) >= 2
), c0 AS (
  SELECT ' ' || list_aggregate(string_split(tok, ''), 'string_agg', '  ') || ' ' AS s,
         count(*) AS freq
  FROM toks GROUP BY tok
)"""
    ctes, selects = [], []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"c{r - 1}"
        ctes.append(
            f""", p{r} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS n
  FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM {prev}),
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
  GROUP BY 1, 2
), t{r} AS (
  SELECT a, b, n FROM p{r} ORDER BY n DESC, a ASC, b ASC LIMIT 1
), c{r} AS (
  SELECT CASE WHEN (SELECT count(*) FROM t{r}) = 0 THEN s
              ELSE replace(s,
                ' ' || (SELECT a FROM t{r}) || '  ' || (SELECT b FROM t{r}) || ' ',
                ' ' || (SELECT a FROM t{r}) || (SELECT b FROM t{r}) || ' ') END AS s,
         freq
  FROM {prev}
)"""
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS round, a || '|' || b AS pair, n FROM t{r}"
        )
    return head + "".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


BPE_TRAIN_SQL = _bpe_train_sql()

QUERIES.update({"bpe_train_rounds": bpe_train_rounds})
ORACLES.update({"bpe_train_rounds": BPE_TRAIN_SQL})


PHRASE_A, PHRASE_B = "key", "order"


def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index phrase query: exact-phrase retrieval
    ("key order") as a positional-postings self-join — the IR-engine
    primitive (Lucene's PhraseQuery) expressed relationally. The
    postings relation (token, doc_id, position) is what a search
    pipeline MATERIALIZES bucketed by token; here it is built inline
    (posexplode) and immediately queried: only the two phrase tokens'
    postings survive the filter (predicate pushdown on the token
    column of a materialized index ⇒ two posting-list scans, exactly
    like an IR engine), then adjacency is b.pos = a.pos + 1 on the
    same doc — an equi-join, never a text rescan.

    Output: doc_id + occurrence count per matching doc.
    """
    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id",
        F.posexplode(ts.tokens("text")).alias("pos", "tok"),
    ).filter(F.col("tok").isin(PHRASE_A, PHRASE_B))
    a = postings.filter(F.col("tok") == PHRASE_A).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = postings.filter(F.col("tok") == PHRASE_B).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b")) & (F.col("pb") == F.col("pa") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


PHRASE_SEARCH_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), postings AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
  WHERE t[i] IN ('{PHRASE_A}', '{PHRASE_B}')
)
SELECT a.doc_id, count(*) AS n_hits
FROM postings a
JOIN postings b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.tok = '{PHRASE_A}' AND b.tok = '{PHRASE_B}'
GROUP BY a.doc_id
"""

QUERIES.update({"phrase_search_postings": phrase_search_postings})
ORACLES.update({"phrase_search_postings": PHRASE_SEARCH_SQL})


def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN→APPLY composition: learn the 3 BPE merges corpus-wide
    (same loop as ``bpe_train_rounds``) and measure the segmentation
    they buy PER DOCUMENT — symbols before vs after, and the saving in
    integer bps. This is the per-doc token-budget readout a training
    pipeline uses to cost documents under a tokenizer; running it as
    one query proves the learned merges and their application compose
    (the oracle re-derives the full chain, not just the merge table).

    r4 (VERDICT task 7): training runs on the DISTINCT (token, freq)
    vocabulary — identical winners, since sum(freq) over the vocab ==
    count over occurrences — and the learned merges are applied to the
    per-document corpus ONCE at the end as a chain of broadcast-joined
    replaces (application composes: replace(replace(c0,m1),m2) is
    exactly the interleaved loop's end state). Per-round cost drops
    from O(|occurrences|) to O(|vocab|) and the per-doc corpus is
    never checkpointed at all — one map-only pass."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(ts.tokens("text")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.concat_ws("  ", F.split(F.col("tok"), "(?!^)(?=.)")),
                F.lit(" "),
            ).alias("s"),
            "freq",
        )
    )
    merges = []
    for _ in range(BPE_ROUNDS):
        pairs = vocab.select(
            F.split(F.trim("s"), "  ").alias("syms"), "freq"
        ).select(
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) < 2"
                    " THEN CAST(array() AS array<struct<a:string,b:string>>)"
                    " ELSE transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b)) END"
                )
            ).alias("p"),
            "freq",
        )
        counts = pairs.groupBy(
            F.col("p.a").alias("a"), F.col("p.b").alias("b")
        ).agg(F.sum("freq").alias("n"))
        top1 = counts.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1)
        merges.append(top1.select("a", "b"))
        # LEFT join on true (see bpe_train_rounds): an empty top1 must
        # NOT annihilate the vocab — every row passes through.
        vocab = (
            vocab.join(F.broadcast(top1), F.lit(True), "left")
            .select(
                F.when(
                    F.col("a").isNull(), F.col("s")
                ).otherwise(
                    F.replace(
                        "s",
                        F.concat(F.lit(" "), "a", F.lit("  "), "b", F.lit(" ")),
                        F.concat(F.lit(" "), "a", "b", F.lit(" ")),
                    )
                ).alias("s"),
                "freq",
            )
        )
        vocab = reliable_checkpoint(vocab)
    # APPLY once: per-doc corpus built a single time, merges chained as
    # broadcast 1-row joins — map-only, no per-round materialization
    corpus = d.select(
        "doc_id", F.explode(ts.tokens("text")).alias("tok")
    ).filter(F.length("tok") >= 2).select(
        "doc_id",
        F.length("tok").alias("n_chars_tok"),
        F.concat(
            F.lit(" "),
            F.concat_ws("  ", F.split(F.col("tok"), "(?!^)(?=.)")),
            F.lit(" "),
        ).alias("s"),
    )
    for m in merges:
        corpus = corpus.join(F.broadcast(m), F.lit(True), "left").select(
            "doc_id",
            "n_chars_tok",
            F.when(F.col("a").isNull(), F.col("s"))
            .otherwise(
                F.replace(
                    "s",
                    F.concat(F.lit(" "), "a", F.lit("  "), "b", F.lit(" ")),
                    F.concat(F.lit(" "), "a", "b", F.lit(" ")),
                )
            )
            .alias("s"),
        )
    return (
        corpus.select(
            "doc_id",
            "n_chars_tok",
            F.size(F.split(F.trim("s"), "  ")).cast("long").alias("n_syms"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_chars_tok").alias("syms_before"),
            F.sum("n_syms").alias("syms_after"),
        )
        .withColumn(
            "saved_bps",
            F.expr("(syms_before - syms_after) * 10000 div syms_before"),
        )
    )


def _bpe_apply_vocab_sql() -> str:
    # mirrors the r4 Spark shape: train on (distinct token, freq) CTEs
    # v0..vN, then apply the learned merges to the per-doc corpus once
    # at the end via chained replaces (application composes).
    head = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
  ) WHERE len(tok) >= 2
), v0 AS (
  SELECT ' ' || list_aggregate(string_split(tok, ''), 'string_agg', '  ') || ' ' AS s,
         count(*) AS freq
  FROM toks GROUP BY tok
)"""
    ctes = []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"v{r - 1}"
        ctes.append(
            f""", p{r} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS n
  FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM {prev}),
       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
  GROUP BY 1, 2
), t{r} AS (
  SELECT a, b FROM p{r} ORDER BY n DESC, a ASC, b ASC LIMIT 1
), v{r} AS (
  SELECT CASE WHEN (SELECT count(*) FROM t{r}) = 0 THEN s
              ELSE replace(s,
                ' ' || (SELECT a FROM t{r}) || '  ' || (SELECT b FROM t{r}) || ' ',
                ' ' || (SELECT a FROM t{r}) || (SELECT b FROM t{r}) || ' ') END AS s,
         freq
  FROM {prev}
)"""
        )
    # apply: fold the merge chain into one nested replace expression
    expr = "' ' || list_aggregate(string_split(tok, ''), 'string_agg', '  ') || ' '"
    for r in range(1, BPE_ROUNDS + 1):
        expr = f"""CASE WHEN (SELECT count(*) FROM t{r}) = 0 THEN ({expr})
              ELSE replace(({expr}),
                ' ' || (SELECT a FROM t{r}) || '  ' || (SELECT b FROM t{r}) || ' ',
                ' ' || (SELECT a FROM t{r}) || (SELECT b FROM t{r}) || ' ') END"""
    tail = f""", applied AS (
  SELECT doc_id, len(tok) AS n_chars_tok,
         {expr} AS s
  FROM toks
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(n_chars_tok) AS BIGINT) AS syms_before,
       CAST(sum(len(string_split(trim(s), '  '))) AS BIGINT) AS syms_after,
       (CAST(sum(n_chars_tok) AS BIGINT) - CAST(sum(len(string_split(trim(s), '  '))) AS BIGINT))
         * 10000 // CAST(sum(n_chars_tok) AS BIGINT) AS saved_bps
FROM applied
GROUP BY doc_id
"""
    return head + "".join(ctes) + tail


BPE_SEGMENT_SQL = _bpe_apply_vocab_sql()

QUERIES.update({"bpe_segment_docs": bpe_segment_docs})
ORACLES.update({"bpe_segment_docs": BPE_SEGMENT_SQL})


KMV_TOK_K = 256
_KMV_SPAN = 1 << 48  # 12 hex md5 digits — parsed identically by both engines


def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KMV distinct-token estimate — the oracle-backed
    twin of ``approx_distinct_tokens`` (HLL++, rows-only). Same
    tokenizer as ``token_frequencies``; h = first 48 bits of
    md5(token); keep the K=256 smallest distinct hashes; estimate
    (K-1)·2^48 / h_K. md5 ordering is engine-independent, so the
    estimate hash-matches DuckDB exactly while HLL binaries cannot.
    Scale shape: map-side distinct + two-phase (16-sliver salted then
    re-rank) k-min — no global sort, no single-task hash scan."""
    d = load_table(spark, sf_dir, "documents")
    hashed = (
        d.select(F.explode(ts.tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        .select(
            F.conv(F.substring(F.md5("token"), 1, 12), 16, 10)
            .cast("long")
            .alias("h")
        )
        .distinct()
    )
    w1 = Window.partitionBy(F.pmod("h", F.lit(16))).orderBy("h")
    pre = (
        hashed.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= KMV_TOK_K)
        .drop("r")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("h")
    kmin = (
        pre.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_TOK_K)
    )
    return kmin.agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth_hash")
    ).select(
        "k_eff",
        "kth_hash",
        F.expr(
            f"case when k_eff < {KMV_TOK_K} then k_eff "
            f"else {(KMV_TOK_K - 1) * _KMV_SPAN} div kth_hash end"
        )
        .cast("long")
        .alias("est_tokens"),
    )


KMV_TOKENS_SQL = rf"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), hashed AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS h
  FROM toks WHERE len(token) > 0
), kmin AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS r FROM hashed
  ) WHERE r <= {KMV_TOK_K}
)
SELECT count(*) AS k_eff,
       max(h) AS kth_hash,
       CAST(CASE WHEN count(*) < {KMV_TOK_K} THEN count(*)
                 ELSE {(KMV_TOK_K - 1) * _KMV_SPAN} // max(h) END AS BIGINT) AS est_tokens
FROM kmin
"""

QUERIES.update({"kmv_distinct_tokens": kmv_distinct_tokens})
ORACLES.update({"kmv_distinct_tokens": KMV_TOKENS_SQL})


KEYTERM_K = 3
KEYTERM_MIN_LEN = 4  # skip short function words


def doc_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF (ln(N/df),
    quantized to integer micro-units before the tf multiply so the
    score — and therefore the ranking — is bit-identical across
    engines). The per-doc complement of ``salient_terms_by_lang``:
    document tagging / index-time keyword fields. One token explode →
    (doc, term) tf; df and N fold to a term-level table that joins
    back broadcast; the rank window partitions by doc_id — corpus-
    parallel, no global ordering anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ts.tokens("text")).alias("term")
    ).filter(F.length("term") >= KEYTERM_MIN_LEN)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.select(F.count(F.lit(1)).alias("n"))
    df_ = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs), F.lit(True), "left")
        .select(
            "term",
            F.floor(F.log(F.col("n") / F.col("df")) * 1_000_000)
            .cast("long")
            .alias("idf_micro"),
        )
    )
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.col("idf_micro")).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= KEYTERM_K)
        .select("doc_id", "rnk", "term", "score_micro")
    )


DOC_KEYTERMS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
  ) WHERE len(term) >= {KEYTERM_MIN_LEN}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), idf AS (
  SELECT term,
         CAST(floor(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df) * 1000000) AS BIGINT) AS idf_micro
  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)
), scored AS (
  SELECT doc_id, term, CAST(tf * idf_micro AS BIGINT) AS score_micro
  FROM tf JOIN idf USING (term)
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, term ASC) AS BIGINT) AS rnk,
       term, score_micro
FROM scored QUALIFY rnk <= {KEYTERM_K}
"""

QUERIES.update({"doc_keyterms": doc_keyterms})
ORACLES.update({"doc_keyterms": DOC_KEYTERMS_SQL})


ZIPF_TOP = 1000  # head of the rank-frequency curve fitted


def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    ln(freq) against ln(rank) over the top-1000 tokens — natural text
    sits near slope −1; strong deviation flags boilerplate floods or
    templated/generated corpora, so this is a one-number corpus-health
    gauge. Uses the engines' shared ``regr_*`` aggregate family (the
    nation_revenue_trend idiom); the top-k is TakeOrderedAndProject —
    the rank window orders only 1000 rows, never the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(ts.tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    xy = freqs.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.expr("regr_slope(y, x)"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(y, x)"), 4).alias("zipf_intercept"),
        F.round(F.expr("regr_r2(y, x)"), 4).alias("r2"),
    )


ZIPF_SQL = rf"""
WITH freqs AS (
  SELECT token, count(*) AS freq
  FROM (
    SELECT unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS token
    FROM documents
  )
  WHERE len(token) > 0
  GROUP BY token
  ORDER BY freq DESC, token ASC
  LIMIT {ZIPF_TOP}
), xy AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC) AS DOUBLE)) AS x,
         ln(CAST(freq AS DOUBLE)) AS y
  FROM freqs
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(y, x), 4) AS zipf_slope,
       round(regr_intercept(y, x), 4) AS zipf_intercept,
       round(regr_r2(y, x), 4) AS r2
FROM xy
"""

QUERIES.update({"zipf_fit_tokens": zipf_fit_tokens})
ORACLES.update({"zipf_fit_tokens": ZIPF_SQL})
