"""Training-dataset preparation queries: retrieval scoring, sequence
packing, and reproducible dataset splits over the documents table.

Three operators every LLM-training pipeline runs between "cleaned
corpus" and "tokens on the accelerator", each with an exact DuckDB
oracle:

- ``bm25_scores``       : BM25 (Robertson/Sparck Jones; the Okapi
                          formulation used by Lucene/Elasticsearch) for
                          a literal query over whitespace tokens —
                          retrieval-quality scoring / hard-negative
                          mining at corpus scale. Pure two-phase
                          aggregation: per-(doc, term) tf, per-term df,
                          corpus scalars broadcast back.
- ``pack_sequences``    : concat-and-chop packing — documents in
                          doc_id order are laid end-to-end and cut
                          into fixed token-budget bins (how GPT-style
                          pretraining actually packs). The bin
                          assignment is a DISTRIBUTED prefix sum:
                          cumsum within doc_id-range chunks
                          (partitioned window) + a broadcast of the
                          tiny per-chunk offset table — no corpus-wide
                          single-task window.
- ``dataset_split_hash``: reproducible 90/5/5 train/val/test split by
                          md5 bucket of doc_id — engine-portable (the
                          md5 hex is decoded to the SAME integer in
                          Spark and DuckDB), cluster-size-independent,
                          re-run-stable; the properties seeded random
                          splits do not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_extractor_spark.functions import textstats as ts
from etl_extractor_spark.sources.parquet import load_table

BM25_TERMS = ("spark", "order", "batch")
BM25_K1 = 1.2
BM25_B = 0.75

PACK_BUDGET = 512  # tokens per packed training sequence


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for the pinned query terms.

    Plan shape: explode tokens → filter to the 3 query terms (the
    filter lands before the aggregation, so the shuffled volume is
    per-matching-token, not per-token) → per-(doc, term) tf →
    per-term df → idf; N and avgdl ride a broadcast 1-row scalar.
    """
    d = load_table(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id", ts.token_count("text").alias("dl")
    )
    toks = d.select(
        "doc_id", F.explode(ts.tokens("text")).alias("term")
    ).filter(F.col("term").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scal = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = (
        df_.crossJoin(F.broadcast(scal))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
            "avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("bm25"))
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "bm25", "rank")
    )


BM25_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl FROM d
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
  WHERE term IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scal AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), scored AS (
  SELECT tf.doc_id,
         ln((scal.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / scal.avgdl))
           AS part
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), scal
), agg AS (
  SELECT doc_id, round(sum(part), 4) AS bm25 FROM scored GROUP BY doc_id
)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
FROM agg QUALIFY rank <= 20
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing: documents in doc_id order are
    laid end-to-end; a document belongs to the bin where its FIRST
    token falls (bin = floor(prefix_tokens_before / budget)). Output:
    per-bin document count, token total, and the share of bins' tokens
    that overflow into the next bin — the packing-efficiency metrics a
    training-data job reports.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ts.token_count("text").alias("n_tok")
    )
    # Distributed prefix sum (the classic two-phase scan) instead of a
    # single global window: chunk by doc_id range, cumsum WITHIN each
    # chunk (partitioned window), then broadcast the tiny per-chunk
    # offsets back. The global-window formulation funnels the corpus
    # through ONE task; this one's only global object is |chunks| rows.
    chunked = d.withColumn("chunk", F.floor(F.col("doc_id") / F.lit(10_000)))
    wi = (
        Window.partitionBy("chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = chunked.select(
        "chunk",
        "doc_id",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(wi), F.lit(0)).alias("before_in_chunk"),
    )
    wc = Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        chunked.groupBy("chunk")
        .agg(F.sum("n_tok").alias("chunk_tok"))
        .select(
            "chunk",
            F.coalesce(F.sum("chunk_tok").over(wc), F.lit(0)).alias("offset"),
        )
    )
    binned = within.join(F.broadcast(offsets), "chunk").select(
        "doc_id",
        "n_tok",
        F.floor(
            (F.col("offset") + F.col("before_in_chunk")) / F.lit(PACK_BUDGET)
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .select("bin", "n_docs", "n_tokens", "first_doc")
    )


PACK_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS n_tok
  FROM documents
), binned AS (
  SELECT doc_id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_BUDGET}) AS BIGINT) AS bin
  FROM d
)
SELECT bin, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc
FROM binned GROUP BY bin
"""


def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split by md5 bucket of doc_id: bucket < 90
    → train, < 95 → val, else test. Per-split counts, token totals,
    and a doc_id checksum pin the exact membership, not just the
    rates."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ts.token_count("text").alias("n_tok")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_tok")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


_MD5_BUCKET = (
    "("
    + " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {1 + j}, 1)) - 1 AS BIGINT) << {4 * (7 - j)})"
        for j in range(8)
    )
    + ") % 100"
)

SPLIT_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS n_tok,
         {_MD5_BUCKET} AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM d GROUP BY split
"""


QUERIES = {
    "bm25_scores": bm25_scores,
    "pack_sequences": pack_sequences,
    "dataset_split_hash": dataset_split_hash,
}

ORACLES = {
    "bm25_scores": BM25_SQL,
    "pack_sequences": PACK_SQL,
    "dataset_split_hash": SPLIT_SQL,
}


def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle — the training-order permutation:
    position = rank of md5(doc_id) (then doc_id for total order). Same
    permutation on any cluster size, any engine, any re-run; re-seed by
    salting the hash input.

    DISTRIBUTED rank, not a global window: docs are bucketed by the
    first hash byte (256 buckets), ranked within each bucket by a
    partitioned window, and bucket offsets (a 256-row cumsum) are
    broadcast back — the corpus never funnels through one task, same
    two-phase pattern as ``pack_sequences``. The oracle states the
    straight ROW_NUMBER over the full order."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    # persist the key+hash projection: both the rank pass and the
    # bucket-size aggregate read it — without this Spark instantiates
    # the scan+md5 subtree twice (one extra corpus read)
    d = d.withColumn("b", F.substring("h", 1, 2)).persist()
    # eager build (r11): `offsets` below is broadcast — its concurrent
    # AQE job races the cold cache against the rank pass otherwise.
    d.count()
    wb = Window.partitionBy("b").orderBy("h", "doc_id")
    ranked = d.withColumn("r", F.row_number().over(wb))
    sizes = d.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "b", F.coalesce(F.sum("n").over(wo), F.lit(0)).alias("off")
    )
    return (
        ranked.join(F.broadcast(offsets), "b")
        .select("doc_id", (F.col("off") + F.col("r")).cast("long").alias("pos"))
    )


SHUFFLE_SQL = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
FROM documents
"""

QUERIES["shuffle_deterministic"] = shuffle_deterministic
ORACLES["shuffle_deterministic"] = SHUFFLE_SQL


LEAK_N = 8  # shingle width for the leakage audit


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination report: for each held-out split of the
    md5 90/5/5 partition (``dataset_split_hash``), the fraction of its
    DISTINCT 8-token shingles that also occur in train — the leakage
    audit run before trusting a val/test loss. Output in integer basis
    points (no float drift).

    Scale shape: shingles are built with one per-doc transform (no
    join), DISTINCT-reduced per split with map-side partial
    aggregation BEFORE the membership join, so the join carries unique
    shingles only. The train-side set is shuffle-joined on the shingle
    (at 100 TB it is far too big to broadcast; Spark's runtime bloom
    filter prunes the probe side), and the per-split rollup is a
    3-group aggregate. ANSI-safe: docs shorter than 8 tokens produce
    an empty shingle array via the size guard, never a descending
    sequence()."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ts.tokens("text").alias("toks")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= LEAK_N,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (LEAK_N - 1)),
            lambda i: F.array_join(F.slice(toks, i, LEAK_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = (
        d.select(split.alias("split"), F.explode(grams).alias("gram"))
        .distinct()
    )
    train = g.filter(F.col("split") == "train").select("gram")
    evals = g.filter(F.col("split") != "train")
    return (
        evals.join(
            train.withColumn("_hit", F.lit(1)), "gram", "left"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_leaked"),
        )
        .select(
            "split",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_leaked").cast("long").alias("n_leaked"),
            F.expr("n_leaked * 10000 DIV n_shingles").alias("leak_bps"),
        )
    )


LEAKAGE_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks,
         {_MD5_BUCKET} AS bucket
  FROM documents
), g AS (
  SELECT DISTINCT
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         array_to_string(toks[i:i + {LEAK_N - 1}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - {LEAK_N - 1})) AS i)
  WHERE len(toks) >= {LEAK_N}
), train AS (
  SELECT DISTINCT gram FROM g WHERE split = 'train'
)
SELECT g.split,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
       CAST(sum(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS leak_bps
FROM g LEFT JOIN train t USING (gram)
WHERE g.split <> 'train'
GROUP BY 1
"""

QUERIES["split_leakage_audit"] = split_leakage_audit
ORACLES["split_leakage_audit"] = LEAKAGE_SQL


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: decile-band documents by composite
    quality (best band first), deterministically shuffle WITHIN each
    band by md5(doc_id) — the standard curriculum/anti-curriculum
    scheduler shape, fully reproducible across cluster sizes (no
    rand(), no partition-order dependence). Output is the complete
    permutation: (doc_id, band, ord)."""
    from etl_extractor_spark.plans.text_analysis import text_quality

    q = text_quality(spark, sf_dir).select("doc_id", "quality")
    band_w = Window.orderBy(F.desc("quality"), F.asc("doc_id"))
    ord_w = Window.orderBy(
        F.asc("band"), F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")
    )
    return (
        q.withColumn("band", F.ntile(10).over(band_w).cast("long"))
        .withColumn("ord", F.row_number().over(ord_w).cast("long"))
        .select("doc_id", "band", "ord")
    )


def _curriculum_sql() -> str:
    from etl_extractor_spark.plans.text_analysis import TEXT_QUALITY_SQL

    return (
        "WITH q AS (\n" + TEXT_QUALITY_SQL + """
), banded AS (
  SELECT doc_id,
         CAST(ntile(10) OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS band
  FROM q
)
SELECT doc_id, band,
       CAST(row_number() OVER (ORDER BY band ASC,
            md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS ord
FROM banded
"""
    )


def doc_length_p99_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed p99 length gate: the overlong-document filter
    every corpus pipeline applies, with the percentile computed
    EXACTLY and distributively — per-length counts (distinct lengths
    ≪ docs), a running sum over that tiny relation, and the smallest
    length whose cumulative count reaches ceil(0.99·N). No
    approx_percentile (engine-specific sketch), no sort of the full
    corpus. Integer end-to-end; one summary row."""
    d = load_table(spark, sf_dir, "documents").select(
        ts.token_count("text").alias("len")
    )
    counts = d.groupBy("len").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(w))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    p99 = (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum") * 100 >= F.col("n") * 99)
        .agg(F.min("len").alias("p99_len"))
    )
    return (
        d.crossJoin(F.broadcast(p99))
        .agg(
            F.min(F.col("p99_len")).alias("p99_len"),
            F.sum((F.col("len") > F.col("p99_len")).cast("long")).alias(
                "n_docs_over"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "p99_len",
            "n_docs_over",
            F.expr("n_docs_over * 10000 DIV n_docs").alias("over_bps"),
        )
    )


P99_FILTER_SQL = r"""
WITH d AS (
  SELECT len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS len
  FROM documents
), counts AS (
  SELECT len, count(*) AS c FROM d GROUP BY 1
), cum AS (
  SELECT len, sum(c) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
), tot AS (
  SELECT count(*) AS n FROM d
), p99 AS (
  SELECT min(len) AS p99_len FROM cum, tot WHERE cum * 100 >= n * 99
)
SELECT CAST(min(p99.p99_len) AS BIGINT) AS p99_len,
       CAST(sum(CASE WHEN d.len > p99.p99_len THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_over,
       CAST(sum(CASE WHEN d.len > p99.p99_len THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS over_bps
FROM d, p99
"""


N_FEATURES = 256  # hashing-trick dimensionality


def hashed_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term-frequency features (the HashingTF shape):
    feature index = md5(token) mod 256 (engine-portable, vocabulary-
    free — no fit step, no dictionary to ship), one output row per
    (doc, active feature) with the tf and the doc's L2 norm alongside
    (the normalize-at-train-time contract). Map-side explode + one
    two-key aggregation; the feature space is fixed so downstream
    consumers get a stable schema at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(ts.tokens("text")).alias("tok"))
    idx = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
        F.lit(N_FEATURES),
    )
    tf = tok.select("doc_id", idx.alias("feat_idx")).groupBy(
        "doc_id", "feat_idx"
    ).agg(F.count(F.lit(1)).alias("tf"))
    norm = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("l2")
    )
    return tf.join(norm, "doc_id").select(
        "doc_id", "feat_idx", "tf", F.round("l2", 4).alias("l2_norm")
    )


_MD5_TOK_IDX = (
    "("
    + " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(md5(tok), {1 + j}, 1)) - 1 AS BIGINT) << {4 * (7 - j)})"
        for j in range(8)
    )
    + f") % {N_FEATURES}"
)

HASHED_FEATURES_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, {_MD5_TOK_IDX} AS feat_idx, count(*) AS tf
  FROM tok GROUP BY 1, 2
), norm AS (
  SELECT doc_id, sqrt(sum(tf * tf)) AS l2 FROM tf GROUP BY 1
)
SELECT tf.doc_id, feat_idx, tf, round(l2, 4) AS l2_norm
FROM tf JOIN norm USING (doc_id)
"""

QUERIES["curriculum_order"] = curriculum_order
ORACLES["curriculum_order"] = _curriculum_sql()
QUERIES["doc_length_p99_filter"] = doc_length_p99_filter
ORACLES["doc_length_p99_filter"] = P99_FILTER_SQL
QUERIES["hashed_feature_vectors"] = hashed_feature_vectors
ORACLES["hashed_feature_vectors"] = HASHED_FEATURES_SQL


import pandas as _pd


@F.pandas_udf(T.LongType())
def _rerank_stub_score(doc_ids: _pd.Series) -> _pd.Series:
    """Deterministic stand-in for a cross-encoder scorer: md5 of the
    prefixed doc_id, first 8 hex digits mod 1e6. The point is the
    PLUMBING — Arrow-batched inference over candidate rows — with a
    value DuckDB can recompute exactly (real models are not in this
    container; swapping the hash for an ONNX session.run over the same
    Series is the production change)."""
    import hashlib

    return doc_ids.map(
        lambda i: int(hashlib.md5(f"q:{i}".encode()).hexdigest()[:8], 16)
        % 1_000_000
    )


def rerank_bm25_hash_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank: BM25 top-20 candidates re-scored by an
    Arrow-vectorized 'model' (deterministic hash stub) and re-ranked.
    The two-stage shape every RAG/retrieval pipeline runs — the
    expensive model touches only k candidates, never the corpus; the
    oracle recomputes the hash score in SQL, pinning the pandas_udf
    batch path bit-for-bit."""
    cands = bm25_scores(spark, sf_dir)
    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        cands.withColumn("rerank_score", _rerank_stub_score(F.col("doc_id")))
        .withColumn("new_rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "bm25", "rank", "rerank_score", "new_rank")
    )


_MD5_QDOC = (
    "("
    + " + ".join(
        f"(CAST(strpos('0123456789abcdef', substr(md5('q:' || CAST(doc_id AS VARCHAR)), {1 + j}, 1)) - 1 AS BIGINT) << {4 * (7 - j)})"
        for j in range(8)
    )
    + ") % 1000000"
)

RERANK_SQL = (
    "WITH cands AS (\n" + BM25_SQL + f"""
)
SELECT doc_id, bm25, rank,
       {_MD5_QDOC} AS rerank_score,
       CAST(row_number() OVER (ORDER BY {_MD5_QDOC} DESC, doc_id ASC) AS BIGINT) AS new_rank
FROM cands
"""
)

QUERIES["rerank_bm25_hash_stub"] = rerank_bm25_hash_stub
ORACLES["rerank_bm25_hash_stub"] = RERANK_SQL


NEG_K = 4  # negatives per anchor


def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-negative mining for contrastive training:
    each anchor (doc_id % 50 == 0) gets 4 pseudo-random negatives —
    the 4 nearest successors on the md5 hash ring (candidates ordered
    by md5(doc_id), anchors excluded). Hash-ring selection is the
    cluster-size-independent way to draw 'random' negatives: no
    rand() state, same pairs on every run and every engine.

    Shape: the ring neighborhood is a range-limited window join — the
    candidate pool is sorted once by ring position; each anchor takes
    the next K candidates (wrapping) via a union of two bounded
    windows, never a full cross join."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ring = F.md5(F.col("doc_id").cast("string"))
    anchors = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("anchor_id"), ring.alias("a_ring")
    )
    cands = d.filter(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("neg_id"), ring.alias("c_ring")
    )
    # successors on the ring; wrap-around handled by taking the K
    # smallest ring positions as a fallback pool for every anchor
    succ = (
        anchors.join(cands, F.col("c_ring") > F.col("a_ring"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy("c_ring", "neg_id")
            ),
        )
        .filter(F.col("rk") <= NEG_K)
    )
    wrap_pool = (
        cands.withColumn(
            "rk0",
            F.row_number().over(Window.orderBy("c_ring", "neg_id")),
        )
        .filter(F.col("rk0") <= NEG_K)
    )
    wrapped = (
        anchors.join(F.broadcast(wrap_pool), F.lit(True))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy("rk0")
            ),
        )
    )
    n_succ = succ.groupBy("anchor_id").agg(F.count(F.lit(1)).alias("ns"))
    need_wrap = (
        wrapped.join(
            n_succ.withColumnRenamed("anchor_id", "aid"),
            F.col("anchor_id") == F.col("aid"),
            "left",
        )
        .withColumn("ns", F.coalesce(F.col("ns"), F.lit(0)))
        .filter(F.col("rk") <= NEG_K - F.col("ns"))
        .select("anchor_id", "neg_id", (F.col("ns") + F.col("rk")).alias("rk"))
    )
    return (
        succ.select("anchor_id", "neg_id", F.col("rk").cast("long"))
        .unionByName(need_wrap.select("anchor_id", "neg_id", F.col("rk").cast("long")))
        .select("anchor_id", "neg_id", F.col("rk").alias("neg_rank"))
    )


CONTRASTIVE_SQL = f"""
WITH d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ring FROM documents
), anchors AS (
  SELECT doc_id AS anchor_id, ring AS a_ring FROM d WHERE doc_id % 50 = 0
), cands AS (
  SELECT doc_id AS neg_id, ring AS c_ring FROM d WHERE doc_id % 50 <> 0
), succ AS (
  SELECT anchor_id, neg_id,
         row_number() OVER (PARTITION BY anchor_id ORDER BY c_ring, neg_id) AS rk
  FROM anchors JOIN cands ON c_ring > a_ring
  QUALIFY rk <= {NEG_K}
), wrap_pool AS (
  SELECT neg_id, row_number() OVER (ORDER BY c_ring, neg_id) AS rk0
  FROM cands QUALIFY rk0 <= {NEG_K}
), ns AS (
  SELECT anchor_id, count(*) AS ns FROM succ GROUP BY 1
), wrapped AS (
  SELECT a.anchor_id, w.neg_id,
         coalesce(ns.ns, 0) + row_number() OVER (PARTITION BY a.anchor_id ORDER BY w.rk0) AS rk,
         coalesce(ns.ns, 0) AS n_have,
         row_number() OVER (PARTITION BY a.anchor_id ORDER BY w.rk0) AS extra
  FROM anchors a CROSS JOIN wrap_pool w
  LEFT JOIN ns ON ns.anchor_id = a.anchor_id
  QUALIFY extra <= {NEG_K} - n_have
)
SELECT anchor_id, neg_id, CAST(rk AS BIGINT) AS neg_rank FROM succ
UNION ALL
SELECT anchor_id, neg_id, CAST(rk AS BIGINT) AS neg_rank FROM wrapped
"""

QUERIES["contrastive_negatives"] = contrastive_negatives
ORACLES["contrastive_negatives"] = CONTRASTIVE_SQL


LB_BATCH = 32  # sequences per batch
LB_WIDTH = 64  # token-count range per length bucket


def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing: group documents into token-count
    RANGE buckets (width LB_WIDTH), then form fixed-size batches of
    LB_BATCH inside each bucket, longest-first — the standard padding-
    waste reducer for sequence training (batching random-length docs
    pads every sequence to the batch max). Emits per-batch padding
    waste in integer bps so the saving is hash-certified.

    Scale shape: NO global sort/window — the ranking window partitions
    by length bucket (bounded cardinality), so at 100 TB the batching
    parallelizes across buckets instead of funneling the corpus
    through one ordered partition."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ts.token_count("text").alias("n_tok")
    )
    lb = F.expr(f"n_tok div {LB_WIDTH}").alias("len_bucket")
    w = Window.partitionBy("len_bucket").orderBy(
        F.desc("n_tok"), F.asc("doc_id")
    )
    batched = (
        d.select("doc_id", "n_tok", lb)
        .withColumn(
            "batch_id",
            F.floor((F.row_number().over(w) - 1) / LB_BATCH).cast("long"),
        )
    )
    return (
        batched.groupBy("len_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tok").cast("long").alias("max_tok"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
        .withColumn(
            "pad_waste_bps",
            F.expr(
                "(max_tok * n_docs - sum_tok) * 10000 div (max_tok * n_docs)"
            ),
        )
    )


LENGTH_BUCKETED_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\\s+', ' ', 'g')), ' ')) AS n_tok
  FROM documents
), b AS (
  SELECT doc_id, n_tok, n_tok // {LB_WIDTH} AS len_bucket,
         (row_number() OVER (PARTITION BY n_tok // {LB_WIDTH}
                             ORDER BY n_tok DESC, doc_id ASC) - 1)
              // {LB_BATCH} AS batch_id
  FROM d
)
SELECT len_bucket, batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tok) AS BIGINT) AS max_tok,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST((max(n_tok) * count(*) - sum(n_tok)) * 10000 // (max(n_tok) * count(*)) AS BIGINT) AS pad_waste_bps
FROM b GROUP BY 1, 2
"""

QUERIES["length_bucketed_batches"] = length_bucketed_batches
ORACLES["length_bucketed_batches"] = LENGTH_BUCKETED_SQL


def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    splits: the hash split is taken on the dedup CLUSTER id (the
    MinHash-pairs → connected-components assignment every dedup query
    certifies), so all members of a near-dup cluster land in the same
    split by construction. Splitting on doc_id instead silently puts
    near-identical docs in train AND test — the classic contamination
    that `split_leakage_audit` detects after the fact; this operator
    prevents it structurally. Emits per-split doc/cluster counts, the
    number of multi-doc clusters (proof the guard binds), and a
    membership checksum."""
    from etl_extractor_spark.plans.dedup import SHINGLE_K, THRESHOLD
    from etl_extractor_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents")
    clusters = D.dedup_cluster_assignments(
        d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD
    ).select("doc_id", "cluster_id")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    sized = clusters.withColumn("split", split).withColumn(
        "csize",
        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("long"),
    )
    return sized.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.countDistinct(
            F.when(F.col("csize") > 1, F.col("cluster_id"))
        ).cast("long").alias("n_multi_clusters"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


def _cluster_split_sql() -> str:
    from etl_extractor_spark.plans.dedup import DEDUP_CLUSTERS_SQL

    return (
        "WITH clusters AS (\n"
        + DEDUP_CLUSTERS_SQL
        + """
), assigned AS (
  SELECT doc_id, cluster_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
         count(*) OVER (PARTITION BY cluster_id) AS csize
  FROM clusters
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(count(DISTINCT CASE WHEN csize > 1 THEN cluster_id END) AS BIGINT) AS n_multi_clusters,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM assigned GROUP BY split
"""
    )


QUERIES["cluster_aware_split"] = cluster_aware_split
ORACLES["cluster_aware_split"] = _cluster_split_sql()


RRF_K = 60  # reciprocal-rank-fusion damping constant (Cormack et al.)


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09) of
    two retrieval rankings over the pinned BM25 query terms: the BM25
    ranking and a tf-density ranking (matching-term occurrences per
    document token — the coordination-style second voice). RRF is THE
    standard way hybrid retrieval (lexical + semantic, or any N
    rankers) combines lists without score calibration:
    rrf(d) = Σ_r 1/(K + rank_r(d)).

    Determinism: the fusion score is computed in integer MICRO-units
    (1e6 div (K + rank)) so the hash gate certifies it exactly; both
    rankers break ties by doc_id. Scale shape: candidate set = docs
    matching ≥1 term (the BM25 prefilter), so the two rank windows
    order only matching docs, never the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    dl = d.select("doc_id", ts.token_count("text").alias("dl"))
    toks = d.select(
        "doc_id", F.explode(ts.tokens("text")).alias("term")
    ).filter(F.col("term").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scal = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    idf = df_.crossJoin(F.broadcast(scal)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
        "avgdl",
    )
    bm25 = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "dl",
            (
                F.col("idf")
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
            "tf",
        )
        .groupBy("doc_id", "dl")
        .agg(
            F.round(F.sum("part"), 4).alias("bm25"),
            F.sum("tf").cast("long").alias("tf_total"),
        )
    )
    w_bm = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    # tf density in integer ppm — no float seam in the second ranker
    density = F.expr("tf_total * 1000000 div dl")
    w_tf = Window.orderBy(F.desc(density), F.asc("doc_id"))
    ranked = bm25.withColumn(
        "rank_bm25", F.row_number().over(w_bm).cast("long")
    ).withColumn("rank_tf", F.row_number().over(w_tf).cast("long"))
    fused = ranked.select(
        "doc_id",
        "rank_bm25",
        "rank_tf",
        F.expr(
            f"1000000 div ({RRF_K} + rank_bm25) + 1000000 div ({RRF_K} + rank_tf)"
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= 20)
        .select("fused_rank", "doc_id", "rank_bm25", "rank_tf", "rrf_micro")
    )


RRF_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), dl AS (
  SELECT doc_id, len(toks) AS dl FROM d
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
  WHERE term IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scal AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), scored AS (
  SELECT tf.doc_id, dl.dl, tf.tf,
         ln((scal.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / scal.avgdl))
           AS part
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), scal
), agg AS (
  SELECT doc_id, dl, round(sum(part), 4) AS bm25,
         CAST(sum(tf) AS BIGINT) AS tf_total
  FROM scored GROUP BY doc_id, dl
), ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank_bm25,
         CAST(row_number() OVER (ORDER BY tf_total * 1000000 // dl DESC, doc_id ASC) AS BIGINT) AS rank_tf
  FROM agg
), fused AS (
  SELECT doc_id, rank_bm25, rank_tf,
         CAST(1000000 // ({RRF_K} + rank_bm25) + 1000000 // ({RRF_K} + rank_tf) AS BIGINT) AS rrf_micro
  FROM ranked
)
SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS fused_rank,
       doc_id, rank_bm25, rank_tf, rrf_micro
FROM fused QUALIFY fused_rank <= 20
"""

QUERIES["rrf_fusion"] = rrf_fusion
ORACLES["rrf_fusion"] = RRF_SQL


NDCG_K = 20


def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@20 of the BM25 ranking against a deterministic graded
    relevance label (relevance = number of DISTINCT query terms a
    document contains, 0-3) — the standard ranking-quality metric a
    retrieval pipeline reports beside recall. DCG uses the classic
    (2^rel − 1)/log2(rank+1) gains; IDCG re-ranks the same top-20 pool
    by relevance (ideal order), so nDCG = DCG/IDCG ∈ (0, 1]. Everything
    derives from the already-certified BM25 ranking — one extra
    20-row window + fold, nothing corpus-scaled."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ts.tokens("text")).alias("term")
    ).filter(F.col("term").isin(*BM25_TERMS))
    rel = toks.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("rel")
    )
    top = bm25_scores(spark, sf_dir).join(rel, "doc_id")
    gains = top.select(
        "rank",
        "rel",
        ((F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rank") + 1)).alias(
            "g"
        ),
    )
    w_ideal = Window.orderBy(F.desc("rel"), F.asc("rank"))
    ideal = gains.withColumn("irank", F.row_number().over(w_ideal)).select(
        ((F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("irank") + 1)).alias(
            "ig"
        )
    )
    dcg = gains.agg(F.sum("g").alias("dcg"))
    idcg = ideal.agg(F.sum("ig").alias("idcg"))
    return (
        dcg.join(F.broadcast(idcg), F.lit(True), "left")
        .select(
            F.lit(NDCG_K).cast("long").alias("k"),
            F.round("dcg", 4).alias("dcg"),
            F.round("idcg", 4).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg"),
        )
    )


NDCG_SQL = rf"""
WITH rel AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS rel
  FROM (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
  )
  WHERE term IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
  GROUP BY doc_id
), top AS (
  {BM25_SQL.strip().rstrip()}
), joined AS (
  SELECT t.rank, r.rel FROM top t JOIN rel r USING (doc_id)
), gains AS (
  SELECT rank, rel, (pow(2.0, rel) - 1) / log2(rank + 1) AS g FROM joined
), ideal AS (
  SELECT (pow(2.0, rel) - 1)
           / log2(row_number() OVER (ORDER BY rel DESC, rank ASC) + 1) AS ig
  FROM gains
)
SELECT CAST({NDCG_K} AS BIGINT) AS k,
       round((SELECT sum(g) FROM gains), 4) AS dcg,
       round((SELECT sum(ig) FROM ideal), 4) AS idcg,
       round((SELECT sum(g) FROM gains) / (SELECT sum(ig) FROM ideal), 4) AS ndcg
"""

QUERIES["ndcg_retrieval_eval"] = ndcg_retrieval_eval
ORACLES["ndcg_retrieval_eval"] = NDCG_SQL
