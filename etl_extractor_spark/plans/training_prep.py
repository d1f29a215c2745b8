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
