"""Deduplication queries over the documents table.

- dedup_exact        : hash-groupBy exact dedup (oracle: md5 groups)
- dedup_ngram_jaccard: exact char-30-shingle Jaccard pairs ≥ 0.5
- dedup_minhash_lsh  : MinHash(96)+LSH(24×4) candidates verified with
                       exact Jaccard — same oracle as the exact variant
                       (precision 1; recall ≈ 1 at these params, and the
                       pipeline is fully deterministic, so oracle
                       equality is a meaningful, stable check)
- dedup_simhash      : 64-bit SimHash hamming ≤ 3 (rows-only: signature
                       semantics are hash-function-specific, not
                       SQL-expressible in DuckDB)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_extractor_spark.operators import dedup as D
from etl_extractor_spark.sources.parquet import load_table

SHINGLE_K = 30
THRESHOLD = 0.5


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(d, "doc_id", "text")


DEDUP_EXACT_SQL = r"""
SELECT md5(lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')))) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_docs
FROM documents
GROUP BY 1
"""

_JACCARD_SQL = rf"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_K}) AS s
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(text) - {SHINGLE_K - 1}))) AS i)
  WHERE len(text) >= {SHINGLE_K}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE c * 1.0 / (sa.n + sb.n - c) >= {THRESHOLD}
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD)


def dedup_minhash_lsh_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-Permutation-Hashing variant of the MinHash-LSH path (1 hash
    per shingle instead of n_perm — the 100 TB flip documented in
    operators/dedup.py). Same exact-Jaccard verification, same oracle:
    identical output is the recall-equivalence proof at this SF."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD, oph=True
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(d, "doc_id", "text", max_hamming=3)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → per-doc cluster id
    (oracle: transitive closure via DuckDB recursive CTE + min label)."""
    d = load_table(spark, sf_dir, "documents")
    return D.dedup_cluster_assignments(d, "doc_id", "text", k=SHINGLE_K, threshold=THRESHOLD)


DEDUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_K}) AS s
  FROM documents,
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
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node
)
SELECT node AS doc_id,
       CAST(min(m) AS BIGINT) AS cluster_id,
       node = min(m) AS is_canonical
FROM reach GROUP BY node
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_clusters": dedup_clusters,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_lsh_oph": dedup_minhash_lsh_oph,
    "dedup_simhash": dedup_simhash,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    "dedup_minhash_lsh": _JACCARD_SQL,
    "dedup_minhash_lsh_oph": _JACCARD_SQL,
    # dedup_simhash: rows-only (hash-specific signature, not SQL-expressible)
}


def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures under the md5-based 64-bit token hash — the
    oracle-checkable twin of the xxhash64 fast path: every one of the
    64 majority-vote bits is recomputed independently by DuckDB from
    the same md5 hex, so a single flipped bit anywhere in the packed
    bit arithmetic (sign-bit masks included) breaks the hash match."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_signatures(d, "doc_id", "text", hash_fn=D.md5_long)


def _simhash_sql() -> str:
    hexd = "'0123456789abcdef'"
    # th: signed 64-bit from two 32-bit hex halves (overflow-safe)
    half = (
        lambda lo_i: "("
        + " + ".join(
            f"(CAST(strpos({hexd}, substr(h, {lo_i + j}, 1)) - 1 AS BIGINT)"
            f" << {4 * (7 - j)})"
            for j in range(8)
        )
        + ")"
    )
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    votes = ", ".join(
        f"sum(CASE WHEN (th & CAST({m} AS BIGINT)) <> 0 THEN 1 ELSE -1 END) AS b{i}"
        for i, m in enumerate(masks)
    )
    sig = " | ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({m} AS BIGINT) ELSE 0 END)"
        for i, m in enumerate(masks)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g'))), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), th AS (
  SELECT doc_id,
         (CASE WHEN {half(1)} >= 2147483648
               THEN {half(1)} - 4294967296 ELSE {half(1)} END) * 4294967296
         + {half(9)} AS th
  FROM hashed
), votes AS (
  SELECT doc_id, {votes} FROM th GROUP BY doc_id
)
SELECT doc_id, {sig} AS simhash FROM votes
"""


SIMHASH_MD5_SQL = _simhash_sql()

QUERIES["dedup_simhash_md5"] = dedup_simhash_md5
ORACLES["dedup_simhash_md5"] = SIMHASH_MD5_SQL


def dedup_simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SimHash near-dup pipeline under the md5 token hash —
    band-blocked candidate generation + bit_count verification — with
    an EXACT oracle: DuckDB recomputes the signatures from the same md5
    hex and finds hamming ≤ 3 pairs by brute force. LSH-banding recall
    for hamming ≤ 3 over 4 × 16-bit bands is exactly 1 (pigeonhole), so
    the banded plan must equal the all-pairs oracle, not just overlap
    it."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(
        d, "doc_id", "text", max_hamming=3, hash_fn=D.md5_long
    )


SIMHASH_MD5_PAIRS_SQL = (
    "WITH sigs AS (" + SIMHASH_MD5_SQL.replace(";", "") + ")\n"
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""
)

QUERIES["dedup_simhash_md5_pairs"] = dedup_simhash_md5_pairs
ORACLES["dedup_simhash_md5_pairs"] = SIMHASH_MD5_PAIRS_SQL


# ------------------------------------------------- paragraph-level dedup

PARA_TOKENS = 4  # tokens per paragraph chunk
PARA_DF = 3  # doc-frequency at/above which a paragraph is "common"


def common_paragraph_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document paragraph filtering (Wenzek et al.,
    LREC 2020): boilerplate shows up as the SAME paragraph repeated
    across MANY documents, so each doc is scored by how much of it is
    corpus-common. Paragraphs here are consecutive ``PARA_TOKENS``-token
    chunks of the normalized text (the synthetic corpus has no newlines,
    so the chunking IS the paragraph segmentation — deterministic and
    identical in both engines). Reference parity: extends
    `transform/clean_data.py:4-29`'s per-row cleaning to corpus-global
    cleaning, which pandas cannot express without holding the corpus.

    Plan shape (100 TB): one map-side chunk explosion, one shuffle to
    compute paragraph doc-frequency, one shuffle back on the paragraph
    key to tag chunks, one per-doc aggregate that rides the doc_id
    shuffle. The doc-frequency table is filtered to df >= PARA_DF
    before the tag join, so the join's build side is only the common
    paragraphs (boilerplate is rare relative to the corpus — AQE picks
    broadcast when it fits; no forced hint because the set is
    SF-scaled). Integer bps output — no float comparisons anywhere.
    """
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
    # tokenize ONCE into a real column before the chunk lambda slices
    # it: a lambda referencing the split EXPRESSION re-evaluates the
    # tokenizer per chunk index — O(words²/PARA_TOKENS) per doc (the
    # _trigram_col lesson, r10)
    base = d.select("doc_id", toks.alias("tk"))
    tk = F.col("tk")
    n_chunks = F.ceil(F.size(tk) / F.lit(PARA_TOKENS)).cast("int")
    # Guard n_chunks == 0 (null/empty text): sequence(0, -1) would be
    # the DESCENDING [0, -1] under ANSI mode (same trap as
    # bpe_apply_merge) — emit no paragraphs instead.
    pars = F.when(n_chunks <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(tk, i * PARA_TOKENS + 1, PARA_TOKENS)
            ),
        )
    )
    # shuffle 8-byte paragraph hashes, never the ~PARA_TOKENS-word
    # strings: both the doc-frequency groupBy and the tag join key on
    # xxhash64(par) (deterministic; collisions negligible at 2^64 and
    # the oracle's string-keyed formulation pins the semantics) — the
    # same key-compression trick as operators/dedup.hashed_shingles,
    # worth ~15× on the two shuffles' byte volume.
    ex = base.select(
        "doc_id",
        F.explode(F.transform(pars, lambda p: F.xxhash64(p))).alias("ph"),
    )
    # persist the hashed-chunk table: BOTH branches (doc-frequency
    # build and tag join) read it, and recomputing means re-tokenizing
    # the corpus twice (measured 2.4s → 1.4s at sf0.1). At 100 TB this
    # is 16 bytes/paragraph — a small fraction of the text it derives
    # from — and MEMORY_AND_DISK spills instead of evicting under
    # pressure.
    from pyspark import StorageLevel

    ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    common = (
        ex.groupBy("ph")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= PARA_DF)
    )
    return (
        ex.join(common, "ph", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_par"),
            F.count("df").alias("n_common"),
        )
        .withColumn(
            "keep_bps",
            F.expr("(n_par - n_common) * 10000 div n_par"),
        )
    )


COMMON_PARAGRAPH_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
  FROM documents
), chunks AS (
  SELECT doc_id,
         array_to_string(t[(i*{PARA_TOKENS}+1):((i+1)*{PARA_TOKENS})], ' ') AS par
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0,
                  CAST(ceil(len(t)*1.0/{PARA_TOKENS}) AS BIGINT)-1)) AS i)
), dfreq AS (
  SELECT par, count(DISTINCT doc_id) AS df FROM chunks GROUP BY 1
), common AS (
  SELECT par FROM dfreq WHERE df >= {PARA_DF}
), tagged AS (
  SELECT c.doc_id, c.par, (cm.par IS NOT NULL) AS is_common
  FROM chunks c LEFT JOIN common cm USING (par)
)
SELECT doc_id,
       count(*) AS n_par,
       count(CASE WHEN is_common THEN 1 END) AS n_common,
       (count(*) - count(CASE WHEN is_common THEN 1 END)) * 10000
         // count(*) AS keep_bps
FROM tagged GROUP BY doc_id
"""

QUERIES["common_paragraph_filter"] = common_paragraph_filter
ORACLES["common_paragraph_filter"] = COMMON_PARAGRAPH_SQL


CONTAIN_BPS = 8000


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup pairs (C(a→b) >= 0.8) — the
    quote-inclusion detector Jaccard structurally misses; integer-bps
    scores, both directions emitted."""
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_containment_pairs(
        d, "doc_id", "text", k=SHINGLE_K, min_bps=CONTAIN_BPS
    )


CONTAINMENT_SQL = rf"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_K}) AS s
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, greatest(1, len(text) - {SHINGLE_K - 1}))) AS i)
  WHERE len(text) >= {SHINGLE_K}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), bothdir AS (
  SELECT id_a, id_b, c FROM common
  UNION ALL
  SELECT id_b, id_a, c FROM common
)
SELECT id_a, id_b, c * 10000 // sz.n AS containment_bps
FROM bothdir JOIN sizes sz ON id_a = sz.doc_id
WHERE c * 10000 // sz.n >= {CONTAIN_BPS}
"""

QUERIES["dedup_containment"] = dedup_containment
ORACLES["dedup_containment"] = CONTAINMENT_SQL
