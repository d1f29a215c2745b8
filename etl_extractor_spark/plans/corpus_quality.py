"""Corpus-curation queries: repetition quality metrics and benchmark
decontamination over the documents table.

Training-data pipeline staples beyond the reference's surface (the
reference cleans opinion text with scalar fns only,
`transform/clean_data.py:4-15`; these are the corpus-level analogs a
100 TB pretraining pipeline needs):

- ``gopher_repetition``  : per-document repetition statistics in the
  style of the Gopher/MassiveText quality rules — most-frequent-token
  fraction, most-frequent-bigram fraction, duplicate-trigram fraction.
  Heavily repetitive documents (boilerplate, keyword stuffing, OCR
  loops) score high and get filtered before training.
- ``decontaminate_ngrams`` : flag training documents sharing any
  4-token shingle with a benchmark corpus (here: the ``src0`` slice
  stands in for the eval set). This is the standard n-gram-overlap
  eval-decontamination pass.

Scale notes: both queries explode documents into n-gram rows — at
100 TB that is a map-side transform feeding a partial aggregation on
(doc_id, gram), so the shuffle carries pre-combined counts, not raw
grams. The benchmark gram set is DISTINCT-reduced and broadcast
(real eval benchmarks are tiny relative to the corpus); at larger
benchmark sizes Spark's runtime bloom filter on the semi join does the
same reduction without a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table


def _tokens(d: DataFrame) -> DataFrame:
    toks = F.split(
        F.trim(F.regexp_replace(F.col("text").cast("string"), r"\s+", " ")), " "
    )
    return d.select("doc_id", "source", toks.alias("toks"))


def _grams(tok_df: DataFrame, n: int) -> DataFrame:
    """Explode token arrays into n-gram rows (space-joined shingles)."""
    # Guard docs shorter than n tokens: sequence(1, k) with k < 1 is a
    # DESCENDING array in Spark, so slice(toks, 0, n) would raise under
    # ANSI mode. Empty array -> explode drops the doc, matching the SQL
    # oracle's empty generate_series.
    gram = F.expr(
        f"CASE WHEN size(toks) < {n} THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {n}))) END"
    )
    return tok_df.select(
        "doc_id", "source", F.explode(gram).alias("gram")
    )


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition metrics (Gopher-rule style): top-token frac,
    top-bigram frac, duplicate-trigram frac. Each n-gram level is a
    (doc_id, gram) partial-agg count rolled up to per-doc max/total —
    two-phase aggregation, no data leaves the doc_id partitioning
    between the two groupBys (Catalyst reuses the hash partitioning)."""
    t = _tokens(load_table(spark, sf_dir, "documents"))

    def per_doc(n: int, mx: str, tot: str, nd: str) -> DataFrame:
        return (
            _grams(t, n)
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(
                F.max("c").alias(mx),
                F.sum("c").alias(tot),
                F.count(F.lit(1)).alias(nd),
            )
        )
    uni = per_doc(1, "mx1", "tot1", "nd1")
    bi = per_doc(2, "mx2", "tot2", "nd2")
    tri = per_doc(3, "mx3", "tot3", "nd3")
    return (
        uni.join(bi, "doc_id").join(tri, "doc_id")
        .select(
            "doc_id",
            F.col("tot1").cast("long").alias("n_tokens"),
            F.round(F.col("mx1") / F.col("tot1"), 4).alias("top_token_frac"),
            F.round(F.col("mx2") / F.col("tot2"), 4).alias("top_bigram_frac"),
            F.round(1.0 - F.col("nd3") / F.col("tot3"), 4).alias(
                "dup_trigram_frac"
            ),
        )
    )


GOPHER_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg,
         list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tg
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) * 1.0 / len(toks), 4) AS top_token_frac,
       round(list_max(list_transform(list_distinct(bg), x -> len(list_filter(bg, y -> y = x)))) * 1.0 / len(bg), 4) AS top_bigram_frac,
       round(1.0 - len(list_distinct(tg)) * 1.0 / len(tg), 4) AS dup_trigram_frac
FROM g
"""


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source != src0)
    sharing at least one 4-gram with the benchmark slice (source =
    src0), with the count of distinct shared grams. The benchmark gram
    set is distinct-reduced then broadcast into the inner join; the
    per-doc distinct count is a two-phase aggregate."""
    t = _tokens(load_table(spark, sf_dir, "documents"))
    grams = _grams(t, 4)
    bench = (
        grams.filter(F.col("source") == "src0").select("gram").distinct()
    )
    train = grams.filter(F.col("source") != "src0")
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
    )


DECONTAMINATE_SQL = r"""
WITH t AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), g AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(toks)-2), i -> list_aggregate(toks[i:i+3], 'string_agg', ' '))) AS gram
  FROM t
), b AS (
  SELECT DISTINCT gram FROM g WHERE source = 'src0'
)
SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_shared
FROM g JOIN b USING (gram)
WHERE source <> 'src0'
GROUP BY 1
"""


def exactsubstr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup diagnostics: per-doc duplicated-span stats for
    exact repeats of >= 30 chars anywhere in the corpus. See
    ``operators.dedup.duplicated_spans`` for the distributed design
    (shingle-hash instead of the paper's suffix array). The oracle
    groups on the shingle STRING where the Spark plan groups on its
    xxhash64 — identical up to 64-bit collisions (~1e-8 at sf0.01)."""
    from etl_extractor_spark.operators.dedup import duplicated_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans(d, "doc_id", "text", min_len=30)


EXACTSUBSTR_SQL = r"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
sh AS (
  SELECT doc_id, unnest(range(1, n - 30 + 2)) AS pos, text
  FROM d WHERE n >= 30
), s AS (
  SELECT doc_id, pos, substring(text, CAST(pos AS INTEGER), 30) AS shingle
  FROM sh
), dup AS (
  SELECT shingle FROM s GROUP BY shingle HAVING count(*) >= 2
), m AS (
  SELECT doc_id, pos, pos + 29 AS e
  FROM s WHERE shingle IN (SELECT shingle FROM dup)
), isl AS (
  SELECT doc_id, pos, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM m
), sp AS (
  SELECT doc_id, pos, e,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM isl
), agg AS (
  SELECT doc_id, span_id, min(pos) AS s0, max(e) AS e0
  FROM sp GROUP BY 1, 2
), per AS (
  SELECT doc_id, count(*) AS n_dup_spans, sum(e0 - s0 + 1) AS dup_chars
  FROM agg GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(dup_chars, 0) AS BIGINT) AS dup_chars,
       round(coalesce(dup_chars, 0) * 1.0 / n, 4) AS dup_frac
FROM d LEFT JOIN per USING (doc_id)
"""


def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM fluency scoring with a corpus-trained unigram
    model: p(tok) = count(tok)/total over the whole corpus, doc score =
    mean negative log10 probability of its tokens (the monotone core of
    perplexity — high score = tokens rare in-domain = candidate junk).

    Scale shape: token explode → two-phase count (Zipf-skewed heavy
    hitters are absorbed by map-side partial agg); the trained vocab is
    tiny relative to the corpus, so the score-back join is a broadcast
    — the token stream itself is never shuffled, and the per-doc mean
    reuses the doc_id partitioning. Per-token log-probs are quantized
    to integer micro-units BEFORE the per-doc sum so the aggregate is
    order-independent and bit-exact vs the oracle."""
    t = _tokens(load_table(spark, sf_dir, "documents"))
    tok = t.select("doc_id", F.explode("toks").alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.floor(
            F.log10(F.col("cnt") / F.col("total")) * F.lit(1_000_000)
        ).alias("lp_micro"),
    )
    return (
        tok.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_micro").alias("s"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            # round-half-up to 4 decimals ENTIRELY in integer space:
            # target = -s/(100n) rounded = (-2s + 100n) DIV (200n).
            # round(double, 4) disagreed between engines when a doc's
            # score landed exactly on a decimal tie (caught by the sf1
            # sweep: 2.1724 vs 2.1723); integer div has no ties.
            (
                F.expr("(-2 * s + 100 * n_tokens) DIV (200 * n_tokens)")
                / F.lit(10_000.0)
            ).alias("avg_neg_log10p"),
        )
    )


UNIGRAM_LM_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), v AS (
  SELECT tok, count(*) AS cnt FROM tok GROUP BY 1
), tot AS (
  SELECT sum(cnt) AS total FROM v
), lp AS (
  SELECT tok, CAST(floor(log10(cnt * 1.0 / total) * 1000000) AS BIGINT) AS lp_micro
  FROM v, tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       ((-2 * sum(lp_micro) + 100 * count(*)) // (200 * count(*))) / 10000.0
         AS avg_neg_log10p
FROM tok JOIN lp USING (tok)
GROUP BY 1
"""


QUERIES = {
    "gopher_repetition": gopher_repetition,
    "decontaminate_ngrams": decontaminate_ngrams,
    "exactsubstr_spans": exactsubstr_spans,
    "unigram_lm_score": unigram_lm_score,
}

ORACLES = {
    "gopher_repetition": GOPHER_REPETITION_SQL,
    "decontaminate_ngrams": DECONTAMINATE_SQL,
    "exactsubstr_spans": EXACTSUBSTR_SQL,
    "unigram_lm_score": UNIGRAM_LM_SQL,
}


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM fluency score (the KenLM-shaped step
    past ``unigram_lm_score``): p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V),
    doc score = mean negative log10 over its bigrams. Conditioning on
    context separates natural word order from bag-of-words rarity —
    the filter CCNet actually uses is this shape, not the unigram one.

    Scale shape: one transform builds per-doc bigram arrays (no join),
    the bigram/context vocabularies are two-phase counts (map-side
    combine absorbs the Zipf head), and the score-back join broadcasts
    the tiny trained table. Per-bigram log-probs are floor-quantized to
    integer micro-units BEFORE the per-doc sum (order-independent,
    bit-exact vs the oracle); the per-doc mean is the same all-integer
    round-half-up as unigram_lm_score. Docs with < 2 tokens have no
    bigrams and are excluded by construction (size guard, ANSI-safe)."""
    t = _tokens(load_table(spark, sf_dir, "documents")).filter(
        F.size("toks") >= 2
    )
    toks = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bg = t.select("doc_id", F.explode(bigrams).alias("bg"))
    cnt = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    ctx = (
        cnt.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c").alias("cc"))
    )
    vocab = (
        _tokens(load_table(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    lp = (
        cnt.join(ctx, F.substring_index(cnt["bg"], " ", 1) == ctx["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                F.log10((F.col("c") + 1) / (F.col("cc") + F.col("v")))
                * F.lit(1_000_000)
            ).alias("lp_micro"),
        )
    )
    return (
        bg.join(F.broadcast(lp), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("s"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            (
                F.expr("(-2 * s + 100 * n_bigrams) DIV (200 * n_bigrams)")
                / F.lit(10_000.0)
            ).alias("avg_neg_log10p"),
        )
    )


BIGRAM_LM_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 2
), cnt AS (
  SELECT bg, count(*) AS c FROM bg GROUP BY 1
), ctx AS (
  SELECT split_part(bg, ' ', 1) AS w1, sum(c) AS cc FROM cnt GROUP BY 1
), voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(toks) AS tok FROM t)
), lp AS (
  SELECT bg,
         CAST(floor(log10((c + 1) * 1.0 / (cc + v)) * 1000000) AS BIGINT) AS lp_micro
  FROM cnt JOIN ctx ON split_part(cnt.bg, ' ', 1) = ctx.w1, voc
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       ((-2 * sum(lp_micro) + 100 * count(*)) // (200 * count(*))) / 10000.0
         AS avg_neg_log10p
FROM bg JOIN lp USING (bg)
GROUP BY 1
"""

QUERIES["bigram_lm_score"] = bigram_lm_score
ORACLES["bigram_lm_score"] = BIGRAM_LM_SQL


PMI_MIN_PAIR = 5  # minimum bigram count to stabilize the estimate


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 collocations by pointwise mutual information:
    PMI(a,b) = log10( p(a,b) / (p(a)·p(b)) ) over adjacent token
    pairs, low-count pairs dropped (PMI's classic sparse-count
    instability). The corpus-linguistics feature behind phrase
    detection (word2vec's phrase pass, quality n-gram lexicons).

    Shape: the bigram and unigram counts are two-phase aggregations;
    PMI is computed per DISTINCT bigram (vocab-sized, not corpus-
    sized) with the two scalar totals broadcast. The log10 is floor-
    quantized to micro-units for a drift-free integer ordering; ties
    broken by the pair text."""
    t = _tokens(load_table(spark, sf_dir, "documents")).filter(
        F.size("toks") >= 2
    )
    toks = F.col("toks")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bg = t.select(F.explode(pairs).alias("bg"))
    bcnt = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cab"))
    ucnt = (
        _tokens(load_table(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = bcnt.agg(F.sum("cab").alias("nb")).crossJoin(
        ucnt.agg(F.sum("c").alias("nu"))
    )
    scored = (
        bcnt.filter(F.col("cab") >= PMI_MIN_PAIR)
        .join(
            ucnt.select(F.col("tok").alias("w1"), F.col("c").alias("ca")),
            F.substring_index(F.col("bg"), " ", 1) == F.col("w1"),
        )
        .join(
            ucnt.select(F.col("tok").alias("w2"), F.col("c").alias("cb")),
            F.substring_index(F.col("bg"), " ", -1) == F.col("w2"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            "cab",
            F.floor(
                F.log10(
                    (F.col("cab") / F.col("nb"))
                    / ((F.col("ca") / F.col("nu")) * (F.col("cb") / F.col("nu")))
                )
                * F.lit(1_000_000)
            ).cast("long").alias("pmi_micro"),
        )
    )
    w = Window.orderBy(F.desc("pmi_micro"), F.asc("bg"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 25)
        .select("bg", "cab", "pmi_micro", "rk")
    )


PMI_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), bg AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bg
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 2
), bcnt AS (
  SELECT bg, count(*) AS cab FROM bg GROUP BY 1
), ucnt AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1
), tot AS (
  SELECT (SELECT sum(cab) FROM bcnt) AS nb, (SELECT sum(c) FROM ucnt) AS nu
), scored AS (
  SELECT bg, cab,
         CAST(floor(log10((cab * 1.0 / nb) /
              ((a.c * 1.0 / nu) * (b.c * 1.0 / nu))) * 1000000) AS BIGINT) AS pmi_micro
  FROM bcnt
  JOIN ucnt a ON split_part(bg, ' ', 1) = a.tok
  JOIN ucnt b ON split_part(bg, ' ', 2) = b.tok, tot
  WHERE cab >= {PMI_MIN_PAIR}
)
SELECT bg, cab, pmi_micro,
       CAST(row_number() OVER (ORDER BY pmi_micro DESC, bg ASC) AS BIGINT) AS rk
FROM scored QUALIFY rk <= 25
"""

QUERIES["pmi_collocations"] = pmi_collocations
ORACLES["pmi_collocations"] = PMI_SQL


# ---------------------------------------------------------------------------
# Source-pair similarity matrix via KMV (k-minimum-values) sketches
# ---------------------------------------------------------------------------

KMV_K = 64  # sketch size per source
KMV_NGRAM = 3  # token n-gram shingles


def source_similarity_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation similarity MATRIX between sources, from KMV
    (k-minimum-values, Beyer et al. SIGMOD'07) sketches: each source
    keeps only its k=64 smallest distinct md5(3-gram) values; for a
    pair, the Jaccard estimate is |sketch∩ ∩ k-min(union)| / k. The
    point at 100 TB: pairwise source comparison never touches raw
    shingles twice — sources compress to k hashes each (the sketches
    are mergeable partials), and the |S|^2 pair stage runs on 64-row
    sketches, not corpora. md5 ordering is deterministic, so unlike a
    random-seed sketch this one has an EXACT DuckDB oracle — the
    estimator itself is hash-certified, and its error bound (~1/sqrt(k))
    is the published KMV guarantee, not a leap of faith.

    Integer bps output; pairs emitted once (source_a < source_b).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
    # tokenize ONCE into a real column before the gram lambda slices
    # it — a lambda over the split EXPRESSION re-tokenizes per gram
    # index, O(words²) per doc (the _trigram_col lesson, r10)
    base = d.select("source", toks.alias("tk"))
    tk = F.col("tk")
    n_sh = F.size(tk) - (KMV_NGRAM - 1)
    grams = base.select(
        "source",
        F.explode(
            F.when(n_sh <= 0, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), n_sh - 1),
                    lambda i: F.concat_ws(" ", F.slice(tk, i + 1, KMV_NGRAM)),
                )
            )
        ).alias("g"),
    )
    hashed = grams.select("source", F.md5("g").alias("h")).distinct()
    # two-phase salted top-k (same trick as operators/skew.salted_topk):
    # phase 1 takes the k smallest per (source, first-hex-digit) — 16
    # parallel slivers per source instead of one task scanning the
    # source's whole distinct-hash set — then phase 2 re-ranks the
    # <= 16k survivors. Result identical to the single window.
    w1 = Window.partitionBy("source", F.substring("h", 1, 1)).orderBy("h")
    pre = (
        hashed.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= KMV_K)
        .drop("r")
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        pre.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= KMV_K)
        .select("source", "h")
    )
    # union sketch per pair: k smallest of (A ∪ B); intersection count
    # within that window estimates Jaccard. Built as sketch x
    # SOURCE-LIST (k rows per pair per side, 2k total — the oracle's
    # formulation), NOT a sketch x sketch self-join whose k x k rows
    # per pair would shuffle 32x more than the sketches themselves
    # (review catch).
    srcs = sk.select("source").distinct()
    left = (
        sk.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            F.col("a.h").alias("h"),
        )
    )
    right = (
        srcs.alias("a")
        .join(sk.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            F.col("b.h").alias("h"),
        )
    )
    union_vals = left.unionByName(right).distinct()
    wu = Window.partitionBy("sa", "sb").orderBy("h")
    kmin = (
        union_vals.withColumn("r", F.row_number().over(wu))
        .filter(F.col("r") <= KMV_K)
        .drop("r")
    )
    in_a = sk.select(F.col("source").alias("sa"), F.col("h"))
    in_b = sk.select(F.col("source").alias("sb"), F.col("h"))
    both = (
        kmin.join(in_a, ["sa", "h"], "semi")
        .join(in_b, ["sb", "h"], "semi")
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = kmin.groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("k_eff"))
    return (
        sizes.join(both, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.coalesce("n_both", F.lit(0)).alias("n_both"),
            "k_eff",
            F.expr("coalesce(n_both, 0) * 10000 div k_eff").alias("est_jaccard_bps"),
        )
    )


SOURCE_KMV_SQL = rf"""
WITH toks AS (
  SELECT source,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
  FROM documents
), grams AS (
  SELECT DISTINCT source,
         md5(array_to_string(t[(i+1):(i+{KMV_NGRAM})], ' ')) AS h
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(t) - {KMV_NGRAM})) AS i)
  WHERE len(t) >= {KMV_NGRAM}
), sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r
    FROM grams
  ) WHERE r <= {KMV_K}
), pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.h
  FROM sk a JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
  UNION
  SELECT a.source, b.source, b.h
  FROM (SELECT DISTINCT source FROM sk) a JOIN sk b ON a.source < b.source
), kmin AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
    FROM pairs
  ) WHERE r <= {KMV_K}
), inter AS (
  SELECT k.sa, k.sb, count(*) AS n_both
  FROM kmin k
  WHERE EXISTS (SELECT 1 FROM sk WHERE sk.source = k.sa AND sk.h = k.h)
    AND EXISTS (SELECT 1 FROM sk WHERE sk.source = k.sb AND sk.h = k.h)
  GROUP BY 1, 2
), sizes AS (
  SELECT sa, sb, count(*) AS k_eff FROM kmin GROUP BY 1, 2
)
SELECT s.sa AS source_a, s.sb AS source_b,
       coalesce(b.n_both, 0) AS n_both,
       s.k_eff,
       coalesce(b.n_both, 0) * 10000 // s.k_eff AS est_jaccard_bps
FROM sizes s LEFT JOIN inter b ON s.sa = b.sa AND s.sb = b.sb
"""

QUERIES["source_similarity_kmv"] = source_similarity_kmv
ORACLES["source_similarity_kmv"] = SOURCE_KMV_SQL


DSIR_BUCKETS = 4096  # hashed bigram feature space
DSIR_TARGET_LANG = "en"  # the curated target distribution
DSIR_SELECT_K = 50  # kept docs per source


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS'23 — Data Selection for
    Language Models via Importance Resampling): score every document by
    the log likelihood ratio of a TARGET distribution (here: the 'en'
    slice, standing in for the curated domain) vs the RAW corpus, over
    hashed bigram features, then keep the top-K per source. This is the
    canonical pretraining-mix selector between pure heuristics
    (text_quality) and model-based scoring (doc_quality_logreg).

    log w(doc) = Σ_b c_doc[b]·(ln p_t[b] − ln p_r[b]), add-1 smoothed
    over DSIR_BUCKETS hashed-bigram buckets. Per-bucket deltas are
    quantized to integer MICRO-units before the per-doc sum (the
    unigram_lm_score trick) so the aggregate is order-independent and
    the output column is a pure BIGINT — no float seam anywhere. The
    bucket hash is md5-derived, engine-identical.

    Scale shape: one bigram explode → (doc, bucket) count (map-side
    partial agg), the two distribution tables are DSIR_BUCKETS rows —
    broadcast by construction, NOT SF-scaled — and the per-doc score
    agg rides the doc_id partitioning. The top-K window shuffles one
    row per doc. Nothing here holds the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    # materialize the token array ONCE behind a projection boundary
    # (the text_quality lesson: subexpression elimination does not
    # reliably collapse repeated split/regexp trees — r1 bench showed
    # 9× on exactly that), then adjacent pairs via two slices +
    # zip_with — O(n) per doc, no per-position slice calls
    toked = d.select(
        "doc_id",
        "source",
        "lang",
        F.split(
            F.trim(F.regexp_replace(F.col("text").cast("string"), r"\s+", " ")), " "
        ).alias("toks"),
    )
    t = F.col("toks")
    n = F.size(t)
    bigrams = toked.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            F.when(n < 2, F.array().cast("array<string>")).otherwise(
                F.zip_with(
                    F.slice(t, 1, n - 1),
                    F.slice(t, 2, n - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "source",
        "lang",
        F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
            F.lit(DSIR_BUCKETS),
        ).alias("b"),
    )
    doc_counts = bigrams.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    # ONE aggregation yields both distributions (raw + target share the
    # explode), and the corpus totals ride a 1-row broadcast instead of
    # driver-side count() actions — two passes over the bigram stream
    # total, zero collects. (Measured trade: persisting doc_counts to
    # collapse to one pass costs MORE locally — the cache write exceeds
    # the cheap zip_with re-explode. At corpus scale, where the text
    # scan dominates, flip to `doc_counts.persist(MEMORY_AND_DISK)` and
    # derive `per` from it — the 10-100× smaller compressed form.)
    per = bigrams.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("ct"),
    )
    tot = per.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    # delta[b] = ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B)), in micro-units
    delta = per.join(F.broadcast(tot), F.lit(True), "left").select(
        "b",
        F.floor(
            (
                F.log(F.col("ct") + 1)
                - F.log(F.col("nt") + DSIR_BUCKETS)
                - F.log(F.col("cr") + 1)
                + F.log(F.col("nr") + DSIR_BUCKETS)
            )
            * F.lit(1_000_000)
        ).alias("d_micro"),
    )
    scored = (
        doc_counts.join(F.broadcast(delta), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("d_micro")).cast("long").alias("logw_micro"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("logw_micro"), F.asc("doc_id")
    )
    return scored.withColumn(
        "selected", F.row_number().over(w) <= DSIR_SELECT_K
    ).select("doc_id", "source", "n_feats", "logw_micro", "selected")


DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source, lang,
         string_split(trim(regexp_replace(CAST(text AS VARCHAR), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), bigrams AS (
  SELECT doc_id, source, lang,
         CAST(('0x' || substr(md5(array_to_string(t[i:i+1], ' ')), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
  WHERE len(t) >= 2
), doc_counts AS (
  SELECT doc_id, source, b, count(*) AS c FROM bigrams GROUP BY 1, 2, 3
), raw AS (
  SELECT b, count(*) AS cr FROM bigrams GROUP BY b
), tgt AS (
  SELECT b, count(*) AS ct FROM bigrams WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
), totals AS (
  SELECT (SELECT count(*) FROM bigrams) AS nr,
         (SELECT count(*) FROM bigrams WHERE lang = '{DSIR_TARGET_LANG}') AS nt
), delta AS (
  SELECT raw.b,
         CAST(floor((ln(coalesce(tgt.ct, 0) + 1) - ln(totals.nt + {DSIR_BUCKETS})
                     - ln(raw.cr + 1) + ln(totals.nr + {DSIR_BUCKETS}))
                    * 1000000) AS BIGINT) AS d_micro
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, totals
), scored AS (
  SELECT doc_id, source,
         CAST(sum(c) AS BIGINT) AS n_feats,
         CAST(sum(c * d_micro) AS BIGINT) AS logw_micro
  FROM doc_counts JOIN delta USING (b)
  GROUP BY 1, 2
)
SELECT doc_id, source, n_feats, logw_micro,
       row_number() OVER (PARTITION BY source
                          ORDER BY logw_micro DESC, doc_id ASC)
         <= {DSIR_SELECT_K} AS selected
FROM scored
"""

QUERIES["dsir_importance_weights"] = dsir_importance_weights
ORACLES["dsir_importance_weights"] = DSIR_SQL
