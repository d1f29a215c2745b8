"""PII detection / redaction — the privacy pass of a training-data
pipeline (reference scope: transform/clean_data.py:4-29 normalizes
text but has no privacy stage; this is part of the beyond-reference
LLM-pipeline extension set). Extends ``redact_pii``
(plans/analytics3.py, customer contact strings) to the documents
corpus with IPv4 detection, conditional injection (zero-match rows
exist), and a per-source prevalence rollup.

The synthetic corpus is PII-free word soup, so each query first
APPENDS a deterministic synthetic contact block derived from doc_id
(same expression in both engines) to a subset of documents, then runs
the detector/redactor over the result. The hash gate therefore
certifies the operator itself — pattern semantics, counting, global
replacement — not the corpus content.

Scale design: pure Catalyst ``regexp_extract_all`` / ``regexp_replace``
column expressions — JVM-side, whole-stage-codegen, embarrassingly
parallel per row; no shuffle until the final (tiny) rollup. At 100 TB
this is a map-only pass fused into whatever scan feeds it.

Cross-engine regex contract: patterns stay inside the Java-regex ∩ RE2
common subset (char classes, bounded repeats, alternation — no
lookaround, no backreferences), because Spark compiles java.util.regex
while DuckDB compiles RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic synthetic PII: an email on every 3rd
    doc, a phone on every 5th, an IPv4 on every 7th (so zero-match,
    single-match and multi-kind rows all occur)."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com"))
    phone = F.concat(
        F.lit(" call +1-555-"), F.lpad(F.pmod(did, F.lit(10000)).cast("string"), 4, "0")
    )
    ip = F.concat(
        F.lit(" from 10.0."),
        F.pmod(did, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(F.floor(did / 256), F.lit(256)).cast("string"),
    )
    aug = F.concat(
        F.col("text"),
        F.when(F.pmod(did, F.lit(3)) == 0, email).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(5)) == 0, phone).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(7)) == 0, ip).otherwise(F.lit("")),
    )
    return d.select("doc_id", "source", aug.alias("aug"))


# The oracle restates the same augmentation in DuckDB SQL.
_AUG_SQL = """
SELECT doc_id,
       source,
       text
       || CASE WHEN doc_id % 3 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END
       || CASE WHEN doc_id % 5 = 0
               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END
       || CASE WHEN doc_id % 7 = 0
               THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
               ELSE '' END AS aug
FROM documents
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub: count each kind, replace every match
    with a typed placeholder, and emit the md5 of the redacted text so
    the oracle certifies the exact redacted bytes, not just counts."""
    aug = _augmented(spark, sf_dir)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(IPV4_RE), 0))
        .cast("long")
        .alias("n_ips"),
        F.length(red).cast("long").alias("red_len"),
        F.md5(red).alias("red_md5"),
    )


PII_REDACTION_SQL = f"""
WITH aug AS ({_AUG_SQL}),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(aug, '{PHONE_RE}')) AS n_phones,
         len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
           '{IPV4_RE}', '<IP>', 'g') AS redacted
  FROM aug
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(n_ips AS BIGINT) AS n_ips,
       CAST(length(redacted) AS BIGINT) AS red_len,
       md5(redacted) AS red_md5
FROM red
"""


def pii_prevalence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level privacy report: per source, how many documents
    carry each PII kind and the total match volume — the rollup a
    pipeline operator reads before deciding to quarantine a source.
    Map-only detection, one tiny groupBy at the end."""
    aug = _augmented(spark, sf_dir)
    n_e = F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), 0))
    n_p = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), 0))
    n_i = F.size(F.regexp_extract_all(F.col("aug"), F.lit(IPV4_RE), 0))
    per_doc = aug.select(
        "source",
        n_e.alias("n_e"),
        n_p.alias("n_p"),
        n_i.alias("n_i"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_e") > 0).cast("long")).alias("docs_with_email"),
            F.sum((F.col("n_p") > 0).cast("long")).alias("docs_with_phone"),
            F.sum((F.col("n_i") > 0).cast("long")).alias("docs_with_ip"),
            F.sum(F.col("n_e") + F.col("n_p") + F.col("n_i"))
            .cast("long")
            .alias("total_matches"),
        )
        .orderBy("source")
    )


PII_PREVALENCE_SQL = f"""
WITH aug AS ({_AUG_SQL}),
per_doc AS (
  SELECT source,
         len(regexp_extract_all(aug, '{EMAIL_RE}')) AS n_e,
         len(regexp_extract_all(aug, '{PHONE_RE}')) AS n_p,
         len(regexp_extract_all(aug, '{IPV4_RE}')) AS n_i
  FROM aug
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(CASE WHEN n_p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(sum(CASE WHEN n_i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
       CAST(sum(n_e + n_p + n_i) AS BIGINT) AS total_matches
FROM per_doc
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "pii_redaction": pii_redaction,
    "pii_prevalence_by_source": pii_prevalence_by_source,
}

ORACLES = {
    "pii_redaction": PII_REDACTION_SQL,
    "pii_prevalence_by_source": PII_PREVALENCE_SQL,
}


CARD_RE = r"[0-9]{16}"


def pii_luhn_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated credit-card detection: a bare ``[0-9]{16}``
    regex false-positives on order numbers and timestamps at corpus
    scale, so production PII scanners validate candidates with the
    Luhn mod-10 check before redacting. Every 3rd document gets a
    deterministic synthetic 16-digit number injected (15 digits from
    doc_id, check digit = doc_id % 10 — so only ~1 in 10 passes Luhn
    by construction), then the detector extracts candidates and
    validates them in pure integer arithmetic. Per-source report:
    candidates vs Luhn-valid.

    Map-only detection + validation (regex and digit fold both live in
    whole-stage codegen), one tiny rollup shuffle — composes with any
    scan at 100 TB like the other PII passes.
    """
    d = load_table(spark, sf_dir, "documents")
    digits15 = F.lpad(
        ((F.col("doc_id") * 7919) % F.lit(10**15)).cast("string"), 15, "0"
    )
    aug = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" cc "),
                digits15,
                (F.col("doc_id") % 10).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("aug"),
    )
    cards = aug.select(
        "source",
        F.explode_outer(
            F.regexp_extract_all(F.col("aug"), F.lit(CARD_RE), 0)
        ).alias("card"),
    )
    # Luhn: from the rightmost digit, double every 2nd digit, subtract
    # 9 when the doubled value exceeds 9, sum, valid iff sum % 10 == 0.
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (F.lit(17) - i) % 2 == 0,
            F.when(
                F.substring(F.col("card"), 1, 16).substr(i, F.lit(1)).cast("int") * 2 > 9,
                F.substring(F.col("card"), 1, 16).substr(i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(
                F.substring(F.col("card"), 1, 16).substr(i, F.lit(1)).cast("int") * 2
            ),
        ).otherwise(
            F.substring(F.col("card"), 1, 16).substr(i, F.lit(1)).cast("int")
        ),
    )
    return (
        cards.select(
            "source",
            F.col("card").isNotNull().cast("long").alias("is_cand"),
            F.when(
                F.col("card").isNotNull() & (luhn_sum % 10 == 0), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_valid"),
        )
        .groupBy("source")
        .agg(
            F.sum("is_cand").alias("n_candidates"),
            F.sum("is_valid").alias("n_luhn_valid"),
        )
        .orderBy("source")
    )


PII_LUHN_SQL = f"""
WITH aug AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 1
              THEN text || ' cc ' ||
                   lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR), 15, '0') ||
                   CAST(doc_id % 10 AS VARCHAR)
              ELSE text END AS aug
  FROM documents
), cards AS (
  SELECT source, unnest(
           CASE WHEN len(regexp_extract_all(aug, '{CARD_RE}')) = 0
                THEN [NULL]
                ELSE regexp_extract_all(aug, '{CARD_RE}') END) AS card
  FROM aug
), scored AS (
  SELECT source,
         CASE WHEN card IS NULL THEN 0 ELSE 1 END AS is_cand,
         CASE WHEN card IS NOT NULL AND
                   list_sum(list_transform(generate_series(1, 16), i ->
                     CASE WHEN (17 - i) % 2 = 0
                          THEN CASE WHEN CAST(substr(card, i, 1) AS INTEGER) * 2 > 9
                                    THEN CAST(substr(card, i, 1) AS INTEGER) * 2 - 9
                                    ELSE CAST(substr(card, i, 1) AS INTEGER) * 2 END
                          ELSE CAST(substr(card, i, 1) AS INTEGER) END)) % 10 = 0
              THEN 1 ELSE 0 END AS is_valid
  FROM cards
)
SELECT source,
       CAST(sum(is_cand) AS BIGINT) AS n_candidates,
       CAST(sum(is_valid) AS BIGINT) AS n_luhn_valid
FROM scored GROUP BY source ORDER BY source
"""

QUERIES["pii_luhn_cards"] = pii_luhn_cards
ORACLES["pii_luhn_cards"] = PII_LUHN_SQL
