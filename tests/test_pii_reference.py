"""Third opinion on the PII patterns: Python's `re` over the same
augmented text must agree with the Spark/Catalyst counts (the DuckDB
oracle is the second opinion; this pins the pattern semantics against
an implementation neither engine shares)."""

from __future__ import annotations

import re

from etl_extractor_spark.plans.pii import EMAIL_RE, IPV4_RE, PHONE_RE, pii_redaction


def _aug(doc_id: int, text: str) -> str:
    s = text
    if doc_id % 3 == 0:
        s += f" contact user{doc_id}@example.com"
    if doc_id % 5 == 0:
        s += f" call +1-555-{doc_id % 10000:04d}"
    if doc_id % 7 == 0:
        s += f" from 10.0.{doc_id % 256}.{(doc_id // 256) % 256}"
    return s


def test_pii_counts_match_python_re(spark, sf_dir):
    rows = pii_redaction(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(texts)
    for r in rows:
        s = _aug(r.doc_id, texts[r.doc_id])
        assert r.n_emails == len(re.findall(EMAIL_RE, s)), r.doc_id
        assert r.n_phones == len(re.findall(PHONE_RE, s)), r.doc_id
        assert r.n_ips == len(re.findall(IPV4_RE, s)), r.doc_id
        red = re.sub(
            IPV4_RE,
            "<IP>",
            re.sub(PHONE_RE, "<PHONE>", re.sub(EMAIL_RE, "<EMAIL>", s)),
        )
        assert r.red_len == len(red), r.doc_id
