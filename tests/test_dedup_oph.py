"""One-Permutation-Hashing MinHash: the large-scale signature path
(1 hash per shingle instead of n_perm) must have candidate recall
identical to the classic scheme — every true near-dup pair (exact
n-gram Jaccard ≥ 0.5) appears in the OPH banded-LSH candidate set."""

from __future__ import annotations

from etl_extractor_spark.operators.dedup import (
    hashed_shingles,
    lsh_candidate_pairs,
    minhash_signatures_oph,
    ngram_jaccard_pairs,
)
from etl_extractor_spark.sources.parquet import load_table


def test_oph_candidates_cover_all_true_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, "doc_id", "text").select("id_a", "id_b")
    hashed = hashed_shingles(docs, "doc_id", "text")
    cands = lsh_candidate_pairs(minhash_signatures_oph(hashed))
    assert truth.count() > 0
    assert truth.join(cands, ["id_a", "id_b"], "left_anti").count() == 0


def test_oph_signatures_have_no_nulls(spark, sf_dir):
    """Rotation densification must fill every bin for every doc that
    has at least one shingle."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_oph(hashed_shingles(docs, "doc_id", "text"))
    null_checks = " OR ".join(f"h{i} IS NULL" for i in range(96))
    assert sigs.filter(null_checks).count() == 0
