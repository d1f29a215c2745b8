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


def test_duplicated_spans_literal(spark):
    """ExactSubstr span semantics on hand-built rows: overlapping hits
    merge into one span, within-doc repeats count, clean docs report
    zero. min_len=10; doc A and B share a 12-char substring (3 shingle
    positions -> 1 merged span of 12 chars); doc C repeats a 10-char
    block twice internally at distance > 10 (2 disjoint spans); doc D
    is unique."""
    from etl_extractor_spark.operators.dedup import duplicated_spans

    rows = [
        (1, "XXABCDEFGHIJKLYY"),     # shares ABCDEFGHIJKL with doc 2
        (2, "zzABCDEFGHIJKLqq"),
        (3, "0123456789----0123456789"),  # internal repeat, 2 spans
        (4, "unique text nothing repeats here at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id",
            "text",
            min_len=10,
        )
        .collect()
    }
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_chars"] == 12
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_chars"] == 12
    assert out[3]["n_dup_spans"] == 2 and out[3]["dup_chars"] == 20
    assert out[4]["n_dup_spans"] == 0 and out[4]["dup_chars"] == 0
    assert abs(out[1]["dup_frac"] - round(12 / 16, 4)) < 1e-9


def test_arr_signatures_chunked_equals_direct_grid(spark):
    """The chunked min-accumulate in minhash_signatures_arr (memory
    guard for huge docs) must compute exactly the same signature as the
    one-shot grid — checked on a doc larger than one 65,536-shingle
    chunk."""
    import numpy as np

    from etl_extractor_spark.operators.dedup import (
        _perm_coeffs,
        doc_shingle_hashes,
        minhash_signatures_arr,
    )

    rng = np.random.default_rng(7)
    text = "".join(rng.choice(list("abcdefgh ")) for _ in range(70_000))
    docs = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    doc_hs = doc_shingle_hashes(docs, "doc_id", "text")
    (row,) = minhash_signatures_arr(doc_hs).collect()
    got = np.array(row["sig"], dtype=np.int64)

    (hs_row,) = doc_hs.collect()
    h = np.array(hs_row["hs"], dtype=np.int64).astype(np.uint64)
    assert len(h) > 65_536  # actually exercises the chunk boundary
    # _perm_coeffs returns int64 VIEWS since the r10 kernel rewrite
    # (int64 is the fast dtype on this deployment); the reference grid
    # here stays in uint64, so view the coeffs back — bit-identical.
    a, b = (c.view(np.uint64) for c in _perm_coeffs(96))
    want = (h[None, :] * a[:, None] + b[:, None]).min(axis=1).astype(np.int64)
    assert np.array_equal(got, want)
