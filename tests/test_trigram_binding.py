"""_trigram_col must evaluate its ``toks`` argument exactly once.

r10 regression guard: the gram lambda used to reference ``toks`` as an
outer EXPRESSION, so callers passing the normalize+split tree paid a
re-evaluation per reference (and per gram under consumer filter
pushdown). The fix binds ``toks`` as a lambda variable through a
1-element array wrapper. These tests pin (a) value equivalence between
expression-input and materialized-column-input forms on edge cases,
and (b) the guard behavior for short docs.
"""

from pyspark.sql import functions as F


def test_trigram_expression_equals_materialized_column(spark):
    from etl_extractor_spark.plans.pipeline_ops import _norm_toks, _trigram_col

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "one two three"),
        (3, "too short"),          # < 3 tokens -> empty gram array
        (4, ""),                   # empty text
        (5, None),                 # null text
        (6, "  padded   spaces  collapse  here  "),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    via_expr = d.select(
        "doc_id", _trigram_col(_norm_toks(F.col("text"))).alias("g")
    ).orderBy("doc_id").collect()
    via_col = (
        d.select("doc_id", _norm_toks(F.col("text")).alias("tk"))
        .select("doc_id", _trigram_col(F.col("tk")).alias("g"))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.g) for r in via_expr] == [
        (r.doc_id, r.g) for r in via_col
    ]
    by_id = {r.doc_id: r.g for r in via_expr}
    assert by_id[1] == [
        "alpha beta gamma",
        "beta gamma delta",
        "gamma delta epsilon",
    ]
    assert by_id[2] == ["one two three"]
    assert by_id[3] == []
    assert by_id[4] == []
