"""Format-matrix roundtrips: ORC, JSON-lines, text — values survive a
write/read cycle bit-for-bit and JSONL tolerates malformed lines."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_extractor_spark.sources import files as FF
from etl_extractor_spark.sources.parquet import load_table


def test_orc_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders.orc")
    o = load_table(spark, sf_dir, "orders")
    FF.write_orc(o, path)
    back = FF.read_orc(spark, path)
    assert back.schema == o.schema
    a = o.agg(
        F.count(F.lit(1)), F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
    ).first()
    b = back.agg(
        F.count(F.lit(1)), F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
    ).first()
    assert a == b


def test_orc_predicate_pushdown_in_plan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li.orc")
    FF.write_orc(load_table(spark, sf_dir, "lineitem"), path)
    plan = (
        FF.read_orc(spark, path)
        .filter(F.col("l_quantity") < 10)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:120]


def test_jsonl_roundtrip_and_schema_pin(spark, sf_dir, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    FF.write_jsonl(d, path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = FF.read_jsonl(spark, path, schema=schema)
    assert back.count() == d.count()
    assert back.filter(F.col("doc_id").isNull()).count() == 0
    # inferred read agrees on the row count too
    inferred = FF.read_jsonl(spark, path)
    assert inferred.count() == d.count()


def test_jsonl_malformed_lines_do_not_fail(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json at all\n{"a": 3}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    df = FF.read_jsonl(spark, str(p), schema=schema)
    rows = df.collect()  # PERMISSIVE: malformed → null row, no exception
    assert len(rows) == 3
    assert sorted(r["a"] for r in rows if r["a"] is not None) == [1, 3]


def test_text_source_lines(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\n")
    df = FF.read_text(spark, str(p))
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == ["alpha beta", "gamma"]
