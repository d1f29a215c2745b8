"""CSV source with the reference's null semantics (S1).

The reference reads CSV with ``na_filter=False`` (reference
extract/csv_extractor.py:4-10): empty cells arrive as ``""``, never
null — and those empty strings flow through the pipeline as join keys
(SURVEY §4.2.1). Spark's CSV reader maps empty quoted/unquoted fields
to null by default, so we coalesce string columns back to ``""`` after
the read to reproduce the semantics declaratively (stays inside
codegen; no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    empty_string_for_null: bool = True,
    header: bool = True,
) -> DataFrame:
    reader = (
        spark.read.option("header", header)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # strict formats: Spark 4's lenient inference reads strings like
        # "T1" as partial ISO timestamps; pandas would keep them strings
        reader = (
            reader.option("inferSchema", True)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .option("dateFormat", "yyyy-MM-dd")
        )
    df = reader.csv(path)
    if empty_string_for_null:
        # na_filter=False parity: only string columns; typed columns keep
        # null (pandas would have failed the astype, reference coerces).
        df = df.select(
            *[
                F.coalesce(F.col(f.name), F.lit("")).alias(f.name)
                if isinstance(f.dataType, T.StringType)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return df
