"""SCD2 merge history semantics + small-file compaction."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_extractor_spark.operators.scd import scd2_initial, scd2_merge
from etl_extractor_spark.sinks.compact import compact_parquet, parquet_file_count


def test_scd2_merge_versions(spark):
    day1 = spark.createDataFrame(
        [(1, "Ann", "GOLD"), (2, "Bob", "SILVER")], ["ck", "name", "tier"]
    )
    dim = scd2_initial(day1, "ck", ["name", "tier"], "2026-01-01")

    day2 = spark.createDataFrame(
        [(1, "Ann", "PLATINUM"), (3, "Cid", "SILVER")], ["ck", "name", "tier"]
    )
    merged = scd2_merge(dim, day2, "ck", ["name", "tier"], "2026-02-01")

    rows = {(r["ck"], r["tier"], r["is_current"]): r for r in merged.collect()}
    # Ann: old GOLD row closed, new PLATINUM current
    assert rows[(1, "GOLD", False)]["valid_to"].isoformat() == "2026-02-01"
    assert rows[(1, "PLATINUM", True)]["valid_from"].isoformat() == "2026-02-01"
    # Bob absent from batch: untouched current
    assert (2, "SILVER", True) in rows
    # Cid: brand new current
    assert rows[(3, "SILVER", True)]["valid_from"].isoformat() == "2026-02-01"
    assert merged.count() == 4

    # idempotence: merging the same batch again changes nothing
    merged2 = scd2_merge(merged, day2, "ck", ["name", "tier"], "2026-03-01")
    assert merged2.count() == 4
    assert merged2.filter(F.col("is_current")).count() == 3


def test_compaction_reduces_files(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(10_000).repartition(40).write.parquet(path)
        assert parquet_file_count(path) >= 40
        before = spark.read.parquet(path).agg(F.sum("id")).first()[0]
        n = compact_parquet(spark, path, target_file_mb=128)
        assert n <= 2
        assert spark.read.parquet(path).agg(F.sum("id")).first()[0] == before
