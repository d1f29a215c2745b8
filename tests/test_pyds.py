"""Python Data Source API (Spark 4) envelope reader."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_extractor_spark.sources.pyds import register


def _write(d, name, payload):
    with open(os.path.join(d, name), "w") as fh:
        json.dump(payload, fh)


def test_pyds_partition_per_file_and_flatten(spark, tmp_path):
    register(spark)
    d = str(tmp_path)
    for i in range(3):
        _write(
            d,
            f"p{i}.json",
            {
                "data": [
                    {"id": i * 10 + j, "name": f"n{i}{j}", "meta": {"s": float(j)}}
                    for j in range(3)
                ]
                + [["not", "a", "record"]]  # dropped by the unwrap contract
            },
        )
    df = (
        spark.read.format("envelope_json")
        .schema("id bigint, name string, `meta.s` double")
        .option("path", d)
        .load()
    )
    assert df.count() == 9  # non-dict entries dropped
    # one InputPartition per file — the parallel-scan contract
    assert df.select(F.spark_partition_id()).distinct().count() == 3
    got = {(r["id"], r["name"], r["meta.s"]) for r in df.collect()}
    assert (0, "n00", 0.0) in got and (21, "n21", 1.0) in got


def test_pyds_missing_field_is_null_and_errors_empty(spark, tmp_path):
    register(spark)
    d = str(tmp_path)
    _write(d, "a.json", {"data": [{"id": 1}]})  # no name field
    with open(os.path.join(d, "bad.json"), "w") as fh:
        fh.write("{not json")  # malformed file → empty partition, no failure
    df = (
        spark.read.format("envelope_json")
        .schema("id bigint, name string")
        .option("path", d)
        .load()
    )
    rows = df.collect()
    assert [(r.id, r.name) for r in rows] == [(1, None)]


def test_pyds_empty_dir_yields_empty_frame(spark, tmp_path):
    register(spark)
    df = (
        spark.read.format("envelope_json")
        .schema("id bigint, name string")
        .option("path", str(tmp_path))
        .load()
    )
    assert df.count() == 0 and df.columns == ["id", "name"]
