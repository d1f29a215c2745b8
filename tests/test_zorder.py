"""Z-order clustered layout: multi-column file skipping.

The contract: after ``write_zordered`` on (a, b), a range predicate on
EITHER column prunes files via the manifest, while a linear layout on
``a`` alone prunes only on ``a``. Pruned scans stay row-for-row equal
to full scans (skipping is a superset guarantee).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_extractor_spark.sinks.manifest import read_with_skipping, write_with_manifest
from etl_extractor_spark.sinks.zorder import write_zordered, zvalue
from etl_extractor_spark.sources.parquet import load_table

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path_factory.mktemp("zorder") / "li_z")
    lpath = str(tmp_path_factory.mktemp("zorder") / "li_lin")
    write_zordered(spark, li, zpath, ["l_partkey", "l_suppkey"], n_files=N_FILES)
    linear = li.repartitionByRange(N_FILES, "l_partkey").sortWithinPartitions(
        "l_partkey"
    )
    write_with_manifest(
        spark, linear, lpath, stats_cols=["l_partkey", "l_suppkey"]
    )
    # middle ~20% band per column, valid at any scale factor
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    ranges = {
        "l_partkey": _mid_band(b[0], b[1]),
        "l_suppkey": _mid_band(b[2], b[3]),
    }
    return zpath, lpath, ranges


def _mid_band(lo: int, hi: int) -> tuple[int, int]:
    span = hi - lo
    return lo + int(span * 0.4), lo + int(span * 0.6)


def test_zorder_prunes_both_dimensions(spark, layouts):
    zpath, _, ranges = layouts
    _, on_a = read_with_skipping(spark, zpath, "l_partkey", *ranges["l_partkey"])
    _, on_b = read_with_skipping(spark, zpath, "l_suppkey", *ranges["l_suppkey"])
    assert on_a["files_read"] < on_a["files_total"]
    assert on_b["files_read"] < on_b["files_total"]


def test_linear_layout_cannot_prune_second_column(spark, layouts):
    _, lpath, ranges = layouts
    _, on_a = read_with_skipping(spark, lpath, "l_partkey", *ranges["l_partkey"])
    _, on_b = read_with_skipping(spark, lpath, "l_suppkey", *ranges["l_suppkey"])
    assert on_a["files_read"] < on_a["files_total"]  # sort column prunes hard
    assert on_b["files_read"] == on_b["files_total"]  # other column: no locality


def test_pruned_scan_equals_full_scan(spark, layouts):
    zpath, _, ranges = layouts
    lo, hi = ranges["l_suppkey"]
    pruned, info = read_with_skipping(spark, zpath, "l_suppkey", lo, hi)
    full = (
        spark.read.parquet(zpath)
        .filter((F.col("l_suppkey") >= lo) & (F.col("l_suppkey") <= hi))
    )
    assert info["files_read"] < info["files_total"]
    assert pruned.count() == full.count()
    assert pruned.exceptAll(full).isEmpty() and full.exceptAll(pruned).isEmpty()


def test_zvalue_is_deterministic_jvm_expression(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = zvalue(li, ["l_partkey", "l_suppkey"], bits=4)
    out = li.withColumn("z", z)
    # bit-interleave of 4-bit buckets stays within 8 bits
    row = out.agg(F.min("z"), F.max("z")).first()
    assert 0 <= row[0] <= row[1] < 256
    # same input → same codes (no rand, no partition sensitivity)
    a = out.groupBy("z").count().orderBy("z").collect()
    b = out.repartition(7).groupBy("z").count().orderBy("z").collect()
    assert a == b


def test_zorder_compaction_repairs_multi_column_skipping(spark, sf_dir, tmp_path):
    """Appends wreck locality on BOTH columns; z-order compaction
    restores pruning on each of them in one rewrite."""
    from etl_extractor_spark.sinks.compact import compact_with_manifest
    from etl_extractor_spark.sinks.manifest import (
        table_history,
        write_with_manifest,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "zcmp")
    for i, m in enumerate(["overwrite", "append", "append"]):
        write_with_manifest(
            spark,
            li.filter(F.pmod("l_orderkey", F.lit(3)) == i).repartition(4),
            path,
            ["l_partkey", "l_suppkey"],
            mode=m,
        )
    total = spark.read.parquet(path).count()
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    pk = _mid_band(b[0], b[1])
    sk = _mid_band(b[2], b[3])
    # random repartition → no stats locality at all
    _, before_pk = read_with_skipping(spark, path, "l_partkey", *pk)
    assert before_pk["files_read"] == before_pk["files_total"]

    after = compact_with_manifest(
        spark, path, n_files=N_FILES, zcols=["l_partkey", "l_suppkey"]
    )
    assert after["n_files"] == N_FILES
    assert spark.read.parquet(path).count() == total
    _, on_pk = read_with_skipping(spark, path, "l_partkey", *pk)
    _, on_sk = read_with_skipping(spark, path, "l_suppkey", *sk)
    assert on_pk["files_read"] < on_pk["files_total"]
    assert on_sk["files_read"] < on_sk["files_total"]
    assert len(table_history(path)) == 1


def test_conjunctive_skipping_multiplies_on_zorder(spark, layouts):
    """On a z-ordered layout, an AND of range predicates on both
    clustered columns prunes at least as hard as either alone, and the
    pruned scan equals the fully filtered full scan."""
    from etl_extractor_spark.sinks.manifest import read_with_skipping_multi

    zpath, _, ranges = layouts
    pk, sk = ranges["l_partkey"], ranges["l_suppkey"]
    _, on_pk = read_with_skipping(spark, zpath, "l_partkey", *pk)
    _, on_sk = read_with_skipping(spark, zpath, "l_suppkey", *sk)
    both, info = read_with_skipping_multi(
        spark, zpath, [("l_partkey", *pk), ("l_suppkey", *sk)]
    )
    assert info["files_read"] <= min(on_pk["files_read"], on_sk["files_read"])
    assert info["files_read"] < info["files_total"]
    full = spark.read.parquet(zpath).filter(
        (F.col("l_partkey") >= pk[0]) & (F.col("l_partkey") <= pk[1])
        & (F.col("l_suppkey") >= sk[0]) & (F.col("l_suppkey") <= sk[1])
    )
    assert both.count() == full.count()
    assert both.exceptAll(full).isEmpty()
