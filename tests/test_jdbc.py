"""Executed JDBC round-trip (S2 read / K3 bulk append / K1 overwrite)
against Apache Derby's EMBEDDED driver — already on Spark's default
classpath (it backs the Hive metastore), so the real ``format("jdbc")``
code path runs with no vendored jars. Mirrors the reference's DB legs:
column-projecting SELECT (extract/db_extractor.py:6-14) and batched
bulk insert (core/dw_repository.py:8-23)."""

from __future__ import annotations

import pytest

from etl_extractor_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id: long, name: string, val: double",
    )
    write_jdbc(df, derby_url, "t_round", mode="overwrite", driver=DRIVER)
    back = read_jdbc(spark, url=derby_url, table="t_round")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_bulk_append(spark, derby_url):
    base = spark.createDataFrame([(10, "x", 0.1)], "id: long, name: string, val: double")
    write_jdbc(base, derby_url, "t_app", mode="overwrite", driver=DRIVER)
    more = spark.createDataFrame(
        [(11, "y", 0.2), (12, "z", 0.3)], "id: long, name: string, val: double"
    )
    write_jdbc(more, derby_url, "t_app", mode="append", driver=DRIVER)
    assert read_jdbc(spark, url=derby_url, table="t_app").count() == 3


def test_jdbc_projection_and_filter_pushdown(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)],
        "id: long, name: string, val: double",
    )
    write_jdbc(df, derby_url, "t_push", mode="overwrite", driver=DRIVER)
    q = (
        read_jdbc(spark, url=derby_url, table="t_push")
        .filter("id >= 10")
        .select("id", "name")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # S2 semantics: the projection AND the predicate reach the database.
    # Match with regexes, not exact plan text — Spark's plan rendering
    # (filter ordering, '*' markers, spacing) shifts across minor
    # versions; the semantic content is the pushed filter names and the
    # pruned two-column read schema.
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan
    assert re.search(r"GreaterThanOrEqual\(id,\s*10\)", pushed.group(1)), plan
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert schema, plan
    cols = {c.split(":")[0] for c in schema.group(1).split(",") if c}
    assert cols == {"id", "name"}, plan
    assert q.count() == 10


def test_jdbc_query_option_projecting_select(spark, derby_url):
    """The reference reads via a hand-written SELECT (main.py:35-38) —
    the query= option is that exact shape."""
    df = spark.createDataFrame([(1, "a", 9.0), (2, "b", 8.0)], "id: long, name: string, val: double")
    write_jdbc(df, derby_url, "t_q", mode="overwrite", driver=DRIVER)
    # Spark's JDBC writer creates case-exact quoted columns; Derby
    # folds unquoted identifiers to upper case, so the SELECT quotes
    got = read_jdbc(
        spark, url=derby_url, query='SELECT "id", "val" FROM t_q WHERE "val" > 8.5'
    )
    assert [tuple(r) for r in got.collect()] == [(1, 9.0)]


def test_streaming_jdbc_sink_matches_batch(spark, derby_url, sf_dir, tmp_path):
    """Streaming aggregation → foreachBatch JDBC append: the rows that
    land in the relational table equal the batch aggregation."""
    from etl_extractor_spark.streaming import events_stream as SE

    agg = SE.streaming_tumbling(SE.events_stream(spark, sf_dir))
    n = SE.run_streaming_jdbc_sink(
        agg.select("window_start", "event_type", "n_events"),
        derby_url,
        "t_stream",
        str(tmp_path / "ckpt"),
        driver=DRIVER,
    )
    assert n >= 1
    got = read_jdbc(spark, url=derby_url, table="t_stream").drop("batch_id")

    # batch twin: same aggregation over the static read
    from pyspark.sql import functions as F

    from etl_extractor_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    wantdf = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    # append mode emits a window only once the 2h watermark passes its
    # end: the final windows stay in state at end-of-stream, so the
    # sink holds the CLOSED subset of the batch result — exactly the
    # windows ending at or before max(ts) - 2h.
    cutoff = ev.agg(F.max("ts")).first()[0]
    import datetime

    closed = wantdf.filter(
        F.col("window_end") <= F.lit(cutoff - datetime.timedelta(hours=2))
    ).drop("window_end")
    got_rows = sorted(map(tuple, got.collect()))
    want_all = sorted(map(tuple, wantdf.drop("window_end").collect()))
    want_closed = sorted(map(tuple, closed.collect()))
    assert set(got_rows) <= set(want_all)
    assert set(want_closed) <= set(got_rows)
    assert len(got_rows) >= len(want_closed) > 0


def test_jdbc_partitioned_read_executes_key_ranges(spark, derby_url):
    """S2 scale path EXECUTED: partitionColumn/bounds must produce
    numPartitions parallel JDBC partitions, each pulling a disjoint
    key-range slice, together covering the table exactly."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], "id: long, name: string"
    )
    write_jdbc(df, derby_url, "t_part", mode="overwrite", driver=DRIVER)
    got = read_jdbc(
        spark,
        url=derby_url,
        table="t_part",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert got.rdd.getNumPartitions() == 4
    per_part = (
        got.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
        .orderBy("pid")
        .collect()
    )
    # every partition did real work on its own contiguous stride
    assert [r["n"] for r in per_part] == [25, 25, 25, 25]
    ranges = [(r["lo"], r["hi"]) for r in per_part]
    assert ranges == [(0, 24), (25, 49), (50, 74), (75, 99)]
    assert got.count() == 100
