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


def test_pyds_filter_pushdown_unit_and_e2e(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNotNull
    from pyspark.sql.types import StructType

    from etl_extractor_spark.sources.pyds import EnvelopeJsonReader

    schema = StructType.fromDDL("id bigint, name string")
    r = EnvelopeJsonReader(schema, {"path": str(tmp_path)})
    flt = [GreaterThan(("id",), 5), In(("name",), ("a", "b")), IsNotNull(("name",))]
    remaining = list(r.pushFilters(flt))
    # comparison + null shapes consumed, IN handed back to Spark
    assert remaining == [flt[1]]
    assert r._keep(EqualTo(("id",), 3), {"id": 3})
    assert not r._keep(GreaterThan(("id",), 5), {"id": None})

    register(spark)
    d = str(tmp_path)
    _write(d, "p.json", {"data": [{"id": i, "name": f"n{i}"} for i in range(20)]})
    df = (
        spark.read.format("envelope_json")
        .schema("id bigint, name string")
        .option("path", d)
        .load()
        .filter("id > 15")
    )
    assert sorted(r.id for r in df.collect()) == [16, 17, 18, 19]


def test_pyds_writer_roundtrip_overwrite_and_nesting(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5), (3, "c", 2.5)],
        "id bigint, name string, `meta.s` double",
    ).repartition(2)
    df.write.format("envelope_json").mode("overwrite").option("path", out).save()
    # task files + _SUCCESS manifest with row counts
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files and sum(1 for f in files if f.endswith(".json")) == 2
    with open(os.path.join(out, "_SUCCESS")) as fh:
        assert sum(json.load(fh).values()) == 3
    # dotted column re-nested on disk (reference envelope shape)
    with open(os.path.join(out, [f for f in files if f.endswith(".json")][0])) as fh:
        rec = json.load(fh)["data"][0]
        assert "meta" in rec and "s" in rec["meta"] and "meta.s" not in rec
    # read back through the same format == original frame
    back = (
        spark.read.format("envelope_json")
        .schema("id bigint, name string, `meta.s` double")
        .option("path", out)
        .load()
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())
    # overwrite replaces, append-style second write without overwrite adds
    df.limit(1).write.format("envelope_json").mode("overwrite").option("path", out).save()
    assert (
        spark.read.format("envelope_json")
        .schema("id bigint, name string, `meta.s` double")
        .option("path", out)
        .load()
        .count()
        == 1
    )


def test_pyds_stream_source_tails_directory_exactly_once(spark, tmp_path):
    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        _write(str(src), f"f{i:03d}.json", {"data": [{"id": i * 10 + j, "name": f"n{i}{j}"} for j in range(3)]})
    stream = (
        spark.readStream.format("envelope_json")
        .schema("id bigint, name string")
        .option("path", str(src))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.id for r in spark.sql("SELECT * FROM pyds_stream").collect()}
        assert got1 == {0, 1, 2, 10, 11, 12}
        # late-arriving file: picked up by a following micro-batch, no
        # replays. Bounded retry on VISIBILITY only (under heavy
        # co-tenant load processAllAvailable can return between the
        # file landing and the source's next directory poll — observed
        # once in a full-suite run while three Spark gates shared the
        # machine); the exactly-once assertion itself is unchanged and
        # a duplicate would still fail immediately.
        import time as _time

        _write(str(src), "f002.json", {"data": [{"id": 20, "name": "n20"}]})
        deadline = _time.time() + 60
        rows = []
        while _time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT id FROM pyds_stream").collect()
            if len(rows) >= 7:
                break
            _time.sleep(0.5)
        assert sorted(r.id for r in rows) == [0, 1, 2, 10, 11, 12, 20]
    finally:
        q.stop()


def test_pyds_stream_writer_batch_files_and_no_temps(spark, tmp_path):
    register(spark)
    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    for i in range(2):
        _write(str(src), f"f{i:03d}.json", {"data": [{"id": i, "name": f"x{i}", "meta": {"s": 1.0 * i}}]})
    stream = (
        spark.readStream.format("envelope_json")
        .schema("id bigint, name string, `meta.s` double")
        .option("path", str(src))
        .load()
    )
    q = (
        stream.writeStream.format("envelope_json")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    names = sorted(os.listdir(out))
    assert all(n.startswith("batch-") and n.endswith(".json") for n in names)
    recs = []
    for n in names:
        with open(out / n) as fh:
            recs += json.load(fh)["data"]
    assert sorted((r["id"], r["name"], r["meta"]["s"]) for r in recs) == [
        (0, "x0", 0.0),
        (1, "x1", 1.0),
    ]  # dotted column re-nested; every row exactly once; no .tmp- left


def test_pyds_batch_writer_commit_renames_and_abort_cleans(spark, tmp_path):
    """Unit-level commit protocol: write() leaves only hidden temps
    (no reader-visible file before commit); commit renames to final
    names; abort removes temps."""
    from pyspark.sql.types import StructType

    from etl_extractor_spark.sources.pyds import EnvelopeJsonWriter, _EnvelopeCommit

    schema = StructType.fromDDL("id bigint, name string")
    out = tmp_path / "sink"
    w = EnvelopeJsonWriter(schema, {"path": str(out)}, overwrite=False)
    msgs = [w.write(iter([(1, "a"), (2, "b")])), w.write(iter([(3, "c")]))]
    # before commit: nothing a *.json glob (the reader) can see
    assert [f for f in os.listdir(out) if f.endswith(".json")] == []
    assert all(os.path.basename(m.path).startswith(".tmp-") for m in msgs)
    w.commit(msgs)
    finals = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert finals == ["part-00000.json", "part-00001.json"]
    with open(out / "_SUCCESS") as fh:
        assert sum(json.load(fh).values()) == 3
    # abort path: temps from a failed job are removed
    w2 = EnvelopeJsonWriter(schema, {"path": str(out)}, overwrite=False)
    m = w2.write(iter([(9, "z")]))
    w2.abort([m, None])
    assert not os.path.exists(m.path)
    # the committed files from the first job are untouched
    assert sorted(f for f in os.listdir(out) if f.endswith(".json")) == finals


def test_pyds_end_to_end_stream_dedup(spark, tmp_path):
    """Composition: envelope stream SOURCE -> stateful streaming
    dropDuplicates -> envelope stream SINK. A duplicate id arriving in
    a LATER micro-batch is suppressed by state, and the sink's
    committed batch files contain each id exactly once."""
    register(spark)
    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    _write(str(src), "f000.json", {"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]})
    stream = (
        spark.readStream.format("envelope_json")
        .schema("id bigint, name string")
        .option("path", str(src))
        .load()
        .dropDuplicates(["id"])
    )
    q = (
        stream.writeStream.format("envelope_json")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: one duplicate (id=2) + one new id
        _write(str(src), "f001.json", {"data": [{"id": 2, "name": "b"}, {"id": 3, "name": "c"}]})
        q.processAllAvailable()
    finally:
        q.stop()
    recs = []
    for n in sorted(os.listdir(out)):
        if n.endswith(".json"):
            with open(out / n) as fh:
                recs += json.load(fh)["data"]
    assert sorted((r["id"], r["name"]) for r in recs) == [(1, "a"), (2, "b"), (3, "c")]
