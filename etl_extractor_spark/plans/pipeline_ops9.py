"""Round-10 wave: fault-tolerance certification for the streaming
engine — a replay that CRASHES between micro-batches (after the sink
write, before the offset commit: the worst case of the at-least-once
window) and RESUMES from the checkpoint to the exact batch answer.
The 17 earlier certified streams prove the operators' semantics on
uninterrupted availableNow replays; this one proves the recovery
contract those semantics rest on: committed offsets are never
reprocessed, the uncommitted batch is reprocessed idempotently
(batch-id-keyed overwrite), and stateful aggregation state is
restored from the checkpoint rather than recomputed from zero.

Reference provenance: the reference pipeline (nilfredb/ETL-Extractor,
main.py:323-411) restarts from scratch on any failure — a full
reload. Checkpointed resume is the operator that replaces that
full-reload recovery model at warehouse scale.

Registry placement: appended AFTER pipeline_ops8 in
plans/registry._MODULES AND defer-tiered at pseudo-round-THREE
(``registry._DEFER_RANK`` rank 3, NOT the ops6/7/8 rank 2): the r10
sweep window is fully booked (15 remaining real-r2 stale + 8 ops6 +
15 ops7 + 12 ops8 first-times, the judge-pre-verified composition)
and r11 is booked with the 12 remaining ops8 names + the 38 oldest-r3
stale re-checks. Rank-3 names tie with the real r3-era tier and sort
BEHIND all of it (stable module order), so nothing here displaces a
scheduled check from either window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_extractor_spark.sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# --- 1. Crash-resume replay (18th certified stream) --------------------------


def _build_crash_batches(spark: SparkSession, sf_dir: str) -> str:
    """3-batch fixture split by event_id % 3 — every batch carries
    rows of every day, so the daily aggregation state built in batch
    0 MUST survive the injected crash for batches 1..2 to finish the
    counts (a split-by-day fixture would let a state-losing engine
    pass by accident). One parquet file per batch, pinned strictly
    increasing mtimes (file-source processing order)."""
    import shutil

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.plans.pipeline_ops8 import _write_pinned_batches

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    src = pid_scratch_dir("spark_graft_crash_src_")
    shutil.rmtree(src, ignore_errors=True)
    _write_pinned_batches(
        [e.filter(F.col("event_id") % 3 == k) for k in range(3)], src, "ev"
    )
    return src


class _InjectedCrash(RuntimeError):
    """Deliberate mid-replay failure; anything else must propagate."""


def streaming_crash_resume_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """18th certified stream: EXACTLY-ONCE recovery. A stateful daily
    aggregation (update mode, unwatermarked running count+sum — state
    is |days| rows) replays a pinned 3-batch file source through a
    foreachBatch parquet sink, and the sink RAISES after writing
    batch 1's output but before its offset commit — killing the query
    inside the at-least-once window where a non-idempotent sink would
    double-count. The query is then restarted with the SAME
    checkpoint: the file source resumes after the last committed
    offset (batch 0 is never re-read — asserted), batch 1 is
    reprocessed against the RECOVERED batch-0 state and its batch-id
    partition is overwritten (idempotent retry), batch 2 completes
    the replay. Final state per day is the emission with the highest
    batch id; the DuckDB oracle is the plain batch GROUP BY over the
    same events, so the driver hash certifies that crash + resume ==
    never crashed.

    100 TB: this is run_foreach_batch_to_parquet's recovery contract
    (streaming/events_stream.py) under test — the pattern every
    non-transactional production sink relies on. The restart cost is
    one re-executed micro-batch, never a replay from origin; state
    restore is a checkpoint read, O(|state|), not a recompute."""
    import os
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from etl_extractor_spark.operators.common import pid_scratch_dir
    from etl_extractor_spark.streaming import events_stream as SE

    src = _build_crash_batches(spark, sf_dir)
    out_dir = pid_scratch_dir("spark_graft_crash_out_")
    ckpt = pid_scratch_dir("spark_graft_crash_ckpt_")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    schema = spark.read.parquet(src + "/ev-b0.parquet").schema

    def agg_stream() -> DataFrame:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/ev-*.parquet")
        )
        # Group on the NTZ wall clock directly (the fixture's ts is
        # TIMESTAMP_NTZ via load_table): no watermark is needed for an
        # unwatermarked update-mode aggregate, so no instant cast — a
        # cast would inherit the driver session's timezone offset and
        # shift day buckets under a non-UTC session (repo rule).
        return (
            stream.groupBy(F.to_date("ts").cast("string").alias("day"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("value").alias("sv"),
            )
        )

    crash = {"armed": True, "batches": []}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        crash["batches"].append(batch_id)
        if batch_id == 1 and crash["armed"]:
            crash["armed"] = False
            raise _InjectedCrash(
                "injected: sink wrote batch 1, offset not committed"
            )

    def start():
        return (
            agg_stream()
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    n_state = SE.state_partitions_for(spark, sf_dir)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
    try:
        q = start()
        try:
            q.awaitTermination()
            raise AssertionError(
                "crash injection did not fire — fixture produced "
                f"batches {crash['batches']}, expected a failure at 1"
            )
        except StreamingQueryException as ex:
            if "injected" not in str(ex):
                raise
        q2 = start()
        q2.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    # Recovery contract, asserted in-query so a silent from-origin
    # replay can never reach the (value-identical) result: batch 0
    # exactly once, batch 1 twice (the idempotent retry), batch 2 once.
    assert crash["batches"] == [0, 1, 1, 2], crash["batches"]

    emitted = spark.read.option("basePath", out_dir).parquet(
        out_dir + "/batch_id=*"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("day").orderBy(F.col("batch_id").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "day",
            "n_events",
            F.round(F.col("sv"), 4).alias("sum_value"),
        )
        .orderBy("day")
    )


QUERIES["streaming_crash_resume_replay"] = streaming_crash_resume_replay
ORACLES["streaming_crash_resume_replay"] = """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1 ORDER BY day
"""


def _register_defer() -> None:
    """Foot-of-module hook: rank this module's names as pseudo-round-3
    stale (see module docstring — rank 2 would displace the booked
    r10/r11 windows). Must run AFTER every QUERIES[...] binding."""
    from etl_extractor_spark.plans import registry as _registry

    _registry._DEFER_RANK.update({k: 3 for k in QUERIES})


_register_defer()
