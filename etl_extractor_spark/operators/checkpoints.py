"""Reliable (disk) checkpointing for iterative plans and
materialize-before-overwrite barriers.

One shared discipline (adopted repo-wide in round 6, generalizing the
connected-components helper that ``operators/dedup.py`` introduced in
round 4 after a real OOM):

* ``checkpoint()`` over ``localCheckpoint()``. Local checkpoint blocks
  live in executor storage memory — on a real cluster they die with
  their executor, so an iterative job (BFS / LPA / k-core / PageRank /
  BPE training) fails mid-loop instead of recomputing, and a
  materialize-before-overwrite barrier (MERGE / CDC apply, incremental
  index commit) can silently re-execute against the directory it is
  half-way through rewriting. Reliable checkpoints go to a fault-
  tolerant directory (HDFS/S3 on a cluster; a temp dir under local
  mode) and survive executor loss.
* Eager, always: iterative plans reference the previous round's frame
  multiple times, so lineage — and Catalyst re-optimization time —
  grows exponentially without a hard plan-truncation point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Checkpoint-file lifecycle (review catch): Spark deletes reliable-
# checkpoint files only under spark.cleaner.referenceTracking.
# cleanCheckpoints=true (a SparkConf — session.get_spark sets it, so
# repo-managed sessions reclaim files as the checkpointed RDDs are
# GC'd). Under a VANILLA session (the driver's) that conf is absent,
# so files accumulate for the process lifetime — bounded by the
# session, not unbounded: when THIS helper created the default temp
# dir, it registers an atexit rmtree so nothing outlives the process.
# On a real cluster, point setCheckpointDir at a fault-tolerant path
# with a storage lifecycle policy (checkpoints are job-scoped scratch).
_ATEXIT_DIRS: list[str] = []


def _cleanup_dirs() -> None:
    import shutil

    for d in _ATEXIT_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` to the session's checkpoint dir,
    creating a temp-dir default when none is configured (local mode /
    tests; removed at process exit — see module note). On a cluster,
    set ``spark.sparkContext.setCheckpointDir`` to a fault-tolerant
    path once at startup and this helper uses it."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import atexit
        import tempfile

        d = tempfile.mkdtemp(prefix="spark_reliable_ckpt_")
        sc.setCheckpointDir(d)
        if not _ATEXIT_DIRS:
            atexit.register(_cleanup_dirs)
        _ATEXIT_DIRS.append(d)
    return df.checkpoint(eager=True)
