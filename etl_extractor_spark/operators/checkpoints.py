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


# Per-SparkContext adoption latch for sessions that arrive with a
# checkpoint dir already configured (see reliable_checkpoint).
_ADOPTED_APPS: set = set()


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` to the session's checkpoint dir,
    creating a temp-dir default when none is configured (local mode /
    tests; removed at process exit — see module note). On a cluster,
    set ``spark.sparkContext.setCheckpointDir`` to a fault-tolerant
    path once at startup and this helper uses it.

    Pre-existing-dir lifecycle (advice r6): when the session ALREADY
    has a checkpoint dir but lacks
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``, files
    this helper writes there would accumulate for the process lifetime
    with neither GC-driven cleanup nor our atexit rmtree — per-round
    checkpoints of multi-million-row frames can exhaust disk in a long
    driver sweep. So on first use we redirect to a pid-named SUBDIR of
    the configured local dir (same fault-tolerance domain the operator
    chose) and atexit-rmtree only that subdir; for non-local URIs
    (hdfs:/s3:) we can't reach the files from here — warn once and
    leave lifecycle to the cluster's storage policy, as the module
    note prescribes."""
    sc = df.sparkSession.sparkContext
    cur = sc.getCheckpointDir()
    if cur is None:
        import atexit
        import tempfile

        d = tempfile.mkdtemp(prefix="spark_reliable_ckpt_")
        sc.setCheckpointDir(d)
        if not _ATEXIT_DIRS:
            atexit.register(_cleanup_dirs)
        _ATEXIT_DIRS.append(d)
        _ADOPTED_APPS.add(sc.applicationId)
    elif sc.applicationId not in _ADOPTED_APPS:
        # per-CONTEXT latch (review catch: a process-global bool would
        # silently skip adoption for a second SparkContext created
        # after the first one took the temp-dir branch — the
        # stop-and-restart session pattern drivers and tests use)
        _ADOPTED_APPS.add(sc.applicationId)
        clean = df.sparkSession.conf.get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        )
        adopted = _adopt_subdir(cur, str(clean))
        if adopted is not None:
            import atexit

            uri, local = adopted
            sc.setCheckpointDir(uri)
            if not _ATEXIT_DIRS:
                atexit.register(_cleanup_dirs)
            _ATEXIT_DIRS.append(local)
    return df.checkpoint(eager=True)


def _adopt_subdir(cur: str, clean_conf: str) -> tuple[str, str] | None:
    """Decide the lifecycle action for a pre-existing checkpoint dir:
    a (spark_uri, local_path) pair — a pid-named local subdir to
    redirect into (and atexit-remove) — or None when either GC cleanup
    is already on (cleanCheckpoints=true) or the dir is a non-local
    URI we can't reach (warns once). The spark_uri carries an explicit
    ``file:`` scheme (review catch: a bare path is resolved against
    fs.defaultFS, so on an HDFS-default cluster a scheme-less redirect
    would silently relocate checkpoints to HDFS while the atexit
    rmtree cleaned an empty local dir)."""
    import os
    from urllib.parse import urlparse

    if clean_conf.lower() == "true":
        return None  # GC reclaims files as checkpointed RDDs are collected
    u = urlparse(cur)
    if u.scheme in ("", "file"):
        local = os.path.join(u.path or cur, "reliable-ckpt-%d" % os.getpid())
        return "file:" + local, local
    import warnings

    warnings.warn(
        "reliable_checkpoint: session checkpoint dir %r has no "
        "cleanCheckpoints conf and is not local — checkpoint files "
        "will accumulate until the cluster's storage lifecycle "
        "policy reclaims them" % cur,
        stacklevel=3,
    )
    return None
