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

import threading

from pyspark.sql import DataFrame

# Serializes the scoped checkpoint-dir swap (advice r8): the swap
# mutates process-global SparkContext state, so two concurrent
# reliable_checkpoint calls could interleave — B captures ``cur`` while
# A has already swapped to the pid dir, and B's finally then "restores"
# the session to the exit-rmtree'd pid subdir permanently. One lock
# around swap→checkpoint→restore makes the sequence atomic (concurrent
# callers serialize; the checkpoint write itself dominates, so the
# serialization cost is the honest price of a process-global knob).
# Known residual, by design: a FOREIGN thread calling df.checkpoint()
# directly (not through this helper) during the window still lands in
# the pid dir — that is unscopable without a per-plan checkpoint API,
# which Spark does not expose; such files are cleaned at exit rather
# than leaked, the benign direction.
_SWAP_LOCK = threading.Lock()

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


# Per-SparkContext adoption decision for sessions that arrive with a
# checkpoint dir already configured: applicationId → pid-subdir URI to
# checkpoint into, or None to use the session dir as-is (see
# reliable_checkpoint).
_ADOPT_DECISION: dict = {}


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Eagerly checkpoint ``df`` to the session's checkpoint dir,
    creating a temp-dir default when none is configured (local mode /
    tests; removed at process exit — see module note). On a cluster,
    set ``spark.sparkContext.setCheckpointDir`` to a fault-tolerant
    path once at startup and this helper uses it.

    Pre-existing-dir lifecycle (advice r6, scoping per advice r7):
    when the session ALREADY has a checkpoint dir but lacks
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``, files
    this helper writes there would accumulate for the process lifetime
    with neither GC-driven cleanup nor our atexit rmtree — per-round
    checkpoints of multi-million-row frames can exhaust disk in a long
    driver sweep. So this helper's OWN checkpoints go to a pid-named
    SUBDIR of the configured local dir (same fault-tolerance domain
    the operator chose), atexit-rmtree'd; the redirect is scoped to
    each call — setCheckpointDir around df.checkpoint, restored in a
    finally — so OTHER code calling df.checkpoint() still targets the
    operator-configured durable dir and keeps its files (the r7 advice
    catch: a permanent redirect silently subjected every checkpoint in
    the process to our exit-time rmtree). For non-local URIs
    (hdfs:/s3:) we can't reach the files from here — warn once and
    leave lifecycle to the cluster's storage policy, as the module
    note prescribes.

    The cleanCheckpoints conf is read from the STARTUP SparkConf
    (``sc.getConf()``), not the runtime session conf: ContextCleaner
    captures the value at context construction, so a runtime
    ``spark.conf.set`` never turns GC cleanup on — honoring it here
    would skip adoption while nothing ever reclaimed the files (the
    other r7 advice catch)."""
    sc = df.sparkSession.sparkContext
    cur = sc.getCheckpointDir()
    if cur is None:
        # first-call branch under the lock too (review catch on the
        # r8-advice fix): two concurrent first callers would both
        # mkdtemp + setCheckpointDir — the loser's dir sits unused
        # until exit and the decision cache is written twice. Double-
        # checked so the winner's dir is adopted by the loser.
        with _SWAP_LOCK:
            cur = sc.getCheckpointDir()
            if cur is None:
                import atexit
                import tempfile

                d = tempfile.mkdtemp(prefix="spark_reliable_ckpt_")
                sc.setCheckpointDir(d)
                if not _ATEXIT_DIRS:
                    atexit.register(_cleanup_dirs)
                _ATEXIT_DIRS.append(d)
                _ADOPT_DECISION[sc.applicationId] = None  # we own the dir now
        if cur is None:
            return df.checkpoint(eager=True)
    if sc.applicationId not in _ADOPT_DECISION:
        # per-CONTEXT decision cache (review catch: a process-global
        # bool would silently skip adoption for a second SparkContext
        # created after the first one took the temp-dir branch — the
        # stop-and-restart session pattern drivers and tests use).
        # Decided under the swap lock: the adoption itself performs a
        # set/restore sequence, and two racing first-callers would
        # otherwise both resolve (two pid... same pid, but two UUID
        # subdirs) and one of the restores would strand the session.
        with _SWAP_LOCK:
            if sc.applicationId not in _ADOPT_DECISION:
                _decide_adoption(sc, cur)
    uri = _ADOPT_DECISION[sc.applicationId]
    if not uri:  # None (use session dir) or False (takeover already set)
        return df.checkpoint(eager=True)
    with _SWAP_LOCK:
        cur = sc.getCheckpointDir()
        _restore_dir(sc, uri)
        try:
            return df.checkpoint(eager=True)
        finally:
            # compare-and-swap: restore only if the dir is still OUR
            # uri — if a foreign thread re-pointed the context mid-
            # checkpoint (it can: the var is process-global), honoring
            # its choice beats clobbering it with our stale capture
            if sc.getCheckpointDir() == uri:
                _restore_dir(sc, cur)


def _decide_adoption(sc, cur: str) -> None:
    """One-time (per SparkContext) lifecycle decision for a session
    that arrived with a checkpoint dir already configured. Caller holds
    _SWAP_LOCK and has verified the applicationId is undecided."""
    clean = sc.getConf().get(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
    )
    adopted = _adopt_subdir(cur, str(clean))
    if adopted is None:
        _ADOPT_DECISION[sc.applicationId] = None
        return
    import atexit

    uri, local = adopted
    if not _ATEXIT_DIRS:
        atexit.register(_cleanup_dirs)
    _ATEXIT_DIRS.append(local)
    # resolve ONCE through the public API (creates the pid dir
    # + one UUID subdir); per-call scoping then swaps the
    # RESOLVED strings so no further dirs are ever created
    sc.setCheckpointDir(uri)
    _ADOPT_DECISION[sc.applicationId] = sc.getCheckpointDir()
    if not _restore_dir(sc, cur):
        # no internal setter on this Spark build: the public
        # API would mint a fresh UUID dir per call, so fall
        # back to the documented session-wide takeover, loudly
        import warnings

        warnings.warn(
            "reliable_checkpoint: adopted a pid-scoped checkpoint "
            "subdir SESSION-WIDE (%r): this Spark build exposes no "
            "way to scope the redirect per call, so ALL "
            "df.checkpoint() files in this process are removed at "
            "exit. Set spark.cleaner.referenceTracking."
            "cleanCheckpoints=true at startup to keep the "
            "configured dir instead."
            % _ADOPT_DECISION[sc.applicationId],
            stacklevel=2,
        )
        _ADOPT_DECISION[sc.applicationId] = False  # takeover mode


def _restore_dir(sc, resolved: str) -> bool:
    """Point the context at an already-RESOLVED checkpoint URI without
    the public ``setCheckpointDir``'s side effect of minting a fresh
    UUID subdir per call (which would litter one empty dir per
    checkpoint and, worse, re-nest the resolved path one level per
    set/restore cycle — unbounded depth over a long sweep). Uses the
    SparkContext's internal ``checkpointDir`` var; returns False if
    this Spark build doesn't expose it (caller falls back)."""
    try:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(resolved)
        )
        return sc.getCheckpointDir() == resolved
    except Exception:
        return False


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
