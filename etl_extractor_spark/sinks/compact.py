"""Small-file compaction — the maintenance job every parquet lake needs.

Streaming micro-batches and fine-grained partition writes accumulate
small files; scans then pay per-file open/footer costs (catastrophic at
100 TB: a million 1 MB files is a metadata DoS). Compaction rewrites a
directory to ~target-sized files. Without a transactional format the
rewrite goes through a temp dir + atomic-ish swap.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _data_files(path: str):
    """Yield the table's DATA parquet files — skipping underscore-
    prefixed metadata subtrees (_deletes/, _staging/, _SUCCESS-style
    markers), the same convention Spark's own readers apply. Review
    catch: sizing a delete-bearing MOR table from a walk that counts
    _deletes/*.parquet (and docstring-level: the deleted rows' data
    bytes too — a second-order overshoot documented at the call site)
    skews the compaction file-count plan."""
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                yield os.path.join(root, f)


def parquet_file_count(path: str) -> int:
    return sum(1 for _ in _data_files(path))


def dir_bytes(path: str) -> int:
    return sum(os.path.getsize(f) for f in _data_files(path))


def plan_file_count(spark: SparkSession, path: str, target_file_mb: int = 128) -> int:
    """The compactor's target file count — ONE shared rule (review
    catch: two inline copies had already started to drift from the
    contract query's third copy): ceil(size / target), FLOORED at the
    session's parallelism for small tables (round-9 measurement: the
    pure size rule compacted a ~400 MB table to 3 files = 3 scan
    splits on a 32-core box, and post-compaction reads ran 1.9×
    SLOWER than the 32-file layout they replaced — 5.55 s vs 2.92 s;
    32 files restored 3.5 s and still removed the delete-file tax).
    The floor is capped at one file per 16 MB so tiny tables never
    shatter (a 32 000-core cluster must not turn 400 MB into 32 000
    files); at 100 TB the size term dominates and the floor is inert.
    One dir walk total."""
    b = dir_bytes(path)
    by_size = math.ceil(b / (target_file_mb * 1024 * 1024))
    floor = min(
        spark.sparkContext.defaultParallelism,
        math.ceil(b / (16 * 1024 * 1024)),
    )
    return max(1, by_size, floor)


def _exactly_n_files(df, n_files: int, probe: bool = True):
    """Repartition ``df`` to EXACTLY n_files output partitions.
    coalesce only ever DECREASES partition count (review catch,
    empirically confirmed: a 16-file table scanning as 7 partitions
    wrote 7 files where the floor targeted 14 — the parallelism floor
    was silently unreachable on the narrow path), so when the scan
    arrives with fewer partitions than the target the rewrite pays
    the full shuffle — that IS the price of raising a table's read
    parallelism.

    ``probe=False`` skips the partition-count probe and always
    shuffles (second review catch: ``df.rdd`` under AQE finalizes the
    plan, EXECUTING upstream query stages once before the write runs
    them again — on a merge-on-read plan that means every delete-file
    broadcast anti-join runs twice per compaction; callers with
    non-trivial plans pass probe=False and accept one shuffle
    instead)."""
    if not probe:
        return df.repartition(n_files)
    current = df.rdd.getNumPartitions()
    return df.coalesce(n_files) if current >= n_files else df.repartition(n_files)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> int:
    """Rewrite ``path`` into plan_file_count(...) files (or an
    explicit ``n_files``); returns the new file count. Narrow coalesce
    when shrinking (row order within files changes, content doesn't);
    a shuffle repartition when the parallelism floor needs MORE files
    than the scan has partitions. The probe is safe here: the plan is
    a bare parquet scan, so AQE finalization executes nothing.

    ``n_files`` exists so a contract that compares planned-vs-achieved
    counts can evaluate the sizing rule ONCE and pass it through
    (second review catch: two independent plan_file_count calls read
    defaultParallelism at two instants — under dynamic executor
    allocation the floor can move between them and a correct
    compaction reads as a broken contract)."""
    if n_files is None:
        n_files = plan_file_count(spark, path, target_file_mb)
    tmp = path.rstrip("/") + "__compacting"
    df = spark.read.parquet(path)
    _exactly_n_files(df, n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return parquet_file_count(path)


def compact_with_manifest(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_col: str | None = None,
    n_files: int | None = None,
    zcols: list[str] | None = None,
) -> dict:
    """Compaction for manifest-tracked tables: rewrite to ~target-sized
    files, re-harvest footer stats, and commit a fresh manifest.

    Rows are unchanged; the file set is not, and the old files are
    gone after the swap, so prior snapshots are no longer readable —
    the compacted table restarts history at a single snapshot (the
    OPTIMIZE + VACUUM trade-off on a non-copy-on-write store; keep
    appending to retain history, compact when file count matters more).

    ``sort_col`` optionally re-clusters during the rewrite
    (repartitionByRange + in-partition sort) so compaction doubles as
    layout repair — restoring the file skipping that interleaved
    appends destroyed. ``zcols`` instead re-clusters on the Morton
    curve of several columns (the OPTIMIZE ZORDER BY analog) so the
    repaired layout prunes on all of them.

    Merge-on-read deletes are ABSORBED (round 9): a delete-bearing
    table is read through ``read_merge_on_read`` — the one reader that
    applies the committed delete files — so the rewrite materializes
    the subtraction physically; the swap then removes ``_deletes/``
    with the old data files and the fresh manifest records no delete
    files. Reading raw data files here instead (the pre-r9 form) would
    silently RESURRECT every deleted row in the compacted table — the
    classic compaction/delete-file race, caught by the
    tfidf_postings_compaction certification (post-compaction read must
    hash-match the pre-compaction MOR read). Post-compaction reads pay
    zero anti-joins: the per-delete-file read tax is gone.
    """
    from etl_extractor_spark.sinks.manifest import (
        harvest_manifest,
        read_manifest,
        read_merge_on_read,
    )

    m = read_manifest(path)
    stats_cols = m["stats_cols"] if m else []
    has_deletes = bool(m and m.get("delete_files"))
    df = read_merge_on_read(spark, path) if has_deletes else spark.read.parquet(path)
    if n_files is None:
        # Sizing reads pre-compaction DATA bytes (the _deletes/ subtree
        # is excluded by _data_files). Known second-order overshoot: on
        # a heavily-deleted table the soon-to-be-removed rows' bytes
        # still count, so by_size overshoots by the deleted fraction —
        # acceptable at the ≤ a-few-percent delete rates MOR targets
        # (a 40%-deleted table should be compacted long before this
        # sizing nuance matters, and the floor usually dominates then).
        n_files = plan_file_count(spark, path, target_file_mb)
    tmp = path.rstrip("/") + "__compacting"
    if zcols:
        from etl_extractor_spark.sinks.zorder import zvalue

        laid = (
            df.withColumn("_zval", zvalue(df, zcols))
            .repartitionByRange(n_files, "_zval")
            .sortWithinPartitions("_zval")
            .drop("_zval")
        )
    elif sort_col:
        laid = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        # probe only when the plan is a bare scan: on a MOR plan the
        # partition-count probe would execute the delete anti-joins
        # twice (see _exactly_n_files)
        laid = _exactly_n_files(df, n_files, probe=not has_deletes)
    laid.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return harvest_manifest(spark, path, stats_cols)


def compact_copy_on_write(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> dict:
    """COPY-ON-WRITE compaction for manifest-tracked tables: rewrite
    the current logical view (merge-on-read deletes applied) into new
    files committed as a NEW snapshot, while the old data files stay
    on disk referenced by the prior snapshots — time travel stays
    intact, unlike compact_with_manifest's in-place swap (which
    restarts history). Pair with ``manifest.expire_snapshots`` to
    reclaim the superseded files once the retention window passes —
    the Iceberg rewrite_data_files + expire_snapshots lifecycle.

    The new files land beside the old ones (Spark's uuid part names
    cannot collide); the manifest's CURRENT view ("files") switches to
    the new set and its top-level delete list clears (the rewrite
    materialized the subtraction), but older snapshots keep their
    delete-file references, so MOR time travel to them still works
    until expiry."""
    from etl_extractor_spark.sinks.manifest import (
        _file_stats,
        _write_manifest,
        read_manifest,
        read_merge_on_read,
    )

    m = read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — commit data first")
    if n_files is None:
        n_files = plan_file_count(spark, path, target_file_mb)
    df = read_merge_on_read(spark, path)
    tmp = path.rstrip("/") + "__cow"
    shutil.rmtree(tmp, ignore_errors=True)
    # probe=False: the MOR plan's anti-joins must not execute twice
    _exactly_n_files(df, n_files, probe=False).write.mode("overwrite").parquet(tmp)
    new_names = []
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet") and not f.startswith(("_", ".")):
            os.rename(os.path.join(tmp, f), os.path.join(path, f))
            new_names.append(f)
    shutil.rmtree(tmp, ignore_errors=True)
    entries = [
        _file_stats(os.path.join(path, f), m["stats_cols"]) for f in new_names
    ]
    entries.sort(key=lambda e: e["file"])
    snapshots = list(m.get("snapshots", []))
    snapshots.append(
        {
            "id": (snapshots[-1]["id"] + 1) if snapshots else 0,
            "files": [e["file"] for e in entries],
            "total_rows": sum(e["rows"] for e in entries),
        }
    )
    m2 = dict(m)
    m2["files"] = entries
    m2["n_files"] = len(entries)
    m2["total_rows"] = sum(e["rows"] for e in entries)
    m2["snapshots"] = snapshots
    # current view absorbed the deletes — the NEW snapshot carries no
    # delete names — but the delete-file REGISTRY must keep every
    # entry a surviving snapshot still references (review catch: the
    # first cut popped the registry wholesale, so read_snapshot_mor
    # on the prior delete-bearing snapshot crashed with KeyError —
    # the exact time travel the docstring promises until expiry).
    still_referenced = {
        n for s in snapshots for n in s.get("delete_files", [])
    }
    live_dels = [
        d for d in m.get("delete_files", []) if d["name"] in still_referenced
    ]
    if live_dels:
        m2["delete_files"] = live_dels
    else:
        m2.pop("delete_files", None)
    _write_manifest(path, m2)
    return m2
