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


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite ``path`` into ceil(size / target) files; returns the new
    file count. coalesce (narrow, no shuffle) — row order within files
    changes, content doesn't."""
    n_files = max(1, math.ceil(dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return parquet_file_count(path)
