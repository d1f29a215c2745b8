"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition a (possibly single-partition) input to
    the session's core count before compute-heavy or row-multiplying
    work (shingle explosion, signature hashing, pairwise scoring).

    Small parquet inputs arrive as ONE partition (one file, one row
    group), which would serialize everything downstream on a single
    core. One cheap narrow-input shuffle buys full parallelism for the
    expensive stage — the same reasoning holds on a 1000-executor
    cluster when a stage's input is few-partitioned but its compute is
    super-linear in rows.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # alive, owned by someone else
    return True


_SCRATCH_REGISTERED: set = set()


def pid_scratch_dir(prefix: str) -> str:
    """Pid-named scratch directory under the system temp dir with the
    FULL lifecycle the r6 disk incident taught: (a) atexit removal for
    this process, and (b) reaping of same-prefix orphans whose pid is
    dead — atexit never runs under a timeout-SIGTERM kill, which is
    exactly how chunked driver sweeps die, so without reaping every
    killed sweep leaks one corpus-scale scratch table per process
    (tests/oracle.py applies the same discipline to DuckDB spill).
    Returns the path WITHOUT creating it (writers mkdir as needed)."""
    import atexit
    import os
    import shutil
    import tempfile

    base = tempfile.gettempdir()
    for name in os.listdir(base):
        if name.startswith(prefix):
            tail = name[len(prefix):]
            if tail.isdigit() and int(tail) != os.getpid() and not _pid_alive(int(tail)):
                shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    d = os.path.join(base, f"{prefix}{os.getpid()}")
    if d not in _SCRATCH_REGISTERED:
        _SCRATCH_REGISTERED.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
