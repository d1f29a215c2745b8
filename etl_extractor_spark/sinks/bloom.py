"""Per-file Bloom filters as a manifest SIDECAR (`_blooms.json`) —
the Iceberg-puffin pattern: point-lookup scans consult tiny secondary
metadata and open only the data files that can contain the key.

Min/max stats (sinks/manifest.py) prune RANGE predicates but are
useless for point lookups on a hash-distributed column (every file's
[min, max] spans the domain). The Bloom sidecar closes that gap:
build once per file with a distributed aggregation, probe at plan
time on the driver, read only surviving files. False positives cost
one extra file read; false negatives cannot happen (guard-tested).

Scale: the BUILD is one groupBy((file, word)) bit_or aggregation —
map-side combinable, output is metadata-sized (files x m/63 words).
The PROBE is pure driver arithmetic over the sidecar. At 100 TB the
sidecar becomes a metadata parquet table instead of JSON and the
probe becomes a broadcast semi-join against the file list; the
construction below is unchanged. Hashing is the repo's md5-fold
convention (first 8 hex digits -> BIGINT), identical in Spark, Python
and DuckDB, so tests can cross-check membership bit-for-bit.

Reference provenance: the reference's extractors (extract/*.py:4-28)
re-read whole tables per run; file skipping is the first thing its
10-minute full reload needs at warehouse scale.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDECAR = "_blooms.json"

# 63-bit words (the repo's bitmap convention): shiftleft(1L, 63) would
# overflow signed int64; capping bit indexes at 62 keeps every word a
# plain non-negative BIGINT in both engines.
_WORD_BITS = 63


def _next_m(n_keys: int, bits_per_key: int) -> int:
    """Bloom size in bits: bits_per_key * n_keys, rounded up to whole
    63-bit words, floored at one word."""
    bits = max(_WORD_BITS, bits_per_key * max(1, n_keys))
    words = (bits + _WORD_BITS - 1) // _WORD_BITS
    return words * _WORD_BITS


def _fold_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _render(v) -> str:
    """Render a probe value EXACTLY as the build side's Spark
    CAST(col AS STRING) does. Python's str() diverges for booleans
    ('True' vs Spark's 'true'), floats/decimals ('10.5' vs '10.50')
    and timestamps — a silent divergence here is a Bloom FALSE
    NEGATIVE (wrongly pruned file), the one failure the structure
    must never produce. Types whose rendering is not bit-stable
    across the two sides are rejected loudly: pass the Spark-rendered
    string instead."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, (int, str)):
        return str(v)
    raise TypeError(
        f"bloom probe for {type(v).__name__!r} values is ambiguous — "
        "pass the exact Spark CAST(col AS STRING) rendering instead"
    )


def _probes_py(value: str, m: int, k: int) -> list[int]:
    h1 = _fold_py(value)
    h2 = _fold_py(value + "#2") | 1  # odd step avoids a stuck cycle
    return [(h1 + i * h2) % m for i in range(k)]


def _rel_key(fpath: str, root: str) -> str:
    """Sidecar key for a data file: its path RELATIVE to the table
    root. Both sides must agree — the build enumerates via Spark's
    _metadata.file_path (a file: URI over a possibly-partitioned
    layout), the probe via an os.walk of the root. Basenames are NOT
    unique across partition directories (every Spark write names
    part-00000-...), so keying by basename would merge filters built
    with different m — a corrupted probe. Relative paths are unique
    by construction."""
    p = fpath
    if p.startswith("file:"):
        p = p[len("file:") :]
        # file:///x -> /x ; collapse any duplicated leading slashes
        while p.startswith("//"):
            p = p[1:]
    return os.path.relpath(os.path.abspath(p), os.path.abspath(root))


def _data_files(path: str) -> list[str]:
    """Every data file under ``path``, recursively — the probe-side
    twin of the build's recursive spark.read.parquet(path). Delegates
    to the ONE canonical data-file walker (sinks/compact.py) so what
    counts as a data file can never diverge between the bloom probe,
    the build, and compaction sizing (review catch)."""
    from etl_extractor_spark.sinks.compact import _data_files as _walk

    return sorted(_walk(path))


def attach_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    bits_per_key: int = 10,
    k: int = 2,
) -> dict[str, Any]:
    """Build a per-file Bloom filter over ``col`` for every data file
    under ``path`` and commit the sidecar atomically.

    Two aggregation passes, both map-side combinable and both emitting
    metadata-sized results: (1) approx distinct keys per file — sizes
    each file's filter independently, so a skewed file doesn't blow up
    the false-positive rate of its siblings; (2) probe positions ->
    63-bit words via groupBy(file, word) bit_or. No row data is ever
    collected; the collected relations are (files) and
    (files x words) rows."""
    base = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("f"),
        F.col(col).cast("string").alias("v"),
    )
    sizes = {
        r["f"]: _next_m(r["nd"], bits_per_key)
        for r in base.groupBy("f")
        .agg(F.approx_count_distinct("v").alias("nd"))
        .collect()
    }
    from etl_extractor_spark.operators.common import small_df

    m_df = small_df(
        spark, [(f, m) for f, m in sizes.items()], "f string, m long"
    )
    h1 = F.conv(F.substring(F.md5(F.col("v")), 1, 8), 16, 10).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.col("v"), F.lit("#2"))), 1, 8), 16, 10
    ).cast("long")
    probes = (
        base.join(F.broadcast(m_df), "f")
        .select(
            "f",
            "m",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: (h1 + i * (h2.bitwiseOR(F.lit(1)))) % F.col("m"),
                )
            ).alias("pos"),
        )
        .select(
            "f",
            F.expr(f"pos div {_WORD_BITS}").alias("w"),
            F.expr(f"shiftleft(1L, CAST(pos % {_WORD_BITS} AS INT))").alias("b"),
        )
        .groupBy("f", "w")
        .agg(F.expr("bit_or(b)").alias("word"))
        .collect()
    )
    blooms: dict[str, dict[str, Any]] = {
        _rel_key(f, path): {"m": m, "k": k, "words": {}}
        for f, m in sizes.items()
    }
    if len(blooms) != len(sizes):
        raise ValueError(
            f"bloom sidecar key collision under {path!r}: "
            f"{len(sizes)} files -> {len(blooms)} relative keys"
        )
    for r in probes:
        blooms[_rel_key(r["f"], path)]["words"][str(r["w"])] = r["word"]
    sidecar = {"version": 2, "col": col, "files": blooms}
    tmp = os.path.join(path, f".{_SIDECAR}.{os.getpid()}.tmp")
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(tmp, os.path.join(path, _SIDECAR))
    return sidecar


def read_sidecar(path: str) -> dict[str, Any] | None:
    p = os.path.join(path, _SIDECAR)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def probe_files(path: str, col: str, values: list) -> list[str]:
    """Driver-side probe: the data files that MAY contain any of
    ``values`` in ``col`` (superset of the truth — Bloom false
    positives only, never negatives). Files missing from the sidecar
    (written after the last attach_blooms) are conservatively kept."""
    sidecar = read_sidecar(path)
    if sidecar is None or sidecar["col"] != col:
        raise ValueError(f"no bloom sidecar for column {col!r} at {path}")
    keep: list[str] = []
    for fpath in _data_files(path):
        entry = sidecar["files"].get(_rel_key(fpath, path))
        if entry is None:
            keep.append(fpath)  # unknown file: cannot prune safely
            continue
        words, m, k = entry["words"], entry["m"], entry["k"]
        for v in values:
            if all(
                words.get(str(pos // _WORD_BITS), 0) >> (pos % _WORD_BITS) & 1
                for pos in _probes_py(_render(v), m, k)
            ):
                keep.append(fpath)
                break
    return keep


def read_bloom_pruned(
    spark: SparkSession, path: str, col: str, values: list
) -> DataFrame:
    """Scan only the files whose Bloom filter admits one of ``values``.
    Callers still apply the real predicate — the Bloom is a file-level
    PRE-filter (false positives pass through it), exactness comes from
    the filter on the rows."""
    files = probe_files(path, col, values)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
