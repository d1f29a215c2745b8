"""Per-file KMV (k-minimum-values) NDV sketches as a manifest sidecar
(`_ndv.json`) — the distinct-count half of file-level metadata, next
to min/max stats (range pruning) and Blooms (point lookups). Iceberg
keeps NDV in its puffin stats files for exactly this reason: the
optimizer's join-size and distinct-cardinality decisions want NDV per
file/partition WITHOUT a table scan.

KMV is MERGEABLE: the k smallest hashes of a union are a subset of
the union of each side's k smallest — so per-file sketches built once
at write time answer table-level (or any file-subset-level) NDV by a
driver-side merge of k-long lists. Build is one distributed
windowed-distinct pass; estimate is metadata arithmetic.

Hashing is the repo's md5-fold convention (first 12 hex digits →
48-bit BIGINT — identical in Spark, Python and DuckDB), which makes
the whole estimate EXACTLY reproducible by the oracle: same k-min
set, same kth value, same integer estimate. No error-bound contract
needed — the driver hash-matches the estimator itself.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

_SIDECAR = "_ndv.json"
K = 64
_SPAN = 2**48  # md5-fold domain: 12 hex digits


def attach_ndv(spark: SparkSession, path: str, col: str) -> dict[str, Any]:
    """Build the per-file k-min sketch over ``col`` for every data
    file under ``path`` and commit the sidecar atomically. One
    distributed pass: distinct (file, hash) pairs, k smallest per
    file via a window; collected rows are at most |files| × K longs."""
    from etl_extractor_spark.sinks.bloom import _rel_key
    from etl_extractor_spark.sinks.manifest import read_manifest

    # Manifest-tracked tables sketch the CURRENT file list, not the
    # directory: after a copy-on-write replace/compaction the dir also
    # holds superseded snapshots' files kept for time travel, and a
    # directory sketch would count their dead rows (review catch —
    # same rule as manifest.read_table).
    m = read_manifest(path)
    if m is not None and m.get("files"):
        import os as _os

        reader = spark.read.parquet(
            *[_os.path.join(path, e["file"]) for e in m["files"]]
        )
    else:
        reader = spark.read.parquet(path)
    base = reader.select(
        F.col("_metadata.file_path").alias("f"),
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).filter(F.col("h").isNotNull())
    # NULLs are excluded from NDV (the COUNT DISTINCT convention) —
    # unfiltered, the NULL hash sorts first through row_number and
    # silently burns a k-min slot in every null-bearing file (review
    # catch).
    w = Window.partitionBy("f").orderBy("h")
    kmins = (
        base.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .groupBy("f")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .collect()
    )
    sidecar = {
        "version": 1,
        "col": col,
        "k": K,
        "files": {_rel_key(r["f"], path): list(r["hs"]) for r in kmins},
    }
    fd, tmp = tempfile.mkstemp(prefix=_SIDECAR + ".", dir=path)
    with os.fdopen(fd, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(tmp, os.path.join(path, _SIDECAR))
    return sidecar


def estimate_ndv(path: str, col: str) -> dict[str, int]:
    """Table-level NDV from the per-file sketches alone — a pure
    driver-side merge (k smallest of the union of k-min lists), no
    data read. Returns {k_eff, kth_hash, est_ndv}; when fewer than K
    distinct hashes exist the count is exact by construction."""
    with open(os.path.join(path, _SIDECAR)) as fh:
        sc = json.load(fh)
    if sc["col"] != col:
        raise ValueError(f"ndv sidecar is for {sc['col']!r}, not {col!r}")
    merged: set[int] = set()
    for hs in sc["files"].values():
        merged.update(hs)
    kmin = sorted(merged)[: sc["k"]]
    k_eff = len(kmin)
    if k_eff < sc["k"]:
        return {"k_eff": k_eff, "kth_hash": kmin[-1] if kmin else 0, "est_ndv": k_eff}
    kth = kmin[-1]
    return {
        "k_eff": k_eff,
        "kth_hash": kth,
        "est_ndv": (sc["k"] - 1) * _SPAN // kth,
    }
