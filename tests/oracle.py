"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, sorts columns by
name and rows by value, and compares row counts + values with a
tolerance for float round-off. Used by tests and by ad-hoc iteration —
keeping this harness equivalent to the driver's check means green here
predicts green in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Point DuckDB's spill at a per-process temp dir (atexit-removed).
    # The default is ./.tmp in the cwd: heavy oracles (unrolled graph
    # CTEs at sf1) spill tens of GB there, and a killed process leaves
    # the files behind — a 337-oracle sweep accumulated 71 GB of
    # orphaned duckdb_temp_storage-*.tmp and exhausted the disk, which
    # then surfaced as Spark SPILL failures in UNRELATED queries
    # (round-6 incident, BASELINE.md).
    global _TMP
    if _TMP is None:
        import atexit
        import glob
        import re
        import shutil
        import tempfile

        # SELF-HEAL first (review catch: atexit never runs when a
        # sweep chunk is killed by timeout/SIGTERM, so orphans would
        # just move from cwd to the system temp dir): the pid is
        # encoded in each spill dir's name — reap any whose owner is
        # dead before creating ours.
        for d in glob.glob(
            os.path.join(tempfile.gettempdir(), "duckdb_oracle_spill_*")
        ):
            m = re.search(r"duckdb_oracle_spill_(\d+)_", d)
            if not m:
                continue
            try:
                os.kill(int(m.group(1)), 0)  # alive? leave it
            except ProcessLookupError:
                shutil.rmtree(d, ignore_errors=True)
            except PermissionError:
                pass  # alive under another uid
        _TMP = tempfile.mkdtemp(prefix=f"duckdb_oracle_spill_{os.getpid()}_")
        atexit.register(shutil.rmtree, _TMP, ignore_errors=True)
    con.execute(f"SET temp_directory = '{_TMP}'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


_TMP: str | None = None


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)



# dtype pairs the driver's value-hash tolerates (r1 evidence: date-as-
# object vs datetime64 and int-width diffs hashed equal; int-vs-float
# did NOT — DuckDB HUGEINT sums surfacing as float64 broke four queries)
_COMPAT = [{"object", "datetime64[us]"}, {"int32", "int64"}, {"bool", "object"}]


def _dtypes_compatible(a: str, b: str) -> bool:
    if a == b:
        return True
    return any({a, b} <= c for c in _COMPAT)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, atol: float = 1e-6):
    raw_got = spark_df.toPandas()
    raw_want = con.execute(sql).fetchdf()
    got = _normalize(raw_got)
    want = _normalize(raw_want)
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    # strict dtype gate mirroring the driver's hash behavior: catch
    # int-vs-float oracle typing bugs locally, before the driver does
    mm = [
        (c, str(raw_got[c].dtype), str(raw_want[c].dtype))
        for c in raw_got.columns
        if not _dtypes_compatible(str(raw_got[c].dtype), str(raw_want[c].dtype))
    ]
    assert not mm, f"dtype mismatch (spark vs oracle): {mm}"
    assert len(got) == len(want), f"row count differs: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            gf = pd.to_numeric(g, errors="coerce")
            wf = pd.to_numeric(w, errors="coerce")
            both_nan = gf.isna() & wf.isna()
            close = (gf - wf).abs() <= atol + 1e-9 * wf.abs()
            bad = ~(both_nan | close)
            assert not bad.any(), (
                f"column {c}: {int(bad.sum())} mismatches, first at idx "
                f"{bad.idxmax()}: {gf[bad].head(3).tolist()} vs {wf[bad].head(3).tolist()}"
            )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"column {c}: {int((~eq).sum())} mismatches, e.g. "
                f"{g[~eq].head(3).tolist()} vs {w[~eq].head(3).tolist()}"
            )
    return len(got)
