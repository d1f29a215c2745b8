"""Guards for the round-9 second wave (plans/pipeline_ops7).

Each query's end-to-end value correctness is covered by the
parametrized oracle gate (test_queries_oracle); these tests pin the
invariants the oracle can't see: Python brute-force derivations
independent of BOTH engines, bit-width edge cases, plan/branch
structure, and the registry-window protection the wave's defer rank
exists for.
"""

from __future__ import annotations

import importlib

import pyspark.sql.functions as F
import pytest


def test_bitmap_word_bit_roundtrip(spark):
    """63-bit words: every key maps to a unique (word, bit) and the
    bitmap popcount equals the exact distinct count on a frame that
    crosses word boundaries, hits bit 62 (the top usable bit), key 0,
    and duplicate keys."""
    keys = [0, 1, 62, 63, 64, 125, 126, 6300, 6300, 6301, 62, 0]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = (
        df.select(
            F.expr("k div 63").alias("w"),
            F.expr("shiftleft(1L, CAST(k % 63 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bm"))
        .select(F.sum(F.expr("bit_count(bm)")).alias("n"))
        .collect()[0]["n"]
    )
    assert got == len(set(keys))


def test_bitmap_rollup_matches_exact_distinct(spark, sf_dir):
    """Engine-independent brute force: the bitmap rollup's counts
    equal Python set-size per (nation, year) computed from the raw
    parquet via pandas."""
    import pandas as pd

    from etl_extractor_spark.plans.pipeline_ops7 import bitmap_distinct_rollup

    got = {
        (r["nation"], r["order_year"]): r["n_customers"]
        for r in bitmap_distinct_rollup(spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_custkey", "o_orderdate"]]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_nationkey"]]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["yr"] = pd.to_datetime(j["o_orderdate"]).dt.year
    want = j.groupby(["n_name", "yr"])["c_custkey"].nunique()
    assert got == {(k[0], int(k[1])): int(v) for k, v in want.items()}


def test_conformal_order_statistic_brute(spark, sf_dir):
    """q_resid_cents is EXACTLY the k-th smallest calibration residual
    with k = min(n, ceil((n+1)*9/10)) — re-derived in pure Python from
    the same md5 split."""
    import hashlib

    import pandas as pd

    from etl_extractor_spark.plans.pipeline_ops7 import (
        conformal_interval_coverage,
    )

    rows = conformal_interval_coverage(spark, sf_dir).collect()
    assert rows, "no segments"
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"].round(2) * 100).round().astype("int64")
    j["bucket"] = j["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 4
    )
    for r in rows:
        seg = j[j["c_mktsegment"] == r["mktsegment"]]
        train = seg[seg["bucket"] <= 1]
        pred = int(train["cents"].sum()) // len(train)
        calib = seg[seg["bucket"] == 2]
        resids = sorted(abs(calib["cents"] - pred))
        n = len(resids)
        k = min(n, -(-(9 * (n + 1)) // 10))
        assert r["n_train"] == len(train) and r["n_cal"] == n
        assert r["q_resid_cents"] == resids[k - 1]
        test = seg[seg["bucket"] == 3]
        covered = int((abs(test["cents"] - pred) <= resids[k - 1]).sum())
        assert r["n_covered"] == covered and r["n_test"] == len(test)
        # the conformal guarantee is marginal/in-expectation; at test
        # SF just pin that coverage is in a sane band around 90%
        assert 7500 <= r["coverage_bps"] <= 10000


def test_late_arriving_backfill_partitions_cleanly(spark, sf_dir):
    """was_backfilled=1 rows are EXACTLY the late-key orders (custkey
    % 10 == 0), every order appears once, and no sentinel survives."""
    import pandas as pd

    from etl_extractor_spark.plans.pipeline_ops7 import (
        late_arriving_dim_backfill,
    )

    got = late_arriving_dim_backfill(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n_late = int((o["o_custkey"] % 10 == 0).sum())
    assert int(got["n_orders"].sum()) == len(o)
    assert int(got[got["was_backfilled"] == 1]["n_orders"].sum()) == n_late
    assert set(got["was_backfilled"]) <= {0, 1}
    assert "UNKNOWN" not in set(got["nation"]) and -1 not in set(got["nation"])


def test_r9_window_protected_from_ops7():
    """The wave's reason-to-exist invariant: with CORRECTNESS pinned
    through r8, the 50-slot window is still 22 deferred first-times +
    28 r2-stale, and NO ops7 (or ops6) name is inside it."""
    from conftest import pinned_driver_checked

    import etl_extractor_spark.plans.registry as R
    from etl_extractor_spark.plans import pipeline_ops6 as p6
    from etl_extractor_spark.plans import pipeline_ops7 as p7

    oracles: dict = {}
    out: dict = {}
    for m in R._MODULES:
        mod = importlib.import_module(m)
        out.update({k: None for k in getattr(mod, "QUERIES", {})})
        oracles.update(getattr(mod, "ORACLES", {}))
    pinned = pinned_driver_checked(8)
    orig = R._driver_checked
    R._driver_checked = lambda: pinned
    try:
        window = list(R._ordered(out, oracles))[:50]
    finally:
        R._driver_checked = orig
    ft = [n for n in window if n not in pinned]
    stale = [n for n in window if n in pinned]
    assert len(ft) == 22 and len(stale) == 28
    assert all(pinned[n] == 2 for n in stale)
    assert not (set(window) & (set(p6.QUERIES) | set(p7.QUERIES)))


def test_ops7_names_enter_r10_behind_ops6():
    """After r9 drains (simulated), ops7 names join the r10 window
    BEHIND the remaining real-r2 names AND behind every ops6 name —
    stable module order inside the pseudo-r2 tie."""
    from conftest import pinned_driver_checked

    import etl_extractor_spark.plans.registry as R
    from etl_extractor_spark.plans import pipeline_ops6 as p6
    from etl_extractor_spark.plans import pipeline_ops7 as p7

    oracles: dict = {}
    out: dict = {}
    for m in R._MODULES:
        mod = importlib.import_module(m)
        out.update({k: None for k in getattr(mod, "QUERIES", {})})
        oracles.update(getattr(mod, "ORACLES", {}))
    pinned = pinned_driver_checked(8)
    orig = R._driver_checked
    try:
        R._driver_checked = lambda: pinned
        r9 = list(R._ordered(out, oracles))[:50]
        sim = dict(pinned)
        for n in r9:
            sim[n] = 9
        R._driver_checked = lambda: sim
        r10 = list(R._ordered(out, oracles))[:50]
    finally:
        R._driver_checked = orig
    in_r10_p7 = [n for n in r10 if n in p7.QUERIES]
    assert in_r10_p7, "ops7 names never drain"
    first_p7 = min(r10.index(n) for n in in_r10_p7)
    real_r2_left = [n for n in r10 if sim.get(n) == 2]
    assert all(r10.index(n) < first_p7 for n in real_r2_left)
    for n in (set(r10) & set(p6.QUERIES)):
        assert r10.index(n) < first_p7
