"""Guards for the round-9 third wave (plans/pipeline_ops8).

Each query's end-to-end value correctness is covered by the
parametrized oracle gate (test_queries_oracle); these tests pin the
invariants the oracle can't see: Python brute-force derivations
independent of BOTH engines, pruning effectiveness, and the
registry-window protection the wave's defer rank exists for.
"""

from __future__ import annotations

import hashlib
import importlib

import pandas as pd
import pytest


def _orders(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = (
        o["o_totalprice"].map(lambda v: int(round(float(v) * 100)))
    )
    return o


def _nation_of(sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_nationkey"]]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    return c.merge(n, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]


def test_r9_window_protected_from_ops8():
    """The wave's reason-to-exist invariant: with CORRECTNESS pinned
    through r8, the 50-slot window is still 22 deferred first-times +
    28 r2-stale, and NO round-9-wave name (ops6/ops7/ops8) is inside
    it."""
    from conftest import pinned_driver_checked

    import etl_extractor_spark.plans.registry as R
    from etl_extractor_spark.plans import pipeline_ops6 as p6
    from etl_extractor_spark.plans import pipeline_ops7 as p7
    from etl_extractor_spark.plans import pipeline_ops8 as p8

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
    assert not (
        set(window)
        & (set(p6.QUERIES) | set(p7.QUERIES) | set(p8.QUERIES))
    )


def test_ops8_names_enter_rotation_behind_ops7():
    """After r9 drains (simulated: every r9-window name checked in
    round 9), ops8 names appear in the next window BEHIND every ops6
    and ops7 name (stable module order within the pseudo-r2 tie)."""
    from conftest import pinned_driver_checked

    import etl_extractor_spark.plans.registry as R
    from etl_extractor_spark.plans import pipeline_ops6 as p6
    from etl_extractor_spark.plans import pipeline_ops7 as p7
    from etl_extractor_spark.plans import pipeline_ops8 as p8

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
        r9_window = list(R._ordered(out, oracles))[:50]
    finally:
        R._driver_checked = orig
    after_r9 = dict(pinned, **{n: 9 for n in r9_window})
    R._driver_checked = lambda: after_r9
    try:
        order = list(R._ordered(out, oracles))
    finally:
        R._driver_checked = orig
    pos = {n: i for i, n in enumerate(order)}
    last_67 = max(pos[n] for n in list(p6.QUERIES) + list(p7.QUERIES))
    assert all(pos[n] > last_67 for n in p8.QUERIES)


def test_pivot_brute_force(spark, sf_dir):
    """Engine-independent: the wide pivot equals a pandas crosstab of
    cents by (nation, year), dense with zeros."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        _PIVOT_YEARS,
        pivot_wide_nation_year,
    )

    got = {
        r["nation"]: [r[f"y{y}"] for y in _PIVOT_YEARS]
        for r in pivot_wide_nation_year(spark, sf_dir).collect()
    }
    o = _orders(sf_dir)
    o["yr"] = o["o_orderdate"].astype(str).str[:4]
    j = o.merge(_nation_of(sf_dir), left_on="o_custkey", right_on="c_custkey")
    want = j.pivot_table(
        index="n_name", columns="yr", values="cents", aggfunc="sum", fill_value=0
    )
    assert set(got) == set(want.index)
    for nation in got:
        for i, y in enumerate(_PIVOT_YEARS):
            exp = int(want.loc[nation, y]) if y in want.columns else 0
            assert got[nation][i] == exp, (nation, y)


def test_cusum_brute_force(spark, sf_dir):
    """Engine-independent: per-nation argmax_k |n*S_k - k*S_n| in pure
    Python integers, smallest-k tie-break."""
    from etl_extractor_spark.plans.pipeline_ops8 import cusum_changepoint_daily

    got = {
        r["nation"]: (r["n_days"], r["cp_day"], r["cusum_dev"])
        for r in cusum_changepoint_daily(spark, sf_dir).collect()
    }
    o = _orders(sf_dir)
    o["day"] = o["o_orderdate"].astype(str).str[:10]
    j = o.merge(_nation_of(sf_dir), left_on="o_custkey", right_on="c_custkey")
    daily = j.groupby(["n_name", "day"])["cents"].sum()
    for nation in got:
        series = daily.loc[nation].sort_index()
        xs = [int(v) for v in series.values]
        n = len(xs)
        s_n = sum(xs)
        best_k, best_dev, s_k = None, -1, 0
        for k, x in enumerate(xs, start=1):
            s_k += x
            dev = abs(n * s_k - k * s_n)
            if dev > best_dev:
                best_k, best_dev = k, dev
        assert got[nation] == (n, series.index[best_k - 1], best_dev), nation


def test_merkle_diff_prunes_and_matches_full(spark, sf_dir):
    """Two invariants the oracle can't see: (a) the bucket summary
    actually PRUNES — strictly fewer than all buckets differ on this
    fixture (so the row-level join reads a subset); (b) the pruned
    answer equals an independent pandas full diff (the oracle proves
    this too, but via DuckDB — this one is engine-free)."""
    import pyspark.sql.functions as F

    from etl_extractor_spark.plans.pipeline_ops8 import (
        _MERKLE_BUCKETS,
        merkle_range_diff,
    )

    got = {
        r["change"]: r["n_rows"] for r in merkle_range_diff(spark, sf_dir).collect()
    }
    o = _orders(sf_dir)
    mx = int(o["o_orderkey"].max())
    keys = {int(k): int(c) for k, c in o[["o_orderkey", "cents"]].values}
    v1 = {k: c for k, c in keys.items() if k <= (19 * mx) // 20}
    v2 = {
        k: c + (500 if (15 * mx) // 20 <= k < (16 * mx) // 20 else 0)
        for k, c in keys.items()
        if not ((17 * mx) // 20 <= k < (18 * mx) // 20)
    }
    want = {"added": 0, "deleted": 0, "changed": 0, "unchanged": 0}
    for k in set(v1) | set(v2):
        if k not in v1:
            want["added"] += 1
        elif k not in v2:
            want["deleted"] += 1
        elif v1[k] != v2[k]:
            want["changed"] += 1
        else:
            want["unchanged"] += 1
    assert got == {k: v for k, v in want.items() if v or k in got}
    # pruning: range-localized edits must dirty well under half the
    # ranges at ANY SF (the fixture concentrates edits in ~15% of the
    # keyspace), and the clean ranges must carry real rows through the
    # summary short-cut.
    width = (mx // _MERKLE_BUCKETS) + 1
    dirty = {k // width for k in set(v1) ^ set(v2)} | {
        k // width for k in set(v1) & set(v2) if v1[k] != v2[k]
    }
    assert len(dirty) < _MERKLE_BUCKETS // 2
    equal_rows = sum(
        1
        for k in set(v1) & set(v2)
        if v1[k] == v2[k] and (k // width) not in dirty
    )
    assert equal_rows > 0  # the Merkle short-cut counted real rows


def test_merkle_fold_matches_spark(spark):
    """The python md5 fold used to reason about digests equals Spark's
    conv(substr(md5, 1, 8), 16, 10) on edge keys (0, negative cents,
    large keys)."""
    import pyspark.sql.functions as F

    rows = [(0, 0), (1, -500), (2**40, 123456789)]
    df = spark.createDataFrame(rows, "k long, c long")
    got = [
        r["f"]
        for r in df.select(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("k").cast("string"), F.col("c").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("f")
        ).collect()
    ]
    want = [
        int(hashlib.md5(f"{k}:{c}".encode()).hexdigest()[:8], 16) for k, c in rows
    ]
    assert got == want


def test_mv_join_delta_is_nondegenerate_and_exact(spark, sf_dir):
    """Engine-free check of the join-MV delta algebra: (a) BOTH delta
    terms contribute rows on this fixture (otherwise the query
    certifies less than it claims); (b) bootstrap + delta equals the
    full join, row-for-row, computed in pandas."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ]
    o["year"] = o["o_orderdate"].astype(str).str[:4]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    dO = o["year"] >= "2001"
    dC = c["c_custkey"] % 10 == 7
    o_old, o_new = o[~dO], o[dO]
    c_old, c_new = c[~dC], c[dC]
    j = lambda a, b: a.merge(b, left_on="o_custkey", right_on="c_custkey")  # noqa: E731
    boot = j(o_old, c_old)
    t1 = j(o_new, c)
    t2 = j(o_old, c_new)
    assert len(t1) > 0 and len(t2) > 0  # both delta terms carry rows
    patched = pd.concat([boot, t1, t2])
    full = j(o, c)
    assert len(patched) == len(full)
    assert sorted(patched["o_orderkey"]) == sorted(full["o_orderkey"])


def test_scd2_apply_idempotent_and_null_safe(spark):
    """Re-delivering an already-applied change batch creates ZERO new
    versions, and a change that sets an attribute to NULL is applied
    once then treated as a no-op on redelivery (the _matched marker,
    not attr-null-ness, detects the join match)."""
    import pyspark.sql.functions as F

    from etl_extractor_spark.sinks.merge import scd2_apply

    target = spark.createDataFrame(
        [
            (1, "A", "1995-01-01", None, True),
            (2, "B", "1995-01-01", None, True),
            (3, "C", "1995-01-01", None, True),
        ],
        "cust_key long, segment string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "A2"), (2, None), (3, "C")],  # change, null-change, no-op
        "cust_key long, segment string",
    )
    once = scd2_apply(target, changes, "cust_key", ["segment"], "2000-06-15")
    rows1 = {
        (r["cust_key"], r["segment"], r["is_current"], r["valid_from"], r["valid_to"])
        for r in once.collect()
    }
    assert rows1 == {
        (1, "A", False, "1995-01-01", "2000-06-15"),
        (1, "A2", True, "2000-06-15", None),
        (2, "B", False, "1995-01-01", "2000-06-15"),
        (2, None, True, "2000-06-15", None),
        (3, "C", True, "1995-01-01", None),
    }
    twice = scd2_apply(once, changes, "cust_key", ["segment"], "2001-01-01")
    rows2 = {
        (r["cust_key"], r["segment"], r["is_current"], r["valid_from"], r["valid_to"])
        for r in twice.collect()
    }
    assert rows2 == rows1  # redelivery is a pure no-op


def test_pip_blocking_is_complete(spark, sf_dir):
    """The grid-blocked containment join loses nothing: a pandas
    brute force over all polygon x point pairs (same integer math)
    equals the blocked Spark result, and every polygon registers in
    a bounded number of cells."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        _PIP_CELL,
        point_in_polygon_join,
    )

    got = {
        r["nation"]: r["n_points"]
        for r in point_in_polygon_join(spark, sf_dir).collect()
    }
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey"]]
    pts = []
    for k in c["c_custkey"]:
        k = int(k)
        px = int(hashlib.md5(f"{k}:x".encode()).hexdigest()[:8], 16) % 20001 - 10000
        py = int(hashlib.md5(f"{k}:y".encode()).hexdigest()[:8], 16) % 18001 - 9000
        pts.append((px, py))
    want: dict = {}
    for nk, name in n.values:
        nk = int(nk)
        cx, cy = (nk * 7919) % 20000 - 10000, (nk * 104729) % 18000 - 9000
        w, h = 1800 + (nk % 7) * 150, 1500 + (nk % 5) * 200
        cnt = sum(
            1 for px, py in pts if abs(px - cx) * h + abs(py - cy) * w <= w * h
        )
        if cnt:
            want[name] = cnt
        # cell fanout bound: bbox spans <= 2*2700 x 2*2300 -> <= 4x4 cells
        nx = (cx + w) // _PIP_CELL - (cx - w) // _PIP_CELL + 1
        ny = (cy + h) // _PIP_CELL - (cy - h) // _PIP_CELL + 1
        assert nx * ny <= 16
    assert got == want


def test_bloom_prunes_with_zero_false_negatives(spark, sf_dir, tmp_path):
    """The sidecar selects a strict subset of files for a sparse key
    set, and NEVER misses a file that truly contains a key (pandas
    ground truth per file)."""
    import glob

    import pyspark.sql.functions as F

    from etl_extractor_spark.sinks import bloom as BL

    path = str(tmp_path / "tbl")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    o.repartition(16, "o_custkey").write.mode("overwrite").parquet(path)
    BL.attach_blooms(spark, path, "o_custkey")
    all_keys = [r[0] for r in o.select("o_custkey").distinct().collect()]
    probe_keys = sorted(all_keys)[::7][:8]  # sparse sample
    kept = set(BL.probe_files(path, "o_custkey", probe_keys))
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(kept) < len(files)  # pruning happened
    for f in files:
        truth = set(pd.read_parquet(f)["o_custkey"])
        if truth & set(probe_keys):
            assert f in kept, f  # zero false negatives
    # the pruned read + real filter equals the full read + filter
    got = (
        BL.read_bloom_pruned(spark, path, "o_custkey", probe_keys)
        .filter(F.col("o_custkey").isin(probe_keys))
        .count()
    )
    want = o.filter(F.col("o_custkey").isin(probe_keys)).count()
    assert got == want


def test_bloom_probe_matches_spark_hash(spark):
    """The driver-side Python probe and the Spark build use the SAME
    hash sequence: build a one-file table, then every inserted key
    probes positive and (statistically) a disjoint key range mostly
    probes negative."""
    from etl_extractor_spark.sinks import bloom as BL

    df = spark.createDataFrame([(i,) for i in range(200)], "k long").coalesce(1)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df.write.parquet(path)
        BL.attach_blooms(spark, path, "k")
        for key in (0, 7, 199):
            assert BL.probe_files(path, "k", [key]), key
        misses = sum(
            0 if BL.probe_files(path, "k", [key]) else 1
            for key in range(10_000, 10_100)
        )
        assert misses > 50  # bits_per_key=10, k=2 -> fp well under 50%


def test_late_audit_actually_drops_rows(spark, sf_dir):
    """Non-vacuousness: the fixture's stragglers really fall behind
    the watermark — the state operator reports
    numRowsDroppedByWatermark > 0 — and a re-run emits the identical
    window set (replay determinism: pinned mtimes pin the batch
    order)."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        _build_late_batches,
        _late_stream_agg,
        streaming_late_data_audit,
    )

    src = _build_late_batches(spark, sf_dir)
    q = (
        _late_stream_agg(spark, src)
        .writeStream.format("memory")
        .queryName("t_late_guard")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped > 0
    r1 = {
        (r["window_start"], r["n_events"])
        for r in streaming_late_data_audit(spark, sf_dir).collect()
    }
    r2 = {
        (r["window_start"], r["n_events"])
        for r in streaming_late_data_audit(spark, sf_dir).collect()
    }
    assert r1 == r2 and len(r1) > 0


def test_incremental_diff_reads_no_shared_files(spark, sf_dir):
    """White-box invariants of the snapshot diff: (a) the base
    snapshot's files all survive into the current snapshot (appends
    never rewrite), so skipping them is sound; (b) the emitted class
    counts equal a pandas full diff of the two logical states; (c)
    'unchanged' is pure metadata (base total_rows minus delete keys)."""
    from etl_extractor_spark.plans.pipeline_ops8 import manifest_incremental_diff

    got = {
        r["change"]: r["n_rows"]
        for r in manifest_incremental_diff(spark, sf_dir).collect()
    }
    o = _orders(sf_dir)
    o["day"] = o["o_orderdate"].astype(str).str[:10]
    v1 = {
        int(k): int(c)
        for k, c in o[o["day"] < "2001-01-01"][["o_orderkey", "cents"]].values
    }
    v2 = {}
    for k, c, day in o[["o_orderkey", "cents", "day"]].values:
        k, c = int(k), int(c)
        if day >= "2001-01-01":
            v2[k] = c
        elif k % 17 == 0:
            v2[k] = c + 500
        elif k % 113 != 0:
            v2[k] = c
    want = {"added": 0, "deleted": 0, "changed": 0, "unchanged": 0}
    for k in set(v1) | set(v2):
        if k not in v1:
            want["added"] += 1
        elif k not in v2:
            want["deleted"] += 1
        elif v1[k] != v2[k]:
            want["changed"] += 1
        else:
            want["unchanged"] += 1
    assert got == want


def test_naive_bayes_brute_force_and_honesty(spark, sf_dir):
    """Pure-Python NB over the same split reproduces the confusion
    matrix exactly (engine-free), and the honesty bound holds:
    accuracy stays within sane bounds of the majority prior on this
    single-vocabulary synthetic corpus."""
    import math

    from etl_extractor_spark.plans.pipeline_ops8 import (
        naive_bayes_lang_confusion,
    )

    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in naive_bayes_lang_confusion(spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text", "lang"]]
    d["is_test"] = d["doc_id"].map(
        lambda k: int(hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16) % 4 == 0
    )
    train = d[~d["is_test"]]
    from collections import Counter, defaultdict

    cw: dict = defaultdict(Counter)
    n_c: Counter = Counter()
    vocab = set()
    for lang, text in train[["lang", "text"]].values:
        toks = [w for w in text.split(" ") if w]
        cw[lang].update(toks)
        n_c[lang] += len(toks)
        vocab.update(toks)
    V = len(vocab)
    langs = sorted(n_c)
    dn = len(train)
    prior = {
        L: math.floor(math.log(len(train[train["lang"] == L]) / dn) * 1e6)
        for L in langs
    }
    wt = {
        L: {w: math.floor(math.log((cw[L][w] + 1) / (n_c[L] + V)) * 1e6) for w in cw[L]}
        for L in langs
    }
    oov = {L: math.floor(math.log(1.0 / (n_c[L] + V)) * 1e6) for L in langs}
    want: Counter = Counter()
    for _, row in d[d["is_test"]].iterrows():
        toks = [w for w in row["text"].split(" ") if w]
        best = max(
            langs,
            key=lambda L: (
                prior[L] + sum(wt[L].get(w, oov[L]) for w in toks),
                [-ord(ch) for ch in L],
            ),
        )
        want[(row["lang"], best)] += 1
    assert got == dict(want)
    correct = sum(v for (t, p), v in got.items() if t == p)
    total = sum(got.values())
    majority = d[d["is_test"]]["lang"].value_counts().max()
    # honesty: mechanics certified; accuracy near prior on this corpus
    assert total > 0 and correct <= total
    assert correct >= majority * 0.5  # not pathologically broken either


def test_largest_remainder_sums_to_budget(spark, sf_dir):
    """The allocation invariants: sum(alloc) == (8N) div 10 exactly,
    and every stratum is within 1 of its proportional share."""
    from etl_extractor_spark.plans.pipeline_ops8 import largest_remainder_split

    rows = largest_remainder_split(spark, sf_dir).collect()
    n_total = sum(r["n_docs"] for r in rows)
    budget = (8 * n_total) // 10
    assert sum(r["alloc_train"] for r in rows) == budget
    for r in rows:
        exact = r["n_docs"] * budget / n_total
        assert abs(r["alloc_train"] - exact) < 1, r


def test_twap_brute_force(spark, sf_dir):
    """Pure-Python TWAP per user equals the query (integer micro
    arithmetic end to end)."""
    from etl_extractor_spark.plans.pipeline_ops8 import time_weighted_avg_value

    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twap_e4"])
        for r in time_weighted_avg_value(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_id", "ts", "value"]
    ]
    e["us"] = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    e["v_e4"] = e["value"].map(lambda v: math_floor_half_up(v))
    want = {}
    for uid, grp in e.groupby("user_id"):
        g = grp.sort_values(["us", "event_id"])
        us = g["us"].tolist()
        vs = g["v_e4"].tolist()
        num = sum((us[i + 1] - us[i]) * vs[i] for i in range(len(us) - 1))
        den = us[-1] - us[0]
        if den > 0:
            import math

            # mirror the engines' op order: convert BOTH ints to double
            # first (num can exceed 2^53; Python's int/int would round
            # the true ratio instead and can flip the floor by 1 ulp)
            want[uid] = (len(us), den, math.floor(float(num) / float(den)))
    assert got == want


def math_floor_half_up(v: float) -> int:
    import math

    return int(math.floor(v * 10000 + 0.5))


def test_csv_quarantine_classifier_is_projection_robust(spark, tmp_path):
    """The corrupt flag for SHORT rows depends on CSV column pruning
    (measured); the classifier must emit identical classes whether the
    flag fired or not. Pin both parses of a 4-line fixture."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    p = tmp_path / "c"
    p.mkdir()
    (p / "a.csv").write_text(
        "1,2020-01-01,10.50\n2,2020-01-02,N/A\n3,2020-01-03\n4,2020-01-04,7.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("day", T.StringType()),
            T.StructField("amt", T.DecimalType(18, 2)),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    cls = (
        F.when(
            F.col("_corrupt_record").isNotNull()
            & F.col("_corrupt_record").endswith(",N/A"),
            F.lit("bad_number"),
        )
        .when(F.col("_corrupt_record").isNotNull(), F.lit("truncated"))
        .when(F.col("amt").isNull(), F.lit("truncated"))
        .otherwise(F.lit("clean"))
    )
    # pruned path (aggregate references class only)
    pruned = {
        r["class"]: r["n"]
        for r in raw.select(cls.alias("class"))
        .groupBy("class")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # full-materialization path (collect everything, classify in python)
    full = {"clean": 0, "bad_number": 0, "truncated": 0}
    for r in raw.collect():
        if r["_corrupt_record"] is not None and r["_corrupt_record"].endswith(",N/A"):
            full["bad_number"] += 1
        elif r["_corrupt_record"] is not None or r["amt"] is None:
            full["truncated"] += 1
        else:
            full["clean"] += 1
    assert pruned == {k: v for k, v in full.items() if v}
    assert pruned == {"clean": 2, "bad_number": 1, "truncated": 1}


def test_golden_record_brute_force(spark, sf_dir):
    """Pure-Python survivorship (latest-non-null-wins per field over
    the deterministic record explosion) equals the query."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        golden_record_survivorship,
    )

    got = {
        r["nation"]: (r["n_customers"], r["n_name_filled"], r["bal_cents"])
        for r in golden_record_survivorship(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey", "c_name", "c_acctbal"]
    ]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    nmap = dict(zip(n["n_nationkey"], n["n_name"]))
    agg: dict = {}
    for k, nk, name, bal in c.values:
        k = int(k)
        bal_c = int(round(float(bal) * 100))
        g_name, g_bal, best_n, best_b = None, None, -1, -1
        for r in range(0, int(k % 3) + 1):
            if (k + r) % 2 != 0 and r > best_n:
                g_name, best_n = name, r
            if (k + r) % 3 != 0 and r > best_b:
                g_bal, best_b = bal_c, r
        nat = nmap[nk]
        cur = agg.setdefault(nat, [0, 0, 0])
        cur[0] += 1
        cur[1] += g_name is not None
        cur[2] += g_bal or 0
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_scd2_intra_batch_redelivery_and_null_flag(spark):
    """Review-pass regressions pinned: (a) the SAME change delivered
    twice in ONE batch produces exactly one closed + one inserted row;
    (b) a target row with NULL is_current passes through untouched
    instead of vanishing."""
    from etl_extractor_spark.sinks.merge import scd2_apply

    target = spark.createDataFrame(
        [
            (1, "A", "1995-01-01", None, True),
            (9, "Z", "1990-01-01", None, None),  # never-backfilled flag
        ],
        "cust_key long, segment string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "B"), (1, "B")], "cust_key long, segment string"
    )
    rows = {
        (r["cust_key"], r["segment"], r["is_current"], r["valid_to"])
        for r in scd2_apply(target, changes, "cust_key", ["segment"], "2000-01-01").collect()
    }
    assert rows == {
        (1, "A", False, "2000-01-01"),
        (1, "B", True, None),
        (9, "Z", None, None),  # passed through, flag untouched
    }


def test_bloom_probe_value_rendering(spark, tmp_path):
    """Review-pass regression pinned: probe values render exactly as
    Spark's CAST(col AS STRING) — booleans lowercase, ambiguous types
    rejected loudly (a silent divergence is a false negative)."""
    import pytest as _pytest

    from etl_extractor_spark.sinks import bloom as BL

    path = str(tmp_path / "b")
    spark.createDataFrame([(True,), (False,)], "flag boolean").coalesce(
        1
    ).write.parquet(path)
    BL.attach_blooms(spark, path, "flag")
    assert BL.probe_files(path, "flag", [True])  # 'true', not 'True'
    assert BL.probe_files(path, "flag", [False])
    with _pytest.raises(TypeError):
        BL.probe_files(path, "flag", [1.5])


def test_reflection_identity_matches_literal_recurrence(spark, sf_dir):
    """The window-expressible form b_t = S_t - min(0, min_k S_k)
    equals the literal sequential clamp recurrence
    b_t = max(0, b_{t-1} + d_t), event by event, and clamps actually
    FIRE on this fixture (at least one zero-touch after a negative
    delta)."""
    import math

    from etl_extractor_spark.plans.pipeline_ops8 import inventory_running_clamp

    got = {
        r["user_id"]: (
            r["n_events"],
            r["final_balance"],
            r["peak_balance"],
            r["n_zero_touches"],
        )
        for r in inventory_running_clamp(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_id", "ts", "event_type", "value"]
    ]
    e["us"] = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    real_clamp = 0
    for uid, grp in e.groupby("user_id"):
        g = grp.sort_values(["us", "event_id"])
        b, peak, zero = 0, 0, 0
        for _, row in g.iterrows():
            q = int(math.floor(float(row["value"]) * 100 + 0.5))
            d = q if row["event_type"] == "purchase" else -(q // 4)
            nb = b + d
            if nb < 0:
                real_clamp += 1
            b = max(0, nb)
            peak = max(peak, b)
            zero += b == 0
        assert got[uid] == (len(g), b, peak, zero), uid
    assert real_clamp > 0  # the clamp path is exercised, not vacuous


def test_mv_cdc_retraction_kills_dead_days(spark, sf_dir):
    """The retraction subtlety: at least one pre-2001 day must lose
    ALL its orders to deletes in this fixture... or, when none does,
    the n>0 filter must still be provably load-bearing — so this
    guard constructs a micro MV where a day dies and asserts the
    signed-delta merge drops it."""
    import pyspark.sql.functions as F

    base = spark.createDataFrame(
        [("d1", 2, 1000), ("d2", 1, 500)],
        "day string, n_orders long, revenue_cents long",
    )
    partials = spark.createDataFrame(
        [("d2", -1, -500), ("d1", -1, -300)],
        "day string, n_orders long, revenue_cents long",
    )
    merged = (
        base.unionByName(partials)
        .groupBy("day")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )
    rows = {(r["day"], r["n_orders"], r["revenue_cents"]) for r in merged.collect()}
    assert rows == {("d1", 1, 700)}  # d2 died and dropped out


def test_ts_repair_literal_recurrence(spark, sf_dir):
    """The closed form rn + max_k(reported_k - rn_k) equals the
    literal repaired_t = max(reported_t, repaired_{t-1} + 1)
    recurrence event-by-event, and repairs actually fire."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        _TS_JITTER_HALF,
        _TS_JITTER_MOD,
        monotonic_ts_repair,
    )

    got = {
        r["user_id"]: (
            r["n_events"],
            r["n_repaired"],
            r["total_shift_us"],
            r["final_us"],
        )
        for r in monotonic_ts_repair(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_id", "ts"]]
    e["true_us"] = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    total_repaired = 0
    for uid, grp in e.groupby("user_id"):
        g = grp.sort_values(["true_us", "event_id"])
        prev, n_rep, shift, final = None, 0, 0, 0
        for _, row in g.iterrows():
            j = (
                int(
                    hashlib.md5(f"{int(row['event_id'])}:j".encode()).hexdigest()[:12],
                    16,
                )
                % _TS_JITTER_MOD
                - _TS_JITTER_HALF
            )
            rep = int(row["true_us"]) + j
            fixed = rep if prev is None else max(rep, prev + 1)
            n_rep += fixed != rep
            shift += fixed - rep
            prev, final = fixed, max(final, fixed)
        assert got[uid] == (len(g), n_rep, shift, final), uid
        total_repaired += n_rep
    assert total_repaired > 0  # the repair path is exercised


def test_mv_cdc_stream_state_is_batch_order_independent(spark, tmp_path):
    """Signed-delta SUM state converges to the same answer whatever
    the micro-batch split or order (associative + commutative): merge
    the same rows under two different splits via the incremental sink
    and compare state row-for-row."""
    import pyspark.sql.functions as F

    from etl_extractor_spark.sinks.incremental import apply_batch, read_state

    rows = [("d1", 1, 100), ("d1", -1, -100), ("d2", 1, 50), ("d2", 0, 7)]
    df = spark.createDataFrame(rows, "day string, dn long, dc long")
    measures = {"n_orders": ("sum", "dn"), "revenue_cents": ("sum", "dc")}
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    apply_batch(spark, p1, df.limit(2), ["day"], measures, batch_id=0)
    apply_batch(spark, p1, df.subtract(df.limit(2)), ["day"], measures, batch_id=1)
    apply_batch(spark, p2, df.orderBy(F.desc("day")), ["day"], measures, batch_id=0)
    s1 = {
        (r["day"], r["n_orders"], r["revenue_cents"])
        for r in read_state(spark, p1).collect()
    }
    s2 = {
        (r["day"], r["n_orders"], r["revenue_cents"])
        for r in read_state(spark, p2).collect()
    }
    assert s1 == s2 == {("d1", 0, 0), ("d2", 1, 57)}


def test_recursive_cte_depth_brute_force(spark, sf_dir):
    """Pandas BFS over parent(k) = k // 3 (roots k < 3) reproduces the
    per-depth rollup; pins the self-loop guard (key 0 seeds once and
    never recurses onto itself)."""
    from etl_extractor_spark.plans.pipeline_ops8 import recursive_cte_depth_rollup

    got = {
        r["depth"]: (r["n_customers"], r["bal_cents"])
        for r in recursive_cte_depth_rollup(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_acctbal"]]
    depth = {}
    for k in sorted(int(x) for x in c["c_custkey"]):
        depth[k] = 1 if k < 3 else depth[k // 3] + 1
    want: dict = {}
    for k, bal in c.values:
        k = int(k)
        d = depth[k]
        cur = want.setdefault(d, [0, 0])
        cur[0] += 1
        cur[1] += int(round(float(bal) * 100))
    assert got == {d: tuple(v) for d, v in want.items()}


def test_udtf_installments_are_exact_partitions(spark, sf_dir):
    """Engine-free invariant: per order, the installment parts sum
    EXACTLY to the order's cents and differ by at most 1 (largest
    remainder), via the registered UDTF itself on a small slice."""
    import pyspark.sql.functions as F

    from etl_extractor_spark.plans.pipeline_ops8 import python_udtf_installments

    # registering the query once also registers the UDTF
    python_udtf_installments(spark, sf_dir).collect()
    rows = spark.sql(
        """
        SELECT o_orderkey, cents, f.seq, f.part_cents
        FROM (SELECT * FROM _udtf_orders ORDER BY o_orderkey LIMIT 50)
             , LATERAL installments(o_orderkey, cents) f
        """
    ).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["o_orderkey"], r["cents"]), []).append(r["part_cents"])
    assert by_key
    for (k, cents), parts in by_key.items():
        assert len(parts) == k % 3 + 1
        assert sum(parts) == cents
        assert max(parts) - min(parts) <= 1


def test_null_safe_join_routes_all_orphans(spark, sf_dir):
    """Every % 37 == 0 customer lands on UNKNOWN and nothing is lost:
    the per-nation counts sum to the full customer count."""
    from etl_extractor_spark.plans.pipeline_ops8 import null_safe_join_parity

    rows = {r["nation"]: r["n_customers"] for r in null_safe_join_parity(spark, sf_dir).collect()}
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey"]]
    orphans = int((c["c_custkey"] % 37 == 0).sum())
    assert rows["UNKNOWN"] == orphans > 0
    assert sum(rows.values()) == len(c)


def test_pipe_syntax_pushes_filters(spark, sf_dir):
    """The pipe-syntax chain compiles to the same pushed-down scan as
    classic SQL: the orders scan carries a PushedFilters entry for the
    date predicate (parser surface, not a new execution path)."""
    from etl_extractor_spark.plans.pipeline_ops8 import pipe_syntax_star_revenue

    plan = pipe_syntax_star_revenue(spark, sf_dir)._jdf.queryExecution().toString()
    assert "PushedFilters: [" in plan
    assert "o_orderdate" in plan.split("PushedFilters:")[1][:300]


def test_sql_scripting_variable_binding(spark, sf_dir):
    """The script's branch and threshold bind correctly: label equals
    the corpus parity and every emitted group's revenue implies
    above-cutoff rows only (pandas re-derivation)."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        sql_scripting_threshold_report,
    )

    rows = sql_scripting_threshold_report(spark, sf_dir).collect()
    o = _orders(sf_dir)
    cutoff = int(o["cents"].max()) // 2
    label = "even-corpus" if len(o) % 2 == 0 else "odd-corpus"
    big = o[o["cents"] > cutoff]
    want = big.groupby("o_orderstatus")["cents"].agg(["count", "sum"])
    assert {r["corpus_label"] for r in rows} == {label}
    got = {r["status"]: (r["n_big_orders"], r["revenue_cents"]) for r in rows}
    assert got == {
        s: (int(c), int(v)) for s, (c, v) in want.iterrows()
    }


def test_collated_fixture_has_real_case_variants(spark, sf_dir):
    """Non-degeneracy: at least one collated group folds >1 casing
    (otherwise the collation proves nothing), and totals are
    lossless."""
    from etl_extractor_spark.plans.pipeline_ops8 import collated_segment_rollup

    rows = collated_segment_rollup(spark, sf_dir).collect()
    assert max(r["n_case_variants"] for r in rows) > 1
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    assert sum(r["n_customers"] for r in rows) == len(c)


def test_ordered_string_agg_is_run_stable(spark, sf_dir):
    """Determinism: two runs produce byte-identical first_names cells
    (collect_list alone would not), and each cell equals the pandas
    sorted-first-3 derivation."""
    from etl_extractor_spark.plans.pipeline_ops8 import ordered_string_agg

    r1 = {r["nation"]: r["first_names"] for r in ordered_string_agg(spark, sf_dir).collect()}
    r2 = {r["nation"]: r["first_names"] for r in ordered_string_agg(spark, sf_dir).collect()}
    assert r1 == r2
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_name", "c_nationkey"]]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    for nat, grp in j.groupby("n_name"):
        want = "|".join(sorted(grp["c_name"])[:3])
        assert r1[nat] == want, nat


def test_burst_collapse_lag_rule_brute(spark, sf_dir):
    """Pure-Python lag-rule debounce equals the query, and the fixture
    actually collapses something (kept < total)."""
    from etl_extractor_spark.plans.pipeline_ops8 import (
        _BURST_GAP_US,
        event_burst_collapse,
    )

    got = {
        r["event_type"]: (r["n_kept"], r["n_users"])
        for r in event_burst_collapse(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "event_type", "event_id", "ts"]
    ]
    e["us"] = pd.to_datetime(e["ts"]).astype("datetime64[us]").astype("int64")
    want: dict = {}
    for (uid, et), grp in e.groupby(["user_id", "event_type"]):
        g = grp.sort_values(["us", "event_id"])
        prev = None
        for _, row in g.iterrows():
            if prev is None or row["us"] - prev >= _BURST_GAP_US:
                cur = want.setdefault(et, [0, set()])
                cur[0] += 1
                cur[1].add(uid)
            prev = row["us"]
    assert got == {k: (v[0], len(v[1])) for k, v in want.items()}
    assert sum(v[0] for v in got.values()) < len(e)  # something collapsed
