"""Guards for the round-10 wave (plans/pipeline_ops9).

Value correctness is covered by the parametrized oracle gate
(test_queries_oracle); these tests pin what the oracle can't see: the
registry-window protection the wave's rank-3 defer tier exists for,
and the crash-resume recovery contract's NEGATIVE space (a fresh
checkpoint reprocesses everything; a recovered one must not).
"""

from __future__ import annotations

import importlib

import pytest


_ORACLES: dict = {}


def _registry_order(pinned: dict) -> list[str]:
    import etl_extractor_spark.plans.registry as R

    oracles: dict = {}
    out: dict = {}
    for m in R._MODULES:
        mod = importlib.import_module(m)
        out.update({k: None for k in getattr(mod, "QUERIES", {})})
        oracles.update(getattr(mod, "ORACLES", {}))
    _ORACLES.update(oracles)
    orig = R._driver_checked
    R._driver_checked = lambda: pinned
    try:
        return list(R._ordered(out, oracles))
    finally:
        R._driver_checked = orig


def test_r10_window_protected_from_ops9():
    """With CORRECTNESS pinned through r9, the 50-slot r10 window is
    exactly the judge-pre-verified composition — 15 real-r2 stale +
    8 ops6 + 15 ops7 + 12 ops8 — and NO ops9 name is inside it."""
    from conftest import pinned_driver_checked

    from etl_extractor_spark.plans import pipeline_ops6 as p6
    from etl_extractor_spark.plans import pipeline_ops7 as p7
    from etl_extractor_spark.plans import pipeline_ops8 as p8
    from etl_extractor_spark.plans import pipeline_ops9 as p9

    pinned = pinned_driver_checked(9)
    window = _registry_order(pinned)[:50]
    assert not (set(window) & set(p9.QUERIES))
    n6 = len(set(window) & set(p6.QUERIES))
    n7 = len(set(window) & set(p7.QUERIES))
    n8 = len(set(window) & set(p8.QUERIES))
    real_r2 = [
        n
        for n in window
        if pinned.get(n) == 2
        and n not in set(p6.QUERIES) | set(p7.QUERIES) | set(p8.QUERIES)
    ]
    assert (len(real_r2), n6, n7, n8) == (15, 8, 15, 12)


def test_ops9_names_enter_rotation_behind_real_r3():
    """After r10 AND r11 drain (simulated), ops9 names appear behind
    every real r3-checked name still in the stale rotation — the
    rank-3 tie resolves by stable module order, so the scheduled
    oldest-r3 re-checks are never displaced."""
    from conftest import pinned_driver_checked

    from etl_extractor_spark.plans import pipeline_ops9 as p9

    pinned = pinned_driver_checked(9)
    r10 = _registry_order(pinned)[:50]
    after_r10 = dict(pinned, **{n: 10 for n in r10})
    r11 = _registry_order(after_r10)[:50]
    after_r11 = dict(after_r10, **{n: 11 for n in r11})
    order = _registry_order(after_r11)
    pos = {n: i for i, n in enumerate(order)}
    # Only ORACLE-BACKED r3 names: rows-only names sort behind every
    # oracle-backed name by design (a rows-only slot burns a sweep
    # entry as no_oracle), so they are not part of the displacement
    # invariant.
    real_r3 = [
        n
        for n, rnd in after_r11.items()
        if rnd == 3 and n in pos and n not in p9.QUERIES and n in _ORACLES
    ]
    assert real_r3, "simulation left real r3-era names in rotation"
    last_real_r3 = max(pos[n] for n in real_r3)
    assert all(pos[n] > last_real_r3 for n in p9.QUERIES if n in pos)


def test_crash_resume_requires_checkpoint_state(spark, sf_dir):
    """Negative space of the recovery contract: the in-query assertion
    pins batches == [0, 1, 1, 2] (batch 0 never re-read after the
    crash). This test re-runs the query twice in one session to prove
    the fixture re-arms (fresh checkpoint each call → the crash fires
    both times) — a stale-checkpoint leak would silently skip the
    crash path and certify nothing."""
    from etl_extractor_spark.plans.pipeline_ops9 import (
        streaming_crash_resume_replay,
    )

    a = streaming_crash_resume_replay(spark, sf_dir).collect()
    b = streaming_crash_resume_replay(spark, sf_dir).collect()
    assert a == b and len(a) > 0


def test_crash_resume_state_survives_in_counts(spark, sf_dir):
    """The split-by-modulo fixture makes every day span all 3 batches:
    if the restarted query LOST batch-0 state, the final per-day
    counts would be ~2/3 of the truth. Compare against pandas."""
    import pandas as pd

    from etl_extractor_spark.plans.pipeline_ops9 import (
        streaming_crash_resume_replay,
    )

    got = {
        r["day"]: r["n_events"]
        for r in streaming_crash_resume_replay(spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = e.groupby(e["ts"].astype(str).str[:10]).size()
    assert got == {str(k): int(v) for k, v in want.items()}
