"""The as-of trio vs pandas.merge_asof — the canonical reference
implementation — on randomized event frames.

merge_asof(direction=backward|forward|nearest) with allow_exact_matches
=True is exactly the operator contract; random (user, ts) layouts with
duplicate timestamps ACROSS types (click at the same instant as a
purchase) exercise the at-or-before/at-or-after tie paths the synthetic
events data may not. Timestamps are generated unique per (user, type)
— pandas breaks WITHIN-side ties by position, our operator by event_id,
so within-side duplicates are out of the shared contract (the engine
keeps them deterministic; pandas does not)."""

from __future__ import annotations

import random

import pandas as pd

from etl_extractor_spark.operators.events import (
    asof_join_last_event,
    asof_join_next_event,
    asof_join_nearest_event,
)

TS_FMT = "%Y-%m-%d %H:%M:%S"


def _random_events(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-03-01 00:00:00")
    for user in range(1, 4):
        used = {"purchase": set(), "click": set()}
        for _ in range(rng.randint(3, 25)):
            typ = rng.choice(["purchase", "click", "view"])
            # unique ts within (user, type); collisions across types stay.
            # INTEGER-millisecond grain: sub-second gaps must drive the
            # nearest pick even though display columns truncate to
            # seconds — and exact ms alignment keeps the pandas (ns) and
            # Spark (us) representations identical (float seconds leave
            # ns residue that Spark truncates but pandas keeps)
            sec = rng.randint(0, 3600 * 1000)
            if typ in used and sec in used.get(typ, ()):
                continue
            if typ in used:
                used[typ].add(sec)
            rows.append(
                (eid, base + pd.Timedelta(milliseconds=sec), user, typ, 0.0, "{}")
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def _pandas_asof(pdf: pd.DataFrame, direction: str) -> set[tuple]:
    p = (
        pdf[pdf.event_type == "purchase"][["user_id", "event_id", "ts"]]
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    c = (
        pdf[pdf.event_type == "click"][["user_id", "event_id", "ts"]]
        .rename(columns={"event_id": "click_id", "ts": "cts"})
        .sort_values("cts", kind="mergesort")
        .reset_index(drop=True)
    )
    m = pd.merge_asof(
        p,
        c,
        left_on="ts",
        right_on="cts",
        by="user_id",
        direction=direction,
        allow_exact_matches=True,
    )
    return {
        (
            int(r.user_id),
            int(r.event_id),
            r.ts.strftime(TS_FMT),
            None if pd.isna(r.click_id) else int(r.click_id),
            None if pd.isna(r.cts) else r.cts.strftime(TS_FMT),
        )
        for r in m.itertuples()
    }


def _spark_asof(spark, pdf: pd.DataFrame, which) -> set[tuple]:
    sdf = spark.createDataFrame(pdf)
    out = which(sdf).collect()
    return {tuple(r) for r in out}


def test_asof_trio_matches_pandas_merge_asof(spark):
    for seed in range(8):
        pdf = _random_events(seed)
        assert _spark_asof(spark, pdf, asof_join_last_event) == _pandas_asof(
            pdf, "backward"
        ), f"backward diverged at seed {seed}"
        assert _spark_asof(spark, pdf, asof_join_next_event) == _pandas_asof(
            pdf, "forward"
        ), f"forward diverged at seed {seed}"
        assert _spark_asof(spark, pdf, asof_join_nearest_event) == _pandas_asof(
            pdf, "nearest"
        ), f"nearest diverged at seed {seed}"
