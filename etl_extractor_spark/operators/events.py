"""Event-stream operators (batch form; streaming twins in streaming/).

Tumbling/sliding windows are Spark's native ``window()`` (codegen,
partial aggregation before the shuffle). Sessionization comes in two
equivalent implementations:

- ``session_window()`` — Spark-native, the preferred path;
- ``sessionize_pandas`` — a grouped-map (applyInPandas) custom stateful
  operator with identical semantics (gap ≥ 30 min splits). This is the
  template for stateful logic Spark lacks natively; it shuffles once on
  user_id and Arrow-batches each group through Python.

Both are pinned by the same gaps-and-islands DuckDB oracle.

Session-merge semantics (shared by all three): windows are half-open,
so a gap EXACTLY equal to the threshold starts a new session.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(df: DataFrame, window: str = "1 hour") -> DataFrame:
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(df: DataFrame, window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user."""
    return (
        df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_pandas(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful sessionization as a grouped-map Pandas UDF —
    the applyInPandas template for operators Spark lacks. Semantics
    identical to ``sessionize`` (gap ≥ threshold ⇒ split)."""
    schema = (
        "user_id long, session_start string, session_end string, "
        "n_events long, sum_value double"
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
        diffs = pdf["ts"].diff()
        new_session = diffs.isna() | (diffs >= gap)
        sid = new_session.cumsum()
        out = pdf.groupby(sid).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        )
        out["user_id"] = pdf["user_id"].iloc[0]
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out["session_end"] = (out["session_end"] + gap).dt.strftime("%Y-%m-%d %H:%M:%S")
        out["sum_value"] = out["sum_value"].round(4)
        return out[["user_id", "session_start", "session_end", "n_events", "sum_value"]]

    return (
        df.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, schema)
    )


def asof_join_last_event(
    df: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    tolerance_minutes: int | None = None,
) -> DataFrame:
    """AS-OF join: for each left event, the latest right event at or
    before it (per key) — e.g. the click that preceded each purchase.

    Spark has no native as-of join. The scalable formulation is NOT a
    range join (which explodes to |L|×|R| candidate pairs per key) but
    a union + single event-time sort per key + last-value carry-forward
    window: one shuffle on the key, linear work, no pair blowup —
    exactly how you'd run it over 100 TB of events.
    """
    from pyspark.sql import Window

    tagged = df.filter(F.col("event_type").isin(left_type, right_type)).select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("_r_id"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("_r_ts"),
    )
    # rows ordered by time; right-side ids carried forward onto later rows.
    # Tie-break: right events sort BEFORE left at the same timestamp, so a
    # simultaneous right event is visible to the left row ("at or before").
    order = [F.col("ts"), (F.col("event_type") == left_type).cast("int"), F.col("event_id")]
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    carried = tagged.select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.last("_r_id", ignorenulls=True).over(w).alias("prev_right_id"),
        F.last("_r_ts", ignorenulls=True).over(w).alias("prev_right_ts"),
    )
    if tolerance_minutes is not None:
        # merge_asof-style tolerance: a carried right event older than
        # the tolerance is as good as no match — null both columns.
        within = F.col("_r_ok")
        carried = carried.withColumn(
            "_r_ok",
            F.col("prev_right_ts")
            >= F.col("ts") - F.expr(f"INTERVAL {tolerance_minutes} MINUTES"),
        ).select(
            key,
            "ts",
            "event_id",
            "event_type",
            F.when(within, F.col("prev_right_id")).alias("prev_right_id"),
            F.when(within, F.col("prev_right_ts")).alias("prev_right_ts"),
        )
    return carried.filter(F.col("event_type") == left_type).select(
        F.col(key).cast("long").alias(key),
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        F.col("prev_right_id").alias("last_click_id"),
        F.date_format("prev_right_ts", TS_FMT).alias("last_click_ts"),
    )


def asof_join_next_event(
    df: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
) -> DataFrame:
    """FORWARD as-of join (pandas ``merge_asof(direction="forward")``):
    for each left event, the EARLIEST right event at or after it per
    key — e.g. the first click following each purchase.

    Same single-shuffle carry formulation as ``asof_join_last_event``,
    with the event-time sort REVERSED: in descending order, "carry the
    nearest preceding right row" is exactly "the next right event in
    real time". Deterministic tie-breaks: closest timestamp wins, then
    the smallest right event_id among simultaneous right events (the
    oracle states the same argmin).
    """
    from pyspark.sql import Window

    tagged = df.filter(F.col("event_type").isin(left_type, right_type)).select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("_r_id"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("_r_ts"),
    )
    # ts desc: preceding rows are LATER in real time; right events sort
    # before left at the same timestamp ("at or after" includes ties);
    # event_id desc makes the nearest-preceding tie the smallest id.
    order = [
        F.col("ts").desc(),
        (F.col("event_type") == left_type).cast("int"),
        F.col("event_id").desc(),
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.last("_r_id", ignorenulls=True).over(w).alias("next_right_id"),
        F.last("_r_ts", ignorenulls=True).over(w).alias("next_right_ts"),
    )
    return carried.filter(F.col("event_type") == left_type).select(
        F.col(key).cast("long").alias(key),
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        F.col("next_right_id").alias("next_click_id"),
        F.date_format("next_right_ts", TS_FMT).alias("next_click_ts"),
    )


def asof_join_nearest_event(
    df: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction="nearest")``):
    the right event closest in time to each left event, in either
    direction; ties go to the earlier (backward) match — pandas
    semantics.

    ONE tagged frame carries both directions: the backward and forward
    windows share ``partitionBy(key)``, so this is one scan and one
    key shuffle (two sorts), no self-join. The gap compare runs on the
    RAW event timestamps (wall-clock microsecond diff) — comparing the
    second-truncated display strings would mis-pick whenever sub-second
    precision decides which side is nearer."""
    from pyspark.sql import Window

    tagged = df.filter(F.col("event_type").isin(left_type, right_type)).select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("_r_id"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("_r_ts"),
    )
    is_left = (F.col("event_type") == left_type).cast("int")
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("ts"), is_left, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("ts").desc(), is_left, F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.select(
        key,
        "ts",
        "event_id",
        "event_type",
        F.last("_r_id", ignorenulls=True).over(w_back).alias("prev_id"),
        F.last("_r_ts", ignorenulls=True).over(w_back).alias("prev_ts"),
        F.last("_r_id", ignorenulls=True).over(w_fwd).alias("next_id"),
        F.last("_r_ts", ignorenulls=True).over(w_fwd).alias("next_ts"),
    )
    # full-precision wall-clock gaps; timestampdiff on the NTZ values is
    # session-timezone-free
    prev_gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    next_gap = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    take_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (prev_gap <= next_gap)
    )
    return carried.filter(F.col("event_type") == left_type).select(
        F.col(key).cast("long").alias(key),
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        F.when(take_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("nearest_click_id"),
        F.date_format(
            F.when(take_prev, F.col("prev_ts")).otherwise(F.col("next_ts")), TS_FMT
        ).alias("nearest_click_ts"),
    )


def interval_join_counts(
    df: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    window_minutes: int = 30,
) -> DataFrame:
    """Interval/range join: count right events in the (t-w, t] window
    before each left event, per key. The equi-key keeps the join
    hash-partitioned; the range predicate filters within partitions."""
    left = df.filter(F.col("event_type") == left_type).select(
        F.col(key).alias("k"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pt")
    )
    right = df.filter(F.col("event_type") == right_type).select(
        F.col(key).alias("k2"), F.col("ts").alias("ct")
    )
    win = F.expr(f"INTERVAL {window_minutes} MINUTES")
    joined = left.join(
        right,
        (left.k == right.k2) & (right.ct <= left.pt) & (right.ct > left.pt - win),
        "left",
    )
    return (
        joined.groupBy(F.col("k").cast("long").alias(key), "purchase_id")
        .agg(F.count("ct").alias("n_clicks_30m"))
    )


def json_props_stats(df: DataFrame) -> DataFrame:
    """Schema-on-read JSON extraction (S3 analog on a column): pull a
    typed value out of a JSON string column, aggregate by facet."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# Single source of truth for the rate-limit quota contract — the batch
# operator default, plans/events.events_rate_limit's oracle, and the
# streaming twin's state bucket all derive from these two values;
# re-declaring them anywhere silently breaks the batch/stream equality
# the tests certify (review catch).
RL_WINDOW = "1 day"
RL_MAX = 2


def rate_limit(
    df: DataFrame, window: str = RL_WINDOW, max_per_window: int = RL_MAX
) -> DataFrame:
    """Per-user rate limiting: within each tumbling window a user's
    first ``max_per_window`` events (by ts, event_id) pass, the rest
    are dropped — the batch specification of an ingestion throttle /
    per-client quota (streaming twin:
    `streaming/events_stream.py::streaming_rate_limit`). Returns the
    event stream annotated with ``is_kept`` so callers can either
    filter or audit.

    One shuffle: the ranking window partitions by (user_id, bucket) —
    the same key any per-user quota state would shard on at scale.
    The bucket comes from F.window over the NTZ timestamp, so the
    decision is session-timezone-independent.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(
        "user_id", F.window("ts", window)
    ).orderBy("ts", "event_id")
    return df.withColumn(
        "is_kept", (F.row_number().over(w) <= max_per_window)
    )
