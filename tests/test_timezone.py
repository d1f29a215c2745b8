"""Session-timezone independence of epoch/date arithmetic.

The driver supplies its OWN SparkSession, which may run in any zone:
every query must produce identical results under UTC, a DST zone, and
a sub-hour-offset zone. Round-3 regression: ``events_gapfill_rollup``
bucketed on ``unix_micros(cast(ts as timestamp))`` — the NTZ→instant
cast reinterprets the wall clock in the session zone, shifting the
6-hour bucket grid (18150 vs 18000 rows under America/New_York).
Fixed via wall-clock NTZ arithmetic (functions/dates.py
``ntz_epoch_micros``/``ntz_from_epoch_micros``/``ntz_epoch_seconds``).
"""

from __future__ import annotations

import pytest

from etl_extractor_spark.plans.registry import all_oracles, all_queries
from tests.oracle import compare, duckdb_con

# the queries that do epoch bucketing / epoch diffs / range frames —
# the operations that break first under a session-zone reinterpretation
PROBE = (
    "events_gapfill_rollup",
    "events_user_lag_rolling",
    "customer_trailing_30d_spend",
    "dim_date",
    "events_tumbling",
)


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kathmandu"])
def test_queries_session_tz_independent(spark, sf_dir, tz):
    qs, os_ = all_queries(), all_oracles()
    con = duckdb_con(sf_dir)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        for name in PROBE:
            compare(qs[name](spark, sf_dir), con, os_[name])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
