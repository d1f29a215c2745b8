"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's CORRECTNESS gate (sf0.01 there; sf0.001 here
for speed — set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 for the full
check).
"""

from __future__ import annotations

import pytest

from etl_extractor_spark.plans.registry import all_oracles, all_queries
from tests.oracle import compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, con):
    assert name in QUERIES, f"oracle {name} has no query"
    n = compare(QUERIES[name](spark, sf_dir), con, ORACLES[name])
    assert n >= 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
