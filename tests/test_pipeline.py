"""End-to-end pipeline test (reference §5 log-based reconciliation,
re-expressed as assertions): run the full ETL on sf0.001 into a temp
lakehouse, check dimension/fact counts and FK invariants."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_extractor_spark.pipeline import run_pipeline
from etl_extractor_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def lake(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        sources = {
            name: load_table(spark, sf_dir, name)
            for name in ("customer", "part", "supplier", "orders", "lineitem", "events")
        }
        counts = run_pipeline(
            spark,
            sources,
            staging_dir=os.path.join(tmp, "staging"),
            gold_dir=os.path.join(tmp, "gold"),
        )
        yield spark, tmp, counts


def test_dimension_counts_match_sources(lake, spark, sf_dir):
    _, _, counts = lake
    assert counts["dim_cliente"] == load_table(spark, sf_dir, "customer").count()
    assert counts["dim_producto"] == load_table(spark, sf_dir, "part").count()
    assert counts["dim_fuente"] == load_table(spark, sf_dir, "supplier").count()


def test_fact_is_union_of_sources(lake, spark, sf_dir):
    _, _, counts = lake
    expected = (
        load_table(spark, sf_dir, "orders").count()
        + load_table(spark, sf_dir, "events").count()
    )
    assert counts["fact_opinion"] == expected  # never-drop-rows policy


def test_fk_invariants(lake):
    sp, tmp, counts = lake
    fact = sp.read.parquet(os.path.join(tmp, "gold", "fact_opinion"))
    dimc = sp.read.parquet(os.path.join(tmp, "gold", "dim_cliente"))
    max_c = dimc.agg(F.max("IdCliente")).first()[0]
    bad = fact.filter((F.col("IdCliente") < 1) | (F.col("IdCliente") > max_c)).count()
    assert bad == 0  # modulo fold keeps every FK in range
    assert fact.filter(F.col("IdFecha") == -1).count() == 0  # all dates resolved


def test_partition_pruning_on_gold_fact(lake):
    """K4 analog: the year-partitioned layout must prune at scan time."""
    sp, tmp, _ = lake
    fact = sp.read.parquet(os.path.join(tmp, "gold", "fact_opinion"))
    years = [r["anio"] for r in fact.select("anio").distinct().collect()]
    one_year = fact.filter(F.col("anio") == years[0])
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    # a pruned scan reads fewer files than the full table
    assert one_year.count() < fact.count() or len(years) == 1


def test_pipeline_idempotent(lake, spark, sf_dir):
    """Re-running overwrites, never duplicates (fixes SURVEY §4.2.5)."""
    sp, tmp, counts = lake
    sources = {
        name: load_table(spark, sf_dir, name)
        for name in ("customer", "part", "supplier", "orders", "lineitem", "events")
    }
    counts2 = run_pipeline(
        spark,
        sources,
        staging_dir=os.path.join(tmp, "staging"),
        gold_dir=os.path.join(tmp, "gold"),
    )
    assert counts2 == counts


def test_write_observed_metrics_ride_the_write(spark, sf_dir, tmp_path):
    """Observed metrics equal a separate recount — but came from the
    write job itself (no extra scan)."""
    from pyspark.sql import functions as F

    from etl_extractor_spark.sinks.writers import write_observed
    from etl_extractor_spark.sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "obs")
    got = write_observed(
        orders,
        out,
        metrics={
            "n_open": F.count_if(F.col("o_orderstatus") == "O"),
            "max_price": F.max("o_totalprice"),
        },
    )
    assert got["rows"] == orders.count()
    assert got["n_open"] == orders.filter("o_orderstatus = 'O'").count()
    assert got["max_price"] == orders.agg(F.max("o_totalprice")).first()[0]
    assert spark.read.parquet(out).count() == got["rows"]
