"""JDBC source (S2) — projection-pushing relational reads.

The reference reads its DB source with a column-projecting SELECT
(reference extract/db_extractor.py:6-14, query at main.py:35-38).
Spark's JDBC source pushes the projection and any filters into the
remote database; for large tables the scale path is partitioned reads
(``partitionColumn``/``numPartitions``) so 1000 executors each pull a
key-range slice instead of one serial cursor.

Executed end-to-end against Apache Derby's embedded driver (ships on
Spark's default classpath for the Hive metastore), which gives a real
``format("jdbc")`` read AND bulk-append write path in tests
(tests/test_jdbc.py) — same wire semantics as the reference's SQL
Server legs (extract/db_extractor.py:6-14, core/dw_repository.py:8-23),
minus only the vendor driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    query: str | None = None,
    table: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    if (query is None) == (table is None):
        raise ValueError("exactly one of query/table is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if query is not None:
        opts["query"] = query
    else:
        opts["dbtable"] = table  # type: ignore[assignment]
    if partition_column is not None:
        if table is None:
            raise ValueError("partitioned reads require table, not query")
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError("partitioned reads need numPartitions and bounds")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    opts = jdbc_read_options(**kwargs)
    return spark.read.format("jdbc").options(**opts).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """K3 bulk insert: executor-parallel batched INSERTs — each
    partition opens one connection and writes ``batchsize`` rows per
    round trip (the Spark analog of the reference's pandas
    ``to_sql(method="multi", chunksize=500)``,
    core/dw_repository.py:8-23). ``mode="overwrite"`` is the K1
    truncate+load leg."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    w = w.option("batchsize", str(batchsize))
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()
