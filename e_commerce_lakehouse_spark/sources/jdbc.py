"""JDBC source (reference S1 — bronze_batch_load.py:38-53).

Thin, explicit wrapper over the built-in JDBC reader. Untested in this
container (no database service); the medallion pipeline swaps CSV for
this adapter in production — the downstream operators are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC scan. The reference reads single-threaded
    (bronze_batch_load.py:45-52); at scale always pass
    ``partition_column`` + bounds so the scan fans out across executors
    and predicate pushdown (Catalyst JDBC pushdown) still applies."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("pushDownPredicate", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    return reader.load()
