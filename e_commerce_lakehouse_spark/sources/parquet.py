"""Parquet source/catalog helpers (reference S2/S3 analogs).

The reference reads bronze Parquet with `spark.read.parquet` and catalog
tables with `spark.table` (reference: silver_clean_transform.py:51-60,
gold_transfrom.py:54-56). Here both collapse onto local parquet dirs +
temp views; at cluster scale these paths become object-store URIs and
the same code runs unchanged (S3A committers + partition discovery are
session-level config, not operator logic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Column pruning + predicate pushdown reach
    the scan automatically because callers express plans declaratively.

    Engine-wide conventions applied here so every query sees the same
    calendar/timestamp semantics regardless of who built the session:
      - session timezone pinned to UTC (year()/month() over naive
        timestamps must not depend on host tz);
      - ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark can't
        read natively: read as nanos-long, keep full precision in
        ``ts_ns``, and expose ``ts`` truncated to microseconds (the same
        truncation DuckDB applies when it reads NANOS parquet).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return raw.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if isinstance(ts_type, TimestampNTZType):
            # Naive micros parquet (no isAdjustedToUTC): interpret the
            # wall-clock as UTC — the session tz is pinned UTC above, so
            # the NTZ→LTZ cast is deterministic and downstream queries
            # see the exact ts/ts_ns the NANOS and LTZ layouts produce.
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLE_NAMES
) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view so `spark.sql` serves
    the BI entry point (reference: Dremio SQL over gold tables)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
