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
      - ``events.ts`` arrives in one of two driver-generated layouts —
        TIMESTAMP(NANOS) parquet (read as nanos-long, Spark has no
        native NANOS type) or naive-micros TIMESTAMP_NTZ parquet — and
        BOTH are normalized to the same surface: UTC-interpreted LTZ
        ``ts`` (micros precision, the truncation DuckDB applies to
        NANOS) plus full-precision long ``ts_ns``. Never unix_micros a
        raw events scan; always come through here.
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    # every query funnels through here, so this is the choke point
    # where a driver-supplied plain session picks up AQE + a shuffle
    # width matched to its core count (no-ops on engine-built sessions)
    from ..session import tune_existing

    tune_existing(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return raw.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if isinstance(ts_type, TimestampNTZType):
            # Naive micros parquet (no isAdjustedToUTC): interpret the
            # wall-clock as UTC. That is only deterministic if the
            # session tz pin above actually took — fail loudly rather
            # than silently producing host-tz-shifted ts/ts_ns. The
            # cast target is an explicit TimestampType() so a session
            # that overrides spark.sql.timestampType to NTZ can't turn
            # the cast into a no-op.
            if spark.conf.get("spark.sql.session.timeZone") != "UTC":
                raise RuntimeError(
                    "events NTZ normalization requires session timeZone=UTC; "
                    "got %r — the NTZ->LTZ cast would be host-tz dependent"
                    % spark.conf.get("spark.sql.session.timeZone")
                )
            raw = raw.withColumn("ts", F.col("ts").cast(TimestampType()))
        return raw.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load every table through ``load_table`` so the ``events``
    normalization (UTC-pinned LTZ ``ts`` + long ``ts_ns``) is identical
    whether a consumer reaches the table as a DataFrame or as the
    ``events`` temp view registered by ``register_views``."""
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view so `spark.sql` serves
    the BI entry point (reference: Dremio SQL over gold tables)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
