"""High-watermark incremental load (SURVEY §2.9 — the reference's
CDC-lite compound operator, bronze_batch_load.py:55-141).

Policy, matching the reference exactly:
  - target missing → full load (append all rows);
  - target exists  → read max(time_col) from target, append only
    source rows strictly newer (bronze_batch_load.py:66-67,111-113);
  - dependent-child variant: child rows are kept iff their parent key
    is in the parent's new slice (the orders→order_items semi-join,
    bronze_batch_load.py:83-87).

Scale notes: the watermark probe is a one-row agg over the target's
time column only (column-pruned scan; on a date-partitioned target it
prunes to the latest partitions). The append itself is partitioned by
event-time y/m/d so downstream readers get partition pruning — same
layout the reference writes (bronze_batch_load.py:78-81,91-92).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def target_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe (reference utils.py:118-126 checks MinIO object
    lists; locally a directory probe + readability check)."""
    if not os.path.isdir(path):
        return False
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def high_watermark(spark: SparkSession, path: str, time_col: str):
    """max(time_col) already loaded (reference bronze_batch_load.py:66,112)."""
    return spark.read.parquet(path).agg(F.max(time_col)).first()[0]


def with_date_partitions(df: DataFrame, time_col: str) -> DataFrame:
    """Derive y/m/d partition keys from EVENT time (the reference falls
    back to current_date for some tables — bronze_batch_load.py:87-89 —
    a processing-time leak we avoid)."""
    return (
        df.withColumn("year", F.year(time_col))
        .withColumn("month", F.month(time_col))
        .withColumn("day", F.dayofmonth(time_col))
    )


def incremental_append(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    time_col: str,
    partition_by_date: bool = True,
) -> int:
    """Append source rows newer than the target's watermark; full load
    when the target doesn't exist. Returns rows appended. Idempotent:
    re-running with an unchanged source appends nothing AND writes
    nothing — an hourly run against an idle source must not accumulate
    empty part files on the target.

    Two actions worst case, down from three full scans: isEmpty() is
    the cheap no-op short-circuit (early-exits at the first row — a
    LIMIT 1 pushdown on a JDBC source — and is only a full scan in the
    genuinely-idle case, where no write follows), then the row count
    rides the write itself as an ``observe`` metric instead of a
    separate count() scan."""
    if target_exists(spark, path):
        wm = high_watermark(spark, path, time_col)
        new_rows = source.filter(F.col(time_col) > F.lit(wm)) if wm is not None else source
    else:
        new_rows = source
    if partition_by_date:
        new_rows = with_date_partitions(new_rows, time_col)
    if new_rows.isEmpty():
        return 0
    obs = Observation()
    new_rows = new_rows.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = new_rows.write.mode("append")
    if partition_by_date:
        writer = writer.partitionBy("year", "month", "day")
    writer.parquet(path)
    return int(obs.get["n"])


def incremental_append_dependent(
    spark: SparkSession,
    parent: DataFrame,
    child: DataFrame,
    parent_path: str,
    child_path: str,
    parent_time_col: str,
    join_key: str,
) -> tuple[int, int]:
    """Orders + order_items style pair load (reference
    bronze_batch_load.py:55-98): incremental on the parent's time
    column; the child (which has no time column) follows via left-semi
    join on the parent's NEW keys — idiomatic fix of the reference's
    inner-join-on-projected-keys (J3)."""
    if target_exists(spark, parent_path):
        wm = high_watermark(spark, parent_path, parent_time_col)
        new_parent = (
            parent.filter(F.col(parent_time_col) > F.lit(wm)) if wm is not None else parent
        )
    else:
        new_parent = parent
    new_child = child.join(new_parent.select(join_key), join_key, "left_semi")

    n_parent = incremental_append(
        spark, new_parent, parent_path, parent_time_col, partition_by_date=True
    )
    if new_child.isEmpty():
        return n_parent, 0
    obs = Observation()
    new_child = new_child.observe(obs, F.count(F.lit(1)).alias("n"))
    new_child.write.mode("append").parquet(child_path)
    return n_parent, int(obs.get["n"])
