"""Merge/upsert (Delta MERGE INTO semantics on plain parquet).

The reference is append-only (SURVEY §2.9: never updates rows); a real
lakehouse needs upsert. Without the Delta runtime in this container,
MERGE is expressed relationally — a full-outer join where the source
wins on conflict — plus an overwrite-writer for the table flow.

Scale notes: one shuffle on the merge key (or zero if both sides are
bucketed on it). For partitioned targets, dynamic partition overwrite
limits the rewrite to touched partitions — on Delta this same operator
maps 1:1 onto MERGE INTO with file-level pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """WHEN MATCHED THEN UPDATE (source wins) / WHEN NOT MATCHED THEN
    INSERT. Columns = target's columns; source must carry them all."""
    cols = target.columns
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    joined = t.join(s, cond, "full_outer")
    picked = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in cols
    ]
    return joined.select(*picked)


def merge_into_parquet(
    spark: SparkSession, source: DataFrame, path: str, keys: Sequence[str]
) -> int:
    """Table-level upsert: read target, merge, overwrite. Returns the
    post-merge row count. (On Delta: target.merge(source, cond)
    .whenMatchedUpdateAll().whenNotMatchedInsertAll() — same semantics.)"""
    import os
    import shutil

    if os.path.isdir(path):
        target = spark.read.parquet(path)
        merged = merge_upsert(target, source.select(*target.columns), keys)
        # write-aside then swap: never collect to the driver, never
        # overwrite files still being read (same discipline as Delta's
        # transactional swap, minus the log)
        tmp = path.rstrip("/") + "__merge_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)
    else:
        source.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()
