"""Data-layout management: file compaction and clustered writes.

At 100 TB the dominant read cost is file-count overhead + non-pruned
scans. Two levers, both plain DataFrame ops:

- `compact_parquet`: rewrite a directory into N right-sized files
  (small-file compaction after streaming appends).
- `clustered_write`: repartitionByRange + sortWithinPartitions on the
  filter columns — each parquet file covers a narrow range, so min/max
  row-group stats prune most files at read time (poor-man's Z-order;
  for one clustering dimension this IS optimal).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession, path: str, target_files: int, out_path: str | None = None
) -> int:
    """Rewrite ``path`` into ``target_files`` files; returns the new
    file count. In-place via write-aside + swap when out_path is None."""
    import os
    import shutil

    df = spark.read.parquet(path)
    dest = out_path or (path.rstrip("/") + "__compact_tmp")
    df.coalesce(target_files).write.mode("overwrite").parquet(dest)
    if out_path is None:
        shutil.rmtree(path)
        os.rename(dest, path)
        dest = path
    return len([f for f in os.listdir(dest) if f.endswith(".parquet")])


def clustered_write(
    df: DataFrame, path: str, cluster_cols: Sequence[str], num_files: int = 8
) -> None:
    """Range-partition + sort by the clustering columns, then write:
    row-group min/max stats become selective for filters on those
    columns (verified by `tests/test_layout.py` footer inspection)."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
