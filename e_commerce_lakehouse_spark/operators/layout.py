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


def _compaction_frame(df: DataFrame, target_files: int) -> DataFrame:
    """The compaction rewrite plan: full-width scan → round-robin
    shuffle → ``target_files`` write tasks. Factored out so the layout
    test can assert the plan shape (shuffle present, scan width not
    capped) — the property that distinguishes it from ``coalesce``."""
    return df.repartition(target_files)


def compact_parquet(
    spark: SparkSession, path: str, target_files: int, out_path: str | None = None
) -> int:
    """Rewrite ``path`` into ``target_files`` files; returns the new
    file count.

    ``repartition`` (round-robin shuffle), NOT ``coalesce``: coalesce
    caps the whole job's parallelism at ``target_files``, so compacting
    a 10k-file directory into 32 files would READ on 32 tasks — the
    shuffle buys a full-width scan and the write side alone narrows to
    ``target_files``. (The shuffled bytes are the data being rewritten
    anyway; compaction is inherently a full rewrite.)

    The in-place swap (``out_path=None``) uses driver-side
    ``shutil``/``os.rename`` — LOCAL-FILESYSTEM ONLY, and not atomic
    for concurrent readers. On an object store / HDFS at scale, pass
    ``out_path`` and flip the table location in the catalog instead
    (the pointer-swap pattern ``sources/snapshots.py`` implements)."""
    import os
    import shutil

    dest = out_path or (path.rstrip("/") + "__compact_tmp")
    _compaction_frame(spark.read.parquet(path), target_files).write.mode(
        "overwrite"
    ).parquet(dest)
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
