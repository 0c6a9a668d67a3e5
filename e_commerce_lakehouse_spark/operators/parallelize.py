"""Input-parallelism helper for CPU-heavy per-row operators.

Spark sizes scan splits by bytes (``spark.sql.files.maxPartitionBytes``),
which is right for I/O-bound plans but wrong for compute-bound ones: a
small file packs into ONE split, serializing an expensive Arrow kernel
or per-pair verify onto one core. ``spread_for_cpu`` round-robins such
inputs up to the session's default parallelism — and is a structural
no-op at 100 TB, where the scan already yields thousands of splits.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame, cap: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism IF
    the scan is under-parallel. Split count is estimated from file
    metadata (local files) — no job, no RDD conversion; non-local URIs
    fall back to the physical-plan partition count.

    ``cap`` bounds the inflation target (never the natural split count):
    iterative algorithms that re-reference a SMALL input across many
    stages pay per-task scheduling each round, so a caller that knows
    its stage structure can cap fan-out. At scale the scan is already
    parallel and both the spread and the cap are structural no-ops."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if cap is not None:
        target = min(target, cap)
    try:
        files = df.inputFiles()
        max_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
        )
        total = sum(
            os.path.getsize(urlparse(f).path) for f in files if f.startswith("file:")
        )
        est_splits = max(len(files), -(-total // max_bytes))
    except Exception:
        # exception path ONLY (non-local URIs / missing files): df.rdd
        # here is a metadata peek at the physical plan's partitioning,
        # never an action — it must stay the one place this module
        # touches the RDD API.
        est_splits = df.rdd.getNumPartitions()
    if est_splits < target:
        return df.repartition(target)
    return df


def _persistent_rdd_ids(spark) -> set[int]:
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def local_checkpoint_tracked(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, set[int]]:
    """``df.localCheckpoint()`` plus the ids of the RDD blocks the
    checkpoint pinned, so iterative algorithms can release superseded
    rounds with :func:`release_rdds`. Spark's ContextCleaner only frees
    checkpoint blocks after BOTH the Python wrapper and the py4j proxy
    are garbage-collected — far too late for a loop that pins a fresh
    copy of its state every round (N rounds would hold N copies of the
    state in executor storage memory, evicting genuinely hot blocks at
    scale). Assumes a single driver thread persists RDDs (true for this
    engine's operators).

    ``eager=False`` marks the checkpoint but defers materialization to
    the caller's next action — use when that action is immediate (e.g.
    a convergence-witness aggregate), folding checkpoint-write and
    witness into ONE job instead of two. The persist registration (and
    therefore id tracking) happens at call time either way. Only safe
    when the frame is consumed by an action before any multi-reference
    plan — a lazy checkpoint referenced twice inside its materializing
    job may compute partitions twice."""
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=eager)
    return out, _persistent_rdd_ids(spark) - before


def release_rdds(spark, ids: set[int]) -> None:
    """Unpersist the given checkpoint block ids (non-blocking). Only
    ever call this on SUPERSEDED state: a localCheckpoint's blocks ARE
    its data — releasing blocks a live DataFrame still reads fails its
    next action."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
