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


def zorder_key(cols: Sequence[str], bits: int = 21):
    """Z-order (Morton) key over up to 3 ALREADY-NORMALIZED integer
    rank columns in [0, 2^bits): bit-interleaves the columns so that
    sorting by the key clusters rows that are close in EVERY dimension
    — the multi-dimensional generalization of `clustered_write`'s
    single-column range sort. Pure Column expression (shift/mask/or
    chain, whole-stage codegen — no UDF); 3 × 21 bits fills the int64
    sign-free range.

    Column i's bit b lands at output position b·n_cols + i, the
    standard Morton layout. Use :func:`zorder_write` for end-to-end
    normalization + layout; this is the raw key for callers that
    already hold bounded ranks."""
    from pyspark.sql import functions as F

    n = len(cols)
    if not 2 <= n <= 3:
        raise ValueError("zorder_key interleaves 2 or 3 columns")
    if bits * n > 63:
        raise ValueError(f"{n} x {bits} bits exceeds int64")
    terms = " + ".join(
        f"(shiftleft(shiftright(CAST({c} AS BIGINT), {b}) & 1, {b * n + i}))"
        for i, c in enumerate(cols)
        for b in range(bits)
    )
    return F.expr(terms)


def zorder_layout(
    df: DataFrame,
    cluster_cols: Sequence[str],
    num_files: int = 8,
    bits: int = 21,
) -> DataFrame:
    """Z-ORDER clustered write (the Delta/Iceberg `OPTIMIZE ZORDER BY`
    capability): normalize each clustering column to a [0, 2^bits)
    rank by min/max (one tiny stats aggregate, broadcast back —
    exact, no sampling), bit-interleave into a Morton key, then
    range-partition + sort by the key. Every output file then covers
    a small HYPER-RECTANGLE of the clustering space instead of a thin
    slab of the first column — min/max footer stats prune files for
    predicates on ANY clustered column, which a lexicographic sort
    only delivers for its leading column.

    Scale: the stats pass is a count-free min/max agg (partial,
    broadcast back as one row); the layout pass is the same
    repartitionByRange + local sort as `clustered_write` — one
    shuffle, no skew (Morton keys of real data spread uniformly at
    this bit depth). INTEGRAL columns only (validated against the
    schema — the min/max normalization is affine, so ordering within
    each dimension is preserved exactly); a value span too wide for
    the affine multiply's int64 headroom fails LOUDLY in-plan
    (raise_error) instead of committing a wrapped, useless layout.
    One clustering column degenerates to the plain range-clustered
    layout (no interleaving needed — same as `clustered_write`)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if not 1 <= len(cluster_cols) <= 3:
        raise ValueError(
            f"zorder_layout clusters 1-3 columns, got {len(cluster_cols)}"
        )
    for c in cluster_cols:
        field = df.schema[c]
        if not isinstance(field.dataType, (ByteType, ShortType, IntegerType, LongType)):
            raise ValueError(
                f"zorder_layout needs integral clustering columns; "
                f"{c!r} is {field.dataType.simpleString()} — map it to an "
                "integral surrogate (epoch units, dictionary code) first"
            )
    stats = df.agg(
        *[
            m(F.col(c)).cast("long").alias(f"__{nm}_{c}")
            for c in cluster_cols
            for nm, m in (("min", F.min), ("max", F.max))
        ]
    )
    ranked = df.crossJoin(F.broadcast(stats))
    rank_cols = []
    # headroom: span * (2^bits - 1) must fit int64 — enforced in-plan
    # so a too-wide key raises instead of wrapping into garbage ranks
    max_span = ((1 << 63) - 1) // ((1 << bits) - 1)
    for c in cluster_cols:
        # exact integer affine map onto [0, 2^bits - 1] (integer div,
        # not double — a double round-off could misplace boundary
        # ranks)
        rank_cols.append(
            F.expr(
                f"CASE WHEN __max_{c} - __min_{c} > {max_span} THEN "
                f"CAST(raise_error('zorder_layout: span of {c} exceeds "
                f"int64 headroom at bits={bits}; reduce bits') "
                f"AS BIGINT) ELSE "
                f"((CAST({c} AS BIGINT) - __min_{c}) * {(1 << bits) - 1}) div "
                f"greatest(__max_{c} - __min_{c}, 1) END"
            ).alias(f"__z_{c}")
        )
    ranked = ranked.select(*df.columns, *rank_cols)
    zkey = (
        F.col(f"__z_{cluster_cols[0]}")
        if len(cluster_cols) == 1
        else zorder_key([f"__z_{c}" for c in cluster_cols], bits=bits)
    )
    keyed = ranked.withColumn("__zkey", zkey)
    return (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__z_{c}" for c in cluster_cols])
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int = 8,
    bits: int = 21,
) -> None:
    """:func:`zorder_layout` + parquet write — see that docstring.
    The layout (range partitioning + in-partition sort) survives the
    write verbatim: each partition becomes one file whose footer
    min/max bound a Morton hyper-rectangle."""
    zorder_layout(df, cluster_cols, num_files=num_files, bits=bits).write.mode(
        "overwrite"
    ).parquet(path)
