"""As-of (backward) join — a custom operator Spark lacks natively
(SURVEY: reference has no as-of/range joins; engines like kdb/QuestDB
make it a primitive; DuckDB ships ASOF JOIN, which is the oracle).

For each left row, attach the single most recent right row of the same
key with right_ts <= left_ts (NULL when none).

Implementation (the scale formulation): tag and union both sides,
ONE shuffle on the key, sort by (ts, tag) inside the window with right
rows before left rows at equal ts, and carry the latest right payload
forward with last_value(ignoreNulls). No join explosion, no per-key
driver logic; state is one struct per window frame. A sort-merge
inequality join would re-scan right rows per left row; this is linear
in rows after the shuffle.

Determinism: callers must pre-dedup the right side to one row per
(key, ts) — e.g. cleaning.dedup_latest — otherwise "the" most recent
row is ambiguous.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row
    with ``right[right_ts] <= left[left_ts]`` on the same ``key``.
    Both ts columns must be union-compatible (cast upstream)."""
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__right"),
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = r_tag.withColumn("__left", F.lit(None).cast(l_tag.schema["__left"].dataType)).unionByName(
        l_tag.withColumn("__right", F.lit(None).cast(r_tag.schema["__right"].dataType))
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__right_asof", F.last("__right", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__right_asof.{c}").alias(c) for c in right_payload],
    )
    return out
