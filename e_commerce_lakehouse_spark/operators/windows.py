"""Window / top-k / share-of-total operators (SURVEY §2.5).

The reference's top-k surface lives in its Superset dashboard (top-20
products, %-of-total category pie, monthly trends) and in the Redis
recency cap (reference: yearly-dashboard jpg; streaming_flow.py:109-111).
Re-expressed as native window functions.

Scale notes: global top-k (`orderBy().limit(k)`) is executed by Spark as
per-partition TopK + single-reduce merge (TakeOrderedAndProject) — no
global sort materialization, safe at any scale. Per-group top-k windows
shuffle once on the partition key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global deterministic top-k (dashboard W1 'Top 20 products').
    Callers must include a unique tiebreak column in ``order_cols`` so
    the selected set is stable. Physical plan: TakeOrderedAndProject."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[Column], k: int
) -> DataFrame:
    """Per-group top-k via row_number (SURVEY W1 per-group variant, W6
    recency cap). One shuffle on the group key."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def share_of_total(df: DataFrame, value_col: str, out_col: str = "share") -> DataFrame:
    """%-of-grand-total (dashboard W3 'Category Performance' pie).

    ``value_col`` should be an exact (integer) measure — e.g. cents —
    so the window total is order-independent and the share division is
    bit-identical across engines.

    Implemented as an empty-frame window sum. At 100 TB the partition-by-()
    window funnels through one task — fine here because it runs on the
    already-aggregated (small) rollup, never the raw fact. For raw facts,
    aggregate first, then share.
    """
    total = F.sum(value_col).over(Window.partitionBy())
    return df.withColumn(
        out_col, F.col(value_col).cast("double") / total.cast("double")
    )


def month_over_month(
    df: DataFrame, value_col: str, order_cols: Sequence[str], partition_cols: Sequence[str] = ()
) -> DataFrame:
    """lag-based month-over-month delta (dashboard W2 trend support)."""
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn("prev_" + value_col, prev).withColumn(
        "delta_" + value_col, F.col(value_col) - prev
    )
