"""Distributed recommendation rerank (reference W4, re-expressed).

The reference collects every micro-batch to the driver and loops rows
against Redis (streaming_flow.py:68-84,116-167) — its main scalability
flaw. Here the same semantics run distributed:

    boost order: add_to_cart > page_view > offline recs
    dedupe keeping first occurrence, cap at 10

as pure array ops (collect_list over per-user windows → concat →
array_distinct → slice), which keeps first-occurrence order exactly
like the reference's ordered-set loop.

Scale: one shuffle on user_id; recency lists capped at 50 per user
(reference Redis LTRIM) before the merge, so state per key is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RECENCY_CAP = 50  # reference streaming_flow.py:109-111 (LTRIM 0..49)
TOP_K = 10  # reference streaming_flow.py:84


def recent_products(
    events: DataFrame, ts_col: str = "ts", cap: int = RECENCY_CAP
) -> DataFrame:
    """Per-user most-recent product list (newest first), capped —
    the Redis recency-list equivalent (K5). Deterministic: ordered by
    (ts desc, event_id desc)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col(ts_col).desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__rn", "product_id")), asc=True
            ).alias("__pairs")
        )
        .select(
            "user_id",
            F.transform("__pairs", lambda p: p.product_id).alias("products"),
        )
    )


def rerank_topk(
    views: DataFrame,
    cart: DataFrame,
    offline: DataFrame,
    k: int = TOP_K,
) -> DataFrame:
    """Ordered boost-merge (reference rerank_simple, streaming_flow.py:68-84):
    cart items first, then views, then offline recs; first-occurrence
    dedup; cap k. Inputs: per-user `products` arrays (from
    :func:`recent_products`) and offline recs `recs` array."""
    merged = (
        cart.select("user_id", F.col("products").alias("cart"))
        .join(views.select("user_id", F.col("products").alias("views")), "user_id", "full")
        .join(offline.select("user_id", F.col("recs").alias("offline")), "user_id", "full")
        .select(
            "user_id",
            F.coalesce("cart", F.array()).alias("cart"),
            F.coalesce("views", F.array()).alias("views"),
            F.coalesce("offline", F.array()).alias("offline"),
        )
    )
    return merged.select(
        "user_id",
        F.slice(
            F.array_distinct(F.concat("cart", "views", "offline")), 1, k
        ).alias("recommendations"),
    )
