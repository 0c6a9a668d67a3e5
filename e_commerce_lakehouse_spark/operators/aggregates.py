"""Aggregation operators (SURVEY §2.4).

Gold-layer summaries re-expressed on the testdata star schema. The
reference computes `sales_summary` / `review_summary` with
groupBy + sum/count/avg after a dim left-join (reference:
scripts/spark_jobs/gold_transfrom.py:59-94).

Scale notes: every grouped agg here is a Catalyst HashAggregate with
map-side partial aggregation — the shuffle carries one row per
(group, partition), not per input row, so these hold at 100 TB as long
as group cardinality is bounded (year×month×part is). Money is
aggregated as exact integer cents (see functions.money) so results are
shuffle-order-independent and engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.money import cents, money_from_cents, revenue_cents


def revenue():
    """Net-revenue double expression (extendedprice net of discount).
    Use :func:`revenue_cents` when the value feeds an aggregation."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def sales_summary(lineitem: DataFrame, orders: DataFrame, part: DataFrame) -> DataFrame:
    """Per year/month/product sales rollup (gold `sales_summary` analog;
    reference gold_transfrom.py:59-75).

    Join strategy: lineitem⋈orders is the big shuffle join on l_orderkey
    (AQE handles skew). Aggregation runs on (year, month, product_id)
    BEFORE the dimension join — group keys stay fixed-width ints through
    the agg shuffle, and part's name/brand (product_id → name, brand is
    a functional dependency, so grouping by the id alone is equivalent)
    are broadcast-attached to the far smaller aggregate.
    """
    aggd = (
        lineitem.join(orders.select("o_orderkey", "o_orderdate"), lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.col("l_partkey").alias("product_id"),
            F.col("l_quantity"),
            revenue_cents().alias("rev_cents"),
        )
        .groupBy("year", "month", "product_id")
        .agg(
            F.sum("l_quantity").alias("total_quantity"),
            F.sum("rev_cents").alias("cents"),
            F.count(F.lit(1)).alias("num_purchases"),
        )
    )
    return (
        aggd.join(
            F.broadcast(part.select("p_partkey", "p_name", "p_brand")),
            aggd.product_id == F.col("p_partkey"),
        )
        .select(
            "year",
            "month",
            "product_id",
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("brand"),
            "total_quantity",
            money_from_cents("cents").alias("total_sales"),
            "num_purchases",
        )
    )


def review_summary(events: DataFrame) -> DataFrame:
    """Per year/month/event_type activity rollup (gold `review_summary`
    analog; reference gold_transfrom.py:79-94): count + exact avg(value)."""
    return (
        events.select(
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            "event_type",
            cents("value").alias("v_cents"),
        )
        .groupBy("year", "month", "event_type")
        .agg(
            F.count(F.lit(1)).alias("num_events"),
            F.sum("v_cents").alias("v_sum"),
        )
        .select(
            "year",
            "month",
            "event_type",
            "num_events",
            ((F.col("v_sum").cast("double") / F.col("num_events")) / F.lit(100.0)).alias(
                "avg_value"
            ),
        )
    )


def monthly_sales(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Monthly total-sales time series (dashboard W2;
    reference yearly-dashboard jpg "Total Sales by Month")."""
    return (
        lineitem.join(orders.select("o_orderkey", "o_orderdate"), lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            revenue_cents().alias("rev_cents"),
        )
        .groupBy("year", "month")
        .agg(
            F.sum("rev_cents").alias("cents"),
            F.count(F.lit(1)).alias("num_items"),
        )
        .select(
            "year",
            "month",
            money_from_cents("cents").alias("total_sales"),
            "num_items",
        )
    )


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Exact + grouped distinct counts (engine surface beyond reference;
    SURVEY §2.4 'expose anyway')."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count(F.lit(1)).alias("num_rows"),
    )


def rollup_sales(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """ROLLUP (year, month) subtotal hierarchy — %-of-total dashboard
    support (SURVEY §2.4/W3). grouping_id distinguishes subtotal levels."""
    base = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"), lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.year("o_orderdate").alias("year"),
        F.month("o_orderdate").alias("month"),
        revenue_cents().alias("rev_cents"),
    )
    return (
        base.rollup("year", "month")
        .agg(
            F.sum("rev_cents").alias("cents"),
            F.grouping_id().alias("grouping_level"),
        )
        .select(
            "year",
            "month",
            money_from_cents("cents").alias("total_sales"),
            "grouping_level",
        )
    )


def watermark_max(df: DataFrame, time_col: str):
    """Global scalar max — the incremental-load high-watermark
    (reference bronze_batch_load.py:66,112). One Spark job, one row."""
    return df.agg(F.max(time_col)).first()[0]


def retention_cohorts(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    grouped by the week of their FIRST event (cohort), counted in
    every later week they were active, keyed by whole-week offset.

    Two shuffles on user_id (first-event min, then distinct
    user-weeks) and one on the tiny cohort key; no window. Weeks are
    Monday-anchored ``date_trunc`` so the bucket is engine-portable;
    the cohort is emitted as days-since-epoch (BIGINT) for exact
    cross-engine comparison.
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    active = (
        events.select(
            user_col, F.date_trunc("week", F.col(ts_col)).alias("_wk")
        ).distinct()
    )
    j = active.join(first, user_col).select(
        F.datediff(
            F.to_date(F.date_trunc("week", F.col("_first_ts"))),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("long")
        .alias("cohort_day"),
        (
            F.datediff(
                F.to_date(F.col("_wk")),
                F.to_date(F.date_trunc("week", F.col("_first_ts"))),
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
    )
    return j.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def merge_partial_aggregates(
    target: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental view maintenance for DISTRIBUTIVE aggregates: fold a
    delta's per-key partials into an existing aggregate table without
    rescanning the base — agg(base ∪ delta) == merge(agg(base),
    agg(delta)) for sums/counts (sum_cols), mins and maxes. This is
    the batch analog of a streaming aggregation's state update, and
    the maintenance step of a materialized view: at 100 TB the nightly
    refresh costs O(delta), never O(base).

    NOT valid for non-distributive measures (avg must be maintained as
    sum+count and divided at read; distinct counts need the HLL
    register merge in operators/sketches.py). One null-safe full-outer
    join on the key — the merged key space — with measure-wise
    coalesced combination.
    """
    import functools as _ft
    import operator as _op

    measures = [*sum_cols, *min_cols, *max_cols]
    for frame, name in ((target, "target"), (delta, "delta")):
        missing = [c for c in [*keys, *measures] if c not in frame.columns]
        if missing:
            raise ValueError(f"{name} missing columns {missing}")
    t = target.select(
        *[F.col(k).alias(f"_t_{k}") for k in keys],
        *[F.col(c).alias(f"_t_{c}") for c in measures],
    )
    d = delta.select(
        *[F.col(k).alias(f"_d_{k}") for k in keys],
        *[F.col(c).alias(f"_d_{c}") for c in measures],
    )
    cond = _ft.reduce(
        _op.and_,
        [F.col(f"_t_{k}").eqNullSafe(F.col(f"_d_{k}")) for k in keys],
    )
    j = t.join(d, cond, "full_outer")

    def combine(c: str, how: str) -> Column:
        a, b = F.col(f"_t_{c}"), F.col(f"_d_{c}")
        if how == "sum":
            merged = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif how == "min":
            merged = F.least(a, b)  # least/greatest skip NULLs
        else:
            merged = F.greatest(a, b)
        # a key present on one side only keeps its own value/type
        return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(merged)

    return j.select(
        *[
            F.coalesce(F.col(f"_t_{k}"), F.col(f"_d_{k}")).alias(k)
            for k in keys
        ],
        *[combine(c, "sum").alias(c) for c in sum_cols],
        *[combine(c, "min").alias(c) for c in min_cols],
        *[combine(c, "max").alias(c) for c in max_cols],
    )
