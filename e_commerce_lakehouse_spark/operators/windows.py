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


def ewma_weights(
    alpha_num: int = 1, alpha_den: int = 4, k: int = 8
) -> tuple[list[int], list[int]]:
    """Integer weights of the k-term truncated EWMA with
    alpha = alpha_num/alpha_den: w_i = num·(den−num)^i·den^(k−1−i)
    (common denominator den^k), plus the partial sums W_j = Σ_{i<j} w_i
    used to renormalize when fewer than k history rows exist. One spec
    for both the Spark expression and the SQL oracle."""
    num, den = alpha_num, alpha_den
    w = [num * (den - num) ** i * den ** (k - 1 - i) for i in range(k)]
    partial = [sum(w[: j + 1]) for j in range(k)]
    return w, partial


def ewma(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    alpha_num: int = 1,
    alpha_den: int = 4,
    k: int = 8,
    out_col: str | None = None,
) -> DataFrame:
    """Exact-integer truncated exponentially-weighted moving average —
    the classic per-step recurrence s_t = α·x_t + (1−α)·s_{t−1} floors
    at every step, which no non-recursive SQL can reproduce, so the
    engine's spec is the k-term direct form instead:

        ewma_t = ( Σ_{i<min(t,k)} w_i · x_{t−i} ) div W_{min(t,k)}

    with the integer weights of :func:`ewma_weights` — exact, hash-
    stable, and UNBIASED at the series head (the divisor renormalizes
    over the weights actually available, rather than treating missing
    history as zero). ``value_col`` must be an exact integer measure
    (cents, counts). Output is integer, same units.

    Int64 headroom: |value|·den^k must fit — at den=4, k=8 that is
    |value| < 2^47, documented for cents-scale measures.

    Scale: one window on ``partition_cols`` with k lags — a single
    shuffle, codegen throughout. An empty partitioning is fine on
    POST-AGGREGATION rollups (q04's monthly frame); partition real
    per-entity series.
    """
    w, partial = ewma_weights(alpha_num, alpha_den, k)
    win = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    x = F.col(value_col)
    numer = None
    for i, wi in enumerate(w):
        term = F.coalesce(F.lag(x, i).over(win), F.lit(0)) * F.lit(wi)
        numer = term if numer is None else numer + term
    rn = F.row_number().over(win)
    denom = F.element_at(
        F.array(*[F.lit(p).cast("long") for p in partial]),
        F.least(rn, F.lit(k)).cast("int"),
    )
    out = out_col or f"ewma_{value_col}"
    return (
        df.withColumn("_ewma_n", numer.cast("long"))
        .withColumn("_ewma_d", denom.cast("long"))
        .withColumn(out, F.expr("_ewma_n div _ewma_d"))
        .drop("_ewma_n", "_ewma_d")
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    width: str = "1 hour",
) -> DataFrame:
    """Time-series downsampling to OHLC bars (open/high/low/close per
    key per fixed bucket) — the timescale-style resample a metrics or
    pricing pipeline runs constantly.

    Open/close are picked by lexicographic struct min/max over
    (ts, tiebreak, value) — an ASSOCIATIVE aggregate, so the whole
    operator is ONE groupBy with full map-side partial aggregation: at
    100 TB each bucket combines locally per partition and only the
    per-(key, bucket) partials shuffle, vs. the row_number-window
    formulation that sorts every row. ``tiebreak_col`` must be unique
    within (key, bucket) for deterministic open/close under equal
    timestamps.
    """
    w = F.window(F.col(ts_col), width).getField("start").alias("window_start")
    first = F.min(
        F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(value_col))
    ).getField(value_col)
    last = F.max(
        F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(value_col))
    ).getField(value_col)
    return df.groupBy(w, *[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("n_events"),
        first.alias("open_v"),
        F.max(value_col).alias("high_v"),
        F.min(value_col).alias("low_v"),
        last.alias("close_v"),
    )


def gap_fill_locf(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    fill_cols: Sequence[str],
    zero_cols: Sequence[str] = (),
    step: str = "15 minutes",
) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (timescale ``time_bucket_gapfill`` + ``locf``): materialize every
    ``step`` bucket between each key's first and last observed bucket,
    carry ``fill_cols`` forward across the generated gaps, zero-fill
    ``zero_cols`` (counts). Input must already be bucketed — one row
    per (key, bucket), e.g. :func:`ohlc_resample` output.

    Plan: per-key min/max (one tiny agg), calendar via
    ``sequence``+``explode`` (map-side, no UDF), one left join back on
    (key, bucket), and one per-key ordered window for the LOCF. At
    100 TB the window partitions by key and the calendar is
    span/step rows per key — bounded by time, not data. Leading gaps
    (before a key's first observation) cannot exist by construction,
    so LOCF is total.
    """
    cal = (
        df.groupBy(*key_cols)
        .agg(F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("_mn", "_mx", F.expr(f"INTERVAL {step}"))
            ).alias(ts_col),
        )
    )
    full = cal.join(df, [*key_cols, ts_col], "left")
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.col(fill_cols[0]).isNull() if fill_cols else F.lit(False)
    out = full.withColumn("_filled", gap)
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams — the flow/Sankey input of product analytics and the
    next-event baseline model: for every (from_type, to_type) adjacent
    pair in a user's timeline, the count and the exact row probability
    ``prob_x1e6 = 1e6 * c(from,to) div c(from,*)``.

    One shuffle on the user for the lead() timeline (ties broken by
    ``tiebreak_col`` so equal timestamps are deterministic), one
    partial-aggregated groupBy on the (from, to) pair, and the
    normalizing window runs on the TINY |types|² counts frame — never
    on rows. Integer division keeps the probabilities hash-stable.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    return pairs.withColumn(
        "prob_x1e6",
        F.expr(
            "(n_transitions * CAST(1000000 AS BIGINT)) div "
            "sum(n_transitions) OVER (PARTITION BY from_type)"
        ),
    )


def touch_attribution(
    events: DataFrame,
    touch_types: tuple = ("click", "view"),
    lookback_hours: int = 2,
) -> DataFrame:
    """Marketing attribution per purchase: the FIRST-touch and
    LAST-touch item among the same user's click/view events in the
    ``lookback_hours`` window strictly before each purchase, plus the
    touch count — the two canonical single-touch attribution models
    over one candidate join.

    Plan: user-equality join with a time-range residual (the same SMJ
    shape as the clicks-before-purchase pair query — user_id bounds
    the match set, so no interval binning needed), then ONE partial-agg
    groupBy taking min/max over (ts, event_id, item) structs —
    event_id makes the order total, so first/last are deterministic in
    any engine. Purchases with no touches keep NULL items and
    n_touches = 0 (a left join, not a drop)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touches = events.filter(
        F.col("event_type").isin(*touch_types)
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    j = purchases.join(
        touches,
        (purchases.user_id == touches.t_user)
        & (touches.t_ts < purchases.p_ts)
        & (
            touches.t_ts
            >= purchases.p_ts - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        ),
        "left",
    )
    touch = F.struct("t_ts", "t_id", "item")
    return j.groupBy("purchase_id", "user_id", "p_ts").agg(
        F.min(touch).getField("item").alias("first_item"),
        F.max(touch).getField("item").alias("last_item"),
        F.count("t_id").alias("n_touches"),
    )
