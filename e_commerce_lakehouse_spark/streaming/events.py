"""Event-stream transformations (SURVEY §2.7 + gap-closers).

The reference parses Kafka JSON with a per-type schema, derives
*processing-time* partition columns, and never uses watermarks or
event-time windows (reference: streaming_flow.py:42-65,190-197). This
module keeps the parse shape but fixes the gaps: event time is parsed
to TimestampType and all windowing is event-time with watermarks.

Every transformation here is a pure DataFrame function usable on BOTH
a batch DataFrame and a streaming DataFrame (tests run them both ways;
the driver's oracle checks the batch semantics).

Scale notes: windowed aggs shuffle on (window, key) — state store size
is bounded by watermark horizon × key cardinality. Session windows use
Spark's native session_window (state merges adjacent sessions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import STREAM_EVENT_SCHEMAS


def parse_raw_events(raw: DataFrame, event_type: str) -> DataFrame:
    """Kafka-style bytes → typed events (reference streaming_flow.py:190-197,
    T2): cast value to string, from_json with the per-type schema,
    flatten, parse event time (the reference leaves it a string — gap
    fixed here), derive event-time partition keys (not processing-time).
    """
    schema = STREAM_EVENT_SCHEMAS[event_type]
    return (
        raw.selectExpr("CAST(value AS STRING) AS json_str")
        .select(F.from_json("json_str", schema).alias("data"))
        .select("data.*")
        .withColumn("event_time", F.to_timestamp("timestamp", "yyyy-MM-dd HH:mm:ss"))
        .withColumn("event_type", F.lit(event_type))
        .withColumn("year", F.year("event_time"))
        .withColumn("month", F.month("event_time"))
        .withColumn("day", F.dayofmonth("event_time"))
    )


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Late-data bound for stateful ops. No-op semantics on batch."""
    return events.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event-time tumbling window counts + exact value sum (cents).
    Batch-equivalent: group by time_bucket(width, ts)."""
    from ..functions.money import cents

    return (
        events.select(
            F.window(ts_col, width).alias("w"), *keys, cents("value").alias("v_cents")
        )
        .groupBy("w", *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v_cents").alias("v_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            (F.col("v_sum").cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time windows: each event lands in width/slide
    windows. Output one row per (window_start, event_type)."""
    return (
        events.select(F.window(ts_col, width, slide).alias("w"), "event_type")
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. start = first event, end = last event + gap (Spark
    session_window semantics — the SQL-oracle equivalent is the
    gaps-and-islands construction)."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), ts_col: str = "ts", delay: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup bounded by watermark
    (dropDuplicatesWithinWatermark — SURVEY §2.7 gap-closer)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


def running_user_totals(events: DataFrame, ts_col: str = "ts", timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value sum across micro-batches, with state
    timeout (SURVEY §2.7 gap-closer: arbitrary stateful aggregation the
    built-in windows can't express).

    State per key: (n_events, value_cents). Emits one updated row per
    user per batch. At scale, state is per-key tiny (2 longs) and the
    watermark/timeout bounds total state size.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n_events", LongType()), StructField("v_cents", LongType())]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100.0 + 0.5).floordiv(1).sum())
        state.update((n, cents))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join (gap-closer: absent in the reference): each
    micro-batch joins against the (broadcast) dimension snapshot —
    no state, re-resolved every batch so dim updates are picked up."""
    return stream.join(F.broadcast(dim), on, "left")


def join_views_to_purchases(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (gap-closer): purchases matched to a
    prior page view of the same user+product within ``within``.
    Both sides watermarked so the join state is bounded: view rows can
    be dropped once older than watermark+within.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("product_id").alias("v_product"),
        F.col("event_time").alias("view_time"),
    ).withWatermark("view_time", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("product_id").alias("p_product"),
        F.col("event_time").alias("purchase_time"),
    ).withWatermark("purchase_time", watermark)
    return v.join(
        p,
        F.expr(
            f"""
            v_user = p_user AND v_product = p_product
            AND purchase_time >= view_time
            AND purchase_time <= view_time + INTERVAL {within}
            """
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"),
        F.col("v_product").alias("product_id"),
        "view_time",
        "purchase_time",
    )
