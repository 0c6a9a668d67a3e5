"""Streaming sinks (reference K4/K5/K6, hardened).

- Bronze parquet append with checkpoint, partitioned by event-time
  y/m/d (reference partitions by processing time — gap fixed).
- foreachBatch adapters for external serving stores behind a small
  interface, executed per-PARTITION on executors (the reference
  collect()s every batch to the driver — streaming_flow.py:92,134).
- The reference's Redis sink has no checkpoint (streaming_flow.py:219-225,
  at-least-once with unbounded replay); here every sink checkpoints.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_bronze_stream(
    events: DataFrame, path: str, checkpoint: str, available_now: bool = False
) -> StreamingQuery:
    """Checkpointed append of the parsed stream to partitioned parquet
    (reference K4, streaming_flow.py:200-208)."""
    writer = (
        events.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .partitionBy("year", "month", "day")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class RecencyStore(Protocol):
    """Redis-shaped serving interface (LPUSH/LTRIM/EXPIRE semantics).
    Implementations must be serializable or constructed per-partition.

    ``expire_seconds`` carries the reference's 24 h key TTL
    (streaming_flow.py:109-111 issues EXPIRE alongside LTRIM) through
    the protocol — implementations that ignore it silently diverge from
    reference serving semantics (keys of inactive users never age out).
    """

    def push(
        self,
        user_id: str,
        kind: str,
        product_ids: Iterable[str],
        expire_seconds: int = 86400,
    ) -> None: ...


def foreach_batch_recency(
    store_factory, kind: str, cap: int = 50, expire_seconds: int = 86400
):
    """Build a foreachBatch fn that updates per-user recency lists
    DISTRIBUTED: newest-first per user computed with Spark (not a
    driver loop), then foreachPartition opens one store connection per
    partition (reference K5 semantics: cap 50, 24 h EXPIRE;
    streaming_flow.py:87-113).
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.col("event_time").desc())
        compact = (
            batch_df.filter(
                F.col("user_id").isNotNull() & F.col("product_id").isNotNull()
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .groupBy("user_id")
            .agg(F.collect_list("product_id").alias("products"))
        )

        def handle(rows):
            store = store_factory()
            for row in rows:
                store.push(row["user_id"], kind, row["products"], expire_seconds)

        compact.foreachPartition(handle)

    return fn


def kafka_payload(recs: DataFrame) -> DataFrame:
    """Serialize rerank output to Kafka key/value (reference K6 does
    this driver-side with json.dumps; native F.to_json keeps it on
    executors — streaming_flow.py:151-163)."""
    return recs.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                "user_id",
                F.col("recommendations"),
                F.current_timestamp().alias("generated_at"),
            )
        ).alias("value"),
    )
