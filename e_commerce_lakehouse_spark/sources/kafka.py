"""Kafka source/sink (reference S4/K6 — streaming_flow.py:180-185,
116-167).

Thin wrappers over the built-in Kafka connector. This container has no
Kafka broker (and no spark-sql-kafka package), so these are unexercised
here; streaming tests use the file source instead (same downstream
operators — parse_raw_events is source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

EVENT_TOPICS = ("page_view", "add_to_cart", "purchase", "review")  # events.{type}


def read_event_stream(
    spark: SparkSession,
    brokers: str,
    event_type: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Subscribe events.{type} (reference streaming_flow.py:180-185).
    Returns the raw frame (key/value binary) — feed to
    streaming.events.parse_raw_events."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", f"events.{event_type}")
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_kafka_stream(
    df: DataFrame, brokers: str, topic: str, checkpoint: str
) -> StreamingQuery:
    """Native Kafka sink for key/value string frames (replaces the
    reference's driver-side KafkaProducer loop, streaming_flow.py:116-167;
    pair with streaming.sinks.kafka_payload)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
