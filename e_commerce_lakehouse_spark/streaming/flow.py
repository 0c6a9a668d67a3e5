"""End-to-end streaming flow composition (reference streaming_flow.py
:170-238): per event type, one parsed stream fanned out to multiple
checkpointed sinks — bronze parquet always; recency + rerank sinks for
the serving types (page_view / add_to_cart).

Source-agnostic: pass a `source_factory(event_type) -> DataFrame`
returning a raw (value: string/binary) stream — Kafka in production
(sources.kafka.read_event_stream), file source in tests. Every sink
checkpoints under its own directory (the reference's Redis sink didn't
— SURVEY §3.2 gap fixed).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from .events import parse_raw_events
from .sinks import foreach_batch_recency, write_bronze_stream

SERVING_TYPES = ("page_view", "add_to_cart")  # streaming_flow.py:210-235
ALL_TYPES = ("page_view", "add_to_cart", "purchase", "review")


def start_event_flows(
    source_factory: Callable[[str], DataFrame],
    bronze_root: str,
    checkpoint_root: str,
    store_factory: Callable[[], object] | None = None,
    event_types: tuple[str, ...] = ALL_TYPES,
    available_now: bool = False,
) -> list[StreamingQuery]:
    """Multi-topic fan-out (T1) with multi-sink branching on shared
    lineage (T4). Returns the started queries; callers await them
    (reference awaitAnyTermination, streaming_flow.py:238)."""
    queries: list[StreamingQuery] = []
    for etype in event_types:
        parsed = parse_raw_events(source_factory(etype), etype)

        queries.append(
            write_bronze_stream(
                parsed,
                os.path.join(bronze_root, etype),
                os.path.join(checkpoint_root, etype, "bronze"),
                available_now=available_now,
            )
        )

        if store_factory is not None and etype in SERVING_TYPES:
            kind = "views" if etype == "page_view" else "cart"
            writer = (
                parsed.writeStream.foreachBatch(
                    foreach_batch_recency(store_factory, kind)
                )
                .option(
                    "checkpointLocation",
                    os.path.join(checkpoint_root, etype, "recency"),
                )
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            queries.append(writer.start())
    return queries
