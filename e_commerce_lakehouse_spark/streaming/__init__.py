# Structured Streaming layer: event parsing shared batch/stream,
# event-time windows (tumbling/sliding/session), streaming dedup,
# checkpointed sinks, and the distributed rerank loop.
