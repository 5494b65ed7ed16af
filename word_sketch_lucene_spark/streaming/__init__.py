"""Structured Streaming: incremental index ingestion, windowed aggs,
stateful streaming dedup (``streaming.dedup``)."""
