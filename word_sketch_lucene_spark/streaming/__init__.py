"""Structured Streaming: incremental index ingestion + windowed aggs."""
