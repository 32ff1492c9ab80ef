"""Structured Streaming: ingest pipeline, stateful dedup, metrics listener."""
