"""Structured Streaming: incremental pages ingestion + tile aggregation."""
