"""Structured Streaming extensions (incremental aggregation)."""
