"""Structured Streaming layer: incremental dedup ingest."""
