"""Structured Streaming: file-source ingest, windowed aggregation, sessions."""
