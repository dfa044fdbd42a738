"""Structured Streaming: PGN spool ingestion, windowed rollups, stateful dedup."""
