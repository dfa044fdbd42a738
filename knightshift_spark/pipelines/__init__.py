"""End-to-end pipelines: ingest (PGN→rows), clean (validate), enrich."""
