"""Sources: PGN text (batch + streaming), parquet star schema, REST fixtures."""
