"""Sources: parquet table loaders and the canonical ``cells`` ingest relation."""
