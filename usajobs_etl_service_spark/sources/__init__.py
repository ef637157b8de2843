"""Sources: the resilient paginated REST reader (S1-S3) and the nested
JSON document ingest/flatten (S4)."""
