"""Extract/load lifecycle: REST client, ingest builders, writers, incremental."""
