"""Structured-streaming ingest surface (batch engine reused per microbatch)."""
