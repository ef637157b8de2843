"""Structured Streaming surface: incremental page ingest and
event-time windowed aggregation (SURVEY.md §2.9 — the reference is
batch-only; this is the engine's incremental path)."""
