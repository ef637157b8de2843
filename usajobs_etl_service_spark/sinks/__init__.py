"""Sinks: join-based upsert/merge (S6/J1/A8), JDBC upsert writer, and
versioned snapshot export (S9)."""
