"""Structured Streaming extension (SURVEY.md §2.9: not in the reference —
optional ingestion path reusing the batch stage functions)."""
