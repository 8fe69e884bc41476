"""Structured Streaming jobs (SURVEY.md §2.3 streaming trio)."""
