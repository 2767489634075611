"""Structured Streaming variant of the pipeline (SURVEY.md §2.10)."""
