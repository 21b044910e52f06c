"""Structured Streaming operators (SURVEY.md §2.12 extension surface)."""
