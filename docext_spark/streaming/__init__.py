"""Structured Streaming surfaces (optional per SURVEY.md §2.9)."""
