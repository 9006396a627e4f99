"""Spark DataFrame operators (SURVEY.md §2)."""
