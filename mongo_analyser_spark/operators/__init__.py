"""Operators: melt, field stats, schema inference, sampling, dedup,
similarity, relational wrappers — SURVEY.md §2 inventory."""
