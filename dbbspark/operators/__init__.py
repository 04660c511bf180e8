"""Reusable composite operators (interval join, dedup, similarity,
as-of). Library-level only — no custom Catalyst rules (SURVEY.md §4)."""
