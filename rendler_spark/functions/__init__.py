"""Scalar/vectorized functions: link extraction, URL ops, text analysis,
similarity (SURVEY.md §2H/§2J)."""
