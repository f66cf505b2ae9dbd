"""Scalar column-transform library (SURVEY.md §2.8)."""
