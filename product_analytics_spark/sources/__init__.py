"""Readers & sinks (SURVEY.md §2.1 S4-S8)."""
