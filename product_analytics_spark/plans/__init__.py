"""Model registry & DAG runner (SURVEY.md §3 lifecycle)."""
