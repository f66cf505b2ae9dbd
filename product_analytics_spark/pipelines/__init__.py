"""Composed end-to-end pipelines built from the operator library.

`models/` reproduces the reference's dbt DAG; this package is its
extension twin for the LLM-training-data side: multi-stage corpus
builds wired from the same operators the driver queries certify
one-by-one, with per-stage funnel observability.
"""
