"""Reference-pipeline parity models (SURVEY.md §2, M5).

``dim_customer`` here is the flagship driver-table analog of the
reference gold model; ``cdc_models`` holds the faithful
bronze->silver->gold CDC pipeline over FIXTURES.md-shaped inputs.
"""
