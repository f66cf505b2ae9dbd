"""product_analytics_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of the reference dbt project
(``vikneshwara-r-b/product_analytics``: CDC medallion pipeline,
bronze -> silver -> gold; see SURVEY.md) as composable DataFrame
operators, plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB
scale on a real cluster.

Layout:
    session.py     SparkSession builder (AQE on, UTC, tuned shuffle)
    catalog.py     logical-name -> parquet path registry
    functions/     scalar column transforms (cleaning, dates, scoring)
    operators/     relational/stateful operators (dedup, incremental,
                   windows, similarity, text)
    models/        reference-pipeline parity models (customers_latest,
                   orders_cleaned, dim_customer)
    plans/         model registry + topological runner
    sources/       readers & sinks (partitioned write, merge upsert)
    streaming/     Structured Streaming twins of the batch operators
"""

from product_analytics_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
