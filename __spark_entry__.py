"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``product_analytics_spark/``; this file only
wires the driver contract (see product_analytics_spark/driver_queries.py
for the per-query reference citations).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from product_analytics_spark import driver_queries
from product_analytics_spark.models.dim_customer import build_dim_customer


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the gold customer-dimension pipeline (reference:
    models/gold/customers/dim_customer.sql) on the driver's sf0.001
    tables — validated join + grouped lifetime metrics + RFM/tier/geo.
    """
    return build_dim_customer(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key — every query has one: the
    near-dup operators (q20/q25/q26) use engine-portable md5-based
    hashing that the oracle reproduces bit-for-bit."""
    return dict(driver_queries.ORACLES)
