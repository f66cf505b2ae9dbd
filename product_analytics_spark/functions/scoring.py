"""Customer scoring / segmentation functions.

Mirrors the reference gold model's derived-metric logic (reference:
models/gold/customers/dim_customer.sql — RFM scores :173-198, customer
tier :81-86, value category orders_cleaned.sql:323-328, weighted data
quality score dim_customer.sql:118-122, flags :164-170). All pure
CASE-WHEN column expressions: no shuffle, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_score(c: Column, thresholds: Sequence[float], descending: bool = False) -> Column:
    """Map a metric onto a 1..5 score via 4 thresholds.

    ``thresholds`` = (t1, t2, t3, t4). Ascending: >= t4 -> 5 ... else 1.
    ``descending=True`` inverts (small is good — recency: fewer days
    since last order scores higher). Mirrors the reference's RFM CASE
    ladders (dim_customer.sql:173-198).
    """
    t1, t2, t3, t4 = thresholds
    if descending:
        return (
            F.when(c <= t1, 5).when(c <= t2, 4).when(c <= t3, 3).when(c <= t4, 2).otherwise(1)
        )
    return (
        F.when(c >= t4, 5).when(c >= t3, 4).when(c >= t2, 3).when(c >= t1, 2).otherwise(1)
    )


#: Reference RFM thresholds (dim_customer.sql:173-198).
RECENCY_DAYS = (30.0, 90.0, 180.0, 365.0)     # descending (days since last order)
FREQUENCY_ORDERS = (2.0, 5.0, 10.0, 20.0)     # ascending (distinct orders)
MONETARY_VALUE = (100.0, 500.0, 2000.0, 5000.0)  # ascending (lifetime value)


def rfm_scores(recency_days: Column, frequency: Column, monetary: Column) -> dict[str, Column]:
    """The three 1-5 RFM component scores (dim_customer.sql:173-198)."""
    return {
        "recency_score": bucket_score(recency_days, RECENCY_DAYS, descending=True),
        "frequency_score": bucket_score(frequency, FREQUENCY_ORDERS),
        "monetary_score": bucket_score(monetary, MONETARY_VALUE),
    }


def customer_tier(lifetime_value: Column, lifetime_orders: Column) -> Column:
    """(LTV, order count) -> tier (reference: dim_customer.sql:81-86)."""
    return (
        F.when((lifetime_value >= 10000) & (lifetime_orders >= 20), "PLATINUM")
        .when((lifetime_value >= 5000) & (lifetime_orders >= 10), "GOLD")
        .when((lifetime_value >= 1000) & (lifetime_orders >= 5), "SILVER")
        .otherwise("BRONZE")
    )


def order_value_category(total: Column) -> Column:
    """4-tier order value bucket (reference: orders_cleaned.sql:323-328)."""
    return (
        F.when(total >= 1000, "LARGE")
        .when(total >= 250, "MEDIUM")
        .when(total >= 50, "SMALL")
        .otherwise("MICRO")
    )


def weighted_quality_score(flags: Sequence[tuple[Column, float]], scale: int = 2) -> Column:
    """SUM(CAST(flag AS INT) * weight) — weighted completeness score
    (reference: dim_customer.sql:118-122 uses weights .4/.3/.3)."""
    expr = None
    for flag, w in flags:
        term = flag.cast("int") * F.lit(w)
        expr = term if expr is None else expr + term
    assert expr is not None
    return F.round(expr, scale)


def lifecycle_stage(days_since_last: Column, lifetime_orders: Column, days_since_first: Column) -> Column:
    """7-way lifecycle segmentation (reference: dim_customer.sql:100-108)."""
    return (
        F.when(lifetime_orders == 0, "PROSPECT")
        .when((days_since_first <= 30) & (lifetime_orders >= 1), "NEW")
        .when(days_since_last <= 30, "ACTIVE")
        .when(days_since_last <= 90, "COOLING")
        .when(days_since_last <= 180, "AT_RISK")
        .when(days_since_last <= 365, "DORMANT")
        .otherwise("LOST")
    )
