"""The reference pipeline DAG, assembled from the parity models.

Mirrors the dbt graph (SURVEY.md §0):

    bronze.customers_cdc -> customers_latest -+-> orders_cleaned -> dim_customer
    bronze.orders_cdc ------------------------+        |               ^
                                                       +---------------+

Tags follow dbt_project.yml:44-57 (silver / gold / feed_customers).
"""

from __future__ import annotations

import datetime as dt

from product_analytics_spark.models.customers_latest import build_customers_latest
from product_analytics_spark.models.dim_customer_cdc import build_dim_customer_cdc
from product_analytics_spark.models.orders_cleaned import build_orders_cleaned
from product_analytics_spark.plans.registry import Model, ModelRegistry


def build_registry(as_of: dt.date, as_of_ts: dt.datetime | None = None) -> ModelRegistry:
    reg = ModelRegistry()
    reg.register(
        Model(
            name="customers_latest",
            deps=("customers_cdc",),
            builder=lambda deps, prev, full: build_customers_latest(
                deps["customers_cdc"], prev, incremental_mode=not full
            ),
            unique_key="customer_id",
            cluster_by=("customer_id",),
            tags=frozenset({"silver", "feed_customers"}),
        )
    )
    reg.register(
        Model(
            name="orders_cleaned",
            deps=("orders_cdc", "customers_latest"),
            builder=lambda deps, prev, full: build_orders_cleaned(
                deps["orders_cdc"], deps["customers_latest"], prev, incremental_mode=not full
            ),
            unique_key="order_id",
            partition_by=("order_year", "order_month"),
            cluster_by=("order_id", "customer_id", "order_date"),
            tags=frozenset({"silver", "feed_customers"}),
        )
    )
    reg.register(
        Model(
            name="dim_customer",
            deps=("customers_latest", "orders_cleaned"),
            builder=lambda deps, prev, full: build_dim_customer_cdc(
                deps["customers_latest"], deps["orders_cleaned"], as_of, as_of_ts
            ),
            unique_key="customer_id",
            partition_by=("country",),
            cluster_by=("customer_id",),
            tags=frozenset({"gold", "feed_customers"}),
        )
    )
    return reg
