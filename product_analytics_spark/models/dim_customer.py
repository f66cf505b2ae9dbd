"""Gold customer dimension — flagship pipeline on the driver tables.

Re-expresses the reference gold model (reference:
models/gold/customers/dim_customer.sql) over the driver's TPC-H-ish
star schema: base snapshot (customer) ⟕ grouped order metrics
(:33-59) ⟕ geography (:63-73 analog via nation/region) + RFM scores
(:173-198), tier (:81-86), lifecycle (:100-108), quality score
(:118-122), COALESCE defaults (:149-161).

Plan shape at scale: one hash-agg shuffle on o_custkey for the
metrics, one shuffle join customer⋈metrics on the same key
(AQE upgrades to broadcast when the dim side is small), nation/region
broadcast. Everything else is codegen'd projection.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.functions import cleaning, dates, scoring

DEFAULT_AS_OF = dt.date(2001, 12, 31)


def build_dim_customer(
    spark: SparkSession, sf_dir: str, as_of: dt.date = DEFAULT_AS_OF
) -> DataFrame:
    customer = read_parquet(spark, f"{sf_dir}/customer.parquet")
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    region = read_parquet(spark, f"{sf_dir}/region.parquet")

    # Order metrics block (dim_customer.sql:33-59): one pass, one shuffle.
    metrics = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("lifetime_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("lifetime_value"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_order_value"),
        F.min("o_orderdate").alias("first_order_date"),
        F.max("o_orderdate").alias("last_order_date"),
        F.countDistinct(F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))).alias(
            "fulfilled_orders"
        ),
        F.countDistinct(F.date_trunc("month", "o_orderdate")).alias("active_months"),
    )

    # Geography block (dim_customer.sql:63-73 analog).
    geo = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left").select(
        "n_nationkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region_name")
    )

    base = customer.join(F.broadcast(geo), customer.c_nationkey == geo.n_nationkey, "left")
    j = base.join(metrics, base.c_custkey == metrics.customer_id, "left")

    lifetime_orders = F.coalesce(F.col("lifetime_orders"), F.lit(0))
    lifetime_value = F.coalesce(F.col("lifetime_value"), F.lit(0.0))
    recency_days = F.coalesce(
        F.datediff(dates.as_of_lit(as_of), F.col("last_order_date")), F.lit(9999)
    )
    rfm = scoring.rfm_scores(recency_days, lifetime_orders, lifetime_value)
    has_name = cleaning.non_empty("c_name")
    has_seg = cleaning.non_empty("c_mktsegment")
    has_geo = F.col("nation").isNotNull()

    return j.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("nation"),
        F.col("region_name"),
        lifetime_orders.alias("lifetime_orders"),
        lifetime_value.alias("lifetime_value"),
        F.coalesce(F.col("avg_order_value"), F.lit(0.0)).alias("avg_order_value"),
        F.col("first_order_date"),
        F.col("last_order_date"),
        F.coalesce(F.col("fulfilled_orders"), F.lit(0)).alias("fulfilled_orders"),
        F.coalesce(F.col("active_months"), F.lit(0)).alias("active_months"),
        recency_days.alias("recency_days"),
        rfm["recency_score"].alias("recency_score"),
        rfm["frequency_score"].alias("frequency_score"),
        rfm["monetary_score"].alias("monetary_score"),
        scoring.customer_tier(lifetime_value, lifetime_orders).alias("customer_tier"),
        scoring.lifecycle_stage(
            recency_days,
            lifetime_orders,
            F.coalesce(F.datediff(dates.as_of_lit(as_of), F.col("first_order_date")), F.lit(9999)),
        ).alias("lifecycle_stage"),
        scoring.weighted_quality_score([(has_name, 0.4), (has_seg, 0.3), (has_geo, 0.3)]).alias(
            "quality_score"
        ),
    )
