"""Silver model: orders_cleaned — cleaned, validated, enriched
current-state orders.

Parity with reference models/silver/orders_cleaned.sql:
  - latest-version dedup + DELETE exclusion            [ref :47-66]
  - incremental high-watermark                         [ref :53-59]
  - four controlled vocabularies (order_status, payment_status,
    payment_method, shipping_method) + region map      [ref :77-161]
  - financial clamps: total cap 50000, tax <= 20% of the RAW total
    (the cap branch is NOT rounded in the reference — kept),
    shipping cap 200, discount <= raw total            [ref :127-149]
  - net_revenue, date parts, day name, weekend flag    [ref :198-221]
  - delivery_days / on-time flag                       [ref :224-236]
  - validity flags, value category, season, holiday    [ref :239-347]
  - customer validation join upgrading is_valid_order  [ref :308-314, 372-373]
  - first_seen_at backfill                             [ref :350-360]

The customers side of the validation join is the silver snapshot —
key-sized, so Spark broadcasts it (explicit hint); the orders stream
never shuffles for the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_analytics_spark.functions.cleaning import canonicalize, norm_upper
from product_analytics_spark.operators import dedup, incremental

ORDER_STATUS_VOCAB = {
    "PENDING": ["PENDING"],
    "CONFIRMED": ["CONFIRMED", "PROCESSING"],
    "SHIPPED": ["SHIPPED", "IN_TRANSIT", "OUT_FOR_DELIVERY"],
    "DELIVERED": ["DELIVERED", "COMPLETED", "FULFILLED"],
    "CANCELLED": ["CANCELLED", "CANCELED", "VOID", "REJECTED"],
}
PAYMENT_STATUS_VOCAB = {
    "PENDING": ["PENDING"],
    "PAID": ["PAID", "AUTHORIZED", "CAPTURED", "COMPLETED"],
    "FAILED": ["FAILED", "DECLINED", "EXPIRED", "CANCELLED"],
    "REFUNDED": ["REFUNDED", "REVERSED", "CHARGEBACK"],
}
PAYMENT_METHOD_VOCAB = {
    "CREDIT_CARD": ["CREDIT_CARD", "VISA", "MASTERCARD", "AMEX", "DISCOVER"],
    "DEBIT_CARD": ["DEBIT_CARD"],
    "PAYPAL": ["PAYPAL"],
    "BANK_TRANSFER": ["BANK_TRANSFER", "ACH", "WIRE_TRANSFER", "DIRECT_DEBIT"],
    "DIGITAL_WALLET": ["DIGITAL_WALLET", "APPLE_PAY", "GOOGLE_PAY", "SAMSUNG_PAY"],
}
SHIPPING_METHOD_VOCAB = {
    "STANDARD": ["STANDARD", "GROUND", "REGULAR"],
    "EXPRESS": ["EXPRESS", "TWO_DAY", "PRIORITY"],
    "OVERNIGHT": ["OVERNIGHT", "NEXT_DAY", "ONE_DAY"],
    "ECONOMY": ["ECONOMY", "SLOW", "SAVER"],
}
REGION_VOCAB = {
    "NORTH": ["NORTH", "NORTHEAST", "NE"],
    "SOUTH": ["SOUTH", "SOUTHEAST", "SE"],
    "EAST": ["EAST"],
    "WEST": ["WEST", "NORTHWEST", "NW", "SOUTHWEST", "SW"],
    "CENTRAL": ["CENTRAL", "MIDWEST", "MW"],
}


def _clean_money(col: F.Column, cap: F.Column | float | None) -> F.Column:
    """ref :127-149 — NULL/negative -> 0.00; above cap -> cap
    (unrounded, as the reference writes it); else ROUND(x, 2)."""
    expr = F.when(col.isNull() | (col < 0), F.lit(0.00))
    if cap is not None:
        cap_col = F.lit(cap) if isinstance(cap, (int, float)) else cap
        expr = expr.when(col > cap_col, cap_col)
    return expr.otherwise(F.round(col, 2))


def build_orders_cleaned(
    bronze: DataFrame,
    customers_latest: DataFrame,
    prev: DataFrame | None = None,
    incremental_mode: bool = True,
) -> DataFrame:
    batch = bronze
    if incremental_mode and prev is not None:
        wm = incremental.high_watermark(prev, "last_updated_at")
        batch = incremental.watermark_filter(batch, "_cdc_timestamp", wm)

    latest = dedup.latest_by_key(batch, "order_id").filter(
        F.col("_cdc_operation") != "DELETE"
    )

    raw_total = F.col("order_total")
    cleaned = latest.select(
        "order_id",
        "customer_id",
        "order_date",
        canonicalize(F.col("order_status"), ORDER_STATUS_VOCAB, "PENDING").alias("order_status"),
        canonicalize(F.col("payment_status"), PAYMENT_STATUS_VOCAB, "PENDING").alias("payment_status"),
        canonicalize(F.col("payment_method"), PAYMENT_METHOD_VOCAB, "CREDIT_CARD").alias("payment_method"),
        F.trim("shipping_address_line1").alias("shipping_address_line1"),
        F.trim("shipping_address_line2").alias("shipping_address_line2"),
        F.trim("shipping_city").alias("shipping_city"),
        F.trim("shipping_state").alias("shipping_state"),
        norm_upper("shipping_country").alias("shipping_country"),
        F.trim("shipping_postal_code").alias("shipping_postal_code"),
        canonicalize(F.col("shipping_method"), SHIPPING_METHOD_VOCAB, "STANDARD").alias("shipping_method"),
        "estimated_delivery_date",
        "actual_delivery_date",
        _clean_money(raw_total, 50000.0).alias("order_total"),
        # Caps reference the RAW order_total (same-SELECT scoping in
        # the reference SQL, ref :133-137, :145-149).
        _clean_money(F.col("tax_amount"), raw_total * 0.2).alias("tax_amount"),
        _clean_money(F.col("shipping_cost"), 200.0).alias("shipping_cost"),
        _clean_money(F.col("discount_amount"), raw_total).alias("discount_amount"),
        canonicalize(F.col("region"), REGION_VOCAB, "CENTRAL").alias("region"),
        "_cdc_operation",
        "_cdc_timestamp",
        "_ingested_at",
        "_source_system",
        "_batch_id",
    )

    od = F.col("order_date")
    dow = F.dayofweek(od)
    enriched = (
        cleaned.withColumn("net_revenue", F.round(F.col("order_total") - F.col("tax_amount"), 2))
        .withColumn("order_year", F.year(od))
        .withColumn("order_month", F.month(od))
        .withColumn("order_day", F.dayofmonth(od))
        .withColumn("order_hour", F.hour(od))
        .withColumn(
            "day_of_week",
            F.when(dow == 1, "Sunday").when(dow == 2, "Monday").when(dow == 3, "Tuesday")
            .when(dow == 4, "Wednesday").when(dow == 5, "Thursday").when(dow == 6, "Friday")
            .when(dow == 7, "Saturday"),
        )
        .withColumn("is_weekend", dow.isin(1, 7))
        .withColumn(
            "delivery_days",
            F.when(
                F.col("actual_delivery_date").isNotNull() & od.isNotNull(),
                F.datediff(F.col("actual_delivery_date"), F.to_date(od)),
            ),
        )
        .withColumn(
            "is_delivered_on_time",
            F.when(F.col("actual_delivery_date").isNull(), F.lit(None).cast("boolean"))
            .when(F.col("estimated_delivery_date").isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.col("actual_delivery_date") <= F.col("estimated_delivery_date")),
        )
        .withColumn(
            "has_complete_address",
            F.col("shipping_address_line1").isNotNull() & (F.col("shipping_address_line1") != "")
            & F.col("shipping_city").isNotNull() & (F.col("shipping_city") != "")
            & F.col("shipping_state").isNotNull() & (F.col("shipping_state") != "")
            & F.col("shipping_country").isNotNull() & (F.col("shipping_country") != "")
            & F.col("shipping_postal_code").isNotNull() & (F.col("shipping_postal_code") != ""),
        )
        .withColumn(
            "_base_valid",
            (F.col("order_total") > 0)
            & F.col("customer_id").isNotNull()
            & od.isNotNull()
            & F.col("order_status").isNotNull()
            & F.col("payment_status").isNotNull()
            & (
                F.col("order_total")
                >= (F.col("tax_amount") + F.col("shipping_cost") - F.col("discount_amount"))
            )
            & (F.col("discount_amount") <= F.col("order_total")),
        )
    )

    # Customer validation join (ref :308-314, :372-373): silver
    # snapshot side is key-sized -> broadcast.
    cust = customers_latest.select(
        F.col("customer_id").alias("_c_customer_id"), F.col("is_deleted").alias("_c_is_deleted")
    )
    joined = enriched.join(
        F.broadcast(cust), enriched.customer_id == cust._c_customer_id, "left"
    )

    m, d = F.col("order_month"), F.col("order_day")
    final = (
        joined.withColumn(
            "is_valid_order",
            F.col("_base_valid")
            & F.col("_c_customer_id").isNotNull()
            & (F.col("_c_is_deleted") == False),  # noqa: E712
        )
        .withColumn("has_discount", F.col("discount_amount") > 0)
        .withColumn("is_international", F.col("shipping_country") != "USA")
        .withColumn("is_large_order", F.col("order_total") >= 100)
        .withColumn("is_free_shipping", F.col("shipping_cost") == 0)
        .withColumn(
            "order_value_category",
            F.when(F.col("order_total") >= 500, "HIGH")
            .when(F.col("order_total") >= 100, "MEDIUM")
            .when(F.col("order_total") >= 25, "LOW")
            .otherwise("VERY_LOW"),
        )
        .withColumn(
            "season",
            F.when(m.isin(12, 1, 2), "WINTER")
            .when(m.isin(3, 4, 5), "SPRING")
            .when(m.isin(6, 7, 8), "SUMMER")
            .when(m.isin(9, 10, 11), "FALL"),
        )
        .withColumn(
            "holiday_period",
            F.when((m == 11) & (d >= 20), "BLACK_FRIDAY")
            .when((m == 12) & (d <= 25), "CHRISTMAS")
            .when((m == 12) & (d >= 26), "YEAR_END")
            .when((m == 1) & (d <= 7), "NEW_YEAR")
            .when((m == 2) & (d == 14), "VALENTINES")
            .when((m == 5) & (d >= 8) & (d <= 14), "MOTHERS_DAY")
            .otherwise("REGULAR"),
        )
        .withColumn("last_updated_at", F.col("_cdc_timestamp"))
        .withColumn("is_deleted", F.col("_cdc_operation") == "DELETE")
        .drop("_c_customer_id", "_c_is_deleted", "_base_valid")
    )

    if incremental_mode and prev is not None:
        final = incremental.first_seen_backfill(final, prev, "order_id", "_cdc_timestamp")
        final = final.withColumn(
            "first_seen_at",
            F.when(F.col("_cdc_operation") == "INSERT", F.col("_cdc_timestamp")).otherwise(
                F.col("first_seen_at")
            ),
        )
    else:
        final = final.withColumn("first_seen_at", F.col("_cdc_timestamp"))

    return final.drop("_cdc_operation", "_cdc_timestamp", "_ingested_at")
