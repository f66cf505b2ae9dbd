"""Silver model: customers_latest — SCD Type-1 current-state snapshot
of the customers CDC stream.

Parity with reference models/silver/customers/customers_latest.sql:
  - latest-version dedup per customer_id ordered by
    (_cdc_timestamp DESC, _ingested_at DESC)      [ref :33-38]
  - incremental high-watermark on _cdc_timestamp  [ref :41-49]
  - trim/lower/upper canonicalization             [ref :81-96]
  - email regex / phone digit validation flags on the RAW columns
    (the reference validates pre-trim values)     [ref :98-110]
  - address completeness flag                     [ref :111-121]
  - first_seen_at backfill: INSERT keeps own ts, else prior
    snapshot's value, else own ts                 [ref :123-140]
  - DELETE rows excluded from the active set (so is_deleted is
    always FALSE in the output — a reference quirk kept for parity;
    a hard delete never propagates to the merged target) [ref :143-153]

Engine form: pure function (bronze batch, prior snapshot | None) ->
snapshot DataFrame. The caller merges via operators/incremental.py.
Dedup uses the max_by aggregation form — shuffles one candidate row
per key per input partition instead of every CDC version (the 100 TB
win; see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_analytics_spark.functions import cleaning
from product_analytics_spark.operators import dedup, incremental

PASSTHROUGH_META = ("_source_system", "_batch_id")


def build_customers_latest(
    bronze: DataFrame,
    prev: DataFrame | None = None,
    incremental_mode: bool = True,
) -> DataFrame:
    """One run of the customers_latest model over a bronze CDC batch.

    ``prev`` is the prior materialized snapshot ({{ this }});
    None == first run / full refresh.
    """
    batch = bronze
    if incremental_mode and prev is not None:
        wm = incremental.high_watermark(prev, "last_updated_at")
        batch = incremental.watermark_filter(batch, "_cdc_timestamp", wm)

    latest = dedup.latest_by_key(batch, "customer_id")

    raw_email, raw_phone = F.col("email"), F.col("phone")
    is_email_valid = ~(
        raw_email.isNull()
        | (raw_email == "")
        | ~raw_email.rlike(cleaning.EMAIL_RE)
    )
    is_phone_valid = ~(
        raw_phone.isNull()
        | (raw_phone == "")
        | (raw_phone == "000-000-0000")
        | (F.length(F.regexp_replace(raw_phone, "[^0-9]", "")) < 10)
    )
    is_address_complete = (
        F.col("address_line1").isNotNull() & (F.col("address_line1") != "")
        & F.col("city").isNotNull() & (F.col("city") != "")
        & F.col("state").isNotNull() & (F.col("state") != "")
        & F.col("postal_code").isNotNull() & (F.col("postal_code") != "")
    )

    transformed = latest.select(
        "customer_id",
        F.lower(F.trim("email")).alias("email"),
        F.trim("first_name").alias("first_name"),
        F.trim("last_name").alias("last_name"),
        F.concat(F.trim("first_name"), F.lit(" "), F.trim("last_name")).alias("full_name"),
        F.trim("phone").alias("phone"),
        F.trim("address_line1").alias("address_line1"),
        F.trim("address_line2").alias("address_line2"),
        F.trim("city").alias("city"),
        F.trim("state").alias("state"),
        F.upper(F.trim("country")).alias("country"),
        F.trim("postal_code").alias("postal_code"),
        "registration_date",
        F.upper("customer_status").alias("customer_status"),
        F.upper("customer_segment").alias("customer_segment"),
        is_email_valid.alias("is_email_valid"),
        is_phone_valid.alias("is_phone_valid"),
        is_address_complete.alias("is_address_complete"),
        "_cdc_operation",
        F.col("_cdc_timestamp").alias("last_updated_at"),
        (F.col("_cdc_operation") == "DELETE").alias("is_deleted"),
        *PASSTHROUGH_META,
        F.col("_cdc_timestamp").alias("_own_ts"),
    )

    if incremental_mode and prev is not None:
        with_first_seen = incremental.first_seen_backfill(
            transformed, prev, "customer_id", "_own_ts"
        )
        # INSERT rows always keep their own timestamp (ref :125).
        with_first_seen = with_first_seen.withColumn(
            "first_seen_at",
            F.when(F.col("_cdc_operation") == "INSERT", F.col("_own_ts")).otherwise(
                F.col("first_seen_at")
            ),
        )
    else:
        with_first_seen = transformed.withColumn("first_seen_at", F.col("_own_ts"))

    return (
        with_first_seen.filter(F.col("_cdc_operation") != "DELETE")
        .drop("_cdc_operation", "_own_ts")
    )
