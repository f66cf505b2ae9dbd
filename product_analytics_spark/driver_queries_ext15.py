"""Round-3 driver query families, batch 15 (q196+): the custom
Python DataSource scan (partition-planned, Arrow-batched, filter-
pushdown) and Spark-4 VARIANT semi-structured processing.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.sources import pyds

# ------------------------------------------------------------- q196

CDC_SHARDS = 8
CDC_ROWS_PER_SHARD = 15000
CDC_MIN_OP_ID = 10000
CDC_BUCKETS = 97


def q196_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: custom Python DataSource scan — a deterministic CDC-feed
    generator registered as `spark.read.format("cdc_feed")`
    (sources/pyds.py): one InputPartition per shard (the source plans
    its own parallelism), Arrow RecordBatch reads (vectorized, never
    row-at-a-time), and `pushFilters` that consumes the `op =
    'INSERT'` equality and the `op_id >= …` bound so the generator
    SKIPS the filtered range/ops instead of materializing them — the
    same contract parquet pushdown gives a file scan, extended to
    sources with no file representation (message buses, change
    streams). The feed is pure modular arithmetic, so the oracle
    reproduces it with generate_series, byte-exactly.

    Scale: shards map 1:1 to tasks — a 1000-shard feed reads with
    1000-way parallelism; pushdown happens per-partition before any
    data exists. The aggregate shuffles 97 bucket keys."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    feed = (
        spark.read.format("cdc_feed")
        .option("shards", str(CDC_SHARDS))
        .option("rows_per_shard", str(CDC_ROWS_PER_SHARD))
        .load()
        .filter((F.col("op") == "INSERT") & (F.col("op_id") >= CDC_MIN_OP_ID))
    )
    return feed.groupBy(
        (F.col("customer_id") % CDC_BUCKETS).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ops"),
        F.sum("amount_cents").cast("bigint").alias("sum_cents"),
        F.max("ts_epoch").cast("bigint").alias("last_ts_epoch"),
    )


Q196_SQL = f"""
WITH g AS (
  SELECT unnest(generate_series(0, {CDC_SHARDS * CDC_ROWS_PER_SHARD - 1})) AS op_id
),
feed AS (
  SELECT op_id,
         op_id % {pyds.CDC_N_CUSTOMERS} AS customer_id,
         CASE WHEN op_id % 10 <= 6 THEN 'INSERT'
              WHEN op_id % 10 <= 8 THEN 'UPDATE' ELSE 'DELETE' END AS op,
         {pyds.CDC_TS_BASE} + op_id * 60 AS ts_epoch,
         (op_id * {pyds.CDC_AMOUNT_A} + {pyds.CDC_AMOUNT_B}) % {pyds.CDC_AMOUNT_MOD}
           AS amount_cents
  FROM g
)
SELECT customer_id % {CDC_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS n_ops,
       CAST(sum(amount_cents) AS BIGINT) AS sum_cents,
       CAST(max(ts_epoch) AS BIGINT) AS last_ts_epoch
FROM feed
WHERE op = 'INSERT' AND op_id >= {CDC_MIN_OP_ID}
GROUP BY 1
"""


# ------------------------------------------------------------- q197


def q197_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT semi-structured processing — `parse_json` into
    the binary VARIANT encoding, `variant_get` path extraction with a
    target type, null-safety via `try_variant_get`. VARIANT is the
    engine's answer to schema-on-read JSON at scale: parse ONCE into
    a binary columnar form, then path-extract without re-tokenizing
    the source string per expression (X5's `from_json` needs the full
    schema up front; VARIANT doesn't). The readout aggregates the
    extracted metric per event type.

    Scale: parse+extract is narrow (no shuffle before the final
    small agg); at 100 TB the parsed VARIANT column is written once
    and every downstream path-extract skips string parsing entirely.
    Oracle: DuckDB JSON path extraction over the same strings."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.parse_json("props").alias("pv"),
    ).select(
        "event_type",
        F.variant_get("pv", "$.k", "bigint").alias("k"),
        F.try_variant_get("pv", "$.missing", "bigint").alias("missing"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_null"),
    )


Q197_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing_null
FROM events GROUP BY 1
"""


QUERIES_EXT15 = {
    "q196_python_datasource_scan": q196_python_datasource_scan,
    "q197_variant_extract": q197_variant_extract,
}

ORACLES_EXT15 = {
    "q196_python_datasource_scan": Q196_SQL,
    "q197_variant_extract": Q197_SQL,
}
