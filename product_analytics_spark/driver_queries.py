"""Driver-facing query inventory (SURVEY.md §2 "driver query key" column).

Each query key maps a reference operator (file:line cited on the
builder) onto the driver's TPC-H-ish tables, paired with an ANSI-SQL
oracle that DuckDB runs over the same parquet (dialect notes inline:
dayofweek offset, date_diff arg order, regexp_matches).

Every computed column is aliased identically in the Spark builder and
the oracle — the driver's comparator sorts columns by name before
hashing values.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark import cache
from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.functions import cleaning, dates, scoring
from product_analytics_spark.operators import (
    corpus,
    dedup,
    graph,
    incremental,
    multimodal,
    product_metrics,
    sampling,
    scd,
    similarity,
    skew,
    stats,
    text,
    windows,
)

# Shared helpers + deterministic parameters live in qcommon so the
# q100+ extension module (driver_queries_ext.py) uses the identical
# money/table discipline without a circular import.
from product_analytics_spark.qcommon import (  # noqa: F401
    AS_OF,
    EVENTS_CUT,
    SESSION_GAP_MIN,
    TOPK_K,
    WATERMARK_DEFAULT,
    _cents_out,
    _dec2dbl_sql,
    _money,
    _money_cents,
    _money_out,
    _t,
    local_rows_df,
)


# --------------------------------------------------------------------- q01

def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P1: source scan + explicit projection/rename (reference:
    orders_cleaned.sql:19-44's 25-col SELECT list). Column pruning
    reaches the parquet scan — only 6 of 6 needed columns are read."""
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("order_total"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("order_priority"),
    )


Q01_SQL = """
SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       o_orderstatus AS order_status, o_totalprice AS order_total,
       CAST(o_orderdate AS TIMESTAMP) AS order_date, o_orderpriority AS order_priority
FROM orders
"""


# --------------------------------------------------------------------- q02

def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: compound predicate filter (reference: dim_customer.sql:56-58
    ``customer_id IS NOT NULL AND order_status != 'CANCELLED' AND
    is_valid_order``). Predicates push down to the parquet reader."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey").isNotNull())
        .filter(F.col("o_orderstatus") != "F")
        .filter(F.col("o_totalprice") > 1000.0)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_totalprice").alias("order_total"),
        )
    )


Q02_SQL = """
SELECT o_orderkey AS order_id, o_custkey AS customer_id, o_totalprice AS order_total
FROM orders
WHERE o_custkey IS NOT NULL AND o_orderstatus != 'F' AND o_totalprice > 1000.0
"""


# --------------------------------------------------------------------- q03

def q03_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+P2: CDC latest-record dedup (reference: customers_latest.sql:33-38,
    orders_cleaned.sql:47-50) on events — latest event per user_id,
    ordered by (ts, event_id) desc. Uses the max_by aggregation form
    (map-side combinable: shuffles |users| rows, not |events|)."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    return dedup.latest_by_key(e, "user_id", order_by=("ts", "event_id")).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


Q03_SQL = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------- q04

#: Controlled vocabularies in the style of orders_cleaned.sql:77-161.
STATUS_VOCAB = {"OPEN": ["O"], "FULFILLED": ["F"], "PENDING": ["P"]}
PRIORITY_VOCAB = {
    "HIGH": ["1-URGENT", "2-HIGH"],
    "MEDIUM": ["3-MEDIUM"],
    "LOW": ["4-NOT SPECIFIED", "5-LOW"],
}


def q04_case_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: UPPER(TRIM())-normalized controlled-vocabulary mapping
    with default fallback (reference: orders_cleaned.sql:77-121 status/
    payment/shipping vocab maps)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        cleaning.canonicalize(F.col("o_orderstatus"), STATUS_VOCAB, "UNKNOWN").alias("order_status"),
        cleaning.canonicalize(F.col("o_orderpriority"), PRIORITY_VOCAB, "OTHER").alias("priority_class"),
    )


Q04_SQL = """
SELECT o_orderkey AS order_id,
  CASE WHEN upper(trim(o_orderstatus)) IN ('O') THEN 'OPEN'
       WHEN upper(trim(o_orderstatus)) IN ('F') THEN 'FULFILLED'
       WHEN upper(trim(o_orderstatus)) IN ('P') THEN 'PENDING'
       ELSE 'UNKNOWN' END AS order_status,
  CASE WHEN upper(trim(o_orderpriority)) IN ('1-URGENT','2-HIGH') THEN 'HIGH'
       WHEN upper(trim(o_orderpriority)) IN ('3-MEDIUM') THEN 'MEDIUM'
       WHEN upper(trim(o_orderpriority)) IN ('4-NOT SPECIFIED','5-LOW') THEN 'LOW'
       ELSE 'OTHER' END AS priority_class
FROM orders
"""


# --------------------------------------------------------------------- q05

def q05_financial_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13+F14: financial clamping with business caps (reference:
    orders_cleaned.sql:127-149: NULL/negative->0, total cap 50000,
    tax <= 20% of total, discount <= total) + derived net revenue
    (:198). Pure projection — folds into the scan stage."""
    l = _t(spark, sf_dir, "lineitem")
    gross = cleaning.clamp_money(F.col("l_extendedprice"), 0.0, 50000.0)
    tax_raw = F.col("l_extendedprice") * F.col("l_tax")
    disc_raw = F.col("l_extendedprice") * F.col("l_discount")
    out = l.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_extendedprice"),
        F.col("l_tax"),
        F.col("l_discount"),
        gross.alias("gross_amount"),
    )
    gross_dbl = F.col("gross_amount").cast("double")
    out = out.withColumn("tax_amount", cleaning.clamp_money(tax_raw, 0.0, gross_dbl * 0.2))
    out = out.withColumn("discount_amount", cleaning.clamp_money(disc_raw, 0.0, gross_dbl))
    out = out.withColumn(
        "net_revenue", (F.col("gross_amount") - F.col("discount_amount")).cast("decimal(18,2)")
    )
    return out.select(
        "order_id",
        "line_number",
        _money_out(F.col("gross_amount")).alias("gross_amount"),
        _money_out(F.col("tax_amount")).alias("tax_amount"),
        _money_out(F.col("discount_amount")).alias("discount_amount"),
        _money_out(F.col("net_revenue")).alias("net_revenue"),
    )


# Money values go double -> DECIMAL(18,6) -> DECIMAL(18,2): engine-stable
# rounding (see functions/cleaning.py:round_money); outputs are cast
# DECIMAL -> DOUBLE on both sides (see _money_out).
Q05_SQL = """
WITH inner_q AS (
WITH g AS (
  SELECT l_orderkey AS order_id, l_linenumber AS line_number,
    CASE WHEN l_extendedprice IS NULL OR l_extendedprice < 0 THEN CAST(0 AS DECIMAL(18,2))
         WHEN l_extendedprice > 50000 THEN round(CAST(50000.0 AS DECIMAL(18,6)), 2)
         ELSE round(CAST(l_extendedprice AS DECIMAL(18,6)), 2) END AS gross_amount,
    l_extendedprice * l_tax AS tax_raw,
    l_extendedprice * l_discount AS disc_raw
  FROM lineitem
)
SELECT order_id, line_number, gross_amount,
  CASE WHEN tax_raw IS NULL OR tax_raw < 0 THEN CAST(0 AS DECIMAL(18,2))
       WHEN tax_raw > CAST(gross_amount AS DOUBLE) * 0.2
         THEN round(CAST(CAST(gross_amount AS DOUBLE) * 0.2 AS DECIMAL(18,6)), 2)
       ELSE round(CAST(tax_raw AS DECIMAL(18,6)), 2) END AS tax_amount,
  CASE WHEN disc_raw IS NULL OR disc_raw < 0 THEN CAST(0 AS DECIMAL(18,2))
       WHEN disc_raw > CAST(gross_amount AS DOUBLE)
         THEN round(CAST(CAST(gross_amount AS DOUBLE) AS DECIMAL(18,6)), 2)
       ELSE round(CAST(disc_raw AS DECIMAL(18,6)), 2) END AS discount_amount,
  CAST(gross_amount - (CASE WHEN disc_raw IS NULL OR disc_raw < 0 THEN CAST(0 AS DECIMAL(18,2))
       WHEN disc_raw > CAST(gross_amount AS DOUBLE)
         THEN round(CAST(CAST(gross_amount AS DOUBLE) AS DECIMAL(18,6)), 2)
       ELSE round(CAST(disc_raw AS DECIMAL(18,6)), 2) END) AS DECIMAL(18,2)) AS net_revenue
FROM g
)
SELECT order_id, line_number,
       CAST(gross_amount AS DOUBLE) AS gross_amount,
       CAST(tax_amount AS DOUBLE) AS tax_amount,
       CAST(discount_amount AS DOUBLE) AS discount_amount,
       CAST(net_revenue AS DOUBLE) AS net_revenue
FROM inner_q
"""


# --------------------------------------------------------------------- q06

NAME_RE = r"^Customer#[0-9]{9}$"


def q06_string_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3-F6: regex validation, regex-replace digit count, NULL/empty
    completeness, NULL-propagating concat (reference:
    customers_latest.sql:84,98-121)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.concat(F.trim(F.col("c_name")), F.lit(" "), F.trim(F.col("c_mktsegment"))).alias("name_segment"),
        F.col("c_name").rlike(NAME_RE).alias("is_valid_name"),
        F.length(F.regexp_replace(F.col("c_name"), "[^0-9]", "")).alias("name_digits"),
        (F.col("c_mktsegment").isNotNull() & (F.trim(F.col("c_mktsegment")) != "")).alias("has_segment"),
    )


Q06_SQL = """
SELECT c_custkey AS customer_id,
  trim(c_name) || ' ' || trim(c_mktsegment) AS name_segment,
  regexp_matches(c_name, '^Customer#[0-9]{9}$') AS is_valid_name,
  length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS name_digits,
  (c_mktsegment IS NOT NULL AND trim(c_mktsegment) != '') AS has_segment
FROM customer
"""


# --------------------------------------------------------------------- q07

def q07_date_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7-F9: date-part extraction, day-name CASE, weekend flag, season
    and holiday bucketing (reference: orders_cleaned.sql:201-221,331-347).
    Note DuckDB dayofweek is 0=Sunday -> oracle adds 1."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    enriched = dates.enrich_dates(o, "o_orderdate", prefix="order")
    return enriched.select(
        F.col("o_orderkey").alias("order_id"),
        "order_year", "order_month", "order_day", "order_hour", "order_dow",
        "order_day_name", "order_is_weekend", "order_season", "order_holiday_period",
    )


Q07_SQL = """
SELECT o_orderkey AS order_id,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  day(o_orderdate) AS order_day,
  hour(o_orderdate) AS order_hour,
  dayofweek(o_orderdate) + 1 AS order_dow,
  CASE dayofweek(o_orderdate) + 1
    WHEN 1 THEN 'Sunday' WHEN 2 THEN 'Monday' WHEN 3 THEN 'Tuesday'
    WHEN 4 THEN 'Wednesday' WHEN 5 THEN 'Thursday' WHEN 6 THEN 'Friday'
    WHEN 7 THEN 'Saturday' END AS order_day_name,
  dayofweek(o_orderdate) + 1 IN (1, 7) AS order_is_weekend,
  CASE WHEN month(o_orderdate) IN (12,1,2) THEN 'Winter'
       WHEN month(o_orderdate) IN (3,4,5) THEN 'Spring'
       WHEN month(o_orderdate) IN (6,7,8) THEN 'Summer'
       ELSE 'Fall' END AS order_season,
  CASE WHEN month(o_orderdate)=11 AND day(o_orderdate) BETWEEN 22 AND 28 THEN 'Black Friday Week'
       WHEN month(o_orderdate)=12 AND day(o_orderdate) BETWEEN 1 AND 26 THEN 'Christmas Season'
       WHEN (month(o_orderdate)=12 AND day(o_orderdate)>=27) OR (month(o_orderdate)=1 AND day(o_orderdate)<=2) THEN 'New Year'
       WHEN month(o_orderdate)=2 AND day(o_orderdate) BETWEEN 10 AND 16 THEN 'Valentines'
       WHEN month(o_orderdate)=5 AND day(o_orderdate) BETWEEN 8 AND 14 THEN 'Mothers Day'
       WHEN month(o_orderdate)=7 AND day(o_orderdate) BETWEEN 1 AND 7 THEN 'Independence Day'
       ELSE 'Regular' END AS order_holiday_period
FROM orders
"""


# --------------------------------------------------------------------- q08

def q08_datediff_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: DATEDIFF metrics (reference: orders_cleaned.sql:224-228
    delivery_days) — per order: days from order to first/last shipment.
    DuckDB's date_diff takes (part, start, end) — args flipped vs Spark.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey, "inner")
    d = j.select(
        F.col("o_orderkey").alias("order_id"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_days"),
    )
    return d.groupBy("order_id").agg(
        F.min("ship_days").alias("first_ship_days"),
        F.max("ship_days").alias("last_ship_days"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q08_SQL = """
SELECT o_orderkey AS order_id,
  min(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS first_ship_days,
  max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS last_ship_days,
  count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
"""


# --------------------------------------------------------------------- q09

def q09_left_join_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: validation LEFT join (reference: orders_cleaned.sql:372-373;
    validity rule :308-314 — customer exists AND not soft-deleted;
    stand-in rule: account balance non-negative). The customer side is
    broadcast — no shuffle of the fact table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("order_total"),
        (F.col("c_custkey").isNotNull() & (F.col("c_acctbal") >= 0)).alias("is_valid_order"),
    )


Q09_SQL = """
SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       o_totalprice AS order_total,
       (c_custkey IS NOT NULL AND c_acctbal >= 0) AS is_valid_order
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------- q10

def q10_group_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A6: single-pass grouped multi-aggregate (reference:
    dim_customer.sql:33-59: 14 aggregates incl. conditional distinct
    counts and date-trunc distinct). One hash-agg shuffle; all
    aggregates share it."""
    o = _t(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,2)")
    return o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("lifetime_orders"),
        _money_out(F.sum(_money("o_totalprice"))).alias("lifetime_value"),
        _money_out(
            cleaning.round_money(F.sum(_money("o_totalprice")).cast("double") / F.count(F.lit(1)))
        ).alias("avg_order_value"),
        F.min("o_orderdate").alias("first_order_date"),
        F.max("o_orderdate").alias("last_order_date"),
        F.countDistinct(F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))).alias("fulfilled_orders"),
        _money_out(
            F.sum(F.when(F.col("o_orderstatus") == "F", _money("o_totalprice")).otherwise(zero))
        ).alias("fulfilled_revenue"),
        F.countDistinct(F.date_trunc("month", F.col("o_orderdate"))).alias("active_months"),
    )


Q10_SQL = """
SELECT o_custkey AS customer_id,
  count(DISTINCT o_orderkey) AS lifetime_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
  CAST(round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DECIMAL(18,6)), 2) AS DOUBLE) AS avg_order_value,
  CAST(min(o_orderdate) AS TIMESTAMP) AS first_order_date,
  CAST(max(o_orderdate) AS TIMESTAMP) AS last_order_date,
  count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS fulfilled_orders,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2))
           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS fulfilled_revenue,
  count(DISTINCT date_trunc('month', o_orderdate)) AS active_months
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------- q11

def q11_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+F12+F18: RFM scoring with injected as_of (reference:
    dim_customer.sql:51 days_since_last_order; :173-198 RFM CASE
    ladders; :81-86 customer tier). as_of = 2001-12-31 (deterministic,
    SURVEY §7.4)."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("lifetime_orders"),
        _money_out(F.sum(_money("o_totalprice"))).alias("lifetime_value"),
        F.max("o_orderdate").alias("last_order_date"),
    )
    m = m.withColumn("recency_days", F.datediff(dates.as_of_lit(AS_OF), F.col("last_order_date")))
    s = scoring.rfm_scores(F.col("recency_days"), F.col("lifetime_orders"), F.col("lifetime_value"))
    return m.select(
        "customer_id", "lifetime_orders", "lifetime_value", "recency_days",
        s["recency_score"].alias("recency_score"),
        s["frequency_score"].alias("frequency_score"),
        s["monetary_score"].alias("monetary_score"),
        scoring.customer_tier(F.col("lifetime_value"), F.col("lifetime_orders")).alias("customer_tier"),
    )


Q11_SQL = """
WITH m AS (
  SELECT o_custkey AS customer_id,
    count(DISTINCT o_orderkey) AS lifetime_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
    date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-12-31') AS recency_days
  FROM orders GROUP BY o_custkey
)
SELECT customer_id, lifetime_orders, lifetime_value, recency_days,
  CASE WHEN recency_days <= 30 THEN 5 WHEN recency_days <= 90 THEN 4
       WHEN recency_days <= 180 THEN 3 WHEN recency_days <= 365 THEN 2 ELSE 1 END AS recency_score,
  CASE WHEN lifetime_orders >= 20 THEN 5 WHEN lifetime_orders >= 10 THEN 4
       WHEN lifetime_orders >= 5 THEN 3 WHEN lifetime_orders >= 2 THEN 2 ELSE 1 END AS frequency_score,
  CASE WHEN lifetime_value >= 5000 THEN 5 WHEN lifetime_value >= 2000 THEN 4
       WHEN lifetime_value >= 500 THEN 3 WHEN lifetime_value >= 100 THEN 2 ELSE 1 END AS monetary_score,
  CASE WHEN lifetime_value >= 10000 AND lifetime_orders >= 20 THEN 'PLATINUM'
       WHEN lifetime_value >= 5000 AND lifetime_orders >= 10 THEN 'GOLD'
       WHEN lifetime_value >= 1000 AND lifetime_orders >= 5 THEN 'SILVER'
       ELSE 'BRONZE' END AS customer_tier
FROM m
"""


# --------------------------------------------------------------------- q12

def q12_multi_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+J3+F16: multi-way dimension assembly with COALESCE defaults
    (reference: dim_customer.sql:210-214 4-way LEFT join; :149-161
    metric defaults). Dims (nation, region) broadcast; the metrics
    join shuffles on customer_id only."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey")).agg(
        F.countDistinct("o_orderkey").alias("_orders"),
        F.sum(_money("o_totalprice")).alias("_value"),
    )
    geo = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left").select(
        "n_nationkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region_name")
    )
    j = (
        c.join(F.broadcast(geo), c.c_nationkey == geo.n_nationkey, "left")
        .join(m, c.c_custkey == m.o_custkey, "left")
    )
    return j.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        "nation",
        "region_name",
        F.coalesce(F.col("_orders"), F.lit(0)).alias("lifetime_orders"),
        _money_out(F.coalesce(F.col("_value"), F.lit(0).cast("decimal(18,2)"))).alias("lifetime_value"),
        F.col("c_mktsegment").alias("market_segment"),
    )


Q12_SQL = """
WITH m AS (
  SELECT o_custkey, count(DISTINCT o_orderkey) AS _orders,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS _value
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey AS customer_id, c_name AS customer_name,
       n_name AS nation, r_name AS region_name,
       coalesce(_orders, 0) AS lifetime_orders,
       CAST(coalesce(_value, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
       c_mktsegment AS market_segment
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
LEFT JOIN m ON c_custkey = m.o_custkey
"""


# --------------------------------------------------------------------- q13

def q13_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+A8: incremental high-watermark predicate (reference:
    customers_latest.sql:41-49: ``_cdc_timestamp > (SELECT COALESCE(
    MAX(last_updated_at), fallback) FROM {{this}})``). Prior snapshot
    simulated as events before EVENTS_CUT; the scalar is collected on
    the driver and injected as a pushed-down literal predicate."""
    e = _t(spark, sf_dir, "events")
    prev = e.filter(F.col("ts") < F.lit(EVENTS_CUT))
    wm = incremental.high_watermark(prev, "ts", WATERMARK_DEFAULT)
    return incremental.watermark_filter(e, "ts", wm).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


Q13_SQL = """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM events
WHERE ts > (
  SELECT coalesce(max(ts), TIMESTAMP '1900-01-01')
  FROM events WHERE ts < TIMESTAMP '2024-01-20'
)
"""


# --------------------------------------------------------------------- q14

def q14_first_seen_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 de-correlated: first-seen backfill across incremental runs
    (reference: orders_cleaned.sql:350-360, customers_latest.sql:123-140).
    Prior snapshot = per-user min(ts) before EVENTS_CUT; batch = the
    latest state per user at/after the cut; first_seen_at falls back
    to the batch row's own first appearance for brand-new users."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    prev_snapshot = (
        e.filter(F.col("ts") < F.lit(EVENTS_CUT))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen_at"))
    )
    batch_state = (
        e.filter(F.col("ts") >= F.lit(EVENTS_CUT))
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"), F.min("ts").alias("ts"))
    )
    backfilled = incremental.first_seen_backfill(batch_state, prev_snapshot, "user_id", "ts")
    return backfilled.select("user_id", "last_ts", "first_seen_at")


Q14_SQL = """
WITH prev AS (
  SELECT user_id, min(ts) AS prior_first FROM events
  WHERE ts < TIMESTAMP '2024-01-20' GROUP BY user_id
),
batch AS (
  SELECT user_id, max(ts) AS last_ts, min(ts) AS batch_first FROM events
  WHERE ts >= TIMESTAMP '2024-01-20' GROUP BY user_id
)
SELECT b.user_id, CAST(b.last_ts AS TIMESTAMP) AS last_ts, CAST(coalesce(p.prior_first, b.batch_first) AS TIMESTAMP) AS first_seen_at
FROM batch b LEFT JOIN prev p ON b.user_id = p.user_id
"""


# --------------------------------------------------------------------- q15

def q15_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: weighted data-quality score from boolean completeness flags
    (reference: dim_customer.sql:118-122 — weights .4/.3/.3)."""
    c = _t(spark, sf_dir, "customer")
    has_name = cleaning.non_empty("c_name")
    has_seg = cleaning.non_empty("c_mktsegment")
    pos_bal = F.col("c_acctbal") > 0
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        has_name.alias("has_name"),
        has_seg.alias("has_segment"),
        pos_bal.alias("has_positive_balance"),
        scoring.weighted_quality_score([(has_name, 0.4), (has_seg, 0.3), (pos_bal, 0.3)]).alias(
            "quality_score"
        ),
    )


Q15_SQL = """
SELECT c_custkey AS customer_id,
  (c_name IS NOT NULL AND trim(c_name) != '') AS has_name,
  (c_mktsegment IS NOT NULL AND trim(c_mktsegment) != '') AS has_segment,
  (c_acctbal > 0) AS has_positive_balance,
  round(CAST(c_name IS NOT NULL AND trim(c_name) != '' AS INT) * CAST(0.4 AS DOUBLE)
      + CAST(c_mktsegment IS NOT NULL AND trim(c_mktsegment) != '' AS INT) * CAST(0.3 AS DOUBLE)
      + CAST(c_acctbal > 0 AS INT) * CAST(0.3 AS DOUBLE), 2) AS quality_score
FROM customer
"""


# --------------------------------------------------------------------- q16

def q16_geo_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: geographic mapping (reference: dim_customer.sql:63-73
    country -> business region CASE) via the real region/nation dims +
    a vocabulary CASE on region name. Both dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    geo = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
    j = c.join(F.broadcast(geo), c.c_nationkey == geo.n_nationkey, "left")
    business_region = (
        F.when(F.col("r_name") == "AMERICA", "North America")
        .when(F.col("r_name") == "EUROPE", "Europe")
        .when(F.col("r_name").isin("ASIA", "MIDDLE EAST"), "Asia Pacific")
        .otherwise("Other")
    )
    return j.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region_name"),
        business_region.alias("business_region"),
    )


Q16_SQL = """
SELECT c_custkey AS customer_id, n_name AS nation, r_name AS region_name,
  CASE WHEN r_name = 'AMERICA' THEN 'North America'
       WHEN r_name = 'EUROPE' THEN 'Europe'
       WHEN r_name IN ('ASIA', 'MIDDLE EAST') THEN 'Asia Pacific'
       ELSE 'Other' END AS business_region
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


# --------------------------------------------------------------------- q17

def q17_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: merge/upsert semantics (reference: incremental_strategy=
    'merge' + unique_key, customers_latest.sql:3-6) as anti-join+union:
    prior snapshot = latest event per user before the cut; batch =
    latest at/after the cut; merged = prev rows whose key is absent
    from the batch + all batch rows."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    prev = dedup.latest_by_key(
        e.filter(F.col("ts") < F.lit(EVENTS_CUT)), "user_id", order_by=("ts", "event_id")
    )
    batch = dedup.latest_by_key(
        e.filter(F.col("ts") >= F.lit(EVENTS_CUT)), "user_id", order_by=("ts", "event_id")
    )
    return incremental.merge_upsert(prev, batch, "user_id").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


Q17_SQL = """
WITH prev AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
    FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1
),
batch AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
    FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1
)
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM prev
WHERE user_id NOT IN (SELECT user_id FROM batch)
UNION ALL
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM batch
"""


# --------------------------------------------------------------------- q18

def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: semi-structured column access — parse events.props JSON to a
    typed struct, extract + aggregate. from_json is a codegen'd
    built-in (no UDF)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.withColumn("_p", F.from_json(F.col("props"), "k INT"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(F.col("_p.k")), 4).alias("avg_k"),
        F.max(F.col("_p.k")).alias("max_k"),
    )


Q18_SQL = """
SELECT event_type, count(*) AS n_events,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------- q19

def q19_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact text dedup keeping the lowest doc_id per text
    (min_by hash aggregate — see operators/dedup.py; at 100 TB the
    groupBy key would be fingerprint(text), 8 bytes, not the text)."""
    d = _t(spark, sf_dir, "documents")
    out = dedup.exact_dedup(d, "text", keep_min="doc_id")
    return out.select("doc_id", "text", "lang", "source", "n_chars")


Q19_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn FROM documents
) WHERE rn = 1
"""


# --------------------------------------------------------------------- q20

def q20_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash+LSH near-duplicate pairs. Fully oracle-checked:
    the portable hasher (md5 -> 60-bit -> affine salts mod 2^31-1) is
    reproduced bit-for-bit by the DuckDB SQL in _q20_sql(). See
    operators/text.py:minhash_near_dup_pairs for the scale notes.

    The repartition spreads the CPU-heavy shingle+signature stage
    across all cores — the documents table arrives as one small
    parquet split locally, which would otherwise serialize the whole
    hash pipeline on a single task (at 100 TB the scan has thousands
    of splits and the repartition is a no-op cost-wise)."""
    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    return text.minhash_near_dup_pairs(d, threshold=0.5)


from product_analytics_spark.qcommon import _hash60_sql  # noqa: E402


def _hex15_parse_sql(s: str) -> str:
    """DuckDB expression parsing a 15-hex-char string (a lambda
    variable or cheap attribute — re-referenced 15 times, so it must
    not be an expensive expression) into a non-negative BIGINT."""
    return (
        "CAST(list_sum(list_transform(generate_series(1,15), i -> "
        f"CAST(strpos('0123456789abcdef', substring({s}, i, 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << (4*(15-i))))) AS BIGINT)"
    )


def _shingle_fold_cte(ng: int, extra_cols: str = "") -> str:
    """CTE chain tok -> th -> shl reproducing text.shingle_hashes31:
    per-token md5 hash60 mod P31, affine-folded over ``ng``-grams
    (h = (h_prev * BAND_FOLD_A + th[i]) % P31); documents with fewer
    than ``ng`` tokens fall back to one hash of the trimmed text.
    ``shl`` emits (doc_id[, extra_cols], hv). md5 runs in its own
    list_transform so each token is digested ONCE; the hex parse
    re-references only the 15-char lambda variable."""
    p = text.P31
    acc = "h[i]"
    for r in range(1, ng):
        acc = f"(({acc}) * {text.BAND_FOLD_A} + h[i+{r}]) % {p}"
    cols = f"doc_id{', ' + extra_cols if extra_cols else ''}"
    return f"""tok AS (
  SELECT {cols}, regexp_split_to_array(trim(text), '\\s+') AS t, trim(text) AS tt
  FROM documents
),
th AS (SELECT {cols},
       list_transform(list_transform(t, x -> substring(md5(x), 1, 15)),
                      s -> {_hex15_parse_sql('s')} % {p}) AS h,
       len(t) AS n, tt FROM tok),
shl AS (
  SELECT {cols}, unnest(CASE WHEN n >= {ng}
    THEN list_transform(generate_series(1, n - {ng - 1}), i -> {acc})
    ELSE [{_hash60_sql('tt')} % {p}] END) AS hv
  FROM th
)"""


def _q20_sql(num_hashes: int = 32, bands: int = 8, threshold: float = 0.5) -> str:
    """Oracle for q20: the same MinHash+LSH pipeline in DuckDB SQL.

    Naive per-document formulation (token-fold shingle hashes, 32
    aggregate mins, band UNION ALL) — output-identical to the Spark
    operator because every hash is the same integer on both engines."""
    p = text.P31
    a_s, b_s = text.minhash_salts(num_hashes)
    rpb = num_hashes // bands
    sig_cols = ", ".join(
        f"min(({a_s[i]} * hv + {b_s[i]}) % {p}) AS s{i}" for i in range(num_hashes)
    )

    def band_expr(b: int) -> str:
        acc = f"CAST({b} AS BIGINT)"
        for r in range(rpb):
            acc = f"(({acc}) * {text.BAND_FOLD_A} + s{b * rpb + r}) % {p}"
        return acc

    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, {band_expr(b)} AS bh FROM sig" for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
WITH {_shingle_fold_cte(3)},
sig AS (SELECT doc_id, {sig_cols} FROM shl GROUP BY doc_id),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, est_jaccard FROM (
  SELECT id_a, id_b, round(({agree}) / {float(num_hashes)}, 4) AS est_jaccard
  FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id
) WHERE est_jaccard >= {threshold}
"""


# --------------------------------------------------------------------- q21

PROBE_VEC_ID = 0

#: Dimensionality of the embeddings table (TESTDATA.md) — known at
#: plan time, which lets pairwise operators unroll their dot products.
EMBEDDING_DIM = 64


def q21_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: brute-force cosine top-k against a probe vector (the
    embedding of vec_id=0). zip_with/aggregate array math (JVM-side) +
    TakeOrderedAndProject (distributed top-k, no global sort)."""
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").first()[0]
    others = emb.filter(F.col("vec_id") != PROBE_VEC_ID)
    return similarity.cosine_topk(others, probe, k=TOPK_K)


Q21_SQL = f"""
WITH probe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), p)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(p, p))), 4) AS cosine_sim
FROM embeddings, probe
WHERE vec_id != {PROBE_VEC_ID}
ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]), p)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(p, p))) DESC, vec_id
LIMIT {TOPK_K}
"""


# --------------------------------------------------------------------- q22

def q22_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: text statistics rollup per language — token counts via
    split, char counts, averages. All built-in string/array functions.
    """
    d = _t(spark, sf_dir, "documents")
    toks = text.token_count(F.col("text"))
    per_doc = d.select("lang", toks.alias("n_tokens"), F.length("text").alias("n_chars_calc"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars_calc"), 4).alias("avg_chars"),
    )


Q22_SQL = """
SELECT lang, count(*) AS n_docs,
  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
  round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens,
  round(avg(length(text)), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------- q23

def q23_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] gap-based sessionization (SURVEY §2.9): lag + gap flag +
    running sum; single shuffle serves both window passes. Streaming
    twin: F.session_window in streaming/."""
    e = _t(spark, sf_dir, "events")
    return windows.session_metrics(e, gap_minutes=SESSION_GAP_MIN)


Q23_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, CAST(min(ts) AS TIMESTAMP) AS session_start, CAST(max(ts) AS TIMESTAMP) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------- q24

def q24_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] tumbling event-time window aggregation (F.window is
    epoch-aligned -> equals date_trunc('hour')). Streaming twin:
    readStream + withWatermark + the same window in streaming/."""
    e = _t(spark, sf_dir, "events")
    return windows.tumbling_window_agg(e, duration="1 hour", group_cols=("event_type",))


Q24_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q25

def q25_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 variant: SimHash near-dup pairs with chunked-pigeonhole
    blocking. Fully oracle-checked: the portable 60-bit token hash
    (md5-based) and the bitwise-majority simhash are reproduced
    exactly by the DuckDB SQL in _q25_sql(). See operators/text.py:
    simhash_near_dup_pairs for the 100 TB notes."""
    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    return text.simhash_near_dup_pairs(d, hamming_max=8)


def _q25_sql(bits: int = 60, n_chunks: int = 4, hamming_max: int = 8) -> str:
    """Oracle for q25: portable SimHash + chunk blocking in DuckDB.

    votes: per bit j, sum over tokens of +-1 on bit j of the portable
    60-bit token hash; packed: set bit j where the vote is positive;
    chunks: 4x15-bit slices; candidates: equi-join on (chunk_idx,
    value); verify: bit_count(xor) <= hamming_max."""
    bits_per = bits // n_chunks
    mask = (1 << bits_per) - 1
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    chunks_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {c} AS chunk_idx, (sh >> {c * bits_per}) & {mask} AS cv FROM sh"
        for c in range(n_chunks)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
),
th AS (SELECT doc_id, {_hash60_sql('w')} AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
sh AS (SELECT doc_id, {packed} AS sh FROM votes),
chunks AS ({chunks_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM chunks a JOIN chunks b ON a.chunk_idx = b.chunk_idx AND a.cv = b.cv
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INT) AS hamming
FROM cand JOIN sh sa ON cand.id_a = sa.doc_id JOIN sh sb ON cand.id_b = sb.doc_id
WHERE bit_count(xor(sa.sh, sb.sh)) <= {hamming_max}
"""


# --------------------------------------------------------------------- q26

NGRAM_JACCARD_THRESHOLD = 0.4


def q26_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 variant: exact word-3-gram Jaccard near-dup pairs with
    MinHash-band candidate blocking (operators/text.py:
    jaccard_near_dup_pairs). Round 1 blocked on (lang, first token) —
    a content-derived key whose biggest block ("the") grows linearly
    with the corpus, making the within-block join quadratic and
    skewed. Band-hash buckets only collect genuinely similar docs, so
    bucket size tracks duplicate-cluster size, not corpus size. The
    banding and the exact-Jaccard verify are reproduced bit-for-bit
    by the DuckDB oracle (portable md5-based hashing)."""
    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    return text.jaccard_near_dup_pairs(d, threshold=NGRAM_JACCARD_THRESHOLD)


def _q26_sql(num_hashes: int = 32, bands: int = 16) -> str:
    """Oracle for q26: identical MinHash banding for candidates, then
    exact Jaccard over the distinct token-fold shingle-hash sets."""
    p = text.P31
    a_s, b_s = text.minhash_salts(num_hashes)
    rpb = num_hashes // bands
    sig_cols = ", ".join(
        f"min(({a_s[i]} * hv + {b_s[i]}) % {p}) AS s{i}" for i in range(num_hashes)
    )

    def band_expr(b: int) -> str:
        acc = f"CAST({b} AS BIGINT)"
        for r in range(rpb):
            acc = f"(({acc}) * {text.BAND_FOLD_A} + s{b * rpb + r}) % {p}"
        return acc

    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, {band_expr(b)} AS bh FROM sig" for b in range(bands)
    )
    return f"""
WITH {_shingle_fold_cte(3)},
sets AS (SELECT doc_id, list(DISTINCT hv) AS hs FROM shl GROUP BY doc_id),
sig AS (SELECT doc_id, {sig_cols} FROM shl GROUP BY doc_id),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         round(len(list_intersect(sa.hs, sb.hs))
               / CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE), 4) AS jaccard
  FROM cand JOIN sets sa ON cand.id_a = sa.doc_id JOIN sets sb ON cand.id_b = sb.doc_id
) WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------- q27

NEAR_DUP_PAIRS_K = 20


NEAR_DUP_CAP_PER_CELL = 256


def q27_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3: embedding-cosine near-dup candidates — top-k most
    similar pairs blocked by IVF cell (32-cell codebook) with a
    deterministic per-cell cap. Round 1 blocked on ``label``, which is
    quadratic-per-block at scale (block count fixed by the domain);
    IVF cell count is an operator dial, so per-cell pair work stays
    bounded as the corpus grows. See
    operators/similarity.py:embedding_near_dup_pairs_ivf. (No
    repartition needed: the heavy within-cell pair stage runs after
    the window/join shuffle on the cell key, which already spreads it
    across cores; the codebook scoring folds into the scan.)"""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs_ivf(
        emb,
        centroids=similarity.CENTROIDS_FINE,
        k=NEAR_DUP_PAIRS_K,
        cap_per_cell=NEAR_DUP_CAP_PER_CELL,
        dim=EMBEDDING_DIM,
    )


def _ivf_cell_ctes(cents) -> str:
    """Shared oracle fragment: CTEs ``v``(vec_id, e) -> ``cw``(vec_id,
    e, cell) reproducing operators/similarity.py:ivf_cell — argmax of
    2*v.c - ||c||^2 over plan-time centroid literals, lowest cell id
    on ties."""
    lits = ["[" + ",".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents]
    scores = ", ".join(
        f"(2.0*list_dot_product(e, {lits[i]}) - {sum(x * x for x in cents[i])!r}) AS s_{i}"
        for i in range(len(cents))
    )
    g = "greatest(" + ",".join(f"s_{i}" for i in range(len(cents))) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN s_{i} = g THEN {i}" for i in range(len(cents)))
        + " END"
    )
    return f"""
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id, e, {scores} FROM v),
cw AS (SELECT vec_id, e, {case} AS cell
       FROM (SELECT *, {g} AS g FROM s))"""


def _q27_sql() -> str:
    return f"""
WITH {_ivf_cell_ctes(similarity.CENTROIDS_FINE)},
capped AS (
  SELECT vec_id, e, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM cw
  ) WHERE rn <= {NEAR_DUP_CAP_PER_CELL}
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS sim
  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 4) AS cosine_sim
FROM pairs ORDER BY sim DESC, id_a, id_b LIMIT {NEAR_DUP_PAIRS_K}
"""


# --------------------------------------------------------------------- q28

def q28_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: ANN top-k restricted to the probe's
    sign-random-projection bucket (16 fixed Rademacher hyperplanes →
    plan-time literals; deterministic, so the oracle reproduces the
    exact bucketing arithmetic). At 100 TB the table is written
    partitioned by lsh_bucket → bucket scan is partition-pruned."""
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").first()[0]
    others = emb.filter(F.col("vec_id") != PROBE_VEC_ID)
    return similarity.cosine_topk_lsh(
        others, probe, similarity.DEFAULT_PLANES, k=TOPK_K
    )


def _q28_sql() -> str:
    planes_sql = ",".join(
        "[" + ",".join(repr(x) for x in p) + "]::DOUBLE[]" for p in similarity.DEFAULT_PLANES
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(e, pl[{i + 1}]) > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(len(similarity.DEFAULT_PLANES))
    )
    return f"""
WITH pl_t AS (SELECT [{planes_sql}] AS pl),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e, {bucket_expr} AS bucket
      FROM embeddings, pl_t),
probe AS (SELECT e AS p, bucket AS pb FROM v WHERE vec_id = {PROBE_VEC_ID})
SELECT vec_id,
       round(list_dot_product(e, p)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(p, p))), 4) AS cosine_sim
FROM v, probe
WHERE vec_id != {PROBE_VEC_ID} AND bucket = pb
ORDER BY list_dot_product(e, p)
         / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(p, p))) DESC, vec_id
LIMIT {TOPK_K}
"""


# --------------------------------------------------------------------- q29

def q29_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: marker-token language-ID heuristic — confusion matrix of
    (labelled lang, predicted lang). Scoring is pure array expression
    work (lower/filter/array_contains); argmax with alphabetical-first
    tie-break, 'und' when no marker hits."""
    d = _t(spark, sf_dir, "documents")
    return (
        text.with_language_id(d, "text", "pred_lang")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q29_sql() -> str:
    score_cols = []
    for lang, markers in sorted(text.LANG_MARKERS.items()):
        lst = ",".join(f"'{m}'" for m in markers)
        score_cols.append(f"len(list_filter(toks, w -> list_contains([{lst}], w))) AS s_{lang}")
    langs = sorted(text.LANG_MARKERS)
    g = "greatest(" + ",".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs)
    return f"""
WITH t AS (
  SELECT lang, list_transform(regexp_split_to_array(trim(text), '\\s+'), w -> lower(w)) toks
  FROM documents
),
s AS (SELECT lang, {", ".join(score_cols)} FROM t),
p AS (SELECT lang, CASE WHEN {g} = 0 THEN 'und' {case} END AS pred_lang FROM s)
SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY lang, pred_lang
"""


# --------------------------------------------------------------------- q30

def q30_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-document quality scoring — token/char stats, punct &
    stopword ratios (operators/text.py:text_quality_flags), BPE-style
    pre-token count, and a weighted keep/drop score. The score is
    recomputed from the 4-dp-rounded ratios so Spark and the oracle
    combine identical inputs (no float drift)."""
    d = _t(spark, sf_dir, "documents")
    flagged = text.text_quality_flags(d)
    q = F.round(
        F.lit(0.4) * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
        + F.lit(0.3) * F.when(F.col("n_tokens").between(10, 1000), 1.0).otherwise(0.0)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 10, F.lit(1.0))),
        4,
    )
    return flagged.select(
        "doc_id",
        "n_tokens",
        text.bpe_ish_tokens(F.col("text")).alias("_bpe"),
        "mean_token_len",
        "punct_ratio",
        "stopword_ratio",
        q.alias("quality_score"),
        (q >= 0.5).alias("keep"),
    ).withColumn("n_bpe_tokens", F.size("_bpe")).drop("_bpe")


Q30_SQL = r"""
WITH base AS (
  SELECT doc_id, text,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             w -> list_contains(['the','a','of','and','to','in','is'], lower(w)))) AS n_stop,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tokens, n_bpe_tokens,
         round(CASE WHEN n_tokens > 0 THEN n_nonspace / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 4) AS mean_token_len,
         round(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 4) AS punct_ratio,
         round(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 4) AS stopword_ratio
  FROM base
)
SELECT doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
       round(0.4 * least(stopword_ratio * 5, 1.0)
             + 0.3 * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             + 0.3 * (1.0 - least(punct_ratio * 10, 1.0)), 4) AS quality_score,
       (round(0.4 * least(stopword_ratio * 5, 1.0)
              + 0.3 * (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
              + 0.3 * (1.0 - least(punct_ratio * 10, 1.0)), 4) >= 0.5) AS keep,
       n_bpe_tokens
FROM ratios
"""


# --------------------------------------------------------------------- q31

def q31_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4: content-fingerprint dedup groups — xxhash64 of
    normalized text (lowercase, whitespace-collapsed) is the 8-byte
    group key, so the shuffle moves hashes, not documents. Output is
    hash-free (keep_id / counts), which is exactly why it has a full
    oracle: DuckDB groups by the normalized string itself and must
    land on identical groups."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(text.fingerprint(F.col("text")).alias("_fp"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select("keep_id", "n_docs", "total_chars")
    )


Q31_SQL = r"""
SELECT min(doc_id) AS keep_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
"""


# --------------------------------------------------------------------- q32

MEDIA_CHUNK_BYTES = 256


def q32_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing e2e: documents.text wrapped as an opaque
    binary payload + typed metadata struct, then Arrow-batched
    mapInPandas feature extraction (operators/multimodal.py; decode
    itself is stubbed — deterministic byte-moment fake). The oracle
    checks the deterministic outputs (sizes/chunking/status); the
    checksum & fake feature vector are covered by unit tests."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_payload(d, "doc_id", "text")
    feats = multimodal.extract_features(media, chunk_bytes=MEDIA_CHUNK_BYTES)
    return feats.select("media_id", "n_bytes", "n_chunks", "status")


Q32_SQL = f"""
SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(ceil(length(text) / {MEDIA_CHUNK_BYTES}.0) AS INT) AS n_chunks,
       'ok' AS status
FROM documents
"""


# ----------------------------------------------------------------- registry

# --------------------------------------------------------------------- q33

def q33_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface grouping sets (SURVEY §2.5 notes the reference
    has none — the engine provides them): ROLLUP over
    (l_returnflag, l_linestatus) with subtotal and grand-total rows.
    Catalyst expands grouping sets map-side; same single partial-agg
    shuffle as a flat groupBy."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        # Money as exact integer cents, projected BEFORE the grouping-set
        # Expand: (a) the decimal round happens once per input row, not
        # once per expanded copy; (b) SUM(long) stays in whole-stage
        # codegen where SUM(decimal(18,2)) needs precision-28 BigDecimal
        # adds (measured 2.2s -> 0.6s at sf0.1). cents/100.0 is
        # bit-identical to CAST(sum(decimal) AS DOUBLE): both round the
        # same exact rational to double once (sums are far below 2^53).
        _money_cents("l_quantity").alias("qty_c"),
        _money_cents("l_extendedprice").alias("price_c"),
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _cents_out(F.sum("qty_c")).alias("sum_qty"),
        _cents_out(F.sum("price_c")).alias("sum_price"),
    )


Q33_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------- q34

TOPK_PER_GROUP = 3


def q34_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface ranked top-k per group (generic form of W1's
    window machinery): highest-value orders per priority class.
    row_number with a deterministic (totalprice DESC, orderkey ASC)
    tie-break; one shuffle on the group key, rank computed
    in-partition."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= TOPK_PER_GROUP)
        .select(
            F.col("o_orderpriority").alias("order_priority"),
            F.col("rank_in_priority"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("order_total"),
        )
    )


Q34_SQL = f"""
SELECT o_orderpriority AS order_priority, rn AS rank_in_priority,
       o_orderkey AS order_id, o_totalprice AS order_total
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= {TOPK_PER_GROUP}
"""


# --------------------------------------------------------------------- q35

def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface backward as-of join (operators/joins.py): each
    event picks up the latest signup event of the same user at or
    before its timestamp — the state-at-time-of-event join Spark has
    no primitive for. Union+window form: ONE shuffle on user_id, no
    range-join row explosion (see joins.py scale notes)."""
    from product_analytics_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        e,
        signups,
        key_cols=("user_id",),
        left_ts="ts",
        right_ts="ts",
        value_cols=("event_id",),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("signup_ts"),
        F.col("event_id_asof").alias("signup_event_id"),
    )


Q35_SQL = """
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS sev
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts, s.sev AS signup_event_id
FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
"""


# --------------------------------------------------------------------- q36

def q36_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] sliding event-time windows (1 h window, 15 min slide —
    SURVEY §2.9): each event lands in 4 overlapping windows.
    F.window expands the windows map-side; one partial-agg shuffle on
    the window key, same as tumbling (q24)."""
    e = _t(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


Q36_SQL = """
WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
k AS (SELECT unnest([0, 1, 2, 3]) AS k),
w AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15 * k) AS window_start,
             ts, value
      FROM e, k)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM w WHERE ts < window_start + INTERVAL 60 MINUTE
GROUP BY window_start
"""


# --------------------------------------------------------------------- q37

def q37_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface set operations (SURVEY §2.7: none in the
    reference — the engine provides INTERSECT/EXCEPT/UNION via the
    DataFrame API): customers who ordered in both 1995 and 1996,
    minus those with any fulfilled ('F') 1996 order. Distinct set
    semantics; each branch prunes to one scan column."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("customer_id")
    )
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("customer_id")
    )
    f96 = o.filter(
        (F.year("o_orderdate") == 1996) & (F.col("o_orderstatus") == "F")
    ).select(F.col("o_custkey").alias("customer_id"))
    return y95.intersect(y96).subtract(f96)


Q37_SQL = """
SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey AS customer_id FROM orders
WHERE year(o_orderdate) = 1996 AND o_orderstatus = 'F'
"""


# --------------------------------------------------------------------- q38

def q38_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface pivot (wide conditional aggregation): order
    counts by priority x status with an explicit pivot value list —
    the explicit list keeps the plan a single-pass hash-agg (no
    values-discovery pre-scan) at any scale."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "order_priority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_fulfilled"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


Q38_SQL = """
SELECT o_orderpriority AS order_priority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------- q39

def q39_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2: IVF ANN top-k — coarse-quantizer cell
    assignment (argmin distance to a fixed 8-centroid codebook,
    computed as argmax of 2*v.c - ||c||^2), then brute-force cosine
    only inside the probe's cell. At 100 TB the table is written
    partitioned by ivf_cell -> probe lookups are partition-pruned
    scans of ~1/8 of the data (operators/similarity.py:cosine_topk_ivf
    for the nprobe recall dial)."""
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").first()[0]
    others = emb.filter(F.col("vec_id") != PROBE_VEC_ID)
    return similarity.cosine_topk_ivf(
        others, probe, similarity.DEFAULT_CENTROIDS, k=TOPK_K, n_probe_cells=1
    )


def _q39_sql() -> str:
    return f"""
WITH {_ivf_cell_ctes(similarity.DEFAULT_CENTROIDS)},
probe AS (SELECT e AS p, cell AS pcell FROM cw WHERE vec_id = {PROBE_VEC_ID})
SELECT vec_id,
       round(list_dot_product(e, p)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(p, p))), 4) AS cosine_sim
FROM cw, probe
WHERE vec_id != {PROBE_VEC_ID} AND cell = pcell
ORDER BY list_dot_product(e, p)
         / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(p, p))) DESC, vec_id
LIMIT {TOPK_K}
"""


# --------------------------------------------------------------------- q40

#: Warehouse dir for the write-path query — inside the repo (the
#: harness forbids writing elsewhere); tiny (one ~150-row snapshot).
Q40_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", ".q40_warehouse"
)


def q40_snapshot_merge_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S6+S7 exercised ON DISK (the round-1 gap: the write path had
    no driver-checked query): build the pre-cut snapshot, commit it
    through the SnapshotStore pointer protocol partitioned by
    event_type (S6) and clustered by user_id (S7 ZORDER analog), MERGE
    the post-cut batch into it (S4), and return the snapshot as read
    back from the committed parquet — so the oracle check covers the
    full write->commit->read round-trip, hive partition-column
    recovery included. Values must equal q17's in-memory merge."""
    import shutil as _sh

    from product_analytics_spark.sources.sinks import SnapshotStore

    _sh.rmtree(Q40_WAREHOUSE, ignore_errors=True)
    store = SnapshotStore(spark, Q40_WAREHOUSE)
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    prev = dedup.latest_by_key(
        e.filter(F.col("ts") < F.lit(EVENTS_CUT)), "user_id", order_by=("ts", "event_id")
    )
    batch = dedup.latest_by_key(
        e.filter(F.col("ts") >= F.lit(EVENTS_CUT)), "user_id", order_by=("ts", "event_id")
    )
    store.overwrite("users_latest", prev, partition_by=("event_type",), cluster_by=("user_id",))
    merged = store.merge(
        "users_latest", batch, "user_id", partition_by=("event_type",), cluster_by=("user_id",)
    )
    return merged.select("user_id", "event_id", "ts", "event_type", "value")


Q40_SQL = Q17_SQL  # same merge semantics; q40 additionally round-trips disk.


# --------------------------------------------------------------------- q41

def q41_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface exact percentile aggregation (SURVEY §2.5 notes
    the reference has none): p25/p50/p75/p90 of extended price per
    return flag. F.percentile is Spark's exact linear-interpolation
    aggregate — same definition as DuckDB's quantile_cont, so values
    match bit-for-bit. At 100 TB swap for approx_percentile with a
    documented error bound (exact percentile needs a per-group sort);
    the API shape is identical."""
    li = _t(spark, sf_dir, "lineitem")
    # One percentile aggregate with an array of fractions — a single
    # counting pass per group instead of four (4x less agg state).
    pcts = F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75, 0.9]))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), pcts.alias("_p")
    ).select(
        "l_returnflag",
        "n_rows",
        F.col("_p")[0].alias("p25"),
        F.col("_p")[1].alias("p50"),
        F.col("_p")[2].alias("p75"),
        F.col("_p")[3].alias("p90"),
    )


Q41_SQL = """
SELECT l_returnflag, count(*) AS n_rows,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       quantile_cont(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------- q42

def q42_running_and_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface analytic windows: per-customer running revenue
    (rows unbounded preceding), 3-order moving average, and previous
    order total (lag). Deterministic (order_date, order_id) ordering;
    the running sum accumulates DECIMAL (exact at any partitioning)
    and casts to double at the edge. One shuffle on customer_id
    serves all three window functions."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-2, 0)
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("order_total"),
        _money_out(F.sum(_money("o_totalprice")).over(run)).alias("running_revenue"),
        F.round(F.avg(F.col("o_totalprice")).over(mov), 4).alias("moving_avg_3"),
        F.lag("o_totalprice").over(w).alias("prev_order_total"),
    )


Q42_SQL = """
SELECT o_custkey AS customer_id, o_orderkey AS order_id,
       CAST(o_orderdate AS TIMESTAMP) AS order_date,
       o_totalprice AS order_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue,
       round(avg(o_totalprice)
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
       lag(o_totalprice)
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order_total
FROM orders
"""


# --------------------------------------------------------------------- q43

def q43_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface CUBE grouping sets — all four grouping
    combinations of (priority, status) in one pass. Like ROLLUP (q33),
    Catalyst expands grouping sets map-side: one partial-agg shuffle,
    not four scans."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        # Cents before the Expand — same reasoning as q33.
        _money_cents("o_totalprice").alias("price_c"),
    )
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _cents_out(F.sum("price_c")).alias("total_revenue"),
    )


Q43_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------------------------- q44

def q44_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface SEMI/ANTI joins: customers who ordered in 1995
    (left_semi) but never in 1996 (left_anti). Both join types ship
    only the left side's rows — no right-side columns ever shuffle to
    the output, and Spark plans them as existence joins (broadcast
    when the key set is small)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    k95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    k96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    out = (
        c.join(k95, c.c_custkey == k95.o_custkey, "left_semi")
        .join(k96, F.col("c_custkey") == k96.o_custkey, "left_anti")
    )
    return out.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
    )


Q44_SQL = """
SELECT c_custkey AS customer_id, c_name AS customer_name,
       c_mktsegment AS market_segment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND year(o.o_orderdate) = 1995)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND year(o.o_orderdate) = 1996)
"""


# --------------------------------------------------------------------- q45

def q45_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface UNPIVOT (wide -> long): melt the q38-style
    status-count matrix back into (priority, status, n) rows.
    DataFrame.unpivot expands map-side (one output row per id x value
    column) — no shuffle beyond the upstream aggregate."""
    wide = q38_pivot_counts(spark, sf_dir)
    long = wide.unpivot(
        ids=["order_priority"],
        values=["n_fulfilled", "n_open", "n_pending"],
        variableColumnName="status_bucket",
        valueColumnName="n_orders",
    )
    return long


Q45_SQL = """
WITH wide AS (
  SELECT o_orderpriority AS order_priority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
  FROM orders GROUP BY o_orderpriority
)
SELECT order_priority, 'n_fulfilled' AS status_bucket, n_fulfilled AS n_orders FROM wide
UNION ALL
SELECT order_priority, 'n_open', n_open FROM wide
UNION ALL
SELECT order_priority, 'n_pending', n_pending FROM wide
"""


# --------------------------------------------------------------------- q46

HIST_BUCKET_WIDTH = 50000.0
HIST_MAX_BUCKET = 9


def q46_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface fixed-width histogram: bucket order totals into
    50k-wide bins (top bin open-ended), count + bounds per bin. Pure
    arithmetic bucketing folds into the scan; one hash-agg shuffle of
    |buckets| rows."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(HIST_BUCKET_WIDTH)), F.lit(HIST_MAX_BUCKET)
    ).cast("int")
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )
    )


Q46_SQL = f"""
SELECT CAST(least(floor(o_totalprice / {HIST_BUCKET_WIDTH}), {HIST_MAX_BUCKET}) AS INT) AS bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS min_total,
       max(o_totalprice) AS max_total
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------- q47

def q47_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt generic-test surface (`dbt test`) as one engine query:
    not_null / unique / accepted_values / relationships checks over
    the orders+customer tables, aggregated to a (check, n_violations)
    report (see product_analytics_spark/validations.py). Each check
    reduces distributed to one row; the relationships check is an
    anti-join with a broadcastable parent side."""
    from product_analytics_spark import validations as V

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return V.quality_report(
        {
            "orders_custkey_not_null": V.not_null_violations(o, "o_custkey"),
            "orders_orderkey_unique": V.unique_violations(o, "o_orderkey"),
            "orders_status_accepted": V.accepted_values_violations(
                o, "o_orderstatus", ["F", "O", "P"]
            ),
            "orders_custkey_relationship": V.relationships_violations(
                o, "o_custkey", c, "c_custkey"
            ),
            "customer_custkey_unique": V.unique_violations(c, "c_custkey"),
        }
    )


Q47_SQL = """
SELECT 'orders_custkey_not_null' AS check, count(*) AS n_violations
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'orders_orderkey_unique', count(*) FROM (
  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders_status_accepted', count(*) FROM orders
WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O', 'P')
UNION ALL
SELECT 'orders_custkey_relationship', count(*) FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer_custkey_unique', count(*) FROM (
  SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1)
"""


# --------------------------------------------------------------------- q48

def q48_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: SCD Type-2 history build — dbt snapshot `strategy: check`
    semantics (the reference ships a snapshots/ directory for exactly
    this) over the events stream: one version row per (user,
    event_type-change), valid_from/valid_to interval bounds, NULL-open
    current rows. Two windows over ONE shuffle on user_id
    (operators/scd.py)."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    hist = scd.scd2_history(
        e, key_cols="user_id", ts_col="ts",
        tracked_cols="event_type", tiebreak_cols=("event_id",),
    )
    return hist.select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )


Q48_SQL = """
WITH h AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev, row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pts AS (SELECT * FROM h WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
SELECT user_id, event_type,
       CAST(ts AS TIMESTAMP) AS valid_from,
       CAST(lead(ts) OVER w2 AS TIMESTAMP) AS valid_to,
       lead(ts) OVER w2 IS NULL AS is_current
FROM pts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------- q49

SPLIT_SEP = "\x1f"


def _split_hash_sql(salt: str) -> str:
    """DuckDB expression for sampling.split_bucket: the portable 60-bit
    hash of doc_id + 0x1f + salt, mod SPLIT_BUCKETS."""
    e = f"CAST(doc_id AS VARCHAR) || chr(31) || '{salt}'"
    return f"({_hash60_sql(e)} % {sampling.SPLIT_BUCKETS})"


def q49_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: deterministic train/val/test split — membership is a pure
    function of a portable content hash of the key (survives reruns,
    repartitioning, engine swaps; zero shuffles for the assignment —
    operators/sampling.py). Output: per-(split, lang) doc counts and
    char volume."""
    d = sampling.with_hash_split(
        _t(spark, sf_dir, "documents"), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return d.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


Q49_SQL = f"""
WITH b AS (
  SELECT lang, n_chars, {_split_hash_sql('split')} AS bkt FROM documents
),
s AS (
  SELECT lang, n_chars,
         CASE WHEN bkt < 8000 THEN 'train'
              WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
  FROM b
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q50

STRATIFIED_FRACTION = 0.2


def q50_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: exact stratified sample — the ceil(0.2·|stratum|) docs with
    the smallest portable-hash rank per language. Rank + stratum-size
    windows share ONE shuffle on lang; the selected set is
    content-deterministic (operators/sampling.py scale notes: the
    hash-threshold form is the no-shuffle 100 TB default, this exact
    form is for eval sets where stratum proportions must be exact)."""
    d = sampling.stratified_exact_sample(
        _t(spark, sf_dir, "documents"), "lang", "doc_id", STRATIFIED_FRACTION
    )
    return d.select("doc_id", "lang")


Q50_SQL = f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_hash60_sql("CAST(doc_id AS VARCHAR) || chr(31) || 'stratum'")} ASC,
                    doc_id ASC) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang FROM r WHERE rnk <= ceil(n * {STRATIFIED_FRACTION})
"""


# --------------------------------------------------------------------- q51

VOCAB_K = 20


def q51_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: tokenizer-vocabulary build — top-k tokens by corpus
    frequency with doc-frequency. Explode stays map-side; the shuffle
    moves |distinct tokens| partial counts; top-k is
    TakeOrderedAndProject (operators/corpus.py)."""
    return corpus.vocab_topk(_t(spark, sf_dir, "documents"), k=VOCAB_K)


Q51_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {VOCAB_K}
"""


# --------------------------------------------------------------------- q52

def q52_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: PII scrubbing — phone + email regex masking with an audit
    count, pure regexp_replace chain at scan speed (operators/
    corpus.py). The synthetic customer table carries no PII column, so
    the query first derives a deterministic contact string (name +
    synthetic email + synthetic phone from the key) and then masks it
    — the oracle derives the identical string, so the masking and the
    audit count are fully value-checked."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        k % 90 + 10, k % 900 + 100, (k * 7) % 900 + 100, (k * 13) % 9000 + 1000,
    )
    contact = F.concat_ws(
        " ", F.col("c_name"),
        F.concat(F.lit("<user"), k.cast("string"), F.lit("@example.com>")),
        F.lit("tel:"), phone,
    )
    masked = corpus.mask_pii(
        c.withColumn("contact", contact), {"contact": "contact_masked"}
    )
    return masked.select(
        F.col("c_custkey").alias("customer_id"),
        "contact_masked",
        F.col("contact_masked_n_masked").alias("n_masked"),
    )


Q52_SQL = f"""
WITH raw AS (
  SELECT c_custkey,
         c_name || ' ' || '<user' || CAST(c_custkey AS VARCHAR) || '@example.com>'
           || ' tel: '
           || printf('%02d-%03d-%03d-%04d',
                     c_custkey % 90 + 10, c_custkey % 900 + 100,
                     (c_custkey * 7) % 900 + 100, (c_custkey * 13) % 9000 + 1000)
           AS contact
  FROM customer
)
SELECT c_custkey AS customer_id,
       regexp_replace(regexp_replace(contact, '{corpus.PHONE_RE}', '[PII]', 'g'),
                      '{corpus.EMAIL_RE}', '[PII]', 'g') AS contact_masked,
       CAST(len(regexp_extract_all(contact, '{corpus.PHONE_RE}'))
            + len(regexp_extract_all(
                regexp_replace(contact, '{corpus.PHONE_RE}', '[PII]', 'g'),
                '{corpus.EMAIL_RE}')) AS INT) AS n_masked
FROM raw
"""


# --------------------------------------------------------------------- q53

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def q53_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X26: context-window chunking — fixed 32-token windows with
    8-token overlap, final partial chunk kept. Entirely narrow
    (sequence+posexplode+slice, zero shuffles); document-length skew
    is bounded because every chunk slices at most 32 tokens
    (operators/corpus.py)."""
    return corpus.chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP,
    )


_Q53_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

Q53_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
n AS (SELECT doc_id, t, len(t) AS n FROM tok),
c AS (
  SELECT doc_id, t, n,
         unnest(generate_series(1,
           1 + GREATEST(CAST(ceil((n - {CHUNK_TOKENS}) / {float(_Q53_STEP)}) AS BIGINT), 0))) AS ci
  FROM n
)
SELECT doc_id, CAST(ci - 1 AS INT) AS chunk_idx,
       array_to_string(t[(ci-1)*{_Q53_STEP} + 1 : (ci-1)*{_Q53_STEP} + {CHUNK_TOKENS}], ' ') AS chunk_text,
       CAST(LEAST({CHUNK_TOKENS}, n - ((ci-1)*{_Q53_STEP} + 1) + 1) AS INT) AS n_tokens
FROM c
"""


# --------------------------------------------------------------------- q54

CONTAM_NGRAM = 8
BENCHMARK_SOURCE = "src1"


def q54_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: benchmark-decontamination screen — training docs sharing
    any 8-token shingle with a benchmark doc (here: source='src1'
    stands in for the eval set). Left-semi join on 8-byte portable
    shingle hashes; the benchmark hash set is eval-sized, so at scale
    the semi join broadcasts and the screen runs at scan speed
    (operators/corpus.py)."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == BENCHMARK_SOURCE)
    # Repartition AFTER the pushed-down filter so the CPU-dense shingle
    # explode+hash runs on every core — the driver's single-row-group
    # parquet otherwise pins the whole screen to one task (39s -> ~2s
    # at sf0.1). On a real cluster the scan parallelizes naturally and
    # this also pre-balances document-length skew across tasks.
    train = d.filter(F.col("source") != BENCHMARK_SOURCE).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    flagged = corpus.contamination_screen(train, bench, ngram=CONTAM_NGRAM)
    return flagged.join(d.select("doc_id", "lang"), "doc_id").select("doc_id", "lang")


def _q54_sql() -> str:
    return f"""
WITH {_shingle_fold_cte(CONTAM_NGRAM, extra_cols="source")},
bench AS (SELECT DISTINCT hv FROM shl WHERE source = '{BENCHMARK_SOURCE}')
SELECT DISTINCT s.doc_id, d.lang
FROM shl s JOIN documents d USING (doc_id)
WHERE s.source <> '{BENCHMARK_SOURCE}' AND s.hv IN (SELECT hv FROM bench)
"""


# --------------------------------------------------------------------- q55

def q55_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28: salted two-stage aggregation — the skew remedy for hot
    group keys (operators/skew.py: group on (key, salt) then re-merge
    partials on key; bit-identical to the direct form because every
    aggregate here is decomposable and the sums are DECIMAL-exact).
    The oracle is the DIRECT single-stage aggregation — passing proves
    the decomposition exact, not just close."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supplier_id"),
        _money("l_quantity").alias("qty_d"),
        _money("l_extendedprice").alias("price_d"),
    )
    r = skew.salted_agg(
        li,
        "supplier_id",
        {
            "n_items": ("count", "qty_d"),
            "sum_qty": ("sum", "qty_d"),
            "min_price": ("min", "price_d"),
            "max_price": ("max", "price_d"),
        },
        n_salts=16,
    )
    return r.select(
        "supplier_id",
        "n_items",
        _money_out(F.col("sum_qty")).alias("sum_qty"),
        _money_out(F.col("min_price")).alias("min_price"),
        _money_out(F.col("max_price")).alias("max_price"),
    )


Q55_SQL = """
SELECT l_suppkey AS supplier_id,
       count(l_quantity) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------- q56

def _dup_clusters_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-once cluster assignment (MinHash pairs @0.5 →
    connected components over documents) shared by q56 (cluster
    table), q210 (canonical selection), and q277 (size histogram) —
    the in-session analog of the materialized cluster-assignment
    table a dedup pipeline builds once per corpus snapshot and every
    downstream consumer reads (cache.persist_shared survives the
    sweep's per-query clear_all)."""
    from product_analytics_spark import cache

    def build() -> DataFrame:
        d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
        pairs = text.minhash_near_dup_pairs(d, threshold=0.5)
        return graph.dup_clusters(d.select("doc_id"), pairs)

    return cache.persist_shared(f"dup_clusters:{sf_dir}", build)


def q56_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: near-dup pairs -> duplicate CLUSTERS via distributed
    connected components (iterative min-label propagation,
    operators/graph.py), then corpus canonicalization: every doc gets
    its cluster id (min doc id of its component) and an is_canonical
    keep-flag. The oracle resolves the same reachability with a
    recursive CTE over the identical (portable-hash) MinHash pairs —
    an end-to-end check of candidate generation AND transitive
    closure."""
    return _dup_clusters_shared(spark, sf_dir).select(
        "doc_id", "cluster_id", "is_canonical"
    )


def _q56_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_q20_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


# --------------------------------------------------------------------- q57

FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 48


def q57_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30: strict-order conversion funnel signup -> view -> click ->
    purchase, each step within 48h of the previous one. One shuffle on
    user_id; the per-user sorted-events fold replaces the k-way
    self-join formulation (operators/product_metrics.py)."""
    return product_metrics.funnel_counts(
        _t(spark, sf_dir, "events"),
        steps=FUNNEL_STEPS,
        max_step_gap_hours=FUNNEL_WINDOW_HOURS,
    )


def _q57_sql() -> str:
    w = FUNNEL_WINDOW_HOURS
    ctes = [
        "e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type "
        "FROM events)",
        f"s1 AS (SELECT user_id, min((ts, event_id)) AS k FROM e "
        f"WHERE event_type='{FUNNEL_STEPS[0]}' GROUP BY 1)",
    ]
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        # Step i's match = minimum (ts, event_id) strictly after step
        # i-1's matched tuple and within the window of its timestamp —
        # the same greedy walk the Spark fold performs.
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min((ts, event_id)) AS k "
            f"FROM e JOIN s{i - 1} USING (user_id) "
            f"WHERE event_type='{step}' AND (ts, event_id) > s{i - 1}.k "
            f"AND ts <= s{i - 1}.k[1] + INTERVAL {w} HOUR GROUP BY 1)"
        )
    values = ", ".join(
        f"({i + 1}, '{s}', (SELECT count(*) FROM s{i + 1}))"
        for i, s in enumerate(FUNNEL_STEPS)
    )
    return (
        "WITH " + ", ".join(ctes) + " SELECT step_idx, step, "
        "CAST(n_users AS BIGINT) AS n_users "
        f"FROM (VALUES {values}) t(step_idx, step, n_users)"
    )


# --------------------------------------------------------------------- q58

def q58_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X31: weekly cohort retention — users cohorted by first-signup
    week, retained when purchasing in cohort week + k. One shuffle on
    user_id computes cohort and distinct active weeks together
    (operators/product_metrics.py)."""
    return product_metrics.cohort_retention(
        _t(spark, sf_dir, "events"),
        cohort_event="signup",
        activity_event="purchase",
    )


Q58_SQL = """
WITH e AS (
  SELECT user_id, event_type, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
  FROM events WHERE event_type IN ('signup', 'purchase')
),
f AS (
  SELECT user_id, min(wk) FILTER (WHERE event_type='signup') AS cohort
  FROM e GROUP BY 1
),
fc AS (SELECT * FROM f WHERE cohort IS NOT NULL),
sz AS (SELECT cohort, count(*) AS n_cohort FROM fc GROUP BY 1),
a AS (
  SELECT DISTINCT e.user_id, fc.cohort, e.wk
  FROM e JOIN fc USING (user_id)
  WHERE e.event_type='purchase' AND e.wk >= fc.cohort
),
c AS (
  SELECT cohort, CAST(date_diff('day', cohort, wk)/7 AS INT) AS week_offset,
         count(*) AS n_active
  FROM a GROUP BY 1, 2
)
SELECT CAST(c.cohort AS TIMESTAMP) AS cohort_week, week_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_cohort AS BIGINT) AS n_cohort,
       CAST(n_active AS DOUBLE)/n_cohort AS retention_rate
FROM c JOIN sz USING (cohort)
"""


# --------------------------------------------------------------------- q59

TFIDF_K = 3


def q59_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X32: top-3 characteristic terms per document by TF-IDF with the
    log-free BM25-style idf — a rational function of integer counts,
    so scores are bit-reproducible across engines (libm ln is not;
    see operators/corpus.py:tfidf_topk)."""
    return corpus.tfidf_topk(_t(spark, sf_dir, "documents"), k=TFIDF_K)


Q59_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
s AS (
  SELECT doc_id, token, tf, df,
         CAST(tf AS DOUBLE)
           * ((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5)) AS score
  FROM tf JOIN dfq USING (token) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS term_rank
  FROM s
)
SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM r WHERE term_rank <= {TFIDF_K}
"""


# --------------------------------------------------------------------- q60

WSAMPLE_K = 100


def q60_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X33: priority sampling (Duffield-Lund-Thorup) — exactly k docs,
    selection probability increasing with n_chars, fully deterministic
    from the portable content hash. Top-k = TakeOrderedAndProject, no
    global sort (operators/sampling.py:priority_sample)."""
    return sampling.priority_sample(
        _t(spark, sf_dir, "documents"), weight_col="n_chars", k=WSAMPLE_K
    ).select("doc_id", "lang", "n_chars")


def _q60_sql() -> str:
    h = _hash60_sql("CAST(doc_id AS VARCHAR) || chr(31) || 'wsample'")
    return f"""
SELECT doc_id, lang, n_chars FROM documents
ORDER BY CAST({h} + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) ASC, doc_id ASC
LIMIT {WSAMPLE_K}
"""


# --------------------------------------------------------------------- q61

KMEANS_QUANT = 1_000_000


def q61_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X34: one distributed k-means update step over the embeddings —
    nearest-centroid assignment (q39's cell arithmetic) then per-(cell,
    dim) member means on integer-quantized values, so the sums are
    order-independent and engine-exact (operators/similarity.py:
    kmeans_update). One hash-agg shuffle of |cells|*|dims| partials."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.kmeans_update(
        emb, similarity.DEFAULT_CENTROIDS, quant=KMEANS_QUANT
    )


def _q61_sql() -> str:
    q = float(KMEANS_QUANT)
    return f"""
WITH {_ivf_cell_ctes(similarity.DEFAULT_CENTROIDS)},
ex AS (
  SELECT cell, i - 1 AS dim, CAST(round(e[i] * {q!r}) AS BIGINT) AS qv
  FROM cw CROSS JOIN generate_series(1, {len(similarity.DEFAULT_CENTROIDS[0])}) t(i)
),
a AS (SELECT cell, dim, sum(qv) AS s, count(*) AS n FROM ex GROUP BY 1, 2)
SELECT CAST(cell AS INT) AS cell, CAST(dim AS INT) AS dim,
       CAST(n AS BIGINT) AS n_members,
       CAST(s AS DOUBLE) / ({q!r} * CAST(n AS DOUBLE)) AS centroid
FROM a
"""


# --------------------------------------------------------------------- q62

WINSOR_LO, WINSOR_HI = 0.01, 0.99


def q62_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X35: percentile winsorization — clamp extended price to its
    per-return-flag [p01, p99] band and report clamp counts plus the
    winsorized sum. Bounds come from one exact-percentile pass (q41's
    machinery), get rounded to cents (decimal, both engines half-up),
    broadcast back, and the clamped sum stays exact via integer cents.
    Two shuffles total: the percentile agg and the final agg; the
    bounds join is a broadcast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", _money("l_extendedprice").alias("_p")
    )
    b = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit([WINSOR_LO, WINSOR_HI])).alias("_q")
        )
        .select(
            "l_returnflag",
            F.round(F.col("_q")[0].cast("decimal(18,6)"), 2).alias("_lo"),
            F.round(F.col("_q")[1].cast("decimal(18,6)"), 2).alias("_hi"),
        )
    )
    j = li.join(F.broadcast(b), "l_returnflag")
    w = F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_p")))
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.first("_lo").alias("_flo"),
            F.first("_hi").alias("_fhi"),
            F.count(F.when(F.col("_p") < F.col("_lo"), 1)).alias("n_low"),
            F.count(F.when(F.col("_p") > F.col("_hi"), 1)).alias("n_high"),
            F.sum((w * 100).cast("long")).alias("_wc"),
        )
        .select(
            "l_returnflag",
            F.col("_flo").cast("double").alias("p01"),
            F.col("_fhi").cast("double").alias("p99"),
            F.col("n_low").cast("bigint").alias("n_low"),
            F.col("n_high").cast("bigint").alias("n_high"),
            _cents_out(F.col("_wc")).alias("winsorized_sum"),
        )
    )


Q62_SQL = f"""
WITH b AS (
  SELECT l_returnflag,
         round(CAST(quantile_cont(l_extendedprice, {WINSOR_LO}) AS DECIMAL(18,6)), 2) AS lo,
         round(CAST(quantile_cont(l_extendedprice, {WINSOR_HI}) AS DECIMAL(18,6)), 2) AS hi
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT l.l_returnflag, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS p, lo, hi
  FROM lineitem l JOIN b USING (l_returnflag)
)
SELECT l_returnflag, CAST(lo AS DOUBLE) AS p01, CAST(hi AS DOUBLE) AS p99,
       CAST(count(CASE WHEN p < lo THEN 1 END) AS BIGINT) AS n_low,
       CAST(count(CASE WHEN p > hi THEN 1 END) AS BIGINT) AS n_high,
       CAST(sum(CAST(greatest(lo, least(hi, p)) * 100 AS BIGINT)) AS BIGINT) / 100.0
         AS winsorized_sum
FROM j GROUP BY l_returnflag, lo, hi
"""


# --------------------------------------------------------------------- q63

ATTRIB_HOURS = 36


def q63_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X36: bucketized interval join — count events landing in each
    36-hour attribution window (one window per (event_type, day)).
    The naive range join is a BroadcastNestedLoopJoin; interval_join
    quantizes time into 1-day buckets, explodes each interval to the
    2 buckets it covers, and hash-equi-joins on the bucket — each
    (point, interval) pair meets in exactly one bucket, so no dedup
    pass (operators/joins.py:interval_join)."""
    from product_analytics_spark.operators import joins as joins_mod

    e = _t(spark, sf_dir, "events").select("ts", "user_id", "event_id")
    iv = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("w_type"),
            F.date_trunc("day", F.col("ts")).alias("w_start"),
        )
        .distinct()
        .withColumn(
            "w_end", F.col("w_start") + F.expr(f"INTERVAL {ATTRIB_HOURS} HOURS")
        )
    )
    j = joins_mod.interval_join(e, iv, "ts", "w_start", "w_end", bucket="1 day")
    return j.groupBy("w_type", "w_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


Q63_SQL = f"""
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_id FROM events
),
iv AS (
  SELECT DISTINCT event_type AS w_type,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS w_start,
         date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL {ATTRIB_HOURS} HOUR AS w_end
  FROM events
)
SELECT iv.w_type, iv.w_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM iv JOIN e ON e.ts >= iv.w_start AND e.ts < iv.w_end
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q64

PACK_SEQ_LEN = 512
PACK_BUCKETS = 32


def q64_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X37: greedy-concatenation sequence packing via a two-phase
    distributed prefix sum — per-bucket window cumsums (the only
    full-data shuffle) + broadcast bucket offsets; the global token
    offset and spanned training sequences are then pure arithmetic
    (operators/corpus.py:packed_offsets)."""
    return corpus.packed_offsets(
        _t(spark, sf_dir, "documents"),
        seq_len=PACK_SEQ_LEN,
        n_buckets=PACK_BUCKETS,
    )


def _q64_sql() -> str:
    h = _hash60_sql("CAST(doc_id AS VARCHAR) || chr(31) || 'pack'")
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         {h} % {PACK_BUCKETS} AS bkt, {h} AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY bkt, h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
  FROM t
),
s AS (
  SELECT doc_id, start_tok, n_tokens,
         CAST(floor(CAST(start_tok AS DOUBLE) / {PACK_SEQ_LEN}) AS BIGINT) AS first_seq,
         CAST(floor(CAST(start_tok + greatest(n_tokens - 1, 0) AS DOUBLE)
                    / {PACK_SEQ_LEN}) AS BIGINT) AS last_seq
  FROM c
)
SELECT doc_id, CAST(start_tok AS BIGINT) AS start_tok, n_tokens,
       first_seq, last_seq, CAST(last_seq - first_seq + 1 AS BIGINT) AS n_seqs
FROM s
"""


# --------------------------------------------------------------------- q65


def q65_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X38: Gopher-style within-document repetition metrics
    (dup-token fraction, top-token fraction, Simpson concentration) —
    rational arithmetic only, so every double is one exactly-rounded
    division and the output is engine-exact
    (operators/corpus.py:repetition_signals)."""
    return corpus.repetition_signals(_t(spark, sf_dir, "documents"))


Q65_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
pt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
a AS (
  SELECT doc_id, sum(c) AS n, count(*) AS d, max(c) AS top, sum(c*c) AS sq
  FROM pt GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(d AS BIGINT) AS n_distinct,
       (CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) / CAST(n AS DOUBLE) AS dup_token_frac,
       CAST(top AS DOUBLE) / CAST(n AS DOUBLE) AS top_token_frac,
       CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS simpson
FROM a
"""


# --------------------------------------------------------------------- q66

MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
MIX_DEFAULT = 0.05


def q66_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39: source-mixture subsampling — per-source keep rates from a
    portable-hash threshold (zero-shuffle CASE ladder; dropped rows
    never leave the mapper). Output: surviving doc/char volume per
    source (operators/sampling.py:mixture_sample)."""
    kept = sampling.mixture_sample(
        _t(spark, sf_dir, "documents"),
        "source",
        MIX_RATES,
        default_rate=MIX_DEFAULT,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def _q66_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(round(r * sampling.SPLIT_BUCKETS))}"
        for s, r in sorted(MIX_RATES.items())
    )
    default = int(round(MIX_DEFAULT * sampling.SPLIT_BUCKETS))
    return f"""
WITH b AS (
  SELECT source, n_chars, {_split_hash_sql('mix')} AS bkt FROM documents
),
k AS (
  SELECT source, n_chars FROM b
  WHERE bkt < CASE {cases} ELSE {default} END
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM k GROUP BY 1
"""


# --------------------------------------------------------------------- q67

VOCAB_APPLY_K = 50


def q67_vocab_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X40: tokenizer vocabulary application — ids from the top-50
    corpus vocabulary (frequency desc, token asc), OOV → 0, document
    order preserved via posexplode + (pos,id) array_sort reassembly;
    ONE doc-keyed shuffle carrying 12-byte pairs instead of text
    (operators/corpus.py:apply_vocab). token_ids emitted as a CSV
    string so the comparator sees a scalar column."""
    docs = _t(spark, sf_dir, "documents")
    vocab = corpus.vocab_topk(docs, k=VOCAB_APPLY_K)
    out = corpus.apply_vocab(docs, vocab)
    return out.select(
        "doc_id",
        F.array_join(F.col("token_ids").cast("array<string>"), ",").alias(
            "token_ids"
        ),
        "n_tokens",
        "n_oov",
    )


Q67_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
  FROM documents
),
flat AS (
  SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS token
  FROM tok
),
v AS (
  SELECT token, count(*) AS n_occ FROM flat GROUP BY 1
  ORDER BY n_occ DESC, token ASC LIMIT {VOCAB_APPLY_K}
),
ids AS (
  SELECT token, row_number() OVER (ORDER BY n_occ DESC, token ASC) AS id
  FROM v
),
j AS (
  SELECT f.doc_id, f.pos, coalesce(ids.id, 0) AS id
  FROM flat f LEFT JOIN ids USING (token)
)
SELECT doc_id,
       array_to_string(list(id ORDER BY pos ASC), ',') AS token_ids,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM j GROUP BY doc_id
"""


# --------------------------------------------------------------------- q68

PIPE_REP_MAX = 0.10
PIPE_LANGS = ("en", "de", "fr", "es")
PIPE_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def q68_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X41: the end-to-end training-corpus prep pipeline — language
    filter → repetition-quality filter (X38) → exact dedup keeping the
    lowest doc_id (X1, 8-byte fingerprint shuffle key) → deterministic
    split assignment (X23, zero-shuffle) → per-(split, lang) volume
    report. One declarative plan: Catalyst pushes the lang filter into
    the scan, the quality join and dedup share doc-keyed exchanges,
    and the split CASE ladder rides the dedup output map-side.

    The comparison boundary (top_token_frac <= 0.1) is safe across
    engines: the fraction is one exactly-rounded integer division, so
    both engines compute the identical double."""
    d = _t(spark, sf_dir, "documents").filter(F.col("lang").isin(*PIPE_LANGS))
    sig = corpus.repetition_signals(d).select("doc_id", "top_token_frac")
    kept = (
        d.join(sig, "doc_id")
        .filter(F.col("top_token_frac") <= F.lit(PIPE_REP_MAX))
        .drop("top_token_frac")
    )
    deduped = dedup.exact_dedup(
        kept.withColumn("_fp", text.fingerprint(F.col("text"))),
        on="_fp",
        keep_min="doc_id",
    ).drop("_fp")
    split = sampling.with_hash_split(deduped, "doc_id", PIPE_SPLITS)
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def _q68_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in PIPE_LANGS)
    train = int(round(PIPE_SPLITS["train"] * sampling.SPLIT_BUCKETS))
    val = train + int(round(PIPE_SPLITS["val"] * sampling.SPLIT_BUCKETS))
    return rf"""
WITH d AS (
  SELECT * FROM documents WHERE lang IN ({langs})
),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
  FROM d
),
pt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
sig AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_token_frac
  FROM pt GROUP BY 1
),
kept AS (
  SELECT d.* FROM d JOIN sig USING (doc_id)
  WHERE sig.top_token_frac <= {PIPE_REP_MAX}
),
dd AS (
  SELECT *, row_number() OVER (
    PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
    ORDER BY doc_id ASC) AS rn
  FROM kept
),
winners AS (SELECT * FROM dd WHERE rn = 1),
s AS (
  SELECT *, {_split_hash_sql('split')} AS bkt FROM winners
),
labeled AS (
  SELECT lang, n_chars,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         CASE WHEN bkt < {train} THEN 'train'
              WHEN bkt < {val} THEN 'val' ELSE 'test' END AS split
  FROM s
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM labeled GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q69

EDIT_DIST_MAX = 20
EDIT_DIST_K = 25


def q69_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X42: Levenshtein fuzzy-match pairs within (brand, container)
    blocks — entity-resolution over part names. Blocked self-join
    (never all-pairs; see operators/text.py:edit_distance_pairs),
    deterministic (edit_dist, id_a, id_b) top-k. DuckDB's
    ``levenshtein`` is the identical unit-cost DP."""
    p = _t(spark, sf_dir, "part")
    return text.edit_distance_pairs(
        p,
        text_col="p_name",
        id_col="p_partkey",
        block_cols=("p_brand", "p_size"),
        max_dist=EDIT_DIST_MAX,
        k=EDIT_DIST_K,
    )


Q69_SQL = f"""
WITH b AS (SELECT p_brand, p_size, p_partkey AS id, p_name AS tx FROM part)
SELECT a.id AS id_a, c.id AS id_b, levenshtein(a.tx, c.tx) AS edit_dist
FROM b a JOIN b c ON a.p_brand = c.p_brand AND a.p_size = c.p_size
                 AND a.id < c.id
WHERE levenshtein(a.tx, c.tx) <= {EDIT_DIST_MAX}
ORDER BY edit_dist, id_a, id_b LIMIT {EDIT_DIST_K}
"""


# --------------------------------------------------------------------- q70

def q70_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43: per-group distribution moments (mean/variance/stddev/
    skewness) from exact integer power sums (operators/stats.py:
    grouped_moments). Double summation is order-dependent; integer
    cent sums in DECIMAL(38,0) are exact on any cluster size, and the
    final divisions run once in a fixed order both engines mirror."""
    o = _t(spark, sf_dir, "orders")
    return stats.grouped_moments(
        o.select(F.col("o_orderpriority").alias("order_priority"), "o_totalprice"),
        group_cols=("order_priority",),
        value_col="o_totalprice",
    )


Q70_SQL = f"""
WITH q AS (
  SELECT o_orderpriority AS order_priority,
         CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS qq
  FROM orders
),
s AS (
  SELECT order_priority, count(*) AS n,
         sum(CAST(qq AS DECIMAL(38,0))) AS s1,
         sum(CAST(qq AS DECIMAL(38,0)) * qq) AS s2,
         sum(CAST(qq AS DECIMAL(38,0)) * qq * qq) AS s3
  FROM q GROUP BY 1
),
m AS (
  SELECT order_priority, n,
         {_dec2dbl_sql('s1')} / 100.0 / CAST(n AS DOUBLE) AS m1,
         {_dec2dbl_sql('s2')} / 10000.0 / CAST(n AS DOUBLE) AS m2,
         {_dec2dbl_sql('s3')} / 1000000.0 / CAST(n AS DOUBLE) AS m3
  FROM s
)
SELECT order_priority, n, m1 AS mean,
       m2 - m1 * m1 AS var_pop,
       sqrt(m2 - m1 * m1) AS stddev_pop,
       CASE WHEN sqrt(m2 - m1 * m1) > 0
            THEN (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
                 / (sqrt(m2 - m1 * m1) * sqrt(m2 - m1 * m1) * sqrt(m2 - m1 * m1))
            ELSE 0.0 END AS skewness
FROM m
"""


# --------------------------------------------------------------------- q71

def q71_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X44: most frequent ship mode per supplier with the explicit
    (count DESC, value ASC) tie-break — without it two engines
    legitimately disagree on equal counts (operators/stats.py:
    mode_per_group). Two-level agg: the shuffle moves |distinct
    (group, value)| partials, the ranking window runs on that compact
    relation."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supplier_id"), F.col("l_quantity")
    )
    return stats.mode_per_group(li, group_cols=("supplier_id",), value_col="l_quantity")


Q71_SQL = """
WITH c AS (
  SELECT l_suppkey AS supplier_id, l_quantity AS mode_value, count(*) AS mode_count
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY supplier_id
                               ORDER BY mode_count DESC, mode_value ASC) AS rn
  FROM c
)
SELECT supplier_id, mode_value, mode_count FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------- q72

N_EQUIDEPTH_BINS = 8


def q72_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45: equi-depth (quantile) binning of order totals
    (operators/stats.py:equidepth_bins). Boundaries from exact
    percentiles (F.percentile = DuckDB quantile_cont, both linear
    interpolation — cross-validated by q41); assignment is a CASE
    ladder folded into the scan. ntile would need a global sort and
    splits ties positionally; this shape shuffles only |bins| agg
    rows and puts ties in one bin."""
    o = _t(spark, sf_dir, "orders")
    return stats.equidepth_bins(o, value_col="o_totalprice", n_bins=N_EQUIDEPTH_BINS)


def _q72_sql() -> str:
    nb = N_EQUIDEPTH_BINS
    fracs = ",".join(repr(k / nb) for k in range(1, nb))
    whens = " ".join(f"WHEN v <= q[{k}] THEN {k}" for k in range(1, nb))
    return f"""
WITH b AS (
  SELECT quantile_cont(CAST(o_totalprice AS DOUBLE), [{fracs}]) AS q FROM orders
),
v AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders)
SELECT CAST(CASE {whens} ELSE {nb} END AS INT) AS bin,
       count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v
FROM v, b GROUP BY 1
"""


# --------------------------------------------------------------------- q73

def q73_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X46: Markov next-event transition matrix over per-user event
    streams (operators/product_metrics.py:event_transitions). One
    window shuffle on the user key; probabilities are one double
    division of exact counts."""
    return product_metrics.event_transitions(_t(spark, sf_dir, "events"))


Q73_SQL = """
WITH nx AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS next_event_type
  FROM events
),
c AS (
  SELECT event_type, next_event_type, count(*) AS n_transitions
  FROM nx WHERE next_event_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_event_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(sum(n_transitions) OVER (PARTITION BY event_type) AS DOUBLE)
         AS p_transition
FROM c
"""


# --------------------------------------------------------------------- q74

BIGRAM_MIN_COUNT = 2
BIGRAM_K = 30


def q74_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47: corpus bigram counts — the n-gram language-model statistic
    (operators/corpus.py:bigram_counts). Tokens staged once, bigrams
    by self-shifted zip (map-side), one hash-agg of distinct pairs,
    TakeOrderedAndProject top-k."""
    return corpus.bigram_counts(
        _t(spark, sf_dir, "documents"), min_count=BIGRAM_MIN_COUNT, k=BIGRAM_K
    )


Q74_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT t[i] AS token_a, t[i+1] AS token_b
  FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT token_a, token_b, count(*) AS n FROM bg GROUP BY 1, 2)
SELECT token_a, token_b, n FROM c
WHERE n >= {BIGRAM_MIN_COUNT}
ORDER BY n DESC, token_a, token_b LIMIT {BIGRAM_K}
"""


# --------------------------------------------------------------------- q75

def q75_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48: keyed diff of two snapshots — the CDC audit primitive
    (operators/incremental.py:snapshot_diff): which users were added /
    removed / changed between the pre-cut state and the post-cut
    state. ONE full-outer equi-join on the key; null-safe compare."""
    e = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "event_type", "value")
        )

    old = latest(e.filter(F.col("ts") < F.lit(EVENTS_CUT)))
    new = latest(e.filter(F.col("ts") >= F.lit(EVENTS_CUT)))
    return incremental.snapshot_diff(
        old, new, key_cols=("user_id",), compare_cols=("event_type", "value")
    )


Q75_SQL = """
WITH o AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-20'
  ) WHERE rn = 1
),
n AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '2024-01-20'
  ) WHERE rn = 1
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            WHEN (o.event_type IS DISTINCT FROM n.event_type)
                 OR (o.value IS DISTINCT FROM n.value) THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.event_type AS old_event_type, o.value AS old_value,
       n.event_type AS new_event_type, n.value AS new_value
FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
"""


# --------------------------------------------------------------------- q76

TOP_CONCAT_K = 5


def q76_group_concat_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49: per-nation ordered LISTAGG of the top-5 customers by
    account balance (operators/stats.py:grouped_topk_concat). The
    concat order is the explicit (balance DESC, custkey ASC) ranking —
    collect_list arrival order is never trusted."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "nation", "c_name", "c_acctbal", "c_custkey"
    )
    return stats.grouped_topk_concat(
        j,
        group_cols=("nation",),
        order_col="c_acctbal",
        tiebreak_col="c_custkey",
        label_col="c_name",
        k=TOP_CONCAT_K,
    )


Q76_SQL = f"""
WITH r AS (
  SELECT n_name AS nation, c_name,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation, string_agg(c_name, ',' ORDER BY rn) AS top_labels,
       count(*) AS n_in_group
FROM r WHERE rn <= {TOP_CONCAT_K} GROUP BY 1
"""


# --------------------------------------------------------------------- q77

#: Landing dir for the reader/sink round-trip query — inside the repo
#: (the harness forbids writing elsewhere); tiny (3-column customer).
Q77_CSV_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", ".q77_csv_land"
)


def q77_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reader/sink round-trip ON DISK (sources/readers.py:read_csv —
    schema-enforced, PERMISSIVE with quarantine column): customers are
    written to headered CSV, read back through the engine's CSV
    reader, and aggregated. The oracle computes the same aggregate
    from the original table — so the round-trip must preserve every
    value exactly (Java double formatting round-trips bit-exact).
    Exercises the ingestion surface the driver otherwise never sees."""
    import shutil as _sh

    from pyspark.sql import types as T

    from product_analytics_spark.sources import readers

    _sh.rmtree(Q77_CSV_DIR, ignore_errors=True)
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    c.write.mode("overwrite").option("header", "true").csv(Q77_CSV_DIR)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = readers.read_csv(spark, Q77_CSV_DIR, schema)
    good, _rejects = readers.split_rejects(back)
    return good.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        _cents_out(F.sum(_money_cents("c_acctbal"))).alias("total_balance"),
    )


Q77_SQL = """
SELECT c_mktsegment AS segment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal * 100 AS BIGINT)) AS BIGINT) / 100.0 AS total_balance
FROM customer GROUP BY 1
"""


# --------------------------------------------------------------------- q78

ASOF_FWD_TOLERANCE_H = 72


def q78_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 forward variant: each view event picks up the user's NEXT
    purchase within 72h (operators/joins.py:asof_join with
    direction='forward', tolerance) — time-to-convert enrichment.
    Same one-shuffle union+window plan as the backward form, ordered
    descending; tolerance is a scalar predicate, no extra join."""
    e = _t(spark, sf_dir, "events")
    from product_analytics_spark.operators.joins import asof_join

    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts"), F.col("value")
    )
    out = asof_join(
        views,
        purchases,
        key_cols=("user_id",),
        left_ts="ts",
        right_ts="p_ts",
        value_cols=("value",),
        suffix="_next",
        direction="forward",
        tolerance=f"{ASOF_FWD_TOLERANCE_H} HOURS",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("p_ts_next").alias("next_purchase_ts"),
        F.col("value_next").alias("next_purchase_value"),
    )


Q78_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
  WHERE event_type = 'view'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, max(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
sel AS (
  SELECT v.event_id, v.user_id, v.ts, min(p.p_ts) AS next_purchase_ts
  FROM v LEFT JOIN p ON p.user_id = v.user_id
         AND p.p_ts >= v.ts
         AND p.p_ts <= v.ts + INTERVAL {ASOF_FWD_TOLERANCE_H} HOUR
  GROUP BY 1, 2, 3
)
SELECT sel.event_id, sel.user_id, sel.ts, sel.next_purchase_ts,
       p.value AS next_purchase_value
FROM sel LEFT JOIN p
  ON p.user_id = sel.user_id AND p.p_ts = sel.next_purchase_ts
"""


# --------------------------------------------------------------------- q79

ATTRIB_WINDOW_DAYS = 7


def q79_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X46-adjacent: first-touch attribution — every purchase
    attributes to the user's earliest click strictly before it within
    7 days (operators/product_metrics.py:first_touch_attribution).
    The match runs through the KEYED interval join (hash join on
    (user, time-bucket) + exact range filter — no all-pairs work)."""
    return product_metrics.first_touch_attribution(
        _t(spark, sf_dir, "events"),
        touch_type="click",
        conversion_type="purchase",
        window_days=ATTRIB_WINDOW_DAYS,
    )


Q79_SQL = f"""
WITH c AS (
  SELECT event_id AS conv_event_id, user_id, CAST(ts AS TIMESTAMP) AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t_ts, event_id AS t_id
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT c.conv_event_id, min(t.t_ts) AS first_touch_ts
  FROM c JOIN t ON t.user_id = c.user_id
        AND t.t_ts >= c.conv_ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
        AND t.t_ts < c.conv_ts
  GROUP BY 1
),
m2 AS (
  SELECT m.conv_event_id, m.first_touch_ts, min(t.t_id) AS first_touch_event_id
  FROM m JOIN c ON c.conv_event_id = m.conv_event_id
         JOIN t ON t.user_id = c.user_id AND t.t_ts = m.first_touch_ts
  GROUP BY 1, 2
)
SELECT c.conv_event_id, c.user_id, c.conv_ts,
       m2.first_touch_ts, m2.first_touch_event_id,
       m2.conv_event_id IS NOT NULL AS attributed
FROM c LEFT JOIN m2 ON m2.conv_event_id = c.conv_event_id
"""


# --------------------------------------------------------------------- q80

ROLLING_WINDOW_DAYS = 7


def q80_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X50: DAU + rolling 7-day distinct users (operators/
    product_metrics.py:rolling_distinct_users). Sliding-window exact
    distinct can't compose from daily counts; the scale shape is
    distinct user-days -> map-side explode of each user-day onto the
    following 7 days -> one distinct-count hash-agg per target day.
    HLL partial-merge is the 100 TB swap-in with the same shape."""
    return product_metrics.rolling_distinct_users(
        _t(spark, sf_dir, "events"), window_days=ROLLING_WINDOW_DAYS
    )


Q80_SQL = f"""
WITH ud AS (
  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id
  FROM events
),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
r AS (
  SELECT d2.day, count(DISTINCT ud.user_id) AS rolling_{ROLLING_WINDOW_DAYS}d
  FROM (SELECT DISTINCT day FROM ud) d2
  JOIN ud ON ud.day BETWEEN d2.day - INTERVAL {ROLLING_WINDOW_DAYS - 1} DAY AND d2.day
  GROUP BY 1
)
SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, r.rolling_{ROLLING_WINDOW_DAYS}d
FROM dau JOIN r USING (day)
"""


# --------------------------------------------------------------------- q81

RANK_TOP_PER_GROUP = 10


def q81_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface ranking-function family: rank / dense_rank /
    percent_rank / cume_dist over one (priority, price DESC, key ASC)
    window — a total order, so every function is deterministic and
    engine-identical (percent_rank/cume_dist are single divisions of
    exact integers). One window shuffle serves all four; the top-10
    filter rides the same row_number."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.select(
        F.col("o_orderpriority").alias("order_priority"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("order_total"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return ranked.filter(F.col("rn") <= RANK_TOP_PER_GROUP)


Q81_SQL = f"""
SELECT * FROM (
  SELECT o_orderpriority AS order_priority, o_orderkey AS order_id,
         o_totalprice AS order_total,
         row_number() OVER w AS rn,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS dense_rnk,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= {RANK_TOP_PER_GROUP}
"""


# --------------------------------------------------------------------- q82

def q82_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface array/higher-order-function suite: per order the
    deterministically-sorted quantity array (sorted by (qty, line
    number) struct — collect order never trusted), plus filter/exists
    analyses and an exact integer-cent total. Float folds over arrays
    are deliberately avoided in outputs — list_sum order isn't part of
    any engine's contract."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("l_quantity").alias("q"), F.col("l_linenumber").alias("ln")))
        ).alias("_sorted"),
        F.sum(_money_cents("l_quantity")).alias("_cents"),
    )
    qarr = F.transform(F.col("_sorted"), lambda s: s["q"])
    return per.select(
        "order_id",
        qarr.alias("qty_list"),
        F.size(F.filter(qarr, lambda q: q >= 30)).alias("n_heavy"),
        F.exists(qarr, lambda q: q >= 50).alias("has_max"),
        _cents_out(F.col("_cents")).alias("total_qty"),
    )


Q82_SQL = """
SELECT l_orderkey AS order_id,
       list(l_quantity ORDER BY l_quantity, l_linenumber) AS qty_list,
       CAST(len(list_filter(list(l_quantity), q -> q >= 30)) AS INT) AS n_heavy,
       len(list_filter(list(l_quantity), q -> q >= 50)) > 0 AS has_max,
       CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) / 100.0 AS total_qty
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------- q83

SCHEMA_CUT_DATE = "1997-01-01"


def q83_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 exercised in the driver: two batches with DIFFERENT schemas
    (the post-cut batch adds a priority column, as a CDC feed does
    mid-stream) combined via ``unionByName(allowMissingColumns=True)``
    — missing columns NULL-fill, the engine's schema-evolution
    primitive (reference on_schema_change='sync_all_columns',
    customers_latest.sql:5). The oracle mirrors with DuckDB's
    UNION ALL BY NAME."""
    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderdate") < F.lit(SCHEMA_CUT_DATE)).select(
        F.col("o_orderkey").alias("order_id"), F.col("o_orderdate").alias("order_date")
    )
    new = o.filter(F.col("o_orderdate") >= F.lit(SCHEMA_CUT_DATE)).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderpriority").alias("priority"),
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy(F.year("order_date").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("priority").alias("n_with_priority"),
    )


Q83_SQL = f"""
WITH old AS (
  SELECT o_orderkey AS order_id, o_orderdate AS order_date FROM orders
  WHERE o_orderdate < TIMESTAMP '{SCHEMA_CUT_DATE}'
),
new AS (
  SELECT o_orderkey AS order_id, o_orderdate AS order_date,
         o_orderpriority AS priority
  FROM orders WHERE o_orderdate >= TIMESTAMP '{SCHEMA_CUT_DATE}'
),
u AS (SELECT * FROM old UNION ALL BY NAME SELECT * FROM new)
SELECT year(CAST(order_date AS DATE)) AS order_year,
       count(*) AS n_orders, count(priority) AS n_with_priority
FROM u GROUP BY 1
"""


# --------------------------------------------------------------------- q84

def q84_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9-class correlated comparison, de-correlated: suppliers whose
    balance exceeds their nation's average (the classic
    ``WHERE s_acctbal > (SELECT avg(...) WHERE same nation)``).
    De-correlation = one per-nation aggregate (exact cents) +
    broadcast join back; the average is a fixed-order division both
    engines mirror, so the > comparison is bit-identical."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    per_nation = s.groupBy("s_nationkey").agg(
        F.sum(_money_cents("s_acctbal")).alias("_cents"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        "s_nationkey",
        (
            (F.col("_cents").cast("double") / F.lit(100.0))
            / F.col("_n").cast("double")
        ).alias("nation_avg"),
    )
    j = s.join(F.broadcast(per_nation), "s_nationkey").join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    return j.filter(F.col("s_acctbal") > F.col("nation_avg")).select(
        F.col("s_suppkey").alias("supplier_id"),
        "nation",
        F.col("s_acctbal").alias("balance"),
        "nation_avg",
    )


Q84_SQL = """
WITH a AS (
  SELECT s_nationkey,
         CAST(sum(CAST(s_acctbal * 100 AS BIGINT)) AS DOUBLE) / 100.0
           / CAST(count(*) AS DOUBLE) AS nation_avg
  FROM supplier GROUP BY 1
)
SELECT s_suppkey AS supplier_id, n_name AS nation,
       s_acctbal AS balance, nation_avg
FROM supplier
JOIN a USING (s_nationkey)
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > nation_avg
"""


# --------------------------------------------------------------------- q85

KNN_K = 3


def q85_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54: k-NN self-join — every vector's 3 nearest neighbors within
    its IVF cell (operators/similarity.py:knn_join_ivf): the pairwise
    k-NN graph that embedding dedup clustering and retrieval-index
    bootstrap consume. Cell-blocked pairs (never n²), unrolled dot,
    per-row top-k window on 8-byte keys."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.knn_join_ivf(
        emb,
        centroids=similarity.CENTROIDS_FINE,
        k=KNN_K,
        dim=EMBEDDING_DIM,
        cap_per_cell=NEAR_DUP_CAP_PER_CELL,
    )


def _knn_ctes() -> str:
    """Shared oracle fragment: the capped IVF-cell k-NN relation
    ``r``(vec_id, neighbor_id, sim, rank) reproducing
    operators/similarity.py:knn_join_ivf."""
    return f"""{_ivf_cell_ctes(similarity.CENTROIDS_FINE)},
capped AS (
  SELECT vec_id, e, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn FROM cw
  ) WHERE rn <= {NEAR_DUP_CAP_PER_CELL}
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS sim
  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id != b.vec_id
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM pairs
)"""


def _q85_sql() -> str:
    return f"""
WITH {_knn_ctes()}
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, round(sim, 4) AS cosine_sim
FROM r WHERE rank <= {KNN_K}
"""


# --------------------------------------------------------------------- q86

def q86_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface arbitrary GROUPING SETS (beyond X6 rollup / X16
    cube): per-priority totals, per-year totals, and the grand total in
    ONE pass — map-side grouping-set expansion, one partial-agg
    shuffle. Exercised through the engine's SQL entry point
    (``spark.sql`` over a registered view — SURVEY §3.4's second
    lifecycle door); ``grouping()`` disambiguates real NULLs from
    grouping-set NULLs."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("order_year"),
        _money_cents("o_totalprice").alias("_cents"),
    )
    o.createOrReplaceTempView("q86_orders")
    return spark.sql(
        """
        SELECT priority, order_year,
               CAST(grouping(priority) AS INT) AS g_priority,
               CAST(grouping(order_year) AS INT) AS g_year,
               count(*) AS n_orders,
               -- NB: Spark SQL parses the literal 100.0 as DECIMAL
               -- (the DataFrame API's F.lit(100.0) is DOUBLE); cast
               -- explicitly so the division is double/double like the
               -- oracle's.
               CAST(sum(_cents) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total_value
        FROM q86_orders
        GROUP BY GROUPING SETS ((priority), (order_year), ())
        """
    )


Q86_SQL = """
SELECT o_orderpriority AS priority, year(CAST(o_orderdate AS DATE)) AS order_year,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(grouping(year(CAST(o_orderdate AS DATE))) AS INT) AS g_year,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (year(CAST(o_orderdate AS DATE))), ())
"""


# --------------------------------------------------------------------- q87

def q87_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-surface string-function suite over the cross-engine-safe
    subset (every function here has identical semantics in DuckDB —
    dialect-divergent ones like initcap/substring_index are excluded
    by design): pad, reverse, translate, replace, substring, repeat,
    position (instr/strpos, 1-based 0-if-absent), split_part, ascii.
    Pure narrow projection — runs at scan speed."""
    p = _t(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.upper(name).alias("upper_name"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_padded"),
        F.reverse(name).alias("reversed_name"),
        F.translate(name, " aeiou", "_AEIOU").alias("translated"),
        F.regexp_replace(name, " ", "-").alias("dashed"),
        F.substring(name, 1, 10).alias("prefix10"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.instr(name, "la").alias("pos_la"),
        F.split_part(name, F.lit(" "), F.lit(2)).alias("second_word"),
        F.ascii(name).alias("first_byte"),
        F.length(name).alias("name_len"),
    )


Q87_SQL = """
SELECT p_partkey AS part_id,
       upper(p_name) AS upper_name,
       lpad(p_brand, 12, '*') AS brand_padded,
       reverse(p_name) AS reversed_name,
       translate(p_name, ' aeiou', '_AEIOU') AS translated,
       replace(p_name, ' ', '-') AS dashed,
       substring(p_name, 1, 10) AS prefix10,
       repeat(p_brand, 2) AS brand_twice,
       CAST(strpos(p_name, 'la') AS INT) AS pos_la,
       split_part(p_name, ' ', 2) AS second_word,
       ascii(p_name) AS first_byte,
       CAST(length(p_name) AS INT) AS name_len
FROM part
"""


# --------------------------------------------------------------------- q88

#: "Existing corpus" sources for the incremental-dedup screen; the
#: remaining sources play the incoming batch.
OLD_SRCS = tuple(f"src{i}" for i in range(10))


def q88_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus growth — the dedup question a production
    pipeline actually asks: for each INCOMING document, is it an exact
    duplicate of the existing corpus, a near-duplicate, or new? Exact
    = normalized-text match (lower/trim/whitespace-collapse; the
    xxhash64 fingerprint is the scale key, the oracle groups on the
    normalized text itself — same equivalence classes). Near = MinHash
    band collision against an old doc verified at est_jaccard >= 0.5
    (the full q20 machinery; cross-boundary pairs only). Returns
    (doc_id, status) for the incoming batch; statuses are disjoint
    with exact taking precedence."""
    d = _t(spark, sf_dir, "documents").repartition(32, "doc_id")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    flags = d.select("doc_id", "source", norm.alias("_nt"), "text").withColumn(
        "_is_old", F.col("source").isin(*OLD_SRCS)
    )
    old_nt = flags.filter(F.col("_is_old")).select("_nt").distinct()
    new_docs = flags.filter(~F.col("_is_old"))
    exact_ids = (
        new_docs.join(old_nt, "_nt", "left_semi").select("doc_id").distinct()
    )
    pairs = text.minhash_near_dup_pairs(d, threshold=0.5)
    side = flags.select("doc_id", "_is_old")
    cross = (
        pairs.join(
            F.broadcast(side.select(F.col("doc_id").alias("id_a"), F.col("_is_old").alias("_oa"))),
            "id_a",
        )
        .join(
            F.broadcast(side.select(F.col("doc_id").alias("id_b"), F.col("_is_old").alias("_ob"))),
            "id_b",
        )
        .filter(F.col("_oa") != F.col("_ob"))
    )
    near_ids = cross.select(
        F.when(F.col("_oa"), F.col("id_b")).otherwise(F.col("id_a")).alias("doc_id")
    ).distinct()
    out = (
        new_docs.select("doc_id")
        .join(exact_ids.withColumn("_ex", F.lit(True)), "doc_id", "left")
        .join(near_ids.withColumn("_nr", F.lit(True)), "doc_id", "left")
    )
    status = (
        F.when(F.col("_ex"), F.lit("exact_dup"))
        .when(F.col("_nr"), F.lit("near_dup"))
        .otherwise(F.lit("unique"))
    )
    return out.select("doc_id", status.alias("status"))


def _q88_sql() -> str:
    srcs = ", ".join(f"'{s}'" for s in OLD_SRCS)
    return f"""
WITH pairs AS ({_q20_sql()}),
flags AS (
  SELECT doc_id, source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
         source IN ({srcs}) AS is_old
  FROM documents
),
old_nt AS (SELECT DISTINCT nt FROM flags WHERE is_old),
near_new AS (
  SELECT DISTINCT CASE WHEN fa.is_old THEN p.id_b ELSE p.id_a END AS doc_id
  FROM pairs p
  JOIN flags fa ON fa.doc_id = p.id_a
  JOIN flags fb ON fb.doc_id = p.id_b
  WHERE fa.is_old <> fb.is_old
)
SELECT f.doc_id,
       CASE WHEN f.nt IN (SELECT nt FROM old_nt) THEN 'exact_dup'
            WHEN f.doc_id IN (SELECT doc_id FROM near_new) THEN 'near_dup'
            ELSE 'unique' END AS status
FROM flags f WHERE NOT f.is_old
"""


# --------------------------------------------------------------------- q89

def q89_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — the warehouse question SCD2
    history exists to answer: for each fact (purchase event), which
    dimension VERSION was valid at fact time? Composes X22's SCD2
    build with the as-of machinery: history rows are keyed intervals
    [valid_from, valid_to), facts join to the one version whose
    interval covers their timestamp (current rows have NULL valid_to =
    open-ended). Implemented as the backward as-of join on valid_from
    — each fact takes the latest version starting at-or-before it —
    which is exactly interval coverage because versions tile the
    timeline without gaps. ONE shuffle on the user key."""
    from product_analytics_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    hist = scd.scd2_history(
        e, key_cols="user_id", ts_col="ts",
        tracked_cols="event_type", tiebreak_cols=("event_id",),
    ).select(
        "user_id",
        F.col("valid_from"),
        F.col("event_type").alias("state_at_purchase"),
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("fact_id"), "user_id", "ts"
    )
    out = asof_join(
        facts,
        hist,
        key_cols=("user_id",),
        left_ts="ts",
        right_ts="valid_from",
        value_cols=("state_at_purchase",),
        suffix="_v",
    )
    return out.select(
        "fact_id", "user_id", "ts",
        F.col("valid_from_v").alias("version_valid_from"),
        F.col("state_at_purchase_v").alias("state_at_purchase"),
    )


Q89_SQL = """
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
changes AS (
  SELECT user_id, ts AS valid_from, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
),
facts AS (
  SELECT event_id AS fact_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT f.fact_id, f.user_id, f.ts, max(c.valid_from) AS version_valid_from
  FROM facts f LEFT JOIN changes c
    ON c.user_id = f.user_id AND c.valid_from <= f.ts
  GROUP BY 1, 2, 3
)
SELECT m.fact_id, m.user_id, m.ts, m.version_valid_from,
       c.event_type AS state_at_purchase
FROM matched m LEFT JOIN changes c
  ON c.user_id = m.user_id AND c.valid_from = m.version_valid_from
"""


# --------------------------------------------------------------------- q90

GAPFILL_START = dt.datetime(2024, 1, 1)
GAPFILL_END = dt.datetime(2024, 1, 30)


def q90_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63: calendar-spine gap filling — the time-series densification
    every reporting layer needs: per (event_type, day) counts with
    ZERO-filled rows for days a type fired no events. The spine is
    generated map-side: explode(sequence(...)) of |days| literal
    timestamps directly against the distinct type list — a Generate
    node, NOT a join, so the plan has no cross/nested-loop join at
    all. At 100 TB the only full-data work is the one count/sum
    shuffle; the spine never grows with the data."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_money_cents("value")).alias("_v"),
    )
    spine = e.select("event_type").distinct().select(
        "event_type",
        F.explode(
            F.sequence(
                F.lit(GAPFILL_START).cast("timestamp_ntz"),
                F.lit(GAPFILL_END).cast("timestamp_ntz"),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    out = spine.join(F.broadcast(daily), ["event_type", "day"], "left")
    return out.select(
        "event_type",
        "day",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        _cents_out(F.coalesce(F.col("_v"), F.lit(0))).alias("total_value"),
    )


Q90_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
         sum(CAST(value * 100 AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT generate_series AS day
    FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
                         INTERVAL 1 DAY)
  ) d
)
SELECT s.event_type, s.day,
       CAST(coalesce(dl.n, 0) AS BIGINT) AS n_events,
       CAST(coalesce(dl.v, 0) AS BIGINT) / 100.0 AS total_value
FROM spine s
LEFT JOIN daily dl ON dl.event_type = s.event_type AND dl.day = s.day
"""


# --------------------------------------------------------------------- q91

def q91_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64: Pearson correlation per group from EXACT integer power
    sums — the distributed-statistics pattern that stays deterministic
    on any cluster: per-row cents products fit BIGINT, sums accumulate
    in DECIMAL(38,0) (order-independent, no float drift across
    partition merges), and only the final fixed-order double formula
    touches floating point. Both engines run the identical IEEE ops on
    identical inputs, so the result is bit-reproducible — unlike the
    builtin ``corr`` (a float running aggregate whose value depends on
    partition merge order). One hash-agg shuffle of |groups| partials.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _money_cents("l_quantity").alias("x"),
        _money_cents("l_extendedprice").alias("y"),
    )

    # Product sums in hi/lo BIGINT halves, not DECIMAL(38,0): decimal
    # aggregation drops the hash-agg off the primitive codegen path
    # (measured 6.8s -> ~1s at sf0.1 for this query). Each product p
    # splits as p = hi*2^20 + lo; both halves sum in longs (lo < 2^20
    # so its sum holds to ~2^43 rows; hi <= p/2^20 ~ 2^27 here so its
    # sum holds to ~2^36 rows) and the EXACT p-sum is reassembled in
    # DECIMAL(38,0) on the |groups|-row aggregate — bit-identical to
    # the oracle's decimal sums, at primitive-sum cost. Beyond ~10^10
    # rows per group, swap the halves' sums to decimal (or split at a
    # higher shift): the reassembly stays exact either way.
    SPLIT = 1 << 20

    def hi(c: F.Column) -> F.Column:
        return (c / F.lit(SPLIT)).cast("long")  # floor div: products >= 0

    def lo(c: F.Column) -> F.Column:
        return c % F.lit(SPLIT)

    xy = F.col("x") * F.col("y")
    xx = F.col("x") * F.col("x")
    yy = F.col("y") * F.col("y")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx_l"),
        F.sum("y").alias("sy_l"),
        F.sum(hi(xy)).alias("sxy_h"),
        F.sum(lo(xy)).alias("sxy_l"),
        F.sum(hi(xx)).alias("sxx_h"),
        F.sum(lo(xx)).alias("sxx_l"),
        F.sum(hi(yy)).alias("syy_h"),
        F.sum(lo(yy)).alias("syy_l"),
    )

    def reassemble(h: str, l: str) -> F.Column:
        return (
            F.col(h).cast("decimal(38,0)") * F.lit(SPLIT) + F.col(l).cast("decimal(38,0)")
        ).cast("double")

    nd = F.col("n").cast("double")
    sx = F.col("sx_l").cast("double")
    sy = F.col("sy_l").cast("double")
    sxy = reassemble("sxy_h", "sxy_l")
    sxx = reassemble("sxx_h", "sxx_l")
    syy = reassemble("syy_h", "syy_l")
    corr = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_items"),
        ((sx / nd) / F.lit(100.0)).alias("mean_qty"),
        ((sy / nd) / F.lit(100.0)).alias("mean_price"),
        corr.alias("corr_qty_price"),
    )


Q91_SQL = f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(l_quantity * 100 AS BIGINT) AS x,
         CAST(l_extendedprice * 100 AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(x AS DECIMAL(38,0))) AS sx,
         sum(CAST(y AS DECIMAL(38,0))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM c GROUP BY 1
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_items,
       (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS mean_qty,
       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS mean_price,
       ((CAST(n AS DOUBLE) * {_dec2dbl_sql('sxy')})
          - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
       / (sqrt((CAST(n AS DOUBLE) * {_dec2dbl_sql('sxx')})
                 - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * sqrt((CAST(n AS DOUBLE) * {_dec2dbl_sql('syy')})
                 - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
         AS corr_qty_price
FROM s
"""


# --------------------------------------------------------------------- q92

def q92_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X65: EXACT ntile decile assignment + per-decile profile,
    computed fully DISTRIBUTED (round-10: this was the surface's last
    single-reducer total-order window — `ntile(10) OVER (ORDER BY …)`
    moves every row to one task).

    The distributed-exact-rank shape (the classic zipWithIndex
    construction, in DataFrame form):

    1. ``repartitionByRange(p, key)`` — the range exchange SAMPLES
       boundaries instead of sorting on one task; the composite key
       makes the tuple order total, so no tie spans a partition.
    2. rank = per-partition ``row_number`` (a window partitioned by
       ``spark_partition_id`` — 32 independent sorts, no global one)
       + that partition's prefix offset.
    3. Offsets come from the |partitions|-row count vector — a
       driver-side collect of 32 rows joined back via broadcast
       (manifest-class, same as watermark scalars).
    4. rank → decile in closed form (ntile's exact fill rule: the
       first ``n mod 10`` deciles hold ``⌈n/10⌉`` rows): no second
       pass, no global structure beyond the 32 offsets.

    The ranked frame is registered with the cache lifecycle
    (``cache.persist``) across the two actions (count vector + the
    caller's consumption) so the SAMPLED range boundaries are read
    once — an unpinned recomputation could legally re-sample and
    shift the offsets; runners release it via ``cache.clear_all``
    between queries, like every self-joined intermediate. Semantics
    are pinned row-exactly against DuckDB's real ``ntile`` by the
    oracle. Ties broken deterministically by (price, order key)."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", _money_cents("o_totalprice").alias("p")
    )
    n_parts = 32
    local = cache.persist(
        o.repartitionByRange(
            n_parts, F.col("p").asc(), F.col("o_orderkey").asc()
        )
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(
                    F.col("p").asc(), F.col("o_orderkey").asc()
                )
            ),
        )
    )
    counts = {
        r["__pid"]: r["c"]
        for r in local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # |partitions| rows — manifest-class collect
    }
    n = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = local_rows_df(spark, offsets, "__pid int, __off long")
    base, rem = n // 10, n % 10
    cut = rem * (base + 1)
    rank = (F.col("__off") + F.col("__lr")).cast("long")
    if rem == 0:
        decile = F.floor((rank - 1) / F.lit(base)) + 1
    else:
        decile = F.when(
            rank <= cut, F.floor((rank - 1) / F.lit(base + 1)) + 1
        ).otherwise(
            F.lit(rem) + F.floor((rank - 1 - cut) / F.lit(base)) + 1
        )
    d = (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn("decile", decile.cast("int"))
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _cents_out(F.min("p")).alias("min_total"),
        _cents_out(F.max("p")).alias("max_total"),
        _cents_out(F.sum("p")).alias("sum_total"),
    )


Q92_SQL = """
WITH d AS (
  SELECT CAST(o_totalprice * 100 AS BIGINT) AS p,
         ntile(10) OVER (ORDER BY CAST(o_totalprice * 100 AS BIGINT) ASC,
                         o_orderkey ASC) AS decile
  FROM orders
)
SELECT decile, count(*) AS n_orders,
       CAST(min(p) AS BIGINT) / 100.0 AS min_total,
       CAST(max(p) AS BIGINT) / 100.0 AS max_total,
       CAST(sum(p) AS BIGINT) / 100.0 AS sum_total
FROM d GROUP BY 1
"""


# --------------------------------------------------------------------- q93

def q93_window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66: first_value / last_value / nth_value over an explicit
    unbounded frame — each order row carries its customer's first,
    latest, and second order totals. All three functions share ONE
    window spec, so the plan has a single customer-key shuffle and a
    single sort; the frame is explicit because last_value over the
    default frame (UNBOUNDED PRECEDING..CURRENT ROW) is a footgun both
    engines agree on but nobody wants."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        "o_orderdate",
        _money_cents("o_totalprice").alias("p"),
    )
    w = (
        Window.partitionBy("customer_id")
        .orderBy(F.col("o_orderdate").asc(), F.col("order_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "customer_id",
        "order_id",
        _cents_out(F.col("p")).alias("order_total"),
        _cents_out(F.first_value(F.col("p")).over(w)).alias("first_total"),
        _cents_out(F.last_value(F.col("p")).over(w)).alias("last_total"),
        _cents_out(F.nth_value(F.col("p"), 2).over(w)).alias("second_total"),
    )


Q93_SQL = """
SELECT o_custkey AS customer_id, o_orderkey AS order_id,
       CAST(p AS BIGINT) / 100.0 AS order_total,
       CAST(first_value(p) OVER w AS BIGINT) / 100.0 AS first_total,
       CAST(last_value(p) OVER w AS BIGINT) / 100.0 AS last_total,
       CAST(nth_value(p, 2) OVER w AS BIGINT) / 100.0 AS second_total
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(o_totalprice * 100 AS BIGINT) AS p
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------- q94

#: Maximal lowercase runs of >= 5 letters. Both regex engines (Java in
#: Spark, RE2 in DuckDB) produce identical maximal matches for this
#: pure character-class pattern — stick to the dialect-safe subset
#: (no backrefs, no lookaround, which RE2 rejects anyway).
LONGWORD_RE = "[a-z]{5,}"
LONGWORD_TOPK = 30


def q94_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67: regexp_extract_all + explode — the multi-match extraction
    surface (one row per regex hit, not just the first match), ranked
    into a deterministic top-k vocabulary of long words. The regex
    runs scan-side (narrow); the shuffle moves |distinct words|
    count partials; top-k is TakeOrderedAndProject (no global sort).
    """
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(LONGWORD_RE), 0)
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
        .limit(LONGWORD_TOPK)
        .select("word", F.col("n_occurrences").cast("bigint").alias("n_occurrences"))
    )


Q94_SQL = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{LONGWORD_RE}')) AS word
  FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
FROM words GROUP BY word
ORDER BY n_occurrences DESC, word ASC
LIMIT {LONGWORD_TOPK}
"""


# --------------------------------------------------------------------- q95

def q95_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68: time-series OHLC downsampling — purchase values resampled
    to one (open, high, low, close, volume) bar per day. Open/close
    are ORDER-dependent aggregates, pinned deterministically by
    (ts, event_id) row_number; the close reuses the same ascending
    sort via the partition rowcount (rn == n_rows) instead of a second
    descending window, so the plan carries ONE day-key shuffle and ONE
    sort. At 100 TB each day's bar derives from a single partial-agg
    pass; day is also the natural write-partition column."""
    from pyspark.sql.window import Window

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "ts",
            "event_id",
            _money_cents("value").alias("v"),
        )
    )
    w_asc = Window.partitionBy("day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_all = Window.partitionBy("day")
    d = e.select(
        "day",
        "v",
        F.row_number().over(w_asc).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_nr"),
    )
    return d.groupBy("day").agg(
        _cents_out(F.max(F.when(F.col("_rn") == 1, F.col("v")))).alias("open_value"),
        _cents_out(F.max("v")).alias("high_value"),
        _cents_out(F.min("v")).alias("low_value"),
        _cents_out(
            F.max(F.when(F.col("_rn") == F.col("_nr"), F.col("v")))
        ).alias("close_value"),
        F.count(F.lit(1)).alias("n_trades"),
        _cents_out(F.sum("v")).alias("volume"),
    )


Q95_SQL = """
WITH p AS (
  SELECT date_trunc('day', ts) AS day, ts, event_id,
         CAST(value * 100 AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT day, v,
         row_number() OVER (PARTITION BY day ORDER BY ts ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY day) AS nr
  FROM p
)
SELECT day,
       CAST(max(CASE WHEN rn = 1 THEN v END) AS BIGINT) / 100.0 AS open_value,
       CAST(max(v) AS BIGINT) / 100.0 AS high_value,
       CAST(min(v) AS BIGINT) / 100.0 AS low_value,
       CAST(max(CASE WHEN rn = nr THEN v END) AS BIGINT) / 100.0 AS close_value,
       count(*) AS n_trades,
       CAST(sum(v) AS BIGINT) / 100.0 AS volume
FROM r GROUP BY 1
"""


# --------------------------------------------------------------------- q96

Q96_JSON_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", ".q96_json_land"
)


def q96_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69: JSON-lines reader/sink round-trip ON DISK (q77's CSV twin,
    sources/readers.py:read_json_lines — schema-enforced, PERMISSIVE
    with quarantine column): events are written to newline-delimited
    JSON (the event-feed landing format), read back through the
    engine's JSON reader, and aggregated. The oracle computes the same
    aggregate from the ORIGINAL parquet — the round-trip must preserve
    every value bit-exactly, including sub-second timestamps (ISO
    micros round-trip) and doubles (Java shortest-representation
    formatting re-parses to the identical bits)."""
    import shutil as _sh

    from pyspark.sql import types as T

    from product_analytics_spark.sources import readers

    _sh.rmtree(Q96_JSON_DIR, ignore_errors=True)
    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ts_type = e.schema["ts"].dataType
    # Micros-precision format on BOTH sides: Spark's JSON default is
    # millis-only and would silently truncate .845357 -> .845000.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    e.write.mode("overwrite").option("timestampFormat", ts_fmt).option(
        "timestampNTZFormat", ts_fmt
    ).json(Q96_JSON_DIR)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = readers.read_json_lines(spark, Q96_JSON_DIR, schema, timestamp_format=ts_fmt)
    good, _rejects = readers.split_rejects(back)
    return good.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("user_id").cast("bigint").alias("sum_user_ids"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        _cents_out(F.sum(_money_cents("value"))).alias("total_value"),
    )


Q96_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(user_id) AS BIGINT) AS sum_user_ids,
       min(ts) AS first_ts, max(ts) AS last_ts,
       CAST(sum(CAST(value * 100 AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------- q97

def q97_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X70: the Python UDTF / LATERAL table-function door
    (functions/udtfs.py — SURVEY.md §2.10). A user-defined row
    expander (whitespace tokenizer) registered on the session and
    invoked through SQL ``LATERAL``, then aggregated per language.
    Deliberately the SLOW path: the engine's position is that UDTFs
    exist for logic built-ins can't express, and the built-in twin
    (explode(split)) is row-for-row equivalent (pytest-asserted) and
    ~10-100x faster. Arrow-batched when the runtime supports it;
    documents is the smallest table, so the Python hop is bounded."""
    from product_analytics_spark.functions import udtfs

    udtfs.register_all(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("q97_docs")
    toks = spark.sql(
        """
        SELECT d.lang, t.pos, t.token
        FROM q97_docs d, LATERAL tokenize(d.text) t
        """
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("token")).alias("n_distinct_tokens"),
        F.sum(F.length("token")).cast("bigint").alias("total_token_chars"),
        F.max("pos").cast("int").alias("max_token_pos"),
    )


Q97_SQL = """
WITH per_doc AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
toks AS (
  SELECT lang, unnest(toks) AS token, len(toks) AS n_doc FROM per_doc
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
       CAST(sum(length(token)) AS BIGINT) AS total_token_chars,
       CAST(max(n_doc) - 1 AS INT) AS max_token_pos
FROM toks GROUP BY 1
"""


# --------------------------------------------------------------------- q98

def q98_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71: time-WEIGHTED average (TWAP) — the step-function integral
    every pricing/telemetry pipeline needs: each observation holds its
    value until the next one (or the end of the day), so the day's
    average weighs values by their holding time, not their count.
    ONE (event_type, day)-key shuffle serves both the lead() window
    and the final aggregate (same partition keys). Exact arithmetic:
    cents x micros products stay in BIGINT (bounded by
    max_cents·86400e6 per group-day, ~2^50), the single
    double-division at the end is IEEE-identical in both engines."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        _money_cents("value").alias("v"),
    )
    w = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )

    def micros(c: F.Column) -> F.Column:
        return F.unix_micros(c.cast("timestamp"))

    nxt = F.lead("ts").over(w)
    day_end = F.col("day") + F.expr("interval 1 day")
    wt = micros(F.coalesce(nxt, day_end)) - micros(F.col("ts"))
    d = e.select("event_type", "day", "v", wt.alias("_w"))
    return d.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.sum(F.col("v") * F.col("_w")).cast("double") / F.sum("_w").cast("double"))
            / F.lit(100.0)
        ).alias("twap_value"),
        (F.sum("_w").cast("double") / F.lit(1000000.0)).alias("covered_seconds"),
    )


Q98_SQL = """
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
         CAST(value * 100 AS BIGINT) AS v
  FROM events
),
wts AS (
  SELECT event_type, day, v,
         epoch_us(coalesce(
           lead(ts) OVER (PARTITION BY event_type, day ORDER BY ts ASC, event_id ASC),
           day + INTERVAL 1 DAY
         )) - epoch_us(ts) AS w
  FROM b
)
SELECT event_type, day, count(*) AS n_events,
       (CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)) / 100.0 AS twap_value,
       CAST(sum(w) AS DOUBLE) / 1000000.0 AS covered_seconds
FROM wts GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q99

def q99_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72: mutual nearest neighbors — the entity-resolution /
    bitext-mining primitive: pairs (a, b) where b is a's top-1
    neighbor AND a is b's top-1 neighbor (within IVF cells, q85's
    kernel at k=1). Mutuality is the classic high-precision match
    filter: one-directional nearest neighbors are noisy, reciprocal
    ones overwhelmingly true matches. The k-NN relation is persisted
    and self-joined on the reversed key — 16-byte rows, broadcastable
    at |corpus| scale since it holds ONE row per vector."""
    emb = _t(spark, sf_dir, "embeddings")
    nn = cache.persist(
        similarity.knn_join_ivf(
            emb,
            centroids=similarity.CENTROIDS_FINE,
            k=1,
            dim=EMBEDDING_DIM,
            cap_per_cell=NEAR_DUP_CAP_PER_CELL,
        )
    )
    a = nn.select("vec_id", "neighbor_id", "cosine_sim")
    b = nn.select(
        F.col("vec_id").alias("_bv"), F.col("neighbor_id").alias("_bn")
    )
    mutual = a.join(
        b, (F.col("neighbor_id") == F.col("_bv")) & (F.col("vec_id") == F.col("_bn"))
    ).filter(F.col("vec_id") < F.col("neighbor_id"))
    return mutual.select(
        F.col("vec_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "cosine_sim",
    )


def _q99_sql() -> str:
    return f"""
WITH {_knn_ctes()},
nn AS (SELECT vec_id, neighbor_id, sim FROM r WHERE rank = 1)
SELECT n1.vec_id AS id_a, n1.neighbor_id AS id_b, round(n1.sim, 4) AS cosine_sim
FROM nn n1 JOIN nn n2
  ON n2.vec_id = n1.neighbor_id AND n2.neighbor_id = n1.vec_id
WHERE n1.vec_id < n1.neighbor_id
"""


QUERIES = {
    "q01_scan_project": q01_scan_project,
    "q02_filter_predicates": q02_filter_predicates,
    "q03_dedup_latest": q03_dedup_latest,
    "q04_case_canonicalize": q04_case_canonicalize,
    "q05_financial_clamp": q05_financial_clamp,
    "q06_string_validate": q06_string_validate,
    "q07_date_enrich": q07_date_enrich,
    "q08_datediff_metrics": q08_datediff_metrics,
    "q09_left_join_validate": q09_left_join_validate,
    "q10_group_metrics": q10_group_metrics,
    "q11_rfm_scores": q11_rfm_scores,
    "q12_multi_join_dim": q12_multi_join_dim,
    "q13_watermark_filter": q13_watermark_filter,
    "q14_first_seen_backfill": q14_first_seen_backfill,
    "q15_quality_score": q15_quality_score,
    "q16_geo_mapping": q16_geo_mapping,
    "q17_incremental_merge": q17_incremental_merge,
    "q18_json_extract": q18_json_extract,
    "q19_exact_dedup": q19_exact_dedup,
    "q20_fuzzy_dedup": q20_fuzzy_dedup,
    "q21_similarity_topk": q21_similarity_topk,
    "q22_text_stats": q22_text_stats,
    "q23_sessionize": q23_sessionize,
    "q24_tumbling_window_agg": q24_tumbling_window_agg,
    "q25_simhash_near_dup": q25_simhash_near_dup,
    "q26_ngram_jaccard_pairs": q26_ngram_jaccard_pairs,
    "q27_embedding_near_dup": q27_embedding_near_dup,
    "q28_lsh_bucket_topk": q28_lsh_bucket_topk,
    "q29_language_id": q29_language_id,
    "q30_text_quality": q30_text_quality,
    "q31_fingerprint_groups": q31_fingerprint_groups,
    "q32_multimodal_features": q32_multimodal_features,
    "q33_rollup_agg": q33_rollup_agg,
    "q34_topk_per_group": q34_topk_per_group,
    "q35_asof_join": q35_asof_join,
    "q36_sliding_window_agg": q36_sliding_window_agg,
    "q37_set_ops": q37_set_ops,
    "q38_pivot_counts": q38_pivot_counts,
    "q39_ivf_ann_topk": q39_ivf_ann_topk,
    "q40_snapshot_merge_write": q40_snapshot_merge_write,
    "q41_percentiles": q41_percentiles,
    "q42_running_and_moving_agg": q42_running_and_moving_agg,
    "q43_cube_agg": q43_cube_agg,
    "q44_semi_anti_join": q44_semi_anti_join,
    "q45_unpivot_long": q45_unpivot_long,
    "q46_histogram": q46_histogram,
    "q47_data_quality_report": q47_data_quality_report,
    "q48_scd2_history": q48_scd2_history,
    "q49_train_test_split": q49_train_test_split,
    "q50_stratified_sample": q50_stratified_sample,
    "q51_vocab_topk": q51_vocab_topk,
    "q52_pii_mask": q52_pii_mask,
    "q53_doc_chunking": q53_doc_chunking,
    "q54_contamination_screen": q54_contamination_screen,
    "q55_salted_skew_agg": q55_salted_skew_agg,
    "q56_dup_clusters": q56_dup_clusters,
    "q57_funnel_conversion": q57_funnel_conversion,
    "q58_cohort_retention": q58_cohort_retention,
    "q59_tfidf_terms": q59_tfidf_terms,
    "q60_weighted_sample": q60_weighted_sample,
    "q61_kmeans_update": q61_kmeans_update,
    "q62_winsorized_stats": q62_winsorized_stats,
    "q63_interval_join": q63_interval_join,
    "q64_sequence_packing": q64_sequence_packing,
    "q65_repetition_signals": q65_repetition_signals,
    "q66_mixture_sample": q66_mixture_sample,
    "q67_vocab_apply": q67_vocab_apply,
    "q68_corpus_pipeline": q68_corpus_pipeline,
    "q69_edit_distance_pairs": q69_edit_distance_pairs,
    "q70_moments_profile": q70_moments_profile,
    "q71_mode_per_group": q71_mode_per_group,
    "q72_equidepth_bins": q72_equidepth_bins,
    "q73_event_transitions": q73_event_transitions,
    "q74_bigram_counts": q74_bigram_counts,
    "q75_snapshot_diff": q75_snapshot_diff,
    "q76_group_concat_topk": q76_group_concat_topk,
    "q77_csv_roundtrip": q77_csv_roundtrip,
    "q78_asof_forward": q78_asof_forward,
    "q79_first_touch_attribution": q79_first_touch_attribution,
    "q80_rolling_distinct_users": q80_rolling_distinct_users,
    "q81_rank_family": q81_rank_family,
    "q82_array_hof": q82_array_hof,
    "q83_schema_evolution_union": q83_schema_evolution_union,
    "q84_above_group_avg": q84_above_group_avg,
    "q85_knn_join": q85_knn_join,
    "q86_grouping_sets": q86_grouping_sets,
    "q87_string_suite": q87_string_suite,
    "q88_incremental_dedup": q88_incremental_dedup,
    "q89_pit_join": q89_pit_join,
    "q90_gap_fill": q90_gap_fill,
    "q91_correlation": q91_correlation,
    "q92_ntile_deciles": q92_ntile_deciles,
    "q93_window_value_family": q93_window_value_family,
    "q94_regex_extract_all": q94_regex_extract_all,
    "q95_ohlc_downsample": q95_ohlc_downsample,
    "q96_json_roundtrip": q96_json_roundtrip,
    "q97_udtf_tokenize": q97_udtf_tokenize,
    "q98_twap": q98_twap,
    "q99_mutual_nn": q99_mutual_nn,
}

ORACLES = {
    "q01_scan_project": Q01_SQL,
    "q02_filter_predicates": Q02_SQL,
    "q03_dedup_latest": Q03_SQL,
    "q04_case_canonicalize": Q04_SQL,
    "q05_financial_clamp": Q05_SQL,
    "q06_string_validate": Q06_SQL,
    "q07_date_enrich": Q07_SQL,
    "q08_datediff_metrics": Q08_SQL,
    "q09_left_join_validate": Q09_SQL,
    "q10_group_metrics": Q10_SQL,
    "q11_rfm_scores": Q11_SQL,
    "q12_multi_join_dim": Q12_SQL,
    "q13_watermark_filter": Q13_SQL,
    "q14_first_seen_backfill": Q14_SQL,
    "q15_quality_score": Q15_SQL,
    "q16_geo_mapping": Q16_SQL,
    "q17_incremental_merge": Q17_SQL,
    "q18_json_extract": Q18_SQL,
    "q19_exact_dedup": Q19_SQL,
    "q20_fuzzy_dedup": _q20_sql(),
    "q21_similarity_topk": Q21_SQL,
    "q22_text_stats": Q22_SQL,
    "q23_sessionize": Q23_SQL,
    "q24_tumbling_window_agg": Q24_SQL,
    "q25_simhash_near_dup": _q25_sql(),
    "q26_ngram_jaccard_pairs": _q26_sql(),
    "q27_embedding_near_dup": _q27_sql(),
    "q28_lsh_bucket_topk": _q28_sql(),
    "q29_language_id": _q29_sql(),
    "q30_text_quality": Q30_SQL,
    "q31_fingerprint_groups": Q31_SQL,
    "q32_multimodal_features": Q32_SQL,
    "q33_rollup_agg": Q33_SQL,
    "q34_topk_per_group": Q34_SQL,
    "q35_asof_join": Q35_SQL,
    "q36_sliding_window_agg": Q36_SQL,
    "q37_set_ops": Q37_SQL,
    "q38_pivot_counts": Q38_SQL,
    "q39_ivf_ann_topk": _q39_sql(),
    "q40_snapshot_merge_write": Q40_SQL,
    "q41_percentiles": Q41_SQL,
    "q42_running_and_moving_agg": Q42_SQL,
    "q43_cube_agg": Q43_SQL,
    "q44_semi_anti_join": Q44_SQL,
    "q45_unpivot_long": Q45_SQL,
    "q46_histogram": Q46_SQL,
    "q47_data_quality_report": Q47_SQL,
    "q48_scd2_history": Q48_SQL,
    "q49_train_test_split": Q49_SQL,
    "q50_stratified_sample": Q50_SQL,
    "q51_vocab_topk": Q51_SQL,
    "q52_pii_mask": Q52_SQL,
    "q53_doc_chunking": Q53_SQL,
    "q54_contamination_screen": _q54_sql(),
    "q55_salted_skew_agg": Q55_SQL,
    "q56_dup_clusters": _q56_sql(),
    "q57_funnel_conversion": _q57_sql(),
    "q58_cohort_retention": Q58_SQL,
    "q59_tfidf_terms": Q59_SQL,
    "q60_weighted_sample": _q60_sql(),
    "q61_kmeans_update": _q61_sql(),
    "q62_winsorized_stats": Q62_SQL,
    "q63_interval_join": Q63_SQL,
    "q64_sequence_packing": _q64_sql(),
    "q65_repetition_signals": Q65_SQL,
    "q66_mixture_sample": _q66_sql(),
    "q67_vocab_apply": Q67_SQL,
    "q68_corpus_pipeline": _q68_sql(),
    "q69_edit_distance_pairs": Q69_SQL,
    "q70_moments_profile": Q70_SQL,
    "q71_mode_per_group": Q71_SQL,
    "q72_equidepth_bins": _q72_sql(),
    "q73_event_transitions": Q73_SQL,
    "q74_bigram_counts": Q74_SQL,
    "q75_snapshot_diff": Q75_SQL,
    "q76_group_concat_topk": Q76_SQL,
    "q77_csv_roundtrip": Q77_SQL,
    "q78_asof_forward": Q78_SQL,
    "q79_first_touch_attribution": Q79_SQL,
    "q80_rolling_distinct_users": Q80_SQL,
    "q81_rank_family": Q81_SQL,
    "q82_array_hof": Q82_SQL,
    "q83_schema_evolution_union": Q83_SQL,
    "q84_above_group_avg": Q84_SQL,
    "q85_knn_join": _q85_sql(),
    "q86_grouping_sets": Q86_SQL,
    "q87_string_suite": Q87_SQL,
    "q88_incremental_dedup": _q88_sql(),
    "q89_pit_join": Q89_SQL,
    "q90_gap_fill": Q90_SQL,
    "q91_correlation": Q91_SQL,
    "q92_ntile_deciles": Q92_SQL,
    "q93_window_value_family": Q93_SQL,
    "q94_regex_extract_all": Q94_SQL,
    "q95_ohlc_downsample": Q95_SQL,
    "q96_json_roundtrip": Q96_SQL,
    "q97_udtf_tokenize": Q97_SQL,
    "q98_twap": Q98_SQL,
    "q99_mutual_nn": _q99_sql(),
}


# ------------------------------------------------------------- q100+
# Round-3 extension families live in driver_queries_ext.py (same
# helper discipline via qcommon); merge them into the driver surface.
from product_analytics_spark.driver_queries_ext import (  # noqa: E402
    ORACLES_EXT,
    QUERIES_EXT,
)

QUERIES.update(QUERIES_EXT)
ORACLES.update(ORACLES_EXT)

from product_analytics_spark.driver_queries_ext3 import (  # noqa: E402
    ORACLES_EXT3,
    QUERIES_EXT3,
)

QUERIES.update(QUERIES_EXT3)
ORACLES.update(ORACLES_EXT3)

from product_analytics_spark.driver_queries_ext4 import (  # noqa: E402
    ORACLES_EXT4,
    QUERIES_EXT4,
    _q134_sql,
)

QUERIES.update(QUERIES_EXT4)
ORACLES.update(ORACLES_EXT4)
# q134 composes Q21/Q28 oracle SQL; resolve after those are defined.
ORACLES["q134_ann_recall"] = _q134_sql()

from product_analytics_spark.driver_queries_ext5 import (  # noqa: E402
    ORACLES_EXT5,
    QUERIES_EXT5,
)

QUERIES.update(QUERIES_EXT5)
ORACLES.update(ORACLES_EXT5)

from product_analytics_spark.driver_queries_ext6 import (  # noqa: E402
    ORACLES_EXT6,
    QUERIES_EXT6,
)

QUERIES.update(QUERIES_EXT6)
ORACLES.update(ORACLES_EXT6)

from product_analytics_spark.driver_queries_ext7 import (  # noqa: E402
    ORACLES_EXT7,
    QUERIES_EXT7,
)

QUERIES.update(QUERIES_EXT7)
ORACLES.update(ORACLES_EXT7)

from product_analytics_spark.driver_queries_ext8 import (  # noqa: E402
    ORACLES_EXT8,
    QUERIES_EXT8,
)

QUERIES.update(QUERIES_EXT8)
ORACLES.update(ORACLES_EXT8)

from product_analytics_spark.driver_queries_ext9 import (  # noqa: E402
    ORACLES_EXT9,
    QUERIES_EXT9,
)

QUERIES.update(QUERIES_EXT9)
ORACLES.update(ORACLES_EXT9)

from product_analytics_spark.driver_queries_ext10 import (  # noqa: E402
    ORACLES_EXT10,
    QUERIES_EXT10,
)

QUERIES.update(QUERIES_EXT10)
ORACLES.update(ORACLES_EXT10)

from product_analytics_spark.driver_queries_ext11 import (  # noqa: E402
    ORACLES_EXT11,
    QUERIES_EXT11,
)

QUERIES.update(QUERIES_EXT11)
ORACLES.update(ORACLES_EXT11)

from product_analytics_spark.driver_queries_ext12 import (  # noqa: E402
    ORACLES_EXT12,
    QUERIES_EXT12,
)

QUERIES.update(QUERIES_EXT12)
ORACLES.update(ORACLES_EXT12)

from product_analytics_spark.driver_queries_ext13 import (  # noqa: E402
    ORACLES_EXT13,
    QUERIES_EXT13,
)

QUERIES.update(QUERIES_EXT13)
ORACLES.update(ORACLES_EXT13)

from product_analytics_spark.driver_queries_ext14 import (  # noqa: E402
    QUERIES_EXT14,
    _oracles_ext14,
)

QUERIES.update(QUERIES_EXT14)
ORACLES.update(_oracles_ext14())

from product_analytics_spark.driver_queries_ext15 import (  # noqa: E402
    ORACLES_EXT15,
    QUERIES_EXT15,
)

QUERIES.update(QUERIES_EXT15)
ORACLES.update(ORACLES_EXT15)

from product_analytics_spark.driver_queries_ext16 import (  # noqa: E402
    ORACLES_EXT16,
    QUERIES_EXT16,
)

QUERIES.update(QUERIES_EXT16)
ORACLES.update(ORACLES_EXT16)

from product_analytics_spark.driver_queries_ext17 import (  # noqa: E402
    ORACLES_EXT17,
    QUERIES_EXT17,
)

QUERIES.update(QUERIES_EXT17)
ORACLES.update(ORACLES_EXT17)

from product_analytics_spark.driver_queries_ext18 import (  # noqa: E402
    ORACLES_EXT18,
    QUERIES_EXT18,
)

QUERIES.update(QUERIES_EXT18)
ORACLES.update(ORACLES_EXT18)

from product_analytics_spark.driver_queries_ext19 import (  # noqa: E402
    ORACLES_EXT19,
    QUERIES_EXT19,
)

QUERIES.update(QUERIES_EXT19)
ORACLES.update(ORACLES_EXT19)

from product_analytics_spark.driver_queries_ext20 import (  # noqa: E402
    QUERIES_EXT20,
    _oracles_ext20,
)

QUERIES.update(QUERIES_EXT20)
ORACLES.update(_oracles_ext20())

from product_analytics_spark.driver_queries_ext21 import (  # noqa: E402
    QUERIES_EXT21,
    _oracles_ext21,
)

QUERIES.update(QUERIES_EXT21)
ORACLES.update(_oracles_ext21())

from product_analytics_spark.driver_queries_ext22 import (  # noqa: E402
    QUERIES_EXT22,
    _oracles_ext22,
)

QUERIES.update(QUERIES_EXT22)
ORACLES.update(_oracles_ext22())

from product_analytics_spark.driver_queries_ext23 import (  # noqa: E402
    ORACLES_EXT23,
    QUERIES_EXT23,
)

QUERIES.update(QUERIES_EXT23)
ORACLES.update(ORACLES_EXT23)

from product_analytics_spark.driver_queries_ext24 import (  # noqa: E402
    QUERIES_EXT24,
    _oracles_ext24,
)

QUERIES.update(QUERIES_EXT24)
ORACLES.update(_oracles_ext24())

from product_analytics_spark.driver_queries_ext25 import (  # noqa: E402
    ORACLES_EXT25,
    QUERIES_EXT25,
)

QUERIES.update(QUERIES_EXT25)
ORACLES.update(ORACLES_EXT25)

from product_analytics_spark.driver_queries_ext26 import (  # noqa: E402
    QUERIES_EXT26,
    _oracles_ext26,
)

QUERIES.update(QUERIES_EXT26)
ORACLES.update(_oracles_ext26())

from product_analytics_spark.driver_queries_ext27 import (  # noqa: E402
    QUERIES_EXT27,
    _oracles_ext27,
)

QUERIES.update(QUERIES_EXT27)
ORACLES.update(_oracles_ext27())

from product_analytics_spark.driver_queries_ext28 import (  # noqa: E402
    QUERIES_EXT28,
    _oracles_ext28,
)

QUERIES.update(QUERIES_EXT28)
ORACLES.update(_oracles_ext28())

from product_analytics_spark.driver_queries_ext29 import (  # noqa: E402
    QUERIES_EXT29,
    _oracles_ext29,
)

QUERIES.update(QUERIES_EXT29)
ORACLES.update(_oracles_ext29())

from product_analytics_spark.driver_queries_ext30 import (  # noqa: E402
    QUERIES_EXT30,
    _oracles_ext30,
)

QUERIES.update(QUERIES_EXT30)
ORACLES.update(_oracles_ext30())

from product_analytics_spark.driver_queries_ext31 import (  # noqa: E402
    QUERIES_EXT31,
    _oracles_ext31,
)

QUERIES.update(QUERIES_EXT31)
ORACLES.update(_oracles_ext31())

from product_analytics_spark.driver_queries_ext32 import (  # noqa: E402
    QUERIES_EXT32,
    _oracles_ext32,
)

QUERIES.update(QUERIES_EXT32)
ORACLES.update(_oracles_ext32())

from product_analytics_spark.driver_queries_ext33 import (  # noqa: E402
    QUERIES_EXT33,
    _oracles_ext33,
)

QUERIES.update(QUERIES_EXT33)
ORACLES.update(_oracles_ext33())

from product_analytics_spark.driver_queries_ext34 import (  # noqa: E402
    QUERIES_EXT34,
    _oracles_ext34,
)

QUERIES.update(QUERIES_EXT34)
ORACLES.update(_oracles_ext34())

from product_analytics_spark.driver_queries_ext35 import (  # noqa: E402
    QUERIES_EXT35,
    _oracles_ext35,
)

QUERIES.update(QUERIES_EXT35)
ORACLES.update(_oracles_ext35())

from product_analytics_spark.driver_queries_ext36 import (  # noqa: E402
    QUERIES_EXT36,
    _oracles_ext36,
)

QUERIES.update(QUERIES_EXT36)
ORACLES.update(_oracles_ext36())

from product_analytics_spark.driver_queries_ext37 import (  # noqa: E402
    QUERIES_EXT37,
    _oracles_ext37,
)

QUERIES.update(QUERIES_EXT37)
ORACLES.update(_oracles_ext37())

from product_analytics_spark.driver_queries_ext38 import (  # noqa: E402
    QUERIES_EXT38,
    _oracles_ext38,
)

QUERIES.update(QUERIES_EXT38)
ORACLES.update(_oracles_ext38())

from product_analytics_spark.driver_queries_ext39 import (  # noqa: E402
    QUERIES_EXT39,
    _oracles_ext39,
)

QUERIES.update(QUERIES_EXT39)
ORACLES.update(_oracles_ext39())

from product_analytics_spark.driver_queries_ext40 import (  # noqa: E402
    QUERIES_EXT40,
    _oracles_ext40,
)

QUERIES.update(QUERIES_EXT40)
ORACLES.update(_oracles_ext40())

from product_analytics_spark.driver_queries_ext41 import (  # noqa: E402
    QUERIES_EXT41,
    _oracles_ext41,
)

QUERIES.update(QUERIES_EXT41)
ORACLES.update(_oracles_ext41())

from product_analytics_spark.driver_queries_ext42 import (  # noqa: E402
    QUERIES_EXT42,
    _oracles_ext42,
)

QUERIES.update(QUERIES_EXT42)
ORACLES.update(_oracles_ext42())

from product_analytics_spark.driver_queries_ext43 import (  # noqa: E402
    QUERIES_EXT43,
    _oracles_ext43,
)

QUERIES.update(QUERIES_EXT43)
ORACLES.update(_oracles_ext43())

from product_analytics_spark.driver_queries_ext44 import (  # noqa: E402
    QUERIES_EXT44,
    _oracles_ext44,
)

QUERIES.update(QUERIES_EXT44)
ORACLES.update(_oracles_ext44())

from product_analytics_spark.driver_queries_ext45 import (  # noqa: E402
    QUERIES_EXT45,
    _oracles_ext45,
)

QUERIES.update(QUERIES_EXT45)
ORACLES.update(_oracles_ext45())

from product_analytics_spark.driver_queries_ext46 import (  # noqa: E402
    QUERIES_EXT46,
    _oracles_ext46,
)

QUERIES.update(QUERIES_EXT46)
ORACLES.update(_oracles_ext46())

from product_analytics_spark.driver_queries_ext47 import (  # noqa: E402
    QUERIES_EXT47,
    _oracles_ext47,
)

QUERIES.update(QUERIES_EXT47)
ORACLES.update(_oracles_ext47())

from product_analytics_spark.driver_queries_ext48 import (  # noqa: E402
    QUERIES_EXT48,
    _oracles_ext48,
)

QUERIES.update(QUERIES_EXT48)
ORACLES.update(_oracles_ext48())

from product_analytics_spark.driver_queries_ext49 import (  # noqa: E402
    QUERIES_EXT49,
    _oracles_ext49,
)

QUERIES.update(QUERIES_EXT49)
ORACLES.update(_oracles_ext49())

from product_analytics_spark.driver_queries_ext50 import (  # noqa: E402
    QUERIES_EXT50,
    _oracles_ext50,
)

QUERIES.update(QUERIES_EXT50)
ORACLES.update(_oracles_ext50())

from product_analytics_spark.driver_queries_ext51 import (  # noqa: E402
    QUERIES_EXT51,
    _oracles_ext51,
)

QUERIES.update(QUERIES_EXT51)
ORACLES.update(_oracles_ext51())

from product_analytics_spark.driver_queries_ext52 import (  # noqa: E402
    QUERIES_EXT52,
    _oracles_ext52,
)

QUERIES.update(QUERIES_EXT52)
ORACLES.update(_oracles_ext52())

from product_analytics_spark.driver_queries_ext53 import (  # noqa: E402
    QUERIES_EXT53,
    _oracles_ext53,
)

QUERIES.update(QUERIES_EXT53)
ORACLES.update(_oracles_ext53())

from product_analytics_spark.driver_queries_ext54 import (  # noqa: E402
    QUERIES_EXT54,
    _oracles_ext54,
)

QUERIES.update(QUERIES_EXT54)
ORACLES.update(_oracles_ext54())

from product_analytics_spark.driver_queries_ext55 import (  # noqa: E402
    QUERIES_EXT55,
    _oracles_ext55,
)

QUERIES.update(QUERIES_EXT55)
ORACLES.update(_oracles_ext55())

from product_analytics_spark.driver_queries_ext56 import (  # noqa: E402
    QUERIES_EXT56,
    _oracles_ext56,
)

QUERIES.update(QUERIES_EXT56)
ORACLES.update(_oracles_ext56())

from product_analytics_spark.driver_queries_ext57 import (  # noqa: E402
    QUERIES_EXT57,
    _oracles_ext57,
)

QUERIES.update(QUERIES_EXT57)
ORACLES.update(_oracles_ext57())

from product_analytics_spark.driver_queries_ext58 import (  # noqa: E402
    QUERIES_EXT58,
    _oracles_ext58,
)

QUERIES.update(QUERIES_EXT58)
ORACLES.update(_oracles_ext58())

from product_analytics_spark.driver_queries_ext59 import (  # noqa: E402
    QUERIES_EXT59,
    _oracles_ext59,
)

QUERIES.update(QUERIES_EXT59)
ORACLES.update(_oracles_ext59())

from product_analytics_spark.driver_queries_ext60 import (  # noqa: E402
    QUERIES_EXT60,
    _oracles_ext60,
)

QUERIES.update(QUERIES_EXT60)
ORACLES.update(_oracles_ext60())

from product_analytics_spark.driver_queries_ext61 import (  # noqa: E402
    QUERIES_EXT61,
    _oracles_ext61,
)

QUERIES.update(QUERIES_EXT61)
ORACLES.update(_oracles_ext61())

from product_analytics_spark.driver_queries_ext62 import (  # noqa: E402
    QUERIES_EXT62,
    _oracles_ext62,
)

QUERIES.update(QUERIES_EXT62)
ORACLES.update(_oracles_ext62())

from product_analytics_spark.driver_queries_ext63 import (  # noqa: E402
    QUERIES_EXT63,
    _oracles_ext63,
)

QUERIES.update(QUERIES_EXT63)
ORACLES.update(_oracles_ext63())

from product_analytics_spark.driver_queries_ext64 import (  # noqa: E402
    QUERIES_EXT64,
    _oracles_ext64,
)

QUERIES.update(QUERIES_EXT64)
ORACLES.update(_oracles_ext64())

from product_analytics_spark.driver_queries_ext65 import (  # noqa: E402
    QUERIES_EXT65,
    _oracles_ext65,
)

QUERIES.update(QUERIES_EXT65)
ORACLES.update(_oracles_ext65())

from product_analytics_spark.driver_queries_ext66 import (  # noqa: E402
    QUERIES_EXT66,
    _oracles_ext66,
)

QUERIES.update(QUERIES_EXT66)
ORACLES.update(_oracles_ext66())

from product_analytics_spark.driver_queries_ext67 import (  # noqa: E402
    QUERIES_EXT67,
    _oracles_ext67,
)

QUERIES.update(QUERIES_EXT67)
ORACLES.update(_oracles_ext67())

from product_analytics_spark.driver_queries_ext68 import (  # noqa: E402
    QUERIES_EXT68,
    _oracles_ext68,
)

QUERIES.update(QUERIES_EXT68)
ORACLES.update(_oracles_ext68())

from product_analytics_spark.driver_queries_ext69 import (  # noqa: E402
    QUERIES_EXT69,
    _oracles_ext69,
)

QUERIES.update(QUERIES_EXT69)
ORACLES.update(_oracles_ext69())

from product_analytics_spark.driver_queries_ext70 import (  # noqa: E402
    QUERIES_EXT70,
    _oracles_ext70,
)

QUERIES.update(QUERIES_EXT70)
ORACLES.update(_oracles_ext70())

from product_analytics_spark.driver_queries_ext71 import (  # noqa: E402
    QUERIES_EXT71,
    _oracles_ext71,
)

QUERIES.update(QUERIES_EXT71)
ORACLES.update(_oracles_ext71())

from product_analytics_spark.driver_queries_ext72 import (  # noqa: E402
    QUERIES_EXT72,
    _oracles_ext72,
)

QUERIES.update(QUERIES_EXT72)
ORACLES.update(_oracles_ext72())

from product_analytics_spark.driver_queries_ext73 import (  # noqa: E402
    QUERIES_EXT73,
    _oracles_ext73,
)

QUERIES.update(QUERIES_EXT73)
ORACLES.update(_oracles_ext73())

from product_analytics_spark.driver_queries_ext74 import (  # noqa: E402
    QUERIES_EXT74,
    _oracles_ext74,
)

QUERIES.update(QUERIES_EXT74)
ORACLES.update(_oracles_ext74())

from product_analytics_spark.driver_queries_ext75 import (  # noqa: E402
    QUERIES_EXT75,
    _oracles_ext75,
)

QUERIES.update(QUERIES_EXT75)
ORACLES.update(_oracles_ext75())

from product_analytics_spark.driver_queries_ext76 import (  # noqa: E402
    QUERIES_EXT76,
    _oracles_ext76,
)

QUERIES.update(QUERIES_EXT76)
ORACLES.update(_oracles_ext76())

from product_analytics_spark.driver_queries_ext77 import (  # noqa: E402
    QUERIES_EXT77,
    _oracles_ext77,
)

QUERIES.update(QUERIES_EXT77)
ORACLES.update(_oracles_ext77())

from product_analytics_spark.driver_queries_ext78 import (  # noqa: E402
    QUERIES_EXT78,
    _oracles_ext78,
)

QUERIES.update(QUERIES_EXT78)
ORACLES.update(_oracles_ext78())

from product_analytics_spark.driver_queries_ext79 import (  # noqa: E402
    QUERIES_EXT79,
    _oracles_ext79,
)

QUERIES.update(QUERIES_EXT79)
ORACLES.update(_oracles_ext79())

from product_analytics_spark.driver_queries_ext80 import (  # noqa: E402
    QUERIES_EXT80,
    _oracles_ext80,
)

QUERIES.update(QUERIES_EXT80)
ORACLES.update(_oracles_ext80())

from product_analytics_spark.driver_queries_ext81 import (  # noqa: E402
    QUERIES_EXT81,
    _oracles_ext81,
)

QUERIES.update(QUERIES_EXT81)
ORACLES.update(_oracles_ext81())

from product_analytics_spark.driver_queries_ext82 import (  # noqa: E402
    QUERIES_EXT82,
    _oracles_ext82,
)

QUERIES.update(QUERIES_EXT82)
ORACLES.update(_oracles_ext82())

from product_analytics_spark.driver_queries_ext83 import (  # noqa: E402
    QUERIES_EXT83,
    _oracles_ext83,
)

QUERIES.update(QUERIES_EXT83)
ORACLES.update(_oracles_ext83())

from product_analytics_spark.driver_queries_ext84 import (  # noqa: E402
    QUERIES_EXT84,
    _oracles_ext84,
)

QUERIES.update(QUERIES_EXT84)
ORACLES.update(_oracles_ext84())

from product_analytics_spark.driver_queries_ext85 import (  # noqa: E402
    QUERIES_EXT85,
    _oracles_ext85,
)

QUERIES.update(QUERIES_EXT85)
ORACLES.update(_oracles_ext85())

from product_analytics_spark.driver_queries_ext86 import (  # noqa: E402
    QUERIES_EXT86,
    _oracles_ext86,
)

QUERIES.update(QUERIES_EXT86)
ORACLES.update(_oracles_ext86())

from product_analytics_spark.driver_queries_ext87 import (  # noqa: E402
    QUERIES_EXT87,
    _oracles_ext87,
)

QUERIES.update(QUERIES_EXT87)
ORACLES.update(_oracles_ext87())

from product_analytics_spark.driver_queries_ext88 import (  # noqa: E402
    QUERIES_EXT88,
    _oracles_ext88,
)

QUERIES.update(QUERIES_EXT88)
ORACLES.update(_oracles_ext88())

from product_analytics_spark.driver_queries_ext89 import (  # noqa: E402
    QUERIES_EXT89,
    _oracles_ext89,
)

QUERIES.update(QUERIES_EXT89)
ORACLES.update(_oracles_ext89())

from product_analytics_spark.driver_queries_ext90 import (  # noqa: E402
    QUERIES_EXT90,
    _oracles_ext90,
)

QUERIES.update(QUERIES_EXT90)
ORACLES.update(_oracles_ext90())

from product_analytics_spark.driver_queries_ext91 import (  # noqa: E402
    QUERIES_EXT91,
    _oracles_ext91,
)

QUERIES.update(QUERIES_EXT91)
ORACLES.update(_oracles_ext91())

from product_analytics_spark.driver_queries_ext92 import (  # noqa: E402
    QUERIES_EXT92,
    _oracles_ext92,
)

QUERIES.update(QUERIES_EXT92)
ORACLES.update(_oracles_ext92())

from product_analytics_spark.driver_queries_ext93 import (  # noqa: E402
    QUERIES_EXT93,
    _oracles_ext93,
)

QUERIES.update(QUERIES_EXT93)
ORACLES.update(_oracles_ext93())

from product_analytics_spark.driver_queries_ext94 import (  # noqa: E402
    QUERIES_EXT94,
    _oracles_ext94,
)

QUERIES.update(QUERIES_EXT94)
ORACLES.update(_oracles_ext94())

from product_analytics_spark.driver_queries_ext95 import (  # noqa: E402
    QUERIES_EXT95,
    _oracles_ext95,
)

QUERIES.update(QUERIES_EXT95)
ORACLES.update(_oracles_ext95())
