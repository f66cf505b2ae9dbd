"""Round-4 driver query families, batch 45 (q298-q301): four more
SQL-semantics conformance probes — ROWS-vs-RANGE frames on ties,
GROUPING() disambiguation, binary collation ordering, and calendar
month arithmetic. With q212/q213/q225 these make seven probes
certifying the engine agreements the whole oracle suite stands on.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q298


def q298_rows_vs_range_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X259: ROWS vs RANGE frame semantics on TIES — the window trap
    that silently corrupts running totals: with duplicate ordering
    values, ROWS UNBOUNDED PRECEDING gives each tied row a DIFFERENT
    cumulative sum (arbitrary-but-some order within the tie), while
    RANGE gives every tied row the SAME sum (the whole peer group).
    Probed over order counts per date (dates tie heavily): per day,
    the MAX rows-frame cumsum must equal the (unique) range-frame
    cumsum, and days with >1 order must show the rows-frame SPREAD
    (max−min > 0) that makes naive ROWS running totals
    non-deterministic on ties. Summing the always-1 constant makes
    the within-tie order irrelevant to the emitted maxima/minima —
    the probe certifies the SEMANTICS without depending on tie
    order.

    Scale: one date-keyed window pass; the probe relation is
    |dates|-sized."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), F.lit(1).alias("one")
    )
    wrows = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wrange = Window.orderBy("d").rangeBetween(Window.unboundedPreceding, 0)
    staged = o.select(
        "d",
        F.sum("one").over(wrows).alias("rows_cum"),
        F.sum("one").over(wrange).alias("range_cum"),
    )
    g = staged.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rows_cum").alias("rows_max"),
        F.min("rows_cum").alias("rows_min"),
        F.max("range_cum").alias("range_max"),
        F.min("range_cum").alias("range_min"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("range_max") != F.col("range_min"), 1).otherwise(0))
        .cast("bigint")
        .alias("range_disagreements"),
        F.sum(F.when(F.col("rows_max") != F.col("range_max"), 1).otherwise(0))
        .cast("bigint")
        .alias("rows_max_vs_range_mismatches"),
        F.sum(
            F.when(
                (F.col("n") > 1)
                & (F.col("rows_max") == F.col("rows_min")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tied_days_without_rows_spread"),
    ).select(
        "n_days",
        "range_disagreements",
        "rows_max_vs_range_mismatches",
        "tied_days_without_rows_spread",
        (
            (F.col("range_disagreements") == 0)
            & (F.col("rows_max_vs_range_mismatches") == 0)
            & (F.col("tied_days_without_rows_spread") == 0)
        ).alias("frame_semantics_agree"),
    )


Q298_SQL = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, 1 AS one FROM orders),
staged AS (
  SELECT d,
         sum(one) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS rows_cum,
         sum(one) OVER (ORDER BY d RANGE UNBOUNDED PRECEDING) AS range_cum
  FROM o
),
g AS (
  SELECT d, count(*) AS n,
         max(rows_cum) AS rows_max, min(rows_cum) AS rows_min,
         max(range_cum) AS range_max, min(range_cum) AS range_min
  FROM staged GROUP BY d
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN range_max <> range_min THEN 1 ELSE 0 END)
            AS BIGINT) AS range_disagreements,
       CAST(sum(CASE WHEN rows_max <> range_max THEN 1 ELSE 0 END)
            AS BIGINT) AS rows_max_vs_range_mismatches,
       CAST(sum(CASE WHEN n > 1 AND rows_max = rows_min THEN 1 ELSE 0 END)
            AS BIGINT) AS tied_days_without_rows_spread,
       sum(CASE WHEN range_max <> range_min THEN 1 ELSE 0 END) = 0
       AND sum(CASE WHEN rows_max <> range_max THEN 1 ELSE 0 END) = 0
       AND sum(CASE WHEN n > 1 AND rows_max = rows_min THEN 1 ELSE 0 END) = 0
         AS frame_semantics_agree
FROM g
"""


# ------------------------------------------------------------- q299


def q299_grouping_id_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X260: GROUPING() disambiguation probe — the ROLLUP trap: a
    rollup subtotal row shows NULL in its group key, and so does a
    DATA row whose key is genuinely NULL — indistinguishable without
    the GROUPING() marker. The probe derives a nullable key
    (nullif(o_orderstatus, 'O') — 'O' rows become data-NULLs), rolls
    up, and certifies the two NULL kinds separate exactly: data-NULL
    rows carry grouping=0 with their own subtotal, the rollup total
    carries grouping=1. Engines that conflate them double-count every
    report built on rollups of nullable keys.

    Scale: one Expand-based rollup pass (X6's plan shape)."""
    o = _t(spark, sf_dir, "orders").select(
        F.expr("nullif(o_orderstatus, 'O')").alias("k")
    )
    g = o.rollup("k").agg(
        F.grouping("k").cast("int").alias("is_total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return g.select(
        F.coalesce("k", F.lit("<null>")).alias("key_display"),
        "is_total",
        "n",
    )


Q299_SQL = """
SELECT coalesce(k, '<null>') AS key_display,
       CAST(grouping(k) AS INT) AS is_total,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT nullif(o_orderstatus, 'O') AS k FROM orders)
GROUP BY ROLLUP (k)
"""


# ------------------------------------------------------------- q300


def q300_collation_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X261: binary-collation ordering probe — string ORDER BY is only
    portable if both engines sort by the same collation; both Spark
    (UTF8_BINARY default) and DuckDB (binary) compare code points, so
    'Brand#1' < 'Brand#10' < 'Brand#2' and upper-case sorts before
    lower-case. The probe ranks a constructed mixed-case/mixed-digit
    string set (brand names + case-flipped + digit-suffixed variants)
    and emits each string's rank — any collation divergence (e.g., a
    locale-aware engine) breaks the rank column immediately. The
    min/max strings and case-flip adjacency are the canary columns.

    Scale: |distinct strings|-sized probe after one distinct."""
    p = _t(spark, sf_dir, "part").select("p_brand").distinct()
    probe = (
        p.select(F.col("p_brand").alias("s"))
        .unionAll(p.select(F.lower("p_brand").alias("s")))
        .unionAll(p.select(F.concat(F.col("p_brand"), F.lit("0")).alias("s")))
        .distinct()
    )
    w = Window.orderBy("s")
    return probe.select(
        "s", F.row_number().over(w).cast("int").alias("sort_rank")
    )


Q300_SQL = """
WITH p AS (SELECT DISTINCT p_brand FROM part),
probe AS (
  SELECT p_brand AS s FROM p
  UNION
  SELECT lower(p_brand) FROM p
  UNION
  SELECT p_brand || '0' FROM p
)
SELECT s, CAST(row_number() OVER (ORDER BY s) AS INT) AS sort_rank
FROM probe
"""


# ------------------------------------------------------------- q301


def q301_calendar_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X262: calendar month-arithmetic probe — the end-of-month traps:
    add_months(Jan 31, 1) must CLAMP to Feb 28/29 (both engines do;
    an engine that overflows to Mar 2/3 corrupts every monthly
    roll-forward), last_day must agree across leap years, and
    date_trunc('month') must floor identically. Probed over the
    actual order dates: counts of clamped month-adds, leap-February
    last_days, and the invariant that trunc ≤ date < trunc + 1 month
    holds for every row.

    Scale: map-side date arithmetic, conditional counts, 1 row."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    staged = o.select(
        "d",
        F.add_months("d", 1).alias("plus1m"),
        F.last_day("d").alias("eom"),
        F.date_trunc("month", "d").cast("date").alias("som"),
    )
    return staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # clamped: day-of-month shrank after add_months (e.g. 31 -> 30/28)
        F.sum(
            F.when(F.dayofmonth("plus1m") < F.dayofmonth("d"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clamped_monthadds"),
        F.sum(
            F.when(
                (F.month("eom") == 2) & (F.dayofmonth("eom") == 29), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_leap_februaries"),
        F.sum(
            F.when(
                (F.col("som") <= F.col("d"))
                & (F.col("d") < F.add_months("som", 1)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_trunc_invariant_ok"),
    ).select(
        "n_rows",
        "n_clamped_monthadds",
        "n_leap_februaries",
        "n_trunc_invariant_ok",
        (F.col("n_trunc_invariant_ok") == F.col("n_rows")).alias(
            "calendar_semantics_agree"
        ),
    )


Q301_SQL = """
WITH staged AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS plus1m,
         last_day(CAST(o_orderdate AS DATE)) AS eom,
         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS som
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN day(CAST(plus1m AS DATE)) < day(d)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_monthadds,
       CAST(sum(CASE WHEN month(eom) = 2 AND day(eom) = 29
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_leap_februaries,
       CAST(sum(CASE WHEN som <= d
                      AND d < CAST(som + INTERVAL 1 MONTH AS DATE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_trunc_invariant_ok,
       sum(CASE WHEN som <= d AND d < CAST(som + INTERVAL 1 MONTH AS DATE)
                THEN 1 ELSE 0 END) = count(*) AS calendar_semantics_agree
FROM staged
"""


QUERIES_EXT45 = {
    "q298_rows_vs_range_probe": q298_rows_vs_range_probe,
    "q299_grouping_id_probe": q299_grouping_id_probe,
    "q300_collation_probe": q300_collation_probe,
    "q301_calendar_semantics_probe": q301_calendar_semantics_probe,
}


def _oracles_ext45() -> dict[str, str]:
    return {
        "q298_rows_vs_range_probe": Q298_SQL,
        "q299_grouping_id_probe": Q299_SQL,
        "q300_collation_probe": Q300_SQL,
        "q301_calendar_semantics_probe": Q301_SQL,
    }
