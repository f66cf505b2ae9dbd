"""Round-4 driver query families, batch 50 (q318-q321): nth-weekday
calendar profile, assortment discovery curve, AR aging buckets, and
the order-split histogram.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

_ANCHOR = "1992-01-06"  # Monday — the repo's portable weekday anchor

# ------------------------------------------------------------- q318


def q318_nth_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X279: nth-weekday-of-month profile — the calendar-effects grid
    behind "first-Monday spikes" and payday analyses: every order
    date classifies as (weekday, nth occurrence of that weekday in
    its month) — nth = (day-of-month − 1) div 7 + 1, weekday via the
    Monday-anchored day-number mod (the portable idiom; no engine
    dayofweek offset trap). Emits the (weekday × nth) order-count
    matrix with each cell's share of its weekday — integer counts,
    one final per-row division.

    Scale: map-side classification + a ≤7×5-cell agg."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("dt")
    )
    staged = o.selectExpr(
        f"CAST(datediff(dt, DATE '{_ANCHOR}') % 7 AS BIGINT) AS wd",
        "CAST((dayofmonth(dt) - 1) div 7 + 1 AS BIGINT) AS nth",
    )
    wwd = Window.partitionBy("wd")
    g = staged.groupBy("wd", "nth").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        F.col("wd").cast("bigint").alias("weekday_mon0"),
        F.col("nth").cast("bigint").alias("nth_in_month"),
        F.col("n").cast("bigint").alias("n_orders"),
        (F.col("n") / F.sum("n").over(wwd).cast("double")).alias(
            "share_of_weekday"
        ),
    )


Q318_SQL = f"""
WITH staged AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '{_ANCHOR}' AS BIGINT) % 7
           AS wd,
         CAST((dayofmonth(CAST(o_orderdate AS DATE)) - 1) // 7 + 1 AS BIGINT)
           AS nth
  FROM orders
),
g AS (SELECT wd, nth, count(*) AS n FROM staged GROUP BY 1, 2)
SELECT CAST(wd AS BIGINT) AS weekday_mon0,
       CAST(nth AS BIGINT) AS nth_in_month,
       CAST(n AS BIGINT) AS n_orders,
       n / CAST(sum(n) OVER (PARTITION BY wd) AS DOUBLE) AS share_of_weekday
FROM g
"""


# ------------------------------------------------------------- q319


def q319_assortment_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X280: assortment discovery curve — the catalog-coverage
    question: how fast does the sold assortment saturate? Each part's
    FIRST sale month (a min-agg — X52's first-touch kernel at part
    grain) feeds a monthly new-parts count and a cumulative
    discovered-assortment curve; the coverage ratio divides by the
    catalog size. Integer counts through a tiny ordered window; the
    curve flattening is the assortment-saturation signal merchandise
    planning reads.

    Scale: one part-grain min-agg (map-side combinable) + a
    |months|-row cumulative window."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("mth")
    )
    n_parts = _t(spark, sf_dir, "part").count()
    first = li.groupBy("l_partkey").agg(F.min("mth").alias("first_mth"))
    monthly = first.groupBy("first_mth").agg(
        F.count(F.lit(1)).alias("new_parts")
    )
    wcum = Window.orderBy("first_mth").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        F.col("first_mth").alias("month"),
        F.col("new_parts").cast("bigint").alias("new_parts"),
        F.sum("new_parts").over(wcum).cast("bigint").alias("assortment_size"),
        (
            F.sum("new_parts").over(wcum) / F.lit(float(n_parts))
        ).alias("catalog_coverage"),
    )


Q319_SQL = """
WITH first AS (
  SELECT l_partkey, min(strftime(CAST(l_shipdate AS DATE), '%Y-%m'))
           AS first_mth
  FROM lineitem GROUP BY l_partkey
),
monthly AS (
  SELECT first_mth, count(*) AS new_parts FROM first GROUP BY first_mth
),
np AS (SELECT count(*) AS n FROM part)
SELECT first_mth AS month,
       CAST(new_parts AS BIGINT) AS new_parts,
       CAST(sum(new_parts) OVER (ORDER BY first_mth
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS assortment_size,
       sum(new_parts) OVER (ORDER BY first_mth ROWS UNBOUNDED PRECEDING)
         / CAST((SELECT n FROM np) AS DOUBLE) AS catalog_coverage
FROM monthly
"""


# ------------------------------------------------------------- q320

AR_AS_OF = "2001-12-31"
AR_BANDS = (90, 365, 1095)


def q320_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X281: accounts-receivable aging — the finance-close report for
    the OPEN order book: orders still in status 'O' band by age at
    the as-of date ({AR_BANDS} day edges), with counts and exact
    cents exposure per band plus each band's share of the open
    liability. The oldest band is where the write-off conversation
    starts — the report every AR close produces.

    Scale: status filter prunes the scan; banding is map-side; the
    report is 4 rows."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select(
        F.datediff(
            F.lit(AR_AS_OF).cast("date"), F.to_date("o_orderdate")
        ).alias("age"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    b1, b2, b3 = AR_BANDS
    band = (
        F.when(F.col("age") <= b1, F.lit(f"0-{b1}d"))
        .when(F.col("age") <= b2, F.lit(f"{b1 + 1}-{b2}d"))
        .when(F.col("age") <= b3, F.lit(f"{b2 + 1}-{b3}d"))
        .otherwise(F.lit(f"{b3}d+"))
    )
    wtot = Window.partitionBy()
    g = o.groupBy(band.alias("age_band")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("c"),
    )
    return g.select(
        "age_band",
        F.col("n").cast("bigint").alias("n_open_orders"),
        (F.col("c") / F.lit(100.0)).alias("exposure"),
        (F.col("c") / F.sum("c").over(wtot).cast("double")).alias(
            "share_of_open_liability"
        ),
    )


def _q320_sql() -> str:
    b1, b2, b3 = AR_BANDS
    return f"""
WITH o AS (
  SELECT CAST(DATE '{AR_AS_OF}' - CAST(o_orderdate AS DATE) AS BIGINT)
           AS age,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O'
),
g AS (
  SELECT CASE WHEN age <= {b1} THEN '0-{b1}d'
              WHEN age <= {b2} THEN '{b1 + 1}-{b2}d'
              WHEN age <= {b3} THEN '{b2 + 1}-{b3}d'
              ELSE '{b3}d+' END AS age_band,
         count(*) AS n, sum(cents) AS c
  FROM o GROUP BY 1
)
SELECT age_band,
       CAST(n AS BIGINT) AS n_open_orders,
       CAST(c AS BIGINT) / 100.0 AS exposure,
       c / CAST(sum(c) OVER () AS DOUBLE) AS share_of_open_liability
FROM g
"""


# ------------------------------------------------------------- q321


def q321_order_split_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X282: order-split histogram by priority — the fulfillment-ops
    counts-of-counts (Q13's kernel pointed at shipping): lines per
    order, bucketed, crossed with order priority — how often do
    high-priority orders ship in many pieces? Integer counts with
    per-priority shares; the skew between priority rows is the
    consolidation-opportunity signal.

    Scale: one order-grain count agg + a tiny (priority × bucket)
    rollup."""
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.substring("o_orderpriority", 1, 1).alias("prio")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "prio",
        F.least(F.col("n_lines"), F.lit(6)).alias("lines_bucket"),
    )
    wp = Window.partitionBy("prio")
    g = j.groupBy("prio", "lines_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        "prio",
        F.col("lines_bucket").cast("bigint").alias("lines_bucket"),
        F.col("n").cast("bigint").alias("n_orders"),
        (F.col("n") / F.sum("n").over(wp).cast("double")).alias(
            "share_of_priority"
        ),
    )


Q321_SQL = """
WITH li AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT substr(o.o_orderpriority, 1, 1) AS prio,
         least(li.n_lines, 6) AS lines_bucket
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
),
g AS (SELECT prio, lines_bucket, count(*) AS n FROM j GROUP BY 1, 2)
SELECT prio,
       CAST(lines_bucket AS BIGINT) AS lines_bucket,
       CAST(n AS BIGINT) AS n_orders,
       n / CAST(sum(n) OVER (PARTITION BY prio) AS DOUBLE)
         AS share_of_priority
FROM g
"""


QUERIES_EXT50 = {
    "q318_nth_weekday_profile": q318_nth_weekday_profile,
    "q319_assortment_discovery": q319_assortment_discovery,
    "q320_ar_aging": q320_ar_aging,
    "q321_order_split_histogram": q321_order_split_histogram,
}


def _oracles_ext50() -> dict[str, str]:
    return {
        "q318_nth_weekday_profile": Q318_SQL,
        "q319_assortment_discovery": Q319_SQL,
        "q320_ar_aging": _q320_sql(),
        "q321_order_split_histogram": Q321_SQL,
    }
