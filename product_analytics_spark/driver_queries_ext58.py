"""Round-5 driver query families, batch 58 (q347-q350): step-function
time-weighted averages (the sensor/price TWA analytic), the
``df.stat.crosstab`` contingency door, the Spark-4 ``DataFrame
.transpose`` reshape door, and an exact truncated EWMA over the daily
revenue series (power-of-two weights — no float recursion).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q347

TWA_SCALE = 1_000_000


def q347_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ENTITY lifetime time-weighted average — q98's TWAP kernel
    (X71, the per-(key, day) resampling series) taken to the feature
    grain a training pipeline materializes: one exact scalar per user
    over the user's whole span, TWA = sum(v_i * (t_{i+1} - t_i)) /
    (t_N - t_0), last observation weightless.  Where q98 finishes
    with one IEEE division, this emits an exact INTEGER micro-cents
    value via two-part floor division ((num div den)*S + ((num mod
    den)*S) div den = floor(num*1e6/den) without overflow) — the
    integer-composable form downstream exact comparisons (tiering,
    dedup keys, drift checks) can consume.  The gaps telescope to the
    span, so the bigint numerator is bounded by max_cents x span
    (~1e17 here).

    Scale: ONE (user)-keyed window pass for the lead diff, one
    hash-agg — the same shape as sessionization; nothing global, no
    floats until the final per-row division."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_id",
        _money_cents("value").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    stepped = e.withColumn("_gap", F.lead("t_us").over(w) - F.col("t_us"))
    agg = stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("c") * F.col("_gap")).alias("_num"),
        F.sum("_gap").alias("_den"),
    )
    return (
        agg.filter(F.col("_den") > 0)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr(
                f"(_num div _den) * {TWA_SCALE}L"
                f" + ((_num % _den) * {TWA_SCALE}L) div _den"
            ).alias("twa_cents_micro"),
        )
        .orderBy("user_id")
    )


Q347_SQL = f"""
WITH stepped AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         lead(epoch_us(CAST(ts AS TIMESTAMP)))
             OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
           - epoch_us(CAST(ts AS TIMESTAMP)) AS gap
  FROM events
),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(c * gap) AS BIGINT) AS num,
         CAST(sum(gap) AS BIGINT) AS den
  FROM stepped GROUP BY 1
)
SELECT user_id, n_events,
       CAST((num // den) * {TWA_SCALE}
            + ((num % den) * {TWA_SCALE}) // den AS BIGINT)
         AS twa_cents_micro
FROM agg WHERE den > 0 ORDER BY user_id
"""


# ------------------------------------------------------------- q348

def q348_crosstab_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: ``df.stat.crosstab`` — the contingency-table API
    (pair frequency counts pivoted to a wide relation, value columns
    named by the second key's distinct values).  Order priority x
    order status over the full orders table; the same relation q290's
    Cramér's V consumes as input.

    Scale: crosstab compiles to ONE pair-keyed hash-agg (|p| x |s|
    distinct cells) + a driver-side pivot of the CELL list — corpus
    work is the single agg; the pivot touches only the |cells|
    result.  A 100 TB contingency table with low-cardinality keys is
    exactly this plan."""
    ct = _t(spark, sf_dir, "orders").stat.crosstab(
        "o_orderpriority", "o_orderstatus"
    )
    return ct.orderBy("o_orderpriority_o_orderstatus")


Q348_SQL = """
SELECT o_orderpriority AS "o_orderpriority_o_orderstatus",
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------- q349

def q349_transpose_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: Spark 4's ``DataFrame.transpose`` — rows become
    columns keyed by the index column's values (the report-layout
    flip: metrics-as-rows, groups-as-columns).  Per order status:
    order count and exact revenue, transposed to a 2-row relation
    with one column per status.

    Scale: transpose requires a driver-collectable index-value set —
    it is a |groups|-bounded reshape of a POST-AGGREGATE relation (3
    statuses here), never a data-sized operation; the corpus work is
    the one status-keyed cents agg feeding it."""
    per_status = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            (F.sum(_money_cents("o_totalprice")) / 100.0).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )
    return per_status.transpose().orderBy("key")


Q349_SQL = """
WITH s AS (
  SELECT o_orderstatus AS st,
         CAST(count(*) AS DOUBLE) AS n_orders,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) / 100.0 AS revenue
  FROM orders GROUP BY 1
)
SELECT 'n_orders' AS key,
       (SELECT n_orders FROM s WHERE st = 'F') AS "F",
       (SELECT n_orders FROM s WHERE st = 'O') AS "O",
       (SELECT n_orders FROM s WHERE st = 'P') AS "P"
UNION ALL
SELECT 'revenue',
       (SELECT revenue FROM s WHERE st = 'F'),
       (SELECT revenue FROM s WHERE st = 'O'),
       (SELECT revenue FROM s WHERE st = 'P')
ORDER BY key
"""


# ------------------------------------------------------------- q350

EWMA_TERMS = 10  # truncated window length
EWMA_SCALE = 1_000_000


def q350_ewma_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact truncated EWMA (alpha = 1/2) over the daily revenue
    series — the CALENDAR-indexed counterpart of q129's dyadic EMA
    (X98, which decays per preceding EVENT via lag() and so ignores
    clock gaps): here a day with no orders contributes zero revenue
    but still AGES the decay — the series-smoothing semantic a
    forecast consumes.  Integer power-of-two weights instead of the
    float recursion S_t = (c_t + S_{t-1})/2 (cross-row float
    accumulation is engine-divergent; the 10-term truncation error is
    2^-10 of the tail, below the emitted micro-cent unit); the
    divisor for the first days normalizes over the weights actually
    in range (den = 2^10 - 2^(9-m), m = min(9, days since series
    start)).

    Scale: the day series is POST-AGGREGATE (|days| rows); the
    10-offset explode+join runs on that tiny relation, never on
    orders.  The corpus-sized work is exactly one day-keyed cents
    hash-agg."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("d")
    ).agg(F.sum(_money_cents("o_totalprice")).alias("c"))
    # target day t takes source day t-off with weight 2^(9-off)
    offs = daily.select(
        "d", "c", F.explode(F.sequence(F.lit(0), F.lit(EWMA_TERMS - 1))).alias("off")
    ).select((F.col("d") + F.col("off")).alias("t"), "off", "c")
    num = (
        offs.join(daily.select(F.col("d").alias("t")), "t")  # only real days emit
        .groupBy("t")
        .agg(
            F.sum(
                F.col("c") * F.pow(F.lit(2.0), F.lit(9) - F.col("off")).cast("long")
            ).alias("_num")
        )
    )
    # Every daily day appears as its own target (off=0), so min(t)
    # over the |days| post-agg relation IS the series start — the
    # whole-relation window (q171 idiom) instead of a 1-row broadcast
    # cross join, which compiles to the banned BroadcastNestedLoopJoin.
    out = num.select(
        "t",
        "_num",
        F.least(
            F.col("t") - F.min("t").over(Window.partitionBy()),
            F.lit(EWMA_TERMS - 1),
        ).alias("_m"),
    )
    return out.select(
        # DATE outputs cross the pandas boundary as datetime.date on
        # Spark vs datetime64 on DuckDB — emit the yyyy-MM-dd string.
        F.date_format(
            F.expr("date_add(DATE '1992-01-01', CAST(t AS INT))"), "yyyy-MM-dd"
        ).alias("day"),
        F.expr(f"(_num * {EWMA_SCALE}L) div ({1 << EWMA_TERMS}L - CAST(pow(2.0, {EWMA_TERMS - 1} - _m) AS BIGINT))").alias(
            "ewma_cents_micro"
        ),
    ).orderBy("day")


Q350_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS d,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1
),
f AS (SELECT min(d) AS d0 FROM daily),
offs AS (
  SELECT d + off AS t, off, c
  FROM daily, unnest(generate_series(0, {EWMA_TERMS - 1})) AS u(off)
),
num AS (
  SELECT o.t,
         CAST(sum(o.c * CAST(2 ** (9 - o.off) AS BIGINT)) AS BIGINT) AS num
  FROM offs o JOIN daily dd ON dd.d = o.t
  GROUP BY 1
)
SELECT strftime(DATE '1992-01-01' + INTERVAL (t) DAY, '%Y-%m-%d') AS day,
       CAST((num * {EWMA_SCALE})
            // ({1 << EWMA_TERMS} - CAST(2 ** ({EWMA_TERMS - 1} - least(t - d0, {EWMA_TERMS - 1})) AS BIGINT))
            AS BIGINT) AS ewma_cents_micro
FROM num, f ORDER BY day
"""


QUERIES_EXT58 = {
    "q347_time_weighted_average": q347_time_weighted_average,
    "q348_crosstab_door": q348_crosstab_door,
    "q349_transpose_door": q349_transpose_door,
    "q350_ewma_truncated": q350_ewma_truncated,
}


def _oracles_ext58() -> dict[str, str]:
    return {
        "q347_time_weighted_average": Q347_SQL,
        "q348_crosstab_door": Q348_SQL,
        "q349_transpose_door": Q349_SQL,
        "q350_ewma_truncated": Q350_SQL,
    }
