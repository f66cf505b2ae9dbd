"""Round-3 driver query families, batch 19 (q204+): retail 4-4-5
fiscal calendar mapping, and an SPC control chart with a runs rule.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _cents_out, _money_cents, _t

# ------------------------------------------------------------- q204

FISCAL_START_MONTH = 2  # fiscal year starts Feb 1


def q204_fiscal_445_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail 4-4-5 fiscal calendar mapping — the BI calendar the
    Gregorian date functions can't express: fiscal year starts Feb 1,
    weeks count from the fiscal year start, quarters are 13-week
    blocks split 4+4+5 into periods. Every mapping step is INTEGER
    arithmetic on day offsets (week = offset div 7, quarter =
    (week−1) div 13, period from the within-quarter week by two
    comparisons) — no locale, no WEEKOFYEAR (whose ISO semantics
    differ across engines), no calendar UDF. Revenue rolls up to
    (fiscal year, quarter, period) with order counts and exact cents.

    Scale: one map-side date computation + one hash agg; the fiscal
    columns are deterministic derivations, so at scale they become
    generated partition columns and period-bounded queries prune."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        _money_cents("o_totalprice").alias("cents"),
    )
    fy = F.year("d") - F.when(F.month("d") < FISCAL_START_MONTH, 1).otherwise(0)
    mapped = o.select(
        "cents",
        fy.alias("fy"),
        F.datediff(F.col("d"), F.make_date(fy, F.lit(FISCAL_START_MONTH), F.lit(1))).alias(
            "off"
        ),
    ).select(
        "cents",
        "fy",
        (F.expr("off div 7") + 1).alias("wk"),
    ).select(
        "cents",
        "fy",
        (F.expr("(wk - 1) div 13") + 1).alias("fq"),
        (F.expr("(wk - 1) % 13") + 1).alias("wq"),
    ).select(
        "cents",
        "fy",
        "fq",
        (
            (F.col("fq") - 1) * 3
            + F.when(F.col("wq") <= 4, 1).when(F.col("wq") <= 8, 2).otherwise(3)
        ).alias("fp"),
    )
    return mapped.groupBy("fy", "fq", "fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        _cents_out(F.sum("cents")).alias("revenue"),
    )


Q204_SQL = f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
mapped AS (
  SELECT cents,
         year(d) - CASE WHEN month(d) < {FISCAL_START_MONTH} THEN 1 ELSE 0 END AS fy,
         date_diff('day',
                   make_date(year(d) - CASE WHEN month(d) < {FISCAL_START_MONTH}
                                            THEN 1 ELSE 0 END,
                             {FISCAL_START_MONTH}, 1),
                   d) AS off
  FROM o
),
wk AS (SELECT cents, fy, off // 7 + 1 AS wk FROM mapped),
q AS (
  SELECT cents, fy, (wk - 1) // 13 + 1 AS fq, (wk - 1) % 13 + 1 AS wq FROM wk
)
SELECT fy, fq,
       (fq - 1) * 3 + (CASE WHEN wq <= 4 THEN 1 WHEN wq <= 8 THEN 2 ELSE 3 END) AS fp,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) / 100.0 AS revenue
FROM q GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------- q205

SPC_BASELINE_DAYS = 100


def q205_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC (Shewhart) control chart with a runs rule — process
    monitoring on daily revenue: control limits μ±3σ come from a
    FROZEN baseline (each nation's first 100 days — the fit/monitor
    split, like X136's scaler), computed from exact integer power
    sums; each later day is flagged beyond-3σ, and the Western-
    Electric-style runs rule flags two CONSECUTIVE days beyond the
    same 2σ band (one lag window over the flag column). Baseline
    stats are identical doubles on both engines (exact int sums →
    one sqrt), so the flag comparisons are deterministic.

    Scale: baseline is a per-nation 1-row relation joined back
    broadcast-style; the monitoring pass is one nation-partitioned
    window — a 24×7 monitor's daily batch form."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("y"))
    )
    wo = Window.partitionBy("n_name").orderBy("d")
    idx = daily.select("n_name", "d", "y", F.row_number().over(wo).alias("k"))
    base = (
        idx.filter(F.col("k") <= SPC_BASELINE_DAYS)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("y").alias("bs"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("bss"),
        )
    )
    bn = F.col("bn").cast("double")
    mu = F.col("bs").cast("double") / bn
    # spelled as mu*mu, not pow(mu, 2) — Math.pow is not guaranteed
    # bit-identical to the multiplication the oracle performs
    sigma = F.sqrt(F.col("bss").cast("double") / bn - mu * mu)
    monitored = (
        idx.filter(F.col("k") > SPC_BASELINE_DAYS)
        .join(F.broadcast(base), "n_name")
        .select(
            "n_name",
            "d",
            "k",
            (F.col("y").cast("double") > mu + 3 * sigma).alias("hi3"),
            (F.col("y").cast("double") < mu - 3 * sigma).alias("lo3"),
            (F.col("y").cast("double") > mu + 2 * sigma).alias("hi2"),
            (F.col("y").cast("double") < mu - 2 * sigma).alias("lo2"),
        )
    )
    wm = Window.partitionBy("n_name").orderBy("k")
    runs = monitored.select(
        "n_name",
        "d",
        (F.col("hi3") | F.col("lo3")).alias("beyond3"),
        (
            (F.col("hi2") & F.lag("hi2").over(wm))
            | (F.col("lo2") & F.lag("lo2").over(wm))
        ).alias("run2"),
    )
    return runs.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_monitored"),
        F.sum(F.when(F.col("beyond3"), 1).otherwise(0)).cast("bigint").alias("n_beyond_3sigma"),
        F.sum(F.when(F.col("run2"), 1).otherwise(0)).cast("bigint").alias("n_runs_2sigma"),
        F.min(F.when(F.col("beyond3"), F.date_format("d", "yyyy-MM-dd"))).alias(
            "first_violation"
        ),
    )


Q205_SQL = f"""
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
idx AS (
  SELECT n_name, d, y,
         row_number() OVER (PARTITION BY n_name ORDER BY d) AS k
  FROM daily
),
base AS (
  SELECT n_name, count(*) AS bn, sum(y) AS bs,
         sum(CAST(y * y AS DECIMAL(38,0))) AS bss
  FROM idx WHERE k <= {SPC_BASELINE_DAYS} GROUP BY 1
),
mon AS (
  SELECT i.n_name, d, k,
         CAST(y AS DOUBLE) AS yd,
         CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE) AS mu,
         sqrt(CAST(bss AS DOUBLE) / CAST(bn AS DOUBLE)
              - (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE))
                * (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE))) AS sigma
  FROM idx i JOIN base b ON i.n_name = b.n_name
  WHERE k > {SPC_BASELINE_DAYS}
),
runs AS (
  SELECT n_name, d,
         (yd > mu + 3 * sigma OR yd < mu - 3 * sigma) AS beyond3,
         ((yd > mu + 2 * sigma AND lag(yd > mu + 2 * sigma) OVER w)
          OR (yd < mu - 2 * sigma AND lag(yd < mu - 2 * sigma) OVER w)) AS run2
  FROM mon
  WINDOW w AS (PARTITION BY n_name ORDER BY k)
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_monitored,
       CAST(sum(CASE WHEN beyond3 THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_3sigma,
       CAST(sum(CASE WHEN coalesce(run2, false) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_runs_2sigma,
       min(CASE WHEN beyond3 THEN strftime(d, '%Y-%m-%d') END) AS first_violation
FROM runs GROUP BY 1
"""


QUERIES_EXT19 = {
    "q204_fiscal_445_calendar": q204_fiscal_445_calendar,
    "q205_spc_control_chart": q205_spc_control_chart,
}

ORACLES_EXT19 = {
    "q204_fiscal_445_calendar": Q204_SQL,
    "q205_spc_control_chart": Q205_SQL,
}
