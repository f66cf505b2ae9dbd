"""Round-3 driver query families, batch 18 (q202+): exact sliding-
window order statistics, and conversion path analysis.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q202

SLIDE_W = 15


def q202_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sliding-window median — the robust rolling smoother (the
    median twin of q190's WMA): per nation, the median of the
    trailing 15 days' revenue. No builtin windowed percentile exists,
    so the frame's values are collected (`collect_list` over the
    ROWS frame — bounded at W elements), sorted with `array_sort`,
    and the median read from the two middle order statistics —
    (lo + hi) / 2 on integer CENTS (one identical double division
    on both engines), no percentile-interpolation drift. O(W log W) per row with W a constant: the
    cost never scales with data volume, and the same shape yields
    any rolling order statistic (p90 latency bands, rolling IQR).

    Scale: one nation-partitioned window; the collected frame is W
    longs (120 bytes) per row — the explicit, bounded state that a
    rolling-percentile monitor carries at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("y"))
    )
    fr = (
        Window.partitionBy("n_name")
        .orderBy("d")
        .rowsBetween(-(SLIDE_W - 1), Window.currentRow)
    )
    arr = daily.select(
        "n_name",
        "d",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.array_sort(F.collect_list("y").over(fr)).alias("vals"),
    ).filter(F.col("n") == SLIDE_W)
    lo = F.element_at("vals", (SLIDE_W + 1) // 2)
    hi = F.element_at("vals", SLIDE_W // 2 + 1)
    return arr.select(
        "n_name",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        (((lo + hi) / F.lit(2.0)) / F.lit(100.0)).alias("rolling_median"),
    )


Q202_SQL = f"""
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
arr AS (
  SELECT n_name, d,
         count(*) OVER w AS n,
         list_sort(list(y) OVER w) AS vals
  FROM daily
  WINDOW w AS (PARTITION BY n_name ORDER BY d
               ROWS BETWEEN {SLIDE_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT n_name, strftime(d, '%Y-%m-%d') AS d,
       (vals[{(SLIDE_W + 1) // 2}] + vals[{SLIDE_W // 2 + 1}]) / 2.0 / 100.0
         AS rolling_median
FROM arr WHERE n = {SLIDE_W}
"""


# ------------------------------------------------------------- q203

PATH_GAP_MIN = 30
PATH_TOPK = 10


def q203_top_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion path analysis — the product-analytics staple: each
    user session's ordered event-type sequence becomes a path string
    ("view>click>purchase"), and the readout is the top-10 paths with
    session counts and purchase-conversion share. Sessionization is
    the engine's gap kernel (30-min); the ordered concatenation uses
    a window-ordered `collect_list` carried to the session's last row
    (groupBy collect_list has NO order guarantee — the classic silent
    nondeterminism, avoided here by construction and mirrored by
    DuckDB's `string_agg(... ORDER BY ...)`). The final cut is a
    deterministic top-k (count desc, path asc) over the |distinct
    paths| relation.

    Scale: one user-partitioned shuffle serves sessionize + the path
    window; path strings are bounded by session length (the gap knob);
    the top-k is TakeOrdered over path aggregates, never a global
    sort of sessions."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full-precision timestamp comparison (casting to long seconds
    # would truncate sub-second parts and drift vs the oracle's
    # INTERVAL comparison at gap boundaries)
    gap = F.when(
        F.lag("ts").over(wo).isNull()
        | (
            F.col("ts")
            > F.lag("ts").over(wo) + F.expr(f"INTERVAL {PATH_GAP_MIN} MINUTES")
        ),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(gap)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    paths = (
        sess.select(
            "user_id",
            "session_no",
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1))
            .over(
                Window.partitionBy("user_id", "session_no")
            )
            .alias("sess_len"),
            F.array_join(
                F.collect_list("event_type").over(
                    ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                ),
                ">",
            ).alias("path"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "session_no", "path")
    )
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("path").contains("purchase"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_converting"),
    )
    return (
        agg.orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(PATH_TOPK)
        .select(
            "path",
            "n_sessions",
            (F.col("n_converting").cast("double") / F.col("n_sessions")).alias(
                "conversion_share"
            ),
        )
    )


Q203_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {PATH_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_no
  FROM flagged
),
paths AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY 1, 2
),
agg AS (
  SELECT path, count(*) AS n_sessions,
         sum(CASE WHEN contains(path, 'purchase') THEN 1 ELSE 0 END) AS n_conv
  FROM paths GROUP BY 1
)
SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_conv AS DOUBLE) / n_sessions AS conversion_share
FROM agg
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOPK}
"""


QUERIES_EXT18 = {
    "q202_sliding_median": q202_sliding_median,
    "q203_top_conversion_paths": q203_top_conversion_paths,
}

ORACLES_EXT18 = {
    "q202_sliding_median": Q202_SQL,
    "q203_top_conversion_paths": Q203_SQL,
}
