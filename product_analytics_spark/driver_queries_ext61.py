"""Round-5 driver query families, batch 61 (q355-q356): the
event-time RANGE window frame door (calendar-correct rolling sums
over gapped series) and conformance certificate #13 — string-function
semantics, with the substr-position-0 divergence documented.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q355

ROLL_DAYS = 7


def q355_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame door: RANGE BETWEEN INTERVAL — the temporal-type
    frame syntax q132 (X101) avoids by pre-converting to epoch-µs
    integers for ``rangeBetween``; here the frame binds DIRECTLY on a
    DATE ordering with an INTERVAL literal (the SQL-standard form,
    previously unexercised), certified cross-engine.  It stays
    CALENDAR-correct over gapped series where ROWS frames silently
    drift (a ROWS 6 PRECEDING window spans 7 *observed* days, not 7
    calendar days) — the ROWS-frame value is emitted alongside so the
    divergence is visible in-row wherever the series has gaps.

    Scale: the frame runs on the |days| POST-AGGREGATE series (the
    suite's documented single-partition class — at 100 TB a
    per-key RANGE frame partitions by the series key); the corpus
    work is the one day-keyed cents hash-agg."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(_money_cents("o_totalprice")).alias("c")
    )
    frame = (
        f"(ORDER BY day RANGE BETWEEN INTERVAL {ROLL_DAYS - 1} DAYS"
        " PRECEDING AND CURRENT ROW)"
    )
    rows_frame = f"(ORDER BY day ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)"
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("c") / 100.0).alias("revenue"),
        F.expr(f"sum(c) OVER {frame}").alias("_rc"),
        F.expr(f"count(*) OVER {frame}").cast("long").alias("days_in_window"),
        F.expr(f"sum(c) OVER {rows_frame}").alias("_rr"),
    ).select(
        "day",
        "revenue",
        (F.col("_rc") / 100.0).alias("rolling_revenue"),
        "days_in_window",
        (F.col("_rr") / 100.0).alias("rows_frame_revenue"),
    ).orderBy("day")


Q355_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       c / 100.0 AS revenue,
       CAST(sum(c) OVER (ORDER BY day
                         RANGE BETWEEN INTERVAL {ROLL_DAYS - 1} DAY PRECEDING
                         AND CURRENT ROW) AS BIGINT) / 100.0
         AS rolling_revenue,
       CAST(count(*) OVER (ORDER BY day
                           RANGE BETWEEN INTERVAL {ROLL_DAYS - 1} DAY PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS days_in_window,
       CAST(sum(c) OVER (ORDER BY day
                         ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING
                         AND CURRENT ROW) AS BIGINT) / 100.0
         AS rows_frame_revenue
FROM daily ORDER BY day
"""


# ------------------------------------------------------------- q356

def q356_string_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #13: string-function semantics over
    real customer rows — substr (positive AND negative starts),
    instr/position, lpad/rpad (including pad-truncation), translate,
    repeat, reverse, left/right, split_part — all certified
    value-identical.  The one divergence this probe DOCUMENTS (and
    therefore excludes from the compared surface): ``substr(s, 0,
    n)`` — Spark treats start 0 as position 1 and returns n chars;
    DuckDB consumes one unit of length before position 1 and returns
    n-1.  The portable rule: 1-based starts only, never 0.

    Scale: pure per-row codegen'd expressions on a scan — nothing
    shuffles; a conformance probe's cost is one projection at any
    size."""
    c = _t(spark, sf_dir, "customer")
    name = F.col("c_name")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.expr("split_part(c_name, '#', 2)").alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.expr("substr(c_name, -4, 4)").alias("neg_substr"),
        F.expr("right(c_name, 4)").alias("right4"),
        (F.expr("substr(c_name, -4, 4)") == F.expr("right(c_name, 4)")).alias(
            "neg_eq_right"
        ),
        F.expr("CAST(instr(c_name, '#') AS INT)").alias("hash_pos"),
        F.expr("CAST(position('#' IN c_name) AS INT)").alias("hash_pos2"),
        F.translate(F.lower(seg), "aeiou", "12345").alias("translated"),
        F.repeat(F.expr("left(c_mktsegment, 1)"), 3).alias("tripled"),
        F.reverse(F.lower(seg)).alias("reversed"),
        F.rpad(F.expr("left(c_mktsegment, 2)"), 5, "xy").alias("rpadded"),
        F.lpad(seg, 3, "z").alias("pad_truncated"),
    ).orderBy("c_custkey")


Q356_SQL = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
       substr(c_name, -4, 4) AS neg_substr,
       right(c_name, 4) AS right4,
       substr(c_name, -4, 4) = right(c_name, 4) AS neg_eq_right,
       CAST(instr(c_name, '#') AS INT) AS hash_pos,
       CAST(position('#' IN c_name) AS INT) AS hash_pos2,
       translate(lower(c_mktsegment), 'aeiou', '12345') AS translated,
       repeat(left(c_mktsegment, 1), 3) AS tripled,
       reverse(lower(c_mktsegment)) AS reversed,
       rpad(left(c_mktsegment, 2), 5, 'xy') AS rpadded,
       lpad(c_mktsegment, 3, 'z') AS pad_truncated
FROM customer ORDER BY c_custkey
"""


QUERIES_EXT61 = {
    "q355_range_interval_frame": q355_range_interval_frame,
    "q356_string_conformance": q356_string_conformance,
}


def _oracles_ext61() -> dict[str, str]:
    return {
        "q355_range_interval_frame": Q355_SQL,
        "q356_string_conformance": Q356_SQL,
    }
