"""Round-5 driver query families, batch 62 (q357-q358): the two
remaining Spark-4 SQL surface doors — session VARIABLES (computed
driver-side constants that fold into pushed-down literals) and SQL
SCRIPTING (BEGIN/DECLARE/WHILE/IF control flow running iterative
driver logic inside the SQL engine).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q357

def q357_sql_variables_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: SQL session variables (Spark 4 DECLARE / SET
    VARIABLE) — a computed scalar (the workload's mean order cents)
    captured ONCE into a variable and referenced in a later query,
    where it binds as a LITERAL at analysis time.  That is the scale
    point: the filter `cents > var` reaches the scan as a pushed
    predicate, where the equivalent inline scalar subquery would need
    a separate subquery job (or worse, a 1-row join) in the same
    plan.  The oracle recomputes the identical floor-average with a
    scalar subquery — the two forms must agree exactly.

    Scale: one agg to compute the variable, one filtered agg that
    uses it — both corpus passes are plain hash-aggs; the variable
    itself is driver state, zero bytes shuffled."""
    _t(spark, sf_dir, "orders").select(
        "o_orderstatus", _money_cents("o_totalprice").alias("cents")
    ).createOrReplaceTempView("q357_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE q357_thr BIGINT")
    spark.sql(
        "SET VARIABLE q357_thr ="
        " (SELECT sum(cents) div count(*) FROM q357_orders)"
    )
    return spark.sql(
        """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(cents) AS BIGINT) / CAST(100.0 AS DOUBLE) AS revenue_above,
       q357_thr AS threshold_cents
FROM q357_orders WHERE cents > q357_thr
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""
    )


Q357_SQL = """
WITH o AS (
  SELECT o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
thr AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS t FROM o)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(cents) AS BIGINT) / CAST(100.0 AS DOUBLE) AS revenue_above,
       thr.t AS threshold_cents
FROM o, thr WHERE cents > thr.t
GROUP BY o_orderstatus, thr.t ORDER BY o_orderstatus
"""


# ------------------------------------------------------------- q358

def q358_sql_scripting_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: SQL SCRIPTING (Spark 4 BEGIN / DECLARE / WHILE /
    IF) — iterative driver logic expressed inside the SQL engine: a
    binary search for the revenue half-life day (the smallest day d
    with cumulative revenue >= half the total), O(log |days|)
    aggregate passes over the |days| post-agg series.  The oracle is
    the CLOSED-FORM relational answer (one cumulative-sum window
    pass) — the script and the window form must land on the same day,
    which certifies the control-flow semantics, not just syntax.

    Scale: each loop iteration is one filtered agg on the tiny day
    series (the corpus-sized work is the single day-keyed hash-agg
    feeding the temp view); the window form is what production runs —
    the script exists to certify the scripting door with a real
    fixpoint."""
    # Materialize the day series ONCE (localCheckpoint truncates the
    # lineage and pins the |days| rows): a plain temp view would
    # re-run the corpus agg on every loop iteration.
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("c"))
        .localCheckpoint(eager=True)
    )
    daily.createOrReplaceTempView("q358_daily")
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
BEGIN
  DECLARE lo INT DEFAULT -1;
  DECLARE hi INT DEFAULT 4000;
  DECLARE mid INT;
  DECLARE total BIGINT;
  SET total = (SELECT sum(c) FROM q358_daily);
  WHILE hi - lo > 1 DO
    SET mid = (lo + hi) DIV 2;
    IF (SELECT coalesce(sum(c), 0) FROM q358_daily WHERE d <= mid) * 2
         >= total THEN
      SET hi = mid;
    ELSE
      SET lo = mid;
    END IF;
  END WHILE;
  SELECT CAST(hi AS INT) AS half_day,
         CAST((SELECT sum(c) FROM q358_daily WHERE d <= hi) AS BIGINT)
           / CAST(100.0 AS DOUBLE) AS cum_revenue,
         CAST(total AS BIGINT) / CAST(100.0 AS DOUBLE) AS total_revenue;
END
"""
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


Q358_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS d,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1
),
cum AS (
  SELECT d, c,
         sum(c) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         sum(c) OVER () AS total
  FROM daily
)
SELECT CAST(min(d) AS INT) AS half_day,
       CAST(min_by(cs, d) AS BIGINT) / CAST(100.0 AS DOUBLE) AS cum_revenue,
       CAST(min(total) AS BIGINT) / CAST(100.0 AS DOUBLE) AS total_revenue
FROM cum WHERE cs * 2 >= total
"""


QUERIES_EXT62 = {
    "q357_sql_variables_door": q357_sql_variables_door,
    "q358_sql_scripting_door": q358_sql_scripting_door,
}


def _oracles_ext62() -> dict[str, str]:
    return {
        "q357_sql_variables_door": Q357_SQL,
        "q358_sql_scripting_door": Q358_SQL,
    }
