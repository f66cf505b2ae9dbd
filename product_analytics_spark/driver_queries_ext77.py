"""Round-5 driver query families, batch 77 (q391): banker's rounding
(``bround``) — the HALF_EVEN counterpart to q213's HALF_UP money
certificate.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q391


def q391_bankers_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's rounding door: ``bround`` (HALF_EVEN — the
    statistician's rounding that kills the systematic half-cent drift
    HALF_UP accumulates) certified at the EXACT half-cent boundary,
    q213's construction: every boundary value x.xx5 is built exactly
    as (cents·10+5)/1000 in DECIMAL(18,3) — never through a double,
    where .xx5 does not exist — and bround(x, 2) must land on the
    EVEN neighbor.  DuckDB has no decimal HALF_EVEN (its decimal
    round is half-up, its double round is half-even but cannot hold
    the boundary — the q213 finding), so the oracle derives the
    expected value in pure integer arithmetic: last digit even → keep,
    odd → +1.  The per-parity aggregate makes the signature visible:
    under HALF_UP every boundary rounds up (q213), under HALF_EVEN
    exactly the odd-digit half rounds up.

    Scale: one scan, a 10-group agg — a rounding-mode swap is a
    codegen expression change, the same plan either way."""
    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c")
    )
    b = o.select(
        (F.col("c") % 10).alias("last_digit"),
        ((F.col("c") * 10 + 5).cast("decimal(18,3)") / 1000)
        .cast("decimal(18,3)")
        .alias("x"),
        "c",
    )
    r = b.select(
        "last_digit",
        "c",
        (F.bround("x", 2) * 100).cast("long").alias("r_cents"),
    )
    return (
        r.groupBy("last_digit")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("r_cents") == F.col("c")).alias("n_kept"),
            F.count_if(F.col("r_cents") == F.col("c") + 1).alias("n_up"),
            F.sum("r_cents").cast("string").alias("sum_r_cents"),
        )
        .orderBy("last_digit")
    )


Q391_SQL = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
r AS (
  SELECT c % 10 AS last_digit, c,
         c + (c % 2) AS r_cents  -- HALF_EVEN at the exact boundary
  FROM o
)
SELECT last_digit,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE r_cents = c) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE r_cents = c + 1) AS BIGINT) AS n_up,
       CAST(sum(r_cents) AS VARCHAR) AS sum_r_cents
FROM r GROUP BY last_digit ORDER BY last_digit
"""


QUERIES_EXT77 = {
    "q391_bankers_rounding": q391_bankers_rounding,
}


def _oracles_ext77() -> dict[str, str]:
    return {
        "q391_bankers_rounding": Q391_SQL,
    }
