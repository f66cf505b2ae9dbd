"""Round-5 driver query families, batch 66 (q369): conformance
certificate #16 — numeric CAST-narrowing and overflow/widening
semantics, the companion to q213 (decimal round()) and q225 (try_*
safe math).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q369

I64_MAX = 9_223_372_036_854_775_807


def q369_numeric_cast_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #16: numeric narrowing and widening
    over real prices — floor/ceil integer casts, exact cents
    arithmetic, and the DECIMAL(38) widening that survives past
    BIGINT range — certified value-identical per price band.  Two
    divergences this certificate documents (and routes around):

    1. ``CAST(double AS INT)`` NARROWING: Spark TRUNCATES toward zero
       (2.7→2, −2.7→−2, 2.5→2); DuckDB ROUNDS (2.7→3, −2.7→−3) —
       pinned in pytest.  The portable form is an EXPLICIT floor()/
       ceil() before the cast, which is what every banded metric in
       this suite does.
    2. Aggregate WIDENING: DuckDB ``sum(BIGINT)`` silently promotes
       to HUGEINT (exact at any magnitude); Spark keeps BIGINT and —
       under the ANSI default this suite certifies — raises
       ARITHMETIC_OVERFLOW past 2^63 (both engines also refuse plain
       int64×int64 overflow: pinned in pytest).  The portable
       widening is DECIMAL(38,0), computed here: Σ cents² reaches
       ~6×10²⁰ at sf0.1 — past BIGINT by 70× — and both engines
       carry it exactly; the value is emitted as a STRING because the
       comparator's pandas bridge would lossy-float a 21-digit
       decimal.  ``wide_gt_i64`` certifies in-row that the band
       really did exceed BIGINT range (sf0.1; smaller SFs prove the
       predicate itself).

    Scale: one scan, one |bands|-group hash-agg; every expression is
    codegen'd integer/decimal arithmetic — the certificate's point is
    that exactness at 100 TB costs a type declaration, not a plan."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 4).alias("band"),
        F.col("l_extendedprice").alias("price"),
        _money_cents("l_extendedprice").alias("cents"),
    )
    wide = F.sum(
        (F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq")
    )
    return (
        li.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor("price").cast("long")).alias("floor_sum"),
            F.sum(F.ceil("price").cast("long")).alias("ceil_sum"),
            F.sum("cents").alias("cents_sum"),
            wide.cast("decimal(38,0)").cast("string").alias("cents_sq_sum"),
            (wide > F.lit(I64_MAX).cast("decimal(38,0)")).alias("wide_gt_i64"),
        )
        .orderBy("band")
    )


Q369_SQL = f"""
WITH li AS (
  SELECT l_orderkey % 4 AS band,
         l_extendedprice AS price,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(price) AS BIGINT)) AS BIGINT) AS floor_sum,
       CAST(sum(CAST(ceil(price) AS BIGINT)) AS BIGINT) AS ceil_sum,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       CAST(CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
            AS VARCHAR) AS cents_sq_sum,
       sum(CAST(cents AS DECIMAL(38,0)) * cents) > {I64_MAX} AS wide_gt_i64
FROM li GROUP BY band ORDER BY band
"""


QUERIES_EXT66 = {
    "q369_numeric_cast_conformance": q369_numeric_cast_conformance,
}


def _oracles_ext66() -> dict[str, str]:
    return {
        "q369_numeric_cast_conformance": Q369_SQL,
    }
