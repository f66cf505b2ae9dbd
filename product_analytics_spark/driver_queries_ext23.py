"""Round-3 driver query families, batch 23 (q212+): SQL-semantics
conformance probes — three-valued NULL logic and decimal rounding —
run as data queries so the driver's value gate certifies the engine
agreements the rest of the suite RELIES on.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q212


def q212_null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic conformance probe — the NULL traps every
    SQL engine must agree on, certified over real data: NULLs are
    derived with nullif (status 'O' → NULL), then one pass counts
    (a) plain equality (NULL ≠ anything), (b) null-safe equality
    (Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM), (c) the NOT IN
    trap (any NULL in the list makes NOT IN never-true — counted
    against a literal list containing NULL), (d) coalesce
    defaulting, and (e) NULL ordering (NULLS FIRST count below a
    sentinel via min over ordered rows... kept as count of NULLs
    ranked before 'F' under the engine's default ASC NULLS FIRST).
    Any engine that disagrees on one of these silently corrupts
    CDC soft-delete logic (P4) and validation joins (J1) — that is
    why the probe earns a driver row.

    Scale: one scan, conditional counts, a 1-row result."""
    o = _t(spark, sf_dir, "orders").select(
        F.nullif("o_orderstatus", F.lit("O")).alias("s"),
        "o_orderstatus",
    )
    # NOT IN (x, NULL): true for NO row (s != x AND s != NULL is
    # never TRUE) — the classic trap; count how many rows survive
    not_in_trap = F.sum(
        F.when(~F.col("s").isin("F", None), 1).otherwise(0)
    )
    return o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("s").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.sum(F.when(F.col("s") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_eq_f"),
        F.sum(F.when(F.col("s").eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe_eq_null"),
        not_in_trap.cast("bigint").alias("n_not_in_with_null"),
        F.sum(F.when(F.coalesce("s", F.lit("MISSING")) == "MISSING", 1).otherwise(0))
        .cast("bigint")
        .alias("n_coalesced"),
        F.count("s").cast("bigint").alias("n_count_col_skips_nulls"),
    )


Q212_SQL = """
WITH o AS (SELECT nullif(o_orderstatus, 'O') AS s FROM orders)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_f,
       CAST(sum(CASE WHEN s IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nullsafe_eq_null,
       CAST(sum(CASE WHEN s NOT IN ('F', NULL) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_not_in_with_null,
       CAST(sum(CASE WHEN coalesce(s, 'MISSING') = 'MISSING' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_coalesced,
       CAST(count(s) AS BIGINT) AS n_count_col_skips_nulls
FROM o
"""


# ------------------------------------------------------------- q213


def q213_rounding_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal rounding conformance probe — certifies the HALF-UP
    agreement the whole money discipline stands on: every distinct
    half-cent boundary value x.xx5 is constructed EXACTLY (cents·10+5
    as DECIMAL(18,3) — never through a double, where .xx5 doesn't
    exist), rounded to 2 dp on both engines, and the probe reports
    per last-digit-parity counts plus the sum of roundings. Spark
    rounds decimals HALF_UP; DuckDB rounds DECIMAL half-up too (its
    DOUBLE round is half-even — the documented reason qcommon routes
    money through decimals). A disagreement here would silently move
    half-cents across every financial rollup (F13).

    Scale: one scan, a 10-row group-by on the boundary digit."""
    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("c")
    )
    # boundary value: (10c+5)/1000 as decimal(18,3) — exactly x.xx5
    b = o.select(
        (F.col("c") % 10).alias("last_digit"),
        ((F.col("c") * 10 + 5).cast("decimal(18,3)") / 1000).alias("x"),
    ).select(
        "last_digit",
        F.col("x").cast("decimal(18,3)").alias("x"),
    )
    rounded = b.select(
        "last_digit",
        F.round("x", 2).alias("r"),
        ((F.round("x", 2) * 100).cast("long") % 10).alias("r_last"),
    )
    return rounded.groupBy("last_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("r_last") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_even_result"),
        F.sum((F.col("r") * 100).cast("long")).cast("string").alias("sum_rounded_cents"),
    )


Q213_SQL = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM orders
),
b AS (
  SELECT c % 10 AS last_digit,
         CAST(CAST(c * 10 + 5 AS DECIMAL(18,3)) / 1000 AS DECIMAL(18,3)) AS x
  FROM o
),
rounded AS (
  SELECT last_digit, round(x, 2) AS r,
         CAST(round(x, 2) * 100 AS BIGINT) % 10 AS r_last
  FROM b
)
SELECT last_digit,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN r_last % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_even_result,
       CAST(sum(CAST(r * 100 AS BIGINT)) AS VARCHAR) AS sum_rounded_cents
FROM rounded GROUP BY 1
"""


QUERIES_EXT23 = {
    "q212_null_semantics_probe": q212_null_semantics_probe,
    "q213_rounding_semantics_probe": q213_rounding_semantics_probe,
}

ORACLES_EXT23 = {
    "q212_null_semantics_probe": Q212_SQL,
    "q213_rounding_semantics_probe": Q213_SQL,
}
