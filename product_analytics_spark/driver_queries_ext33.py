"""Round-4 driver query families, batch 33 (q250-q253): the canonical
TPC-H benchmark shapes this schema supports, in cents-exact integer
arithmetic — Q1 (pricing summary), Q6 (revenue forecast), Q5 (local
supplier volume), Q14 (promotion effect).

These are THE reference OLAP queries: every engine is judged on
them, and their physical plans (wide scan-heavy agg, selective
filter-sum, 6-way star join, join + conditional agg) are the shapes
the rest of the suite's design notes generalize. Discount/tax are
2-dp decimals stored as doubles; `CAST(x AS DECIMAL(18,2)) * 100`
recovers the exact integer percent (the qcommon money discipline), so
every aggregate is an exact BIGINT and the oracle matches to the last
unit. Magnitudes: cents×pct×pct sums stay < 2^63 through sf100;
beyond that the sums move to DECIMAL(38,0) (documented, not needed at
harness scale).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# Shared exact-integer lineitem projections.
_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_DPCT = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
_TPCT = "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"
_QTY = "CAST(l_quantity AS BIGINT)"


# ------------------------------------------------------------- q250


def q250_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the pricing summary report: the canonical scan-heavy
    grouped aggregate (2 group keys, 8 aggregates, ~98% selectivity
    filter). disc_price and charge are EXACT integer units
    (cents×pct and cents×pct×pct), divided back to dollars once at
    output — where the reference formulation's floating sums would be
    partition-order-dependent, this one is bit-identical anywhere.

    Scale: THE map-side-combine showcase — partial aggregation
    reduces each scan task to ≤|groups| rows (4 groups here) before
    the one tiny shuffle; the filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    e = li.selectExpr(
        "l_returnflag",
        "l_linestatus",
        f"{_QTY} AS qty",
        f"{_CENTS} AS cents",
        f"{_DPCT} AS d",
        f"{_TPCT} AS t",
    )
    return (
        e.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("bigint").alias("sum_qty"),
            F.sum("cents").alias("_base"),
            F.sum(F.expr("cents * (100 - d)")).alias("_disc"),
            F.sum(F.expr("cents * (100 - d) * (100 + t)")).alias("_charge"),
            F.sum("d").alias("_dsum"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            (F.col("_base") / F.lit(100.0)).alias("sum_base_price"),
            (F.col("_disc") / F.lit(10000.0)).alias("sum_disc_price"),
            (F.col("_charge") / F.lit(1000000.0)).alias("sum_charge"),
            (F.col("sum_qty") / F.col("count_order").cast("double")).alias(
                "avg_qty"
            ),
            (F.col("_base") / (F.col("count_order") * 100).cast("double")).alias(
                "avg_price"
            ),
            (F.col("_dsum") / (F.col("count_order") * 100).cast("double")).alias(
                "avg_disc"
            ),
            "count_order",
        )
    )


Q250_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({_QTY}) AS BIGINT) AS sum_qty,
       CAST(sum({_CENTS}) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0
         AS sum_disc_price,
       CAST(sum({_CENTS} * (100 - {_DPCT}) * (100 + {_TPCT})) AS BIGINT)
         / 1000000.0 AS sum_charge,
       CAST(sum({_QTY}) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(sum({_CENTS}) AS BIGINT) / CAST(count(*) * 100 AS DOUBLE)
         AS avg_price,
       CAST(sum({_DPCT}) AS BIGINT) / CAST(count(*) * 100 AS DOUBLE)
         AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------- q251


def q251_tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — the forecasting-revenue-change query: a single
    selective filter-and-sum (year × discount band × quantity cap),
    the purest predicate-pushdown benchmark in the suite — every
    predicate reaches the parquet scan, no shuffle at all until the
    1-row result. Revenue = Σ cents×pct exact integer units.

    Scale: the query IS its scan; with date-partitioned or Z-ordered
    layout (q216) it reads one year's row groups and skips the
    rest."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_shipdate",
        f"{_CENTS} AS cents",
        f"{_DPCT} AS d",
        f"{_QTY} AS qty",
    )
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("d") >= 5)
        & (F.col("d") <= 7)
        & (F.col("qty") < 24)
    )
    return sel.agg(
        (F.sum(F.expr("cents * d")) / F.lit(10000.0)).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


Q251_SQL = f"""
SELECT CAST(sum({_CENTS} * {_DPCT}) AS BIGINT) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
  AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01 00:00:00'
  AND {_DPCT} BETWEEN 5 AND 7
  AND {_QTY} < 24
"""


# ------------------------------------------------------------- q252


def q252_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — local supplier volume: the 6-way star join (lineitem
    ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region) with the
    signature correlated condition c_nationkey = s_nationkey (customer
    and supplier in the SAME nation), then revenue per nation. The
    canonical join-order benchmark: the fact table must stay on the
    probe side of broadcast joins end-to-end.

    Scale: all dims broadcast (region→nation chain first, so the
    nation filter prunes before the fact join); lineitem is never
    shuffled until the final ≤|nations|-row aggregation."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_suppkey", f"{_CENTS} AS cents", f"{_DPCT} AS d"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg((F.sum(F.expr("cents * (100 - d)")) / F.lit(10000.0)).alias("revenue"))
        .select("n_name", "revenue")
    )


Q252_SQL = f"""
SELECT n.n_name,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n.n_name
"""


# ------------------------------------------------------------- q253


def q253_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion effect: one month of lineitem joined to
    part, conditional revenue share of PROMO-type parts — the
    conditional-aggregation-over-a-join shape (one pass computes both
    the numerator and denominator; no second scan, no self-join).
    Percentage = one final double division of two exact integer
    sums.

    Scale: part broadcast; the month filter pushes down; the answer
    is 1 row off a single joined aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).selectExpr("l_partkey", f"{_CENTS} AS cents", f"{_DPCT} AS d")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.sum(F.when(F.col("is_promo"), F.expr("cents * (100 - d)")).otherwise(0))
        .alias("_promo"),
        F.sum(F.expr("cents * (100 - d)")).alias("_total"),
    ).select(
        (F.col("_promo") * 100.0 / F.col("_total").cast("double")).alias(
            "promo_revenue_pct"
        ),
        (F.col("_promo") / F.lit(10000.0)).alias("promo_revenue"),
        (F.col("_total") / F.lit(10000.0)).alias("total_revenue"),
    )


Q253_SQL = f"""
SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN {_CENTS} * (100 - {_DPCT}) ELSE 0 END) AS BIGINT)
         * 100.0
         / CAST(CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) AS DOUBLE)
         AS promo_revenue_pct,
       CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN {_CENTS} * (100 - {_DPCT}) ELSE 0 END) AS BIGINT)
         / 10000.0 AS promo_revenue,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0
         AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(l.l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-03-01 00:00:00'
  AND CAST(l.l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-04-01 00:00:00'
"""


QUERIES_EXT33 = {
    "q250_tpch_q1_pricing_summary": q250_tpch_q1_pricing_summary,
    "q251_tpch_q6_revenue_forecast": q251_tpch_q6_revenue_forecast,
    "q252_tpch_q5_local_supplier": q252_tpch_q5_local_supplier,
    "q253_tpch_q14_promo_effect": q253_tpch_q14_promo_effect,
}


def _oracles_ext33() -> dict[str, str]:
    return {
        "q250_tpch_q1_pricing_summary": Q250_SQL,
        "q251_tpch_q6_revenue_forecast": Q251_SQL,
        "q252_tpch_q5_local_supplier": Q252_SQL,
        "q253_tpch_q14_promo_effect": Q253_SQL,
    }
