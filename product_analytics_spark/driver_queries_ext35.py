"""Round-4 driver query families, batch 35 (q258-q261): the last
TPC-H shapes this schema can express — Q7 (volume shipping), Q8
(national market share), Q15 (top supplier), Q17 (small-quantity
revenue). With batches 33-34 this makes 12 of the 22 TPC-H queries;
the other 10 need columns the synthetic schema lacks (partsupp,
l_shipmode/l_commitdate/l_receiptdate, c_phone), recorded here so the
coverage boundary is explicit, not silent.

Same cents-exact discipline as batches 33-34.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.driver_queries_ext33 import _CENTS, _DPCT, _QTY

# ------------------------------------------------------------- q258

Q7_N1, Q7_N2 = "NATION_3", "NATION_7"


def q258_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — volume shipping between two nations: revenue flowing
    supplier-nation → customer-nation in BOTH directions, by year —
    the two-sided dimension-pair filter ((n1,n2) OR (n2,n1))
    expressed as one join with a disjunctive predicate on the two
    broadcast nation legs, grouped by (supp_nation, cust_nation,
    year).

    Scale: both nation filters shrink supplier/customer BEFORE they
    broadcast; the fact table joins each leg once and never
    shuffles until the ≤(2×|years|)-row aggregation."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_suppkey",
        "year(l_shipdate) AS l_year",
        f"{_CENTS} AS cents",
        f"{_DPCT} AS d",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(Q7_N1, Q7_N2)
    ).select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == Q7_N1)
                & (F.col("cust_nation") == Q7_N2)
            )
            | (
                (F.col("supp_nation") == Q7_N2)
                & (F.col("cust_nation") == Q7_N1)
            )
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(F.expr("cents * (100 - d)")).alias("_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("int").alias("l_year"),
            (F.col("_rev") / F.lit(10000.0)).alias("revenue"),
        )
    )


Q258_SQL = f"""
SELECT s_n.n_name AS supp_nation,
       c_n.n_name AS cust_nation,
       CAST(year(CAST(l.l_shipdate AS TIMESTAMP)) AS INT) AS l_year,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation s_n ON s_n.n_nationkey = s.s_nationkey
JOIN nation c_n ON c_n.n_nationkey = c.c_nationkey
WHERE (s_n.n_name = '{Q7_N1}' AND c_n.n_name = '{Q7_N2}')
   OR (s_n.n_name = '{Q7_N2}' AND c_n.n_name = '{Q7_N1}')
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------- q259

Q8_NATION = "NATION_5"
Q8_REGION = "AMERICA"
Q8_TYPE = "ECONOMY"


def q259_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: the share of one nation's
    suppliers in a region's market for one part type, by year — the
    ratio-of-conditional-sums-per-group shape over a 7-table star.
    Numerator and denominator come from ONE aggregation (conditional
    sum on supplier nation); the share is one final double division
    of exact integer units per year.

    Scale: the p_type and region filters prune the broadcast sides
    before the fact joins; lineitem shuffles only for the |years|-row
    aggregation."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        f"{_CENTS} AS cents",
        f"{_DPCT} AS d",
    )
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_custkey", "year(o_orderdate) AS o_year"
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE).select(
        "p_partkey"
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION).select(
        "r_regionkey"
    )
    cust_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("cnk"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cnk")
    ).select("c_custkey")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    g = j.groupBy("o_year").agg(
        F.sum(
            F.when(
                F.col("supp_nation") == Q8_NATION, F.expr("cents * (100 - d)")
            ).otherwise(0)
        ).alias("_nat"),
        F.sum(F.expr("cents * (100 - d)")).alias("_tot"),
    )
    return g.select(
        F.col("o_year").cast("int").alias("o_year"),
        (F.col("_nat") / F.col("_tot").cast("double")).alias("mkt_share"),
        (F.col("_tot") / F.lit(10000.0)).alias("total_volume"),
    )


Q259_SQL = f"""
SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
       CAST(sum(CASE WHEN s_n.n_name = '{Q8_NATION}'
                     THEN {_CENTS} * (100 - {_DPCT}) ELSE 0 END) AS BIGINT)
         / CAST(CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) AS DOUBLE)
         AS mkt_share,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0
         AS total_volume
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation c_n ON c_n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = c_n.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation s_n ON s_n.n_nationkey = s.s_nationkey
WHERE p.p_type = '{Q8_TYPE}' AND r.r_name = '{Q8_REGION}'
GROUP BY 1
"""


# ------------------------------------------------------------- q260

Q15_FROM, Q15_TO = "1997-01-01", "1997-04-01"


def q260_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier: the view-then-self-compare shape: a
    revenue-per-supplier relation for one quarter, then the
    supplier(s) whose revenue EQUALS the maximum — the original uses
    a scalar subquery against the view; here the max attaches as a
    whole-relation window over the |suppliers|-row aggregate (the
    q171 idiom — no second scan of the view, no scalar join).

    Scale: revenue view is one fact agg keyed on supplier; the max
    and the filter ride the tiny aggregate."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    ).selectExpr("l_suppkey", f"{_CENTS} AS cents", f"{_DPCT} AS d")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.expr("cents * (100 - d)")).alias("_rev")
    )
    wmax = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    top = rev.withColumn("_mx", F.max("_rev").over(wmax)).filter(
        F.col("_rev") == F.col("_mx")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey",
        "s_name",
        (F.col("_rev") / F.lit(10000.0)).alias("total_revenue"),
    )


Q260_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) AS rev
  FROM lineitem
  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.rev / 10000.0 AS total_revenue
FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev = (SELECT max(rev) FROM revenue)
"""


# ------------------------------------------------------------- q261

Q17_BRAND = "Brand#1"


def q261_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — small-quantity-order revenue: lineitems of one
    brand whose quantity falls below 20% of that PART's average
    quantity — the correlated-average comparison, de-correlated into
    a per-part aggregate joined back (the A9 discipline). The 20%
    threshold compares by integer cross-multiplication
    (5·qty < avg ≡ 5·qty·n < Σqty), so no division, no rounding
    ambiguity, engine-identical selection.

    Scale: the per-part average is a tiny relation over the filtered
    brand; it broadcasts back onto the same filtered fact slice —
    the fact never self-joins at full width."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND).select(
        "p_partkey"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .selectExpr("l_partkey", f"{_QTY} AS qty", f"{_CENTS} AS cents")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    avg_rel = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sq"), F.count(F.lit(1)).alias("nq")
    ).select(F.col("l_partkey").alias("ak"), "sq", "nq")
    sel = li.join(
        F.broadcast(avg_rel), F.col("l_partkey") == F.col("ak")
    ).filter(F.expr("5 * qty * nq < sq"))
    return sel.agg(
        (F.sum("cents") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


Q261_SQL = f"""
WITH li AS (
  SELECT l.l_partkey, {_QTY} AS qty, {_CENTS} AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{Q17_BRAND}'
),
a AS (
  SELECT l_partkey, sum(qty) AS sq, count(*) AS nq FROM li GROUP BY l_partkey
)
SELECT CAST(sum(li.cents) AS BIGINT) / 700.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM li JOIN a ON a.l_partkey = li.l_partkey
WHERE 5 * li.qty * a.nq < a.sq
"""


QUERIES_EXT35 = {
    "q258_tpch_q7_volume_shipping": q258_tpch_q7_volume_shipping,
    "q259_tpch_q8_market_share": q259_tpch_q8_market_share,
    "q260_tpch_q15_top_supplier": q260_tpch_q15_top_supplier,
    "q261_tpch_q17_small_quantity": q261_tpch_q17_small_quantity,
}


def _oracles_ext35() -> dict[str, str]:
    return {
        "q258_tpch_q7_volume_shipping": Q258_SQL,
        "q259_tpch_q8_market_share": Q259_SQL,
        "q260_tpch_q15_top_supplier": Q260_SQL,
        "q261_tpch_q17_small_quantity": Q261_SQL,
    }
