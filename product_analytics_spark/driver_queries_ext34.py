"""Round-4 driver query families, batch 34 (q254-q257): the remaining
TPC-H shapes this schema supports — Q3 (shipping priority, adapted),
Q10 (returned items), Q13 (customer distribution), Q18 (large-volume
customers). Same cents-exact discipline as batch 33.

Adaptations forced by the synthetic schema are explicit: Q3 outputs
o_orderpriority (no o_shippriority column exists); Q10 omits the
address/phone/comment echo columns. The relational shapes — the part
being benchmarked — are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.driver_queries_ext33 import _CENTS, _DPCT, _QTY

# ------------------------------------------------------------- q254

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-03-15"


def q254_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (adapted) — shipping priority: revenue of orders from
    one market segment placed before a date but (partially) unshipped
    after it, top 10 — the selective-join + group + top-k shape.
    Priority column adapted to o_orderpriority (the schema carries no
    o_shippriority). Deterministic total order: (revenue DESC,
    o_orderdate ASC, l_orderkey ASC).

    Scale: both dimension filters cut BEFORE the fact join (segment
    on the broadcast customer side, date on orders); top-10 is
    TakeOrderedAndProject over the grouped relation — no global
    sort."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    ).selectExpr("l_orderkey", f"{_CENTS} AS cents", f"{_DPCT} AS d")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    ).select("c_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    g = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(F.expr("cents * (100 - d)")).alias("_rev")
    )
    return (
        g.orderBy(F.desc("_rev"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("_rev") / F.lit(10000.0)).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


Q254_SQL = f"""
SELECT l.l_orderkey,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0 AS revenue,
       strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND CAST(o.o_orderdate AS DATE) < DATE '{Q3_DATE}'
  AND CAST(l.l_shipdate AS TIMESTAMP) > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) DESC,
         o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------------- q255

Q10_FROM, Q10_TO = "1997-01-01", "1997-04-01"


def q255_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (adapted) — returned-item reporting: customers ranked
    by revenue they returned in one quarter — fact filter (returnflag
    = 'R'), quarter-bounded orders, customer + nation echo columns,
    top 20. The echo columns the schema lacks (address/phone/comment)
    are omitted; the join-agg-rank shape is intact. Deterministic
    tie-break on c_custkey.

    Scale: quarter filter prunes orders before the fact join;
    customer/nation broadcast; top-20 is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).selectExpr("l_orderkey", f"{_CENTS} AS cents", f"{_DPCT} AS d")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("date"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(F.expr("cents * (100 - d)")).alias("_rev")
    )
    return (
        g.orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("_rev") / F.lit(10000.0)).alias("revenue"),
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias(
                "c_acctbal"
            ),
            "n_name",
        )
    )


Q255_SQL = f"""
SELECT c.c_custkey, c.c_name,
       CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) / 10000.0 AS revenue,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
       n.n_name
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '{Q10_FROM}'
  AND CAST(o.o_orderdate AS DATE) < DATE '{Q10_TO}'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY CAST(sum({_CENTS} * (100 - {_DPCT})) AS BIGINT) DESC,
         c.c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------------- q256


def q256_tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: the counts-of-
    counts shape (left join so zero-order customers survive, count per
    customer, then distribution of those counts). The two-level
    aggregation every engagement histogram is.

    Scale: first agg keys on customer (map-side combinable), second
    on the count value — a ≤|max orders per customer|-row relation."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
    )


Q256_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# ------------------------------------------------------------- q257

Q18_QTY = 250


def q257_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume customers: orders whose TOTAL lineitem
    quantity exceeds {Q18_QTY} (the aggregate-HAVING-then-join shape:
    the qualifying-order set is computed first and the wide join runs
    only against it). Output echoes customer + order + the offending
    quantity.

    Scale: the HAVING pre-aggregation is the whole optimization — the
    qualifying set is tiny (top ~1% of orders), so the subsequent
    joins broadcast it instead of joining two fact tables at full
    width."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", f"{_QTY} AS qty"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "o_totalprice"
            ),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


Q257_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum({_QTY}) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum({_QTY}) > {Q18_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       big.sum_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


QUERIES_EXT34 = {
    "q254_tpch_q3_shipping_priority": q254_tpch_q3_shipping_priority,
    "q255_tpch_q10_returned_items": q255_tpch_q10_returned_items,
    "q256_tpch_q13_customer_distribution": q256_tpch_q13_customer_distribution,
    "q257_tpch_q18_large_volume": q257_tpch_q18_large_volume,
}


def _oracles_ext34() -> dict[str, str]:
    return {
        "q254_tpch_q3_shipping_priority": Q254_SQL,
        "q255_tpch_q10_returned_items": Q255_SQL,
        "q256_tpch_q13_customer_distribution": Q256_SQL,
        "q257_tpch_q18_large_volume": Q257_SQL,
    }
