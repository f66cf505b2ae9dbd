"""Round-5 driver query families, batch 55 (q338-q340): the last
three TPC-H shapes — Q12 (shipping modes & order priority), Q19
(discounted revenue, disjunctive brand/quantity/size bands), Q20
(potential part promotion) — completing 22/22 under the documented
substitution discipline.

Boundary note #3 (extends ext51/ext54): lineitem has no l_shipmode /
l_shipinstruct / l_commitdate / l_receiptdate. Substitutions:

* **ship mode (Q12)** := the ship-lag band — 'FAST' when the line
  ships within {Q12_FAST_DAYS} days of the order date, 'SLOW'
  otherwise; the lag band subsumes the spec's separate "received
  late" test (lag IS the lateness measure the schema can express).
  Shape preserved: 2-way join + per-mode conditional counts of
  high/low priorities.
* **Q19** keeps the spec's disjunctive (brand, quantity band, size
  band) predicate verbatim — those columns all exist; only the
  shipmode/shipinstruct conjuncts are dropped (documented).
* **ps_availqty (Q20)** := the pair's observed shipped quantity over
  the full history; "excess" suppliers are those whose observed
  capacity for name-prefixed parts exceeds {Q20_EXCESS_PCT}% of what
  they shipped of those parts in {Q20_YEAR} — the spec's
  availqty > 50% · year-shipments test on the observed relation.
  The nested IN-subquery chain (parts → partsupp → suppliers →
  nation) is kept as semi-joins.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

_EP_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_DPCT = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"

# ------------------------------------------------------------- q338

Q12_FAST_DAYS = 30
Q12_YEAR = 1997


def q338_tpch_q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12≈ — shipping modes and order priority: per ship-lag
    band (module-note substitution for l_shipmode), how many lines
    carried urgent (1-URGENT/2-HIGH) vs other priorities in one
    year. Shape: one orderkey equi-join, derived-class grouping,
    conditional counts — the spec's CASE-sum form exactly. The spec's
    separate "received late" filter is subsumed by the band itself
    (lag IS the lateness measure here), so all year lines count and
    both bands appear.

    Scale: the year filter prunes the lineitem scan (partition
    pruning on a shipdate-partitioned table); one join, one
    2-row agg with map-side combine."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q12_YEAR}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q12_YEAR + 1}-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_FAST_DAYS} DAYS"),
            "FAST",
        )
        .otherwise("SLOW")
        .alias("shipmode"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
    )
    return (
        j.groupBy("shipmode")
        .agg(
            F.sum(F.when(F.col("urgent"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("urgent"), 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


Q338_SQL = f"""
SELECT CASE WHEN CAST(l_shipdate AS TIMESTAMP)
              <= CAST(o_orderdate AS TIMESTAMP) + INTERVAL {Q12_FAST_DAYS} DAY
            THEN 'FAST' ELSE 'SLOW' END AS shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '{Q12_YEAR}-01-01 00:00:00'
  AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '{Q12_YEAR + 1}-01-01 00:00:00'
GROUP BY 1
ORDER BY shipmode
"""


# ------------------------------------------------------------- q339

Q19_BANDS = (
    ("Brand#2", 1, 11, 1, 5),    # (brand, qty_lo, qty_hi, size_lo, size_hi)
    ("Brand#4", 10, 20, 1, 10),
    ("Brand#17", 20, 30, 1, 15),
)


def q339_tpch_q19_discounted_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 — discounted revenue from a DISJUNCTION of three
    (brand, quantity band, size band) predicates: the classic
    OR-of-conjuncts join the optimizer must not expand into three
    scans. Brand/quantity/size all exist in the schema; only the
    spec's shipmode/shipinstruct conjuncts are dropped (module note).
    Revenue = cents×(100−disc) exact; one join, one 1-row aggregate.

    Scale: the disjunction stays a single residual predicate on ONE
    broadcast-join pass over the fact (the plan to avoid is 3×
    scan-union); part is dim-sized and broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disj = None
    for brand, qlo, qhi, slo, shi in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
        )
        disj = c if disj is None else (disj | c)
    return j.filter(disj).agg(
        (F.sum(F.expr(f"{_EP_CENTS} * (100 - {_DPCT})")) / F.lit(10000.0)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


def _q339_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in Q19_BANDS
    )
    return f"""
SELECT CAST(sum({_EP_CENTS} * (100 - {_DPCT})) AS BIGINT)
         / CAST(10000.0 AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


# ------------------------------------------------------------- q340

Q20_NAME_PREFIX = "small"
Q20_YEAR = 1997
Q20_EXCESS_PCT = 220  # "availqty" (full-history qty) > 220% of the year's qty
Q20_NATION = "NATION_2"


def q340_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20≈ — potential part promotion: suppliers in one nation
    with EXCESS capacity of name-prefixed parts — observed full-
    history shipped quantity above {Q20_EXCESS_PCT}% of what they
    shipped of that part in {Q20_YEAR} (module-note substitution for
    availqty > 0.5·year-qty; the threshold >100% makes the test
    non-vacuous since history strictly contains the year). The spec's
    nested IN-subquery chain — parts LIKE prefix → partsupp pairs
    with the quantity test → suppliers → nation — runs as the same
    chain of semi-joins.

    Scale: the pair aggregates are (part,supp)-keyed with map-side
    combine; the year leg is a partition-pruned re-aggregation of the
    same key; parts and nation broadcast; the supplier list is the
    only output-sized relation."""
    li = _t(spark, sf_dir, "lineitem")
    pk = _t(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select("p_partkey")
    pairs_all = (
        li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("qty_all"))
    )
    pairs_year = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp"))
        )
        .join(F.broadcast(pk), li.l_partkey == pk.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("qty_year"))
    )
    excess = (
        pairs_all.join(pairs_year, ["l_partkey", "l_suppkey"])
        .filter(F.col("qty_all") * 100 > F.col("qty_year") * Q20_EXCESS_PCT)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", (F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


Q340_SQL = f"""
WITH pk AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
),
pa AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty_all
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  GROUP BY 1, 2
),
py AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty_year
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '{Q20_YEAR}-01-01 00:00:00'
    AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '{Q20_YEAR + 1}-01-01 00:00:00'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT pa.l_suppkey
  FROM pa JOIN py ON pa.l_partkey = py.l_partkey
                 AND pa.l_suppkey = py.l_suppkey
  WHERE pa.qty_all * 100 > py.qty_year * {Q20_EXCESS_PCT}
)
SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name
"""


QUERIES_EXT55 = {
    "q338_tpch_q12_shipping_modes": q338_tpch_q12_shipping_modes,
    "q339_tpch_q19_discounted_revenue": q339_tpch_q19_discounted_revenue,
    "q340_tpch_q20_part_promotion": q340_tpch_q20_part_promotion,
}


def _oracles_ext55() -> dict[str, str]:
    return {
        "q338_tpch_q12_shipping_modes": Q338_SQL,
        "q339_tpch_q19_discounted_revenue": _q339_sql(),
        "q340_tpch_q20_part_promotion": Q340_SQL,
    }
