"""Round-5 driver query families, batch 54 (q333-q337): the five
TPC-H remainders unlockable through the OBSERVED-PARTSUPP
substitution — Q2 (min-cost supplier), Q9 (product-type profit), Q11
(important stock), Q16 (parts/supplier relationship), Q22 (global
sales opportunity).

TPC-H boundary note #2 (extends the ext51 note): the synthetic schema
has no ``partsupp`` table, no ``ps_supplycost``/``ps_availqty``, no
supplier/customer comment or phone columns. The substitutions, each a
deterministic function of data the schema HAS:

* **partsupp** := the OBSERVED supplier-part relationships —
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` (with
  per-pair observed revenue/quantity sums where a measure is needed).
  This is exactly the relationship partsupp models; the observed form
  is what a warehouse without the procurement table would derive.
* **ps_supplycost** := the pair's observed unit price (revenue cents
  over quantity, compared by integer cross-multiplication — no float
  division in any predicate) for Q2; a fixed 60% of the part's
  retail-price cents for Q9's profit (a documented pseudo-cost).
* **ps_availqty** := the pair's observed shipped quantity (Q11's
  value weight).
* **supplier complaints (Q16)** := suppliers with negative account
  balance (the one supplier-health column the schema carries).
* **phone country code (Q22)** := the customer's nation name.

Every query keeps its spec SHAPE: Q2's correlated min, Q11's
HAVING-over-global-share, Q16's distinct-count with exclusion
subquery, Q22's avg-subquery + NOT EXISTS anti-join, Q9's 6-way join
with per-line profit expression.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

_EP_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_DPCT = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"

# ------------------------------------------------------------- q333

Q2_SIZE = 15
Q2_TYPE = "ECONOMY"
Q2_REGION = "EUROPE"


def q333_tpch_q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2≈ — minimum-cost supplier: for every part of one size
    and type, the EUROPE supplier with the lowest observed unit cost
    (module-note substitution for ps_supplycost). The spec's
    correlated scalar-min subquery de-correlates into a per-part
    window minimum — cost compares by integer cross-multiplication
    (cents·qty' vs cents'·qty), so the winner is engine-exact with
    (unit cost, suppkey) as the deterministic total order.

    Scale: observed partsupp is one (part,supp)-keyed agg of
    lineitem; the region/nation/supplier legs broadcast; the window
    min shuffles |pairs| rows once on partkey. Spec ordering
    (s_acctbal DESC, n_name, s_name, p_partkey) + LIMIT 100 is a
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.expr(_EP_CENTS)).alias("rev_c"),
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("qty"),
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(p.select("p_partkey", "p_name")),
                ps.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), ps.l_suppkey == sn.s_suppkey)
    )
    # Deterministic per-part total order on (unit cost, suppkey): rank
    # by the exact rational rev_c/qty via a scaled integer key is not
    # possible in a sort, so sort on (rev_c * 10^6 div qty, suppkey) —
    # the floor-scaled unit cost in micro-cents, exact for rev_c <
    # 2^43 (cents*10^6 < 2^63 at any harness SF; overflow margin
    # documented).
    key = F.expr("(rev_c * 1000000) div qty")
    wmin = Window.partitionBy("p_partkey").orderBy(key.asc(), F.col("s_suppkey").asc())
    out = (
        cand.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (key / F.lit(1000000.0)).alias("unit_cost_cents"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
    return out


Q333_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum({_EP_CENTS}) AS rev_c,
         sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2
),
sn AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
cand AS (
  SELECT p.p_partkey, p.p_name, sn.s_suppkey, sn.s_name, sn.s_acctbal,
         sn.n_name, (ps.rev_c * 1000000) // ps.qty AS key
  FROM ps
  JOIN part p ON ps.l_partkey = p.p_partkey
  JOIN sn ON ps.l_suppkey = sn.s_suppkey
  WHERE p.p_size = {Q2_SIZE} AND p.p_type = '{Q2_TYPE}'
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY key ASC, s_suppkey ASC) AS rn
  FROM cand
)
SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
       s_name, n_name, p_partkey, p_name,
       key / CAST(1000000.0 AS DOUBLE) AS unit_cost_cents
FROM win WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ------------------------------------------------------------- q334

Q9_COLOR = "red"
Q9_COST_PCT = 60  # pseudo supply cost = 60% of retail price (cents)


def q334_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9≈ — product-type profit by nation and year: for parts
    whose name contains '{Q9_COLOR}', profit per line = discounted
    revenue − quantity × pseudo-cost, where pseudo-cost is 60% of the
    part's retail-price cents (module-note substitution for
    ps_supplycost; integer, deterministic). Revenue is cents×pct
    exact; the whole aggregate is BIGINT until one final division.

    Scale: the spec's 6-way star — part filter cuts first (LIKE on
    the name), part/supplier/nation broadcast, the lineitem-orders
    join is the only fact-fact edge (orderkey-keyed); the agg is
    |nation×year|-sized with map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_COLOR)
    ).select(
        "p_partkey",
        F.expr(
            f"(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" * {Q9_COST_PCT}) div 100"
        ).alias("cost_c"),
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    amount = F.expr(f"{_EP_CENTS} * (100 - {_DPCT})") - F.expr(
        "CAST(l_quantity AS BIGINT) * cost_c * 100"
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(amount).alias("_p"))
        .select(
            "nation",
            "o_year",
            (F.col("_p") / F.lit(10000.0)).alias("sum_profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q334_SQL = f"""
SELECT n_name AS nation,
       year(CAST(o_orderdate AS TIMESTAMP)) AS o_year,
       CAST(sum({_EP_CENTS} * (100 - {_DPCT})
                - CAST(l_quantity AS BIGINT)
                  * ((CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      * {Q9_COST_PCT}) // 100) * 100) AS BIGINT)
         / CAST(10000.0 AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE contains(p_name, '{Q9_COLOR}')
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ------------------------------------------------------------- q335

Q11_NATION = "NATION_3"
Q11_FRACTION_PERMILLE = 1  # HAVING share > 0.1% of the global value


def q335_tpch_q11_important_stock(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11≈ — important stock identification: per part, the
    observed supplied VALUE (revenue cents) through {Q11_NATION}'s
    suppliers; keep parts whose value exceeds {Q11_FRACTION_PERMILLE}‰
    of the nation's total (module-note substitution for
    supplycost×availqty). The spec's scalar subquery over the same
    aggregate attaches as a whole-relation window total (the q171
    idiom — no re-scan, no 1-row join), and the share predicate is
    integer cross-multiplication.

    Scale: one (part,supp)-keyed agg of the nation-filtered fact
    (broadcast supplier leg), one |parts|-row window — the HAVING
    touches no second pass."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    v = (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_EP_CENTS)).alias("value_c"))
    )
    w = Window.partitionBy()
    out = (
        v.withColumn("total_c", F.sum("value_c").over(w))
        .filter(
            F.col("value_c") * 1000 > F.col("total_c") * Q11_FRACTION_PERMILLE
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("value_c") / F.lit(100.0)).alias("value"),
        )
    )
    return out


Q335_SQL = f"""
WITH v AS (
  SELECT l_partkey, sum({_EP_CENTS}) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey AS ps_partkey,
       value_c / CAST(100.0 AS DOUBLE) AS value
FROM (SELECT l_partkey, value_c, sum(value_c) OVER () AS total_c FROM v)
WHERE value_c * 1000 > total_c * {Q11_FRACTION_PERMILLE}
"""


# ------------------------------------------------------------- q336

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q336_tpch_q16_parts_supplier_rel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16≈ — parts/supplier relationship: how many distinct
    suppliers can supply each (brand, type, size) combination,
    excluding one brand, one type prefix, and "complaint" suppliers
    (module-note substitution: negative account balance). partsupp is
    the observed pair relation; the exclusion subquery is an anti-join
    on the supplier dim.

    Scale: the pair relation aggregates from the fact once; the part
    filter broadcasts; the distinct count groups on the 3 part
    attributes — the spec's shape exactly."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (~F.col("p_type").startswith(Q16_EXCL_TYPE_PREFIX))
        & (F.col("p_size").isin(*Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    out = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
    return out


Q336_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p_size IN ({', '.join(str(x) for x in Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------- q337

Q22_NATIONS = tuple(f"NATION_{i}" for i in (1, 4, 7, 10, 13, 17, 20))
Q22_CUT = "1999-01-01"


def q337_tpch_q22_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22≈ — global sales opportunity: customers in seven
    "country codes" (module-note substitution: nation name for the
    absent phone prefix) with above-average positive balances and NO
    orders. The avg scalar subquery attaches as conditional
    whole-relation window sums over the in-scope customers (one pass,
    integer-cents cross-multiplied — acctbal_c·N > S·1 — so the
    above-average set is engine-exact); the "no orders" predicate is
    a LEFT ANTI join.

    Scale: customers join nation broadcast; the anti-join's right
    side is the orders key projection (semi-join-shaped, no
    amplification); output is |7 codes| rows."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*Q22_NATIONS))
    ck = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.col("n_name").alias("cntrycode"),
        _money_cents("c_acctbal").alias("bal_c"),
    )
    w = Window.partitionBy()
    scored = (
        ck.withColumn(
            "pos_sum", F.sum(F.when(F.col("bal_c") > 0, F.col("bal_c")).otherwise(0)).over(w)
        )
        .withColumn(
            "pos_n", F.sum(F.when(F.col("bal_c") > 0, 1).otherwise(0)).over(w)
        )
        .filter(F.col("bal_c") * F.col("pos_n") > F.col("pos_sum"))
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_CUT).cast("timestamp")
    ).select("o_custkey")
    out = (
        scored.join(o, scored.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            (F.sum("bal_c") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
    return out


Q337_SQL = f"""
WITH ck AS (
  SELECT c_custkey, n_name AS cntrycode,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ({', '.join(f"'{x}'" for x in Q22_NATIONS)})
),
scored AS (
  SELECT * FROM (
    SELECT c_custkey, cntrycode, bal_c,
           sum(CASE WHEN bal_c > 0 THEN bal_c ELSE 0 END) OVER () AS pos_sum,
           sum(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END) OVER () AS pos_n
    FROM ck
  ) WHERE bal_c * pos_n > pos_sum
)
SELECT cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       sum(bal_c) / CAST(100.0 AS DOUBLE) AS totacctbal
FROM scored
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = scored.c_custkey
    AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1999-01-01 00:00:00'
)
GROUP BY 1
ORDER BY cntrycode
"""


QUERIES_EXT54 = {
    "q333_tpch_q2_min_cost_supplier": q333_tpch_q2_min_cost_supplier,
    "q334_tpch_q9_product_profit": q334_tpch_q9_product_profit,
    "q335_tpch_q11_important_stock": q335_tpch_q11_important_stock,
    "q336_tpch_q16_parts_supplier_rel": q336_tpch_q16_parts_supplier_rel,
    "q337_tpch_q22_sales_opportunity": q337_tpch_q22_sales_opportunity,
}


def _oracles_ext54() -> dict[str, str]:
    return {
        "q333_tpch_q2_min_cost_supplier": Q333_SQL,
        "q334_tpch_q9_product_profit": Q334_SQL,
        "q335_tpch_q11_important_stock": Q335_SQL,
        "q336_tpch_q16_parts_supplier_rel": Q336_SQL,
        "q337_tpch_q22_sales_opportunity": Q337_SQL,
    }
