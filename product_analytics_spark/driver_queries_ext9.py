"""Round-3 driver query families, batch 8 (q170+): FIFO lot
allocation via cumulative-interval intersection, largest-remainder
integer budget allocation, and delta-join incremental view
maintenance.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import (
    _cents_out,
    _money_cents,
    _t,
)

# ------------------------------------------------------------- q170

def q170_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation WITHOUT iteration — the inventory/cost-
    accounting matcher (sales consume receipt lots oldest-first)
    expressed as pure relational algebra: per part, receipts and
    sales each get cumulative-quantity intervals [cum_prev, cum) from
    one ordered window, and an allocation row exists exactly where
    the intervals intersect, with quantity = overlap length =
    least(hi,hi) − greatest(lo,lo). The procedural loop ("pop lots
    until the sale is filled") becomes a part-keyed equi-join with a
    range residual — per-part fan-out is bounded by lots-per-sale,
    not data size, and both interval relations come from the same
    part-hash partitioning (one shuffle each, AQE handles hot parts).
    Integer quantities make every boundary exact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_linestatus",
        "l_shipdate",
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("qty"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    cum = F.sum("qty").over(w)

    def intervals(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            "l_partkey",
            F.col("l_orderkey").alias(f"{tag}_orderkey"),
            F.col("l_linenumber").alias(f"{tag}_linenumber"),
            cum.alias(f"{tag}_hi"),
            (cum - F.col("qty")).alias(f"{tag}_lo"),
        )

    r = intervals(li.filter(F.col("l_linestatus") == "F"), "r")
    s = intervals(li.filter(F.col("l_linestatus") == "O"), "s")
    j = r.join(
        s,
        (r["l_partkey"] == s["l_partkey"])
        & (F.col("r_lo") < F.col("s_hi"))
        & (F.col("s_lo") < F.col("r_hi")),
    )
    alloc = F.least(F.col("r_hi"), F.col("s_hi")) - F.greatest(
        F.col("r_lo"), F.col("s_lo")
    )
    return j.select(
        r["l_partkey"].alias("partkey"),
        "r_orderkey",
        "r_linenumber",
        "s_orderkey",
        "s_linenumber",
        alloc.alias("alloc_qty"),
    )


Q170_SQL = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_linestatus, l_shipdate,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
  FROM lineitem
),
c AS (
  SELECT *,
         sum(qty) OVER (PARTITION BY l_partkey, l_linestatus
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM li
),
r AS (SELECT l_partkey, l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
             CAST(hi AS BIGINT) AS r_hi, CAST(hi - qty AS BIGINT) AS r_lo
      FROM c WHERE l_linestatus = 'F'),
s AS (SELECT l_partkey, l_orderkey AS s_orderkey, l_linenumber AS s_linenumber,
             CAST(hi AS BIGINT) AS s_hi, CAST(hi - qty AS BIGINT) AS s_lo
      FROM c WHERE l_linestatus = 'O')
SELECT r.l_partkey AS partkey,
       r.r_orderkey, r.r_linenumber, s.s_orderkey, s.s_linenumber,
       least(r.r_hi, s.s_hi) - greatest(r.r_lo, s.s_lo) AS alloc_qty
FROM r JOIN s ON s.l_partkey = r.l_partkey
             AND r.r_lo < s.s_hi AND s.s_lo < r.r_hi
"""


# ------------------------------------------------------------- q171

ALLOC_BUDGET = 10_000


def q171_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) integer apportionment: a fixed
    budget of ALLOC_BUDGET units split across nations proportional to
    revenue, entirely in integer arithmetic — base = floor(budget·v/
    total), remainder = budget·v − base·total, the leftover units go
    to the largest remainders (deterministic tie-break on nation).
    Conservation (Σalloc = budget) is an identity. This is the quota
    engine under sampling allocations, ad budget splits, and shard
    sizing; plan: one cents agg, then windows over the |nations|-row
    relation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_money_cents("o_totalprice")).alias("v"))
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = rev.select(
        "n_name", "v", F.sum("v").over(w).alias("tot")
    ).select(
        "n_name",
        "v",
        "tot",
        F.expr(f"(v * {ALLOC_BUDGET}) div tot").alias("base"),
        (F.col("v") * ALLOC_BUDGET - F.expr(f"(v * {ALLOC_BUDGET}) div tot") * F.col("tot")).alias("rem"),
    )
    wr = Window.partitionBy().orderBy(F.desc("rem"), F.asc("n_name"))
    t2 = t.select(
        "*",
        F.row_number().over(wr).alias("rr"),
        (F.lit(ALLOC_BUDGET) - F.sum("base").over(w)).alias("leftover"),
    )
    return t2.select(
        "n_name",
        _cents_out(F.col("v")).alias("revenue"),
        F.round(F.col("v").cast("double") / F.col("tot").cast("double"), 6).alias(
            "revenue_share"
        ),
        (F.col("base") + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0))
        .cast("bigint")
        .alias("allocation"),
    )


Q171_SQL = f"""
WITH rev AS (
  SELECT n.n_name,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
t AS (
  SELECT n_name, CAST(v AS BIGINT) AS v, CAST(sum(v) OVER () AS BIGINT) AS tot
  FROM rev
),
b AS (
  SELECT n_name, v, tot,
         (v * {ALLOC_BUDGET}) // tot AS base,
         v * {ALLOC_BUDGET} - ((v * {ALLOC_BUDGET}) // tot) * tot AS rem
  FROM t
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, n_name ASC) AS rr,
         {ALLOC_BUDGET} - sum(base) OVER () AS leftover
  FROM b
)
SELECT n_name,
       v / 100.0 AS revenue,
       round(CAST(v AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS revenue_share,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS allocation
FROM r
"""


# ------------------------------------------------------------- q172

IVM_ORDER_CUT = dt.datetime(1998, 1, 1)
IVM_SHIP_CUT = dt.datetime(1998, 1, 1)


def q172_delta_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the delta-join
    algebra Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, applied to the
    revenue-per-priority join view over orders⋈lineitem and THEN
    merged with the old view's aggregate state. The query computes the
    maintained result from the four pieces; the oracle recomputes the
    view from scratch — passing proves the maintenance algebra exact
    (integer cents sums make the state merge associative, q158's
    property, composed with the join delta rule).

    At 100 TB this is the nightly fact-join refresh: A_old⋈B_old is
    the stored view, only the delta joins run, and each delta side is
    days — not years — of data; all four joins share the orderkey
    hash partitioning."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        (F.col("o_orderdate") < F.lit(IVM_ORDER_CUT)).alias("o_old"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _money_cents("l_extendedprice").alias("c"),
        (F.col("l_shipdate") < F.lit(IVM_SHIP_CUT)).alias("l_old"),
    )
    a_old = o.filter(F.col("o_old"))
    a_new = o.filter(~F.col("o_old"))
    b_old = li.filter(F.col("l_old"))
    b_new = li.filter(~F.col("l_old"))

    def piece(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(b, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
        )

    v_old = piece(a_old, b_old)        # the stored view state
    d1 = piece(a_new, b_old)           # ΔA ⋈ B_old
    d2 = piece(a_old, b_new)           # A_old ⋈ ΔB
    d3 = piece(a_new, b_new)           # ΔA ⋈ ΔB
    merged = (
        v_old.unionByName(d1)
        .unionByName(d2)
        .unionByName(d3)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_items"),
        _cents_out(F.col("s")).alias("revenue"),
    )


Q172_SQL = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) / 100.0 AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


QUERIES_EXT9 = {
    "q170_fifo_allocation": q170_fifo_allocation,
    "q171_budget_allocation": q171_budget_allocation,
    "q172_delta_join_maintenance": q172_delta_join_maintenance,
}

ORACLES_EXT9 = {
    "q170_fifo_allocation": Q170_SQL,
    "q171_budget_allocation": Q171_SQL,
    "q172_delta_join_maintenance": Q172_SQL,
}
