"""Round-4 driver query families, batch 37 (q266-q269): hierarchy
share-of-parent, SLO error-budget burn, keyset pagination parity, and
CDC diff with changed-column provenance.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.driver_queries_ext24 import (
    HIER_FANOUT,
    _hier_ancestor_sql,
)

# ------------------------------------------------------------- q266


def q266_hierarchy_parent_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227: share-of-parent hierarchy report — the drill-down number
    every BOM/org rollup screen shows next to the absolute value: each
    node's subtree value as a fraction of its PARENT's subtree value.
    Reuses q217's closed-form ancestor explode for the subtree sums,
    then ONE parent-keyed self-join of the (node → rollup) relation
    against itself (parent derived by the same guarded division).
    Shares are exact integer cents divided once per row.

    Scale: the rollup relation is |nodes|-sized; the self-join is a
    key equi-join on it — the fact explode never runs twice."""
    chain = _hier_ancestor_sql("div")
    arr = ", ".join(chain)
    p = _t(spark, sf_dir, "part").selectExpr(
        "p_partkey",
        "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        f"array({arr}) AS anc",
    )
    pairs = p.select(
        "cents", F.explode("anc").alias("ancestor")
    ).filter(F.col("ancestor").isNotNull())
    rollup = pairs.groupBy("ancestor").agg(
        F.sum("cents").alias("subtree_cents"),
        F.count(F.lit(1)).alias("subtree_size"),
    )
    node = rollup.select(
        F.col("ancestor").alias("node"),
        F.col("subtree_cents").alias("node_cents"),
        F.col("subtree_size").alias("node_size"),
        F.expr(
            f"CASE WHEN ancestor >= 1 "
            f"THEN (ancestor - 1) div {HIER_FANOUT} END"
        ).alias("parent"),
    )
    par = rollup.select(
        F.col("ancestor").alias("parent"),
        F.col("subtree_cents").alias("parent_cents"),
    )
    return (
        node.join(par, "parent")
        .select(
            F.col("node").cast("bigint").alias("p_partkey"),
            F.col("parent").cast("bigint").alias("parent_key"),
            (F.col("node_cents") / F.lit(100.0)).alias("subtree_value"),
            F.col("node_size").cast("bigint").alias("subtree_size"),
            (
                F.col("node_cents") / F.col("parent_cents").cast("double")
            ).alias("share_of_parent"),
        )
    )


def _q266_sql() -> str:
    chain = _hier_ancestor_sql("//")
    arr = ", ".join(chain)
    return f"""
WITH p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         [{arr}] AS anc
  FROM part
),
idx AS (SELECT unnest(range(1, {len(_hier_ancestor_sql('//')) + 1})) AS i),
pairs AS (
  SELECT p.cents, list_extract(p.anc, idx.i) AS ancestor
  FROM p CROSS JOIN idx
  WHERE list_extract(p.anc, idx.i) IS NOT NULL
),
rollup AS (
  SELECT ancestor, sum(cents) AS subtree_cents, count(*) AS subtree_size
  FROM pairs GROUP BY ancestor
),
node AS (
  SELECT ancestor AS nd, subtree_cents AS node_cents,
         subtree_size AS node_size,
         CASE WHEN ancestor >= 1 THEN (ancestor - 1) // {HIER_FANOUT} END
           AS parent
  FROM rollup
)
SELECT CAST(n.nd AS BIGINT) AS p_partkey,
       CAST(n.parent AS BIGINT) AS parent_key,
       CAST(n.node_cents AS BIGINT) / 100.0 AS subtree_value,
       CAST(n.node_size AS BIGINT) AS subtree_size,
       CAST(n.node_cents AS BIGINT) / CAST(r.subtree_cents AS DOUBLE)
         AS share_of_parent
FROM node n JOIN rollup r ON r.ancestor = n.parent
"""


# ------------------------------------------------------------- q267

SLO_THRESHOLD_CENTS = 5000  # "latency" proxy: event value in cents
SLO_TARGET_NUM, SLO_TARGET_DEN = 99, 100  # 99% of events under threshold


def q267_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X228: SLO error-budget burn — SRE analytics over the event
    stream: treat event value as a latency proxy with an SLO of
    {SLO_TARGET_NUM}/{SLO_TARGET_DEN} events under the threshold; per
    day, compute violations, the allowed budget, the burn ratio
    (violations vs allowance — >1 means the day burned more than it
    was allotted), and the running cumulative budget state for the
    month. Burn comparisons use integer cross-multiplication
    (violations × den × target_den vs allowance terms), so the
    paging decision is bit-identical on both engines; only the
    reported ratio is a final double.

    Scale: one day-keyed agg + one tiny ordered window over |days|
    rows — the alerting math costs nothing beyond the daily rollup
    every ops pipeline already has."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            > SLO_THRESHOLD_CENTS
        )
        .cast("long")
        .alias("viol"),
    )
    daily = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("viol").alias("v"),
    )
    w = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("v").cast("bigint").alias("violations"),
        # allowance = n * (1 - target) = n * (den-num)/den, exact int compare
        (
            F.col("v") * SLO_TARGET_DEN
            > F.col("n") * (SLO_TARGET_DEN - SLO_TARGET_NUM)
        ).alias("over_budget"),
        (
            F.col("v")
            * SLO_TARGET_DEN
            / (F.col("n") * (SLO_TARGET_DEN - SLO_TARGET_NUM)).cast("double")
        ).alias("burn_ratio"),
        F.sum("v").over(w).cast("bigint").alias("cum_violations"),
        F.sum("n").over(w).cast("bigint").alias("cum_events"),
    )
    return out


Q267_SQL = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   > {SLO_THRESHOLD_CENTS} THEN 1 ELSE 0 END AS viol
  FROM events
),
daily AS (SELECT day, count(*) AS n, sum(viol) AS v FROM ev GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_events,
       CAST(v AS BIGINT) AS violations,
       v * {SLO_TARGET_DEN} > n * {SLO_TARGET_DEN - SLO_TARGET_NUM}
         AS over_budget,
       v * {SLO_TARGET_DEN}
         / CAST(n * {SLO_TARGET_DEN - SLO_TARGET_NUM} AS DOUBLE)
         AS burn_ratio,
       CAST(sum(v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_violations,
       CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_events
FROM daily
"""


# ------------------------------------------------------------- q268

PAGE_SIZE = 100
PAGE_NO = 3  # fetch the 4th page (0-based)


def q268_keyset_pagination_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X229: keyset (cursor) pagination parity — the API-serving
    pattern OFFSET pagination can't survive at scale: page N+1 is
    fetched as ``key > cursor ORDER BY key LIMIT page`` where the
    cursor is the last key of page N. This query computes page
    {PAGE_NO} BOTH ways — keyset (cursor derived as the
    {PAGE_NO}×{PAGE_SIZE}-th key) and the offset definition the
    oracle states — and returns the keyset result; equality with the
    oracle's offset slice proves the cursor walk reconstructs the
    same page exactly (requires a UNIQUE sort key — the pattern's
    precondition, satisfied by o_orderkey).

    Scale: keyset pages are O(page) work each (index/zone-map range
    scan from the cursor); OFFSET pages are O(offset) — the reason
    deep pagination must be keyset."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cursor_row = (
        o.orderBy("o_orderkey").limit(PAGE_NO * PAGE_SIZE).agg(
            F.max("o_orderkey").alias("cur")
        )
    )
    cur = cursor_row.collect()[0]["cur"]
    return (
        o.filter(F.col("o_orderkey") > cur)
        .orderBy("o_orderkey")
        .limit(PAGE_SIZE)
        .select("o_orderkey", "o_custkey")
    )


Q268_SQL = f"""
SELECT o_orderkey, o_custkey
FROM orders
ORDER BY o_orderkey
LIMIT {PAGE_SIZE} OFFSET {PAGE_NO * PAGE_SIZE}
"""


# ------------------------------------------------------------- q269

CDC_STATUS_MOD = 7
CDC_PRICE_MOD = 11


def q269_cdc_changed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X230: CDC diff with changed-column provenance — X48's snapshot
    diff upgraded to what a change-data-feed consumer actually needs:
    WHICH columns changed per updated key. Version 2 is derived
    deterministically (status flips for keys ≡0 mod {CDC_STATUS_MOD},
    price bumps for keys ≡0 mod {CDC_PRICE_MOD}); the diff joins the
    versions on the key and assembles a SORTED array of changed
    column names from per-column null-safe comparisons — one join,
    no per-column passes. Unchanged keys drop; the changed-column
    array is the provenance a downstream selective-refresh keys on.

    Scale: the diff is one key equi-join; per-column comparison is
    map-side; the output is |changed keys|-sized — the whole point
    of CDF over full-table re-reads."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    v2 = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % CDC_STATUS_MOD == 0, F.lit("X")
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % CDC_PRICE_MOD == 0,
            F.col("price_cents") + 500,
        )
        .otherwise(F.col("price_cents"))
        .alias("price_cents"),
    )
    j = o.alias("a").join(v2.alias("b"), "o_orderkey")
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                F.when(
                    F.col("a.o_orderstatus") != F.col("b.o_orderstatus"),
                    F.lit("o_orderstatus"),
                ),
                F.when(
                    F.col("a.price_cents") != F.col("b.price_cents"),
                    F.lit("price_cents"),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        j.select(
            "o_orderkey",
            changed_cols.alias("_cc"),
        )
        .filter(F.size("_cc") > 0)
        .select(
            "o_orderkey",
            F.array_join("_cc", ",").alias("changed_columns"),
            F.size("_cc").cast("int").alias("n_changed"),
        )
    )


Q269_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents
  FROM orders
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {CDC_STATUS_MOD} = 0 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % {CDC_PRICE_MOD} = 0 THEN price_cents + 500
              ELSE price_cents END AS price_cents
  FROM o
),
j AS (
  SELECT a.o_orderkey,
         list_sort(list_filter([
           CASE WHEN a.o_orderstatus <> b.o_orderstatus
                THEN 'o_orderstatus' END,
           CASE WHEN a.price_cents <> b.price_cents
                THEN 'price_cents' END
         ], x -> x IS NOT NULL)) AS cc
  FROM o a JOIN v2 b ON b.o_orderkey = a.o_orderkey
)
SELECT o_orderkey,
       array_to_string(cc, ',') AS changed_columns,
       CAST(len(cc) AS INT) AS n_changed
FROM j WHERE len(cc) > 0
"""


QUERIES_EXT37 = {
    "q266_hierarchy_parent_share": q266_hierarchy_parent_share,
    "q267_slo_burn_rate": q267_slo_burn_rate,
    "q268_keyset_pagination_parity": q268_keyset_pagination_parity,
    "q269_cdc_changed_columns": q269_cdc_changed_columns,
}


def _oracles_ext37() -> dict[str, str]:
    return {
        "q266_hierarchy_parent_share": _q266_sql(),
        "q267_slo_burn_rate": Q267_SQL,
        "q268_keyset_pagination_parity": Q268_SQL,
        "q269_cdc_changed_columns": Q269_SQL,
    }
