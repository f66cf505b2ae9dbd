"""Round-5 driver query families, batch 60 (q353-q354): exact
decision-stump induction (the one-split tree, Gini impurity in
integer micro-units over a prefix-sum split curve) and rank-based
quantile normalization (the cross-group distribution alignment step
ML preprocessing uses), both engine-exact.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q353

GINI_SCALE = 1_000_000


def q353_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump induction — the first split of a tree
    learner, done as a relational prefix-sum instead of per-threshold
    scans: predict l_returnflag='R' from a quantity threshold.  ONE
    hash-agg by quantity gives per-value (n, positives); cumulative
    sums over the |distinct-quantity| curve give every candidate
    split's left/right counts at once; weighted binary Gini is pure
    integer arithmetic in micro-units (2*p*(n-p)*1e6 div (n_side*n) —
    floor per side, no floats anywhere).  Emits the full split curve
    with each candidate's impurity and a best-split flag
    (deterministic tie-break on the smaller threshold).

    Scale: corpus work = one qty-keyed agg; the curve (≤ |distinct
    qty| rows) carries the prefix window and the final argmin — a
    tree library's histogram-split trick (LightGBM-style) expressed
    as two post-agg windows."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    per_q = li.groupBy("q").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    wc = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    curve = per_q.select(
        "q",
        F.sum("n").over(wc).alias("nl"),
        F.sum("p").over(wc).alias("pl"),
        F.sum("n").over(wa).alias("nt"),
        F.sum("p").over(wa).alias("pt"),
    ).filter(F.col("nl") < F.col("nt"))  # right side must be non-empty
    g = curve.select(
        F.col("q").alias("split_le"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
        (F.col("pt") - F.col("pl")).cast("long").alias("pos_right"),
        F.expr(
            f"(2 * pl * (nl - pl) * {GINI_SCALE}L) div (nl * nt)"
            f" + (2 * (pt - pl) * ((nt - nl) - (pt - pl)) * {GINI_SCALE}L)"
            " div ((nt - nl) * nt)"
        ).alias("gini_micro"),
    )
    best = F.row_number().over(
        Window.orderBy("gini_micro", "split_le")
    )
    return g.withColumn("is_best", best == 1).orderBy("split_le")


Q353_SQL = f"""
WITH per_q AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM lineitem GROUP BY 1
),
curve AS (
  SELECT q,
         sum(n) OVER (ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
         sum(p) OVER (ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
         sum(n) OVER () AS nt,
         sum(p) OVER () AS pt
  FROM per_q
),
g AS (
  SELECT q AS split_le,
         CAST(nl AS BIGINT) AS n_left,
         CAST(pl AS BIGINT) AS pos_left,
         CAST(nt - nl AS BIGINT) AS n_right,
         CAST(pt - pl AS BIGINT) AS pos_right,
         CAST((2 * pl * (nl - pl) * {GINI_SCALE}) // (nl * nt)
              + (2 * (pt - pl) * ((nt - nl) - (pt - pl)) * {GINI_SCALE})
                // ((nt - nl) * nt) AS BIGINT) AS gini_micro
  FROM curve WHERE nl < nt
)
SELECT split_le, n_left, pos_left, n_right, pos_right, gini_micro,
       row_number() OVER (ORDER BY gini_micro, split_le) = 1 AS is_best
FROM g ORDER BY split_le
"""


# ------------------------------------------------------------- q354

def q354_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization — align each nation's
    per-customer spend distribution onto the POOLED distribution (the
    batch-effect correction step from ML/bioinformatics pipelines):
    customer at within-nation rank r of n_g maps to the pooled spend
    at global position ceil(r * N / n_g).  Both rankings and the
    position join are exact integers; the mapped value is the pooled
    order statistic itself.

    Scale: spend is a |customers|-sized POST-AGGREGATE of orders; the
    within-group windows partition by nation; the pooled ranking is
    the suite's documented post-agg global window (at 100 TB it swaps
    for repartitionByRange + per-range offsets — a total-order sort,
    not a single reducer).  The position join is |customers| x 1
    equi-join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(_money_cents("o_totalprice")).alias("cents"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nation"),
            "cents",
        )
    )
    wg = Window.partitionBy("nation").orderBy("cents", "custkey")
    wp = Window.partitionBy()
    ranked = spend.select(
        "custkey",
        "nation",
        "cents",
        F.row_number().over(wg).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("nation")).alias("ng"),
        F.count(F.lit(1)).over(wp).alias("nt"),
    ).withColumn(
        # ceil(r*nt/ng) in the positive-operand form (a + b - 1) div b —
        # the -((-a) div b) trick diverges across engines (Spark div
        # truncates, DuckDB // floors).
        "pos",
        F.expr("CAST((r * nt + ng - 1) div ng AS BIGINT)"),
    )
    pooled = spend.select(
        F.row_number()
        .over(Window.orderBy("cents", "custkey"))
        .cast("long")
        .alias("pos"),
        F.col("cents").alias("pooled_cents"),
    )
    return (
        ranked.join(pooled, "pos")
        .select(
            "custkey",
            F.col("nation").cast("int").alias("nation"),
            (F.col("cents") / 100.0).alias("spend"),
            (F.col("pooled_cents") / 100.0).alias("normalized_spend"),
        )
        .orderBy("custkey")
    )


Q354_SQL = """
WITH spend AS (
  SELECT o.o_custkey AS custkey, c.c_nationkey AS nation,
         CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT custkey, nation, cents,
         row_number() OVER (PARTITION BY nation ORDER BY cents, custkey) AS r,
         count(*) OVER (PARTITION BY nation) AS ng,
         count(*) OVER () AS nt
  FROM spend
),
pooled AS (
  SELECT row_number() OVER (ORDER BY cents, custkey) AS pos,
         cents AS pooled_cents
  FROM spend
)
SELECT rk.custkey,
       CAST(rk.nation AS INT) AS nation,
       rk.cents / 100.0 AS spend,
       p.pooled_cents / 100.0 AS normalized_spend
FROM ranked rk
JOIN pooled p ON p.pos = (rk.r * rk.nt + rk.ng - 1) // rk.ng
ORDER BY rk.custkey
"""


QUERIES_EXT60 = {
    "q353_decision_stump": q353_decision_stump,
    "q354_quantile_normalize": q354_quantile_normalize,
}


def _oracles_ext60() -> dict[str, str]:
    return {
        "q353_decision_stump": Q353_SQL,
        "q354_quantile_normalize": Q354_SQL,
    }
