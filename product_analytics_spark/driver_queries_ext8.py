"""Round-3 driver query families, batch 7 (q165+): the skyline
(Pareto-frontier) operator, Gini/Lorenz concentration metrics,
seasonal indices, per-row feature standardization, and a
stream-static dimension-join streaming parity run.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import (
    _cents_out,
    _dec2dbl_sql,
    _money_cents,
    _t,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------- q165

def q165_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) operator — the classic OLAP 'best
    trade-off' query: per nation, the customers not dominated on
    (total spend, order count): no other customer is >= on both
    dimensions and > on at least one.

    2-D skyline without a self-join: collapse to the per-x maxima
    first (groupBy x: max y — map-side combinable), then ONE ordered
    window over the |distinct x| relation gives each x the best y
    among strictly-greater x (lag-excluded running max); a point is
    dominated iff that value >= its y, or a same-x point has strictly
    greater y. The naive NOT EXISTS self-join is O(n²) per group —
    this is O(n log n) sort work, and the window relation holds
    distinct x values only. Output: frontier customers. At 100 TB the
    same two-pass shape holds: the x-collapse shrinks the window input
    by the x-duplication factor, and the final tag join broadcasts the
    frontier candidates' x-table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(_money_cents("o_totalprice")).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "x", "y")
    )
    byx = per.groupBy("n_name", "x").agg(F.max("y").alias("maxy"))
    w = (
        Window.partitionBy("n_name")
        .orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tag = byx.select(
        "n_name", "x", "maxy", F.max("maxy").over(w).alias("best_higher")
    )
    j = per.join(tag, ["n_name", "x"])
    dominated = (
        (F.col("best_higher").isNotNull() & (F.col("best_higher") >= F.col("y")))
        | (F.col("maxy") > F.col("y"))
    )
    return j.filter(~dominated).select(
        "n_name",
        "o_custkey",
        _cents_out(F.col("x")).alias("total_spend"),
        F.col("y").alias("n_orders"),
    )


Q165_SQL = """
WITH per AS (
  SELECT n.n_name, o.o_custkey,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x,
         count(*) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
byx AS (SELECT n_name, x, max(y) AS maxy FROM per GROUP BY 1, 2),
tag AS (
  SELECT n_name, x, maxy,
         max(maxy) OVER (PARTITION BY n_name ORDER BY x DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_higher
  FROM byx
)
SELECT p.n_name, p.o_custkey,
       CAST(p.x AS BIGINT) / 100.0 AS total_spend,
       p.y AS n_orders
FROM per p JOIN tag t ON t.n_name = p.n_name AND t.x = p.x
WHERE NOT ((t.best_higher IS NOT NULL AND t.best_higher >= p.y)
           OR t.maxy > p.y)
"""


# ------------------------------------------------------------- q166

def q166_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration metrics per nation: the Gini coefficient
    from the sorted-rank identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n
    (xᵢ ascending; tie order cannot change the sum, so the statistic
    is deterministic), plus the top-decile revenue share (Lorenz curve
    tail point). Rank·value products accumulate in DECIMAL(38,0) —
    exact at any scale — and the finish is one fixed-order double
    formula mirrored by the oracle.

    Plan: one customer agg, one per-nation sort window (rank + count),
    one nation agg. The sort is the unavoidable cost of an exact
    order statistic; at 100 TB the same window runs per nation
    partition, or the equi-depth-bin approximation (q72 machinery)
    replaces it."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        o.groupBy("o_custkey")
        .agg(F.sum(_money_cents("o_totalprice")).alias("v"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "v")
    )
    wo = Window.partitionBy("n_name").orderBy(F.asc("v"), F.asc("o_custkey"))
    wn = Window.partitionBy("n_name")
    r = per.select(
        "n_name",
        "v",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    agg = r.groupBy("n_name").agg(
        F.max("n").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("rn").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)"))
        .alias("t"),
        F.sum(
            F.when(F.col("rn") > F.col("n") - F.ceil(F.col("n") / F.lit(10.0)), F.col("v"))
        ).alias("top_v"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    td = F.col("t").cast("double")
    return agg.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        _cents_out(F.col("s")).alias("total_spend"),
        F.round(F.lit(2.0) * td / (nd * sd) - (nd + F.lit(1.0)) / nd, 6).alias("gini"),
        F.round(F.col("top_v").cast("double") / sd, 6).alias("top_decile_share"),
    )


def _q166_sql() -> str:
    return f"""
WITH per AS (
  SELECT n.n_name, o.o_custkey,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
r AS (
  SELECT n_name, v,
         row_number() OVER (PARTITION BY n_name ORDER BY v ASC, o_custkey ASC) AS rn,
         count(*) OVER (PARTITION BY n_name) AS n
  FROM per
),
agg AS (
  SELECT n_name, max(n) AS n, sum(v) AS s,
         sum(CAST(rn AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS t,
         sum(CASE WHEN rn > n - CAST(ceil(n / 10.0) AS BIGINT) THEN v END) AS top_v
  FROM r GROUP BY 1
)
SELECT n_name,
       CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) / 100.0 AS total_spend,
       round(2.0 * {_dec2dbl_sql('t')} / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
       round(CAST(top_v AS DOUBLE) / CAST(s AS DOUBLE), 6) AS top_decile_share
FROM agg
"""


# ------------------------------------------------------------- q167

def q167_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality profile: revenue per (year, month)
    period, then each calendar month's average period revenue divided
    by the grand average period revenue — the classical seasonal
    index, entirely rational (integer cents sums, two fixed-order
    divisions). Plan: one (year, month) hash-agg on the fact table;
    the month-of-year re-aggregation and the grand-mean window run on
    the ~|years·12|-row relation."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        _money_cents("o_totalprice").alias("c"),
    )
    per = o.groupBy("yr", "mo").agg(F.sum("c").alias("v"))
    m = per.groupBy("mo").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum("v").alias("mv"),
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g_sum = F.sum("mv").over(w).cast("double")
    g_cnt = F.sum("n_periods").over(w).cast("double")
    avg_m = F.col("mv").cast("double") / F.col("n_periods").cast("double")
    # avg in whole cents via integer division: round(double, 2) at a
    # half-cent tie is the one place Spark/DuckDB rounding diverges
    avg_cents = F.expr("mv div n_periods")
    return m.select(
        F.col("mo").cast("bigint").alias("month"),
        "n_periods",
        _cents_out(avg_cents).alias("avg_month_revenue"),
        F.round(avg_m / (g_sum / g_cnt), 6).alias("seasonal_index"),
    )


Q167_SQL = """
WITH o AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mo,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
per AS (SELECT yr, mo, sum(c) AS v FROM o GROUP BY 1, 2),
m AS (SELECT mo, count(*) AS n_periods, sum(v) AS mv FROM per GROUP BY 1)
SELECT CAST(mo AS BIGINT) AS month,
       n_periods,
       (CAST(mv AS BIGINT) // n_periods) / 100.0 AS avg_month_revenue,
       round((CAST(mv AS DOUBLE) / CAST(n_periods AS DOUBLE))
             / (CAST(sum(mv) OVER () AS DOUBLE)
                / CAST(sum(n_periods) OVER () AS DOUBLE)), 6) AS seasonal_index
FROM m
"""


# ------------------------------------------------------------- q168

def q168_zscore_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row feature standardization (the fit+transform of a
    StandardScaler): per-group mean/std from exact integer cents power
    sums (one hash-agg), broadcast back, z = (x − mean)/std per row in
    one fixed-order expression. The full-data work is ONE agg pass and
    ONE broadcast-join map pass — the canonical fit/transform split,
    which at 100 TB persists the |groups|-row stats table between the
    two (exactly how training-pipeline feature stores stage scaler
    parameters)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        _money_cents("l_extendedprice").alias("c"),
    )
    cd = F.col("c").cast("decimal(38,0)")
    st = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(cd * cd).alias("s2"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - m1 * m1
    stats_df = st.select(
        "l_returnflag", m1.alias("m1"), F.sqrt(var).alias("sd")
    )
    j = li.join(F.broadcast(stats_df), "l_returnflag")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        _cents_out(F.col("c")).alias("price"),
        F.round((F.col("c").cast("double") - F.col("m1")) / F.col("sd"), 6).alias(
            "price_z"
        ),
    )


def _q168_sql() -> str:
    return f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM lineitem
),
st AS (
  SELECT l_returnflag, count(*) AS n, sum(c) AS s1,
         sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS s2
  FROM li GROUP BY 1
),
d AS (
  SELECT l_returnflag,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         sqrt({_dec2dbl_sql('s2')} / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
  FROM st
)
SELECT li.l_orderkey, li.l_linenumber, li.l_returnflag,
       CAST(li.c AS BIGINT) / 100.0 AS price,
       round((CAST(li.c AS DOUBLE) - d.m1) / d.sd, 6) AS price_z
FROM li JOIN d USING (l_returnflag)
"""


# ------------------------------------------------------------- q169


def q169_stream_static_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming evidence #5: stream-STATIC dimension join — the
    enrich-then-aggregate shape every streaming pipeline has (events
    stream joined to a slowly-changing dim snapshot, rolled up per
    dim attribute). File-source stream → broadcast-joined static
    customer→nation dim → grouped cents agg → availableNow → memory
    sink, checked against the direct batch SQL join. The static side
    is re-resolvable per micro-batch (how dim refreshes reach a
    24×7 stream); state is |nations| rows under complete mode."""
    from product_analytics_spark.streaming import ops as st

    # Landing layout is IDENTICAL to q113/q114's (full events,
    # repartition(4)) — share their memoized landing dir instead of
    # writing a third copy of the same files.
    from product_analytics_spark.driver_queries_ext import (
        Q113_LAND,
        _events_stream,
    )

    stream = _events_stream(spark, sf_dir, Q113_LAND)
    dim = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_money_cents("value")).alias("_c"),
        )
    )
    # Scope shuffle partitions down for the stream only (the ext25
    # discipline): complete-mode state checkpoints one store file per
    # shuffle partition per micro-batch; 4 partitions carry |nations|
    # groups with 8x less commit IO than the batch default.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        st.run_available_now(agg, "q169_sink", output_mode="complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table("q169_sink").select(
        "n_name", "n_events", _cents_out(F.col("_c")).alias("total_value")
    )


Q169_SQL = """
SELECT n.n_name,
       count(*) AS n_events,
       CAST(sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         / 100.0 AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


QUERIES_EXT8 = {
    "q165_pareto_frontier": q165_pareto_frontier,
    "q166_gini_concentration": q166_gini_concentration,
    "q167_seasonal_index": q167_seasonal_index,
    "q168_zscore_standardize": q168_zscore_standardize,
    "q169_stream_static_join_parity": q169_stream_static_join_parity,
}

ORACLES_EXT8 = {
    "q165_pareto_frontier": Q165_SQL,
    "q166_gini_concentration": _q166_sql(),
    "q167_seasonal_index": Q167_SQL,
    "q168_zscore_standardize": _q168_sql(),
    "q169_stream_static_join_parity": Q169_SQL,
}
