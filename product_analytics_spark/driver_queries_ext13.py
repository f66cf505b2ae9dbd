"""Round-3 driver query families, batch 13 (q187+): rolling OLS
regression, ABC/Pareto classification, key-sequence gap-range audit,
and an O(1)-state weighted moving average.

Same contract as the other driver_queries modules; exact-arithmetic
discipline per qcommon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q187

ROLL_W = 30


def q187_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS regression — a 30-day trailing trend line (slope +
    intercept) for each nation's daily revenue, recomputed at every
    day from ONE window pass: the five rolling power sums (n, Σx, Σy,
    Σxy, Σx²) all share a single 29-PRECEDING frame, so Tungsten
    evaluates them in one sliding-frame traversal — no self-join, no
    per-day refit. x is the per-nation day index (row_number — small,
    dense integers keep every product exact in longs); the closed-form
    slope/intercept touch floating point only in the final fixed-order
    expressions, identical on both engines (X64 discipline).

    Scale: windows partition by nation; per-partition rows = active
    days (calendar-bounded). The frame is ROWS-based — O(W) per row
    in the worst case but W is a constant 30; runaway-frame cost
    never scales with data volume."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("y"))
    )
    wo = Window.partitionBy("n_name").orderBy("d")
    idx = daily.select(
        "n_name", "d", "y", F.row_number().over(wo).alias("k")
    )
    fr = wo.rowsBetween(-(ROLL_W - 1), Window.currentRow)
    sums = idx.select(
        "n_name",
        "d",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("k").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("k") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("k") * F.col("k")).over(fr).alias("sxx"),
    ).filter(F.col("n") == ROLL_W)
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return sums.select(
        "n_name",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        slope.alias("slope_cents_per_day"),
        ((sy - slope * sx) / nd).alias("intercept_cents"),
    )


Q187_SQL = f"""
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
idx AS (
  SELECT n_name, d, y,
         row_number() OVER (PARTITION BY n_name ORDER BY d) AS k
  FROM daily
),
sums AS (
  SELECT n_name, d,
         count(*) OVER w AS n,
         sum(k) OVER w AS sx,
         sum(y) OVER w AS sy,
         sum(k * y) OVER w AS sxy,
         sum(k * k) OVER w AS sxx
  FROM idx
  WINDOW w AS (PARTITION BY n_name ORDER BY d
               ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT n_name, strftime(d, '%Y-%m-%d') AS d,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope_cents_per_day,
       (CAST(sy AS DOUBLE)
        - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept_cents
FROM sums WHERE n = {ROLL_W}
"""


# ------------------------------------------------------------- q188

ABC_A_PCT = 80
ABC_B_PCT = 95


def q188_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — rank each nation's customers by
    revenue and split A/B/C at the 80% / 95% cumulative-share cuts.
    The share comparisons are ALL-INTEGER cross-multiplications
    (100·cum_cents vs pct·total_cents) — no float shares, so the
    class boundaries are exact and tie-stable (ordering is
    (cents DESC, custkey) — fully deterministic). One fact agg, one
    ordered window per nation, one |nation×3|-row final agg.

    Scale: the ranked relation is |customers|, partitioned by
    nation; cumulative sums are map-side within the window partition.
    The same shape yields any 'top-x% of entities carry y%' audit
    (inventory ABC, revenue concentration, hot-key triage)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(_money_cents("o_totalprice")).alias("cents"))
    )
    wo = Window.partitionBy("n_name").orderBy(
        F.col("cents").desc(), F.col("c_custkey")
    )
    wp = Window.partitionBy("n_name")
    ranked = per_cust.select(
        "n_name",
        "c_custkey",
        "cents",
        F.sum("cents")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("cents").over(wp).alias("total"),
    )
    cls = ranked.select(
        "n_name",
        "cents",
        F.when(
            F.col("cum") * 100 <= F.col("total") * ABC_A_PCT, "A"
        )
        .when(F.col("cum") * 100 <= F.col("total") * ABC_B_PCT, "B")
        .otherwise("C")
        .alias("abc_class"),
        "total",
    )
    return cls.groupBy("n_name", "abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (F.sum("cents") / F.lit(100.0)).alias("class_revenue"),
        (F.sum("cents").cast("double") / F.max("total")).alias("class_share"),
    )


Q188_SQL = f"""
WITH per_cust AS (
  SELECT n_name, c_custkey,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n_name, c_custkey, cents,
         sum(cents) OVER (PARTITION BY n_name ORDER BY cents DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cents) OVER (PARTITION BY n_name) AS total
  FROM per_cust
),
cls AS (
  SELECT n_name, cents,
         CASE WHEN cum * 100 <= total * {ABC_A_PCT} THEN 'A'
              WHEN cum * 100 <= total * {ABC_B_PCT} THEN 'B'
              ELSE 'C' END AS abc_class,
         total
  FROM ranked
)
SELECT n_name, abc_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) / 100.0 AS class_revenue,
       CAST(sum(cents) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS class_share
FROM cls GROUP BY 1, 2
"""


# ------------------------------------------------------------- q189

GAP_SHARD = "1-URGENT"


def q189_sequence_gap_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-sequence gap-range audit — the missing-id detector (lost
    CDC batches, broken id generators): collapse one shard's key
    stream to distinct values, one lead() pass, and every place where
    the next key jumps by more than 1 becomes a (gap_start, gap_end,
    gap_len) range — the complement of X77's streak islands, reported
    as RANGES (bounded output) rather than exploded missing keys
    (unbounded at scale). The audited stream is a single priority
    shard — the realistic shape: a source split across shards has
    per-shard gaps, and the audit quantifies them (this data's full
    keyspace is gap-free, which a zero-row run proves but doesn't
    exercise).

    Scale note: the single ordered window over distinct keys is the
    one global-sort stage; at 100 TB this becomes
    repartitionByRange(key) + per-range lead with boundary exchange
    (the q64 two-phase shape). Output size is |gaps|, independent of
    gap width — auditing a billion missing ids costs one row."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == GAP_SHARD)
        .select("o_orderkey")
        .distinct()
    )
    w = Window.orderBy("o_orderkey")
    gaps = o.select(
        "o_orderkey", F.lead("o_orderkey").over(w).alias("nxt")
    ).filter(F.col("nxt") - F.col("o_orderkey") > 1)
    return gaps.select(
        (F.col("o_orderkey") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("o_orderkey") - 1).alias("gap_len"),
    )


Q189_SQL = f"""
WITH k AS (
  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderpriority = '{GAP_SHARD}'
),
g AS (
  SELECT o_orderkey, lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt FROM k
)
SELECT o_orderkey + 1 AS gap_start,
       nxt - 1 AS gap_end,
       nxt - o_orderkey - 1 AS gap_len
FROM g WHERE nxt - o_orderkey > 1
"""


# ------------------------------------------------------------- q190

WMA_W = 7
WMA_DENOM = WMA_W * (WMA_W + 1) // 2  # 28


def q190_weighted_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average (WMA) with O(1) window state —
    weight (W−i) on the i-days-ago value, the standard recency-
    weighted smoother. The naive form needs W lag columns (or a
    range self-join); this uses the algebraic identity

        Σ_{i=0..W−1} (W−i)·y_{t−i} = (W − k_t)·S_t + V_t

    where S = rolling Σy and V = rolling Σ(k·y) over the SAME frame
    (k = day index) — two rolling sums replace W lags, so widening W
    from 7 to 365 changes a constant, not the plan. All integer
    until the single final division (num/28/100), identical on both
    engines; pytest proves equality to the W-lag brute force.

    Scale: same single-frame window economics as q187 — the two
    sums share one traversal, partitioned by nation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("y"))
    )
    wo = Window.partitionBy("n_name").orderBy("d")
    idx = daily.select("n_name", "d", "y", F.row_number().over(wo).alias("k"))
    fr = wo.rowsBetween(-(WMA_W - 1), Window.currentRow)
    sums = idx.select(
        "n_name",
        "d",
        "k",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("y").over(fr).alias("s"),
        F.sum(F.col("k") * F.col("y")).over(fr).alias("v"),
    ).filter(F.col("n") == WMA_W)
    # weights: row j in the frame has k_j in (k−W, k]; weight
    # W − (k − k_j) = (W − k)·1 + k_j  summed against y gives
    # (W − k)·S + V
    num = (F.lit(WMA_W) - F.col("k")) * F.col("s") + F.col("v")
    return sums.select(
        "n_name",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        (num.cast("double") / F.lit(float(WMA_DENOM)) / F.lit(100.0)).alias("wma"),
    )


Q190_SQL = f"""
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
idx AS (
  SELECT n_name, d, y,
         row_number() OVER (PARTITION BY n_name ORDER BY d) AS k
  FROM daily
),
sums AS (
  SELECT n_name, d, k,
         count(*) OVER w AS n,
         sum(y) OVER w AS s,
         sum(k * y) OVER w AS v
  FROM idx
  WINDOW w AS (PARTITION BY n_name ORDER BY d
               ROWS BETWEEN {WMA_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT n_name, strftime(d, '%Y-%m-%d') AS d,
       CAST(({WMA_W} - k) * s + v AS DOUBLE) / {float(WMA_DENOM)!r} / 100.0 AS wma
FROM sums WHERE n = {WMA_W}
"""


QUERIES_EXT13 = {
    "q187_rolling_regression": q187_rolling_regression,
    "q188_abc_classification": q188_abc_classification,
    "q189_sequence_gap_ranges": q189_sequence_gap_ranges,
    "q190_weighted_moving_average": q190_weighted_moving_average,
}

ORACLES_EXT13 = {
    "q187_rolling_regression": Q187_SQL,
    "q188_abc_classification": Q188_SQL,
    "q189_sequence_gap_ranges": Q189_SQL,
    "q190_weighted_moving_average": Q190_SQL,
}
