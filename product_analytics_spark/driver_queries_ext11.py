"""Round-3 driver query families, batch 11 (q176+): sweep-line
max-concurrency, scaled-integer CUSUM changepoint, overlapping-
interval coalescing, grid-bucketed epsilon spatial self-join,
Theil-Sen robust trend slopes, and cross-group quantile
normalization.

Same contract as the other driver_queries modules: each query takes
(spark, sf_dir) -> DataFrame; the paired *_SQL string is the DuckDB
oracle over the same parquet tables with identical output column
names. Exact-arithmetic discipline per qcommon (integer cents /
scaled integers internally; doubles only as the final output cast,
computed by the identical expression on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t, _money_cents

# ------------------------------------------------------------- q176


def q176_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrency — "how many orders were open at
    once": each order is an interval [order date, last ship date];
    the answer per priority class is the peak of the running sum of
    +1/-1 boundary deltas. The classic O(n^2) formulation is an
    inequality self-join (count intervals covering each point); the
    sweep is O(n log n): net delta per (group, day) via one hash agg,
    ONE ordered window per group for the cumulative count, then an
    argmax. Aggregating deltas per day BEFORE the cumulative sum makes
    the window frame deterministic (no intra-day tie order) and
    shrinks the windowed relation to |group x active days|.

    Scale: the shuffled relations are boundary deltas (2 rows/order,
    then <= |days| per group after the agg) — never the lineitem rows;
    the per-order interval end comes from a map-side-combinable
    max agg. Window partitions are priority classes x ~2400 days —
    thousands of rows per partition regardless of data scale."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("start_d")
    )
    ends = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("end_d"))
    )
    # the synthetic data has ~20% of orders whose last ship date
    # precedes the order date; clamp so every interval is well-formed
    # (an inverted interval would place its -1 BEFORE its +1 and
    # corrupt the running count for unrelated days)
    iv = o.join(ends, o.o_orderkey == ends.l_orderkey).select(
        "o_orderpriority", "start_d", F.greatest("start_d", "end_d").alias("end_d")
    )
    deltas = iv.select(
        "o_orderpriority", F.col("start_d").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "o_orderpriority",
            F.date_add("end_d", 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("o_orderpriority", "d").agg(
        F.sum("delta").alias("net")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "o_orderpriority", "d", F.sum("net").over(w).alias("open_cnt")
    )
    wmax = Window.partitionBy("o_orderpriority")
    peak = cum.withColumn("peak", F.max("open_cnt").over(wmax)).filter(
        F.col("open_cnt") == F.col("peak")
    )
    return peak.groupBy("o_orderpriority").agg(
        F.max("peak").cast("bigint").alias("peak_open"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("peak_date"),
    )


Q176_SQL = """
WITH ends AS (
  SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) AS end_d
  FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS start_d,
         greatest(CAST(o_orderdate AS DATE), end_d) AS end_d
  FROM orders JOIN ends ON o_orderkey = l_orderkey
),
deltas AS (
  SELECT o_orderpriority, start_d AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT o_orderpriority, end_d + INTERVAL 1 DAY, -1 FROM iv
),
daily AS (
  SELECT o_orderpriority, CAST(d AS DATE) AS d, sum(delta) AS net
  FROM deltas GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, d,
         sum(net) OVER (PARTITION BY o_orderpriority ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_cnt
  FROM daily
),
peak AS (
  SELECT *, max(open_cnt) OVER (PARTITION BY o_orderpriority) AS peak FROM cum
)
SELECT o_orderpriority,
       CAST(max(peak) AS BIGINT) AS peak_open,
       strftime(min(d), '%Y-%m-%d') AS peak_date
FROM peak WHERE open_cnt = peak
GROUP BY 1
"""


# ------------------------------------------------------------- q177


def q177_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan — where did a nation's daily revenue
    level shift? Standard CUSUM tracks S_k = sum_{i<=k}(x_i - mean);
    multiplying through by n gives n*S_k = n*cumsum_k - k*total,
    ALL-INTEGER in cents (no mean, no float accumulation, no
    order-dependent rounding) — the X32 rational-arithmetic
    discipline applied to a monitoring op. The reported changepoint
    is the earliest day attaining max |n*S_k|.

    Scale: one fact-side hash agg to (nation, day) cents — the only
    full shuffle; windows run over |nations| x |days| rows. The
    scaled stat needs n*cumsum: at 100 TB cents-cumsum ~ 1e16 and
    n ~ 1e4 days exceeds int64, so the multiply is done in
    DECIMAL(38,0) (exact int128 in DuckDB) — overflow-proof at any
    realistic scale while the per-day inputs stay vectorized longs."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(_money_cents("o_totalprice")).alias("cents"))
    )
    wp = Window.partitionBy("n_name")
    wo = wp.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = "decimal(38,0)"
    scan = daily.select(
        "n_name",
        "d",
        F.count(F.lit(1)).over(wp).alias("n_days"),
        F.row_number().over(wp.orderBy("d")).alias("k"),
        F.sum("cents").over(wo).alias("cum"),
        F.sum("cents").over(wp).alias("total"),
    ).select(
        "n_name",
        "d",
        "n_days",
        F.abs(
            F.col("n_days").cast(dec) * F.col("cum").cast(dec)
            - F.col("k").cast(dec) * F.col("total").cast(dec)
        ).alias("s_abs"),
    )
    peak = scan.withColumn("peak", F.max("s_abs").over(wp)).filter(
        F.col("s_abs") == F.col("peak")
    )
    return peak.groupBy("n_name").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("changepoint_date"),
        F.max("peak").cast("string").alias("peak_scaled_dev"),
    )


Q177_SQL = """
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
scan AS (
  SELECT n_name, d,
         count(*) OVER (PARTITION BY n_name) AS n_days,
         row_number() OVER (PARTITION BY n_name ORDER BY d) AS k,
         sum(cents) OVER (PARTITION BY n_name ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cents) OVER (PARTITION BY n_name) AS total
  FROM daily
),
stat AS (
  SELECT n_name, d, n_days,
         abs(CAST(n_days AS HUGEINT) * CAST(cum AS HUGEINT)
             - CAST(k AS HUGEINT) * CAST(total AS HUGEINT)) AS s_abs
  FROM scan
),
peak AS (
  SELECT *, max(s_abs) OVER (PARTITION BY n_name) AS peak FROM stat
)
SELECT n_name,
       CAST(max(n_days) AS BIGINT) AS n_days,
       strftime(min(d), '%Y-%m-%d') AS changepoint_date,
       CAST(max(peak) AS VARCHAR) AS peak_scaled_dev
FROM peak WHERE s_abs = peak
GROUP BY 1
"""


# ------------------------------------------------------------- q178


def q178_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval coalescing (interval union per key) — merge
    each customer's order-fulfillment intervals [order date, last ship
    date] into disjoint coverage spans; report span count, covered
    days, and longest span. The island rule: a new span starts where
    the interval's start exceeds the running max end of all EARLIER
    intervals (ordered by start, end, orderkey — the full ordering
    makes the 1-PRECEDING frame deterministic under start-date ties);
    span id = cumulative sum of the flags. Two windows and two hash
    aggs — no self-join, no explode-per-day.

    Scale: both windows partition by customer (bounded per-key row
    counts) and share one hash partitioning with the final groupBys —
    a single exchange in the plan. Covered-days sums are exact integer
    date arithmetic."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("s")
    )
    ends = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("e"))
    )
    # same inverted-interval clamp as q176 (see note there)
    iv = o.join(ends, o.o_orderkey == ends.l_orderkey).select(
        "o_custkey", "o_orderkey", "s", F.greatest("s", "e").alias("e")
    )
    ord_w = Window.partitionBy("o_custkey").orderBy("s", "e", "o_orderkey")
    prev_max = (
        F.max("e").over(ord_w.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = iv.select(
        "o_custkey",
        "s",
        "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("new_span"),
        F.row_number().over(ord_w).alias("rn"),
    )
    spans = flagged.select(
        "o_custkey",
        "s",
        "e",
        F.sum("new_span")
        .over(
            Window.partitionBy("o_custkey")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("span_id"),
    ).groupBy("o_custkey", "span_id").agg(
        F.min("s").alias("span_s"), F.max("e").alias("span_e")
    )
    return spans.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.datediff("span_e", "span_s") + 1).cast("bigint").alias("covered_days"),
        F.max(F.datediff("span_e", "span_s") + 1).cast("bigint").alias("longest_span"),
    )


Q178_SQL = """
WITH ends AS (
  SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) AS e
  FROM lineitem GROUP BY 1
),
iv AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS s,
         greatest(CAST(o_orderdate AS DATE), e) AS e
  FROM orders JOIN ends ON o_orderkey = l_orderkey
),
flagged AS (
  SELECT o_custkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
               OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span,
         row_number() OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey) AS rn
  FROM iv
),
spans AS (
  SELECT o_custkey,
         sum(new_span) OVER (PARTITION BY o_custkey ORDER BY rn
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id,
         s, e
  FROM flagged
),
merged AS (
  SELECT o_custkey, span_id, min(s) AS span_s, max(e) AS span_e
  FROM spans GROUP BY 1, 2
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(date_diff('day', span_s, span_e) + 1) AS BIGINT) AS covered_days,
       CAST(max(date_diff('day', span_s, span_e) + 1) AS BIGINT) AS longest_span
FROM merged GROUP BY 1
"""


# ------------------------------------------------------------- q179

GRID_EPS = 0.05


def q179_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-neighborhood 2-D spatial self-join via grid bucketing —
    all vector pairs within Euclidean distance eps in the first two
    embedding dimensions. Cell side = eps, so any qualifying pair
    lies in the same or an adjacent cell: the left side explodes to
    its 3x3 neighbor cells, the right side keeps its own cell, and
    the candidate join is an EQUI-join on (cx, cy) — never a distance
    cross join. Each unordered pair is generated exactly once (the
    id < id filter fires only on the left-exploded orientation).
    Exact verification compares squared distance to eps^2 — identical
    IEEE double arithmetic on both engines.

    Scale: this is the DBSCAN/spatial-index candidate generator —
    shuffle keys are 2 small ints; cell occupancy, not data volume,
    bounds the per-key join fan-out. Dense cells would get the X28
    cap/salting treatment; cell ids are partition-prunable storage
    keys for repeated queries."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    eps = F.lit(GRID_EPS)
    cells = e.select(
        "vec_id",
        "x",
        "y",
        F.floor(F.col("x") / eps).cast("long").alias("cx"),
        F.floor(F.col("y") / eps).cast("long").alias("cy"),
    )
    left = (
        cells.select(
            F.col("vec_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.col("cx").alias("bcx"),
            F.col("cy").alias("bcy"),
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("ox"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            "bcx",
            "bcy",
            "ox",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("oy"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("bcx") + F.col("ox")).alias("cx"),
            (F.col("bcy") + F.col("oy")).alias("cy"),
        )
    )
    right = cells.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    # spelled as multiplications, not pow(x, 2): Math.pow is not
    # guaranteed bit-identical to x*x, and the oracle multiplies
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(GRID_EPS * GRID_EPS))
    )


Q179_SQL = f"""
WITH e AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
),
cells AS (
  SELECT vec_id, x, y,
         CAST(floor(x / {GRID_EPS!r}) AS BIGINT) AS cx,
         CAST(floor(y / {GRID_EPS!r}) AS BIGINT) AS cy
  FROM e
),
offs AS (
  SELECT ox, oy FROM (VALUES (-1),(0),(1)) a(ox), (VALUES (-1),(0),(1)) b(oy)
),
lft AS (
  SELECT vec_id AS id_a, x AS xa, y AS ya, cx + ox AS cx, cy + oy AS cy
  FROM cells, offs
)
SELECT id_a, r.vec_id AS id_b,
       (xa - r.x) * (xa - r.x) + (ya - r.y) * (ya - r.y) AS dist2
FROM lft JOIN cells r USING (cx, cy)
WHERE id_a < r.vec_id
  AND (xa - r.x) * (xa - r.x) + (ya - r.y) * (ya - r.y) <= {GRID_EPS * GRID_EPS!r}
"""


# ------------------------------------------------------------- q180


def q180_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per nation — the median of all
    pairwise slopes of (month index, monthly revenue), immune to the
    outlier months that wreck OLS (X35's grouped regression is the
    L2 twin). Months collapse first (fact rows -> |nation x month|),
    so the pairwise join is over ~84 points per nation — O(m^2) in
    the MONTH count, which is bounded by the calendar, not by data
    volume. Slopes are exact-cents deltas divided once in double;
    the median is computed explicitly from the two middle order
    statistics ((lo + hi) / 2 spelled identically on both engines —
    builtin percentile interpolation formulas differ across engines
    by a ulp).

    Scale: one fact agg shuffle; the slope relation is tiny and
    nation-partitioned. The same shape handles any per-entity robust
    trend where the x-axis is a bounded time grid."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - F.lit(1995)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("k"),
        )
        .agg(F.sum(_money_cents("o_totalprice")).alias("cents"))
    )
    a = monthly.select(
        "n_name", F.col("k").alias("ka"), F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("n_name").alias("n2"), F.col("k").alias("kb"), F.col("cents").alias("cb")
    )
    slopes = (
        a.join(b, (a.n_name == b.n2) & (a.ka < b.kb))
        .select(
            "n_name",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("kb") - F.col("ka")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("slope")
    ranked = slopes.select(
        "n_name",
        "slope",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("n_name")).alias("m"),
    )
    mid = ranked.filter(
        (F.col("r") == F.expr("(m + 1) div 2"))  # lower middle
        | (F.col("r") == F.expr("m div 2 + 1"))  # upper middle
    )
    return mid.groupBy("n_name").agg(
        ((F.min("slope") + F.max("slope")) / F.lit(2.0)).alias("theil_sen_cents_per_month"),
        F.max("m").cast("bigint").alias("n_pairs"),
    )


Q180_SQL = """
WITH monthly AS (
  SELECT n_name,
         (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS k,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
slopes AS (
  SELECT a.n_name,
         CAST(b.cents - a.cents AS DOUBLE) / CAST(b.k - a.k AS DOUBLE) AS slope
  FROM monthly a JOIN monthly b ON a.n_name = b.n_name AND a.k < b.k
),
ranked AS (
  SELECT n_name, slope,
         row_number() OVER (PARTITION BY n_name ORDER BY slope) AS r,
         count(*) OVER (PARTITION BY n_name) AS m
  FROM slopes
),
mid AS (
  SELECT * FROM ranked
  WHERE r = (m + 1) // 2 OR r = m // 2 + 1
)
SELECT n_name,
       (min(slope) + max(slope)) / 2.0 AS theil_sen_cents_per_month,
       CAST(max(m) AS BIGINT) AS n_pairs
FROM mid GROUP BY 1
"""


# ------------------------------------------------------------- q181


def q181_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-group quantile normalization — force every market
    segment's account-balance distribution onto a common reference:
    rank within segment (full ordering (acctbal, custkey) for
    determinism), average the cents at each rank ACROSS segments,
    and hand every customer the reference value at its rank. The
    bioinformatics normalization workhorse, expressed as two windows
    + one rank-keyed agg + one join — no iteration.

    Ragged group sizes are handled the standard way: the reference at
    rank r averages only the segments that reach rank r. The output
    double is CAST(sum_cents AS DOUBLE) / n / 100 — exact integer
    state, two exact-input divisions, identical on both engines.

    Scale: rank windows partition by segment; the reference table is
    |max group size| rows (broadcastable); the value-assignment join
    keys on rank — an equi-join against a dim-sized relation."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        _money_cents("c_acctbal").alias("cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    ranked = c.select(
        "c_custkey", "c_mktsegment", "cents", F.row_number().over(w).alias("r")
    )
    ref = ranked.groupBy("r").agg(
        (
            F.sum("cents").cast("double")
            / F.count(F.lit(1))
            / F.lit(100.0)
        ).alias("norm_bal"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments_at_rank"),
    )
    return (
        ranked.join(F.broadcast(ref), "r")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("r").cast("bigint").alias("seg_rank"),
            "norm_bal",
            "n_segments_at_rank",
        )
    )


Q181_SQL = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
ranked AS (
  SELECT c_custkey, c_mktsegment, cents,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, c_custkey) AS r
  FROM c
),
ref AS (
  SELECT r,
         CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS norm_bal,
         CAST(count(*) AS BIGINT) AS n_segments_at_rank
  FROM ranked GROUP BY 1
)
SELECT c_custkey, c_mktsegment,
       CAST(r AS BIGINT) AS seg_rank,
       norm_bal, n_segments_at_rank
FROM ranked JOIN ref USING (r)
"""


QUERIES_EXT11 = {
    "q176_max_concurrency": q176_max_concurrency,
    "q177_cusum_changepoint": q177_cusum_changepoint,
    "q178_interval_coalesce": q178_interval_coalesce,
    "q179_grid_spatial_join": q179_grid_spatial_join,
    "q180_theilsen_slope": q180_theilsen_slope,
    "q181_quantile_normalize": q181_quantile_normalize,
}

ORACLES_EXT11 = {
    "q176_max_concurrency": Q176_SQL,
    "q177_cusum_changepoint": Q177_SQL,
    "q178_interval_coalesce": Q178_SQL,
    "q179_grid_spatial_join": Q179_SQL,
    "q180_theilsen_slope": Q180_SQL,
    "q181_quantile_normalize": Q181_SQL,
}
