"""Round-5 driver query families, batch 68 (q372-q373): timeseries
visual downsampling (LTTB-avg, the Grafana/Timescale reduction) and
calendar resampling with exact-integer LINEAR interpolation — the
densification X63/q90 zero-fill does not provide.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q372

LTTB_BUCKET = 16  # days per bucket


def q372_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the daily
    revenue series — the perceptual reduction dashboards use (keep the
    point per bucket that subtends the largest triangle against its
    neighbor buckets, so spikes and reversals survive where X68's OHLC
    keeps boundary/extreme PRICES and a plain avg flattens both).
    This is the parallel LTTB-avg variant: BOTH anchors are the
    neighbor buckets' centroids (classic LTTB anchors left on the
    previously *selected* point — a sequential dependency that
    serializes the scan at any scale; with day-sized buckets the
    centroid anchor is the standard parallel form).  All arithmetic is
    exact: the triangle score is the cross product cleared of the two
    rational centroid denominators — |2·Area·n_L·n_R| =
    |(x·n_L−sx_L)(sy_R·n_L−sy_L·n_R) − (y·n_L−sy_L)(sx_R·n_L−sx_L·n_R)|
    — pure BIGINT (day index × cents keeps every product < 2^63).
    Edge buckets keep their first/last point (the LTTB endpoint rule).

    Scale: the corpus-sized work is ONE day-keyed hash-agg; everything
    after (bucket centroids via a second tiny agg, broadcast back,
    per-bucket argmax window) rides the |days| relation."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        _money_cents("o_totalprice").alias("cents"),
    )
    daily = o.groupBy("d").agg(F.sum("cents").alias("y")).select(
        F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")).alias("x"),
        F.col("d").cast("string").alias("day"),
        "y",
    )
    daily = daily.withColumn("bkt", F.expr(f"x div {LTTB_BUCKET}"))
    cent = daily.groupBy("bkt").agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.count("*").alias("n")
    )
    w = Window.orderBy("bkt")
    cent = cent.select(
        "bkt",
        F.lag("sx").over(w).alias("sx_l"),
        F.lag("sy").over(w).alias("sy_l"),
        F.lag("n").over(w).alias("n_l"),
        F.lead("sx").over(w).alias("sx_r"),
        F.lead("sy").over(w).alias("sy_r"),
        F.lead("n").over(w).alias("n_r"),
    )
    scored = daily.join(F.broadcast(cent), "bkt").withColumn(
        "score",
        F.abs(
            (F.col("x") * F.col("n_l") - F.col("sx_l"))
            * (F.col("sy_r") * F.col("n_l") - F.col("sy_l") * F.col("n_r"))
            - (F.col("y") * F.col("n_l") - F.col("sy_l"))
            * (F.col("sx_r") * F.col("n_l") - F.col("sx_l") * F.col("n_r"))
        ),
    )
    wb = Window.partitionBy("bkt").orderBy(
        F.desc_nulls_last("score"), F.col("x")
    )
    we_first = Window.partitionBy("bkt").orderBy(F.col("x"))
    we_last = Window.partitionBy("bkt").orderBy(F.desc("x"))
    picked = scored.withColumn(
        "rn",
        F.when(F.col("n_l").isNull(), F.row_number().over(we_first))
        .when(F.col("n_r").isNull(), F.row_number().over(we_last))
        .otherwise(F.row_number().over(wb)),
    ).filter(F.col("rn") == 1)
    return picked.select(
        "bkt", "day", F.col("y").alias("cents"),
        F.coalesce("score", F.lit(-1)).alias("score"),
    ).orderBy("bkt")


Q372_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
b AS (SELECT *, x // {LTTB_BUCKET} AS bkt FROM daily),
cent AS (
  SELECT bkt, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY bkt
),
nb AS (
  SELECT bkt,
         lag(sx) OVER (ORDER BY bkt) AS sx_l,
         lag(sy) OVER (ORDER BY bkt) AS sy_l,
         lag(n) OVER (ORDER BY bkt) AS n_l,
         lead(sx) OVER (ORDER BY bkt) AS sx_r,
         lead(sy) OVER (ORDER BY bkt) AS sy_r,
         lead(n) OVER (ORDER BY bkt) AS n_r
  FROM cent
),
scored AS (
  SELECT b.bkt, b.day, b.x, b.y, nb.n_l, nb.n_r,
         abs((b.x * nb.n_l - nb.sx_l) * (nb.sy_r * nb.n_l - nb.sy_l * nb.n_r)
           - (b.y * nb.n_l - nb.sy_l) * (nb.sx_r * nb.n_l - nb.sx_l * nb.n_r))
           AS score
  FROM b JOIN nb USING (bkt)
),
picked AS (
  SELECT *,
         CASE
           WHEN n_l IS NULL THEN row_number()
             OVER (PARTITION BY bkt ORDER BY x)
           WHEN n_r IS NULL THEN row_number()
             OVER (PARTITION BY bkt ORDER BY x DESC)
           ELSE row_number()
             OVER (PARTITION BY bkt ORDER BY score DESC NULLS LAST, x)
         END AS rn
  FROM scored
)
SELECT bkt, day, y AS cents, coalesce(score, -1) AS score
FROM picked WHERE rn = 1 ORDER BY bkt
"""


# ------------------------------------------------------------- q373

INTERP_KEY_MOD = 97  # sparse observation subset (~1% of days observed)


def q373_linear_interp_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resampling with exact-integer LINEAR interpolation —
    the densification step X63/q90's zero-fill cannot provide: a
    sparse daily series (only days whose index ≡ 0 mod {MOD} observe a
    value) is re-gridded to EVERY calendar day between its bracketing
    observations, each gap day getting the floor-exact lerp
    ``(y₁·(x₂−x) + y₂·(x−x₁)) div (x₂−x₁)`` — pure BIGINT (cents ×
    day-gaps), no float ratio, so both engines agree to the last
    cent.  Output: one row per grid day with the interpolated value,
    its bracketing-segment id, and is_observed.

    Scale: the corpus work is one day-keyed agg; the observation
    series is |obs|-sized, the spine explodes map-side from each
    segment's (x₁,x₂) pair (the X63 sequence kernel — never a scan),
    and each grid day's lerp is codegen arithmetic.  Total output =
    |days|, the resample's defining size."""
    o = _t(spark, sf_dir, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
        _money_cents("o_totalprice").alias("cents"),
    )
    obs = (
        o.filter(F.col("x") % INTERP_KEY_MOD == 0)
        .groupBy("x")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.orderBy("x")
    seg = obs.select(
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        F.lead("x").over(w).alias("x2"),
        F.lead("y").over(w).alias("y2"),
    ).filter(F.col("x2").isNotNull())
    grid = seg.select(
        "x1", "y1", "x2", "y2",
        F.explode(F.sequence("x1", F.col("x2") - 1)).alias("x"),
    )
    return grid.select(
        F.col("x").cast("long").alias("day_idx"),
        F.col("x1").cast("long").alias("seg_start"),
        (F.col("x") == F.col("x1")).alias("is_observed"),
        F.expr(
            "CAST((y1 * (x2 - x) + y2 * (x - x1)) div (x2 - x1) AS BIGINT)"
        ).alias("cents_interp"),
    ).orderBy("day_idx")


Q373_SQL = f"""
WITH o AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
obs AS (
  SELECT x, CAST(sum(cents) AS BIGINT) AS y
  FROM o WHERE x % {INTERP_KEY_MOD} = 0 GROUP BY x
),
seg AS (
  SELECT x AS x1, y AS y1,
         lead(x) OVER (ORDER BY x) AS x2,
         lead(y) OVER (ORDER BY x) AS y2
  FROM obs
),
grid AS (
  SELECT x1, y1, x2, y2, u.x
  FROM seg, unnest(generate_series(x1, x2 - 1)) AS u(x)
  WHERE x2 IS NOT NULL
)
SELECT CAST(x AS BIGINT) AS day_idx,
       CAST(x1 AS BIGINT) AS seg_start,
       x = x1 AS is_observed,
       CAST((y1 * (x2 - x) + y2 * (x - x1)) // (x2 - x1) AS BIGINT)
         AS cents_interp
FROM grid ORDER BY day_idx
"""


QUERIES_EXT68 = {
    "q372_lttb_downsample": q372_lttb_downsample,
    "q373_linear_interp_resample": q373_linear_interp_resample,
}


def _oracles_ext68() -> dict[str, str]:
    return {
        "q372_lttb_downsample": Q372_SQL,
        "q373_linear_interp_resample": Q373_SQL,
    }
