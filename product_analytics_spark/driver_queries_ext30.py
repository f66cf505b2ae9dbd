"""Round-4 driver query families, batch 30 (q238-q241): SPRT
sequential testing, rolling-origin forecast backtest, churn-label
construction, and a column-compression advisor.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q238

SPRT_P0, SPRT_P1 = 0.2, 0.25
SPRT_ALPHA = 0.05
SPRT_SCALE = 10**9
# Log-likelihood-ratio increments as INTEGER constants, precomputed in
# Python so both engines consume identical literals — cumulative sums
# stay in exact BIGINT arithmetic (the q208 float-window lesson; one
# engine's pairwise float accumulation would drift from the other's).
SPRT_K_SUCCESS = round(math.log(SPRT_P1 / SPRT_P0) * SPRT_SCALE)
SPRT_K_FAILURE = round(math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * SPRT_SCALE)
SPRT_UPPER = round(math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * SPRT_SCALE)
SPRT_LOWER = -SPRT_UPPER


def q238_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X201: SPRT sequential A/B test — Wald's sequential probability
    ratio test replayed over the event stream: two arms (user-id
    parity), outcome = purchase-vs-not per event, H₀ p={SPRT_P0} vs
    H₁ p={SPRT_P1}. Each event adds a precomputed integer-scaled LLR
    increment; the test DECIDES at the first boundary crossing
    (±ln((1−α)/α)) instead of at a fixed n — the experimentation-
    platform op that stops losing variants early. Emits per arm: the
    decision, the sample size at decision (the whole point of
    sequential testing), and the terminal LLR.

    Every cumulative quantity is an exact BIGINT (scaled-integer LLR
    increments), so the crossing row — an inherently order-sensitive
    fact — is identical on any engine and partitioning.

    Scale: one arm-keyed window cumsum + one first-crossing argmin per
    arm; the stream replays in event order exactly as a live
    sequential monitor would consume it."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_type") == "purchase", SPRT_K_SUCCESS)
        .otherwise(SPRT_K_FAILURE)
        .cast("bigint")
        .alias("k"),
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("arm").orderBy("ts", "event_id")
    staged = ev.select(
        "arm",
        F.sum("k").over(w).alias("llr"),
        F.row_number().over(wn).alias("n"),
    ).select(
        "arm",
        "llr",
        "n",
        (
            (F.col("llr") >= SPRT_UPPER) | (F.col("llr") <= SPRT_LOWER)
        ).alias("crossed"),
    )
    per_arm = staged.groupBy("arm").agg(
        F.min(F.when(F.col("crossed"), F.col("n"))).alias("n_decision"),
        F.max("n").alias("n_total"),
        F.max_by("llr", "n").alias("final_llr_scaled"),
        F.min_by(
            F.when(F.col("crossed"), F.col("llr")), F.when(F.col("crossed"), F.col("n"))
        ).alias("llr_at_decision"),
    )
    return per_arm.select(
        "arm",
        F.coalesce("n_decision", F.lit(-1)).cast("bigint").alias("n_at_decision"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.when(F.col("n_decision").isNull(), F.lit("continue"))
        .when(F.col("llr_at_decision") >= SPRT_UPPER, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        (F.col("final_llr_scaled") / F.lit(float(SPRT_SCALE))).alias("final_llr"),
    )


Q238_SQL = f"""
WITH ev AS (
  SELECT CAST(user_id % 2 AS INT) AS arm, event_id,
         CAST(ts AS TIMESTAMP) AS ts,
         CAST(CASE WHEN event_type = 'purchase'
                   THEN {SPRT_K_SUCCESS} ELSE {SPRT_K_FAILURE} END
              AS BIGINT) AS k
  FROM events
),
staged AS (
  SELECT arm,
         CAST(sum(k) OVER (PARTITION BY arm ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS llr,
         row_number() OVER (PARTITION BY arm ORDER BY ts, event_id) AS n
  FROM ev
),
flagged AS (
  SELECT arm, llr, n,
         llr >= {SPRT_UPPER} OR llr <= {SPRT_LOWER} AS crossed
  FROM staged
),
per_arm AS (
  SELECT arm,
         min(CASE WHEN crossed THEN n END) AS n_decision,
         max(n) AS n_total,
         max_by(llr, n) AS final_llr_scaled,
         min_by(CASE WHEN crossed THEN llr END,
                CASE WHEN crossed THEN n END) AS llr_at_decision
  FROM flagged GROUP BY arm
)
SELECT arm,
       CAST(coalesce(n_decision, -1) AS BIGINT) AS n_at_decision,
       CAST(n_total AS BIGINT) AS n_total,
       CASE WHEN n_decision IS NULL THEN 'continue'
            WHEN llr_at_decision >= {SPRT_UPPER} THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       final_llr_scaled / {float(SPRT_SCALE)!r} AS final_llr
FROM per_arm
"""


# ------------------------------------------------------------- q239

BT_SEASON = 7
BT_HOLDOUT_FROM = 15  # evaluate days >= this day-of-series


def q239_rolling_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X202: rolling-origin forecast backtest — the evaluation harness
    every forecasting pipeline needs before any model ships: replay
    history day by day, forecast each holdout day with only data
    available BEFORE it, score against the actual. The forecaster here
    is seasonal-naive (ŷ(d) = y(d−7)) — the canonical baseline a
    backtest harness is built around (any real model must beat it; the
    harness is identical either way). Emits per holdout day: actual,
    forecast, absolute error in exact cents, and APE.

    Revenue aggregates in integer cents, the lag-7 lookup is one
    window over the day series — errors are exact and the MAE any
    consumer derives is reproducible to the cent.

    Scale: the day series is |days|-sized — the backtest costs one
    events aggregation regardless of event volume; rolling-origin
    refits for real models parallelize per origin over the same tiny
    series."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
            .alias("cents")
        )
    )
    w = Window.partitionBy().orderBy("day")
    staged = daily.select(
        "day",
        "cents",
        F.lag("cents", BT_SEASON).over(w).alias("fc"),
        F.row_number().over(w).alias("d_idx"),
    )
    return (
        staged.filter(
            (F.col("d_idx") >= BT_HOLDOUT_FROM) & F.col("fc").isNotNull()
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("cents") / F.lit(100.0)).alias("actual"),
            (F.col("fc") / F.lit(100.0)).alias("forecast"),
            F.abs(F.col("cents") - F.col("fc")).cast("bigint").alias(
                "abs_err_cents"
            ),
            (
                F.abs(F.col("cents") - F.col("fc"))
                / F.col("cents").cast("double")
            ).alias("ape"),
        )
    )


Q239_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
staged AS (
  SELECT day, cents,
         lag(cents, {BT_SEASON}) OVER (ORDER BY day) AS fc,
         row_number() OVER (ORDER BY day) AS d_idx
  FROM daily
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(cents AS BIGINT) / 100.0 AS actual,
       CAST(fc AS BIGINT) / 100.0 AS forecast,
       CAST(abs(cents - fc) AS BIGINT) AS abs_err_cents,
       CAST(abs(cents - fc) AS BIGINT) / CAST(cents AS DOUBLE) AS ape
FROM staged
WHERE d_idx >= {BT_HOLDOUT_FROM} AND fc IS NOT NULL
"""


# ------------------------------------------------------------- q240

CH_OBS_END = "2024-01-20"  # observation window [series start, here)
CH_OUT_END = "2024-01-27"  # outcome window [obs end, here)


def q240_churn_label_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X203: churn-label construction — the temporal train-set builder
    that decides whether a churn model is legitimate: features may see
    ONLY the observation window [start, {CH_OBS_END}), the label only
    the outcome window [{CH_OBS_END}, {CH_OUT_END}) — one boundary,
    enforced by construction in a single conditional-aggregation pass
    (no feature expression touches an outcome-window row, which is the
    leakage audit a feature store runs). Features: event count,
    purchase count, distinct active days, recency (days from last
    observed event to the boundary), spend in cents. Label: churned =
    zero outcome-window events.

    Users with no observation-window activity drop (no feature row —
    the cold-start population is a different model).

    Scale: ONE user-keyed aggregation over one scan; the boundary is
    a pushed-down date filter at 100 TB (both windows together prune
    to 27 days of partitions)."""
    obs_end = F.lit(CH_OBS_END).cast("timestamp")
    out_end = F.lit(CH_OUT_END).cast("timestamp")
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    ).filter(F.col("ts") < out_end)
    in_obs = F.col("ts") < obs_end
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(in_obs, 1).otherwise(0)).cast("bigint").alias("n_events"),
        F.sum(
            F.when(in_obs & (F.col("event_type") == "purchase"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchases"),
        F.count_distinct(F.when(in_obs, F.to_date("ts"))).cast("bigint").alias(
            "active_days"
        ),
        F.max(F.when(in_obs, F.to_date("ts"))).alias("last_day"),
        F.sum(F.when(in_obs, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("spend_cents"),
        F.sum(F.when(~in_obs, 1).otherwise(0)).cast("bigint").alias("n_outcome"),
    )
    return (
        per_user.filter(F.col("n_events") > 0)
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "active_days",
            F.datediff(F.lit(CH_OBS_END).cast("date"), F.col("last_day"))
            .cast("bigint")
            .alias("recency_days"),
            "spend_cents",
            (F.col("n_outcome") == 0).alias("churned"),
        )
    )


Q240_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{CH_OUT_END} 00:00:00'
),
per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{CH_OBS_END} 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{CH_OBS_END} 00:00:00'
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         CAST(count(DISTINCT CASE WHEN ts < TIMESTAMP '{CH_OBS_END} 00:00:00'
                                  THEN CAST(ts AS DATE) END) AS BIGINT)
           AS active_days,
         max(CASE WHEN ts < TIMESTAMP '{CH_OBS_END} 00:00:00'
                  THEN CAST(ts AS DATE) END) AS last_day,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{CH_OBS_END} 00:00:00'
                       THEN cents ELSE 0 END) AS BIGINT) AS spend_cents,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{CH_OBS_END} 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outcome
  FROM ev GROUP BY user_id
)
SELECT user_id, n_events, n_purchases, active_days,
       CAST(DATE '{CH_OBS_END}' - last_day AS BIGINT) AS recency_days,
       spend_cents,
       n_outcome = 0 AS churned
FROM per_user WHERE n_events > 0
"""


# ------------------------------------------------------------- q241


def q241_compression_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X204: column-compression advisor — the storage-layout tuning
    pass a lakehouse optimizer runs per column: from one ordered scan,
    estimate the encoded size under PLAIN (8 B/value), RLE
    (runs × 12 B), DICTIONARY (ndv × 8 B + n × bit_length(ndv−1)/8),
    and DELTA (n × bit_length(max |Δ|)/8 against the table's sort
    order), then recommend the cheapest. Run-counts and max-deltas
    come from one lag window in the storage order (o_orderkey);
    bit-lengths use the q209 string-binary idiom — exact integers, no
    log2 floats. The advisor's verdicts explain WHY sort order is a
    compression decision: custkey RLE-compresses only if the table is
    re-sorted by it, which is the q216 layout trade re-appearing at
    the byte level.

    Scale: one window pass per analyzed column over the same
    (global-order) sort the writer already performs; per-column
    output is catalog-sized."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("days"),
    )
    w = Window.partitionBy().orderBy("o_orderkey")

    def analyze(name: str, col: str) -> DataFrame:
        staged = o.select(
            F.col(col).alias("v"), F.lag(col).over(w).alias("pv")
        )
        agg = staged.agg(
            F.lit(name).alias("column_name"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("v").cast("bigint").alias("ndv"),
            F.sum(
                F.when(
                    F.col("pv").isNull() | (F.col("v") != F.col("pv")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
            F.max(F.abs(F.col("v") - F.coalesce("pv", "v")))
            .cast("bigint")
            .alias("max_delta"),
        )
        return agg.select(
            "column_name",
            "n",
            "ndv",
            "n_runs",
            "max_delta",
            F.expr("CAST(n * 8 AS BIGINT)").alias("plain_bytes"),
            F.expr("CAST(n_runs * 12 AS BIGINT)").alias("rle_bytes"),
            F.expr(
                "CAST(ndv * 8 + (n * CAST(length(conv(ndv - 1, 10, 2)) AS BIGINT)"
                " + 7) div 8 AS BIGINT)"
            ).alias("dict_bytes"),
            F.expr(
                "CAST((n * (CASE WHEN max_delta = 0 THEN 1 "
                "ELSE CAST(length(conv(max_delta, 10, 2)) AS BIGINT) END)"
                " + 7) div 8 AS BIGINT)"
            ).alias("delta_bytes"),
        )

    out = (
        analyze("o_orderkey", "o_orderkey")
        .unionByName(analyze("o_custkey", "o_custkey"))
        .unionByName(analyze("order_days", "days"))
    )
    best = F.least("plain_bytes", "rle_bytes", "dict_bytes", "delta_bytes")
    return out.select(
        "*",
        F.when(F.col("delta_bytes") == best, F.lit("delta"))
        .when(F.col("dict_bytes") == best, F.lit("dictionary"))
        .when(F.col("rle_bytes") == best, F.lit("rle"))
        .otherwise(F.lit("plain"))
        .alias("recommended"),
    )


Q241_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS days
  FROM orders
),
cols AS (
  SELECT 'o_orderkey' AS column_name, o_orderkey AS v,
         lag(o_orderkey) OVER (ORDER BY o_orderkey) AS pv
  FROM o
  UNION ALL
  SELECT 'o_custkey', o_custkey, lag(o_custkey) OVER (ORDER BY o_orderkey)
  FROM o
  UNION ALL
  SELECT 'order_days', days, lag(days) OVER (ORDER BY o_orderkey)
  FROM o
),
agg AS (
  SELECT column_name,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT v) AS BIGINT) AS ndv,
         CAST(sum(CASE WHEN pv IS NULL OR v <> pv THEN 1 ELSE 0 END)
              AS BIGINT) AS n_runs,
         CAST(max(abs(v - coalesce(pv, v))) AS BIGINT) AS max_delta
  FROM cols GROUP BY column_name
),
sized AS (
  SELECT *,
         CAST(n * 8 AS BIGINT) AS plain_bytes,
         CAST(n_runs * 12 AS BIGINT) AS rle_bytes,
         CAST(ndv * 8 + (n * CAST(length(bin(ndv - 1)) AS BIGINT) + 7) // 8
              AS BIGINT) AS dict_bytes,
         CAST((n * (CASE WHEN max_delta = 0 THEN 1
                         ELSE CAST(length(bin(max_delta)) AS BIGINT) END)
               + 7) // 8 AS BIGINT) AS delta_bytes
  FROM agg
)
SELECT column_name, n, ndv, n_runs, max_delta,
       plain_bytes, rle_bytes, dict_bytes, delta_bytes,
       CASE WHEN delta_bytes = least(plain_bytes, rle_bytes, dict_bytes,
                                     delta_bytes) THEN 'delta'
            WHEN dict_bytes = least(plain_bytes, rle_bytes, dict_bytes,
                                    delta_bytes) THEN 'dictionary'
            WHEN rle_bytes = least(plain_bytes, rle_bytes, dict_bytes,
                                   delta_bytes) THEN 'rle'
            ELSE 'plain' END AS recommended
FROM sized
"""


QUERIES_EXT30 = {
    "q238_sprt_sequential_test": q238_sprt_sequential_test,
    "q239_rolling_backtest": q239_rolling_backtest,
    "q240_churn_label_construction": q240_churn_label_construction,
    "q241_compression_advisor": q241_compression_advisor,
}


def _oracles_ext30() -> dict[str, str]:
    return {
        "q238_sprt_sequential_test": Q238_SQL,
        "q239_rolling_backtest": Q239_SQL,
        "q240_churn_label_construction": Q240_SQL,
        "q241_compression_advisor": Q241_SQL,
    }
