"""Round-4 driver query families, batch 36 (q262-q265): one-big-table
denormalization audit, sample-ratio-mismatch check, metric correlation
matrix, and difference-in-differences.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.driver_queries_ext33 import _CENTS

# ------------------------------------------------------------- q262


def q262_obt_denormalization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223: One-Big-Table denormalization + conservation audit — the
    modern-warehouse flattening move (orders joined wide to customer →
    nation → region in one pass) VERIFIED the way a platform team must
    verify it: the OBT's per-region revenue and row counts must equal
    the normalized model's, and the fact row count must survive the
    widening exactly (a dropped or duplicated row means a bad join
    key, the classic silent OBT bug). One query computes the per-
    region rollup from the OBT; the oracle computes it from the
    normalized tables — equality IS the conservation proof.

    Scale: dims broadcast; the OBT write is the one-fact-scan
    widening; consumers then read one table with zero joins — the
    trade is storage for join elimination, priced by the q241
    advisor."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey",
        f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    obt = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return obt.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.sum("cents") / F.lit(100.0)).alias("revenue"),
        F.count_distinct("o_orderkey").cast("bigint").alias("distinct_orders"),
    ).select(
        "r_name",
        "n_orders",
        "revenue",
        "distinct_orders",
        (F.col("n_orders") == F.col("distinct_orders")).alias(
            "no_fanout_duplication"
        ),
    )


Q262_SQL = f"""
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum({_CENTS.replace('l_extendedprice', 'o_totalprice')}) AS BIGINT)
         / 100.0 AS revenue,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS distinct_orders,
       count(*) = count(DISTINCT o.o_orderkey) AS no_fanout_duplication
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""


# ------------------------------------------------------------- q263

SRM_EXPECT_NUM, SRM_EXPECT_DEN = 1, 2  # expected 50/50 split


def q263_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X224: sample-ratio-mismatch (SRM) check — the first gate every
    A/B readout must pass: if the realized assignment split deviates
    from the DESIGNED ratio more than chance allows, the experiment is
    corrupted (bot filtering, logging loss, redirect bugs) and every
    downstream metric is untrustworthy. Assignment = user-id parity;
    the chi-square statistic over (observed, expected) counts is
    computed from exact integers with ONE final float division, and
    the pass/fail verdict compares against the χ²₁ 99% critical value
    (6.635) — both engines agree bit-for-bit.

    Scale: one distinct-user agg; the check is O(arms)."""
    arms = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # chi2 = Σ (o - e)^2 / e with e = total/2 for both arms; in exact
    # integer cross-multiplication: chi2 = Σ (2*o - total)^2 / (2*total)
    wtot = F.sum("n")
    folded = arms.agg(
        wtot.cast("bigint").alias("total"),
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_arm0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_arm1"),
    )
    chi_num = (
        (F.col("n_arm0") * 2 - F.col("total"))
        * (F.col("n_arm0") * 2 - F.col("total"))
        + (F.col("n_arm1") * 2 - F.col("total"))
        * (F.col("n_arm1") * 2 - F.col("total"))
    )
    return folded.select(
        "total",
        "n_arm0",
        "n_arm1",
        (chi_num / (F.col("total") * 2).cast("double")).alias("chi2"),
        (
            chi_num / (F.col("total") * 2).cast("double") < F.lit(6.635)
        ).alias("srm_ok"),
    )


Q263_SQL = """
WITH arms AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm, count(*) AS n
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
),
folded AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_arm0,
         CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_arm1
  FROM arms
)
SELECT total, n_arm0, n_arm1,
       ((n_arm0 * 2 - total) * (n_arm0 * 2 - total)
        + (n_arm1 * 2 - total) * (n_arm1 * 2 - total))
         / CAST(total * 2 AS DOUBLE) AS chi2,
       ((n_arm0 * 2 - total) * (n_arm0 * 2 - total)
        + (n_arm1 * 2 - total) * (n_arm1 * 2 - total))
         / CAST(total * 2 AS DOUBLE) < 6.635 AS srm_ok
FROM folded
"""


# ------------------------------------------------------------- q264


def q264_metric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X225: metric correlation matrix — the metric-health dashboard
    staple: pairwise Pearson correlation between every pair of daily
    event-type counts, from EXACT integer power sums (Σx, Σy, Σxy,
    Σx², Σy², n — the X64 kernel lifted to all pairs at once). The
    day×type count matrix pivots in one pass, the pair relation is a
    day-keyed self-join restricted to a < b (each unordered pair
    once), and the only floats are the two final IEEE steps (sqrt,
    divide) applied identically on both engines.

    Scale: the matrix is |days| × |types| — tiny regardless of event
    volume; the quadratic pair blowup is over TYPES (a handful), not
    rows."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = daily.select(
        "day", F.col("event_type").alias("ta"), F.col("n").alias("x")
    )
    b = daily.select(
        "day", F.col("event_type").alias("tb"), F.col("n").alias("y")
    )
    pairs = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    g = pairs.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        "ta",
        "tb",
        F.col("n").cast("bigint").alias("n_days"),
        (
            num.cast("double")
            / F.sqrt(denx.cast("double") * deny.cast("double"))
        ).alias("pearson_r"),
    )


Q264_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.n AS x, b.n AS y
  FROM daily a JOIN daily b ON b.day = a.day AND a.event_type < b.event_type
),
g AS (
  SELECT ta, tb, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY ta, tb
)
SELECT ta, tb, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS pearson_r
FROM g
"""


# ------------------------------------------------------------- q265

DID_CUT = "2024-01-15"  # "policy change" date


def q265_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X226: difference-in-differences — the quasi-experimental
    workhorse when randomization isn't available: treatment group =
    odd user ids (the "rollout cohort"), pre/post split at a policy
    date; the DiD estimate is (T_post − T_pre) − (C_post − C_pre) over
    per-user-day purchase rates. All four cell means come from ONE
    conditional aggregation pass; each mean is an exact integer pair
    (events, user-days) divided once at the end, and the estimate is
    three IEEE subtractions of identically-computed doubles — the
    parallel-trends ARITHMETIC is engine-exact (the assumption, as
    always, is the analyst's problem).

    Scale: one scan, a 1-row result; cohort × period cells are
    conditional sums, not separate queries."""
    cut = F.lit(DID_CUT).cast("timestamp")
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("ts").cast("timestamp") >= cut).alias("post"),
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    g = ev.groupBy("treated", "post").agg(
        F.sum("is_p").alias("p"), F.count(F.lit(1)).alias("n")
    )

    def cell(tr: bool, po: bool, col: str):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po), F.col(col)
            )
        )

    folded = g.agg(
        *[
            cell(tr, po, c).cast("bigint").alias(f"{c}_{int(tr)}{int(po)}")
            for tr in (False, True)
            for po in (False, True)
            for c in ("p", "n")
        ]
    )
    rate = lambda t, p: F.col(f"p_{t}{p}") / F.col(f"n_{t}{p}").cast("double")
    return folded.select(
        (rate(1, 1) - rate(1, 0)).alias("treated_delta"),
        (rate(0, 1) - rate(0, 0)).alias("control_delta"),
        (
            (rate(1, 1) - rate(1, 0)) - (rate(0, 1) - rate(0, 0))
        ).alias("did_estimate"),
        (F.col("n_00") + F.col("n_01") + F.col("n_10") + F.col("n_11"))
        .cast("bigint")
        .alias("n_events"),
    )


Q265_SQL = f"""
WITH ev AS (
  SELECT user_id % 2 = 1 AS treated,
         CAST(ts AS TIMESTAMP) >= TIMESTAMP '{DID_CUT} 00:00:00' AS post,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
),
g AS (
  SELECT treated, post, sum(is_p) AS p, count(*) AS n
  FROM ev GROUP BY 1, 2
),
folded AS (
  SELECT
    CAST(max(CASE WHEN NOT treated AND NOT post THEN p END) AS BIGINT) AS p_00,
    CAST(max(CASE WHEN NOT treated AND NOT post THEN n END) AS BIGINT) AS n_00,
    CAST(max(CASE WHEN NOT treated AND post THEN p END) AS BIGINT) AS p_01,
    CAST(max(CASE WHEN NOT treated AND post THEN n END) AS BIGINT) AS n_01,
    CAST(max(CASE WHEN treated AND NOT post THEN p END) AS BIGINT) AS p_10,
    CAST(max(CASE WHEN treated AND NOT post THEN n END) AS BIGINT) AS n_10,
    CAST(max(CASE WHEN treated AND post THEN p END) AS BIGINT) AS p_11,
    CAST(max(CASE WHEN treated AND post THEN n END) AS BIGINT) AS n_11
  FROM g
)
SELECT (p_11 / CAST(n_11 AS DOUBLE) - p_10 / CAST(n_10 AS DOUBLE))
         AS treated_delta,
       (p_01 / CAST(n_01 AS DOUBLE) - p_00 / CAST(n_00 AS DOUBLE))
         AS control_delta,
       ((p_11 / CAST(n_11 AS DOUBLE) - p_10 / CAST(n_10 AS DOUBLE))
        - (p_01 / CAST(n_01 AS DOUBLE) - p_00 / CAST(n_00 AS DOUBLE)))
         AS did_estimate,
       CAST(n_00 + n_01 + n_10 + n_11 AS BIGINT) AS n_events
FROM folded
"""


QUERIES_EXT36 = {
    "q262_obt_denormalization_audit": q262_obt_denormalization_audit,
    "q263_srm_check": q263_srm_check,
    "q264_metric_correlation_matrix": q264_metric_correlation_matrix,
    "q265_did_estimate": q265_did_estimate,
}


def _oracles_ext36() -> dict[str, str]:
    return {
        "q262_obt_denormalization_audit": Q262_SQL,
        "q263_srm_check": Q263_SQL,
        "q264_metric_correlation_matrix": Q264_SQL,
        "q265_did_estimate": Q265_SQL,
    }
