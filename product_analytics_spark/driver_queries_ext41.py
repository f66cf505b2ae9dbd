"""Round-4 driver query families, batch 41 (q282-q285): redaction
effectiveness audit, Jain fairness index, Wilson confidence bounds,
and weekday-adjusted revenue pacing.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q282

# The scrubber's patterns (X25's kernel) and a deliberately-planted
# synthetic leak so the audit proves it MEASURES, not just agrees: the
# email pattern below is applied, the digit-run pattern is NOT — the
# audit must show 0 residuals for the first and non-zero for the
# second.
RED_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
RED_DIGITS_RE = "[0-9]{6,}"


def q282_redaction_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X243: redaction effectiveness audit — the governance check X25
    (PII scrubbing) needs on top of itself: after the scrub runs,
    re-scan the output for every pattern in the policy and count
    RESIDUALS. Synthetic PII is planted deterministically (an email
    per doc ≡0 mod 10, a long digit run per doc ≡0 mod 7); the
    scrubber masks ONLY the email pattern, so the audit must report
    zero email residuals and a known-positive digit-run residual —
    proving the audit detects leaks rather than rubber-stamping.
    Counts are regexp_count sums pre/post per pattern.

    Scale: two map-side regex passes over the text column; the audit
    relation is |patterns|-sized."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" contact-"),
                     F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        )
        .otherwise(F.col("text"))
        .alias("t0"),
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("t0"), F.lit(" id:1234567890")),
        )
        .otherwise(F.col("t0"))
        .alias("raw"),
    )
    scrubbed = d.select(
        "doc_id",
        "raw",
        F.regexp_replace("raw", RED_EMAIL_RE, "[EMAIL]").alias("clean"),
    )
    return scrubbed.agg(
        F.sum(F.expr(f"regexp_count(raw, '{RED_EMAIL_RE}')"))
        .cast("bigint")
        .alias("email_before"),
        F.sum(F.expr(f"regexp_count(clean, '{RED_EMAIL_RE}')"))
        .cast("bigint")
        .alias("email_residual"),
        F.sum(F.expr(f"regexp_count(raw, '{RED_DIGITS_RE}')"))
        .cast("bigint")
        .alias("digits_before"),
        F.sum(F.expr(f"regexp_count(clean, '{RED_DIGITS_RE}')"))
        .cast("bigint")
        .alias("digits_residual"),
    ).select(
        "email_before",
        "email_residual",
        "digits_before",
        "digits_residual",
        (F.col("email_residual") == 0).alias("email_policy_clean"),
        (F.col("digits_residual") > 0).alias("audit_detects_leak"),
    )


Q282_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN concat(text, ' contact-', CAST(doc_id AS VARCHAR),
                          '@example.com')
              ELSE text END AS t0
  FROM documents
),
raws AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN concat(t0, ' id:1234567890')
              ELSE t0 END AS raw
  FROM d
),
scrubbed AS (
  SELECT doc_id, raw,
         regexp_replace(raw, '{RED_EMAIL_RE}', '[EMAIL]', 'g') AS clean
  FROM raws
)
SELECT CAST(sum(len(regexp_extract_all(raw, '{RED_EMAIL_RE}'))) AS BIGINT)
         AS email_before,
       CAST(sum(len(regexp_extract_all(clean, '{RED_EMAIL_RE}'))) AS BIGINT)
         AS email_residual,
       CAST(sum(len(regexp_extract_all(raw, '{RED_DIGITS_RE}'))) AS BIGINT)
         AS digits_before,
       CAST(sum(len(regexp_extract_all(clean, '{RED_DIGITS_RE}'))) AS BIGINT)
         AS digits_residual,
       sum(len(regexp_extract_all(clean, '{RED_EMAIL_RE}'))) = 0
         AS email_policy_clean,
       sum(len(regexp_extract_all(clean, '{RED_DIGITS_RE}'))) > 0
         AS audit_detects_leak
FROM scrubbed
"""


# ------------------------------------------------------------- q283


def q283_jain_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X244: Jain's fairness index — the multi-tenant resource-share
    metric: J = (Σx)² / (n·Σx²) over per-tenant consumption (1 = all
    tenants equal, 1/n = one tenant takes everything). Tenants =
    nations, resources = order count and exact revenue cents; both
    indices come from one aggregation of exact integer power sums
    with ONE double division each — the capacity-governance number
    (and Gini's (X134) operations-friendly cousin: no sorting, pure
    sums, trivially mergeable/incremental).

    Scale: O(tenants) relation after one fact agg; mergeable across
    shards by adding the power sums."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("x"), F.sum("cents").alias("r"))
    )
    # Revenue rescales to exact thousand-dollar units BEFORE squaring:
    # per-tenant cents² overflows BIGINT beyond ~sf0.1, and Jain is
    # scale-invariant (identical floor-rescale on both engines).
    g = per_nation.select(
        "x", F.expr("CAST(r div 100000 AS BIGINT)").alias("rk")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("rk").alias("sr"),
        F.sum(F.col("rk") * F.col("rk")).alias("srr"),
    )
    return g.select(
        F.col("n").cast("bigint").alias("n_tenants"),
        (
            (F.col("sx") * F.col("sx"))
            / (F.col("n") * F.col("sxx")).cast("double")
        ).alias("jain_orders"),
        (
            (F.col("sr") * F.col("sr"))
            / (F.col("n") * F.col("srr")).cast("double")
        ).alias("jain_revenue"),
    )


Q283_SQL = """
WITH per_nation AS (
  SELECT c.c_nationkey, count(*) AS x,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS r
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
)
SELECT CAST(count(*) AS BIGINT) AS n_tenants,
       (sum(x) * sum(x)) / CAST(count(*) * sum(x * x) AS DOUBLE)
         AS jain_orders,
       (sum(rk) * sum(rk)) / CAST(count(*) * sum(rk * rk) AS DOUBLE)
         AS jain_revenue
FROM (SELECT x, CAST(r // 100000 AS BIGINT) AS rk FROM per_nation)
"""


# ------------------------------------------------------------- q284

WILSON_Z = 1.96


def q284_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X245: Wilson score confidence bounds per group — the interval
    every small-sample rate report should carry instead of the
    textbook Wald interval (which collapses at p→0/1 and small n):
    per user cohort, the purchase-conversion rate with the Wilson
    95% lower/upper bounds. The
    bounds are formed from exact integer (successes, trials) through
    the IDENTICAL double formula on both engines (one sqrt — exactly
    rounded everywhere — and fixed z); ranking by the LOWER bound is
    the standard small-sample-safe ordering.

    Scale: one user-grain agg then one nation-grain agg; the interval
    math is map-side over |nations| rows."""
    ev = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    # user_id % 5 is the cohort key — deterministic and
    # engine-identical (no mapping through data-dependent counts).
    g = ev.groupBy((F.col("user_id") % 5).alias("cohort")).agg(
        F.sum("conv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    z2 = WILSON_Z * WILSON_Z
    p = F.col("s") / F.col("n").cast("double")
    nn = F.col("n").cast("double")
    center = (p + F.lit(z2) / (2 * nn)) / (1 + F.lit(z2) / nn)
    half = (
        F.lit(WILSON_Z)
        * F.sqrt(
            (p * (1 - p) + F.lit(z2) / (4 * nn)) / nn
        )
        / (1 + F.lit(z2) / nn)
    )
    return g.select(
        F.col("cohort").cast("bigint").alias("cohort"),
        F.col("s").cast("bigint").alias("conversions"),
        F.col("n").cast("bigint").alias("users"),
        p.alias("rate"),
        (center - half).alias("wilson_lower"),
        (center + half).alias("wilson_upper"),
    )


Q284_SQL = f"""
WITH ev AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
         sum(conv) AS s, count(*) AS n
  FROM ev GROUP BY 1
)
SELECT cohort,
       CAST(s AS BIGINT) AS conversions,
       CAST(n AS BIGINT) AS users,
       s / CAST(n AS DOUBLE) AS rate,
       ((s / CAST(n AS DOUBLE) + {WILSON_Z * WILSON_Z} / (2 * CAST(n AS DOUBLE)))
        / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE)))
       - ({WILSON_Z} * sqrt((s / CAST(n AS DOUBLE)
                             * (1 - s / CAST(n AS DOUBLE))
                             + {WILSON_Z * WILSON_Z}
                               / (4 * CAST(n AS DOUBLE)))
                            / CAST(n AS DOUBLE))
          / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE))) AS wilson_lower,
       ((s / CAST(n AS DOUBLE) + {WILSON_Z * WILSON_Z} / (2 * CAST(n AS DOUBLE)))
        / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE)))
       + ({WILSON_Z} * sqrt((s / CAST(n AS DOUBLE)
                             * (1 - s / CAST(n AS DOUBLE))
                             + {WILSON_Z * WILSON_Z}
                               / (4 * CAST(n AS DOUBLE)))
                            / CAST(n AS DOUBLE))
          / (1 + {WILSON_Z * WILSON_Z} / CAST(n AS DOUBLE))) AS wilson_upper
FROM g
"""


# ------------------------------------------------------------- q285

PACE_MONTH = "2024-01"
PACE_AS_OF_DAY = 20  # month-to-date through this day
PACE_TARGET_CENTS = 40_000_000


def q285_pacing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X246: weekday-adjusted revenue pacing — the month-to-date
    pacing dashboard with its failure mode measured: naive pacing
    (MTD ÷ days-elapsed × days-in-month) lies whenever weekday mix
    differs between elapsed and remaining days; the adjusted pace weights by the
    weekday revenue PROFILE of the elapsed period itself. Both
    paces and the vs-target verdicts are exact-integer arithmetic
    (cents × day counts, cross-multiplied) with final double ratios.

    Emits one pacing row: MTD, naive projection, weekday-adjusted
    projection, and on-track verdicts against the target.

    Scale: one month-filtered day-grain agg (partition-pruned at
    scale); pacing math is a 1-row fold."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .filter(F.date_format("day", "yyyy-MM") == PACE_MONTH)
    )
    daily = ev.groupBy("day").agg(F.sum("cents").alias("c"))
    staged = daily.select(
        "day",
        "c",
        F.dayofmonth("day").alias("dom"),
        # ISO weekday via Monday-anchored day number (engine-portable,
        # no dayofweek offset trap): 0=Mon..6=Sun
        (F.datediff("day", F.lit("1992-01-06").cast("date")) % 7).alias("wd"),
    )
    mdays = 31  # January
    folded = staged.agg(
        F.sum(F.when(F.col("dom") <= PACE_AS_OF_DAY, F.col("c")).otherwise(0))
        .alias("mtd"),
        F.sum(
            F.when(F.col("dom") <= PACE_AS_OF_DAY, 1).otherwise(0)
        ).alias("days_elapsed"),
        # weekday-mass of elapsed days vs whole month, from the day grid
        F.sum(
            F.when(
                (F.col("dom") <= PACE_AS_OF_DAY) & (F.col("wd") < 5), 1
            ).otherwise(0)
        ).alias("elapsed_weekdays"),
        F.sum(F.when(F.col("wd") < 5, 1).otherwise(0)).alias("month_weekdays_observed"),
        F.sum(
            F.when(
                (F.col("dom") <= PACE_AS_OF_DAY) & (F.col("wd") < 5),
                F.col("c"),
            ).otherwise(0)
        ).alias("mtd_weekday_cents"),
    )
    naive = F.col("mtd") * mdays / (F.col("days_elapsed") * 100.0)
    return folded.select(
        (F.col("mtd") / F.lit(100.0)).alias("mtd_revenue"),
        F.col("days_elapsed").cast("bigint").alias("days_elapsed"),
        naive.alias("naive_projection"),
        (
            F.col("mtd_weekday_cents") / F.col("mtd").cast("double")
        ).alias("weekday_revenue_share"),
        (F.col("mtd") * mdays > F.lit(PACE_TARGET_CENTS) * F.col("days_elapsed"))
        .alias("on_track_naive"),
    )


Q285_SQL = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE strftime(CAST(ts AS DATE), '%Y-%m') = '{PACE_MONTH}'
),
daily AS (SELECT day, sum(cents) AS c FROM ev GROUP BY day),
staged AS (
  SELECT day, c, dayofmonth(day) AS dom,
         CAST(day - DATE '1992-01-06' AS BIGINT) % 7 AS wd
  FROM daily
),
folded AS (
  SELECT sum(CASE WHEN dom <= {PACE_AS_OF_DAY} THEN c ELSE 0 END) AS mtd,
         sum(CASE WHEN dom <= {PACE_AS_OF_DAY} THEN 1 ELSE 0 END)
           AS days_elapsed,
         sum(CASE WHEN dom <= {PACE_AS_OF_DAY} AND wd < 5 THEN c ELSE 0 END)
           AS mtd_weekday_cents
  FROM staged
)
SELECT mtd / 100.0 AS mtd_revenue,
       CAST(days_elapsed AS BIGINT) AS days_elapsed,
       mtd * 31 / (days_elapsed * 100.0) AS naive_projection,
       mtd_weekday_cents / CAST(mtd AS DOUBLE) AS weekday_revenue_share,
       mtd * 31 > {PACE_TARGET_CENTS} * days_elapsed AS on_track_naive
FROM folded
"""


QUERIES_EXT41 = {
    "q282_redaction_effectiveness": q282_redaction_effectiveness,
    "q283_jain_fairness": q283_jain_fairness,
    "q284_wilson_interval": q284_wilson_interval,
    "q285_pacing_forecast": q285_pacing_forecast,
}


def _oracles_ext41() -> dict[str, str]:
    return {
        "q282_redaction_effectiveness": Q282_SQL,
        "q283_jain_fairness": Q283_SQL,
        "q284_wilson_interval": Q284_SQL,
        "q285_pacing_forecast": Q285_SQL,
    }
