"""Round-4 driver query families, batch 40 (q278-q281): cross-sell
lift matrix, fraud velocity rules, Chebyshev stockout bounds, and A/A
test calibration.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q278


def q278_cross_sell_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X239: cross-sell matrix — the retail staple X75 (event
    co-occurrence) applied to the basket: part-TYPE pairs co-purchased
    within the same order, with support and LIFT vs independence.
    Type pairs come from the per-order distinct-type set self-joined
    on the order key (a < b, each unordered pair once); lift =
    n·c(a,b) / (c(a)·c(b)) over order counts — exact integers until
    one final double division.

    Scale: the per-order type set is ≤|types| rows per order; the
    pair join is keyed on the order (co-partitioned, never
    all-pairs); the matrix is |types|² tiny."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    ot = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    n_orders = ot.select("l_orderkey").distinct().count()
    singles = ot.groupBy("p_type").agg(F.count(F.lit(1)).alias("c1"))
    pairs = (
        ot.alias("a")
        .join(
            ot.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(
            F.col("a.p_type").alias("ta"), F.col("b.p_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    j = (
        pairs.join(
            F.broadcast(singles.select(F.col("p_type").alias("ta"),
                                       F.col("c1").alias("ca"))),
            "ta",
        )
        .join(
            F.broadcast(singles.select(F.col("p_type").alias("tb"),
                                       F.col("c1").alias("cb"))),
            "tb",
        )
    )
    return j.select(
        "ta",
        "tb",
        F.col("c2").cast("bigint").alias("n_co_orders"),
        (F.col("c2") / F.lit(float(n_orders))).alias("support"),
        (
            (F.col("c2") * n_orders)
            / (F.col("ca") * F.col("cb")).cast("double")
        ).alias("lift"),
    )


Q278_SQL = """
WITH ot AS (
  SELECT DISTINCT l.l_orderkey, p.p_type
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ot),
singles AS (SELECT p_type, count(*) AS c1 FROM ot GROUP BY p_type),
pairs AS (
  SELECT a.p_type AS ta, b.p_type AS tb, count(*) AS c2
  FROM ot a JOIN ot b
    ON b.l_orderkey = a.l_orderkey AND a.p_type < b.p_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb,
       CAST(p.c2 AS BIGINT) AS n_co_orders,
       p.c2 / CAST(n.n_orders AS DOUBLE) AS support,
       (p.c2 * n.n_orders) / CAST(sa.c1 * sb.c1 AS DOUBLE) AS lift
FROM pairs p
JOIN singles sa ON sa.p_type = p.ta
JOIN singles sb ON sb.p_type = p.tb
CROSS JOIN n
"""


# ------------------------------------------------------------- q279

VR_BURST_N, VR_BURST_MIN = 3, 30  # rule A: ≥3 purchases in 30 min
VR_FLOOD_N, VR_FLOOD_MIN = 5, 5  # rule B: ≥5 events of any kind in 5 min


def q279_velocity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X240: velocity-rule screening — the fraud/abuse rule engine as
    window arithmetic: rule A flags a purchase when it is the
    {VR_BURST_N}th purchase by that user within {VR_BURST_MIN}
    minutes; rule B flags ANY event that is the {VR_FLOOD_N}th by
    that user within {VR_FLOOD_MIN} minutes. Both are time-RANGE
    window counts over ONE user-keyed sort (X101's frame machinery
    put to work); flags are integer comparisons. Emits the per-user
    screening summary — events, flags per rule, first flag time —
    the triage relation an abuse queue consumes.

    Scale: one shuffle by user serves both rules; RANGE frames keep
    state bounded by the window span, and the same query IS the
    streaming formulation's batch twin (watermark = max window)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wa = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-VR_BURST_MIN * 60_000_000, 0)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-VR_FLOOD_MIN * 60_000_000, 0)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).over(wa),
        )
        .otherwise(0)
        .alias("burst_ct"),
        F.count(F.lit(1)).over(wb).alias("flood_ct"),
    ).select(
        "user_id",
        "ts",
        (F.col("burst_ct") >= VR_BURST_N).alias("rule_burst"),
        (F.col("flood_ct") >= VR_FLOOD_N).alias("rule_flood"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("rule_burst"), 1).otherwise(0))
        .cast("bigint")
        .alias("burst_flags"),
        F.sum(F.when(F.col("rule_flood"), 1).otherwise(0))
        .cast("bigint")
        .alias("flood_flags"),
        F.min(
            F.when(F.col("rule_burst") | F.col("rule_flood"), F.col("ts"))
        ).alias("first_flag_ts"),
    )


Q279_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'purchase' THEN
           count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {VR_BURST_MIN * 60_000_000} PRECEDING
                       AND CURRENT ROW)
         ELSE 0 END AS burst_ct,
         count(*) OVER (
           PARTITION BY user_id ORDER BY us
           RANGE BETWEEN {VR_FLOOD_MIN * 60_000_000} PRECEDING
                     AND CURRENT ROW) AS flood_ct
  FROM ev
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN burst_ct >= {VR_BURST_N} THEN 1 ELSE 0 END)
            AS BIGINT) AS burst_flags,
       CAST(sum(CASE WHEN flood_ct >= {VR_FLOOD_N} THEN 1 ELSE 0 END)
            AS BIGINT) AS flood_flags,
       CAST(min(CASE WHEN burst_ct >= {VR_BURST_N}
                      OR flood_ct >= {VR_FLOOD_N} THEN ts END) AS TIMESTAMP)
         AS first_flag_ts
FROM flagged GROUP BY user_id
"""


# ------------------------------------------------------------- q280

CHEB_CAPACITY_MULT = 2  # capacity threshold = 2× mean monthly demand


def q280_chebyshev_stockout_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X241: distribution-free stockout risk bound — Chebyshev's
    inequality as the no-simulation risk screen: for each part brand,
    P(monthly demand ≥ {CHEB_CAPACITY_MULT}×mean) ≤ σ²/(t−μ)² —
    computed entirely from exact integer power sums of monthly
    quantities (variance and (t−μ)² stay RATIONAL via cross-
    multiplication: bound = (n·Σq²−(Σq)²)·n / ((t·n−Σq)²·n... reduced
    to one final double division of two exact integers). No normality
    assumption, no Monte Carlo, no libm — the bound any engine
    reproduces bit-for-bit. Brands whose bound exceeds 25% are the
    capacity-review worklist.

    Scale: one (brand, month) agg + one brand-level power-sum agg —
    planner-grid cost."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("mth"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "mth")
        .agg(F.sum("qty").alias("q"))
    )
    g = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    # t = CHEB_CAPACITY_MULT * mean = M*sq/n; (t-mu) = (M-1)*sq/n
    # var = (n*sqq - sq^2)/n^2; bound = var/(t-mu)^2
    #     = (n*sqq - sq^2) / ((M-1)^2 * sq^2)
    m1 = CHEB_CAPACITY_MULT - 1
    num = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    den = F.lit(m1 * m1) * F.col("sq") * F.col("sq")
    return g.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_months"),
        (F.col("sq") / F.col("n").cast("double")).alias("mean_monthly_qty"),
        (num / den.cast("double")).alias("stockout_prob_bound"),
        (num * 4 > den).alias("capacity_review"),
    )


Q280_SQL = f"""
WITH monthly AS (
  SELECT p.p_brand, strftime(CAST(l.l_shipdate AS DATE), '%Y-%m') AS mth,
         sum(CAST(l.l_quantity AS BIGINT)) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
g AS (
  SELECT p_brand, count(*) AS n, sum(q) AS sq, sum(q * q) AS sqq
  FROM monthly GROUP BY p_brand
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_months,
       sq / CAST(n AS DOUBLE) AS mean_monthly_qty,
       (n * sqq - sq * sq)
         / CAST({(CHEB_CAPACITY_MULT - 1) ** 2} * sq * sq AS DOUBLE)
         AS stockout_prob_bound,
       (n * sqq - sq * sq) * 4 > {(CHEB_CAPACITY_MULT - 1) ** 2} * sq * sq
         AS capacity_review
FROM g
"""


# ------------------------------------------------------------- q281

AA_SPLITS = 8  # deterministic hash splits for the null experiments


def q281_aa_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X242: A/A test calibration — the experimentation platform's
    own health check: run {AA_SPLITS} NULL experiments (deterministic
    md5-hash splits of users, so no real effect exists by
    construction) and verify the test statistic stays under the
    critical value about as often as α promises. Each split's
    two-proportion z² statistic is computed from exact integer counts
    with identically-formed double arithmetic; the summary counts
    splits exceeding the 5% critical value (z² > 3.8415). A platform
    whose A/A flags fire too often has a broken variance estimate or
    a correlated assignment — this catches it before any real
    experiment is read.

    Scale: all {AA_SPLITS} splits evaluate in ONE pass (conditional
    sums per split id), not one query per split."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum("is_p").alias("p"), F.count(F.lit(1)).alias("n")
    )
    # "Converted" = purchase share above the corpus-wide 1-in-5 design
    # rate — non-degenerate at every SF (an every-user-converts metric
    # would make the pooled variance zero).
    conv = per_user.select(
        "user_id", (F.col("p") * 5 > F.col("n")).cast("long").alias("converted")
    )
    aggs = []
    for s in range(AA_SPLITS):
        arm = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(s), F.col("user_id"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        aggs += [
            F.sum(F.when(arm == 0, F.col("converted")).otherwise(0)).alias(
                f"x0_{s}"
            ),
            F.sum(F.when(arm == 0, 1).otherwise(0)).alias(f"n0_{s}"),
            F.sum(F.when(arm == 1, F.col("converted")).otherwise(0)).alias(
                f"x1_{s}"
            ),
            F.sum(F.when(arm == 1, 1).otherwise(0)).alias(f"n1_{s}"),
        ]
    wide = conv.agg(*aggs)
    z2s = []
    for s in range(AA_SPLITS):
        x0, n0 = F.col(f"x0_{s}"), F.col(f"n0_{s}")
        x1, n1 = F.col(f"x1_{s}"), F.col(f"n1_{s}")
        # pooled z^2 = (p1-p0)^2 / (p*(1-p)*(1/n0+1/n1)), formed from
        # identical double expressions on both engines
        p0 = x0 / n0.cast("double")
        p1 = x1 / n1.cast("double")
        pp = (x0 + x1) / (n0 + n1).cast("double")
        z2 = ((p1 - p0) * (p1 - p0)) / (
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / n0.cast("double") + F.lit(1.0) / n1.cast("double"))
        )
        z2s.append(z2)
    exceed = sum(
        [F.when(z2 > 3.8415, 1).otherwise(0) for z2 in z2s], F.lit(0)
    )
    return wide.select(
        F.lit(AA_SPLITS).cast("bigint").alias("n_splits"),
        exceed.cast("bigint").alias("n_exceeding_5pct"),
        (exceed <= F.lit(max(2, AA_SPLITS // 2))).alias("calibration_ok"),
    )


def _q281_sql() -> str:
    from product_analytics_spark.qcommon import _hash60_sql

    cells = []
    z2_terms = []
    for s in range(AA_SPLITS):
        # DuckDB arm: positional parse of md5 first 8 hex chars % 2 —
        # mirror of Spark's conv(substring(md5,1,8),16,10) % 2.
        h = (
            "CAST(list_sum(list_transform(generate_series(1,8), i -> "
            f"CAST(strpos('0123456789abcdef', substring(md5(concat({s}, ':', "
            "user_id)), i, 1)) - 1 AS BIGINT)"
            " * (CAST(1 AS BIGINT) << (4*(8-i))))) AS BIGINT)"
        )
        arm = f"({h}) % 2"
        cells.append(
            f"sum(CASE WHEN {arm} = 0 THEN converted ELSE 0 END) AS x0_{s}, "
            f"sum(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END) AS n0_{s}, "
            f"sum(CASE WHEN {arm} = 1 THEN converted ELSE 0 END) AS x1_{s}, "
            f"sum(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END) AS n1_{s}"
        )
        z2 = (
            f"((x1_{s} / CAST(n1_{s} AS DOUBLE)"
            f" - x0_{s} / CAST(n0_{s} AS DOUBLE))"
            f" * (x1_{s} / CAST(n1_{s} AS DOUBLE)"
            f" - x0_{s} / CAST(n0_{s} AS DOUBLE)))"
            f" / (((x0_{s} + x1_{s}) / CAST(n0_{s} + n1_{s} AS DOUBLE))"
            f" * (1.0 - (x0_{s} + x1_{s}) / CAST(n0_{s} + n1_{s} AS DOUBLE))"
            f" * (1.0 / CAST(n0_{s} AS DOUBLE) + 1.0 / CAST(n1_{s} AS DOUBLE)))"
        )
        z2_terms.append(f"CASE WHEN {z2} > 3.8415 THEN 1 ELSE 0 END")
    exceed = " + ".join(z2_terms)
    return f"""
WITH conv AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   * 5 > count(*) THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
wide AS (SELECT {', '.join(cells)} FROM conv)
SELECT CAST({AA_SPLITS} AS BIGINT) AS n_splits,
       CAST({exceed} AS BIGINT) AS n_exceeding_5pct,
       ({exceed}) <= {max(2, AA_SPLITS // 2)} AS calibration_ok
FROM wide
"""


QUERIES_EXT40 = {
    "q278_cross_sell_matrix": q278_cross_sell_matrix,
    "q279_velocity_rules": q279_velocity_rules,
    "q280_chebyshev_stockout_bound": q280_chebyshev_stockout_bound,
    "q281_aa_calibration": q281_aa_calibration,
}


def _oracles_ext40() -> dict[str, str]:
    return {
        "q278_cross_sell_matrix": Q278_SQL,
        "q279_velocity_rules": Q279_SQL,
        "q280_chebyshev_stockout_bound": Q280_SQL,
        "q281_aa_calibration": _q281_sql(),
    }
