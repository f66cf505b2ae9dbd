"""Round-4 driver query families, batch 38 (q270-q273): model-as-data
batch scoring, ABC-XYZ inventory matrix, session dwell-time
allocation, and on-time fulfillment by priority.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import SESSION_GAP_MIN, _t, local_rows_df

# ------------------------------------------------------------- q270

# Integer-scaled linear-model coefficients (weights × 10^4): the model
# IS data — a (feature, weight) relation, versioned and joined, never
# code. Scores are exact integer dot products; only the reported
# margin is a final double.
SCORING_WEIGHTS = [
    ("n_events", -12),
    ("n_purchases", 480),
    ("active_days", 35),
    ("spend_cents", 1),
]
SCORING_BIAS = -250_000
SCORING_SCALE = 10_000


def q270_batch_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X231: model-as-data batch inference — the deployment pattern
    for linear scorers at warehouse scale: coefficients live in a
    (feature, weight) RELATION, features unpivot to long format, and
    the score is a join + grouped dot product — swapping the model is
    a table update, not a code deploy, and scoring N models is one
    more join key. Weights are integer-scaled ({SCORING_SCALE}×), so
    every margin is an exact BIGINT; the decision threshold compares
    integers and only the reported margin divides once.

    Scale: features long-format = |users| × |features| skinny rows;
    the coefficient relation broadcasts; one user-keyed agg —
    identical economics to X105's sparse matmul, specialized to the
    serving shape."""
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.count_distinct(F.to_date("ts")).alias("active_days"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("spend_cents"),
        )
    )
    long = per_user.selectExpr(
        "user_id",
        "stack(4, 'n_events', n_events, 'n_purchases', n_purchases, "
        "'active_days', active_days, 'spend_cents', spend_cents) "
        "AS (feature, x)",
    )
    coef = local_rows_df(spark, 
        SCORING_WEIGHTS, "feature string, w long"
    )
    scored = (
        long.join(F.broadcast(coef), "feature")
        .groupBy("user_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
        .select(
            "user_id",
            (F.col("dot") + SCORING_BIAS).alias("margin_scaled"),
        )
    )
    return scored.select(
        "user_id",
        (F.col("margin_scaled") / F.lit(float(SCORING_SCALE))).alias("margin"),
        (F.col("margin_scaled") > 0).alias("positive_class"),
    )


def _q270_sql() -> str:
    vals = ", ".join(f"('{f}', {w})" for f, w in SCORING_WEIGHTS)
    return f"""
WITH per_user AS (
  SELECT user_id,
         count(*) AS n_events,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS n_purchases,
         count(DISTINCT CAST(ts AS DATE)) AS active_days,
         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS spend_cents
  FROM events GROUP BY user_id
),
long AS (
  SELECT user_id, 'n_events' AS feature, n_events AS x FROM per_user
  UNION ALL
  SELECT user_id, 'n_purchases', n_purchases FROM per_user
  UNION ALL
  SELECT user_id, 'active_days', active_days FROM per_user
  UNION ALL
  SELECT user_id, 'spend_cents', spend_cents FROM per_user
),
coef(feature, w) AS (VALUES {vals}),
scored AS (
  SELECT l.user_id,
         CAST(sum(l.x * c.w) + {SCORING_BIAS} AS BIGINT) AS margin_scaled
  FROM long l JOIN coef c ON c.feature = l.feature
  GROUP BY l.user_id
)
SELECT user_id,
       margin_scaled / {float(SCORING_SCALE)!r} AS margin,
       margin_scaled > 0 AS positive_class
FROM scored
"""


# ------------------------------------------------------------- q271


def q271_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X232: ABC-XYZ inventory matrix — the supply-chain planning
    grid: parts classed by revenue contribution (ABC, X155's
    cumulative-share kernel) × demand variability (XYZ by the
    coefficient of variation of monthly quantities). The CV class
    boundaries (CV < 0.5 → X, < 1.0 → Y, else Z) are evaluated as
    RATIONAL comparisons of exact power sums — n·Σq² − (Σq)² against
    thresholds cross-multiplied onto (Σq)² — so no stddev/sqrt float
    ever decides a class and both engines agree exactly. Output: the
    9-cell matrix with part counts and revenue mass per cell.

    Scale: one (part, month) agg, one part-level power-sum agg, one
    whole-relation cumulative window over |parts| rows for ABC —
    planner-grid cost is independent of lineitem volume."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("mth"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    monthly = li.groupBy("l_partkey", "mth").agg(
        F.sum("qty").alias("q"), F.sum("cents").alias("c")
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum("c").alias("rev"),
    )
    # CV^2 = (n*sqq - sq^2) / sq^2; class by cross-multiplied rationals
    # (CV^2 < 1/4 -> X, < 1 -> Y, else Z).
    var_num = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    xyz = (
        F.when(var_num * 4 < F.col("sq") * F.col("sq"), F.lit("X"))
        .when(var_num < F.col("sq") * F.col("sq"), F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    wcum = Window.partitionBy().orderBy(
        F.desc("rev"), F.asc("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()
    classed = per_part.select(
        "l_partkey",
        "rev",
        xyz.alias("xyz"),
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(wtot).alias("tot"),
    ).select(
        "l_partkey",
        "rev",
        "xyz",
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.sum("rev") / F.lit(100.0)).alias("revenue"),
    )


Q271_SQL = """
WITH li AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mth,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
monthly AS (
  SELECT l_partkey, mth, sum(qty) AS q, sum(cents) AS c
  FROM li GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, count(*) AS n, sum(q) AS sq,
         sum(q * q) AS sqq, sum(c) AS rev
  FROM monthly GROUP BY l_partkey
),
classed AS (
  SELECT l_partkey, rev,
         CASE WHEN (n * sqq - sq * sq) * 4 < sq * sq THEN 'X'
              WHEN (n * sqq - sq * sq) < sq * sq THEN 'Y'
              ELSE 'Z' END AS xyz,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(rev) OVER () AS tot
  FROM per_part
)
SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc,
       xyz,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) / 100.0 AS revenue
FROM classed GROUP BY 1, 2
"""


# ------------------------------------------------------------- q272


def q272_dwell_time_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X233: session dwell-time allocation — "time spent per feature",
    the product-analytics number screens get ranked by: within each
    session (q23's gap kernel), the time until the NEXT event is
    attributed to the CURRENT event's type (last event of a session
    contributes nothing — there is no observed dwell). One user-keyed
    sort serves sessionization AND the lead() lookup; dwell sums are
    exact epoch-microsecond integers.

    Scale: identical shuffle economics to sessionize itself; the
    per-type rollup is a 5-row relation."""
    from product_analytics_spark.operators import windows

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    s = windows.sessionize(ev, gap_minutes=SESSION_GAP_MIN)
    # lead() over the USER window (not (user, session)): session ids
    # are monotone within the user's ts order, so the session boundary
    # is the lead-session inequality — this keeps the lead pass on the
    # exact sort sessionize already produced (ONE user-keyed Exchange
    # serves both, plan-guarded) instead of re-shuffling by session.
    wuser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dwell = s.select(
        "event_type",
        F.when(
            F.lead("session_id").over(wuser) == F.col("session_id"),
            F.unix_micros(F.lead("ts").over(wuser))
            - F.unix_micros(F.col("ts")),
        ).alias("dw_us"),
    ).filter(F.col("dw_us").isNotNull())
    wtot = Window.partitionBy()
    return (
        dwell.groupBy("event_type")
        .agg(
            F.sum("dw_us").alias("dus"),
            F.count(F.lit(1)).cast("bigint").alias("n_dwells"),
        )
        .select(
            "event_type",
            "n_dwells",
            (F.col("dus") / F.lit(3_600_000_000.0)).alias("dwell_hours"),
            (F.col("dus") / F.sum("dus").over(wtot).cast("double")).alias(
                "dwell_share"
            ),
        )
    )


Q272_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
dwell AS (
  SELECT event_type,
         CASE WHEN lead(session_id) OVER w = session_id
              THEN epoch_us(lead(ts) OVER w) - epoch_us(ts) END AS dw_us
  FROM sess
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT event_type, sum(dw_us) AS dus, count(*) AS n_dwells
  FROM dwell WHERE dw_us IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       CAST(n_dwells AS BIGINT) AS n_dwells,
       CAST(dus AS BIGINT) / 3600000000.0 AS dwell_hours,
       CAST(dus AS BIGINT) / CAST(sum(dus) OVER () AS DOUBLE) AS dwell_share
FROM g
"""


# ------------------------------------------------------------- q273

PROMISE_DAYS = {"1": 30, "2": 45, "3": 60, "4": 75, "5": 90}


def q273_on_time_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X234: on-time fulfillment by priority — the operations KPI: a
    delivery promise derived from order priority (priority 1 promises
    {PROMISE_DAYS['1']} days … 5 promises {PROMISE_DAYS['5']}), actual
    completion = the LAST lineitem ship date, on-time = actual within
    promise. Ship dates before the order date (a measured quirk of
    ~20% of synthetic orders) clamp to zero lead — the greatest()
    guard every duration metric here carries. Emits the per-priority
    scorecard: orders, on-time rate, and exact-integer average lead
    days via cross-multiplication-safe sums.

    Scale: one lineitem max-agg keyed on order, one broadcast-joined
    priority scorecard."""
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("odate"),
        F.substring("o_orderpriority", 1, 1).alias("prio"),
    )
    promise = F.create_map(
        *[F.lit(x) for kv in PROMISE_DAYS.items() for x in kv]
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "prio",
        F.greatest(
            F.datediff("last_ship", "odate"), F.lit(0)
        ).alias("lead_days"),
        promise[F.col("prio")].alias("promised"),
    )
    return (
        j.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.when(F.col("lead_days") <= F.col("promised"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("on_time"),
            F.sum("lead_days").cast("bigint").alias("sum_lead_days"),
        )
        .select(
            "prio",
            "n_orders",
            "on_time",
            (F.col("on_time") / F.col("n_orders").cast("double")).alias(
                "on_time_rate"
            ),
            (F.col("sum_lead_days") / F.col("n_orders").cast("double")).alias(
                "avg_lead_days"
            ),
        )
    )


def _q273_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in PROMISE_DAYS.items()
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT substr(o.o_orderpriority, 1, 1) AS prio,
         greatest(CAST(li.last_ship - CAST(o.o_orderdate AS DATE)
                       AS BIGINT), 0) AS lead_days,
         CASE substr(o.o_orderpriority, 1, 1) {whens} END AS promised
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN lead_days <= promised THEN 1 ELSE 0 END) AS BIGINT)
         AS on_time,
       CAST(sum(CASE WHEN lead_days <= promised THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(count(*) AS DOUBLE) AS on_time_rate,
       CAST(sum(lead_days) AS BIGINT) / CAST(count(*) AS DOUBLE)
         AS avg_lead_days
FROM j GROUP BY prio
"""


QUERIES_EXT38 = {
    "q270_batch_model_scoring": q270_batch_model_scoring,
    "q271_abc_xyz_matrix": q271_abc_xyz_matrix,
    "q272_dwell_time_allocation": q272_dwell_time_allocation,
    "q273_on_time_fulfillment": q273_on_time_fulfillment,
}


def _oracles_ext38() -> dict[str, str]:
    return {
        "q270_batch_model_scoring": _q270_sql(),
        "q271_abc_xyz_matrix": Q271_SQL,
        "q272_dwell_time_allocation": Q272_SQL,
        "q273_on_time_fulfillment": _q273_sql(),
    }
