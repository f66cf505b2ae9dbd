"""Round-3 driver query families, batch 6 (q160+): schema-wide
referential-integrity audit, golden-record survivorship (MDM), packed
activity bitmaps, integer-exact U-shaped multi-touch attribution, and
a binned distribution-drift monitor.

Same contract as the other driver_queries modules: portable hashing,
exact integer arithmetic, fixed-order IEEE finishes, DuckDB oracle
per query.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.operators import stats
from product_analytics_spark.qcommon import (
    _cents_out,
    _money_cents,
    _t,
)

# ------------------------------------------------------------- q160

FK_EDGES = [
    # (edge name, child table, child key, parent table, parent key)
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def q160_fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide referential-integrity + coverage audit: one row per
    FK edge with child row/key counts, orphan rows (child keys with no
    parent), parent key count, referenced-parent count, and parent
    coverage. The dbt-style relationship test (reference models declare
    these edges implicitly via their joins) generalized into a single
    audit relation.

    Plan per edge: child side collapses to per-key counts FIRST (the
    shuffle moves |distinct keys| longs, not rows), then a full-outer
    join against the distinct parent keys — dim-sized for most edges,
    so AQE broadcasts it; the audit never carries payload columns. At
    100 TB this is the nightly FK health job: each edge is independent
    and the 8 subplans run concurrently in one action."""
    parts = []
    for name, child, ck, parent, pk in FK_EDGES:
        c = (
            _t(spark, sf_dir, child)
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        p = (
            _t(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("pex", F.lit(1))
        )
        j = c.join(p, "k", "full_outer")
        ref = F.count(F.when(F.col("pex").isNotNull() & F.col("cnt").isNotNull(), 1))
        parts.append(
            j.agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_child_rows"),
                F.count("cnt").alias("n_child_keys"),
                F.coalesce(F.sum(F.when(F.col("pex").isNull(), F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_orphan_rows"),
                F.count("pex").alias("n_parent_keys"),
                ref.alias("n_referenced"),
                F.round(ref / F.count("pex").cast("double"), 6).alias(
                    "parent_coverage"
                ),
            ).select(F.lit(name).alias("fk_edge"), "*")
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


def _q160_sql() -> str:
    selects = []
    for name, child, ck, parent, pk in FK_EDGES:
        selects.append(f"""
SELECT '{name}' AS fk_edge,
       CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_child_rows,
       count(cnt) AS n_child_keys,
       CAST(coalesce(sum(CASE WHEN pex IS NULL THEN cnt END), 0) AS BIGINT)
         AS n_orphan_rows,
       count(pex) AS n_parent_keys,
       count(CASE WHEN pex IS NOT NULL AND cnt IS NOT NULL THEN 1 END)
         AS n_referenced,
       round(count(CASE WHEN pex IS NOT NULL AND cnt IS NOT NULL THEN 1 END)
             / CAST(count(pex) AS DOUBLE), 6) AS parent_coverage
FROM (SELECT {ck} AS k, count(*) AS cnt FROM {child} GROUP BY 1) c
FULL JOIN (SELECT DISTINCT {pk} AS k, 1 AS pex FROM {parent}) p USING (k)""")
    return "\nUNION ALL\n".join(selects)


# ------------------------------------------------------------- q161

def q161_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (master-data-management merge): one
    consolidated record per customer from their order history, each
    field by its own survivorship rule — latest-wins for status
    (recency window), most-frequent-wins for priority (mode with
    deterministic tie-break), extrema for totals/dates.

    Three per-customer passes that all shuffle on the same key (one
    hash partitioning reused): a recency window (rank-1 filter), the
    two-level mode aggregation (operators/stats.py:mode_per_group —
    the shuffle carries distinct (customer, priority) pairs), and a
    plain min/max agg; the final assembly joins |customers|-row
    relations."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        _money_cents("o_totalprice").alias("c"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", F.col("o_orderstatus").alias("latest_status"))
    )
    pref = stats.mode_per_group(o, ["o_custkey"], "o_orderpriority").select(
        "o_custkey",
        F.col("mode_value").alias("preferred_priority"),
        F.col("mode_count").alias("priority_support"),
    )
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _cents_out(F.max("c")).alias("max_total"),
        F.min("o_orderdate").alias("first_order_date"),
    )
    return agg.join(latest, "o_custkey").join(pref, "o_custkey")


Q161_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderstatus, o_orderpriority,
         CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders
),
latest AS (
  SELECT o_custkey, o_orderstatus AS latest_status
  FROM (SELECT o_custkey, o_orderstatus,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM o)
  WHERE rn = 1
),
pref AS (
  SELECT o_custkey, o_orderpriority AS preferred_priority,
         n AS priority_support
  FROM (SELECT o_custkey, o_orderpriority, count(*) AS n,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
        FROM o GROUP BY 1, 2)
  WHERE rn = 1
),
agg AS (
  SELECT o_custkey, count(*) AS n_orders,
         max(c) / 100.0 AS max_total,
         min(o_orderdate) AS first_order_date
  FROM o GROUP BY 1
)
SELECT a.o_custkey, a.n_orders, a.max_total, a.first_order_date,
       l.latest_status, p.preferred_priority, p.priority_support
FROM agg a JOIN latest l USING (o_custkey) JOIN pref p USING (o_custkey)
"""


# ------------------------------------------------------------- q162

BITMAP_EPOCH = dt.date(2024, 1, 1)
WEEK1_MASK = (1 << 7) - 1                      # days 0..6
WK4_MASK = ((1 << 30) - 1) ^ ((1 << 21) - 1)   # days 21..29


def q162_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed activity bitmaps — the roaring-bitmap-style rollup for
    engagement metrics: each user's 30-day activity folds into ONE
    64-bit mask (bit i = any event on epoch day i) via a bit_or
    aggregate, then day counts and cohort flags are bit_count / mask
    tests — no per-day rows, no distinct-day shuffle. At 100 TB the
    masks are the stored per-user state (8 bytes/user/month); DAU/WAU/
    retention re-aggregate the masks without touching raw events, and
    longer horizons chain one mask per month."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(BITMAP_EPOCH)).alias("day_idx"),
    )
    m = (
        e.select("user_id", F.expr("shiftleft(CAST(1 AS BIGINT), day_idx)").alias("b"))
        .groupBy("user_id")
        .agg(F.bit_or("b").alias("activity_mask"))
    )
    mask = F.col("activity_mask")
    return m.select(
        "user_id",
        "activity_mask",
        F.bit_count(mask).cast("bigint").alias("n_active_days"),
        (mask.bitwiseAND(F.lit(WEEK1_MASK)) != 0).alias("active_week1"),
        (mask.bitwiseAND(F.lit(WK4_MASK)) != 0).alias("active_week4"),
    )


Q162_SQL = f"""
WITH e AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
  FROM events
),
m AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << day_idx) AS activity_mask
  FROM e GROUP BY 1
)
SELECT user_id, activity_mask,
       CAST(bit_count(activity_mask) AS BIGINT) AS n_active_days,
       (activity_mask & {WEEK1_MASK}) <> 0 AS active_week1,
       (activity_mask & {WK4_MASK}) <> 0 AS active_week4
FROM m
"""


# ------------------------------------------------------------- q163

ATTRIB_WINDOW_DAYS = 7


def q163_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution with
    INTEGER-EXACT credit: each purchase's revenue cents split 40% to
    the first touch, 40% to the last, the remaining 20% equally across
    middle touches — all shares computed by integer division with the
    remainder assigned to the first touch, so per-purchase credits sum
    to the purchase EXACTLY (conservation is an identity, not a float
    approximation) and channel sums are order-independent.

    Plan: purchases x prior-touches is the keyed interval join (equi
    on user + time-range residual — per-user fan-out is journey-sized,
    not data-sized), position/cardinality from one purchase-keyed
    window, then a |channels|-row agg. Touchless purchases credit a
    'direct' channel, so total credited revenue == total purchase
    revenue — the invariant the unit test asserts."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        _money_cents("value").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel_raw"),
    )
    j = p.join(
        t,
        (F.col("pu") == F.col("tu"))
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")),
        "left",
    )
    wp = Window.partitionBy("pid")
    wo = wp.orderBy("tts", "tid")
    j = j.select(
        "pid",
        "cents",
        "tid",
        "channel_raw",
        F.row_number().over(wo).alias("rn"),
        F.count("tid").over(wp).alias("k"),
    )
    credit = F.expr(
        """CASE
             WHEN tid IS NULL THEN cents
             WHEN k = 1 THEN cents
             WHEN k = 2 AND rn = 1 THEN cents - cents div 2
             WHEN k = 2 THEN cents div 2
             WHEN rn = 1 THEN (cents * 2) div 5
                  + ((cents - 2 * ((cents * 2) div 5))
                     - ((cents - 2 * ((cents * 2) div 5)) div (k - 2)) * (k - 2))
             WHEN rn = k THEN (cents * 2) div 5
             ELSE (cents - 2 * ((cents * 2) div 5)) div (k - 2)
           END"""
    )
    return (
        j.select(
            F.coalesce(F.col("channel_raw"), F.lit("direct")).alias("channel"),
            F.col("tid"),
            credit.alias("credit"),
        )
        .groupBy("channel")
        .agg(
            F.count("tid").alias("n_touches"),
            _cents_out(F.sum("credit")).alias("credited_revenue"),
        )
    )


def _q163_sql() -> str:
    return f"""
WITH p AS (
  SELECT event_id AS pid, user_id AS pu, CAST(ts AS TIMESTAMP) AS pts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS tid, user_id AS tu, CAST(ts AS TIMESTAMP) AS tts,
         event_type AS channel_raw
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.pid, p.cents, t.tid, t.channel_raw,
         row_number() OVER (PARTITION BY p.pid ORDER BY t.tts, t.tid) AS rn,
         count(t.tid) OVER (PARTITION BY p.pid) AS k
  FROM p LEFT JOIN t
    ON t.tu = p.pu AND t.tts <= p.pts
   AND t.tts > p.pts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
),
c AS (
  SELECT coalesce(channel_raw, 'direct') AS channel, tid,
         CASE
           WHEN tid IS NULL THEN cents
           WHEN k = 1 THEN cents
           WHEN k = 2 AND rn = 1 THEN cents - cents // 2
           WHEN k = 2 THEN cents // 2
           WHEN rn = 1 THEN (cents * 2) // 5
                + ((cents - 2 * ((cents * 2) // 5))
                   - ((cents - 2 * ((cents * 2) // 5)) // (k - 2)) * (k - 2))
           WHEN rn = k THEN (cents * 2) // 5
           ELSE (cents - 2 * ((cents * 2) // 5)) // (k - 2)
         END AS credit
  FROM j
)
SELECT channel,
       count(tid) AS n_touches,
       CAST(sum(credit) AS BIGINT) / 100.0 AS credited_revenue
FROM c GROUP BY 1
"""


# ------------------------------------------------------------- q164

DRIFT_CUT = dt.datetime(1998, 1, 1)
DRIFT_BIN_CENTS = 5_000_000  # $50k equi-width bins


def q164_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (train/serve or pre/post skew
    check): order totals binned into fixed $50k equi-width bins, the
    pre- and post-cutoff populations' per-bin shares compared via
    total-variation distance and a chi-square-style drift score — both
    RATIONAL functions of integer counts (no libm ln as in PSI, which
    two engines may round differently; see q59's log-free idf for the
    same discipline). Fixed bin edges mean no quantile pre-pass: one
    conditional 2-count hash-agg on the bin key, then window totals
    over the |bins|-row relation. At 100 TB the per-bin count state is
    mergeable across days, so the monitor is an incremental rollup."""
    o = _t(spark, sf_dir, "orders").select(
        _money_cents("o_totalprice").alias("cents"),
        (F.col("o_orderdate") < F.lit(DRIFT_CUT)).alias("pre"),
    ).select(
        F.expr(f"cents div {DRIFT_BIN_CENTS}").alias("bin"), "pre"
    )
    g = o.groupBy("bin").agg(
        F.sum(F.when(F.col("pre"), 1).otherwise(0)).alias("n_pre"),
        F.sum(F.when(~F.col("pre"), 1).otherwise(0)).alias("n_post"),
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = F.sum("n_pre").over(w).cast("double")
    tq = F.sum("n_post").over(w).cast("double")
    share_pre = F.col("n_pre").cast("double") / tp
    share_post = F.col("n_post").cast("double") / tq
    adiff = F.abs(share_pre - share_post)
    chi = F.when(
        (F.col("n_pre") + F.col("n_post")) > 0,
        (share_pre - share_post)
        * (share_pre - share_post)
        / (share_pre + share_post),
    ).otherwise(F.lit(0.0))
    return g.select(
        "bin",
        F.col("n_pre").cast("bigint").alias("n_pre"),
        F.col("n_post").cast("bigint").alias("n_post"),
        F.round(share_pre, 6).alias("share_pre"),
        F.round(share_post, 6).alias("share_post"),
        F.round(F.lit(0.5) * F.sum(adiff).over(w), 6).alias("tv_distance"),
        F.round(chi, 6).alias("chi2_term"),
    )


def _q164_sql() -> str:
    return f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // {DRIFT_BIN_CENTS} AS bin,
         o_orderdate < TIMESTAMP '1998-01-01' AS pre
  FROM orders
),
g AS (
  SELECT bin,
         sum(CASE WHEN pre THEN 1 ELSE 0 END) AS n_pre,
         sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) AS n_post
  FROM o GROUP BY 1
),
s AS (
  SELECT bin, n_pre, n_post,
         CAST(n_pre AS DOUBLE) / CAST(sum(n_pre) OVER () AS DOUBLE) AS sp,
         CAST(n_post AS DOUBLE) / CAST(sum(n_post) OVER () AS DOUBLE) AS sq
  FROM g
)
SELECT bin,
       CAST(n_pre AS BIGINT) AS n_pre,
       CAST(n_post AS BIGINT) AS n_post,
       round(sp, 6) AS share_pre,
       round(sq, 6) AS share_post,
       round(0.5 * sum(abs(sp - sq)) OVER (), 6) AS tv_distance,
       round(CASE WHEN n_pre + n_post > 0
             THEN (sp - sq) * (sp - sq) / (sp + sq) ELSE 0.0 END, 6) AS chi2_term
FROM s
"""


QUERIES_EXT7 = {
    "q160_fk_integrity_report": q160_fk_integrity_report,
    "q161_golden_record": q161_golden_record,
    "q162_activity_bitmap": q162_activity_bitmap,
    "q163_ushape_attribution": q163_ushape_attribution,
    "q164_drift_monitor": q164_drift_monitor,
}

ORACLES_EXT7 = {
    "q160_fk_integrity_report": _q160_sql(),
    "q161_golden_record": Q161_SQL,
    "q162_activity_bitmap": Q162_SQL,
    "q163_ushape_attribution": _q163_sql(),
    "q164_drift_monitor": _q164_sql(),
}
