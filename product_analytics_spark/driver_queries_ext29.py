"""Round-4 driver query families, batch 29 (q234-q237): incremental
sessionization, right-to-be-forgotten cascade, backfill planner, and
join-cardinality estimator audit.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import EVENTS_CUT, SESSION_GAP_MIN, _t

# ------------------------------------------------------------- q234


def q234_incremental_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X197: incremental sessionization — the stateful-batch refresh
    problem sessions create: a new event can EXTEND or MERGE an
    existing session, so naive "sessionize the delta" is wrong at the
    batch boundary. The incremental contract implemented here: split
    at the snapshot cut, find the AFFECTED users (any user in the
    delta), recompute sessions from full history for those users
    only, and carry the prior snapshot's sessions untouched for
    everyone else. The union must equal a from-scratch sessionization
    of all events — the oracle states exactly that full recompute, so
    the driver's value gate IS the incremental≡full property (the
    q13/q17 discipline applied to a windowed operator).

    Scale: the delta decides the work; unaffected users' sessions are
    carried as stored rows (read, not recomputed). Affected users'
    history re-read is user-keyed and partition-prunable when the
    event store is bucketed by user — the honest cost note: session
    state cannot be refreshed from the delta alone, history tail
    access is part of the operator's contract."""
    from product_analytics_spark.operators import windows

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    cut = F.lit(EVENTS_CUT.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    hist = ev.filter(F.col("ts") < cut)
    delta = ev.filter(F.col("ts") >= cut)

    def roll(sessions: DataFrame) -> DataFrame:
        return sessions.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    prev_snapshot = roll(
        windows.sessionize(hist, gap_minutes=SESSION_GAP_MIN)
    )
    affected = delta.select("user_id").distinct()
    recomputed = roll(
        windows.sessionize(
            ev.join(F.broadcast(affected), "user_id"),
            gap_minutes=SESSION_GAP_MIN,
        )
    )
    carried = prev_snapshot.join(
        F.broadcast(affected), "user_id", "left_anti"
    )
    return carried.unionByName(recomputed).select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        "session_start",
        "session_end",
        F.col("n_events").cast("bigint").alias("n_events"),
        "total_value",
    )


Q234_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, session_id
"""


# ------------------------------------------------------------- q235

RTBF_MOD, RTBF_REM = 17, 3


def q235_rtbf_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X198: right-to-be-forgotten cascade — the GDPR erasure job as a
    relational cascade: a deterministic forget-set of customers
    (custkey ≡ {RTBF_REM} mod {RTBF_MOD}) must disappear from the
    customer table AND transitively from orders (via custkey) and
    lineitem (via the orders being erased — a 2-hop referential
    cascade). Emits the erasure-certificate audit per table: total
    rows, purged rows, retained rows, and retained+purged==total (the
    conservation check an auditor actually verifies). Purges are
    anti-joins — the retained relation is what gets rewritten;
    tombstones are the purged keys, counted here.

    Scale: each hop is one key equi-join (forget-set broadcastable);
    lineitem never joins customer directly — the cascade chains
    through orders so each table joins only its parent's keys. In a
    lakehouse the rewrite targets only files containing purged keys
    (zone-map pruned, q216's math); the audit is the same counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    forget = c.filter(
        F.col("c_custkey") % RTBF_MOD == RTBF_REM
    ).select("c_custkey")
    purged_orders = o.join(
        F.broadcast(forget), o.o_custkey == forget.c_custkey
    ).select("o_orderkey")

    def audit(name: str, df: DataFrame, purged: DataFrame, key: str) -> DataFrame:
        flagged = df.join(
            F.broadcast(purged.withColumnRenamed(purged.columns[0], "_pk")),
            F.col(key) == F.col("_pk"),
            "left",
        )
        return flagged.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("_pk").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("purged"),
            F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("retained"),
        )

    out = (
        audit("customer", c, forget, "c_custkey")
        .unionByName(audit("orders", o, forget, "o_custkey"))
        .unionByName(audit("lineitem", li, purged_orders, "l_orderkey"))
    )
    return out.select(
        "table_name",
        "n_rows",
        "purged",
        "retained",
        (F.col("purged") + F.col("retained") == F.col("n_rows")).alias(
            "conserved"
        ),
    )


Q235_SQL = f"""
WITH forget AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {RTBF_MOD} = {RTBF_REM}
),
purged_orders AS (
  SELECT o.o_orderkey FROM orders o
  JOIN forget f ON f.c_custkey = o.o_custkey
),
audits AS (
  SELECT 'customer' AS table_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN f.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS purged,
         CAST(sum(CASE WHEN f.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS retained
  FROM customer c LEFT JOIN forget f ON f.c_custkey = c.c_custkey
  UNION ALL
  SELECT 'orders',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN f.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT),
         CAST(sum(CASE WHEN f.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN forget f ON f.c_custkey = o.o_custkey
  UNION ALL
  SELECT 'lineitem',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT),
         CAST(sum(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN purged_orders p ON p.o_orderkey = l.l_orderkey
)
SELECT table_name, n_rows, purged, retained,
       purged + retained = n_rows AS conserved
FROM audits
"""


# ------------------------------------------------------------- q236

BF_PROCESSED_THROUGH = (1997, 2)  # (year, month) last fully processed
BF_LATE_MOD = 50  # simulate late rows: every 50th key missed


def q236_backfill_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X199: backfill planner — the warehouse-ops job that decides
    WHICH partitions to rebuild before any data moves: compare the
    source's per-partition row counts against the processed
    snapshot's. Partitions after the processed-through watermark are
    MISSING; processed partitions whose source count disagrees (the
    simulated 2% late-arriving rows) are STALE; the rest are OK. The
    plan ranks rebuild work by missing-row mass — the priority order
    a capacity-bounded backfill queue consumes.

    The processed state is simulated deterministically (watermark
    {BF_PROCESSED_THROUGH}, every {BF_LATE_MOD}th order late), so
    both engines derive the identical plan from the raw table.

    Scale: both sides are partition-grain counts — metadata-sized
    relations; the planner never touches row data beyond one
    aggregation, and at 100 TB the source counts come from partition
    stats, not a scan."""
    yr, mo = BF_PROCESSED_THROUGH
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        "o_orderkey",
    )
    src = o.groupBy("y", "m").agg(F.count(F.lit(1)).alias("source_rows"))
    processed = (
        o.filter(
            (F.col("y") < yr) | ((F.col("y") == yr) & (F.col("m") <= mo))
        )
        .filter(F.col("o_orderkey") % BF_LATE_MOD != 0)
        .groupBy("y", "m")
        .agg(F.count(F.lit(1)).alias("processed_rows"))
    )
    j = src.join(processed, ["y", "m"], "left").select(
        "y",
        "m",
        "source_rows",
        F.coalesce("processed_rows", F.lit(0)).alias("processed_rows"),
    )
    planned = j.select(
        F.col("y").cast("int").alias("y"),
        F.col("m").cast("int").alias("m"),
        F.col("source_rows").cast("bigint").alias("source_rows"),
        F.col("processed_rows").cast("bigint").alias("processed_rows"),
        (F.col("source_rows") - F.col("processed_rows"))
        .cast("bigint")
        .alias("missing_rows"),
        F.when(F.col("processed_rows") == 0, F.lit("missing"))
        .when(F.col("source_rows") != F.col("processed_rows"), F.lit("stale"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
    return planned.filter(F.col("status") != "ok")


Q236_SQL = f"""
WITH o AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS y,
         month(CAST(o_orderdate AS DATE)) AS m,
         o_orderkey
  FROM orders
),
src AS (SELECT y, m, count(*) AS source_rows FROM o GROUP BY y, m),
processed AS (
  SELECT y, m, count(*) AS processed_rows
  FROM o
  WHERE (y < {BF_PROCESSED_THROUGH[0]}
         OR (y = {BF_PROCESSED_THROUGH[0]} AND m <= {BF_PROCESSED_THROUGH[1]}))
    AND o_orderkey % {BF_LATE_MOD} <> 0
  GROUP BY y, m
),
planned AS (
  SELECT CAST(s.y AS INT) AS y, CAST(s.m AS INT) AS m,
         CAST(s.source_rows AS BIGINT) AS source_rows,
         CAST(coalesce(p.processed_rows, 0) AS BIGINT) AS processed_rows,
         CAST(s.source_rows - coalesce(p.processed_rows, 0) AS BIGINT)
           AS missing_rows,
         CASE WHEN coalesce(p.processed_rows, 0) = 0 THEN 'missing'
              WHEN s.source_rows <> p.processed_rows THEN 'stale'
              ELSE 'ok' END AS status
  FROM src s LEFT JOIN processed p ON p.y = s.y AND p.m = s.m
)
SELECT * FROM planned WHERE status <> 'ok'
"""


# ------------------------------------------------------------- q237


def q237_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X200: join-cardinality estimator audit — the optimizer-
    statistics lesson run as a query: for two self-equi-joins
    (orders on o_custkey, events on user_id), compare the TRUE join
    size (Σₖ c(k)² — computed from the key histogram without running
    the join) against the textbook independence estimate
    |R|·|S| / max(ndv) every cost-based optimizer starts from. The
    error ratio is exactly the skew of the key distribution — uniform
    keys estimate well, skewed keys explode — which is why join-size
    misestimates cascade into wrong join orders at 100 TB and why
    engines keep per-key histograms (or AQE re-plans at runtime)
    rather than trusting ndv alone.

    All sizes exact integers from one groupBy per relation; ratios
    final doubles.

    Scale: the audit is O(ndv) per relation — histogram-sized, the
    same statistics ANALYZE (q194/q161's sweep) already collects."""

    def scenario(name: str, df: DataFrame, key: str) -> DataFrame:
        hist = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        return hist.agg(
            F.lit(name).alias("scenario"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("ndv"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("true_join_size"),
            F.expr("CAST(sum(c) * sum(c) div count(*) AS BIGINT)").alias(
                "independence_estimate"
            ),
            F.max("c").cast("bigint").alias("max_key_freq"),
        )

    out = scenario(
        "orders_selfjoin_custkey",
        _t(spark, sf_dir, "orders").select("o_custkey"),
        "o_custkey",
    ).unionByName(
        scenario(
            "events_selfjoin_user",
            _t(spark, sf_dir, "events").select("user_id"),
            "user_id",
        )
    )
    return out.select(
        "scenario",
        "n_rows",
        "ndv",
        "true_join_size",
        "independence_estimate",
        "max_key_freq",
        (F.col("true_join_size") / F.col("independence_estimate")).alias(
            "underestimate_factor"
        ),
    )


Q237_SQL = """
WITH oh AS (
  SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY o_custkey
),
eh AS (
  SELECT user_id AS k, count(*) AS c FROM events GROUP BY user_id
),
audits AS (
  SELECT 'orders_selfjoin_custkey' AS scenario,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS ndv,
         CAST(sum(c * c) AS BIGINT) AS true_join_size,
         CAST(sum(c) * sum(c) // count(*) AS BIGINT) AS independence_estimate,
         CAST(max(c) AS BIGINT) AS max_key_freq
  FROM oh
  UNION ALL
  SELECT 'events_selfjoin_user',
         CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(c * c) AS BIGINT),
         CAST(sum(c) * sum(c) // count(*) AS BIGINT),
         CAST(max(c) AS BIGINT)
  FROM eh
)
SELECT scenario, n_rows, ndv, true_join_size, independence_estimate,
       max_key_freq,
       true_join_size / CAST(independence_estimate AS DOUBLE)
         AS underestimate_factor
FROM audits
"""


QUERIES_EXT29 = {
    "q234_incremental_sessionize": q234_incremental_sessionize,
    "q235_rtbf_cascade": q235_rtbf_cascade,
    "q236_backfill_planner": q236_backfill_planner,
    "q237_join_cardinality_audit": q237_join_cardinality_audit,
}


def _oracles_ext29() -> dict[str, str]:
    return {
        "q234_incremental_sessionize": Q234_SQL,
        "q235_rtbf_cascade": Q235_SQL,
        "q236_backfill_planner": Q236_SQL,
        "q237_join_cardinality_audit": Q237_SQL,
    }
