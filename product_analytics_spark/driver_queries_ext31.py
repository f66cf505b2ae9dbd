"""Round-4 driver query families, batch 31 (q242-q245): l-diversity,
time-respecting graph reachability, streaming update-mode parity, and
row-level security policy views.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t, local_rows_df

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------- q242

LDIV_L = 3


def q242_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X205: l-diversity audit — k-anonymity's (q230) necessary
    sequel: a class can hold ≥k members yet still leak if they all
    share the SENSITIVE value (the homogeneity attack k-anonymity
    misses). Under QIs (nation, account-balance band) with
    c_mktsegment as the sensitive attribute, every class must carry
    at least l={LDIV_L} DISTINCT segments. Emits per-class rows for
    the violating classes (the worklist a generalization pass
    consumes) — class QIs, size, distinct sensitive values, and the
    dominant segment's share (the homogeneity that makes the leak).

    Scale: one (QI, sensitive) agg then one QI agg — both hash aggs;
    the violating-class relation is small by nature (big diverse
    classes are the healthy ones)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        # floor (not truncate) on possibly-NEGATIVE balances, via exact
        # double floor (the q226 idiom) — Spark `div` truncates while
        # DuckDB `//` floors, and the two differ below zero.
        F.expr(
            "CAST(FLOOR(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " / 100000.0) AS BIGINT)"
        ).alias("bal_band"),
        "c_mktsegment",
    )
    per_sens = c.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_class = per_sens.groupBy("c_nationkey", "bal_band").agg(
        F.sum("cnt").alias("class_size"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("cnt").alias("dominant_cnt"),
    )
    return (
        per_class.filter(F.col("l_distinct") < LDIV_L)
        .select(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            "bal_band",
            F.col("class_size").cast("bigint").alias("class_size"),
            F.col("l_distinct").cast("bigint").alias("l_distinct"),
            (F.col("dominant_cnt") / F.col("class_size")).alias(
                "dominant_share"
            ),
        )
    )


Q242_SQL = f"""
WITH c AS (
  SELECT c_nationkey,
         CAST(FLOOR(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    / 100000.0) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
),
per_sens AS (
  SELECT c_nationkey, bal_band, c_mktsegment, count(*) AS cnt
  FROM c GROUP BY 1, 2, 3
),
per_class AS (
  SELECT c_nationkey, bal_band,
         sum(cnt) AS class_size,
         count(*) AS l_distinct,
         max(cnt) AS dominant_cnt
  FROM per_sens GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, bal_band,
       CAST(class_size AS BIGINT) AS class_size,
       CAST(l_distinct AS BIGINT) AS l_distinct,
       dominant_cnt / CAST(class_size AS DOUBLE) AS dominant_share
FROM per_class WHERE l_distinct < {LDIV_L}
"""


# ------------------------------------------------------------- q243

TR_HOPS = 3


def q243_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X206: time-respecting reachability — static reachability (q123)
    lies about processes that FLOW over a network: infection,
    information, money can only traverse edges in increasing time
    order. Contact edges are users co-active in the same (hour,
    event_type) cell; from the minimum user, BFS expands only along
    edges whose timestamp is ≥ the time at which the frontier reached
    the source endpoint — each round is one join with the temporal
    guard, folded by min-arrival-time (min-plus on arrival times).
    Emits each reached user with hop count and earliest arrival hour.

    The oracle resolves the identical temporal closure with a bounded
    recursive CTE carrying (user, arrival) state.

    Scale: state is (user, arrival-hour) — 16 bytes; the temporal
    guard PRUNES the expansion (old edges can't fire), so rounds
    shrink over time instead of exploding — the property that makes
    temporal BFS cheaper than static BFS on long histories."""
    # Contact graph restricted to ONE event class (purchases): the
    # co-activity self-join is quadratic per (hour, type) cell, and
    # one class carries the same semantics at 1/|types| the edge mass.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
        ).cast("bigint").alias("hr"),
    )
    cells = ev.distinct()
    e = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("src"),
            F.col("b.user_id").alias("dst"),
            F.col("a.hr").alias("ehr"),
        )
        .persist()
    )
    try:
        src = cells.agg(F.min("user_id").alias("id"))
        reached = src.select(
            "id", F.lit(0).cast("bigint").alias("arr"), F.lit(0).alias("hops")
        )
        # State keys on (id, arrival): (arr, hops) pairs are Pareto-
        # incomparable — an earlier arrival opens more future edges, a
        # shorter path gives the better hop count — so folding to one
        # row per id would lose valid temporal paths. Same-key rows
        # fold to min hops (identical future reachability).
        for _k in range(TR_HOPS):
            nxt = (
                e.join(reached, e.src == reached.id)
                .filter(F.col("ehr") >= F.col("arr"))
                .select(
                    F.col("dst").alias("id"),
                    F.col("ehr").alias("arr"),
                    (F.col("hops") + 1).alias("hops"),
                )
            )
            reached = (
                reached.unionByName(nxt)
                .groupBy("id", "arr")
                .agg(F.min("hops").alias("hops"))
                .localCheckpoint(eager=True)
            )
        return (
            reached.groupBy("id")
            .agg(F.min("arr").alias("arr"), F.min("hops").alias("hops"))
            .select(
                F.col("id").cast("bigint").alias("user_id"),
                F.col("arr").cast("bigint").alias("arrival_hr"),
                F.col("hops").cast("int").alias("hops"),
            )
        )
    finally:
        e.unpersist()


Q243_SQL = f"""
WITH RECURSIVE cells AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hr
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT a.user_id AS src, b.user_id AS dst, a.hr AS ehr
  FROM cells a JOIN cells b
    ON b.hr = a.hr AND b.user_id <> a.user_id
),
src AS (SELECT min(user_id) AS id FROM cells),
walk(id, arr, hops) AS (
  SELECT id, CAST(0 AS BIGINT), 0 FROM src
  UNION
  SELECT e.dst, e.ehr, w.hops + 1
  FROM walk w JOIN e ON e.src = w.id
  WHERE e.ehr >= w.arr AND w.hops < {TR_HOPS}
)
SELECT CAST(id AS BIGINT) AS user_id,
       CAST(min(arr) AS BIGINT) AS arrival_hr,
       CAST(min(hops) AS INT) AS hops
FROM walk GROUP BY id
"""


# ------------------------------------------------------------- q244

Q244_LAND = os.path.join(_REPO, ".fixtures", ".q244_stream_land")


def q244_update_mode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver evidence: UPDATE output mode — the third output
    mode measured (q113 complete, q201 append): an aggregation in
    update mode re-emits a group EVERY time a micro-batch changes it,
    so the memory sink accumulates multiple versions per key and the
    consumer owns the upsert. Two chronological file batches produce
    exactly that version history; the query upserts by (key, max
    emission order) — and the result must equal the one-shot batch
    aggregation, which is what the oracle states. This is the
    contract every update-mode consumer (Kafka compacted topic, KV
    store) implements.

    Scale: update mode ships deltas, not the full state (complete
    mode's cost) and not late finalization (append's latency) — the
    mode of choice for continuously-served aggregates; state is the
    running per-key aggregate, watermark-bounded."""
    from product_analytics_spark.qcommon import land_once
    from product_analytics_spark.streaming import ops as st

    def _land() -> None:
        ev = _t(spark, sf_dir, "events").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        cut = F.lit("2024-01-15").cast("timestamp")
        ev.filter(F.col("ts") < cut).repartition(1).write.mode("append").parquet(
            Q244_LAND
        )
        ev.filter(F.col("ts") >= cut).repartition(1).write.mode("append").parquet(
            Q244_LAND
        )

    land_once(Q244_LAND, sf_dir, _land)
    schema = spark.read.parquet(Q244_LAND).schema
    stream = (
        st.stream_table(spark, Q244_LAND, schema, max_files_per_trigger=1)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("q244_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("q244 stream did not drain in 300s")
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # The sink holds one row per (key, emitting batch) — the consumer
    # upsert: keep the row with the highest event count per key (counts
    # are monotone under update-mode re-emission of a grow-only agg).
    sink = spark.table("q244_sink")
    wlast = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", F.col("n_events").cast("bigint").alias("n_events")
        )
    )


Q244_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


# ------------------------------------------------------------- q245

RLS_PRINCIPALS = [("emea_analyst", 0), ("apac_analyst", 2)]


def q245_rls_policy_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X207: row-level security + column masking as a governed view —
    the policy layer applied RELATIONALLY, not in app code: a policy
    table maps each principal to the region it may see; the secured
    view semi-joins facts to the caller's policy rows (row filter) and
    masks the PII column (customer name → md5 token) unless the
    principal holds the unmask grant. Emits, per principal, the
    audit a policy engine must produce: visible rows, distinct
    visible nations, and proof rows are the SAME relation a direct
    filter yields (the policy is data, so this query evaluates BOTH
    principals in one pass via a policy join — no per-principal
    rescan).

    Scale: the policy table is broadcast; the row filter becomes a
    partition-prunable predicate when the fact is region-partitioned;
    masking is a map-side expression — governance costs one join."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    policy = local_rows_df(spark, 
        [(p, r) for p, r in RLS_PRINCIPALS],
        "principal string, region_key int",
    )
    secured = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(policy),
            F.col("n_regionkey") == F.col("region_key"),
        )
        .select(
            "principal",
            "c_custkey",
            "c_nationkey",
            F.md5("c_name").alias("masked_name"),
        )
    )
    return secured.groupBy("principal").agg(
        F.count(F.lit(1)).cast("bigint").alias("visible_rows"),
        F.count_distinct("c_nationkey").cast("bigint").alias("visible_nations"),
        F.count_distinct("masked_name")
        .cast("bigint")
        .alias("distinct_masked_names"),
    )


def _q245_sql() -> str:
    vals = ", ".join(f"('{p}', {r})" for p, r in RLS_PRINCIPALS)
    return f"""
WITH policy(principal, region_key) AS (VALUES {vals}),
secured AS (
  SELECT p.principal, c.c_custkey, c.c_nationkey, md5(c.c_name) AS masked_name
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN policy p ON p.region_key = n.n_regionkey
)
SELECT principal,
       CAST(count(*) AS BIGINT) AS visible_rows,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS visible_nations,
       CAST(count(DISTINCT masked_name) AS BIGINT) AS distinct_masked_names
FROM secured GROUP BY principal
"""


QUERIES_EXT31 = {
    "q242_l_diversity_audit": q242_l_diversity_audit,
    "q243_temporal_reachability": q243_temporal_reachability,
    "q244_update_mode_parity": q244_update_mode_parity,
    "q245_rls_policy_view": q245_rls_policy_view,
}


def _oracles_ext31() -> dict[str, str]:
    return {
        "q242_l_diversity_audit": Q242_SQL,
        "q243_temporal_reachability": Q243_SQL,
        "q244_update_mode_parity": Q244_SQL,
        "q245_rls_policy_view": _q245_sql(),
    }
