"""Round-4 driver query families, batch 26 (q222-q225): count-min
frequency sketch with error audit, process-mining conformance, data
vault hash-key modeling, and the ANSI try_* safe-math probe.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _hash60_sql, _t

# ------------------------------------------------------------- q222

CM_DEPTH = 4
CM_WIDTH = 64
CM_TOPK = 50


def q222_countmin_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X185: count-min sketch + point-query error audit — the
    mergeable frequency estimator that replaces exact per-token counts
    when the vocabulary won't fit: DEPTH×WIDTH integer counters, each
    occurrence added at (j, h_j(token)) for every row j, point query =
    min over rows. Count-min only ever OVER-estimates (collisions add,
    never subtract) — the audit verifies that invariant and prices the
    error against exact counts for the top-{CM_TOPK} tokens.

    Everything is integer and md5-keyed (the q20/q26 portable-hash
    discipline), so the sketch, the estimates, and the audit are
    bit-identical on both engines.

    Scale: the sketch IS a {CM_DEPTH}×{CM_WIDTH} relation — mergeable
    by addition across partitions/days (the X126 algebra), so a 100 TB
    corpus builds per-partition sketches map-side and merges
    {CM_DEPTH}×{CM_WIDTH}-row states; the full token relation never
    shuffles. The deliberate tiny width makes collisions visible at
    harness scale — width scales with memory budget, not data."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = exact.select(
        "tok",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("j"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("j"), F.col("tok"))), 1, 15),
            16,
            10,
        ).cast("long")
        % CM_WIDTH,
    )
    sketch = hashed.groupBy("j", "bucket").agg(F.sum("cnt").alias("cell"))
    est = (
        hashed.join(sketch, ["j", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell").alias("est"), F.min("cnt").alias("cnt"))
    )
    wtop = Window.partitionBy().orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        est.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= CM_TOPK)
        .select(
            "tok",
            F.col("cnt").cast("bigint").alias("exact_count"),
            F.col("est").cast("bigint").alias("cm_estimate"),
            (F.col("est") - F.col("cnt")).cast("bigint").alias("overestimate"),
            (F.col("est") >= F.col("cnt")).alias("never_underestimates"),
        )
    )


def _q222_sql() -> str:
    h = _hash60_sql("concat(j, ':', tok)")
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
exact AS (
  SELECT tok, count(*) AS cnt FROM toks WHERE length(tok) > 0 GROUP BY tok
),
hashed AS (
  SELECT tok, cnt, j, ({h}) % {CM_WIDTH} AS bucket
  FROM exact, unnest(range(0, {CM_DEPTH})) t(j)
),
sketch AS (
  SELECT j, bucket, sum(cnt) AS cell FROM hashed GROUP BY j, bucket
),
est AS (
  SELECT h.tok, min(s.cell) AS est, min(h.cnt) AS cnt
  FROM hashed h JOIN sketch s ON s.j = h.j AND s.bucket = h.bucket
  GROUP BY h.tok
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rk FROM est
)
SELECT tok,
       CAST(cnt AS BIGINT) AS exact_count,
       CAST(est AS BIGINT) AS cm_estimate,
       CAST(est - cnt AS BIGINT) AS overestimate,
       est >= cnt AS never_underestimates
FROM ranked WHERE rk <= {CM_TOPK}
"""


# ------------------------------------------------------------- q223

STAGE_RANK = {"signup": 1, "view": 2, "click": 3, "purchase": 4}


def q223_process_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X186: process-mining conformance + cycle time — the
    order-to-cash audit applied to the event log: the expected process
    is signup → view → click → purchase; per user, measure (a)
    completion (all four stages present), (b) conformance (the FIRST
    occurrence of each stage happens in process order), (c) rework
    (consecutive-event transitions that move BACKWARD in the process —
    the loop count a process miner flags), and (d) cycle time from
    first signup to first purchase. Error events are noise and are
    excluded from the trace, as a conformance checker's event-class
    filter would.

    Timestamps compare via epoch microseconds (the q126 discipline);
    all counts integer.

    Scale: ONE user-keyed shuffle serves the trace sort (lag window)
    and the per-user aggregation; conformance logic is conditional
    aggregation over first-occurrence timestamps — no per-pattern
    scan, no regex automaton over rows."""
    rank_expr = F.create_map(
        *[F.lit(x) for kv in STAGE_RANK.items() for x in kv]
    )
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*STAGE_RANK))
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            rank_expr[F.col("event_type")].alias("stage"),
        )
    )
    wtrace = Window.partitionBy("user_id").orderBy("ts", "event_id")
    traced = ev.withColumn("prev_stage", F.lag("stage").over(wtrace))
    per_user = traced.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("stage") == s, F.unix_micros("ts"))).alias(
                f"first_{s}"
            )
            for s in (1, 2, 3, 4)
        ],
        F.sum(
            F.when(F.col("prev_stage") > F.col("stage"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_rework"),
        F.count(F.lit(1)).cast("bigint").alias("n_trace_events"),
    )
    complete = (
        F.col("first_1").isNotNull()
        & F.col("first_2").isNotNull()
        & F.col("first_3").isNotNull()
        & F.col("first_4").isNotNull()
    )
    conformant = complete & (
        (F.col("first_1") < F.col("first_2"))
        & (F.col("first_2") < F.col("first_3"))
        & (F.col("first_3") < F.col("first_4"))
    )
    return per_user.select(
        "user_id",
        "n_trace_events",
        "n_rework",
        complete.alias("complete"),
        conformant.alias("conformant"),
        F.when(complete, F.col("first_4") - F.col("first_1"))
        .cast("bigint")
        .alias("cycle_us"),
    )


Q223_SQL = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                         WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 END AS stage
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
),
traced AS (
  SELECT *, lag(stage) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_stage
  FROM ev
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN stage = 1 THEN epoch_us(ts) END) AS first_1,
         min(CASE WHEN stage = 2 THEN epoch_us(ts) END) AS first_2,
         min(CASE WHEN stage = 3 THEN epoch_us(ts) END) AS first_3,
         min(CASE WHEN stage = 4 THEN epoch_us(ts) END) AS first_4,
         CAST(sum(CASE WHEN prev_stage > stage THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rework,
         CAST(count(*) AS BIGINT) AS n_trace_events
  FROM traced GROUP BY user_id
)
SELECT user_id, n_trace_events, n_rework,
       (first_1 IS NOT NULL AND first_2 IS NOT NULL
        AND first_3 IS NOT NULL AND first_4 IS NOT NULL) AS complete,
       (first_1 IS NOT NULL AND first_2 IS NOT NULL
        AND first_3 IS NOT NULL AND first_4 IS NOT NULL
        AND first_1 < first_2 AND first_2 < first_3 AND first_3 < first_4)
         AS conformant,
       CASE WHEN first_1 IS NOT NULL AND first_2 IS NOT NULL
                 AND first_3 IS NOT NULL AND first_4 IS NOT NULL
            THEN CAST(first_4 - first_1 AS BIGINT) END AS cycle_us
FROM per_user
"""


# ------------------------------------------------------------- q224


def q224_data_vault_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X187: Data Vault 2.0 hash-key modeling — the raw-vault load
    derived in one pass: HUBs carry md5 hash keys of business keys
    (hk = md5(bk)), the LINK carries the hash of the concatenated
    parent keys, and the SATELLITE carries a HASHDIFF over the
    attribute payload (the change-detection key an incremental vault
    load compares against the previous version — identical attributes
    → identical hashdiff → no new satellite row). Emits the load
    audit: per entity, row count, distinct hash keys, and whether
    hashing was collision-free (n_rows == n_distinct for hubs/links;
    satellites dedupe on (hk, hashdiff)).

    md5 hex strings are the engine-portable hash (q20 discipline) AND
    the actual industry convention for vault hash keys.

    Scale: hash keys are computed map-side at scan speed; each audit
    is one count-distinct agg. The point of the pattern at 100 TB:
    loads become insert-only appends keyed on content hashes —
    parallel, idempotent, no update-in-place anywhere."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    hub_customer = c.select(
        F.md5(F.col("c_custkey").cast("string")).alias("hk")
    )
    hub_order = o.select(F.md5(F.col("o_orderkey").cast("string")).alias("hk"))
    link = o.select(
        F.md5(
            F.concat_ws(
                "||",
                F.col("o_custkey").cast("string"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("hk")
    )
    sat = o.select(
        F.md5(F.col("o_orderkey").cast("string")).alias("hk"),
        F.md5(
            F.concat_ws(
                "||",
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            )
        ).alias("hashdiff"),
    )

    def audit(name: str, df: DataFrame, *key_cols: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("entity"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(*[F.col(k) for k in key_cols])
            .cast("bigint")
            .alias("n_distinct_keys"),
        )

    out = (
        audit("hub_customer", hub_customer, "hk")
        .unionByName(audit("hub_order", hub_order, "hk"))
        .unionByName(audit("link_customer_order", link, "hk"))
        .unionByName(audit("sat_order", sat, "hk", "hashdiff"))
    )
    return out.select(
        "entity",
        "n_rows",
        "n_distinct_keys",
        (F.col("n_rows") == F.col("n_distinct_keys")).alias("collision_free"),
    )


Q224_SQL = """
WITH hub_customer AS (
  SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer
),
hub_order AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders
),
link AS (
  SELECT md5(concat_ws('||', CAST(o_custkey AS VARCHAR),
                       CAST(o_orderkey AS VARCHAR))) AS hk
  FROM orders
),
sat AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk,
         md5(concat_ws('||', o_orderstatus,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')))
           AS hashdiff
  FROM orders
),
audits AS (
  SELECT 'hub_customer' AS entity, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT hk) AS BIGINT) AS n_distinct_keys
  FROM hub_customer
  UNION ALL
  SELECT 'hub_order', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT hk) AS BIGINT)
  FROM hub_order
  UNION ALL
  SELECT 'link_customer_order', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT hk) AS BIGINT)
  FROM link
  UNION ALL
  SELECT 'sat_order', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT (hk, hashdiff)) AS BIGINT)
  FROM sat
)
SELECT entity, n_rows, n_distinct_keys,
       n_rows = n_distinct_keys AS collision_free
FROM audits
"""


# ------------------------------------------------------------- q225


def q225_try_arithmetic_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188: ANSI safe-math (try_*) semantics probe — the third
    conformance probe (q212 NULL logic, q213 rounding): Spark's
    try_add / try_multiply / try_divide return NULL instead of raising
    on BIGINT overflow and instead of x/0 — the swap-in that makes a
    100 TB job survive one poisoned row where strict ANSI mode would
    kill the stage. Constructed over real data with a RARE poison
    subset (every 1000th order key), which is both the realistic
    deployment AND a measured performance cliff: try_* signals
    overflow via a caught ArithmeticException PER OVERFLOWING ROW, so
    a mostly-overflowing column paid ~4s for a 150k-row scan in an
    earlier formulation vs ~0.2s with rare poison — try_* is
    insurance against stray bad rows, not a bulk-math mode (the
    design note a 100 TB user needs). The oracle mirrors each case
    with explicitly guarded CASE arithmetic — the probe certifies
    Spark's try_* shortcuts equal the guarded forms row-for-row.

    Scale: one scan, conditional counts, a 1-row result; exception
    cost scales with the POISON count, not the row count."""
    big = 1 << 62
    imax = (1 << 63) - 1
    poison = "(o_orderkey % 1000 = 0)"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            f"try_multiply(o_orderkey, CASE WHEN {poison} "
            f"THEN CAST({big} AS BIGINT) ELSE CAST(1 AS BIGINT) END)"
        ).alias("tm"),
        F.expr(
            f"try_add(CAST({imax} AS BIGINT), "
            f"CASE WHEN {poison} THEN o_orderkey ELSE CAST(0 AS BIGINT) END)"
        ).alias("ta"),
        F.expr(
            f"try_divide(o_totalprice, CASE WHEN {poison} "
            "THEN CAST(0 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)"
        ).alias("td"),
    )
    return o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("tm").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mul_overflow_null"),
        F.sum(F.when(F.col("ta").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_add_overflow_null"),
        F.sum(F.when(F.col("td").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_zero_null"),
        F.sum(F.when(F.col("tm").isNotNull(), F.col("tm")).otherwise(0))
        .cast("bigint")
        .alias("sum_surviving_mul"),
    )


def _q225_sql() -> str:
    big = 1 << 62
    imax = (1 << 63) - 1
    return f"""
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 1000 = 0 AND o_orderkey >= 2 THEN NULL
              WHEN o_orderkey % 1000 = 0 THEN o_orderkey * {big}
              ELSE o_orderkey END AS tm,
         CASE WHEN o_orderkey % 1000 = 0 AND o_orderkey >= 1 THEN NULL
              ELSE {imax} END AS ta,
         CASE WHEN o_orderkey % 1000 = 0 THEN NULL
              ELSE o_totalprice END AS td
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN tm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mul_overflow_null,
       CAST(sum(CASE WHEN ta IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_add_overflow_null,
       CAST(sum(CASE WHEN td IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_zero_null,
       CAST(sum(CASE WHEN tm IS NOT NULL THEN tm ELSE 0 END) AS BIGINT)
         AS sum_surviving_mul
FROM o
"""


QUERIES_EXT26 = {
    "q222_countmin_error_audit": q222_countmin_error_audit,
    "q223_process_conformance": q223_process_conformance,
    "q224_data_vault_build": q224_data_vault_build,
    "q225_try_arithmetic_probe": q225_try_arithmetic_probe,
}


def _oracles_ext26() -> dict[str, str]:
    return {
        "q222_countmin_error_audit": _q222_sql(),
        "q223_process_conformance": Q223_SQL,
        "q224_data_vault_build": Q224_SQL,
        "q225_try_arithmetic_probe": _q225_sql(),
    }
