"""Round-3 driver query families, batch 3 (q126+): stream-stream
interval-join parity, operational percentile reports, conversion-lag
analysis, deterministic EMA smoothing, ANALYZE-style column profiling,
and weighted medians.

Same contract as driver_queries.py: identical aliases both sides,
exact integer arithmetic inside, fixed-order IEEE double formulas the
oracle mirrors expression-for-expression.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t, widen_if_narrow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------- q126

Q126_LAND = os.path.join(_REPO, ".fixtures", ".q126_stream_land")
Q126_LOOKBACK_MIN = 60


def q126_streaming_interval_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver evidence #3: a REAL stream-stream interval join
    (streaming/ops.py:interval_join_stream) — clicks stream joined to
    the same user's purchases within the preceding 60 minutes, both
    sides watermarked so right-side state evicts past
    watermark+lookback (bounded state at any scale) — run availableNow
    into a memory sink and checked against the identical static SQL
    join. Append output mode: stream-stream inner joins emit exactly
    the rows the batch join produces."""
    from product_analytics_spark.qcommon import land_once
    from product_analytics_spark.streaming import ops as st

    # Land only the two joined event types: the landing-zone filter is
    # semantics-preserving (no other type reaches either join side) and
    # keeps the stateful join's input 60% smaller. Landed once per
    # process (layout is a pure function of sf_dir).
    land_once(
        Q126_LAND,
        sf_dir,
        lambda: (
            _t(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("click", "purchase"))
            .repartition(4)
            .write.mode("overwrite")
            .parquet(Q126_LAND)
        ),
    )
    schema = spark.read.parquet(Q126_LAND).schema

    def stream():
        return st.stream_table(spark, Q126_LAND, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    left = stream().filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    right = stream().filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("r_ts"),
    )
    joined = st.interval_join_stream(
        left, right, key_col="user_id", lookback_minutes=Q126_LOOKBACK_MIN
    ).select(
        F.col("event_id").alias("click_id"),
        "purchase_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))).alias("gap_us"),
    )
    # A stream-stream join maintains 4 state stores PER shuffle
    # partition; the fixed per-store setup cost dominates a bounded
    # availableNow run. Scope the state partitioning down for the
    # harness (a long-lived production query sizes it to the cluster
    # instead — the conf binds at query start).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        st.run_available_now(joined, "q126_sink", output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table("q126_sink")


Q126_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
l AS (SELECT * FROM ev WHERE event_type = 'click'),
r AS (SELECT * FROM ev WHERE event_type = 'purchase')
SELECT l.event_id AS click_id,
       r.event_id AS purchase_id,
       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
FROM l JOIN r
  ON r.user_id = l.user_id
 AND r.ts <= l.ts
 AND r.ts >= l.ts - INTERVAL {Q126_LOOKBACK_MIN} MINUTE
"""


# ------------------------------------------------------------- q127

def q127_hourly_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational latency-style percentile report: p50/p95/p99 of
    event value per hour — ONE hour-keyed shuffle, one exact
    percentile evaluation per group over integer cents (F.percentile
    ≡ DuckDB quantile_cont, linear interpolation, dyadic-exact on
    cents). approx_percentile is the 100 TB swap-in (X14/X21)."""
    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"),
        _money_cents("value").alias("c"),
    )
    g = e.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.percentile("c", F.lit([0.5, 0.95, 0.99])).alias("_p"),
    )
    return g.select(
        "hour",
        "n_events",
        (F.col("_p")[0] / F.lit(100.0)).alias("p50"),
        (F.col("_p")[1] / F.lit(100.0)).alias("p95"),
        (F.col("_p")[2] / F.lit(100.0)).alias("p99"),
    )


Q127_SQL = """
WITH c AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         CAST(value * 100 AS BIGINT) AS c
  FROM events
)
SELECT hour, count(*) AS n_events,
       quantile_cont(c, 0.5) / 100.0 AS p50,
       quantile_cont(c, 0.95) / 100.0 AS p95,
       quantile_cont(c, 0.99) / 100.0 AS p99
FROM c GROUP BY hour
"""


# ------------------------------------------------------------- q128

def q128_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag analysis: per user, first signup and the first
    purchase at-or-after it, with the µs-exact integer gap. Two
    user-keyed hash-aggs (signup floor, then conditional purchase
    min); the signup relation is |users| rows and broadcasts into the
    purchase scan at any scale."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(su), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return pu.select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        (
            F.unix_micros(F.col("first_purchase_ts")) - F.unix_micros(F.col("signup_ts"))
        ).alias("gap_us"),
    )


Q128_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
su AS (
  SELECT user_id, min(ts) AS signup_ts FROM ev WHERE event_type = 'signup' GROUP BY 1
),
pu AS (
  SELECT ev.user_id, su.signup_ts, min(ev.ts) AS first_purchase_ts
  FROM ev JOIN su ON su.user_id = ev.user_id
  WHERE ev.event_type = 'purchase' AND ev.ts >= su.signup_ts
  GROUP BY 1, 2
)
SELECT user_id, signup_ts, first_purchase_ts,
       epoch_us(first_purchase_ts) - epoch_us(signup_ts) AS gap_us
FROM pu
"""


# ------------------------------------------------------------- q129

EMA_LAGS = 8  # current event + 7 predecessors


def q129_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EMA smoothing per user: dyadic weights 2^-j over
    the current event and its 7 predecessors (one user-keyed window,
    7 lag() calls riding the same sort). Every term is EXACT — cents
    are integers, 2^-j scaling is exact in binary floating point, and
    the ≤8-term numerator stays under 2^53 — so the single division
    at the end is the only rounding, identical on both engines. A
    float running-EMA (x*α + prev*(1-α) recursively) would compound
    rounding per step; the windowed dyadic form is bit-stable at any
    cluster size."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        _money_cents("value").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("c").cast("double") * F.lit(1.0)
    den = F.lit(1.0)
    for j in range(1, EMA_LAGS):
        lj = F.lag("c", j).over(w)
        num = num + F.coalesce(lj.cast("double") * F.lit(0.5**j), F.lit(0.0))
        den = den + F.when(lj.isNotNull(), F.lit(0.5**j)).otherwise(F.lit(0.0))
    return e.select(
        "user_id",
        "event_id",
        ((num / den) / F.lit(100.0)).alias("ema_value"),
    )


def _q129_sql() -> str:
    num = "CAST(c AS DOUBLE) * 1.0"
    den = "1.0"
    for j in range(1, EMA_LAGS):
        wgt = repr(0.5**j)
        num += f" + coalesce(CAST(lag(c, {j}) OVER w AS DOUBLE) * {wgt}, 0.0)"
        den += (
            f" + CASE WHEN lag(c, {j}) OVER w IS NOT NULL THEN {wgt} ELSE 0.0 END"
        )
    return f"""
WITH c AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(value * 100 AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
       (({num}) / ({den})) / 100.0 AS ema_value
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ------------------------------------------------------------- q130

def q130_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style column statistics in ONE pass: per column,
    non-null count, exact distinct count, lexical min/max — the stats
    relation a cost-based optimizer ingests. All 21 aggregates ride a
    single scan (Catalyst Expand handles the multi-distinct); the
    1-row result unfolds to the long form with stack() — no
    re-aggregation per column. At 100 TB the exact distinct counts
    swap to approx_count_distinct (X21's documented trade)."""
    # The 21-agg multi-distinct pass Expands every row 6x; over a
    # single-row-group local file the whole thing ran as ONE task
    # (round-12 measured: 1.75 s single-threaded on 32 cores) —
    # widen the scan first (guide §2.5; no-op on real multi-file
    # tables at scale).
    o = widen_if_narrow(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            _money_cents("o_totalprice").alias("o_totalprice_cents"),
            F.col("o_orderdate").cast("date").alias("o_orderdate_day"),
        )
    )
    cols = [
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice_cents",
        "o_orderdate_day",
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    a = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return a.select(
        F.col("n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_v, max_v)"
        ),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
        "min_v",
        "max_v",
    )


def _q130_sql() -> str:
    parts = []
    specs = [
        ("o_custkey", "o_custkey"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_orderpriority", "o_orderpriority"),
        ("o_totalprice_cents", "CAST(o_totalprice * 100 AS BIGINT)"),
        ("o_orderdate_day", "CAST(o_orderdate AS DATE)"),
    ]
    for name, expr in specs:
        parts.append(
            f"""SELECT '{name}' AS column_name,
       count(*) AS n_rows,
       count(*) - count({expr}) AS n_null,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(min({expr}) AS VARCHAR) AS min_v,
       CAST(max({expr}) AS VARCHAR) AS max_v
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------------------------- q131

def q131_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: cumulative
    exact integer weights over the price-ordered group window; the
    weighted median is the first price whose doubled cumulative
    weight reaches the group total. Output is invariant to tie order
    (rows sharing a price share it in the answer), so one group-keyed
    shuffle + sort suffices and no global total order is needed."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        _money_cents("l_extendedprice").alias("p"),
        F.round("l_quantity").cast("long").alias("w"),
    )
    wcum = (
        Window.partitionBy("rf").orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("rf")
    c = li.withColumn("_cum", F.sum("w").over(wcum)).withColumn(
        "_tot", F.sum("w").over(wtot)
    )
    return (
        c.filter(F.lit(2) * F.col("_cum") >= F.col("_tot"))
        .groupBy("rf", "_tot")
        .agg(F.min("p").alias("_wm"))
        .select(
            F.col("rf").alias("l_returnflag"),
            F.col("_tot").alias("total_weight"),
            (F.col("_wm") / F.lit(100.0)).alias("weighted_median_price"),
        )
    )


Q131_SQL = """
WITH li AS (
  SELECT l_returnflag AS rf,
         CAST(l_extendedprice * 100 AS BIGINT) AS p,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
c AS (
  SELECT rf, p, w,
         sum(w) OVER (PARTITION BY rf ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY rf) AS tot
  FROM li
)
SELECT rf AS l_returnflag,
       CAST(tot AS BIGINT) AS total_weight,
       CAST(min(p) AS BIGINT) / 100.0 AS weighted_median_price
FROM c
WHERE 2 * cum >= tot
GROUP BY rf, tot
"""


# ------------------------------------------------------------- q132

RANGE_FRAME_US = 3600 * 1_000_000  # trailing 1 hour, microseconds


def q132_range_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event, count and cents-sum of the
    SAME user's events in the trailing hour (RANGE BETWEEN 1h
    PRECEDING AND CURRENT ROW over integer epoch-µs). RANGE frames are
    tie-safe — equal timestamps share one frame regardless of sort
    order — so one user-keyed shuffle+sort is fully deterministic.
    The rows-frame moving aggregates are X15 (q42); this is the
    event-time-bounded variant a rate limiter / rolling spend monitor
    needs."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        _money_cents("value").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-RANGE_FRAME_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        (F.sum("c").over(w) / F.lit(100.0)).alias("value_trailing_1h"),
    )


Q132_SQL = f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(value * 100 AS BIGINT) AS c
  FROM events
)
SELECT event_id, user_id,
       count(*) OVER w AS n_trailing_1h,
       CAST(sum(c) OVER w AS BIGINT) / 100.0 AS value_trailing_1h
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {RANGE_FRAME_US} PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------------- q133

CHUNK_EVERY_N = 2
CHUNK_BYTES_Q133 = 256


def q133_multimodal_chunk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing driver evidence
    (operators/multimodal.py:sample_chunks): payloads split into
    256-byte chunks, every 2nd kept (the video frame-sample shape),
    with per-chunk byte length and md5 — all built-in expression work,
    no Python. The oracle reproduces the chunking on the text the
    payload wraps; valid because the harness corpus is pure ASCII
    (verified), where character offsets == byte offsets. Real media is
    opaque binary; the decode stays behind the X5 stub."""
    from product_analytics_spark.operators import multimodal

    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_payload(d, "doc_id", "text")
    chunks = multimodal.sample_chunks(
        media, every_n=CHUNK_EVERY_N, chunk_bytes=CHUNK_BYTES_Q133
    )
    return chunks.select(
        "media_id",
        "chunk_idx",
        F.length("chunk").alias("n_bytes"),
        F.md5("chunk").alias("chunk_md5"),
    )


Q133_SQL = f"""
WITH n AS (
  SELECT doc_id, text,
         CAST(ceil(length(text) / {CHUNK_BYTES_Q133}.0) AS INT) AS n_chunks
  FROM documents
),
allpos AS (
  SELECT doc_id, text, unnest(range(0, greatest(n_chunks, 1))) AS i FROM n
),
idx AS (
  SELECT doc_id, text, i AS sampled_pos,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INT) AS chunk_idx
  FROM allpos
  WHERE i % {CHUNK_EVERY_N} = 0
),
ch AS (
  SELECT doc_id AS media_id, chunk_idx,
         substring(text, sampled_pos * {CHUNK_BYTES_Q133} + 1, {CHUNK_BYTES_Q133}) AS chunk
  FROM idx
)
SELECT media_id, chunk_idx,
       CAST(length(chunk) AS INT) AS n_bytes,
       md5(chunk) AS chunk_md5
FROM ch
WHERE length(chunk) > 0
"""


# ------------------------------------------------------------- q134

ANN_RECALL_K = 10


def q134_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality harness: recall@k of the LSH-bucket top-k (q28's
    scale path) against the exact brute-force top-k (q21) — the
    evaluation loop an embedding pipeline runs before trading exact
    search for bucketed search. Both sides are deterministic, so
    recall is an exact integer ratio. The exact side's
    TakeOrderedAndProject and the bucket side's pruned scan are each
    one pass; the overlap join is k rows."""
    from product_analytics_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    others = emb.filter(F.col("vec_id") != 0)
    exact = similarity.cosine_topk(others, probe, k=ANN_RECALL_K).select("vec_id")
    approx = similarity.cosine_topk_lsh(
        others, probe, similarity.DEFAULT_PLANES, k=ANN_RECALL_K
    ).select("vec_id")
    ov = exact.join(approx, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return ov.select(
        F.lit(ANN_RECALL_K).alias("k"),
        "n_overlap",
        (F.col("n_overlap").cast("double") / F.lit(float(ANN_RECALL_K))).alias(
            "recall_at_k"
        ),
    )


def _q134_sql() -> str:
    from product_analytics_spark.driver_queries import Q21_SQL, _q28_sql

    return f"""
WITH exact_side AS ({Q21_SQL}),
approx_side AS ({_q28_sql()})
SELECT {ANN_RECALL_K} AS k,
       count(*) AS n_overlap,
       CAST(count(*) AS DOUBLE) / {float(ANN_RECALL_K)} AS recall_at_k
FROM exact_side e
WHERE e.vec_id IN (SELECT vec_id FROM approx_side)
"""


# ------------------------------------------------------------- q135

INT8_SCALE = 64
INT8_TOPK = 10


def q135_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized similarity search (the product-quantization-lite
    memory trade): components round to clamp(round(x*64), ±127) and
    the score is an EXACT integer dot product — 4× smaller vectors,
    no float provenance in the ranking, bit-identical on any engine
    (Spark round and DuckDB round both half-away-from-zero; the
    quantized probe derives from the table inside each engine, no
    driver-side rounding). Top-k via row_number on (qdot, vec_id)."""
    emb = _t(spark, sf_dir, "embeddings")
    qcol = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x * INT8_SCALE))
        ).cast("long"),
    )
    q = emb.select("vec_id", qcol.alias("qv"))
    # Quantize the probe engine-side (same round/clamp expressions),
    # then collect the EXACT integers and inline them as plan-time
    # literals — the q21 probe pattern, no join in the plan at all.
    probe_q = q.filter(F.col("vec_id") == 0).select("qv").first()[0]
    pv = F.array(*[F.lit(int(x)).cast("long") for x in probe_q])
    scored = q.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("qv"), pv, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — k rows kept
    # per partition, merged on the driver; no single-reducer sort, no
    # full shuffle (the q21 pattern). A global row_number window here
    # would serialize the whole scored relation through one task.
    return scored.orderBy(F.desc("qdot"), F.asc("vec_id")).limit(INT8_TOPK)


Q135_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(greatest(-127, least(127, round(x * {INT8_SCALE}))) AS BIGINT)) AS qv
  FROM embeddings
),
probe AS (SELECT qv AS pv FROM q WHERE vec_id = 0),
scored AS (
  SELECT vec_id, CAST(list_dot_product(qv, pv) AS BIGINT) AS qdot
  FROM q, probe WHERE vec_id != 0
)
SELECT vec_id, qdot
FROM (SELECT *, row_number() OVER (ORDER BY qdot DESC, vec_id) AS rn FROM scored)
WHERE rn <= {INT8_TOPK}
"""


QUERIES_EXT4 = {
    "q126_streaming_interval_join_parity": q126_streaming_interval_join_parity,
    "q127_hourly_percentiles": q127_hourly_percentiles,
    "q128_time_to_convert": q128_time_to_convert,
    "q129_ema_smoothing": q129_ema_smoothing,
    "q130_column_profile": q130_column_profile,
    "q131_weighted_median": q131_weighted_median,
    "q132_range_frame_agg": q132_range_frame_agg,
    "q133_multimodal_chunk_sample": q133_multimodal_chunk_sample,
    "q134_ann_recall": q134_ann_recall,
    "q135_int8_quantized_topk": q135_int8_quantized_topk,
}

ORACLES_EXT4 = {
    "q126_streaming_interval_join_parity": Q126_SQL,
    "q127_hourly_percentiles": Q127_SQL,
    "q128_time_to_convert": Q128_SQL,
    "q129_ema_smoothing": _q129_sql(),
    "q130_column_profile": _q130_sql(),
    "q131_weighted_median": Q131_SQL,
    "q132_range_frame_agg": Q132_SQL,
    "q133_multimodal_chunk_sample": Q133_SQL,
    "q134_ann_recall": None,  # resolved lazily: composes Q21/Q28 SQL
    "q135_int8_quantized_topk": Q135_SQL,
}
