"""Round-5 driver query families, batch 53 (q329-q332): the
mapInArrow door (Arrow RecordBatch processing with no pandas
conversion), an optimizer-statistics join-cardinality audit, a
polymorphic Python UDTF whose output schema is computed at analysis
time, and the custom stateful streaming sessionizer promoted to a
full-oracle parity query.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q329

QUANT_LEVELS = 127  # int8 symmetric quantization


def q329_arrow_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: ``mapInArrow`` — the lowest-overhead Python
    boundary (Arrow RecordBatches in and out, no pandas conversion,
    no per-row pickling). Applied to the op a vector pipeline actually
    ships through it: symmetric int8 quantization of embeddings with
    per-vector scale = max|x|, emitting per-vector quantization
    diagnostics (saturated lanes, max absolute reconstruction error).

    Cross-engine exactness of FLOAT diagnostics: every arithmetic step
    is a fixed per-element IEEE sequence — (x/scale)*LEVELS,
    floor(+0.5), dequant q*scale/LEVELS, |x−dq|, max over dims — with
    no cross-row accumulation, so numpy and DuckDB produce identical
    doubles; the emitted error is floored at 1e-9 resolution into a
    BIGINT (floor(err·1e9)) to make the certificate integer-valued.
    floor(+0.5) (NOT round) because numpy rounds half-to-even while
    SQL rounds half-away — floor is the one midpoint rule both share.

    Scale: mapInArrow streams batches (zero-copy columnar); one
    Python worker pass, no shuffle at all before the final projection."""
    import pyarrow as pa

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def quantize(batches):
        import numpy as np

        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            embs = batch.column("embedding")
            n_sat = np.empty(len(vec_ids), dtype=np.int64)
            err_e9 = np.empty(len(vec_ids), dtype=np.int64)
            n_dims = np.empty(len(vec_ids), dtype=np.int64)
            for j in range(len(vec_ids)):
                x = np.asarray(embs[j].as_py(), dtype=np.float64)
                scale = np.abs(x).max()
                if scale == 0.0:
                    n_sat[j], err_e9[j], n_dims[j] = 0, 0, len(x)
                    continue
                q = np.floor(x / scale * QUANT_LEVELS + 0.5)
                dq = q * scale / QUANT_LEVELS
                err = np.abs(x - dq).max()
                n_sat[j] = int((np.abs(q) >= QUANT_LEVELS).sum())
                err_e9[j] = int(np.floor(err * 1e9))
                n_dims[j] = len(x)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, type=pa.int64()),
                    pa.array(n_dims, type=pa.int64()),
                    pa.array(n_sat, type=pa.int64()),
                    pa.array(err_e9, type=pa.int64()),
                ],
                names=["vec_id", "n_dims", "n_saturated", "max_err_e9"],
            )

    out = emb.mapInArrow(
        quantize, "vec_id long, n_dims long, n_saturated long, max_err_e9 long"
    )
    return out.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum("n_saturated").cast("bigint").alias("total_saturated"),
        F.max("max_err_e9").cast("bigint").alias("worst_err_e9"),
        F.sum("max_err_e9").cast("bigint").alias("sum_err_e9"),
    )


Q329_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
per AS (
  SELECT vec_id,
         list_max(list_transform(e, x -> abs(x))) AS scale,
         e
  FROM v
),
q AS (
  SELECT vec_id,
         CASE WHEN scale = 0.0 THEN 0
              ELSE len(list_filter(e,
                x -> abs(floor(x / scale * {QUANT_LEVELS} + 0.5))
                     >= {QUANT_LEVELS}))
         END AS n_saturated,
         CASE WHEN scale = 0.0 THEN 0
              ELSE CAST(floor(list_max(list_transform(e,
                x -> abs(x - floor(x / scale * {QUANT_LEVELS} + 0.5)
                             * scale / {QUANT_LEVELS}))) * 1e9) AS BIGINT)
         END AS max_err_e9
  FROM per
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(n_saturated) AS BIGINT) AS total_saturated,
       CAST(max(max_err_e9) AS BIGINT) AS worst_err_e9,
       CAST(sum(max_err_e9) AS BIGINT) AS sum_err_e9
FROM q
"""


# ------------------------------------------------------------- q330


def q330_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics audit — the estimate a cost-based planner
    makes for an equi-join, checked against the engine's own result:
    predicted |A ⋈ B on k| = Σ_k cntA(k)·cntB(k) (exact when the
    per-key histogram is exact), for A = view events, B = purchase
    events, k = user_id. Emits the prediction, the engine's actual
    join count, the match verdict, and the skew profile a planner
    reads off the same histogram: the top key's permille share of the
    join output and the p50/p99 per-key contributions (exact order
    statistics).

    Scale: the histogram is ONE conditional agg over events (map-side
    combine, |users| rows); the verification join is the only fact-
    sized work, and per-key output share is exactly what AQE's skew
    detection thresholds on — this query is that diagnosis as a
    relational report."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select("user_id", "event_type")
    hist = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("cb"),
    ).withColumn("contrib", F.col("ca") * F.col("cb"))
    a = e.filter(F.col("event_type") == "view").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    # The engine's actual join output, counted PER KEY and equi-joined
    # back to the histogram — a per-key certificate (strictly stronger
    # than a grand-total compare), and no 1-row scalar join (which
    # would plan as the banned BroadcastNestedLoopJoin).
    actual_per_key = (
        a.join(b, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("actual_k"))
    )
    j = hist.join(actual_per_key, "user_id", "left").withColumn(
        "actual_k", F.coalesce("actual_k", F.lit(0))
    )
    w = Window.partitionBy().orderBy("contrib", "user_id")
    n = Window.partitionBy()
    ranked = j.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(n)
    )
    return ranked.agg(
        F.sum("contrib").cast("bigint").alias("predicted_pairs"),
        F.sum("actual_k").cast("bigint").alias("actual_pairs"),
        F.min(F.col("contrib") == F.col("actual_k")).alias("estimate_ok"),
        F.expr("(max(contrib) * 1000) div sum(contrib)").cast("bigint").alias(
            "top_key_permille"
        ),
        F.min(
            F.when(F.col("rk") == F.expr("(cnt + 1) div 2"), F.col("contrib"))
        ).cast("bigint").alias("p50_contrib"),
        F.min(
            F.when(F.col("rk") == F.expr("cnt - (cnt div 100)"), F.col("contrib"))
        ).cast("bigint").alias("p99_contrib"),
    )


Q330_SQL = """
WITH hist AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
  FROM events GROUP BY 1
),
apk AS (
  SELECT user_id, count(*) AS actual_k
  FROM (SELECT user_id FROM events WHERE event_type = 'view') a
  JOIN (SELECT user_id FROM events WHERE event_type = 'purchase') b
    USING (user_id)
  GROUP BY 1
),
j AS (
  SELECT h.user_id, h.ca * h.cb AS contrib,
         coalesce(apk.actual_k, 0) AS actual_k
  FROM hist h LEFT JOIN apk ON h.user_id = apk.user_id
),
r AS (
  SELECT contrib, actual_k,
         row_number() OVER (ORDER BY contrib, user_id) AS rk,
         count(*) OVER () AS cnt
  FROM j
)
SELECT CAST(sum(contrib) AS BIGINT) AS predicted_pairs,
       CAST(sum(actual_k) AS BIGINT) AS actual_pairs,
       bool_and(contrib = actual_k) AS estimate_ok,
       CAST((max(contrib) * 1000) // sum(contrib) AS BIGINT)
         AS top_key_permille,
       CAST(min(CASE WHEN rk = (cnt + 1) // 2 THEN contrib END) AS BIGINT)
         AS p50_contrib,
       CAST(min(CASE WHEN rk = cnt - (cnt // 100) THEN contrib END) AS BIGINT)
         AS p99_contrib
FROM r
"""


# ------------------------------------------------------------- q331

UDTF_N_TOKENS = 4


def q331_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: a POLYMORPHIC Python UDTF — the output schema is
    computed by the UDTF's ``analyze()`` at query-analysis time from a
    literal argument (Spark 4's table-function protocol; the door
    schema-on-read connectors use). ``lead_tokens(text, N)`` emits N
    columns tok1..tokN (whitespace tokens, '' padded), N resolved from
    the literal — the SAME function text works for any N without a
    registry of fixed signatures.

    The relational work after the UDTF is a plain grouped count over
    the leading token pair — the oracle reproduces the split with
    regexp (deterministic whitespace tokenization on both engines).

    Scale: UDTFs run per-partition (no shuffle); the analyze phase is
    driver-side metadata only."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import StringType, StructField, StructType

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult

    class LeadTokens:
        @staticmethod
        def analyze(text_arg: AnalyzeArgument, n_arg: AnalyzeArgument):
            n = int(n_arg.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"tok{i+1}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text: str, n: int):
            toks = (text or "").split()
            yield tuple((toks[i] if i < len(toks) else "") for i in range(n))

    try:
        lead_tokens = udtf(LeadTokens, useArrow=True)  # Arrow-batched eval
    except TypeError:  # runtime without the useArrow kwarg
        lead_tokens = udtf(LeadTokens)
    spark.udtf.register("lead_tokens", lead_tokens)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("q331_docs")
    return spark.sql(
        f"""
        SELECT t.tok1, t.tok2,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN t.tok{UDTF_N_TOKENS} = '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_short
        FROM q331_docs d,
             LATERAL lead_tokens(d.text, {UDTF_N_TOKENS}) t
        GROUP BY t.tok1, t.tok2
        ORDER BY n_docs DESC, tok1, tok2
        LIMIT 20
        """
    )


Q331_SQL = f"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
lead AS (
  SELECT coalesce(t[1], '') AS tok1,
         coalesce(t[2], '') AS tok2,
         coalesce(t[{UDTF_N_TOKENS}], '') AS tokn
  FROM toks
)
SELECT tok1, tok2,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN tokn = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_short
FROM lead
GROUP BY 1, 2
ORDER BY n_docs DESC, tok1, tok2
LIMIT 20
"""


# ------------------------------------------------------------- q332

import os as _os
import shutil as _shutil

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
Q332_LAND = _os.path.join(_REPO, ".fixtures", ".q332_stream_land")
STATEFUL_GAP_MIN = 30


def q332_stateful_sessionize_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.9 upgrade: the CUSTOM stateful streaming sessionizer
    (``applyInPandasWithState``, streaming/ops.py:sessionize_stateful)
    run as a REAL availableNow stream and value-checked against the
    batch gaps-and-islands oracle — promoting the one previously
    pytest-only stateful door to a full-oracle driver query.

    Determinism recipe: per-user FLUSH SENTINELS (an event 10 days
    after the corpus) land as a second, later-mtime file, so every
    user's final real session is closed by a gap-break and EMITTED;
    the sentinels' own sessions stay open in state and never emit
    (nothing to filter inside the streaming plan — the q218 pushdown
    lesson). The operator's 600-minute processing-time timeout cannot
    fire inside a seconds-long run, so emission is purely
    data-driven. Values accumulate as integer CENTS carried in the
    state's double slot (exact < 2^53) — no cross-row float sums.

    Scale: state = one open-session row per active user partitioned
    by the group key; Arrow batches the per-group pandas calls; the
    sentinel trick is exactly how a production backfill drains tail
    state (a high-watermark barrier event per key)."""
    from product_analytics_spark.qcommon import land_once
    from product_analytics_spark.streaming import ops as st

    def _land() -> None:
        # Deterministic 1-in-3 user subset: the stateful door pays one
        # Arrow'd pandas call PER GROUP per batch, so group count IS the
        # cost dial (the cogroup lesson); a third of the users exercises
        # the identical machinery at a third of the wall time.
        ev = (
            _t(spark, sf_dir, "events")
            .filter(F.col("user_id") % 3 == 0)
            .select(
                "user_id",
                F.col("ts").cast("timestamp").alias("ts"),
                (F.col("value").cast("decimal(18,2)") * 100)
                .cast("long")
                .cast("double")
                .alias("v_cents"),
            )
        )
        ev.repartition(4).write.mode("overwrite").parquet(Q332_LAND)
        sentinels = ev.groupBy("user_id").agg(
            (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
            F.lit(0.0).alias("v_cents"),
        ).select("user_id", "ts", "v_cents")
        sentinels.coalesce(1).write.mode("append").parquet(Q332_LAND)
        # Pin sentinel files to a later mtime so the file source replays
        # them strictly AFTER the real events on coarse-mtime filesystems.
        import pathlib
        import time as _time

        stamp = _time.time() + 3600
        newest = sorted(
            pathlib.Path(Q332_LAND).glob("*.parquet"),
            key=lambda f: f.stat().st_mtime,
        )[-1:]
        for f in newest:
            _os.utime(f, (stamp, stamp))

    land_once(Q332_LAND, sf_dir, _land)
    schema = spark.read.parquet(Q332_LAND).schema
    stream = st.stream_table(spark, Q332_LAND, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sess = st.sessionize_stateful(
        stream,
        user_col="user_id",
        ts_col="ts",
        value_col="v_cents",
        gap_minutes=STATEFUL_GAP_MIN,
        timeout_minutes=600,
    )
    # Scope shuffle partitions down for the stream only (the ext25
    # discipline): every micro-batch checkpoints one state-store file
    # PER shuffle partition, so 32 partitions pay 8x the commit IO of
    # 4 for the same state on a single node. On a real cluster this
    # dial is sized to executor count, not left at the batch default.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        st.run_available_now_stateful(sess, "q332_sink", output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table("q332_sink")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("total_value") / 100.0).alias("total_value"),
    )


Q332_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {STATEFUL_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WHERE user_id % 3 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, c,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(c) AS BIGINT) / 100.0 AS total_value
FROM sess
GROUP BY user_id, sid
"""


QUERIES_EXT53 = {
    "q329_arrow_int8_quantize": q329_arrow_int8_quantize,
    "q330_join_cardinality_audit": q330_join_cardinality_audit,
    "q331_polymorphic_udtf": q331_polymorphic_udtf,
    "q332_stateful_sessionize_parity": q332_stateful_sessionize_parity,
}


def _oracles_ext53() -> dict[str, str]:
    return {
        "q329_arrow_int8_quantize": Q329_SQL,
        "q330_join_cardinality_audit": Q330_SQL,
        "q331_polymorphic_udtf": Q331_SQL,
        "q332_stateful_sessionize_parity": Q332_SQL,
    }
