"""Round-5 driver query families, batch 65 (q367-q368): the STREAMING
half of the custom Python DataSource (Spark 4
``SimpleDataSourceStreamReader`` — q196/q196b covered the batch reader
and the 2-phase-commit writer), and the Kneser-Ney document fluency
score — the per-document perplexity-proxy quality filter built on
q344's corpus continuation statistics.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from product_analytics_spark.operators import text
from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q367

STREAM_TOTAL = 2048  # bounded feed => the stream drains and terminates
# per-trigger slice; boundaries must not matter. 1024 => exactly TWO
# micro-batches: still a real boundary crossing (the thing the cert
# certifies is answer-invariant) at half the per-trigger machinery the
# 512-row slice paid (r8 streaming-floor item; each extra trigger costs
# ~0.4 s of plan/checkpoint overhead on a bounded feed).
STREAM_BATCH = 1024
STREAM_BUCKETS = 10


def q367_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON STREAMING source end-to-end (Spark 4
    ``SimpleDataSourceStreamReader``): the deterministic CDC feed
    (``sources/pyds.py`` — same generator the q196 batch reader
    serves) consumed as an unbounded stream in {BATCH}-row offset
    micro-batches, aggregated statefully in update-less complete mode
    (per customer-bucket: op counts by kind, net cents, high-watermark
    op_id), drained with ``processAllAvailable`` (the Simple reader
    prefetches ONE batch under availableNow — measured: a 100-row
    probe terminated after 30 rows; processAllAvailable instead loops
    read() to exhaustion).  The oracle replays the ENTIRE stream in
    closed form via generate_series — so micro-batch boundaries,
    offset bookkeeping, and the stream/batch seam are all certified to
    be answer-invariant.

    Scale: offsets are plain positions, so restart replay
    (readBetweenOffsets) is exactly-once by construction; the Simple
    API prefetches on the driver — right for control-plane-sized
    feeds (this one), while corpus-sized streams take the
    partition-planning reader or Kafka.  Shuffle partitions are
    scoped to 4 around the run (state-store files scale with
    partitions × batches — the q169 lesson, 2× measured)."""
    from product_analytics_spark.sources import pyds

    pyds.register_stream(spark)
    src = (
        spark.readStream.format("cdc_stream")
        .option("total_rows", str(STREAM_TOTAL))
        .option("batch_rows", str(STREAM_BATCH))
        .load()
    )
    agg = src.groupBy(
        (F.col("customer_id") % STREAM_BUCKETS).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.count_if(F.col("op") == "INSERT").alias("n_ins"),
        F.count_if(F.col("op") == "UPDATE").alias("n_upd"),
        F.count_if(F.col("op") == "DELETE").alias("n_del"),
        F.sum(
            F.when(F.col("op") == "DELETE", -F.col("amount_cents")).otherwise(
                F.col("amount_cents")
            )
        ).alias("net_cents"),
        F.max("op_id").alias("hwm_op_id"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("q367_sink")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table("q367_sink").orderBy("bucket")


Q367_SQL = f"""
WITH feed AS (
  SELECT i AS op_id,
         i % 1500 AS customer_id,
         CASE WHEN i % 10 <= 6 THEN 'INSERT'
              WHEN i % 10 <= 8 THEN 'UPDATE' ELSE 'DELETE' END AS op,
         (i * 1103515245 + 12345) % 10000000 AS amount_cents
  FROM generate_series(0, {STREAM_TOTAL - 1}) t(i)
)
SELECT customer_id % {STREAM_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS n_ops,
       CAST(count(*) FILTER (WHERE op = 'INSERT') AS BIGINT) AS n_ins,
       CAST(count(*) FILTER (WHERE op = 'UPDATE') AS BIGINT) AS n_upd,
       CAST(count(*) FILTER (WHERE op = 'DELETE') AS BIGINT) AS n_del,
       CAST(sum(CASE WHEN op = 'DELETE' THEN -amount_cents
                     ELSE amount_cents END) AS BIGINT) AS net_cents,
       max(op_id) AS hwm_op_id
FROM feed GROUP BY 1 ORDER BY bucket
"""


# ------------------------------------------------------------- q368

FLU_SCALE = 1_000_000
FLU_WORST = 25


def q368_kn_fluency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM fluency score — the perplexity-proxy quality
    filter of a training-data pipeline, exact-integer so the oracle
    can pin it: q344's corpus continuation statistic (for each word w,
    its Kneser-Ney continuation probability cc(w)·1e6 div T over
    distinct bigram types T) scores every bigram's RIGHT token, and a
    document's fluency is the integer mean of its bigram scores —
    documents whose word-to-word transitions are corpus-typical score
    high; boilerplate-ish or fragmented text scores low.  Output: the
    {WORST} lowest-fluency documents (the removal candidates), with
    the doc's bigram count for context.  Real KN would work in
    log-space floats; the floor-scaled integer form keeps the
    RANKING identical and the value gate exact.

    Scale: two corpus token passes (one builds the vocab-sized score
    table, one scores docs), both explode map-side; the score join
    broadcasts the |vocab| table, so no corpus shuffle beyond the
    per-doc hash-agg; bottom-k is TakeOrderedAndProject."""
    staged = _t(spark, sf_dir, "documents").withColumn(
        "_tk", text.tokens(F.col("text"))
    )
    tk = F.col("_tk")
    n1 = F.greatest(F.size(tk) - F.lit(1), F.lit(0))
    pairs_arr = F.zip_with(
        F.slice(tk, 1, n1),
        F.slice(tk, 2, n1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    bigrams = staged.select(
        "doc_id", F.explode(pairs_arr).alias("_bg")
    ).select("doc_id", F.col("_bg.a").alias("a"), F.col("_bg.b").alias("b"))
    # Vocab-sized continuation-score table (the q344 kernel: distinct
    # (a,b) then per-b distinct-context count; T via whole-relation
    # window — no rescan, no 1-row join).
    per_w = (
        bigrams.select("a", "b")
        .distinct()
        .groupBy(F.col("b").alias("token"))
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    w_all = Window.partitionBy()
    scores = per_w.withColumn("_t", F.sum("cc").over(w_all)).select(
        "token", F.expr(f"cc * {FLU_SCALE}L div _t").alias("score_micro")
    )
    doc = (
        bigrams.join(
            F.broadcast(scores), bigrams["b"] == scores["token"], "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce("score_micro", F.lit(0))).alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("_s div n_bigrams").alias("fluency_micro"),
        )
    )
    return doc.orderBy("fluency_micro", "doc_id").limit(FLU_WORST)


Q368_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[idx] AS a, t[idx+1] AS b
  FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(idx)
),
per_w AS (
  SELECT b AS token, count(*) AS cc
  FROM (SELECT DISTINCT a, b FROM bg) GROUP BY 1
),
scores AS (
  SELECT token,
         cc * {FLU_SCALE} // (SELECT sum(cc) FROM per_w) AS score_micro
  FROM per_w
),
doc AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(coalesce(s.score_micro, 0)) AS BIGINT) AS s
  FROM bg LEFT JOIN scores s ON bg.b = s.token
  GROUP BY 1
)
SELECT doc_id, n_bigrams, CAST(s // n_bigrams AS BIGINT) AS fluency_micro
FROM doc ORDER BY fluency_micro, doc_id LIMIT {FLU_WORST}
"""


QUERIES_EXT65 = {
    "q367_python_stream_source": q367_python_stream_source,
    "q368_kn_fluency_filter": q368_kn_fluency_filter,
}


def _oracles_ext65() -> dict[str, str]:
    return {
        "q367_python_stream_source": Q367_SQL,
        "q368_kn_fluency_filter": Q368_SQL,
    }
