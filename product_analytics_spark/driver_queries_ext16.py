"""Round-3 driver query families, batch 16 (q198+): multimodal
VAD-style segment detection over binary payload chunks, and a
small-file compaction planner (bin-packing as a query).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _hash60_sql, _money_cents, _t
from product_analytics_spark.operators.text import portable_hash60

# ------------------------------------------------------------- q198

VAD_CHUNK_CHARS = 40
VAD_ENERGY_MOD = 1000
VAD_THRESHOLD = 500


def q198_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal VAD-style segmentation — the voice-activity-
    detection pipeline shape over opaque payloads: fixed-size chunks
    (audio frames), a per-chunk scalar energy, threshold to
    active/silent, and gaps-and-islands to merge consecutive active
    frames into segments (count, longest, active ratio per doc).
    Chunking is `sequence`+`explode`+`substring` (X5/q133's
    plumbing); the energy here is an engine-portable hash surrogate —
    for real audio it is one Arrow-batched RMS over decoded frames
    (q32's mapInPandas door) and NOTHING downstream changes: the
    segmentation algebra is frame-source-agnostic.

    Scale: narrow until the per-doc island window (partitioned by
    doc — bounded rows per key); frame explosion is the fan-out to
    watch (payload_bytes/chunk rows per doc) — the chunk size is the
    knob, and oversized payloads get the X28 cap treatment."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    frames = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(
                    F.expr(f"CAST((n_chars + {VAD_CHUNK_CHARS - 1}) div {VAD_CHUNK_CHARS} AS INT)"),
                    F.lit(1),
                ),
            )
        ).alias("frame_no"),
        "text",
    ).select(
        "doc_id",
        "frame_no",
        (
            portable_hash60(
                F.substring(
                    F.col("text"),
                    ((F.col("frame_no") - 1) * VAD_CHUNK_CHARS + 1).cast("int"),
                    VAD_CHUNK_CHARS,
                )
            )
            % VAD_ENERGY_MOD
        ).alias("energy"),
    )
    active = frames.select(
        "doc_id",
        "frame_no",
        (F.col("energy") >= VAD_THRESHOLD).alias("on"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    runs = active.select(
        "doc_id",
        "frame_no",
        "on",
        F.when(
            F.lag("on").over(w).isNull() | (F.lag("on").over(w) != F.col("on")), 1
        )
        .otherwise(0)
        .alias("edge"),
    ).select(
        "doc_id",
        "on",
        F.sum("edge")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    segs = (
        runs.filter(F.col("on"))
        .groupBy("doc_id", "run_id")
        .agg(F.count(F.lit(1)).alias("seg_len"))
    )
    per_doc = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.max("seg_len").cast("bigint").alias("longest_segment"),
        F.sum("seg_len").cast("bigint").alias("active_frames"),
    )
    totals = active.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce("longest_segment", F.lit(0)).cast("bigint").alias("longest_segment"),
        (
            F.coalesce("active_frames", F.lit(0)).cast("double")
            / F.col("n_frames")
        ).alias("active_ratio"),
    )


def _q198_sql() -> str:
    h = _hash60_sql(
        f"substring(text, CAST((frame_no - 1) * {VAD_CHUNK_CHARS} + 1 AS INT), {VAD_CHUNK_CHARS})"
    )
    return f"""
WITH frames AS (
  SELECT doc_id, unnest(generate_series(1,
           greatest(CAST((n_chars + {VAD_CHUNK_CHARS - 1}) // {VAD_CHUNK_CHARS} AS INT), 1)))
           AS frame_no,
         text
  FROM documents
),
active AS (
  SELECT doc_id, frame_no, ({h}) % {VAD_ENERGY_MOD} >= {VAD_THRESHOLD} AS "on"
  FROM frames
),
runs AS (
  SELECT doc_id, "on",
         sum(CASE WHEN prev_on IS NULL OR prev_on != "on" THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY frame_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM (
    SELECT doc_id, frame_no, "on",
           lag("on") OVER (PARTITION BY doc_id ORDER BY frame_no) AS prev_on
    FROM active
  )
),
segs AS (
  SELECT doc_id, run_id, count(*) AS seg_len
  FROM runs WHERE "on" GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, count(*) AS n_segments, max(seg_len) AS longest_segment,
         sum(seg_len) AS active_frames
  FROM segs GROUP BY 1
),
totals AS (
  SELECT doc_id, count(*) AS n_frames FROM active GROUP BY 1
)
SELECT t.doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(coalesce(n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(longest_segment, 0) AS BIGINT) AS longest_segment,
       CAST(coalesce(active_frames, 0) AS DOUBLE) / n_frames AS active_ratio
FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""


# ------------------------------------------------------------- q199

COMPACT_TARGET_CENTS = 50_000_000  # target "bytes" per compacted output


def q199_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — bin-packing as a query: the
    file manifest (here: per-(year,month) partition sizes, with
    revenue cents standing in for bytes) is ordered deterministically
    and greedily packed into target-size output groups by the
    cumulative-sum trick (group = cumsum_before div target). One
    window + one agg produce the full compaction plan: per output
    group its size, file count, and span — the planning half of
    OPTIMIZE/auto-compaction, run as a relational job over the
    manifest rather than driver-side loops.

    Scale: the manifest is metadata (|files| rows, not data); the
    plan is computed in one pass and each planned group becomes one
    rewrite task. cumsum div target admits ≤ 2× overshoot in the
    worst single-file case — the same bound file compactors accept."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.sum(_money_cents("o_totalprice")).alias("sz"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    w = Window.orderBy("y", "m")
    packed = m.select(
        "y",
        "m",
        "sz",
        "n_rows",
        F.coalesce(
            F.sum("sz").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("before"),
    ).select(
        "y",
        "m",
        "sz",
        "n_rows",
        F.expr(f"before div {COMPACT_TARGET_CENTS}").alias("grp"),
    )
    return packed.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("sz").cast("bigint").alias("group_cents"),
        F.sum("n_rows").cast("bigint").alias("group_rows"),
        F.min(F.col("y") * 100 + F.col("m")).cast("bigint").alias("first_part"),
        F.max(F.col("y") * 100 + F.col("m")).cast("bigint").alias("last_part"),
    )


Q199_SQL = f"""
WITH m AS (
  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sz,
         count(*) AS n_rows
  FROM orders GROUP BY 1, 2
),
packed AS (
  SELECT y, m, sz, n_rows,
         CAST(coalesce(sum(sz) OVER (ORDER BY y, m
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) // {COMPACT_TARGET_CENTS} AS BIGINT) AS grp
  FROM m
)
SELECT grp,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(sz) AS BIGINT) AS group_cents,
       CAST(sum(n_rows) AS BIGINT) AS group_rows,
       CAST(min(y * 100 + m) AS BIGINT) AS first_part,
       CAST(max(y * 100 + m) AS BIGINT) AS last_part
FROM packed GROUP BY 1
"""


QUERIES_EXT16 = {
    "q198_vad_segments": q198_vad_segments,
    "q199_compaction_planner": q199_compaction_planner,
}

ORACLES_EXT16 = {
    "q198_vad_segments": _q198_sql(),
    "q199_compaction_planner": Q199_SQL,
}
