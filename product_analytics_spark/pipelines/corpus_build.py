"""End-to-end LLM corpus build: the composed pipeline a training-data
team actually runs, wired from the operators the driver suite
certifies individually —

    ingest -> quality gate -> language policy -> exact dedup
           -> MinHash near-dup dedup -> split assignment

with a per-stage FUNNEL report (the observability artifact that tells
you which gate ate your corpus).  Reference analog: the dbt DAG in
``models/pipeline.py`` is the reference's pipeline; this is the
extension twin for SURVEY §2.11's corpus operators.

Design for 100 TB:
- The stage gates are FLAGS on one base relation, not materialized
  intermediates — the funnel aggregates flag conjunctions in a single
  pass (plus the near-dup operator's own banded pass), so adding a
  stage costs a boolean column, not a corpus copy.
- Exact-dedup canonicalization is a window min over md5(text) — the
  shuffle carries (hash, doc_id), not text.
- Near-dup removal reuses ``operators.text.minhash_near_dup_pairs``
  (banded LSH, never all-pairs) over the exact-dedup SURVIVORS only,
  with the greedy keep-lowest-id rule (drop every doc that appears as
  the greater member of a qualifying pair).  For cluster-canonical
  selection use q210's connected-components form instead; greedy is
  the cheap deterministic default.
- Split assignment is doc_id mod 10 here (illustrative, trivially
  portable); production uses q49's salted-hash splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from product_analytics_spark.operators import text

#: pipeline policy knobs (shared verbatim by the q388 oracle SQL)
MIN_CHARS = 60
MIN_TOKENS = 8
KEEP_LANGS = ("en", "de", "fr")
NEAR_DUP_THRESHOLD = 0.5
TRAIN_MOD, VAL_BUCKET, TEST_BUCKET = 10, 8, 9


def corpus_flags(docs: DataFrame) -> DataFrame:
    """Per-document stage flags (monotone conjunctions) on one base
    relation: q_ok (quality gate), l_ok (q_ok AND language policy),
    canon (l_ok AND exact-dedup canonical)."""
    base = docs.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        (
            (F.col("n_chars") >= MIN_CHARS)
            & (F.size(text.tokens(F.col("text"))) >= MIN_TOKENS)
        ).alias("q_ok"),
    ).withColumn(
        "l_ok", F.col("q_ok") & F.col("lang").isin(*KEEP_LANGS)
    )
    w = Window.partitionBy(F.md5(F.trim("text")))
    return base.withColumn(
        "canon",
        F.col("l_ok")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("l_ok"), F.col("doc_id"))).over(w)
        ),
    )


def corpus_build(spark: SparkSession, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline. Returns (final_corpus, funnel).

    ``final_corpus``: (doc_id, text, lang, split) — the training set.
    ``funnel``: (stage_idx, stage, docs) — documents SURVIVING each
    stage, ending with the per-split partition of the survivors."""
    flagged = corpus_flags(docs)
    survivors = flagged.filter("canon").select("doc_id", "text", "lang")
    pairs = text.minhash_near_dup_pairs(
        survivors, threshold=NEAR_DUP_THRESHOLD
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct().withColumn(
        "_dropped", F.lit(True)
    )
    full = flagged.join(drop, "doc_id", "left").withColumn(
        "kept", F.col("canon") & F.col("_dropped").isNull()
    )
    final = (
        full.filter("kept")
        .select(
            "doc_id",
            "text",
            "lang",
            F.when(F.col("doc_id") % TRAIN_MOD == VAL_BUCKET, "val")
            .when(F.col("doc_id") % TRAIN_MOD == TEST_BUCKET, "test")
            .otherwise("train")
            .alias("split"),
        )
    )
    agg = full.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if("q_ok").alias("n1"),
        F.count_if("l_ok").alias("n2"),
        F.count_if("canon").alias("n3"),
        F.count_if("kept").alias("n4"),
        F.count_if(
            F.col("kept") & (F.col("doc_id") % TRAIN_MOD < VAL_BUCKET)
        ).alias("n5"),
        F.count_if(
            F.col("kept") & (F.col("doc_id") % TRAIN_MOD == VAL_BUCKET)
        ).alias("n6"),
        F.count_if(
            F.col("kept") & (F.col("doc_id") % TRAIN_MOD == TEST_BUCKET)
        ).alias("n7"),
    )
    funnel = agg.selectExpr(
        "stack(8,"
        " 0, 'ingest', n0,"
        " 1, 'quality_gate', n1,"
        " 2, 'language_policy', n2,"
        " 3, 'exact_dedup', n3,"
        " 4, 'near_dup_dedup', n4,"
        " 5, 'split_train', n5,"
        " 6, 'split_val', n6,"
        " 7, 'split_test', n7"
        ") AS (stage_idx, stage, docs)"
    ).orderBy("stage_idx")
    return final, funnel
