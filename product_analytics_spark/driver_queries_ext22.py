"""Round-3 driver query families, batch 22 (q210+): canonical-
document selection after near-dup clustering, and the corpus
curation filter funnel.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q210


def q210_canonical_doc_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the step a dedup pipeline
    actually SHIPS: after near-dup clustering (X2 candidates → X60
    transitive closure), each cluster keeps exactly one survivor by
    the keep-longest rule ((n_chars DESC, doc_id) — the standard
    corpus-dedup heuristic: the longest member is usually the
    superset document), everything else is marked dropped with a
    pointer to its survivor. Emits the per-document verdict — the
    relation a training-data builder joins against to filter the
    corpus.

    Scale: clustering inherits X2/X60's banded + iterative-halving
    economics; survivor election is ONE window over |docs in
    clusters| rows keyed by cluster id. The survivor pointer makes
    the drop auditable (provenance requirement in curation
    pipelines)."""
    from product_analytics_spark.driver_queries import _dup_clusters_shared

    d = _t(spark, sf_dir, "documents")
    clusters = _dup_clusters_shared(spark, sf_dir).select("doc_id", "cluster_id")
    sized = clusters.join(d.select("doc_id", "n_chars", "lang"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = sized.select(
        "doc_id",
        "cluster_id",
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.first("doc_id").over(w).alias("survivor_id"),
    )
    return ranked.select(
        "doc_id",
        "cluster_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (F.col("rn") == 1).alias("keep"),
        "survivor_id",
    )


def _q210_sql() -> str:
    from product_analytics_spark.driver_queries import _q20_sql

    return f"""
WITH RECURSIVE pairs AS ({_q20_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
clusters AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id,
         d.lang, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER w AS rn,
         first_value(doc_id) OVER w AS survivor_id
  FROM clusters
  WINDOW w AS (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id)
)
SELECT doc_id, cluster_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       rn = 1 AS keep, survivor_id
FROM ranked
"""


# ------------------------------------------------------------- q211

FUNNEL_MIN_CHARS = 100
FUNNEL_MAX_CHARS = 10_000
FUNNEL_MIN_TOKENS = 20
FUNNEL_MAX_AVG_TOKEN_LEN = 8


def q211_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation filter funnel — the attrition report every
    training-data pipeline publishes: per language, how many
    documents survive each successive filter stage (length band →
    minimum token count → average-token-length sanity), with final
    retention. All four stage counts come from ONE scan with nested
    conditional sums (no per-stage re-scan, no four jobs); the
    stage predicates are pure integer/string arithmetic mirrored by
    the oracle. avg-token-length uses integer cross-multiplication
    (chars ≤ limit·tokens), not a float division.

    Scale: single map-side pass + |langs|-row agg; at 100 TB this is
    the cheap pre-pass run BEFORE the expensive dedup stages, and
    the per-stage counts decide whether a filter is worth its
    selectivity."""
    d = _t(spark, sf_dir, "documents")
    from product_analytics_spark.operators import text as tx

    n_tok = tx.token_count(F.col("text"))
    staged = d.select(
        "lang",
        F.col("n_chars").alias("nc"),
        n_tok.alias("nt"),
    ).select(
        "lang",
        F.col("nc").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS).alias("s1"),
        (
            F.col("nc").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS)
            & (F.col("nt") >= FUNNEL_MIN_TOKENS)
        ).alias("s2"),
        (
            F.col("nc").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS)
            & (F.col("nt") >= FUNNEL_MIN_TOKENS)
            & (F.col("nc") <= F.lit(FUNNEL_MAX_AVG_TOKEN_LEN) * F.col("nt"))
        ).alias("s3"),
    )
    one = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")  # noqa: E731
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        one("s1").alias("n_length_ok"),
        one("s2").alias("n_tokens_ok"),
        one("s3").alias("n_final"),
        (one("s3").cast("double") / F.count(F.lit(1))).alias("retention"),
    )


Q211_SQL = f"""
WITH staged AS (
  SELECT lang,
         n_chars BETWEEN {FUNNEL_MIN_CHARS} AND {FUNNEL_MAX_CHARS} AS s1,
         len(regexp_split_to_array(trim(text), '\\s+')) AS nt,
         n_chars AS nc
  FROM documents
),
flags AS (
  SELECT lang, s1,
         s1 AND nt >= {FUNNEL_MIN_TOKENS} AS s2,
         s1 AND nt >= {FUNNEL_MIN_TOKENS}
            AND nc <= {FUNNEL_MAX_AVG_TOKEN_LEN} * nt AS s3
  FROM staged
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_length_ok,
       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_ok,
       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS retention
FROM flags GROUP BY 1
"""


QUERIES_EXT22 = {
    "q210_canonical_doc_selection": q210_canonical_doc_selection,
    "q211_filter_funnel": q211_filter_funnel,
}


def _oracles_ext22() -> dict[str, str]:
    return {
        "q210_canonical_doc_selection": _q210_sql(),
        "q211_filter_funnel": Q211_SQL,
    }
