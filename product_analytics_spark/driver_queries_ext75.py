"""Round-5 driver query families, batch 75 (q388): the composed
end-to-end corpus-build pipeline with its per-stage funnel, oracled
stage-for-stage in DuckDB (the near-dup stage reuses q20's portable
MinHash machinery over the pipeline's own survivor relation).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from product_analytics_spark.operators import text
from product_analytics_spark.pipelines.corpus_build import (
    KEEP_LANGS,
    MIN_CHARS,
    MIN_TOKENS,
    NEAR_DUP_THRESHOLD,
    TEST_BUCKET,
    TRAIN_MOD,
    VAL_BUCKET,
    corpus_build,
)
from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q388


def q388_corpus_build_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED pipeline (pipelines/corpus_build.py): ingest →
    quality gate → language policy → exact dedup → MinHash near-dup
    dedup → split assignment, returning the per-stage funnel — the
    artifact every individually-certified operator in SURVEY §2.11
    exists to feed, run end to end.  The oracle recomputes EVERY
    stage in DuckDB, including the banded-LSH near-dup stage (q20's
    bit-portable hash machinery applied to the pipeline's survivor
    relation), so the funnel is value-pinned, not just shaped.

    Scale: stage gates are flag columns on one base relation — the
    funnel is a single flag-conjunction aggregate plus the near-dup
    operator's own banded pass; intermediate corpora are never
    materialized (see the pipeline module's 100 TB notes)."""
    _, funnel = corpus_build(spark, _t(spark, sf_dir, "documents"))
    return funnel


def _near_dup_cte(num_hashes: int = 32, bands: int = 8) -> str:
    """q20's oracle pipeline (shingle→sig→bands→cand→verified pairs)
    rebuilt over the funnel's ``surv`` CTE instead of the raw table —
    same salts, same fold constants, bit-identical hashes."""
    # Imported lazily: driver_queries imports THIS module at its
    # bottom, so a top-level import here is circular when a test
    # imports ext75 first.
    from product_analytics_spark.driver_queries import _shingle_fold_cte

    p = text.P31
    a_s, b_s = text.minhash_salts(num_hashes)
    rpb = num_hashes // bands
    shingle = _shingle_fold_cte(3).replace("FROM documents", "FROM surv")
    sig_cols = ", ".join(
        f"min(({a_s[i]} * hv + {b_s[i]}) % {p}) AS s{i}"
        for i in range(num_hashes)
    )

    def band_expr(b: int) -> str:
        acc = f"CAST({b} AS BIGINT)"
        for r in range(rpb):
            acc = f"(({acc}) * {text.BAND_FOLD_A} + s{b * rpb + r}) % {p}"
        return acc

    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, {band_expr(b)} AS bh FROM sig"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""{shingle},
sig AS (SELECT doc_id, {sig_cols} FROM shl GROUP BY doc_id),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b, ({agree}) / {float(num_hashes)} AS est
    FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
              JOIN sig sb ON cand.id_b = sb.doc_id
  ) WHERE est >= {NEAR_DUP_THRESHOLD}
),
dropd AS (SELECT DISTINCT id_b FROM pairs)"""


def _q388_sql() -> str:
    langs = ", ".join(f"'{x}'" for x in KEEP_LANGS)
    return f"""
WITH base AS (
  SELECT doc_id, text, lang, n_chars,
         (n_chars >= {MIN_CHARS} AND
          len(regexp_split_to_array(trim(text), '\\s+')) >= {MIN_TOKENS})
           AS q_ok
  FROM documents
),
b2 AS (SELECT *, q_ok AND lang IN ({langs}) AS l_ok FROM base),
b3 AS (
  SELECT *,
         l_ok AND doc_id = min(CASE WHEN l_ok THEN doc_id END)
           OVER (PARTITION BY md5(trim(text))) AS canon
  FROM b2
),
surv AS (SELECT doc_id, text FROM b3 WHERE canon),
{_near_dup_cte()},
b4 AS (
  SELECT b3.*,
         canon AND doc_id NOT IN (SELECT id_b FROM dropd) AS kept
  FROM b3
)
SELECT stage_idx, stage, docs FROM (
  SELECT 0 AS stage_idx, 'ingest' AS stage,
         CAST(count(*) AS BIGINT) AS docs FROM b4
  UNION ALL SELECT 1, 'quality_gate',
         CAST(count(*) FILTER (WHERE q_ok) AS BIGINT) FROM b4
  UNION ALL SELECT 2, 'language_policy',
         CAST(count(*) FILTER (WHERE l_ok) AS BIGINT) FROM b4
  UNION ALL SELECT 3, 'exact_dedup',
         CAST(count(*) FILTER (WHERE canon) AS BIGINT) FROM b4
  UNION ALL SELECT 4, 'near_dup_dedup',
         CAST(count(*) FILTER (WHERE kept) AS BIGINT) FROM b4
  UNION ALL SELECT 5, 'split_train',
         CAST(count(*) FILTER (WHERE kept AND doc_id % {TRAIN_MOD}
                               < {VAL_BUCKET}) AS BIGINT) FROM b4
  UNION ALL SELECT 6, 'split_val',
         CAST(count(*) FILTER (WHERE kept AND doc_id % {TRAIN_MOD}
                               = {VAL_BUCKET}) AS BIGINT) FROM b4
  UNION ALL SELECT 7, 'split_test',
         CAST(count(*) FILTER (WHERE kept AND doc_id % {TRAIN_MOD}
                               = {TEST_BUCKET}) AS BIGINT) FROM b4
) ORDER BY stage_idx
"""


QUERIES_EXT75 = {
    "q388_corpus_build_funnel": q388_corpus_build_funnel,
}


def _oracles_ext75() -> dict[str, str]:
    return {
        "q388_corpus_build_funnel": _q388_sql(),
    }
