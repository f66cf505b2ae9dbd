"""Round-5 driver query families, batch 57 (q343-q346): the hidden
``_metadata`` file-provenance door, Kneser-Ney continuation counts
(the n-gram LM smoothing statistic), deterministic discrete-Laplace
noisy counts (the DP release mechanism, arithmetic certified), and
reciprocal-rank fusion of two retrieval rankings (the RAG ensemble
primitive).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.operators import text
from product_analytics_spark.qcommon import _hash60_sql, _t

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------- q343

Q343_DIR = os.path.join(_REPO, ".fixtures", ".q343_files")


def q343_file_provenance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: the hidden ``_metadata`` struct on file sources —
    per-row file provenance (file_path, file_size, row_index) with no
    extra scan or join. The audit a lakehouse writer runs after a
    partitioned write: each partition directory holds exactly the
    files the layout contract promises (1 per partition here, because
    the write repartitions ON the partition column so each year lives
    in exactly one task), every file's ``row_index`` is a contiguous
    0..n-1 sequence (the zone-map/row-group invariant data-skipping
    relies on), and sizes are positive.

    Scale: ``_metadata`` columns are constant-per-file virtual
    columns materialized by the scan itself — the provenance audit is
    ONE pass over the read-back, grouped on (year, file) which is
    |files|-sized, never |rows|-sized state.  The same pattern drives
    per-file quarantine (bad-file isolation) on a 100 TB lake, where
    the alternative — joining rows to a file manifest — would shuffle
    the whole table.
    """
    shutil.rmtree(Q343_DIR, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    (
        orders.repartition("order_year")
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(Q343_DIR)
    )
    back = spark.read.parquet(Q343_DIR).select(
        "order_year",
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.file_size").alias("_fs"),
        F.col("_metadata.row_index").alias("_ri"),
    )
    per_file = back.groupBy("order_year", "_fp").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("_ri").alias("_max_ri"),
        F.min("_ri").alias("_min_ri"),
        F.min("_fs").alias("_sz"),
    )
    return (
        per_file.groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("_n").alias("n_rows"),
            (
                F.min(
                    (F.col("_max_ri") - F.col("_min_ri") + 1 == F.col("_n"))
                    & (F.col("_min_ri") == 0)
                ).alias("row_index_contiguous")
            ),
            F.min(F.col("_sz") > 0).alias("bytes_positive"),
        )
        .select(
            "order_year",
            F.col("n_files").cast("long").alias("n_files"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_files") == 1).alias("files_per_partition_ok"),
            "row_index_contiguous",
            "bytes_positive",
        )
        .orderBy("order_year")
    )


Q343_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(1 AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS files_per_partition_ok,
       TRUE AS row_index_contiguous,
       TRUE AS bytes_positive
FROM orders GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------- q344

KN_MIN_CC = 2
KN_TOPK = 30
KN_SCALE = 1_000_000


def q344_kneser_ney_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts — the n-gram LM smoothing
    statistic q74's raw bigram counts cannot provide: for each word w,
    how many DISTINCT left contexts precede it (N1+(.w)), versus its
    raw occurrence count.  "francisco" is frequent but continues only
    "san"; interpolated KN backs off to cc/T (T = distinct bigram
    types), not raw frequency.  Output: top-{K} words by continuation
    count with the exact floor-scaled continuation probability
    cc*1e6 // T (integer arithmetic, engine-exact).

    Scale: tokens explode map-side (the q74 zip-shift kernel), ONE
    hash-agg to distinct (a,b) pairs with map-side partial combine
    (the shuffle carries distinct pairs, not corpus tokens), a second
    |pairs|-sized agg per b, and T rides a whole-relation window over
    the |vocab|-sized result (q171 idiom — no rescan, no 1-row cross
    join).  Top-k = TakeOrderedAndProject."""
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
    pairs = staged.select(F.explode(pairs_arr).alias("_bg")).groupBy(
        F.col("_bg.a").alias("a"), F.col("_bg.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_w = pairs.groupBy(F.col("b").alias("token")).agg(
        F.count(F.lit(1)).alias("continuation_count"),
        F.sum("_n").alias("raw_count"),
    )
    w_all = Window.partitionBy()
    out = per_w.withColumn(
        "_t_types", F.sum("continuation_count").over(w_all)
    ).select(
        "token",
        F.col("continuation_count").cast("long").alias("continuation_count"),
        F.col("raw_count").cast("long").alias("raw_count"),
        F.expr(
            f"continuation_count * {KN_SCALE}L div _t_types"
        ).alias("kn_prob_micro"),
    )
    return (
        out.filter(F.col("continuation_count") >= KN_MIN_CC)
        .orderBy(F.desc("continuation_count"), F.desc("raw_count"), "token")
        .limit(KN_TOPK)
    )


Q344_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT t[idx] AS a, t[idx+1] AS b
  FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(idx)
),
pairs AS (SELECT a, b, count(*) AS n FROM bg GROUP BY 1, 2),
per_w AS (
  SELECT b AS token,
         CAST(count(*) AS BIGINT) AS continuation_count,
         CAST(sum(n) AS BIGINT) AS raw_count
  FROM pairs GROUP BY 1
),
tt AS (
  SELECT token, continuation_count, raw_count,
         sum(continuation_count) OVER () AS t_types
  FROM per_w
)
SELECT token, continuation_count, raw_count,
       CAST((continuation_count * {KN_SCALE}) // t_types AS BIGINT)
         AS kn_prob_micro
FROM tt WHERE continuation_count >= {KN_MIN_CC}
ORDER BY continuation_count DESC, raw_count DESC, token LIMIT {KN_TOPK}
"""


# ------------------------------------------------------------- q345

DP_SALT = "dp-r5"
DP_CAP = 16


def _geo_noise_sql(h: str) -> str:
    """Engine-portable deterministic discrete-Laplace (two-sided
    geometric p=1/2) noise from a 60-bit hash ``h``: magnitude =
    trailing-zero count of the low bits (P[mag=k] = 2^-(k+1), capped
    at {DP_CAP}), sign = bit 59 (via one comparison — no shifts, no
    float division, so the text runs identically in Spark SQL and
    DuckDB). Integer-only arithmetic end to end."""
    whens = " ".join(
        f"WHEN {h} % {1 << (k + 1)} = {1 << k} THEN {k}" for k in range(DP_CAP)
    )
    mag = f"(CASE {whens} ELSE {DP_CAP} END)"
    sign = f"(CASE WHEN {h} >= {1 << 59} THEN 1 ELSE -1 END)"
    return f"CAST({sign} * {mag} AS BIGINT)"


def q345_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release, mechanism certified
    deterministically: per-nation customer counts + discrete-Laplace
    noise (two-sided geometric p=1/2 <=> the geometric mechanism at
    eps = ln 2 for count sensitivity 1), with the noise drawn from a
    keyed portable hash instead of an RNG so the oracle replays it
    bit-for-bit.  A production release would swap the hash for a
    cryptographic DRBG — SAME arithmetic, which is exactly the part a
    correctness gate can pin.  Clamping at 0 is the standard
    post-processing step (free under DP).

    Scale: one hash-agg on the grouping key; the noise expression is
    per-GROUP (|nations| rows), pure codegen arithmetic — the
    mechanism adds zero shuffles at any corpus size."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    grp = (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    h = text.portable_hash60(
        F.concat(F.lit(DP_SALT), F.col("n_name"))
    )
    out = grp.select(
        F.col("n_name").alias("nation"),
        F.col("true_n").cast("long").alias("true_n"),
        h.alias("_h"),
    ).withColumn("noise", F.expr(_geo_noise_sql("_h")))
    return out.select(
        "nation",
        "true_n",
        "noise",
        (F.col("true_n") + F.col("noise")).alias("noisy_n"),
        F.greatest(
            F.col("true_n") + F.col("noise"), F.lit(0).cast("long")
        ).alias("released_n"),
    ).orderBy("nation")


def _q345_sql() -> str:
    h = _hash60_sql(f"'{DP_SALT}' || nation")
    return f"""
WITH g AS (
  SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS true_n
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
),
h AS (SELECT nation, true_n, {h} AS _h FROM g),
z AS (SELECT nation, true_n, {_geo_noise_sql('_h')} AS noise FROM h)
SELECT nation, true_n, noise,
       CAST(true_n + noise AS BIGINT) AS noisy_n,
       CAST(greatest(true_n + noise, 0) AS BIGINT) AS released_n
FROM z ORDER BY nation
"""


# ------------------------------------------------------------- q346

RRF_PROBE_ID = 0
RRF_POOL = 50
RRF_K = 60
RRF_TOPK = 10
RRF_SCALE = 1_000_000_000_000


def q346_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POOL-BOUNDED reciprocal-rank fusion — the production variant
    of q125's full-relation RRF (ext3): real hybrid search fuses each
    retriever's top-N LIST, not a rank over the whole corpus, so
    membership is partial and absence semantics matter.  Rank the
    corpus against the probe by (a) cosine and (b) L2 distance (they
    order DIFFERENTLY when norms vary — q125's second signal is norm
    itself), keep each ranking's top-{POOL} pool, fuse with
    RRF(k={K}): score = sum over rankings of 1/(k + rank), absent
    => 0.  Unlike q125's float scores, these are exact floor-scaled
    integers (1e12 // (k+r)) so ordering is engine-portable even at
    deep rank ties; absent ranks surface as -1 (typed, never NULL).

    Scale: each ranking is a TakeOrderedAndProject top-{POOL} (the
    q21 distributed top-k — no global sort); the row_number that
    assigns pool ranks runs on the {POOL}-row pool, not the corpus;
    fusion is a {POOL}x{POOL}-bounded full-outer join on vec_id.  At
    100 TB the cosine pass swaps for the IVF path (q39) unchanged —
    RRF only ever sees the pools."""
    emb = _t(spark, sf_dir, "embeddings")
    probe = (
        emb.filter(F.col("vec_id") == RRF_PROBE_ID)
        .select("embedding")
        .first()[0]
    )
    p = F.array(*[F.lit(float(v)) for v in probe])
    others = emb.filter(F.col("vec_id") != RRF_PROBE_ID).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("e"), p, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.aggregate(
        F.zip_with(F.col("e"), F.col("e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pn = float(sum(float(v) * float(v) for v in probe))
    l2 = F.aggregate(
        F.zip_with(F.col("e"), p, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = others.select(
        "vec_id",
        (dot / (F.sqrt(nrm) * F.sqrt(F.lit(pn)))).alias("_cos"),
        l2.alias("_l2"),
    )
    pool_a = scored.orderBy(F.desc("_cos"), "vec_id").limit(RRF_POOL)
    pool_b = scored.orderBy(F.asc("_l2"), "vec_id").limit(RRF_POOL)
    wa = Window.orderBy(F.desc("_cos"), "vec_id")
    wb = Window.orderBy(F.asc("_l2"), "vec_id")
    ra = pool_a.select(
        "vec_id", F.row_number().over(wa).cast("long").alias("rank_cosine")
    )
    rb = pool_b.select(
        "vec_id", F.row_number().over(wb).cast("long").alias("rank_l2")
    )
    fused = ra.join(rb, "vec_id", "full_outer").select(
        "vec_id",
        F.coalesce("rank_cosine", F.lit(-1).cast("long")).alias("rank_cosine"),
        F.coalesce("rank_l2", F.lit(-1).cast("long")).alias("rank_l2"),
    )
    contrib = (
        f"CASE WHEN rank_cosine > 0 THEN {RRF_SCALE}L div ({RRF_K} + rank_cosine)"
        " ELSE 0L END + "
        f"CASE WHEN rank_l2 > 0 THEN {RRF_SCALE}L div ({RRF_K} + rank_l2)"
        " ELSE 0L END"
    )
    return (
        fused.withColumn("rrf_score_pico", F.expr(contrib))
        .orderBy(F.desc("rrf_score_pico"), "vec_id")
        .limit(RRF_TOPK)
    )


Q346_SQL = f"""
WITH probe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings
  WHERE vec_id = {RRF_PROBE_ID}
),
scored AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), p)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(p, p))) AS c,
         list_sum(list_transform(generate_series(1, len(p)), k ->
           (CAST(embedding AS DOUBLE[])[k] - p[k])
           * (CAST(embedding AS DOUBLE[])[k] - p[k]))) AS d
  FROM embeddings, probe WHERE vec_id != {RRF_PROBE_ID}
),
ra AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS BIGINT)
           AS rank_cosine
  FROM scored ORDER BY c DESC, vec_id LIMIT {RRF_POOL}
),
rb AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY d ASC, vec_id) AS BIGINT)
           AS rank_l2
  FROM scored ORDER BY d ASC, vec_id LIMIT {RRF_POOL}
),
fused AS (
  SELECT coalesce(ra.vec_id, rb.vec_id) AS vec_id,
         coalesce(rank_cosine, -1) AS rank_cosine,
         coalesce(rank_l2, -1) AS rank_l2
  FROM ra FULL OUTER JOIN rb ON ra.vec_id = rb.vec_id
)
SELECT vec_id, rank_cosine, rank_l2,
       CAST(CASE WHEN rank_cosine > 0
                 THEN {RRF_SCALE} // ({RRF_K} + rank_cosine) ELSE 0 END
            + CASE WHEN rank_l2 > 0
                   THEN {RRF_SCALE} // ({RRF_K} + rank_l2) ELSE 0 END
            AS BIGINT) AS rrf_score_pico
FROM fused ORDER BY rrf_score_pico DESC, vec_id LIMIT {RRF_TOPK}
"""


QUERIES_EXT57 = {
    "q343_file_provenance_audit": q343_file_provenance_audit,
    "q344_kneser_ney_continuation": q344_kneser_ney_continuation,
    "q345_dp_noisy_counts": q345_dp_noisy_counts,
    "q346_reciprocal_rank_fusion": q346_reciprocal_rank_fusion,
}


def _oracles_ext57() -> dict[str, str]:
    return {
        "q343_file_provenance_audit": Q343_SQL,
        "q344_kneser_ney_continuation": Q344_SQL,
        "q345_dp_noisy_counts": _q345_sql(),
        "q346_reciprocal_rank_fusion": Q346_SQL,
    }
