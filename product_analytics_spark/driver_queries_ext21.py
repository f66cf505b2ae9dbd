"""Round-3 driver query families, batch 21 (q207+): hard-negative
triplet mining, corpus mixture reweighting with deterministic float
summation, and inference padding-waste bucketing.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q207

TRIPLET_K = 5


def q207_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining — the contrastive-training data
    op: for each anchor vector, (positive, negative) = its most
    similar SAME-label and most similar OTHER-label neighbor from the
    k-NN graph (X54's cell-capped kernel, k=5), with the margin
    pos_sim − neg_sim. Anchors lacking either side within their k
    neighborhood drop out (inner join of the two sides) — exactly the
    in-batch availability constraint real miners face. Deterministic:
    neighbor ranking is (sim desc, id) from the graph; the per-side
    pick is a rank-1 window.

    Scale: everything after the k-NN join runs on |vectors × k|
    rows; the two rank windows share one vec_id partitioning. Margin
    is a subtraction of two already-rounded doubles — identical on
    both engines."""
    from product_analytics_spark import driver_queries as dq
    from product_analytics_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    knn = similarity.knn_join_ivf(
        emb,
        centroids=similarity.CENTROIDS_FINE,
        k=TRIPLET_K,
        dim=dq.EMBEDDING_DIM,
        cap_per_cell=dq.NEAR_DUP_CAP_PER_CELL,
    )
    labels = emb.select("vec_id", "label")
    g = (
        knn.join(F.broadcast(labels), "vec_id")
        .join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("nb_label"),
                )
            ),
            "neighbor_id",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    pos = (
        g.filter(F.col("nb_label") == F.col("label"))
        .select("vec_id", "neighbor_id", "cosine_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("neighbor_id").alias("pos_id"),
            F.col("cosine_sim").alias("pos_sim"),
        )
    )
    neg = (
        g.filter(F.col("nb_label") != F.col("label"))
        .select("vec_id", "neighbor_id", "cosine_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("neighbor_id").alias("neg_id"),
            F.col("cosine_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "vec_id").select(
        F.col("vec_id").alias("anchor_id"),
        "pos_id",
        "neg_id",
        (F.col("pos_sim") - F.col("neg_sim")).alias("margin"),
    )


def _q207_sql() -> str:
    from product_analytics_spark import driver_queries as dq

    return f"""
WITH {dq._knn_ctes()},
knn AS (
  SELECT vec_id, neighbor_id, round(sim, 4) AS cosine_sim
  FROM r WHERE rank <= {TRIPLET_K}
),
g AS (
  SELECT k.vec_id, k.neighbor_id, k.cosine_sim,
         ea.label AS label, eb.label AS nb_label
  FROM knn k
  JOIN embeddings ea ON k.vec_id = ea.vec_id
  JOIN embeddings eb ON k.neighbor_id = eb.vec_id
),
pos AS (
  SELECT vec_id, neighbor_id AS pos_id, cosine_sim AS pos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cosine_sim DESC, neighbor_id) AS rn
    FROM g WHERE nb_label = label
  ) WHERE rn = 1
),
neg AS (
  SELECT vec_id, neighbor_id AS neg_id, cosine_sim AS neg_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cosine_sim DESC, neighbor_id) AS rn
    FROM g WHERE nb_label != label
  ) WHERE rn = 1
)
SELECT p.vec_id AS anchor_id, pos_id, neg_id, pos_sim - neg_sim AS margin
FROM pos p JOIN neg n ON p.vec_id = n.vec_id
"""


# ------------------------------------------------------------- q208

MIX_ALPHA_SQRT = True  # weights ∝ sqrt(token count), the standard temper


def q208_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture reweighting — the multilingual/domain sampling
    op: per (lang, source) token counts tempered by sqrt (α = 0.5),
    normalized to sampling weights, plus the implied epochs-per-
    source (weight · total_tokens / own_tokens). The trap this query
    exists to demonstrate: a normalizer Σ√cᵢ summed in FLOAT is not
    reproducible — float addition is non-associative, Spark's window
    sum accumulates left-to-right while DuckDB's uses a pairwise
    segment tree, and a first cut of this query drifted at sf0.1 for
    exactly that reason. The fix is the X32 discipline: temper with
    the INTEGER sqrt (floor(sqrt(c)) — IEEE sqrt is correctly
    rounded, so the floor is the same integer on any engine for
    c < 2^52), making the normalizer an exact integer sum that is
    order-independent at any parallelism; floats appear only in the
    final per-row divisions.

    Scale: one fact agg to |lang × source|; the normalizer is a
    plain integer window total on that dim-sized relation."""
    d = _t(spark, sf_dir, "documents")
    from product_analytics_spark.operators import text as tx

    counts = d.groupBy("lang", "source").agg(
        F.sum(tx.token_count(F.col("text")).cast("long")).alias("tokens")
    )
    sq = counts.select(
        "lang",
        "source",
        "tokens",
        F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long").alias("tsq"),
    )
    wall = Window.partitionBy()
    cum = sq.select(
        "lang",
        "source",
        "tokens",
        "tsq",
        F.sum("tsq").over(wall).alias("norm"),
        F.sum("tokens").over(wall).alias("total_tokens"),
    )
    weight = F.col("tsq").cast("double") / F.col("norm").cast("double")
    return cum.select(
        "lang",
        "source",
        F.col("tokens").cast("bigint").alias("tokens"),
        weight.alias("weight"),
        (
            weight * F.col("total_tokens").cast("double") / F.col("tokens").cast("double")
        ).alias("epochs"),
    )


Q208_SQL = """
WITH counts AS (
  SELECT lang, source,
         sum(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)) AS tokens
  FROM documents GROUP BY 1, 2
),
sq AS (
  SELECT lang, source, tokens,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS tsq
  FROM counts
),
cum AS (
  SELECT lang, source, tokens, tsq,
         sum(tsq) OVER () AS norm,
         sum(tokens) OVER () AS total_tokens
  FROM sq
)
SELECT lang, source, CAST(tokens AS BIGINT) AS tokens,
       CAST(tsq AS DOUBLE) / CAST(norm AS DOUBLE) AS weight,
       CAST(tsq AS DOUBLE) / CAST(norm AS DOUBLE)
         * CAST(total_tokens AS DOUBLE) / CAST(tokens AS DOUBLE) AS epochs
FROM cum
"""


# ------------------------------------------------------------- q209


def q209_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference padding-waste audit — the batching-efficiency op:
    documents bucket by next-power-of-two token length (the standard
    bucketed-batching scheme), and each bucket reports its padding
    waste Σ(bucket_cap − len) and utilization — the numbers that
    decide bucket boundaries for a serving fleet. The power-of-two
    cap comes from bit-length arithmetic on integers (no log2 floats
    to drift): cap = 1 << bit_length(len − 1).

    Scale: pure map-side derivation + one ≤~16-row agg; at fleet
    scale this runs over request logs and the waste column prices
    the batching config in FLOP-seconds."""
    d = _t(spark, sf_dir, "documents")
    from product_analytics_spark.operators import text as tx

    lens = d.select(tx.token_count(F.col("text")).cast("long").alias("n")).filter(
        F.col("n") > 0
    )
    # next power of two >= n: 2^ceil(log2(n)) via string bit-length
    # (conv/bin of n-1), exact integer arithmetic on both engines —
    # no log2 floats to drift at power-of-two boundaries
    cap = F.expr(
        "CASE WHEN n = 1 THEN CAST(1 AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), "
        "CAST(length(conv(n - 1, 10, 2)) AS INT)) END"
    )
    bucketed = lens.select("n", cap.alias("cap"))
    return bucketed.groupBy("cap").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(F.col("cap") - F.col("n")).cast("bigint").alias("padding_waste"),
        (
            F.sum("n").cast("double")
            / (F.count(F.lit(1)) * F.max("cap")).cast("double")
        ).alias("utilization"),
    )


Q209_SQL = """
WITH lens AS (
  SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) > 0
),
bucketed AS (
  SELECT n,
         CASE WHEN n = 1 THEN 1
              ELSE (CAST(1 AS BIGINT) << CAST(length(bin(n - 1)) AS INT)) END AS cap
  FROM lens
)
SELECT cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(cap - n) AS BIGINT) AS padding_waste,
       CAST(sum(n) AS DOUBLE) / CAST(count(*) * max(cap) AS DOUBLE) AS utilization
FROM bucketed GROUP BY 1
"""


QUERIES_EXT21 = {
    "q207_triplet_mining": q207_triplet_mining,
    "q208_mixture_weights": q208_mixture_weights,
    "q209_padding_waste": q209_padding_waste,
}


def _oracles_ext21() -> dict[str, str]:
    return {
        "q207_triplet_mining": _q207_sql(),
        "q208_mixture_weights": Q208_SQL,
        "q209_padding_waste": Q209_SQL,
    }
