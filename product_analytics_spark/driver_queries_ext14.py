"""Round-3 driver query families, batch 14 (q191+): Gini-impurity
column profiling, k-NN majority-vote classification accuracy,
leave-one-out target encoding, a cross-table ANALYZE stats sweep,
and the punchcard (day-of-week x hour) activity matrix.

Same contract as the other driver_queries modules; exact-arithmetic
discipline per qcommon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q191

GINI_COLS = [
    ("customer", "c_mktsegment"),
    ("orders", "o_orderpriority"),
    ("orders", "o_orderstatus"),
    ("documents", "lang"),
    ("lineitem", "l_returnflag"),
]


def q191_gini_impurity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-impurity categorical profiling — the split-quality /
    skew-risk statistic (1 − Σpᵢ²) for every declared categorical
    column, computed as the RATIONAL (n² − Σcᵢ²)/n² — entropy's ln is
    deliberately avoided (libm results differ across engines; the
    X32 discipline), and Gini answers the same 'how concentrated is
    this column' question the optimizer and the skew-join planner ask.

    Scale: each column costs one map-side-combinable count agg to
    |distinct values| rows, then a 1-row reduction; the per-column
    subplans are independent and union into one action. This is the
    statistics sweep an ANALYZE-style planner runs per column."""
    outs = []
    for tbl, col in GINI_COLS:
        counts = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        prof = counts.agg(
            F.lit(f"{tbl}.{col}").alias("column_name"),
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        )
        outs.append(prof)
    u = outs[0]
    for p in outs[1:]:
        u = u.unionAll(p)
    n2 = F.col("n").cast("double") * F.col("n").cast("double")
    return u.select(
        "column_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        ((n2 - F.col("sum_c2").cast("double")) / n2).alias("gini_impurity"),
    )


Q191_SQL = " UNION ALL ".join(
    f"""
SELECT '{tbl}.{col}' AS column_name,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_distinct,
       (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE) - CAST(sum(c * c) AS DOUBLE))
       / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) AS gini_impurity
FROM (SELECT {col} AS v, count(*) AS c FROM {tbl} GROUP BY 1)
"""
    for tbl, col in GINI_COLS
)


# ------------------------------------------------------------- q192

VOTE_K = 3


def q192_knn_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification accuracy — the standard
    embedding-quality evaluation: every vector is classified by the
    majority label of its 3 nearest neighbors (leave-one-out, within
    its IVF cell — X54's capped k-NN graph), and the readout is
    per-label accuracy. The vote is deterministic: max count, then
    smallest label (the X44 mode kernel). Everything after the k-NN
    join runs on |vectors×k| rows.

    Scale: inherits X54's cell-blocked economics (never n² pairs);
    the vote and accuracy aggs shuffle 8-byte keys. This is the
    eval loop run after every embedding-model retrain."""
    from product_analytics_spark import driver_queries as dq
    from product_analytics_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    knn = similarity.knn_join_ivf(
        emb,
        centroids=similarity.CENTROIDS_FINE,
        k=VOTE_K,
        dim=dq.EMBEDDING_DIM,
        cap_per_cell=dq.NEAR_DUP_CAP_PER_CELL,
    )
    labels = emb.select("vec_id", "label")
    nb = knn.join(
        F.broadcast(labels.select(F.col("vec_id").alias("neighbor_id"),
                                  F.col("label").alias("nb_label"))),
        "neighbor_id",
    )
    votes = nb.groupBy("vec_id", "nb_label").agg(F.count(F.lit(1)).alias("v"))
    w = Window.partitionBy("vec_id").orderBy(F.col("v").desc(), F.col("nb_label"))
    pred = votes.select(
        "vec_id", "nb_label", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") == 1)
    scored = pred.join(F.broadcast(labels), "vec_id").select(
        "label", (F.col("nb_label") == F.col("label")).alias("correct")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("correct"), 1).otherwise(0)).cast("bigint").alias("n_correct"),
        (
            F.sum(F.when(F.col("correct"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("accuracy"),
    )


def _q192_sql() -> str:
    # late import: driver_queries is mid-initialization when this
    # module loads, but _knn_ctes is defined well before the ext
    # imports at its tail, so the attribute is already present
    from product_analytics_spark import driver_queries as dq

    return f"""
WITH {dq._knn_ctes()},
knn AS (
  SELECT vec_id, neighbor_id FROM r WHERE rank <= {VOTE_K}
),
nb AS (
  SELECT k.vec_id, e.label AS nb_label
  FROM knn k JOIN embeddings e ON k.neighbor_id = e.vec_id
),
votes AS (
  SELECT vec_id, nb_label, count(*) AS v FROM nb GROUP BY 1, 2
),
pred AS (
  SELECT vec_id, nb_label FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY v DESC, nb_label) AS rn
    FROM votes
  ) WHERE rn = 1
),
scored AS (
  SELECT e.label, p.nb_label = e.label AS correct
  FROM pred p JOIN embeddings e ON p.vec_id = e.vec_id
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS accuracy
FROM scored GROUP BY 1
"""


# ------------------------------------------------------------- q193


def q193_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    encoder for tabular ML: each customer's market segment is encoded
    as the mean order revenue of the OTHER customers in the segment,
    (S_g − yᵢ)/(n_g − 1). The group sums come from one window over
    the per-customer relation (exact cents), the per-row exclusion is
    pure arithmetic — no self-join, no second pass, no leakage.
    Customers without orders participate with y=0 (left join +
    coalesce), as a training pipeline would.

    Scale: one fact agg to |customers|, one segment-partitioned
    window; at any scale the window partitions are |segments| wide
    in distinct-key terms, rows spread evenly."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_money_cents("o_totalprice")).alias("y"))
    )
    base = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    wp = Window.partitionBy("c_mktsegment")
    enc = base.select(
        "c_custkey",
        "c_mktsegment",
        "y",
        F.sum("y").over(wp).alias("sg"),
        F.count(F.lit(1)).over(wp).alias("ng"),
    )
    return enc.select(
        "c_custkey",
        "c_mktsegment",
        (
            (F.col("sg") - F.col("y")).cast("double")
            / (F.col("ng") - 1)
            / F.lit(100.0)
        ).alias("loo_encoding"),
    )


Q193_SQL = """
WITH o AS (
  SELECT o_custkey,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders GROUP BY 1
),
base AS (
  SELECT c_custkey, c_mktsegment, coalesce(y, 0) AS y
  FROM customer LEFT JOIN o ON c_custkey = o_custkey
),
enc AS (
  SELECT c_custkey, c_mktsegment, y,
         sum(y) OVER (PARTITION BY c_mktsegment) AS sg,
         count(*) OVER (PARTITION BY c_mktsegment) AS ng
  FROM base
)
SELECT c_custkey, c_mktsegment,
       CAST(sg - y AS DOUBLE) / (ng - 1) / 100.0 AS loo_encoding
FROM enc
"""


# ------------------------------------------------------------- q194

ANALYZE_KEYS = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def q194_analyze_tables_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ANALYZE stats sweep — the optimizer-statistics
    collection pass (row counts, key cardinality, key range) over
    EVERY table in the catalog, in one action: ten independent
    single-agg subplans unioned. These are the numbers a cost-based
    planner (join reordering, broadcast decisions) consumes, and the
    freshness/rowcount drift monitor compares run-over-run.

    Scale: each subplan is a scan + map-side-combinable agg on the
    key column only (column pruning leaves one column per scan);
    nothing shuffles more than partial-agg states."""
    outs = []
    for tbl, key in ANALYZE_KEYS:
        t = _t(spark, sf_dir, tbl)
        outs.append(
            t.agg(
                F.lit(tbl).alias("table_name"),
                F.lit(key).alias("key_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(key).cast("bigint").alias("n_distinct_keys"),
                F.min(key).cast("long").cast("string").alias("min_key"),
                F.max(key).cast("long").cast("string").alias("max_key"),
            )
        )
    u = outs[0]
    for p in outs[1:]:
        u = u.unionAll(p)
    return u


Q194_SQL = " UNION ALL ".join(
    f"""
SELECT '{tbl}' AS table_name, '{key}' AS key_col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {key}) AS BIGINT) AS n_distinct_keys,
       CAST(CAST(min({key}) AS BIGINT) AS VARCHAR) AS min_key,
       CAST(CAST(max({key}) AS BIGINT) AS VARCHAR) AS max_key
FROM {tbl}
"""
    for tbl, key in ANALYZE_KEYS
)


# ------------------------------------------------------------- q195


def q195_punchcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punchcard activity matrix — event counts by (day-of-week,
    hour-of-day) with each cell's share of its weekday: the telemetry
    heatmap behind load scheduling and anomaly eyeballing. One count
    agg + one 7-partition window; shares are exact-count double
    divisions. Weekday numbering is pinned to Spark's dayofweek
    (1=Sunday) and the oracle mirrors it explicitly (DuckDB's dow is
    0=Sunday — cross-engine calendar drift is a classic silent bug).

    Scale: the aggregate has at most 168 output rows no matter the
    event volume — pure map-side combine."""
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("dow")
    return cells.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hour").cast("int").alias("hour"),
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(wd)).alias("dow_share"),
    )


Q195_SQL = """
WITH cells AS (
  SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT dow, hour, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY dow) AS dow_share
FROM cells
"""


QUERIES_EXT14 = {
    "q191_gini_impurity_profile": q191_gini_impurity_profile,
    "q192_knn_vote_accuracy": q192_knn_vote_accuracy,
    "q193_target_encoding_loo": q193_target_encoding_loo,
    "q194_analyze_tables_sweep": q194_analyze_tables_sweep,
    "q195_punchcard": q195_punchcard,
}


def _oracles_ext14() -> dict[str, str]:
    return {
        "q191_gini_impurity_profile": Q191_SQL,
        "q192_knn_vote_accuracy": _q192_sql(),
        "q193_target_encoding_loo": Q193_SQL,
        "q194_analyze_tables_sweep": Q194_SQL,
        "q195_punchcard": Q195_SQL,
    }
