"""Round-3 driver query families, batch 4 (q136+): the sparse
matrix-multiply join kernel, product growth curves, dimensional-
modeling shapes (accumulating snapshot, SCD Type-3), and the bucketed
co-located join exercised through the on-disk table path.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.operators import text
from product_analytics_spark.qcommon import (
    _cents_out,
    _hash60_sql,
    _money_cents,
    _t,
)

# ------------------------------------------------------------- q136

MATMUL_FEATURES = 4


def q136_sparse_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed sparse matrix multiply — the join-aggregate kernel
    under embedding projection, graph message passing, and topic
    scoring alike: C(i,j) = Σ_k A(i,k)·B(k,j) as (A ⋈ B on k) →
    hash-agg on (i,j). A = doc-term counts (tokens stay map-side
    until the one (doc,term) hash-agg); B = a derived term-feature
    map (2 features per term from the portable hash + token length —
    deterministic, so the oracle rebuilds it bit-for-bit). Shuffles
    move (i,k,v)/(k,j,w) triples, never dense rows; skewed hub terms
    are AQE-split like any hot join key; at 100 TB B is dim-sized and
    broadcasts."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(text.tokens(F.lower(F.col("text")))).alias("t")
    ).filter(F.col("t") != "")
    from product_analytics_spark import cache

    # A feeds both the multiply join and the terms relation B derives
    # from — persist so the tokenize+agg subtree runs once, not twice.
    a = cache.persist(tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("v")))
    terms = a.select("t").distinct()
    h = text.portable_hash60(F.col("t"))
    h_div = F.expr(
        f"CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) "
        f"div {MATMUL_FEATURES} % {MATMUL_FEATURES}"
    )
    # Both features in ONE pass over the distinct-terms relation (a
    # union of two selects would re-derive the token aggregate twice).
    b = terms.select(
        "t",
        F.explode(
            F.array(
                F.struct(
                    (h % MATMUL_FEATURES).alias("j"),
                    F.length("t").cast("long").alias("w"),
                ),
                F.struct(h_div.alias("j"), F.lit(1).cast("long").alias("w")),
            )
        ).alias("f"),
    ).select("t", F.col("f.j").alias("j"), F.col("f.w").alias("w"))
    c = (
        a.join(b, "t")
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("v") * F.col("w")).alias("value"))
    )
    return c.select("doc_id", F.col("j").alias("feature_id"), "value")


def _q136_sql() -> str:
    h = _hash60_sql("t")
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents
),
a AS (
  SELECT doc_id, t, count(*) AS v FROM tok WHERE t != '' GROUP BY 1, 2
),
terms AS (SELECT DISTINCT t FROM a),
b AS (
  SELECT t, {h} % {MATMUL_FEATURES} AS j, CAST(length(t) AS BIGINT) AS w FROM terms
  UNION ALL
  SELECT t, ({h} // {MATMUL_FEATURES}) % {MATMUL_FEATURES} AS j, CAST(1 AS BIGINT) AS w
  FROM terms
)
SELECT a.doc_id, b.j AS feature_id, CAST(sum(a.v * b.w) AS BIGINT) AS value
FROM a JOIN b ON b.t = a.t
GROUP BY 1, 2
"""


# ------------------------------------------------------------- q137

def q137_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product growth curve: per day, newly-acquired users (first-ever
    activity) and the cumulative user base. Full-data work is ONE
    user-keyed min; the cumulative window runs over the post-aggregate
    |days| relation where a single-reducer sort is trivial."""
    e = _t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    per_day = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(wcum).alias("cum_users"),
    )


Q137_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day
  FROM events GROUP BY 1
),
per_day AS (SELECT day, count(*) AS new_users FROM first GROUP BY 1)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM per_day
"""


# ------------------------------------------------------------- q138

ACC_STAGES = ("signup", "view", "click", "purchase")


def q138_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact table (Kimball's order-lifecycle
    shape): one row per user with the FIRST completion timestamp of
    each milestone and µs-exact stage durations (NULL until the later
    milestone exists and follows the earlier one). All milestones come
    from ONE user-keyed hash-agg of conditional mins — no per-stage
    self-joins. The strict in-order funnel walk is q57; this is the
    wide dimensional-modeling readout."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    aggs = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in ACC_STAGES
    ]
    g = e.groupBy("user_id").agg(*aggs)

    def dur(a: str, b: str) -> F.Column:
        ta, tb = F.col(f"t_{a}"), F.col(f"t_{b}")
        return F.when(
            ta.isNotNull() & tb.isNotNull() & (tb >= ta),
            F.unix_micros(tb) - F.unix_micros(ta),
        )

    return g.select(
        "user_id",
        *[F.col(f"t_{s}") for s in ACC_STAGES],
        dur("signup", "view").alias("signup_to_view_us"),
        dur("view", "click").alias("view_to_click_us"),
        dur("click", "purchase").alias("click_to_purchase_us"),
    )


def _q138_sql() -> str:
    mins = ",\n         ".join(
        f"min(CASE WHEN event_type = '{s}' THEN ts END) AS t_{s}" for s in ACC_STAGES
    )
    durs = ",\n       ".join(
        f"CASE WHEN t_{a} IS NOT NULL AND t_{b} IS NOT NULL AND t_{b} >= t_{a} "
        f"THEN epoch_us(t_{b}) - epoch_us(t_{a}) END AS {a}_to_{b}_us"
        for a, b in zip(ACC_STAGES, ACC_STAGES[1:])
    )
    cols = ", ".join(f"t_{s}" for s in ACC_STAGES)
    return f"""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
g AS (
  SELECT user_id,
         {mins}
  FROM e GROUP BY 1
)
SELECT user_id, {cols},
       {durs}
FROM g
"""


# ------------------------------------------------------------- q139

def q139_scd3_prev_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-3 readout (current + previous attribute value as
    columns — the 'previous segment' pattern): per customer, the
    latest and second-latest order status by (order date, order key).
    One customer-keyed window ranks the history; rank<=2 rows pivot to
    wide with conditional max — no self-join. SCD2 keeps full history
    (X22/q48); Type 3 keeps exactly one generation back."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    r = o.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 2)
    return r.groupBy("o_custkey").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("o_orderstatus"))).alias(
            "current_status"
        ),
        F.max(F.when(F.col("_rn") == 2, F.col("o_orderstatus"))).alias(
            "prev_status"
        ),
        F.max(F.when(F.col("_rn") == 1, F.col("o_orderdate"))).alias(
            "current_order_date"
        ),
    )


Q139_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey,
       max(CASE WHEN rn = 1 THEN o_orderstatus END) AS current_status,
       max(CASE WHEN rn = 2 THEN o_orderstatus END) AS prev_status,
       max(CASE WHEN rn = 1 THEN o_orderdate END) AS current_order_date
FROM r WHERE rn <= 2
GROUP BY o_custkey
"""


# ------------------------------------------------------------- q140

Q140_BUCKETS = 8


def q140_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-layer driver evidence for bucketed co-located joins: orders
    and lineitem are written as bucketed+sorted tables on the order
    key (same bucket count), read back, and joined — the executed plan
    has NO Exchange on either join side (pinned by
    tests/test_sinks.py::TestBucketedJoin). Pay the partitioning once
    at write, join shuffle-free every run after — the 100 TB recipe
    for repeated fact-to-fact joins. The oracle recomputes from the
    raw tables, so the whole write→read→join path must be value-exact.
    """
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    for t in ("q140_orders_bkt", "q140_lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(Q140_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("q140_orders_bkt")
    )
    (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", _money_cents("l_extendedprice").alias("price_c"))
        .write.bucketBy(Q140_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("q140_lineitem_bkt")
    )
    j = spark.table("q140_orders_bkt").join(
        spark.table("q140_lineitem_bkt"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        _cents_out(F.sum("price_c")).alias("total_price"),
    )


Q140_SQL = """
SELECT o_orderstatus, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice * 100 AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


QUERIES_EXT5 = {
    "q136_sparse_matmul": q136_sparse_matmul,
    "q137_user_growth_curve": q137_user_growth_curve,
    "q138_accumulating_snapshot": q138_accumulating_snapshot,
    "q139_scd3_prev_value": q139_scd3_prev_value,
    "q140_bucketed_join_agg": q140_bucketed_join_agg,
}

ORACLES_EXT5 = {
    "q136_sparse_matmul": _q136_sql(),
    "q137_user_growth_curve": Q137_SQL,
    "q138_accumulating_snapshot": _q138_sql(),
    "q139_scd3_prev_value": Q139_SQL,
    "q140_bucketed_join_agg": Q140_SQL,
}
