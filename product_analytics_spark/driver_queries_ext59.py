"""Round-5 driver query families, batch 59 (q351-q352): rolling
7-day distinct actives (the WAU/MAU engagement series) and conformance
certificate #12 — higher-order array-function semantics, including the
one documented cross-engine divergence (distinct-order preservation).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q351

WAU_WINDOW = 7


def q351_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {W}-day distinct active users per day — the WAU series
    (and the reason naive window frames fail: DISTINCT does not
    decompose over a sliding frame, so ``count(distinct) OVER (RANGE 6
    PRECEDING)`` is unsupported/wrong in most engines).  The exact
    decomposition: distinct (user, day) pairs, each pair VOTES for the
    {W} target days it keeps active, re-distinct on (user, target),
    count per target.  Emitted for observed days only (inner join to
    the day list), with same-day DAU alongside.

    Scale: the vote explode multiplies the |user x day| ACTIVE-PAIR
    relation (already deduped, far smaller than events) by {W}, all
    map-side; both distincts are hash-aggs on compact long keys. At
    100 TB the exact re-distinct swaps for per-day HLL sketches merged
    over the window (q247's hll_union door) — same vote shape, sketch
    state instead of pair state."""
    e = _t(spark, sf_dir, "events")
    pairs = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).alias("d"),
    ).distinct()
    days = pairs.select("d").distinct()
    votes = (
        pairs.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.col("d") + F.lit(WAU_WINDOW - 1))
            ).alias("t"),
        )
        .distinct()
        .join(days.select(F.col("d").alias("t")), "t")
    )
    wau = votes.groupBy("t").agg(F.count(F.lit(1)).alias("wau"))
    dau = pairs.groupBy(F.col("d").alias("t")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        wau.join(dau, "t")
        .select(
            F.date_format(
                F.expr("date_add(DATE '2024-01-01', CAST(t AS INT))"),
                "yyyy-MM-dd",
            ).alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
        .orderBy("day")
    )


Q351_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
days AS (SELECT DISTINCT d FROM pairs),
votes AS (
  SELECT DISTINCT p.user_id, p.d + off AS t
  FROM pairs p, unnest(generate_series(0, {WAU_WINDOW - 1})) AS u(off)
),
wau AS (
  SELECT v.t, CAST(count(*) AS BIGINT) AS wau
  FROM votes v JOIN days dd ON dd.d = v.t
  GROUP BY 1
),
dau AS (SELECT d AS t, CAST(count(*) AS BIGINT) AS dau FROM pairs GROUP BY 1)
SELECT strftime(DATE '2024-01-01' + INTERVAL (w.t) DAY, '%Y-%m-%d') AS day,
       dau.dau, w.wau
FROM wau w JOIN dau ON dau.t = w.t
ORDER BY day
"""


# ------------------------------------------------------------- q352

HOF_MOD = 29  # keep the certified order subset small but real


def q352_hof_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #12: higher-order array-function
    semantics over real per-order quantity arrays — transform,
    filter, exists, forall, and the fold (aggregate/list_reduce) all
    certified value-identical across engines, plus the one genuine
    divergence this probe DOCUMENTS: Spark's ``array_distinct``
    preserves first-occurrence order while DuckDB's ``list_distinct``
    is unordered — so the portable idiom is sort-after-distinct, and
    THAT is the compared value.  Arrays are built with an explicit
    linenumber sort key (collect order is partition-dependent in any
    engine; sort_array(struct) pins it).

    Scale: arrays are per-order (bounded fan-in ~7); everything is
    one groupBy + codegen'd lambda expressions — no Python, no
    shuffle beyond the one order-keyed agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % HOF_MOD == 0
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").cast("long").alias("q"),
                    )
                )
            ),
            lambda s: s["q"],
        ).alias("qs")
    )
    qs = F.col("qs")
    folded = F.aggregate(qs, F.lit(0).cast("long"), lambda a, x: a + x)
    return per_order.select(
        "l_orderkey",
        F.size(qs).alias("n_items"),
        F.aggregate(
            F.transform(qs, lambda x: x * 2), F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_2x"),
        F.size(F.filter(qs, lambda x: x % 2 == 0)).alias("n_even"),
        F.exists(qs, lambda x: x > 40).alias("any_gt40"),
        F.forall(qs, lambda x: x > 0).alias("all_pos"),
        folded.alias("fold_sum"),
        F.concat_ws(",", F.transform(F.array_sort(qs), lambda x: x.cast("string"))).alias(
            "sorted_str"
        ),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.array_distinct(qs)), lambda x: x.cast("string")
            ),
        ).alias("distinct_sorted_str"),
    ).orderBy("l_orderkey")


Q352_SQL = f"""
WITH arr AS (
  SELECT l_orderkey,
         list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber) AS qs
  FROM lineitem WHERE l_orderkey % {HOF_MOD} = 0 GROUP BY 1
)
SELECT l_orderkey,
       CAST(len(qs) AS INT) AS n_items,
       CAST(list_sum(list_transform(qs, x -> x * 2)) AS BIGINT) AS sum_2x,
       CAST(len(list_filter(qs, x -> x % 2 = 0)) AS INT) AS n_even,
       len(list_filter(qs, x -> x > 40)) > 0 AS any_gt40,
       len(list_filter(qs, x -> x <= 0)) = 0 AS all_pos,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qs), (a, b) -> a + b)
            AS BIGINT) AS fold_sum,
       array_to_string(list_sort(qs), ',') AS sorted_str,
       array_to_string(list_sort(list_distinct(qs)), ',') AS distinct_sorted_str
FROM arr ORDER BY l_orderkey
"""


QUERIES_EXT59 = {
    "q351_rolling_active_users": q351_rolling_active_users,
    "q352_hof_conformance": q352_hof_conformance,
}


def _oracles_ext59() -> dict[str, str]:
    return {
        "q351_rolling_active_users": Q351_SQL,
        "q352_hof_conformance": Q352_SQL,
    }
