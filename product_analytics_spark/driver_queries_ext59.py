"""Round-5 driver query families, batch 59 (q352): conformance
certificate #12 — higher-order array-function semantics, including the
one documented cross-engine divergence (distinct-order preservation).
(q351 was withdrawn before release: its rolling-distinct kernel
duplicated q80/X53.)

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

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
    "q352_hof_conformance": q352_hof_conformance,
}


def _oracles_ext59() -> dict[str, str]:
    return {
            "q352_hof_conformance": Q352_SQL,
    }
