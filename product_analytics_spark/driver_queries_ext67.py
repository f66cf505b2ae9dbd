"""Round-5 driver query families, batch 67 (q370-q371): the
``observe()`` metrics door (single-pass data-quality collection) and
the AQE runtime BLOOM-FILTER join-pruning door.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q370


def q370_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: ``DataFrame.observe`` — data-quality metrics
    collected as a SIDE EFFECT of the query's own single pass, the
    Spark-native form of the reference's dbt test step (SURVEY §2.8's
    not_null/accepted_values checks), without the second scan a
    separate validation query costs.  The pipeline here is the
    canonical orders cleaning pass: observe() hangs five metrics
    (row count, null-price count, out-of-vocab status count, exact
    cents total, distinct-status floor) on the stream WHILE the main
    aggregate runs; the returned row carries both the observed
    metrics and the main result's group count, and the oracle
    recomputes every one of them relationally — certifying that
    observation never perturbs (or misses) the data it rides on.

    Scale: observe() compiles to an extra CollectMetrics operator —
    accumulator arithmetic on the SAME scan, zero extra jobs, zero
    extra shuffles; a dbt-style test suite over N checks costs N extra
    corpus scans, this costs none.  (The builder runs the action
    eagerly — observation values only exist after an action — so the
    returned 1-row relation is by-definition driver-sized, the q268
    discipline.)"""
    from pyspark.sql import Observation

    obs = Observation("q370")
    o = _t(spark, sf_dir, "orders")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice").isNull()).alias("n_null_price"),
        F.count_if(
            ~F.col("o_orderstatus").isin("F", "O", "P")
        ).alias("n_bad_status"),
        F.sum(_money_cents("o_totalprice")).alias("cents_total"),
    )
    groups = (
        observed.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    m = obs.get  # blocks until the action above has run
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_price"]),
                int(m["n_bad_status"]),
                int(m["cents_total"]),
                len(groups),
                int(sum(r["n"] for r in groups)),
            )
        ],
        "n_rows bigint, n_null_price bigint, n_bad_status bigint,"
        " cents_total bigint, n_status_groups bigint, n_rows_via_groups bigint",
    )


Q370_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT)
         AS n_null_price,
       CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
            AS BIGINT) AS n_bad_status,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS cents_total,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status_groups,
       CAST(count(*) AS BIGINT) AS n_rows_via_groups
FROM orders
"""


# ------------------------------------------------------------- q371


def q371_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: AQE runtime BLOOM-FILTER join pruning — the plan
    Spark builds when the dim side is too big to broadcast (the
    100 TB reality this suite's 315 broadcast joins sidestep at test
    SF): a ``bloom_filter_agg`` subquery on the filtered customer
    side injects ``might_contain(xxhash64(o_custkey))`` into the
    orders SCAN, so fact rows that cannot join die at the read — a
    shuffle-join's answer to broadcast pruning.  Confs are scoped
    (broadcast off + scan-size threshold 0 to make injection fire at
    test SF) and the physical plan is FORCED inside the scope — the
    optimizer is lazy, and a plan compiled after conf restore would
    silently lose the bloom filter (the plan is then cached on the
    Dataset, so the driver's later collect reuses it; pytest pins
    might_contain).  The oracle is the plain join — pruning must
    never change the answer.

    Scale: creation side = one |filtered-dim| agg producing an 8 MB
    bitmap; application side = a scan-local predicate, zero extra
    shuffles; false positives only cost the join they would have
    reached anyway."""
    scoped = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        c = _t(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = _t(spark, sf_dir, "orders")
        out = (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(_money_cents("o_totalprice")).alias("_c"),
            )
            .select(
                "o_orderstatus",
                "n_orders",
                (F.col("_c") / 100.0).alias("revenue"),
            )
            .orderBy("o_orderstatus")
        )
        # Force plan compilation INSIDE the conf scope (see docstring).
        with contextlib.redirect_stdout(io.StringIO()):
            out.explain("formatted")
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return out


Q371_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES_EXT67 = {
    "q370_observe_metrics": q370_observe_metrics,
    "q371_bloom_filter_join": q371_bloom_filter_join,
}


def _oracles_ext67() -> dict[str, str]:
    return {
        "q370_observe_metrics": Q370_SQL,
        "q371_bloom_filter_join": Q371_SQL,
    }
