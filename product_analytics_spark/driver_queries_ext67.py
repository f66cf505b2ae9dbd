"""Round-5 driver query families, batch 67 (q371): the AQE runtime
BLOOM-FILTER join-pruning door.  (q370, an observe() metrics query,
was WITHDRAWN post-commit: it duplicated q341/X302 — the q351 lesson,
again traced to a bundled grep whose head-truncated output hid the
match.  One pattern per grep, or grep -c.)

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q371


def q371_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: AQE runtime BLOOM-FILTER join pruning — the
    planner rule itself, distinct from q186/X153 which BUILDS a bloom
    prefilter by hand in DataFrame ops (and measures its fp rate);
    here the certified artifact is Spark's own injected
    bloom_filter_agg/might_contain pair and its plan placement — the
    plan Spark builds when the dim side is too big to broadcast (the
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
    "q371_bloom_filter_join": q371_bloom_filter_join,
}


def _oracles_ext67() -> dict[str, str]:
    return {
        "q371_bloom_filter_join": Q371_SQL,
    }
