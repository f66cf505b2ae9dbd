"""Round-5 driver query families, batch 74 (q387): map RESHAPING —
the per-entity feature-map pipeline (certificate #14 covered map
conformance; this exercises the construction/combination surface:
map_from_arrays, map_zip_with, transform_keys).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q387

MAPR_MOD = 43


def q387_map_reshaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map RESHAPING — the per-entity feature-map pipeline: two
    parallel per-order maps built with ``map_from_arrays`` (sorted
    linenumber → qty, linenumber → cents), combined point-wise with
    ``map_zip_with`` (floor cents-per-unit where both sides exist —
    the guarded-division discipline inside a map lambda), and re-keyed
    with ``transform_keys`` (line → orderkey·10+line, the
    globalize-the-key step a feature-store merge needs).  q359's
    certificate #14 pinned map-READ semantics; this door exercises
    map CONSTRUCTION and COMBINATION, certified against the
    relational closed form in DuckDB (maps never cross the engine
    boundary — the compared values are the map-derived scalars and
    the serialized re-keyed key list).

    Scale: one order-keyed hash-agg builds the arrays; every map op
    after is a codegen'd per-row expression — the shuffle carries
    |orders| aggregated rows, never per-line rows twice."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % MAPR_MOD == 0)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(_money_cents("l_extendedprice")).alias("cents"),
        )
    )
    per = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").cast("long").alias("k"),
                    F.col("qty").alias("q"),
                    F.col("cents").alias("c"),
                )
            )
        ).alias("rows")
    )
    m_qty = F.map_from_arrays(
        F.transform("rows", lambda r: r["k"]), F.transform("rows", lambda r: r["q"])
    )
    m_cents = F.map_from_arrays(
        F.transform("rows", lambda r: r["k"]), F.transform("rows", lambda r: r["c"])
    )
    zipped = F.map_zip_with(
        m_qty,
        m_cents,
        # decimal-path division before floor: double c/q can sit one
        # ulp below an exact integer quotient and floor off-by-one.
        lambda k, q, c: F.when(
            q.isNotNull() & c.isNotNull() & (q > 0),
            F.floor(c.cast("decimal(28,8)") / q).cast("long"),
        ).otherwise(F.lit(0)),
    )
    wide = F.transform_keys(
        zipped, lambda k, v: F.col("l_orderkey") * 10 + k
    )
    zero = F.lit(0).cast("long")
    return per.select(
        "l_orderkey",
        F.size(m_qty).alias("n_lines"),
        F.aggregate(F.map_values(m_qty), zero, lambda a, x: a + x).alias(
            "total_qty"
        ),
        F.aggregate(F.map_values(zipped), zero, lambda a, x: a + x).alias(
            "unit_cents_sum"
        ),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.map_keys(wide)), lambda x: x.cast("string")
            ),
        ).alias("global_keys"),
    ).orderBy("l_orderkey")


Q387_SQL = f"""
WITH per_line AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS k,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS c
  FROM lineitem WHERE l_orderkey % {MAPR_MOD} = 0 GROUP BY 1, 2
)
SELECT l_orderkey,
       CAST(count(*) AS INT) AS n_lines,
       CAST(sum(q) AS BIGINT) AS total_qty,
       CAST(sum(CASE WHEN q > 0 THEN c // q ELSE 0 END) AS BIGINT)
         AS unit_cents_sum,
       string_agg(CAST(l_orderkey * 10 + k AS VARCHAR), ',' ORDER BY k)
         AS global_keys
FROM per_line GROUP BY l_orderkey ORDER BY l_orderkey
"""


QUERIES_EXT74 = {
    "q387_map_reshaping": q387_map_reshaping,
}


def _oracles_ext74() -> dict[str, str]:
    return {
        "q387_map_reshaping": Q387_SQL,
    }
