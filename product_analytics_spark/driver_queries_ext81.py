"""Round-7 driver query families, batch 81 (q397-q398): function-
surface doors — the NULL-guard/bit-manipulation family and the array
mutation family, each value-exact against DuckDB closed forms.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q397


def q397_null_guard_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the NULL-guard and bit-manipulation
    families — nvl, nvl2, ifnull, nullifzero, zeroifnull, nanvl,
    isnull, isnan, equal_null, typeof, bitwise_not, bit_get, getbit,
    bit_and (agg), bool_or, some, sum_distinct, try_sum, try_avg,
    try_subtract, try_mod, try_element_at (22 builtins) — over
    customer balances with DETERMINISTICALLY derived NULLs/NaNs (the
    synthetic data carries none: custkey residues poison v/w/NaN
    lanes, so both engines see the identical null pattern).

    Every compared value is an exact integer/boolean aggregate of the
    guarded expressions; the only float lane (try_avg) is pinned
    in-row against Σ/n (both exact) and crosses the boundary as a
    boolean. The oracle spells each guard in its portable closed form
    (coalesce/CASE/IS NOT DISTINCT FROM/~/>>&1/DISTINCT-sum).

    Scale: one |segments|-group hash agg; every guard is per-row
    codegen — the point of the door is that none of these functions
    forces a UDF or a second pass."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        _money_cents("c_acctbal").alias("cents"),
    )
    k = F.col("c_custkey")
    rows = c.select(
        "seg",
        "c_custkey",
        "cents",
        # deterministic poison lanes
        F.when(k % 7 == 0, F.lit(None)).otherwise(F.col("cents")).alias("v"),
        F.when(k % 11 == 0, F.lit(None)).otherwise(k % 100).alias("w"),
        F.when(k % 13 == 0, F.lit(float("nan"))).otherwise(F.lit(1.0)).alias(
            "fl"
        ),
    )
    d = rows.select(
        "seg",
        "c_custkey",
        "v",
        "w",
        F.nvl("v", F.lit(0)).alias("nvl_v"),
        F.ifnull("w", F.lit(-1)).alias("ifnull_w"),
        F.nvl2("v", F.lit(1), F.lit(0)).alias("nvl2_v"),
        F.zeroifnull("w").alias("zin_w"),
        F.nullifzero(F.col("c_custkey") % 5).alias("niz_k5"),
        F.nanvl("fl", F.lit(-2.0)).alias("nanvl_fl"),
        F.isnull("v").cast("int").alias("is_null_v"),
        F.isnan("fl").cast("int").alias("is_nan_fl"),
        F.equal_null("v", "w").cast("int").alias("eqn_vw"),
        F.typeof("v").alias("type_v"),
        F.bitwise_not(F.col("c_custkey")).alias("bnot_k"),
        F.bit_get(F.col("c_custkey"), F.lit(3)).cast("bigint").alias("bg3"),
        F.getbit(F.col("c_custkey"), F.lit(5)).cast("bigint").alias("gb5"),
        F.try_subtract(F.col("c_custkey"), F.lit(1)).alias("tsub"),
        F.try_mod(F.col("c_custkey"), F.lit(7)).alias("tmod"),
        F.try_element_at(F.array(k, k + 1), F.lit(2)).alias("tea_ok"),
        F.try_element_at(F.array(k, k + 1), F.lit(5)).alias("tea_oob"),
    )
    g = d.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nvl_v").alias("sum_nvl_v"),
        F.sum("ifnull_w").alias("sum_ifnull_w"),
        F.sum("nvl2_v").alias("sum_nvl2_v"),
        F.sum("zin_w").alias("sum_zin_w"),
        F.count("niz_k5").alias("n_niz_nonnull"),
        F.sum("nanvl_fl").cast("bigint").alias("sum_nanvl"),  # ±1/-2 ints
        F.sum("is_null_v").alias("n_null_v"),
        F.sum("is_nan_fl").alias("n_nan"),
        F.sum("eqn_vw").alias("n_eqn"),
        F.max("type_v").alias("type_v"),
        F.sum("bnot_k").alias("sum_bnot"),
        F.sum("bg3").alias("sum_bit3"),
        F.sum("gb5").alias("sum_bit5"),
        F.bit_and("w").alias("bitand_w"),
        F.bool_or(F.col("v") > 0).alias("any_pos"),
        F.some(F.col("v") > 1 << 40).alias("any_huge"),
        F.sum_distinct(F.col("c_custkey") % 10).alias("sum_dist_res"),
        F.try_sum("v").alias("try_sum_v"),
        F.try_avg("v").alias("_try_avg_v"),
        F.sum("v").alias("_sum_v"),
        F.count("v").alias("_n_v"),
        F.sum("tsub").alias("sum_tsub"),
        F.sum("tmod").alias("sum_tmod"),
        F.sum("tea_ok").alias("sum_tea_ok"),
        F.count("tea_oob").alias("n_tea_oob"),
    )
    return g.select(
        "seg",
        "n",
        "sum_nvl_v",
        "sum_ifnull_w",
        "sum_nvl2_v",
        "sum_zin_w",
        "n_niz_nonnull",
        "sum_nanvl",
        "n_null_v",
        "n_nan",
        "n_eqn",
        "type_v",
        "sum_bnot",
        F.col("sum_bit3").alias("sum_bit3"),
        F.col("sum_bit5").alias("sum_bit5"),
        F.col("bitand_w").cast("bigint").alias("bitand_w"),
        "any_pos",
        "any_huge",
        F.col("sum_dist_res").cast("bigint").alias("sum_dist_res"),
        "try_sum_v",
        (
            F.abs(
                F.col("_try_avg_v")
                - F.col("_sum_v").cast("double") / F.col("_n_v")
            )
            <= F.lit(1e-9) * F.abs(F.col("_try_avg_v"))
        ).alias("try_avg_ok"),
        "sum_tsub",
        "sum_tmod",
        "sum_tea_ok",
        "n_tea_oob",
    ).orderBy("seg")


Q397_SQL = """
WITH c AS (
  SELECT c_custkey AS k, c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
r AS (
  SELECT seg, k, cents,
         CASE WHEN k % 7 = 0 THEN NULL ELSE cents END AS v,
         CASE WHEN k % 11 = 0 THEN NULL ELSE k % 100 END AS w,
         CASE WHEN k % 13 = 0 THEN 'nan'::DOUBLE ELSE 1.0 END AS fl
  FROM c
)
SELECT seg,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(coalesce(v, 0)) AS BIGINT) AS sum_nvl_v,
       CAST(sum(coalesce(w, -1)) AS BIGINT) AS sum_ifnull_w,
       CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS sum_nvl2_v,
       CAST(sum(coalesce(w, 0)) AS BIGINT) AS sum_zin_w,
       CAST(count(CASE WHEN k % 5 = 0 THEN NULL ELSE 1 END) AS BIGINT)
         AS n_niz_nonnull,
       CAST(sum(CASE WHEN isnan(fl) THEN -2.0 ELSE fl END) AS BIGINT)
         AS sum_nanvl,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_v,
       CAST(sum(CASE WHEN isnan(fl) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
       CAST(sum(CASE WHEN v IS NOT DISTINCT FROM w THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eqn,
       'bigint' AS type_v,
       CAST(sum(~k) AS BIGINT) AS sum_bnot,
       CAST(sum((k >> 3) & 1) AS BIGINT) AS sum_bit3,
       CAST(sum((k >> 5) & 1) AS BIGINT) AS sum_bit5,
       CAST(bit_and(w) AS BIGINT) AS bitand_w,
       bool_or(v > 0) AS any_pos,
       bool_or(v > (CAST(1 AS BIGINT) << 40)) AS any_huge,
       CAST(sum(DISTINCT k % 10) AS BIGINT) AS sum_dist_res,
       CAST(sum(v) AS BIGINT) AS try_sum_v,
       TRUE AS try_avg_ok,
       CAST(sum(k - 1) AS BIGINT) AS sum_tsub,
       CAST(sum(k % 7) AS BIGINT) AS sum_tmod,
       CAST(sum(k + 1) AS BIGINT) AS sum_tea_ok,
       CAST(0 AS BIGINT) AS n_tea_oob
FROM r GROUP BY seg ORDER BY seg
"""


# ------------------------------------------------------------- q398

Q398_MOD = 20  # 1-in-20 orders: the door exercises shapes, not volume


def q398_array_mutation_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the array MUTATION family —
    array_agg, array_append, array_prepend, array_insert,
    array_remove, array_compact, array_except, arrays_overlap,
    arrays_zip, array_size, reduce, posexplode_outer (12 builtins) —
    over per-order quantity/linenumber arrays (sorted, so every
    mutation has a deterministic serialization both engines print
    identically via join(',')).

    posexplode_outer is certified through its OUTER semantics: orders
    in the empty-array lane (okey%3=0 maps to array()) still emit one
    (NULL,NULL) row, so n_exploded = 1 there and |arr| elsewhere —
    the closed form the oracle states.

    Scale: one l_orderkey-keyed agg builds the arrays; every mutation
    is per-row codegen over |orders|/20 rows; the explode re-agg rides
    the same orderkey partitioning."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % Q398_MOD == 0)
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("int").alias("qty"),
            F.col("l_linenumber").cast("int").alias("ln"),
        )
    )
    base = li.groupBy("l_orderkey").agg(
        F.sort_array(F.array_agg("qty")).alias("arr"),
        F.sort_array(F.array_agg("ln")).alias("arr2"),
    )
    okey = F.col("l_orderkey")
    # empty-array lane for the OUTER generators
    based = base.withColumn(
        "arr_maybe",
        F.when(okey % 3 == 0, F.array().cast("array<int>")).otherwise(
            F.col("arr")
        ),
    )
    exploded = (
        based.select("l_orderkey", F.posexplode_outer("arr_maybe"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_exploded"))
    )
    j = F.array_join  # serializer: both engines print ints identically
    out = (
        based.join(exploded, "l_orderkey")
        .select(
            okey.alias("okey"),
            j("arr", ",").alias("arr_s"),
            j(F.array_append("arr", F.lit(0)), ",").alias("append_s"),
            j(F.array_prepend("arr", F.lit(99)), ",").alias("prepend_s"),
            j(F.array_insert("arr", 2, F.lit(55)), ",").alias("insert_s"),
            j(F.array_remove("arr", F.element_at("arr", 1)), ",").alias(
                "remove_s"
            ),
            j(
                F.array_compact(
                    F.concat("arr", F.array(F.lit(None).cast("int")))
                ),
                ",",
            ).alias("compact_s"),
            j(F.sort_array(F.array_except("arr", "arr2")), ",").alias(
                "except_s"
            ),
            F.arrays_overlap("arr", "arr2").alias("overlap"),
            j(
                F.expr(
                    "transform(arrays_zip(arr, arr2),"
                    " s -> concat(CAST(s.arr AS STRING), ':',"
                    " CAST(s.arr2 AS STRING)))"
                ),
                ",",
            ).alias("zip_s"),
            F.array_size("arr").cast("bigint").alias("sz"),
            F.reduce(
                "arr", F.lit(0), lambda acc, x: acc + x
            ).cast("bigint").alias("qty_sum"),
            F.col("n_exploded").cast("bigint").alias("n_exploded"),
        )
        .orderBy("okey")
    )
    return out


Q398_SQL = f"""
WITH li AS (
  SELECT l_orderkey, CAST(l_quantity AS INT) AS qty,
         CAST(l_linenumber AS INT) AS ln
  FROM lineitem WHERE l_orderkey % {Q398_MOD} = 0
),
base AS (
  SELECT l_orderkey,
         list_sort(list(qty)) AS arr,
         list_sort(list(ln)) AS arr2
  FROM li GROUP BY l_orderkey
)
SELECT l_orderkey AS okey,
       array_to_string(arr, ',') AS arr_s,
       array_to_string(list_append(arr, 0), ',') AS append_s,
       array_to_string(list_prepend(99, arr), ',') AS prepend_s,
       array_to_string(arr[:1] || [55] || arr[2:], ',') AS insert_s,
       coalesce(array_to_string(list_filter(arr, e -> e <> arr[1]), ','), '')
         AS remove_s,
       array_to_string(arr, ',') AS compact_s,
       coalesce(array_to_string(
         list_sort(list_distinct(
           list_filter(arr, e -> NOT list_contains(arr2, e)))), ','), '')
         AS except_s,
       list_has_any(arr, arr2) AS overlap,
       array_to_string(
         list_transform(list_zip(arr, arr2),
           s -> CAST(s[1] AS VARCHAR) || ':' || CAST(s[2] AS VARCHAR)), ',')
         AS zip_s,
       CAST(len(arr) AS BIGINT) AS sz,
       CAST(list_reduce(list_prepend(0, arr), (a, b) -> a + b) AS BIGINT)
         AS qty_sum,
       CAST(CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE len(arr) END AS BIGINT)
         AS n_exploded
FROM base ORDER BY okey
"""


QUERIES_EXT81 = {
    "q397_null_guard_cert": q397_null_guard_cert,
    "q398_array_mutation_cert": q398_array_mutation_cert,
}


def _oracles_ext81() -> dict[str, str]:
    return {
        "q397_null_guard_cert": Q397_SQL,
        "q398_array_mutation_cert": Q398_SQL,
    }
