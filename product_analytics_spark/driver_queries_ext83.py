"""Round-7 driver query families, batch 83 (q402-q403): function-
surface doors — the Datasketches KLL quantile-sketch family (all three
typed variants) and the xpath extraction family.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q402


def q402_kll_sketch_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the KLL quantile-sketch family —
    kll_sketch_agg / kll_merge_agg / kll_sketch_merge /
    kll_sketch_get_quantile / kll_sketch_get_n / kll_sketch_get_rank /
    kll_sketch_to_string, each in all three typed variants (bigint,
    double, float: 18 builtins total, completing the Datasketches
    surface next to X21's HLL and q366's approx_top_k).

    Certification (sketches differ across engines by design, so the
    oracle pins exact statistics + guarantee booleans):
      * get_n through BOTH merge paths — the aggregate merge
        (kll_merge_agg over per-half sketches) and the pairwise scalar
        merge (kll_sketch_merge) — must equal the EXACT row count:
        sketch merging is lossless in n.
      * get_quantile(0.5) must land between the exact p40 and p60
        (KLL's default-k normalized rank error is ~1.3%);
      * get_rank(exact median) must land in [0.45, 0.55];
      * to_string yields the summary header (shape check).

    Scale: KLL is THE mergeable quantile state — per-partition
    sketches, one small merge, no raw-value shuffle; this door is the
    proof harness for swapping exact percentile passes out at 100 TB
    (the same guarantee q155 pins for percentile_approx's KLL-style
    internal)."""
    ev = _t(spark, sf_dir, "events").select(
        _money_cents("value").alias("c"),
        (F.col("event_id") % 2).cast("int").alias("h"),
    ).select(
        "c",
        "h",
        F.col("c").cast("double").alias("cd"),
        F.col("c").cast("float").alias("cf"),
    )
    halves = ev.groupBy("h").agg(
        F.expr("kll_sketch_agg_bigint(c)").alias("sb"),
        F.expr("kll_sketch_agg_double(cd)").alias("sd"),
        F.expr("kll_sketch_agg_float(cf)").alias("sf"),
    )
    merged = halves.groupBy().agg(
        F.expr("kll_merge_agg_bigint(sb)").alias("mb"),
        F.expr("kll_merge_agg_double(sd)").alias("md"),
        F.expr("kll_merge_agg_float(sf)").alias("mf"),
        F.expr(
            "kll_sketch_merge_bigint(first(sb), last(sb))"
        ).alias("pb"),
        F.expr(
            "kll_sketch_merge_double(first(sd), last(sd))"
        ).alias("pd"),
        F.expr("kll_sketch_merge_float(first(sf), last(sf))").alias("pf"),
        F.first(F.expr("kll_sketch_to_string_bigint(sb)")).alias("tsb"),
        F.first(F.expr("kll_sketch_to_string_double(sd)")).alias("tsd"),
        F.first(F.expr("kll_sketch_to_string_float(sf)")).alias("tsf"),
    )
    # get_rank/get_quantile take FOLDABLE (literal) probe arguments, so
    # the exact statistics become driver-side scalars first — a
    # by-definition driver scalar (the plan-audit collect whitelist
    # pattern): 4 numbers cross the driver, never rows. At 100 TB the
    # shape is identical — compute the quantile once, probe with it.
    ex = ev.groupBy().agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.percentile(F.col("c"), F.lit(0.4)).alias("p40"),
        F.percentile(F.col("c"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("c"), F.lit(0.6)).alias("p60"),
    ).collect()[0]
    n_exact, p40, p50, p60 = ex.n_exact, ex.p40, ex.p50, ex.p60

    def _q_in_band(q: str) -> F.Column:
        return (F.expr(q).cast("double") >= F.lit(p40)) & (
            F.expr(q).cast("double") <= F.lit(p60)
        )

    def _r_in_band(r: str) -> F.Column:
        return (F.expr(r) >= 0.45) & (F.expr(r) <= 0.55)

    return merged.select(
        F.lit(n_exact).cast("bigint").alias("n"),
        (F.expr("kll_sketch_get_n_bigint(mb)") == n_exact).alias(
            "agg_merge_n_ok_b"
        ),
        (F.expr("kll_sketch_get_n_double(md)") == n_exact).alias(
            "agg_merge_n_ok_d"
        ),
        (F.expr("kll_sketch_get_n_float(mf)") == n_exact).alias(
            "agg_merge_n_ok_f"
        ),
        (F.expr("kll_sketch_get_n_bigint(pb)") == n_exact).alias(
            "pair_merge_n_ok_b"
        ),
        (F.expr("kll_sketch_get_n_double(pd)") == n_exact).alias(
            "pair_merge_n_ok_d"
        ),
        (F.expr("kll_sketch_get_n_float(pf)") == n_exact).alias(
            "pair_merge_n_ok_f"
        ),
        _q_in_band("kll_sketch_get_quantile_bigint(mb, 0.5)").alias(
            "quantile_ok_b"
        ),
        _q_in_band("kll_sketch_get_quantile_double(md, 0.5)").alias(
            "quantile_ok_d"
        ),
        _q_in_band("kll_sketch_get_quantile_float(mf, 0.5)").alias(
            "quantile_ok_f"
        ),
        _r_in_band(
            f"kll_sketch_get_rank_bigint(mb, {int(p50)}L)"
        ).alias("rank_ok_b"),
        _r_in_band(f"kll_sketch_get_rank_double(md, {float(p50)!r}D)").alias(
            "rank_ok_d"
        ),
        _r_in_band(
            f"kll_sketch_get_rank_float(mf, CAST({float(p50)!r} AS FLOAT))"
        ).alias("rank_ok_f"),
        F.col("tsb").contains("Sketch Summary").alias("to_string_ok_b"),
        F.col("tsd").contains("Sketch Summary").alias("to_string_ok_d"),
        F.col("tsf").contains("Sketch Summary").alias("to_string_ok_f"),
    )


Q402_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       TRUE AS agg_merge_n_ok_b, TRUE AS agg_merge_n_ok_d,
       TRUE AS agg_merge_n_ok_f,
       TRUE AS pair_merge_n_ok_b, TRUE AS pair_merge_n_ok_d,
       TRUE AS pair_merge_n_ok_f,
       TRUE AS quantile_ok_b, TRUE AS quantile_ok_d, TRUE AS quantile_ok_f,
       TRUE AS rank_ok_b, TRUE AS rank_ok_d, TRUE AS rank_ok_f,
       TRUE AS to_string_ok_b, TRUE AS to_string_ok_d, TRUE AS to_string_ok_f
FROM events
"""


# ------------------------------------------------------------- q403


def q403_xpath_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the xpath extraction family —
    xpath (node-set → array), xpath_boolean, xpath_long, xpath_short,
    xpath_double, xpath_float, xpath_number (7 builtins, completing
    q362's XML door where xpath_int/xpath_string are certified). The
    XML is CONSTRUCTED per supplier row from integer columns, so every
    extraction has an exact closed form over the original columns —
    DuckDB needs no XML engine to be a true oracle.

    The numeric lanes use dyadic fractions (k + 0.25/0.5) so the
    xpath sum() results are exactly representable doubles — float
    outputs compare exactly because no rounding ever occurs.

    Scale: per-row codegen over |suppliers| rows; at 100 TB xpath is
    the scan-side shredder for XML feeds — the fence is the same as
    every parse door: shred once at ingest, store columns."""
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k")
    )
    xml = F.concat(
        F.lit("<r><a>"),
        F.col("k"),
        F.lit("</a><a>"),
        F.col("k") + 1,
        F.lit("</a><b>"),
        (F.col("k") % 10).cast("string"),
        F.lit("</b><f>"),
        (F.col("k") + 0.25),
        F.lit("</f><f>"),
        (F.col("k") + 0.5),
        F.lit("</f><flag>"),
        F.when(F.col("k") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("</flag></r>"),
    )
    d = s.withColumn("x", xml)
    return d.select(
        F.col("k").cast("bigint").alias("k"),
        F.array_join(F.xpath("x", F.lit("r/a/text()")), ",").alias("a_list"),
        F.xpath_boolean("x", F.lit("r/flag='true'")).alias("flag_true"),
        F.xpath_boolean("x", F.lit("r/b>4")).alias("b_gt4"),
        F.xpath_long("x", F.lit("sum(r/a)")).alias("a_sum"),
        F.xpath_short("x", F.lit("r/b")).cast("int").alias("b_short"),
        F.xpath_double("x", F.lit("sum(r/f)")).alias("f_sum"),
        F.xpath_number("x", F.lit("sum(r/f)")).alias("f_sum2"),
        (
            F.xpath_float("x", F.lit("r/f[1]")) == (F.col("k") + 0.25)
        ).alias("float_exact_ok"),
    ).orderBy("k")


Q403_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS k,
       CAST(s_suppkey AS VARCHAR) || ',' || CAST(s_suppkey + 1 AS VARCHAR)
         AS a_list,
       s_suppkey % 2 = 0 AS flag_true,
       s_suppkey % 10 > 4 AS b_gt4,
       CAST(2 * s_suppkey + 1 AS BIGINT) AS a_sum,
       CAST(s_suppkey % 10 AS INT) AS b_short,
       2 * s_suppkey + 0.75 AS f_sum,
       2 * s_suppkey + 0.75 AS f_sum2,
       TRUE AS float_exact_ok
FROM supplier ORDER BY k
"""


QUERIES_EXT83 = {
    "q402_kll_sketch_cert": q402_kll_sketch_cert,
    "q403_xpath_cert": q403_xpath_cert,
}


def _oracles_ext83() -> dict[str, str]:
    return {
        "q402_kll_sketch_cert": Q402_SQL,
        "q403_xpath_cert": Q403_SQL,
    }
