"""Round-7 driver query families, batch 86 (q408-q409): the closing
function-surface doors — theta sketches, variant schema inference,
NULL-ordering specifiers, window_time, URL try-parse, gaussian draws
(q408) and the WKB geospatial round-trip (q409).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t, combine_single_rows

# ------------------------------------------------------------- q408


def q408_ordering_variant_theta_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the closing mixed family —
    theta_union_agg / theta_intersection_agg (set-expression
    sketches), window_time, asc_nulls_first / asc_nulls_last /
    desc_nulls_first (NULL-placement specifiers), ceiling,
    inline_outer, randn, try_parse_url, is_variant_null,
    to_variant_object, schema_of_variant, schema_of_variant_agg,
    schema_of_xml, current_time (16 builtins).

      * theta: per-event-type user sketches; the UNION estimate must
        sit within 3% of the exact distinct-user count, the
        INTERSECTION estimate within the exact all-types-user count
        ± max(3% of distinct, 8) (intersection error compounds);
        exact counts are the compared values.
      * window_time == window.end − 1 µs on a real 1-hour tumbling
        agg (formatted, exact).
      * NULL ordering: with a deterministically poisoned value lane,
        the head row under asc_nulls_first is NULL, under
        asc_nulls_last it is the true minimum, under desc_nulls_first
        NULL again — per-group booleans via rank-1 windows.
      * inline_outer on a deliberately-empty struct-array lane emits
        the NULL row (count == 1 there, |arr| elsewhere).
      * randn(seed): n draws must have |mean| ≤ 5/√n and stdev within
        [0.9, 1.1] (loose law-of-large-numbers bands; the draws are
        partition-dependent, so only the distribution is certified).
      * try_parse_url: HOST/PATH/QUERY exact on a constructed URL,
        NULL (not an exception) on garbage.
      * variant/xml schema inference returns literal type strings;
        to_variant_object serializes a struct to canonical JSON;
        is_variant_null detects the JSON null variant.
      * current_time (TIME type flag): parses as HH:mm:ss — shape
        only, the value is wall-clock.

    Scale: sketches are mergeable partials (the shuffle moves ≤4 KB
    sketch bytes); everything else is per-row codegen."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    # --- theta sketches across event types ---
    per_type = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    theta = per_type.groupBy().agg(
        F.expr("theta_sketch_estimate(theta_union_agg(sk))").alias("_u"),
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))").alias(
            "_i"
        ),
    )
    exact = ev.groupBy().agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("_n_types"),
    )
    # users active in EVERY type (exact intersection cardinality)
    n_types_df = ev.select(F.countDistinct("event_type").alias("k_types"))
    inter_exact = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .join(F.broadcast(n_types_df), F.col("nt") == F.col("k_types"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_all_types"))
    )
    # --- window_time over a 1-hour tumbling agg ---
    wt = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count_if(
                F.window_time("w")
                == F.col("w.end") - F.expr("INTERVAL 1 MICROSECOND")
            ).alias("n_window_time_ok"),
        )
    )
    # --- NULL-placement orderings (per event_type groups) ---
    from pyspark.sql.window import Window

    poisoned = ev.withColumn(
        "v", F.when(F.col("user_id") % 9 == 0, None).otherwise(F.col("user_id"))
    )
    heads = (
        poisoned.select(
            "event_type",
            "v",
            F.row_number()
            .over(
                Window.partitionBy("event_type").orderBy(
                    F.asc_nulls_first("v"), F.col("user_id").asc_nulls_last()
                )
            )
            .alias("rn_nf"),
            F.row_number()
            .over(
                Window.partitionBy("event_type").orderBy(
                    F.asc_nulls_last("v"), "user_id"
                )
            )
            .alias("rn_nl"),
            F.row_number()
            .over(
                Window.partitionBy("event_type").orderBy(
                    F.desc_nulls_first("v"), "user_id"
                )
            )
            .alias("rn_df"),
        )
        .groupBy()
        .agg(
            F.count_if((F.col("rn_nf") == 1) & F.col("v").isNull()).alias(
                "n_nulls_first_head"
            ),
            F.count_if((F.col("rn_nl") == 1) & F.col("v").isNotNull()).alias(
                "n_nulls_last_head"
            ),
            F.count_if((F.col("rn_df") == 1) & F.col("v").isNull()).alias(
                "n_desc_first_head"
            ),
        )
    )
    # --- per-row misc lanes folded to one row ---
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), _money_cents("c_acctbal").alias("cents")
    )
    misc_rows = c.select(
        "k",
        F.ceiling(F.col("cents") / 100.0).cast("bigint").alias("ceil_dollars"),
        F.randn(42).alias("g"),
        F.try_parse_url(
            F.concat(F.lit("https://h.example.com/p/"), F.col("k"), F.lit("?q=1")),
            F.lit("HOST"),
        ).alias("host"),
        F.try_parse_url(F.lit("::notaurl::"), F.lit("HOST")).alias("bad_url"),
        F.when(
            F.col("k") % 4 == 0, F.array().cast("array<struct<a:bigint,b:bigint>>")
        )
        .otherwise(F.array(F.struct(F.col("k").alias("a"), (F.col("k") * 2).alias("b"))))
        .alias("st_arr"),
    )
    inline_counts = (
        misc_rows.select("k", F.inline_outer("st_arr"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_inline_rows"),
            F.count_if(F.col("a").isNull()).alias("n_inline_null_rows"),
        )
    )
    misc = misc_rows.groupBy().agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("ceil_dollars").alias("sum_ceil_dollars"),
        (
            F.abs(F.avg("g")) <= 5.0 / F.sqrt(F.count(F.lit(1)))
        ).alias("randn_mean_ok"),
        F.stddev("g").between(0.9, 1.1).alias("randn_std_ok"),
        (
            F.count_if(F.col("host") == "h.example.com") == F.count(F.lit(1))
        ).alias("url_host_ok"),
        (F.count("bad_url") == 0).alias("url_bad_null_ok"),
        (
            F.count_if(
                F.expr("is_variant_null(parse_json('null'))")
                & (
                    F.expr(
                        "CAST(to_variant_object(named_struct('a', k)) AS STRING)"
                    )
                    == F.concat(F.lit('{"a":'), F.col("k"), F.lit("}"))
                )
                & (
                    F.expr(
                        "schema_of_variant(parse_json('{\"a\":1}'))"
                    )
                    == "OBJECT<a: BIGINT>"
                )
                & (
                    F.schema_of_xml(F.lit("<r><a>1</a><b>x</b></r>"))
                    == "STRUCT<a: BIGINT, b: STRING>"
                )
            )
            == F.count(F.lit(1))
        ).alias("variant_xml_ok"),
        F.expr(
            "first(CAST(current_time() AS STRING))"
        ).rlike("^[0-2][0-9]:[0-5][0-9]:[0-5][0-9]").alias("current_time_shape_ok"),
        F.expr(
            "schema_of_variant_agg(parse_json(CAST(k AS STRING)))"
        ).alias("sva"),
    )
    out = combine_single_rows(
        theta, exact, inter_exact, wt, heads, inline_counts, misc
    )
    return out.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_all_types").cast("bigint").alias("n_all_types"),
        (F.abs(F.col("_u") - F.col("n_users")) <= 0.03 * F.col("n_users")).alias(
            "theta_union_ok"
        ),
        (
            F.abs(F.col("_i") - F.col("n_all_types"))
            <= F.greatest(0.03 * F.col("n_users"), F.lit(8.0))
        ).alias("theta_intersection_ok"),
        F.col("n_windows").cast("bigint").alias("n_windows"),
        (F.col("n_window_time_ok") == F.col("n_windows")).alias(
            "window_time_ok"
        ),
        F.col("n_nulls_first_head").cast("bigint").alias("n_nulls_first_head"),
        F.col("n_nulls_last_head").cast("bigint").alias("n_nulls_last_head"),
        F.col("n_desc_first_head").cast("bigint").alias("n_desc_first_head"),
        F.col("n_cust").cast("bigint").alias("n_cust"),
        F.col("sum_ceil_dollars").cast("bigint").alias("sum_ceil_dollars"),
        F.col("n_inline_rows").cast("bigint").alias("n_inline_rows"),
        F.col("n_inline_null_rows").cast("bigint").alias("n_inline_null_rows"),
        "randn_mean_ok",
        "randn_std_ok",
        "url_host_ok",
        "url_bad_null_ok",
        "variant_xml_ok",
        "current_time_shape_ok",
        (F.col("sva") == "BIGINT").alias("sva_ok"),
    )


Q408_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
per_user AS (
  SELECT user_id, count(DISTINCT event_type) AS nt FROM ev GROUP BY user_id
),
c AS (
  SELECT c_custkey AS k,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM ev) AS BIGINT) AS n_users,
       CAST((SELECT count(*) FROM per_user
             WHERE nt = (SELECT count(DISTINCT event_type) FROM ev))
            AS BIGINT) AS n_all_types,
       TRUE AS theta_union_ok,
       TRUE AS theta_intersection_ok,
       CAST((SELECT count(DISTINCT date_trunc('hour', ts)) FROM ev) AS BIGINT)
         AS n_windows,
       TRUE AS window_time_ok,
       CAST((SELECT count(DISTINCT event_type) FROM ev) AS BIGINT)
         AS n_nulls_first_head,
       CAST((SELECT count(DISTINCT event_type) FROM ev) AS BIGINT)
         AS n_nulls_last_head,
       CAST((SELECT count(DISTINCT event_type) FROM ev) AS BIGINT)
         AS n_desc_first_head,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cust,
       CAST((SELECT sum(CAST(ceiling(cents / 100.0) AS BIGINT)) FROM c)
            AS BIGINT) AS sum_ceil_dollars,
       CAST((SELECT sum(CASE WHEN k % 4 = 0 THEN 1 ELSE 1 END) FROM c)
            AS BIGINT) AS n_inline_rows,
       CAST((SELECT count(*) FROM c WHERE k % 4 = 0) AS BIGINT)
         AS n_inline_null_rows,
       TRUE AS randn_mean_ok,
       TRUE AS randn_std_ok,
       TRUE AS url_host_ok,
       TRUE AS url_bad_null_ok,
       TRUE AS variant_xml_ok,
       TRUE AS current_time_shape_ok,
       TRUE AS sva_ok
"""


# ------------------------------------------------------------- q409


def q409_geospatial_wkb_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the geospatial WKB family behind
    spark.sql.geospatial.enabled — st_geomfromwkb, st_geogfromwkb,
    st_asbinary, st_setsrid, st_srid (5 builtins). Point WKB blobs are
    CONSTRUCTED per nation row from integer coordinates (little-endian
    tag 0101000000 + two float64s), so the parse → serialize
    round-trip has an exact closed form: hex(st_asbinary(
    st_geomfromwkb(wkb))) == the constructed hex, srid get/set is
    exact, and the geography parse lane round-trips the same bytes.
    DuckDB needs no spatial extension — the oracle rebuilds the hex
    from the same integer coordinates.

    Scale: per-row codegen over |nations| rows; geometry stays an
    opaque value — the engine-level point is that spatial columns ride
    ordinary columnar storage with a typed parse at the edge (the
    multimodal-binary discipline applied to geometry)."""
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k")
    )
    # Little-endian WKB point: 01 01000000 <x float64> <y float64>.
    # Coordinates are POWERS OF TWO, whose IEEE-754 bit patterns are
    # pure integer arithmetic both engines share: bits(2^e) =
    # (1023+e) << 52 — no double→binary cast exists in either engine,
    # so constructibility IS the design constraint. The big-endian hex
    # of that BIGINT is byte-reversed with a fixed substring stitch.
    def _le_bits(e_sql: str) -> str:
        be = f"lpad(hex(shiftleft(CAST(1023 + ({e_sql}) AS BIGINT), 52)), 16, '0')"
        pairs = " , ".join(
            f"substring({be}, {i}, 2)" for i in range(15, 0, -2)
        )
        return f"concat({pairs})"

    d = n.select(
        "k",
        F.expr(
            "concat('0101000000', "
            + _le_bits("k % 10")
            + ", "
            + _le_bits("k % 7 + 1")
            + ")"
        ).alias("wkb_hex"),
    )
    return d.select(
        F.col("k").cast("bigint").alias("k"),
        "wkb_hex",
        (
            F.expr("hex(st_asbinary(st_geomfromwkb(unhex(wkb_hex))))")
            == F.col("wkb_hex")
        ).alias("geom_rt_ok"),
        (
            F.expr("hex(st_asbinary(st_geogfromwkb(unhex(wkb_hex))))")
            == F.col("wkb_hex")
        ).alias("geog_rt_ok"),
        F.expr("st_srid(st_geomfromwkb(unhex(wkb_hex)))")
        .cast("bigint")
        .alias("srid_default"),
        F.expr("st_srid(st_setsrid(st_geomfromwkb(unhex(wkb_hex)), 4326))")
        .cast("bigint")
        .alias("srid_set"),
    ).orderBy("k")


def _q409_le_bits_sql(e_sql: str) -> str:
    be = (
        f"lpad(hex(CAST(1023 + ({e_sql}) AS BIGINT) << 52), 16, '0')"
    )
    pairs = ", ".join(f"substring({be}, {i}, 2)" for i in range(15, 0, -2))
    return f"concat({pairs})"


Q409_SQL = f"""
SELECT CAST(n_nationkey AS BIGINT) AS k,
       '0101000000'
         || {_q409_le_bits_sql("n_nationkey % 10")}
         || {_q409_le_bits_sql("n_nationkey % 7 + 1")} AS wkb_hex,
       TRUE AS geom_rt_ok,
       TRUE AS geog_rt_ok,
       CAST(0 AS BIGINT) AS srid_default,
       CAST(4326 AS BIGINT) AS srid_set
FROM nation ORDER BY k
"""


QUERIES_EXT86 = {
    "q408_ordering_variant_theta_cert": q408_ordering_variant_theta_cert,
    "q409_geospatial_wkb_cert": q409_geospatial_wkb_cert,
}


def _oracles_ext86() -> dict[str, str]:
    return {
        "q408_ordering_variant_theta_cert": Q408_SQL,
        "q409_geospatial_wkb_cert": Q409_SQL,
    }
