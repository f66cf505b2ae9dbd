"""Round-7 driver query families, batch 84 (q404-q406): function-
surface doors — engine-introspection/nondeterministic-property lanes,
the TIME type + timestamp-constructor family, and the try-parse /
UTF-8 / digest / JSON-schema family.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q404


def q404_engine_introspection_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): engine-introspection and
    nondeterministic functions, certified by their PROPERTIES (the
    values are engine- or run-specific by definition, so the oracle
    pins invariants): grouping_id, monotonically_increasing_id, uuid,
    randstr, input_file_name, input_file_block_start,
    input_file_block_length, assert_true, raise_error,
    listagg_distinct, string_agg_distinct (11 builtins).

      * grouping_id under ROLLUP == the bitmap rebuilt from the
        per-dim GROUPING() flags (MSB = leftmost dim) — compared
        EXACTLY, DuckDB computes the same closed form;
      * monotonically_increasing_id / uuid: all-distinct (count ==
        countDistinct); uuid additionally shape-checked (RFC form);
      * randstr(12): every draw is 12 alphanumeric chars;
      * input_file_name ends in .parquet on every row;
        block_start >= 0, block_length > 0 (real file-split metadata);
      * assert_true(true) yields NULL (never aborts the job);
        raise_error sits in a never-taken CASE branch (lazy branch
        evaluation — the documented guard pattern);
      * listagg_distinct / string_agg_distinct: arrival order is
        nondeterministic, so the serialization is normalized
        (split -> sort_array -> join) before comparing — the same
        discipline X49 applies to collect_list.

    Scale: all per-row/metadata expressions; the rollup is one Expand
    pass."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        _money_cents("o_totalprice").alias("cents"),
    )
    # --- grouping_id under ROLLUP (exact, cross-engine) ---
    gid = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("g_id"),
            F.grouping("o_orderstatus").cast("int").alias("g_s"),
            F.grouping("o_orderpriority").cast("int").alias("g_p"),
            F.count(F.lit(1)).alias("n"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_rollup_rows"),
            F.count_if(
                F.col("g_id") == F.col("g_s") * 2 + F.col("g_p")
            ).alias("n_gid_ok"),
            F.sum("n").alias("n_weighted"),
        )
    )
    # --- property lanes over the base relation ---
    d = o.select(
        "o_orderkey",
        F.monotonically_increasing_id().alias("mid"),
        F.expr("uuid()").alias("u"),
        F.expr("randstr(12)").alias("rs"),
        F.input_file_name().alias("fname"),
        F.input_file_block_start().alias("bstart"),
        F.input_file_block_length().alias("blen"),
        F.assert_true(F.col("o_orderkey") >= 0).alias("assert_null"),
        F.when(F.lit(False), F.expr("raise_error('never taken')"))
        .otherwise(F.lit(1))
        .alias("guarded"),
    )
    props = d.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count_distinct("mid") == F.count(F.lit(1))).alias("mid_distinct_ok"),
        (F.count_distinct("u") == F.count(F.lit(1))).alias("uuid_distinct_ok"),
        (
            F.count_if(
                F.col("u").rlike(
                    "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
                    "-[0-9a-f]{4}-[0-9a-f]{12}$"
                )
            )
            == F.count(F.lit(1))
        ).alias("uuid_shape_ok"),
        (
            F.count_if(F.col("rs").rlike("^[0-9A-Za-z]{12}$"))
            == F.count(F.lit(1))
        ).alias("randstr_shape_ok"),
        (
            F.count_if(F.col("fname").endswith(".parquet"))
            == F.count(F.lit(1))
        ).alias("file_name_ok"),
        (
            F.count_if((F.col("bstart") >= 0) & (F.col("blen") > 0))
            == F.count(F.lit(1))
        ).alias("file_block_ok"),
        (F.count("assert_null") == 0).alias("assert_true_ok"),
        F.sum("guarded").alias("sum_guarded"),
    )
    # --- order-normalized distinct listagg (per priority) ---
    la = (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(
                    F.split(F.listagg_distinct("o_orderstatus", ","), ",")
                ),
                ",",
            ).alias("statuses"),
            F.array_join(
                F.sort_array(
                    F.split(F.string_agg_distinct("o_orderstatus", ","), ",")
                ),
                ",",
            ).alias("statuses2"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_prios"),
            F.count_if(F.col("statuses") == F.col("statuses2")).alias(
                "n_agg_alias_eq"
            ),
            F.min("statuses").alias("statuses_min"),
        )
    )
    from product_analytics_spark.qcommon import combine_single_rows

    # Join-free single-row combine (1-row cross joins = banned BNLJ).
    out = combine_single_rows(gid, props, la)
    return out.select(
        "n_rollup_rows", "n_gid_ok", "n_weighted", "n_rows",
        "mid_distinct_ok", "uuid_distinct_ok", "uuid_shape_ok",
        "randstr_shape_ok", "file_name_ok", "file_block_ok",
        "assert_true_ok", "sum_guarded", "n_prios", "n_agg_alias_eq",
        "statuses_min",
    )


Q404_SQL = """
WITH g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rollup_rows,
         CAST(count(*) AS BIGINT) AS n_gid_ok,
         CAST(sum(n) AS BIGINT) AS n_weighted
  FROM (
    SELECT GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p,
           count(*) AS n
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
  )
)
SELECT g.*,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
       TRUE AS mid_distinct_ok, TRUE AS uuid_distinct_ok,
       TRUE AS uuid_shape_ok, TRUE AS randstr_shape_ok,
       TRUE AS file_name_ok, TRUE AS file_block_ok, TRUE AS assert_true_ok,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS sum_guarded,
       CAST((SELECT count(DISTINCT o_orderpriority) FROM orders) AS BIGINT)
         AS n_prios,
       CAST((SELECT count(DISTINCT o_orderpriority) FROM orders) AS BIGINT)
         AS n_agg_alias_eq,
       (SELECT min(s) FROM (
          SELECT array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
            AS s
          FROM orders GROUP BY o_orderpriority)) AS statuses_min
FROM g
"""


# ------------------------------------------------------------- q405


def q405_time_type_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): Spark 4.1's TIME type (behind
    spark.sql.timeType.enabled, scoped around this query) and the
    timestamp/interval constructor family — make_time, to_time,
    try_to_time, time_trunc, time_diff, make_timestamp_ntz,
    make_timestamp_ltz, to_timestamp_ltz, to_timestamp_ntz,
    try_make_timestamp, try_make_timestamp_ltz, try_make_timestamp_ntz,
    make_ym_interval, try_make_interval (14 builtins).

    Whole-second lanes only, so TIME/timestamp serializations are
    byte-identical across engines ('HH:mm:ss'); the try_* lanes are
    poisoned deterministically (month 13, garbage text) and must yield
    NULL — never an exception (counted). DuckDB twins: make_time /
    TIME casts / date_diff('minute') / make_timestamp / interval
    arithmetic; time_trunc('HOUR') is rebuilt as the closed-form
    'HH:00:00' string.

    Scale: per-row codegen; the conf flip is analysis-time only."""
    # Additive capability flag, not a semantics dial: enabling the TIME
    # type changes nothing for queries that never construct one, and a
    # restore could bite if physical planning (lazy) re-checked the
    # flag after this function returns — so it stays enabled for the
    # session (every TIME value here is cast to STRING in-plan anyway).
    spark.conf.set("spark.sql.timeType.enabled", "true")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 24).cast("int").alias("h"),
        (F.col("o_orderkey") % 60).cast("int").alias("mi"),
        (F.col("o_orderkey") % 53).cast("int").alias("sec"),
        (F.col("o_orderkey") % 12 + 1).cast("int").alias("mo"),
    ).filter(F.col("k") % 11 == 0)
    t = F.expr("make_time(h, mi, CAST(sec AS DECIMAL(16,6)))")
    out = o.select(
        F.col("k").cast("bigint").alias("k"),
        t.cast("string").alias("time_s"),
        F.expr(
            "CAST(to_time(lpad(CAST(h AS STRING), 2, '0') || ':' ||"
            " lpad(CAST(mi AS STRING), 2, '0') || ':' ||"
            " lpad(CAST(sec AS STRING), 2, '0')) AS STRING)"
        ).alias("to_time_rt"),
        F.expr("try_to_time('not a time')").isNull().alias("try_time_null"),
        F.expr("CAST(time_trunc('HOUR', make_time(h, mi,"
               " CAST(sec AS DECIMAL(16,6)))) AS STRING)").alias(
            "time_hour_floor"
        ),
        F.expr(
            "time_diff('MINUTE', make_time(h, 0, 0),"
            " make_time(h, mi, 0))"
        ).cast("bigint").alias("diff_min"),
        F.expr(
            "CAST(make_timestamp_ntz(2024, mo, 5, h, mi, sec) AS STRING)"
        ).alias("ts_ntz"),
        F.expr(
            "CAST(make_timestamp_ltz(2024, mo, 5, h, mi, sec, 'UTC')"
            " AS STRING)"
        ).alias("ts_ltz"),
        F.expr(
            "CAST(to_timestamp_ntz('2024-01-05 10:20:30') AS STRING)"
        ).alias("parse_ntz"),
        F.expr(
            "CAST(to_timestamp_ltz('2024-01-05 10:20:30') AS STRING)"
        ).alias("parse_ltz"),
        F.expr("try_make_timestamp(2024, 13, 5, 0, 0, 0)").isNull().alias(
            "bad_month_null"
        ),
        F.expr(
            "try_make_timestamp_ltz(2024, 13, 5, 0, 0, 0, 'UTC')"
        ).isNull().alias("bad_month_null_ltz"),
        F.expr("try_make_timestamp_ntz(2024, mo, 5, h, mi, sec)")
        .isNotNull()
        .alias("good_ntz_ok"),
        F.expr(
            "CAST(DATE'2024-01-05' + make_ym_interval(0, mo) AS STRING)"
        ).alias("plus_mo"),
        # CalendarInterval stores months as INT: INT_MAX years * 12
        # overflows it, which try_ NULLs (days/micros fields are too
        # wide to overflow from arguments alone).
        F.expr(
            "try_make_interval(2147483647, 0, 0, 0, 0, 0, 0.0)"
        ).isNull().alias("overflow_interval_null"),
    )
    return out.orderBy("k")


Q405_SQL = """
WITH b AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 24 AS INT) AS h,
         CAST(o_orderkey % 60 AS INT) AS mi,
         CAST(o_orderkey % 53 AS INT) AS sec,
         CAST(o_orderkey % 12 + 1 AS INT) AS mo
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(make_time(h, mi, CAST(sec AS DOUBLE)) AS VARCHAR) AS time_s,
       CAST(make_time(h, mi, CAST(sec AS DOUBLE)) AS VARCHAR) AS to_time_rt,
       TRUE AS try_time_null,
       lpad(CAST(h AS VARCHAR), 2, '0') || ':00:00' AS time_hour_floor,
       CAST(mi AS BIGINT) AS diff_min,
       CAST(make_timestamp(2024, mo, 5, h, mi, CAST(sec AS DOUBLE))
            AS VARCHAR) AS ts_ntz,
       CAST(make_timestamp(2024, mo, 5, h, mi, CAST(sec AS DOUBLE))
            AS VARCHAR) AS ts_ltz,
       '2024-01-05 10:20:30' AS parse_ntz,
       '2024-01-05 10:20:30' AS parse_ltz,
       TRUE AS bad_month_null,
       TRUE AS bad_month_null_ltz,
       TRUE AS good_ntz_ok,
       CAST(CAST(DATE '2024-01-05' + to_months(mo) AS DATE) AS VARCHAR)
         AS plus_mo,
       TRUE AS overflow_interval_null
FROM b ORDER BY k
"""


# ------------------------------------------------------------- q406


def q406_try_parse_utf8_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): resilient parsing + UTF-8 validity +
    digests + schema inference — try_parse_json, try_url_decode,
    try_to_binary, try_to_number, try_to_timestamp, is_valid_utf8,
    make_valid_utf8, validate_utf8, try_validate_utf8, sha, sha1,
    to_json, schema_of_json, schema_of_csv, ilike, ltrim, to_varchar,
    to_char (18 builtins).

    The try_* lanes follow q369/q386's one-poisoned-row discipline:
    every deterministic corruption class yields NULL (counted), clean
    rows parse to values the oracle re-derives. UTF-8 lanes operate on
    a constructed invalid byte (x'FF') and clean ASCII — valid stays
    identical under validate/make_valid, invalid is detected/repaired/
    NULLed respectively. sha ≡ sha1 (alias) is pinned in-row plus the
    40-hex shape; to_json over a deterministic struct matches DuckDB's
    struct_pack serialization byte-for-byte; schema_of_json/csv return
    literal inference strings (exact).

    Scale: per-row codegen; the fence on every parse door applies —
    shred once at ingest, store typed columns."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
    ).filter(F.col("k") % 7 == 0)
    k = F.col("k")
    json_ok = F.concat(F.lit('{"id": '), k, F.lit("}"))
    json_bad = F.concat(F.lit('{"id": '), k)  # unterminated
    out = c.select(
        k.cast("bigint").alias("k"),
        F.expr("CAST(try_parse_json(concat('{\"id\": ', k, '}')) AS STRING)").alias(
            "pj_ok"
        ),
        F.try_parse_json(json_bad).isNull().alias("pj_bad_null"),
        F.try_url_decode(F.concat(F.lit("a%20b%2F"), k)).alias("url_ok"),
        F.try_url_decode(F.lit("%ZZ")).isNull().alias("url_bad_null"),
        F.try_to_binary(F.hex(k), F.lit("hex")).isNotNull().alias("bin_ok"),
        F.try_to_binary(F.lit("zz"), F.lit("hex")).isNull().alias("bin_bad_null"),
        F.try_to_number(F.lit("12x"), F.lit("999")).isNull().alias(
            "num_bad_null"
        ),
        F.try_to_timestamp(F.lit("not a ts")).isNull().alias("ts_bad_null"),
        F.is_valid_utf8(F.col("seg")).alias("ascii_valid"),
        (~F.is_valid_utf8(F.expr("CAST(x'FF' AS STRING)"))).alias(
            "ff_invalid"
        ),
        (F.make_valid_utf8(F.col("seg")) == F.col("seg")).alias(
            "make_valid_identity"
        ),
        (F.validate_utf8(F.col("seg")) == F.col("seg")).alias(
            "validate_identity"
        ),
        F.expr("try_validate_utf8(CAST(x'FF' AS STRING))").isNull().alias(
            "try_validate_null"
        ),
        (F.sha(F.col("seg")) == F.sha1(F.col("seg"))).alias("sha_alias_eq"),
        F.sha1(F.col("seg")).rlike("^[0-9a-f]{40}$").alias("sha1_shape_ok"),
        F.to_json(F.struct(k.alias("id"), F.col("seg").alias("s"))).alias(
            "j_doc"
        ),
        F.schema_of_json(F.lit('{"a":1,"b":[1.5]}')).alias("sj"),
        F.schema_of_csv(F.lit("1,abc,2.5")).alias("sc"),
        F.col("seg").ilike("b%").alias("ilike_b"),
        # pyspark arg order is (src, trim) — the SQL form is reversed
        F.ltrim(F.concat(F.lit("xx"), F.col("seg")), F.lit("x")).alias(
            "ltrim_seg"
        ),
        F.to_varchar(F.lit(12345.5).cast("decimal(18,2)"), F.lit("99999.99")).alias(
            "to_varchar_num"
        ),
        F.to_char(F.lit(987.25).cast("decimal(18,2)"), F.lit("999.99")).alias(
            "to_char_num"
        ),
    )
    return out.orderBy("k")


Q406_SQL = """
WITH c AS (
  SELECT c_custkey AS k, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT CAST(k AS BIGINT) AS k,
       '{"id":' || CAST(k AS VARCHAR) || '}' AS pj_ok,
       TRUE AS pj_bad_null,
       'a b/' || CAST(k AS VARCHAR) AS url_ok,
       TRUE AS url_bad_null,
       TRUE AS bin_ok,
       TRUE AS bin_bad_null,
       TRUE AS num_bad_null,
       TRUE AS ts_bad_null,
       TRUE AS ascii_valid,
       TRUE AS ff_invalid,
       TRUE AS make_valid_identity,
       TRUE AS validate_identity,
       TRUE AS try_validate_null,
       TRUE AS sha_alias_eq,
       TRUE AS sha1_shape_ok,
       '{"id":' || CAST(k AS VARCHAR) || ',"s":"' || seg || '"}' AS j_doc,
       'STRUCT<a: BIGINT, b: ARRAY<DOUBLE>>' AS sj,
       'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>' AS sc,
       seg ILIKE 'b%' AS ilike_b,
       ltrim('xx' || seg, 'x') AS ltrim_seg,
       '12345.50' AS to_varchar_num,
       '987.25' AS to_char_num
FROM c ORDER BY k
"""


QUERIES_EXT84 = {
    "q404_engine_introspection_cert": q404_engine_introspection_cert,
    "q405_time_type_cert": q405_time_type_cert,
    "q406_try_parse_utf8_cert": q406_try_parse_utf8_cert,
}


def _oracles_ext84() -> dict[str, str]:
    return {
        "q404_engine_introspection_cert": Q404_SQL,
        "q405_time_type_cert": Q405_SQL,
        "q406_try_parse_utf8_cert": Q406_SQL,
    }
