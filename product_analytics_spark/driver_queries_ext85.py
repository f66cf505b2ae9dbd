"""Round-7 driver query families, batch 85 (q407): the session-context
function family plus dynamic-dispatch aliases, certified by property.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q407


def q407_session_context_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): session-context functions and
    dynamic dispatch — current_date, curdate, now, localtimestamp,
    current_timestamp's whole family by property, current_timezone,
    current_catalog, current_database, current_schema, current_user,
    session_user, call_function, java_method, try_reflect (14
    builtins). Context values are nondeterministic by definition, so
    each is pinned to the invariant the engine CONTRACTS:

      * current_date == curdate == now()'s date == localtimestamp's
        date (one evaluation instant per query — Spark folds these at
        plan time, so all four agree even across midnight);
      * now/localtimestamp land inside a [driver_before, driver_after]
        bracket captured around the action (clock sanity);
      * current_timezone() == 'UTC' — the engine PINS the session zone
        (session.py); this door is the regression guard for that pin;
      * current_catalog/current_database/current_schema name the
        default local catalog ('spark_catalog'/'default'/'default');
      * current_user == session_user, non-empty;
      * call_function dispatches a builtin by NAME with identical
        results (upper ≡ call_function('upper')), java_method ≡
        reflect (q384's door, alias pinned), try_reflect returns NULL
        on a bogus method instead of raising.

    The compared values are the booleans plus exact per-segment counts
    so the certificate rides a real aggregation.

    Scale: context functions are plan-time literals — zero per-row
    cost; call_function resolves at analysis, not dispatch-per-row."""
    before = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    d = c.select(
        "k",
        "seg",
        F.current_date().alias("cd"),
        F.curdate().alias("cd2"),
        F.now().alias("nw"),
        F.localtimestamp().alias("lts"),
        F.current_timezone().alias("tz"),
        F.current_catalog().alias("cat"),
        F.current_database().alias("db"),
        F.current_schema().alias("sch"),
        F.current_user().alias("usr"),
        F.session_user().alias("susr"),
        F.call_function("upper", F.col("seg")).alias("cf_upper"),
        F.java_method(
            F.lit("java.lang.Long"), F.lit("toHexString"), F.col("k")
        ).alias("jm_hex"),
        F.expr("reflect('java.lang.Long', 'toHexString', k)").alias("r_hex"),
        # try_ covers RUNTIME reflection exceptions (a missing method
        # is an analysis error even under try_): parseLong on garbage
        # throws NumberFormatException per row -> NULL.
        F.try_reflect(
            F.lit("java.lang.Long"),
            F.lit("parseLong"),
            F.concat(F.lit("x"), F.col("seg")),
        ).alias("tr_bogus"),
    )
    g = d.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count_if(
                (F.col("cd") == F.col("cd2"))
                & (F.to_date("nw") == F.col("cd"))
                & (F.to_date("lts") == F.col("cd"))
            )
            == F.count(F.lit(1))
        ).alias("one_instant_ok"),
        F.min("nw").alias("_nw_min"),
        F.max("nw").alias("_nw_max"),
        (F.min("tz") == F.lit("UTC")).alias("tz_pinned_utc"),
        (
            (F.min("cat") == F.lit("spark_catalog"))
            & (F.min("db") == F.lit("default"))
            & (F.min("sch") == F.lit("default"))
        ).alias("catalog_ok"),
        (
            (F.min("usr") == F.min("susr")) & (F.length(F.min("usr")) > 0)
        ).alias("user_ok"),
        (
            F.count_if(F.col("cf_upper") == F.upper("seg"))
            == F.count(F.lit(1))
        ).alias("call_function_ok"),
        (
            F.count_if(F.col("jm_hex") == F.col("r_hex"))
            == F.count(F.lit(1))
        ).alias("java_method_alias_ok"),
        (F.count("tr_bogus") == 0).alias("try_reflect_null_ok"),
    )
    after_margin_s = 3600  # clock bracket: generous, one-sided checks
    return g.select(
        "seg",
        "n",
        "one_instant_ok",
        (
            (F.col("_nw_min") >= F.lit(before - dt.timedelta(seconds=5)))
            & (
                F.col("_nw_max")
                <= F.lit(before + dt.timedelta(seconds=after_margin_s))
            )
        ).alias("clock_bracket_ok"),
        "tz_pinned_utc",
        "catalog_ok",
        "user_ok",
        "call_function_ok",
        "java_method_alias_ok",
        "try_reflect_null_ok",
    ).orderBy("seg")


Q407_SQL = """
SELECT c_mktsegment AS seg,
       CAST(count(*) AS BIGINT) AS n,
       TRUE AS one_instant_ok,
       TRUE AS clock_bracket_ok,
       TRUE AS tz_pinned_utc,
       TRUE AS catalog_ok,
       TRUE AS user_ok,
       TRUE AS call_function_ok,
       TRUE AS java_method_alias_ok,
       TRUE AS try_reflect_null_ok
FROM customer GROUP BY seg ORDER BY seg
"""


QUERIES_EXT85 = {
    "q407_session_context_cert": q407_session_context_cert,
}


def _oracles_ext85() -> dict[str, str]:
    return {
        "q407_session_context_cert": Q407_SQL,
    }
