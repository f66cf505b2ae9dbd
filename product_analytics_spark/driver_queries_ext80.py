"""Round-7 driver query families, batch 80 (q395-q396): function-
surface doors from the SURFACE_AUDIT sweep — the regression/moment
aggregate family and the epoch/timezone conversion family, each
certified against exact integer closed forms (the q155 in-plan-verdict
pattern: compared values are engine-portable exact statistics, and the
float-producing builtins are pinned in-row against those statistics).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q395

_REL_TOL = 1e-6


def _close(a: F.Column, b: F.Column) -> F.Column:
    """|a-b| <= tol * max(|a|,|b|,1) — the relative-closeness gate the
    in-row certificates use (floats never cross the engine boundary;
    only these booleans and the exact statistics do)."""
    return F.abs(a - b) <= _REL_TOL * F.greatest(F.abs(a), F.abs(b), F.lit(1.0))


def q395_regression_moments_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the full second-moment aggregate
    family — regr_slope/intercept/r2/avgx/avgy/count/sxx/sxy/syy,
    covar_pop/covar_samp, var_pop/var_samp/variance,
    stddev/stddev_samp/std, skewness, kurtosis (19 builtins) — over
    (x = whole-dollar order price, y = order day-of-year) per
    priority.

    Exactness discipline: every builtin is a cross-row FLOAT
    accumulation, which this suite never compares across engines (the
    q208/q296 lesson). The compared values are instead the EXACT
    integer statistics both engines compute identically — n, Σx, Σy,
    and the centered-moment numerators Mxx = n·Σx²−(Σx)²,
    Mxy = n·Σxy−Σx·Σy, Myy (DECIMAL(38,0) on Spark, HUGEINT in
    DuckDB, emitted as strings) — plus regr_avgx/avgy re-derived as
    the exactly-representable Σ/n divisions. Each builtin is then
    pinned IN-ROW against its closed form over those exact sums
    (population g1 skewness and excess kurtosis — calibrated against
    Spark's definitions), and the oracle asserts the certificate
    booleans TRUE.

    Scale: one shuffle of 8 decimal partials per group — the moment
    sums are classic mergeable aggregate state; the builtins ride the
    same partial-merge plan (Welford-style buffers)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"
        ).alias("x"),
        F.dayofyear("o_orderdate").cast("bigint").alias("y"),
    )
    # Per-row powers: x^2, x^3, x*y, y^2 fit BIGINT exactly
    # (x <= ~6e5 -> x^3 <= 2.2e17 < 2^63); x^4 needs DECIMAL.
    rows = o.select(
        "prio",
        "x",
        "y",
        (F.col("x") * F.col("x")).alias("x2"),
        (F.col("x") * F.col("x") * F.col("x")).alias("x3"),
        (
            (F.col("x") * F.col("x")).cast("decimal(38,0)")
            * (F.col("x") * F.col("x")).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("x4"),
        (F.col("x") * F.col("y")).alias("xy"),
        (F.col("y") * F.col("y")).alias("y2"),
    )
    g = rows.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x2").cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.col("x3").cast("decimal(38,0)")).alias("sxxx"),
        F.sum("x4").alias("sxxxx"),
        F.sum(F.col("xy").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("y2").cast("decimal(38,0)")).alias("syy"),
        # the 19 builtins under certification (regr_* take (y, x)):
        F.regr_count("y", "x").alias("b_n"),
        F.regr_slope("y", "x").alias("b_slope"),
        F.regr_intercept("y", "x").alias("b_icept"),
        F.regr_r2("y", "x").alias("b_r2"),
        F.regr_avgx("y", "x").alias("b_avgx"),
        F.regr_avgy("y", "x").alias("b_avgy"),
        F.regr_sxx("y", "x").alias("b_sxx"),
        F.regr_sxy("y", "x").alias("b_sxy"),
        F.regr_syy("y", "x").alias("b_syy"),
        F.covar_pop("x", "y").alias("b_cvp"),
        F.covar_samp("x", "y").alias("b_cvs"),
        F.var_pop("x").alias("b_vp"),
        F.var_samp("x").alias("b_vs"),
        F.variance("x").alias("b_var"),
        F.stddev("x").alias("b_sd"),
        F.stddev_samp("x").alias("b_sds"),
        F.std("x").alias("b_std"),
        F.skewness("x").alias("b_skew"),
        F.kurtosis("x").alias("b_kurt"),
    )
    # Exact centered numerators in DECIMAL (string-compared), and the
    # double closed forms for the in-row pins. Spark's DECIMAL->DOUBLE
    # cast is correctly rounded; all float math below is Spark-side
    # only (never compared cross-engine).
    nD = F.col("n").cast("decimal(38,0)")
    mxx = (nD * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    mxy = (
        nD * F.col("sxy")
        - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    ).cast("decimal(38,0)")
    myy = (nD * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    d = (
        g.withColumn("mxx", mxx)
        .withColumn("mxy", mxy)
        .withColumn("myy", myy)
        .withColumn("nf", F.col("n").cast("double"))
        .withColumn("mean", F.col("sx").cast("double") / F.col("nf"))
        .withColumn("mxxf", F.col("mxx").cast("double"))
        .withColumn("mxyf", F.col("mxy").cast("double"))
        .withColumn("myyf", F.col("myy").cast("double"))
        .withColumn("m2s", F.col("mxxf") / (F.col("nf") * F.col("nf")))
        .withColumn(
            "m3s",
            F.col("sxxx").cast("double") / F.col("nf")
            - 3.0 * F.col("mean") * F.col("sxx").cast("double") / F.col("nf")
            + 2.0 * F.pow("mean", F.lit(3.0)),
        )
        .withColumn(
            "m4s",
            F.col("sxxxx").cast("double") / F.col("nf")
            - 4.0 * F.col("mean") * F.col("sxxx").cast("double") / F.col("nf")
            + 6.0
            * F.col("mean")
            * F.col("mean")
            * F.col("sxx").cast("double")
            / F.col("nf")
            - 3.0 * F.pow("mean", F.lit(4.0)),
        )
    )
    slope_cf = F.col("mxyf") / F.col("mxxf")
    icept_cf = (
        F.col("sy").cast("double") - slope_cf * F.col("sx").cast("double")
    ) / F.col("nf")
    return d.select(
        "prio",
        F.col("n").cast("bigint").alias("n"),
        F.col("sx").cast("bigint").alias("sx"),
        F.col("sy").cast("bigint").alias("sy"),
        F.col("mxx").cast("string").alias("mxx"),
        F.col("mxy").cast("string").alias("mxy"),
        F.col("myy").cast("string").alias("myy"),
        (F.col("sx").cast("double") / F.col("nf")).alias("avg_x"),
        (F.col("sy").cast("double") / F.col("nf")).alias("avg_y"),
        (F.col("b_n") == F.col("n")).alias("count_ok"),
        _close(F.col("b_slope"), slope_cf).alias("slope_ok"),
        _close(F.col("b_icept"), icept_cf).alias("intercept_ok"),
        _close(
            F.col("b_r2"),
            (F.col("mxyf") * F.col("mxyf")) / (F.col("mxxf") * F.col("myyf")),
        ).alias("r2_ok"),
        (
            _close(F.col("b_avgx"), F.col("sx").cast("double") / F.col("nf"))
            & _close(F.col("b_avgy"), F.col("sy").cast("double") / F.col("nf"))
        ).alias("avgs_ok"),
        (
            _close(F.col("b_sxx"), F.col("mxxf") / F.col("nf"))
            & _close(F.col("b_sxy"), F.col("mxyf") / F.col("nf"))
            & _close(F.col("b_syy"), F.col("myyf") / F.col("nf"))
        ).alias("sums_of_squares_ok"),
        (
            _close(F.col("b_cvp"), F.col("mxyf") / (F.col("nf") * F.col("nf")))
            & _close(F.col("b_cvs"), F.col("mxyf") / (F.col("nf") * (F.col("nf") - 1)))
        ).alias("covar_ok"),
        (
            _close(F.col("b_vp"), F.col("mxxf") / (F.col("nf") * F.col("nf")))
            & _close(F.col("b_vs"), F.col("mxxf") / (F.col("nf") * (F.col("nf") - 1)))
            & _close(F.col("b_var"), F.col("mxxf") / (F.col("nf") * (F.col("nf") - 1)))
            & _close(
                F.col("b_sd"),
                F.sqrt(F.col("mxxf") / (F.col("nf") * (F.col("nf") - 1))),
            )
            & _close(
                F.col("b_sds"),
                F.sqrt(F.col("mxxf") / (F.col("nf") * (F.col("nf") - 1))),
            )
            & _close(
                F.col("b_std"),
                F.sqrt(F.col("mxxf") / (F.col("nf") * (F.col("nf") - 1))),
            )
        ).alias("var_std_ok"),
        (
            _close(F.col("b_skew"), F.col("m3s") / F.pow("m2s", F.lit(1.5)))
            & _close(
                F.col("b_kurt"),
                F.col("m4s") / (F.col("m2s") * F.col("m2s")) - 3.0,
            )
        ).alias("skew_kurt_ok"),
    ).orderBy("prio")


Q395_SQL = """
WITH b AS (
  SELECT o_orderpriority AS prio,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS x,
         CAST(dayofyear(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS y
  FROM orders
),
g AS (
  SELECT prio,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM b GROUP BY prio
)
SELECT prio,
       CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS sx,
       CAST(sy AS BIGINT) AS sy,
       CAST(n * sxx - sx * sx AS VARCHAR) AS mxx,
       CAST(n * sxy - sx * sy AS VARCHAR) AS mxy,
       CAST(n * syy - sy * sy AS VARCHAR) AS myy,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS avg_x,
       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS avg_y,
       TRUE AS count_ok,
       TRUE AS slope_ok,
       TRUE AS intercept_ok,
       TRUE AS r2_ok,
       TRUE AS avgs_ok,
       TRUE AS sums_of_squares_ok,
       TRUE AS covar_ok,
       TRUE AS var_std_ok,
       TRUE AS skew_kurt_ok
FROM g ORDER BY prio
"""


# ------------------------------------------------------------- q396

TZ_EAST = "Asia/Kolkata"  # +05:30 year-round: exercises half-hour offsets
TZ_WEST = "America/New_York"  # DST: -05:00 in the data's January window
_FMT = "yyyy-MM-dd HH:mm:ss"


def q396_epoch_timezone_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface door (certificate): the epoch/timezone conversion
    family — unix_seconds, timestamp_seconds, timestamp_millis,
    to_unix_timestamp, from_unixtime, unix_date, date_from_unix_date,
    from_utc_timestamp, to_utc_timestamp, convert_timezone,
    timestamp_add, timestamp_diff, dateadd, date_part, datepart,
    dayofyear, minute, second, trunc, make_dt_interval (20 builtins) —
    over per-day representative event timestamps.

    Everything compared is an exact integer (epoch seconds/days,
    interval diffs) or a formatted string (round-trips, zone shifts) —
    no floats anywhere. The session timezone is UTC (session.py), so
    LTZ == the literal instant; the two fixed zones exercise a
    half-hour offset (Asia/Kolkata) and a negative DST zone
    (America/New_York, EST in the data's January window). DuckDB's
    ``timezone(tz, ts)`` pair of orientations mirrors
    from_utc_timestamp/to_utc_timestamp; both engines read the same
    IANA tzdata.

    Scale: all per-row codegen over one |days|-group pre-aggregation —
    the shuffle moves 30 representative rows."""
    # One representative (min) event per day: 30 rows, deterministic.
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("second", "ts").alias("ts"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.min("ts").alias("ts"))
    )
    fmt = lambda c: F.date_format(c, _FMT)  # noqa: E731
    out = ev.select(
        "day",
        F.unix_seconds(F.col("ts")).alias("epoch_s"),
        F.to_unix_timestamp("ts").alias("epoch_s2"),
        fmt(F.timestamp_seconds(F.unix_seconds("ts"))).alias("rt_seconds"),
        F.date_format(
            F.timestamp_millis(F.unix_seconds("ts") * 1000 + 250),
            _FMT + ".SSS",
        ).alias("plus_250ms"),
        F.from_unixtime(F.unix_seconds("ts")).alias("from_unix_str"),
        F.unix_date(F.to_date("ts")).alias("epoch_days"),
        F.date_format(
            F.date_from_unix_date(F.unix_date(F.to_date("ts")) + 45), "yyyy-MM-dd"
        ).alias("plus_45d"),
        fmt(F.from_utc_timestamp("ts", TZ_EAST)).alias("in_kolkata"),
        fmt(F.to_utc_timestamp(F.from_utc_timestamp("ts", TZ_EAST), TZ_EAST)).alias(
            "rt_kolkata"
        ),
        fmt(F.convert_timezone(F.lit("UTC"), F.lit(TZ_WEST), F.col("ts").cast("timestamp_ntz"))).alias(
            "in_newyork"
        ),
        fmt(F.timestamp_add("HOUR", F.lit(7), F.col("ts"))).alias("plus_7h"),
        F.timestamp_diff(
            "MINUTE", F.col("ts"), F.timestamp_add("HOUR", F.lit(7), F.col("ts"))
        ).alias("diff_min"),
        F.date_format(F.dateadd(F.to_date("ts"), F.lit(100)), "yyyy-MM-dd").alias(
            "dateadd_100"
        ),
        F.date_part(F.lit("DAY"), F.col("ts")).cast("bigint").alias("part_day"),
        F.datepart(F.lit("HOUR"), F.col("ts")).cast("bigint").alias("part_hour"),
        F.dayofyear("ts").cast("bigint").alias("doy"),
        F.minute("ts").cast("bigint").alias("minute_of"),
        F.second("ts").cast("bigint").alias("second_of"),
        F.date_format(F.trunc(F.to_date("ts"), "MM"), "yyyy-MM-dd").alias(
            "month_floor"
        ),
        fmt(F.col("ts") + F.make_dt_interval(F.lit(1), F.lit(2), F.lit(30), F.lit(0))).alias(
            "plus_1d_2h_30m"
        ),
    )
    return out.orderBy("day")


Q396_SQL = f"""
WITH ev AS (
  SELECT strftime(d_ts, '%Y-%m-%d') AS day, min(d_ts) AS ts
  FROM (SELECT date_trunc('second', CAST(ts AS TIMESTAMP)) AS d_ts FROM events)
  GROUP BY 1
)
SELECT day,
       CAST(epoch(ts) AS BIGINT) AS epoch_s,
       CAST(epoch(ts) AS BIGINT) AS epoch_s2,
       strftime(to_timestamp(CAST(epoch(ts) AS BIGINT)), '%Y-%m-%d %H:%M:%S')
         AS rt_seconds,
       strftime(to_timestamp(CAST(epoch(ts) AS BIGINT) + 0.25),
                '%Y-%m-%d %H:%M:%S.%g') AS plus_250ms,
       strftime(to_timestamp(CAST(epoch(ts) AS BIGINT)), '%Y-%m-%d %H:%M:%S')
         AS from_unix_str,
       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
         AS epoch_days,
       strftime(CAST(ts AS DATE) + INTERVAL 45 DAY, '%Y-%m-%d') AS plus_45d,
       strftime(ts + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS in_kolkata,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS rt_kolkata,
       strftime(ts - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS in_newyork,
       strftime(ts + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_7h,
       CAST(420 AS BIGINT) AS diff_min,
       strftime(CAST(ts AS DATE) + INTERVAL 100 DAY, '%Y-%m-%d') AS dateadd_100,
       CAST(day(ts) AS BIGINT) AS part_day,
       CAST(hour(ts) AS BIGINT) AS part_hour,
       CAST(dayofyear(ts) AS BIGINT) AS doy,
       CAST(minute(ts) AS BIGINT) AS minute_of,
       CAST(second(ts) AS BIGINT) AS second_of,
       strftime(date_trunc('month', CAST(ts AS DATE)), '%Y-%m-%d') AS month_floor,
       strftime(ts + INTERVAL 1 DAY + INTERVAL 150 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS plus_1d_2h_30m
FROM ev ORDER BY day
"""


QUERIES_EXT80 = {
    "q395_regression_moments_cert": q395_regression_moments_cert,
    "q396_epoch_timezone_cert": q396_epoch_timezone_cert,
}


def _oracles_ext80() -> dict[str, str]:
    return {
        "q395_regression_moments_cert": Q395_SQL,
        "q396_epoch_timezone_cert": Q396_SQL,
    }
