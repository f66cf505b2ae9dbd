"""Round-4 driver query families, batch 48 (q310-q313): the
nonparametric statistics quartet — Kolmogorov-Smirnov, Mann-Whitney U,
Kendall's tau-b, Spearman's rho — every statistic derived in EXACT
integer arithmetic (cross-multiplied CDF gaps, doubled rank sums,
concordance counts, rank power sums), so the distribution-free tests
the methods exist for are also accumulation-order-free.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q310


def q310_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X271: two-sample Kolmogorov-Smirnov statistic — the
    distribution-comparison test X132's binned drift monitor
    approximates, computed EXACTLY: purchase vs view event values
    (cents), D = max over the pooled sample of |F₁(x) − F₂(x)|. The
    empirical CDFs are cumulative counts over one value-ordered
    window (RANGE frame so ties take the whole peer group on both
    sides), and the max gap compares |c₁·n₂ − c₂·n₁| as exact
    integers — D itself is one final division. No binning error, no
    float CDFs.

    Scale: one sort-order window over the pooled relation + one max
    fold — the exact test at the cost of a sort, where the binned
    monitor trades exactness for a map-only pass."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        (F.col("event_type") == "purchase").cast("long").alias("g1"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    wcum = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()
    staged = ev.select(
        "v",
        F.sum("g1").over(wcum).alias("c1"),
        (F.count(F.lit(1)).over(wcum) - F.sum("g1").over(wcum)).alias("c2"),
        F.sum("g1").over(wtot).alias("n1"),
        (F.count(F.lit(1)).over(wtot) - F.sum("g1").over(wtot)).alias("n2"),
    )
    g = staged.agg(
        F.max(
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        ).alias("num"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return g.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_view"),
        (F.col("num") / (F.col("n1") * F.col("n2")).cast("double")).alias(
            "ks_statistic"
        ),
    )


Q310_SQL = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'view')
),
staged AS (
  SELECT v,
         sum(g1) OVER w AS c1,
         count(*) OVER w - sum(g1) OVER w AS c2,
         sum(g1) OVER () AS n1,
         count(*) OVER () - sum(g1) OVER () AS n2
  FROM ev
  WINDOW w AS (ORDER BY v RANGE UNBOUNDED PRECEDING)
),
g AS (
  SELECT max(abs(c1 * n2 - c2 * n1)) AS num, max(n1) AS n1, max(n2) AS n2
  FROM staged
)
SELECT CAST(n1 AS BIGINT) AS n_purchase,
       CAST(n2 AS BIGINT) AS n_view,
       num / CAST(n1 * n2 AS DOUBLE) AS ks_statistic
FROM g
"""


# ------------------------------------------------------------- q311


def q311_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X272: Mann-Whitney U (rank-sum) — the nonparametric two-sample
    location test: pooled values rank with AVERAGE ranks on ties;
    U₁ = R₁ − n₁(n₁+1)/2. Average ranks are halves at worst, so the
    DOUBLED rank sum 2R₁ is an exact integer (2·avg_rank =
    first_rank + last_rank of the tie group, from one RANGE-framed
    count pair) — the statistic never touches floats until the final
    report. Emits U for both sides and the identity check
    U₁ + U₂ = n₁·n₂ (exactly true — emitted as a verdict, the
    arithmetic self-audit).

    Scale: one value-ordered window pass + a 1-row fold — same
    economics as q310's exact KS."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        (F.col("event_type") == "purchase").cast("long").alias("g1"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v"),
    )
    wlt = Window.orderBy("v").rangeBetween(
        Window.unboundedPreceding, -1
    )
    wle = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    # 2·avg_rank = (#<v + 1) + (#<=v) — the tie group's first+last rank.
    staged = ev.select(
        "g1",
        (
            F.coalesce(F.count(F.lit(1)).over(wlt), F.lit(0))
            + 1
            + F.count(F.lit(1)).over(wle)
        ).alias("rank2"),
    )
    g = staged.agg(
        F.sum(F.when(F.col("g1") == 1, F.col("rank2")).otherwise(0)).alias(
            "r1x2"
        ),
        F.sum("rank2").alias("rtot2"),
        F.sum("g1").alias("n1"),
        (F.count(F.lit(1)) - F.sum("g1")).alias("n2"),
    )
    u1x2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    ntot = F.col("n1") + F.col("n2")
    return g.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_view"),
        (u1x2 / F.lit(2.0)).alias("u_purchase"),
        (
            (F.col("n1") * F.col("n2")) - u1x2 / F.lit(2.0)
        ).alias("u_view"),
        # Σ(2·avg_rank) over the pool = N(N+1) EXACTLY — the doubled
        # average-rank construction's arithmetic self-audit.
        (F.col("rtot2") == ntot * (ntot + 1)).alias("rank_sum_identity"),
    )


Q311_SQL = """
WITH ev AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'view')
),
staged AS (
  SELECT g1,
         coalesce(count(*) OVER (ORDER BY v
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + 1
           + count(*) OVER (ORDER BY v RANGE UNBOUNDED PRECEDING) AS rank2
  FROM ev
),
g AS (
  SELECT sum(CASE WHEN g1 = 1 THEN rank2 ELSE 0 END) AS r1x2,
         sum(rank2) AS rtot2,
         sum(g1) AS n1,
         count(*) - sum(g1) AS n2
  FROM staged
)
SELECT CAST(n1 AS BIGINT) AS n_purchase,
       CAST(n2 AS BIGINT) AS n_view,
       (r1x2 - n1 * (n1 + 1)) / 2.0 AS u_purchase,
       (n1 * n2) - (r1x2 - n1 * (n1 + 1)) / 2.0 AS u_view,
       rtot2 = (n1 + n2) * (n1 + n2 + 1) AS rank_sum_identity
FROM g
"""


# ------------------------------------------------------------- q312


def q312_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X273: Kendall's tau-b — rank correlation by CONCORDANCE over
    the daily (event count, purchase revenue) series: every day pair
    classifies as concordant/discordant/tied by pure integer sign
    comparisons, and tau-b = (C − D)/√((P−Tx)(P−Ty)) with P = n(n−1)/2
    — exact integers into one sqrt-and-divide finish. The pair
    enumeration is the textbook O(n²) self-join, priced honestly: the
    series is |days|-sized, so the quadratic is over 30 rows, not
    events (the merge-sort inversion kernel is the big-n upgrade,
    noted not needed at series grain).

    Scale: day-grain agg first — the self-join input is tiny by
    construction; at 10⁶-point series, switch to inversion counting."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("y"),
        )
    )
    # Pair join carries a DATA-DERIVED equality key (year(day)) so it
    # compiles to a hash join with the inequality as post-filter — the
    # q180 pattern; a pure-inequality self-join would be the banned
    # BroadcastNestedLoopJoin.
    keyed = daily.withColumn("yr", F.year("day"))
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.yr") == F.col("b.yr")) & (F.col("a.day") < F.col("b.day")),
    ).select(
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
    )
    g = pairs.agg(
        F.count(F.lit(1)).alias("p"),
        F.sum(
            F.when((F.col("dx") > 0) & (F.col("dy") > 0), 1)
            .when((F.col("dx") < 0) & (F.col("dy") < 0), 1)
            .otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("dx") > 0) & (F.col("dy") < 0), 1)
            .when((F.col("dx") < 0) & (F.col("dy") > 0), 1)
            .otherwise(0)
        ).alias("d"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).alias("ty"),
    )
    return g.select(
        F.col("p").cast("bigint").alias("n_pairs"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        (
            (F.col("c") - F.col("d"))
            / F.sqrt(
                ((F.col("p") - F.col("tx")) * (F.col("p") - F.col("ty")))
                .cast("double")
            )
        ).alias("kendall_tau_b"),
    )


Q312_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS x,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT b.x - a.x AS dx, b.y - a.y AS dy
  FROM daily a JOIN daily b
    ON year(a.day) = year(b.day) AND a.day < b.day
),
g AS (
  SELECT count(*) AS p,
         sum(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                  THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                  THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS tx,
         sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS ty
  FROM pairs
)
SELECT CAST(p AS BIGINT) AS n_pairs,
       CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       (c - d) / sqrt(CAST((p - tx) * (p - ty) AS DOUBLE)) AS kendall_tau_b
FROM g
"""


# ------------------------------------------------------------- q313


def q313_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X274: Spearman's rho — Pearson on RANKS: the daily (count,
    revenue) series ranks each variable with average ranks on ties
    (the q311 doubled-rank trick keeps them integer), then X64's
    exact power-sum Pearson runs on the doubled ranks — scaling both
    variables by 2 leaves the correlation untouched, so rho comes out
    of all-integer sums with the standard two-sqrt finish. The
    monotone-association metric robust to outliers that wreck raw
    Pearson.

    Scale: two rank windows + one power-sum fold over the |days|
    series."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("y"),
        )
    )

    def rank2(col: str) -> F.Column:
        wlt = Window.orderBy(col).rangeBetween(Window.unboundedPreceding, -1)
        wle = Window.orderBy(col).rangeBetween(Window.unboundedPreceding, 0)
        return (
            F.coalesce(F.count(F.lit(1)).over(wlt), F.lit(0))
            + 1
            + F.count(F.lit(1)).over(wle)
        )

    ranked = daily.select(
        rank2("x").alias("rx"), rank2("y").alias("ry")
    )
    g = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        F.col("n").cast("bigint").alias("n_days"),
        (
            num.cast("double")
            / F.sqrt(denx.cast("double") * deny.cast("double"))
        ).alias("spearman_rho"),
    )


Q313_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS x,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS y
  FROM events GROUP BY 1
),
ranked AS (
  SELECT
    coalesce(count(*) OVER (ORDER BY x
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + 1 + count(*) OVER (ORDER BY x RANGE UNBOUNDED PRECEDING) AS rx,
    coalesce(count(*) OVER (ORDER BY y
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + 1 + count(*) OVER (ORDER BY y RANGE UNBOUNDED PRECEDING) AS ry
  FROM daily
),
g AS (
  SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_rho
FROM g
"""


QUERIES_EXT48 = {
    "q310_ks_statistic": q310_ks_statistic,
    "q311_mann_whitney_u": q311_mann_whitney_u,
    "q312_kendall_tau": q312_kendall_tau,
    "q313_spearman_rho": q313_spearman_rho,
}


def _oracles_ext48() -> dict[str, str]:
    return {
        "q310_ks_statistic": Q310_SQL,
        "q311_mann_whitney_u": Q311_SQL,
        "q312_kendall_tau": Q312_SQL,
        "q313_spearman_rho": Q313_SQL,
    }
