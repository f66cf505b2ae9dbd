"""Round-4 driver query families, batch 42 (q286-q289): robust
spread-change audit, duplicate-payment detection, event-study uplift,
and DAG critical-path analysis.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t, local_rows_df

# ------------------------------------------------------------- q286

SPREAD_CUT = "2024-01-15"


def q286_spread_change_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X247: robust spread-change audit — variance drift detection the
    way a monitoring pipeline should do it: compare the IQR (p75−p25,
    outlier-immune where a variance ratio is not) of event values
    before and after a cut date, per event type. Quantiles evaluate
    over exact integer cents (F.percentile ≡ DuckDB quantile_cont —
    linear interpolation on integers is dyadic-exact, the q127
    discipline), and the widening verdict compares IQRs by
    cross-multiplication in cents — no variance, no float power sums.

    Scale: one (type, period) grouped percentile pass; the audit
    relation is |types|-sized."""
    cut = F.lit(SPREAD_CUT).cast("timestamp")
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts").cast("timestamp") >= cut).alias("post"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    )
    g = ev.groupBy("event_type", "post").agg(
        F.percentile("c", F.lit([0.25, 0.75])).alias("_p"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type",
        "post",
        "n",
        (F.col("_p")[1] - F.col("_p")[0]).alias("iqr"),
    )
    pre = g.filter(~F.col("post")).select(
        "event_type",
        F.col("n").alias("n_pre"),
        F.col("iqr").alias("iqr_pre"),
    )
    post = g.filter(F.col("post")).select(
        "event_type",
        F.col("n").alias("n_post"),
        F.col("iqr").alias("iqr_post"),
    )
    return pre.join(post, "event_type").select(
        "event_type",
        F.col("n_pre").cast("bigint").alias("n_pre"),
        F.col("n_post").cast("bigint").alias("n_post"),
        (F.col("iqr_pre") / F.lit(100.0)).alias("iqr_pre"),
        (F.col("iqr_post") / F.lit(100.0)).alias("iqr_post"),
        # widened if post IQR > 1.25 × pre IQR — 4·post > 5·pre exact
        (F.col("iqr_post") * 4 > F.col("iqr_pre") * 5).alias("spread_widened"),
    )


Q286_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(ts AS TIMESTAMP) >= TIMESTAMP '{SPREAD_CUT} 00:00:00' AS post,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, post, count(*) AS n,
         quantile_cont(c, 0.75) - quantile_cont(c, 0.25) AS iqr
  FROM ev GROUP BY 1, 2
)
SELECT p.event_type,
       CAST(p.n AS BIGINT) AS n_pre,
       CAST(q.n AS BIGINT) AS n_post,
       p.iqr / 100.0 AS iqr_pre,
       q.iqr / 100.0 AS iqr_post,
       q.iqr * 4 > p.iqr * 5 AS spread_widened
FROM (SELECT * FROM g WHERE NOT post) p
JOIN (SELECT * FROM g WHERE post) q ON q.event_type = p.event_type
"""


# ------------------------------------------------------------- q287

DUP_PAY_WINDOW_DAYS = 30
DUP_PAY_BAND_CENTS = 1_000_000  # $10k amount bands


def q287_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X248: duplicate-payment detection — the accounts-payable audit
    classic: two orders by the SAME customer in the SAME amount band
    (${DUP_PAY_BAND_CENTS}//100-wide) within {DUP_PAY_WINDOW_DAYS}
    days are duplicate-payment suspects (exact-amount matching finds
    nothing on continuous amounts — banding is how real AP audits
    block). The pair join blocks on (customer, band) — equality keys
    — so the quadratic blowup is bounded by band-collision groups;
    the day-window filter is the only inequality. Output: suspect pairs with both order keys, the
    amount, and the day gap — the reviewer's worklist ordered by
    construction (ka < kb dedups each pair).

    Scale: the (custkey, band) blocking key is highly selective, so
    the self-join carries tiny amplification — the audit costs one
    shuffle of (key → date) pairs."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    ).withColumn("band", F.expr(f"CAST(cents div {DUP_PAY_BAND_CENTS} AS BIGINT)"))
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).filter(
        F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= DUP_PAY_WINDOW_DAYS
    )
    return pairs.select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        (F.col("a.cents") / F.lit(100.0)).alias("amount"),
        F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
        .cast("bigint")
        .alias("day_gap"),
    )


Q287_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT a.o_custkey,
       a.o_orderkey AS order_a,
       b.o_orderkey AS order_b,
       a.cents / 100.0 AS amount,
       CAST(abs(a.d - b.d) AS BIGINT) AS day_gap
FROM o a JOIN o b
  ON b.o_custkey = a.o_custkey
 AND a.cents // {DUP_PAY_BAND_CENTS} = b.cents // {DUP_PAY_BAND_CENTS}
 AND a.o_orderkey < b.o_orderkey
WHERE abs(a.d - b.d) <= {DUP_PAY_WINDOW_DAYS}
"""


# ------------------------------------------------------------- q288

EVENT_DATE = "2024-01-15"
EVENT_HALF_WINDOW = 7


def q288_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X249: event-study uplift — the ±k-day window analysis around a
    marked date (launch, incident, campaign): daily purchase revenue
    indexed by day-offset from the event, each offset's revenue also
    expressed relative to the PRE-window daily average (the uplift
    index every event-study chart plots). The baseline attaches as a
    whole-relation window over the |2k+1|-row offset relation —
    integer cents, final double ratios.

    Scale: the date filter prunes the scan to the window; the study
    relation is (2k+1) rows regardless of volume."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.datediff(
            F.to_date("ts"), F.lit(EVENT_DATE).cast("date")
        ).alias("offset"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    ).filter(
        (F.col("offset") >= -EVENT_HALF_WINDOW)
        & (F.col("offset") <= EVENT_HALF_WINDOW)
    )
    daily = ev.groupBy("offset").agg(F.sum("c").alias("rev"))
    wtot = Window.partitionBy()
    staged = daily.select(
        "offset",
        "rev",
        F.sum(F.when(F.col("offset") < 0, F.col("rev")).otherwise(0))
        .over(wtot)
        .alias("pre_total"),
        F.sum(F.when(F.col("offset") < 0, 1).otherwise(0))
        .over(wtot)
        .alias("pre_days"),
    )
    return staged.select(
        F.col("offset").cast("int").alias("day_offset"),
        (F.col("rev") / F.lit(100.0)).alias("revenue"),
        (
            (F.col("rev") * F.col("pre_days"))
            / F.col("pre_total").cast("double")
        ).alias("uplift_index"),
    )


Q288_SQL = f"""
WITH ev AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '{EVENT_DATE}' AS BIGINT) AS day_off,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase'
    AND CAST(CAST(ts AS DATE) - DATE '{EVENT_DATE}' AS BIGINT)
        BETWEEN -{EVENT_HALF_WINDOW} AND {EVENT_HALF_WINDOW}
),
daily AS (SELECT day_off, sum(c) AS rev FROM ev GROUP BY day_off),
staged AS (
  SELECT day_off, rev,
         sum(CASE WHEN day_off < 0 THEN rev ELSE 0 END) OVER () AS pre_total,
         sum(CASE WHEN day_off < 0 THEN 1 ELSE 0 END) OVER () AS pre_days
  FROM daily
)
SELECT CAST(day_off AS INT) AS day_offset,
       CAST(rev AS BIGINT) / 100.0 AS revenue,
       (rev * pre_days) / CAST(pre_total AS DOUBLE) AS uplift_index
FROM staged
"""


# ------------------------------------------------------------- q289

# The model-DAG edges and per-model simulated durations are derived
# from the REGISTRY itself at import time, so Spark and the oracle
# consume the identical generated edge list — the DAG is data.


def _dag_rows() -> tuple[list[tuple[str, str]], list[tuple[str, int]]]:
    import datetime as dt

    from product_analytics_spark.models.pipeline import build_registry

    reg = build_registry(as_of=dt.date(2024, 6, 30))
    models = reg._models
    edges, durs = [], []
    for name, model in sorted(models.items()):
        h = int.from_bytes(name.encode()[:4], "big")
        durs.append((name, 10 + h % 90))
        for dep in sorted(model.deps):
            if dep in models:
                edges.append((dep, name))
    return edges, durs


def q289_dag_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X250: pipeline critical-path analysis — the scheduler question
    asked OF the engine's own model registry: with per-model durations
    (deterministic from the model name), the earliest-finish time of
    every model is the longest path through the dependency DAG —
    computed by rounds of (frontier ⋈ edges → max-fold), the max-plus
    twin of q221's min-plus Bellman-Ford. The model whose finish time
    equals the DAG's makespan IS the critical path's end; slack =
    makespan − finish is each model's scheduling headroom.

    The registry's DAG is exported as data at build time, so the
    oracle replays the identical recursion.

    Scale: the DAG is catalog-sized; the same kernel handles
    thousand-model registries (rounds = DAG depth)."""
    edges, durs = _dag_rows()
    e = local_rows_df(spark, edges, "src string, dst string")
    d = local_rows_df(spark, durs, "model string, dur long")
    # earliest finish = dur + max over preds of their finish; iterate
    # depth times (DAG depth ≤ |models|).
    finish = d.select("model", F.col("dur").alias("fin"))
    for _ in range(len(durs)):
        preds = (
            e.join(finish, e.src == finish.model)
            .groupBy("dst")
            .agg(F.max("fin").alias("pred_fin"))
        )
        finish = (
            d.join(preds, d.model == preds.dst, "left")
            .select(
                "model",
                (F.col("dur") + F.coalesce("pred_fin", F.lit(0))).alias("fin"),
            )
        )
    wtot = Window.partitionBy()
    return finish.select(
        "model",
        F.col("fin").cast("bigint").alias("earliest_finish"),
        (F.max("fin").over(wtot) - F.col("fin")).cast("bigint").alias("slack"),
        (F.col("fin") == F.max("fin").over(wtot)).alias("on_critical_path"),
    )


def _q289_sql() -> str:
    edges, durs = _dag_rows()
    ev = ", ".join(f"('{s}', '{t}')" for s, t in edges) or "(NULL, NULL)"
    dv = ", ".join(f"('{m}', {x})" for m, x in durs)
    return f"""
WITH RECURSIVE edges(src, dst) AS (VALUES {ev}),
durs(model, dur) AS (VALUES {dv}),
walk(model, fin) AS (
  SELECT model, dur FROM durs
  UNION
  SELECT e.dst, w.fin + d.dur
  FROM walk w
  JOIN edges e ON e.src = w.model
  JOIN durs d ON d.model = e.dst
),
finish AS (SELECT model, max(fin) AS fin FROM walk GROUP BY model)
SELECT model,
       CAST(fin AS BIGINT) AS earliest_finish,
       CAST(max(fin) OVER () - fin AS BIGINT) AS slack,
       fin = max(fin) OVER () AS on_critical_path
FROM finish
"""


QUERIES_EXT42 = {
    "q286_spread_change_audit": q286_spread_change_audit,
    "q287_duplicate_payments": q287_duplicate_payments,
    "q288_event_study": q288_event_study,
    "q289_dag_critical_path": q289_dag_critical_path,
}


def _oracles_ext42() -> dict[str, str]:
    return {
        "q286_spread_change_audit": Q286_SQL,
        "q287_duplicate_payments": Q287_SQL,
        "q288_event_study": Q288_SQL,
        "q289_dag_critical_path": _q289_sql(),
    }
