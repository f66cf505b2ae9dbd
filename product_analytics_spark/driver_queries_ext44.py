"""Round-4 driver query families, batch 44 (q294-q297): discount
elasticity, return-age cohorts, Cramér's V association, and the
document-length tail audit.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t
from product_analytics_spark.driver_queries_ext33 import _CENTS, _DPCT, _QTY

# ------------------------------------------------------------- q294


def q294_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X255: discount effectiveness curve — the pricing question asked
    of the fact table: per discount band (exact integer percent from
    the 2-dp decimal), average quantity, revenue share, and the
    quantity uplift vs the zero-discount band — the elasticity-ish
    read every promo review starts from. Uplift compares average
    quantities by integer cross-multiplication of (Σqty, n) pairs, so
    the per-band verdicts are exact; reported ratios are final
    doubles.

    Scale: one scan, one band-keyed agg, a ≤11-row curve + one
    baseline window join-free attach (whole-relation window over the
    band rows)."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        f"{_DPCT} AS d", f"{_QTY} AS qty", f"{_CENTS} AS cents"
    )
    g = li.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qty").alias("sq"),
        F.sum(F.expr("cents * (100 - d)")).alias("rev_units"),
    )
    wtot = Window.partitionBy()
    staged = g.select(
        "d",
        "n",
        "sq",
        "rev_units",
        F.max(F.when(F.col("d") == 0, F.col("sq"))).over(wtot).alias("sq0"),
        F.max(F.when(F.col("d") == 0, F.col("n"))).over(wtot).alias("n0"),
        F.sum("rev_units").over(wtot).alias("rt"),
    )
    return staged.select(
        F.col("d").cast("bigint").alias("discount_pct"),
        F.col("n").cast("bigint").alias("n_lines"),
        (F.col("sq") / F.col("n").cast("double")).alias("avg_qty"),
        (F.col("rev_units") / F.col("rt").cast("double")).alias(
            "revenue_share"
        ),
        # uplift vs zero-discount band: avg_qty / avg_qty0
        (
            (F.col("sq") * F.col("n0"))
            / (F.col("n") * F.col("sq0")).cast("double")
        ).alias("qty_uplift_vs_no_discount"),
        (F.col("sq") * F.col("n0") > F.col("n") * F.col("sq0")).alias(
            "lifts_quantity"
        ),
    )


Q294_SQL = f"""
WITH li AS (
  SELECT {_DPCT} AS d, {_QTY} AS qty, {_CENTS} AS cents FROM lineitem
),
g AS (
  SELECT d, count(*) AS n, sum(qty) AS sq,
         sum(cents * (100 - d)) AS rev_units
  FROM li GROUP BY d
),
staged AS (
  SELECT d, n, sq, rev_units,
         max(CASE WHEN d = 0 THEN sq END) OVER () AS sq0,
         max(CASE WHEN d = 0 THEN n END) OVER () AS n0,
         sum(rev_units) OVER () AS rt
  FROM g
)
SELECT CAST(d AS BIGINT) AS discount_pct,
       CAST(n AS BIGINT) AS n_lines,
       sq / CAST(n AS DOUBLE) AS avg_qty,
       rev_units / CAST(rt AS DOUBLE) AS revenue_share,
       (sq * n0) / CAST(n * sq0 AS DOUBLE) AS qty_uplift_vs_no_discount,
       sq * n0 > n * sq0 AS lifts_quantity
FROM staged
"""


# ------------------------------------------------------------- q295

RETURN_AGE_BANDS = (30, 90, 365)


def q295_return_age_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X256: return-rate by fulfillment-age cohort — the reverse-
    logistics question: do lineitems shipped long after the order
    return more often? Ship lag bands at {RETURN_AGE_BANDS} days
    (inverted intervals clamped — the synthetic ~20% quirk), return
    rate per band from exact counts, plus each band's share of all
    returns. Band edges are integer day comparisons; rates are final
    doubles of exact integers.

    Scale: one order⋈lineitem pass (order side provides the date),
    band rollup is 4 rows."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("odate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("sdate"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.greatest(F.datediff("sdate", "odate"), F.lit(0)).alias("lag"),
        "ret",
    )
    b1, b2, b3 = RETURN_AGE_BANDS
    band = (
        F.when(F.col("lag") <= b1, F.lit(f"0-{b1}d"))
        .when(F.col("lag") <= b2, F.lit(f"{b1 + 1}-{b2}d"))
        .when(F.col("lag") <= b3, F.lit(f"{b2 + 1}-{b3}d"))
        .otherwise(F.lit(f"{b3}d+"))
    )
    g = j.groupBy(band.alias("age_band")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ret"), 1).otherwise(0)).alias("r"),
    )
    wtot = Window.partitionBy()
    return g.select(
        "age_band",
        F.col("n").cast("bigint").alias("n_lines"),
        F.col("r").cast("bigint").alias("n_returns"),
        (F.col("r") / F.col("n").cast("double")).alias("return_rate"),
        (F.col("r") / F.sum("r").over(wtot).cast("double")).alias(
            "share_of_returns"
        ),
    )


def _q295_sql() -> str:
    b1, b2, b3 = RETURN_AGE_BANDS
    return f"""
WITH j AS (
  SELECT greatest(CAST(CAST(l.l_shipdate AS DATE)
                       - CAST(o.o_orderdate AS DATE) AS BIGINT), 0) AS lag,
         l.l_returnflag = 'R' AS ret
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
g AS (
  SELECT CASE WHEN lag <= {b1} THEN '0-{b1}d'
              WHEN lag <= {b2} THEN '{b1 + 1}-{b2}d'
              WHEN lag <= {b3} THEN '{b2 + 1}-{b3}d'
              ELSE '{b3}d+' END AS age_band,
         count(*) AS n,
         sum(CASE WHEN ret THEN 1 ELSE 0 END) AS r
  FROM j GROUP BY 1
)
SELECT age_band,
       CAST(n AS BIGINT) AS n_lines,
       CAST(r AS BIGINT) AS n_returns,
       r / CAST(n AS DOUBLE) AS return_rate,
       r / CAST(sum(r) OVER () AS DOUBLE) AS share_of_returns
FROM g
"""


# ------------------------------------------------------------- q296


def q296_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X257: Cramér's V association strength — X89's chi-square cells
    completed into the normalized effect size every contingency
    report should carry (χ² alone grows with n; V ∈ [0,1] does not):
    V = √(χ² / (n·(min(r,c)−1))) for the (market segment × order
    priority) table through the customer bridge.

    The χ² SUM is where the full-sweep caught float drift: summing 25
    per-cell double terms is accumulation-order-dependent (the q208
    trap — it passed in isolation and failed in the sweep when the
    partitioning changed). Fixed by EXACT fixed-point division per
    cell: q = floor(d²·S / (R·C)) computed as a two-part quotient
    (d² div RC)·S + ((d² mod RC)·S) div RC — never overflows through
    sf0.1 (BIGINT headroom noted: beyond ~sf1 the cell math moves to
    DECIMAL(38)) — then ONE exact integer sum and a single final
    double chain for χ² and V.

    Scale: the contingency table is (segments × priorities) tiny
    after one joined aggregation; the effect size is a fold over it."""
    SCALE = 1_000_000
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.substring("o_orderpriority", 1, 1).alias("prio")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "prio")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wr = Window.partitionBy("c_mktsegment")
    wc = Window.partitionBy("prio")
    wtot = Window.partitionBy()
    staged = cell.select(
        "c_mktsegment",
        "prio",
        "obs",
        F.sum("obs").over(wr).alias("rsum"),
        F.sum("obs").over(wc).alias("csum"),
        F.sum("obs").over(wtot).alias("n"),
    )
    q = F.expr(
        "CAST(((n * obs - rsum * csum) * (n * obs - rsum * csum))"
        " div (rsum * csum) AS BIGINT) * {S}"
        " + CAST((((n * obs - rsum * csum) * (n * obs - rsum * csum))"
        " % (rsum * csum)) * {S} div (rsum * csum) AS BIGINT)".format(S=SCALE)
    )
    g = staged.agg(
        F.sum(q).alias("qsum"),
        F.max("n").alias("n"),
        F.count_distinct("c_mktsegment").alias("nr"),
        F.count_distinct("prio").alias("nc"),
    )
    chi2 = F.col("qsum") / (F.col("n").cast("double") * SCALE)
    return g.select(
        F.col("n").cast("bigint").alias("n_orders"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2 / (F.col("n") * (F.least("nr", "nc") - 1)).cast("double")
        ).alias("cramers_v"),
    )


def _q296_sql() -> str:
    SCALE = 1_000_000
    return f"""
WITH cell AS (
  SELECT c.c_mktsegment, substr(o.o_orderpriority, 1, 1) AS prio,
         count(*) AS obs
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
staged AS (
  SELECT c_mktsegment, prio, obs,
         sum(obs) OVER (PARTITION BY c_mktsegment) AS rsum,
         sum(obs) OVER (PARTITION BY prio) AS csum,
         sum(obs) OVER () AS n
  FROM cell
),
g AS (
  SELECT sum(
           CAST(((n * obs - rsum * csum) * (n * obs - rsum * csum))
                // (rsum * csum) AS BIGINT) * {SCALE}
           + CAST((((n * obs - rsum * csum) * (n * obs - rsum * csum))
                   % (rsum * csum)) * {SCALE} // (rsum * csum) AS BIGINT)
         ) AS qsum,
         max(n) AS n,
         count(DISTINCT c_mktsegment) AS nr,
         count(DISTINCT prio) AS nc
  FROM staged
)
SELECT CAST(n AS BIGINT) AS n_orders,
       qsum / (CAST(n AS DOUBLE) * {SCALE}) AS chi2,
       sqrt((qsum / (CAST(n AS DOUBLE) * {SCALE}))
            / CAST(n * (least(nr, nc) - 1) AS DOUBLE)) AS cramers_v
FROM g
"""


# ------------------------------------------------------------- q297


def q297_doclen_tail_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X258: document-length tail audit — corpus-health screening for
    the length distribution a tokenizer/packer depends on: documents
    bucket by power-of-two length (the q209 bit-length idiom), and
    each bucket reports its count, char mass, and the count RATIO to
    the previous bucket — a roughly-constant ratio is the geometric
    tail a healthy crawl shows; a spike flags truncation or
    boilerplate injection at that length. Integer bucketing and
    counts; ratios final doubles via a lag window over the ≤~20-row
    bucket relation.

    Scale: map-side bucketing + one tiny agg — corpus-size
    independent audit output."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 1)
    bucket = F.expr(
        "CASE WHEN n_chars = 1 THEN CAST(1 AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), "
        "CAST(length(conv(n_chars - 1, 10, 2)) AS INT)) END"
    )
    g = d.groupBy(bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    w = Window.partitionBy().orderBy("len_bucket")
    return g.select(
        F.col("len_bucket").cast("bigint").alias("len_bucket"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("chars").cast("bigint").alias("total_chars"),
        (
            F.col("n_docs") / F.lag("n_docs").over(w).cast("double")
        ).alias("ratio_to_prev_bucket"),
    )


Q297_SQL = """
WITH d AS (SELECT n_chars FROM documents WHERE n_chars >= 1),
g AS (
  SELECT CASE WHEN n_chars = 1 THEN CAST(1 AS BIGINT)
              ELSE (CAST(1 AS BIGINT)
                    << CAST(length(bin(n_chars - 1)) AS INT)) END
           AS len_bucket,
         count(*) AS n_docs,
         sum(n_chars) AS chars
  FROM d GROUP BY 1
)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(chars AS BIGINT) AS total_chars,
       n_docs / CAST(lag(n_docs) OVER (ORDER BY len_bucket) AS DOUBLE)
         AS ratio_to_prev_bucket
FROM g
"""


QUERIES_EXT44 = {
    "q294_discount_elasticity": q294_discount_elasticity,
    "q295_return_age_cohorts": q295_return_age_cohorts,
    "q296_cramers_v": q296_cramers_v,
    "q297_doclen_tail_audit": q297_doclen_tail_audit,
}


def _oracles_ext44() -> dict[str, str]:
    return {
        "q294_discount_elasticity": Q294_SQL,
        "q295_return_age_cohorts": _q295_sql(),
        "q296_cramers_v": _q296_sql(),
        "q297_doclen_tail_audit": Q297_SQL,
    }
