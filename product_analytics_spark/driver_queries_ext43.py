"""Round-4 driver query families, batch 43 (q290-q293): merge-on-read
vs copy-on-write cost model, Bayesian-smoothed popularity, capacity
runway projection, and a plan-equivalence probe.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q290

MOR_FILE_ROWS = 1000  # modeled rows per data file
MOR_UPDATE_MOD = 37  # every 37th order updates this cycle


def q290_mor_vs_cow_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X251: merge-on-read vs copy-on-write cost model — the lakehouse
    table-format decision quantified from the table's own update
    pattern: orders map to modeled {MOR_FILE_ROWS}-row files (by key
    range — the clustered layout), a deterministic update cycle
    touches every {MOR_UPDATE_MOD}th key, and the two strategies
    price out as
      CoW write amplification  = rows REWRITTEN / rows updated
        (every touched file rewrites fully), CoW read amp = 1;
      MoR write amp = 1 (delete-vector + log row), MoR read amp =
        (base + delta rows read) / base rows for a full-table read.
    All counts are exact integers from ONE file-grain aggregation —
    the numbers that decide table format per update-rate regime.

    Scale: the cost model runs on file-grain stats (q216's footer
    relation), never row data; re-pricing after each cycle is an
    incremental stat update."""
    o = _t(spark, sf_dir, "orders").select(
        F.expr(f"CAST(o_orderkey div {MOR_FILE_ROWS} AS BIGINT)").alias(
            "file_id"
        ),
        (F.col("o_orderkey") % MOR_UPDATE_MOD == 0).alias("touched"),
    )
    files = o.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("touched"), 1).otherwise(0)).alias("updated"),
    )
    g = files.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("rows").cast("bigint").alias("total_rows"),
        F.sum("updated").cast("bigint").alias("updated_rows"),
        F.sum(F.when(F.col("updated") > 0, F.col("rows")).otherwise(0))
        .cast("bigint")
        .alias("cow_rewritten_rows"),
        F.sum(F.when(F.col("updated") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("files_touched"),
    )
    return g.select(
        "n_files",
        "total_rows",
        "updated_rows",
        "files_touched",
        "cow_rewritten_rows",
        (
            F.col("cow_rewritten_rows") / F.col("updated_rows").cast("double")
        ).alias("cow_write_amplification"),
        (
            (F.col("total_rows") + F.col("updated_rows"))
            / F.col("total_rows").cast("double")
        ).alias("mor_read_amplification"),
    )


Q290_SQL = f"""
WITH o AS (
  SELECT CAST(o_orderkey // {MOR_FILE_ROWS} AS BIGINT) AS file_id,
         o_orderkey % {MOR_UPDATE_MOD} = 0 AS touched
  FROM orders
),
files AS (
  SELECT file_id, count(*) AS rows,
         sum(CASE WHEN touched THEN 1 ELSE 0 END) AS updated
  FROM o GROUP BY file_id
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(rows) AS BIGINT) AS total_rows,
       CAST(sum(updated) AS BIGINT) AS updated_rows,
       CAST(sum(CASE WHEN updated > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_touched,
       CAST(sum(CASE WHEN updated > 0 THEN rows ELSE 0 END) AS BIGINT)
         AS cow_rewritten_rows,
       CAST(sum(CASE WHEN updated > 0 THEN rows ELSE 0 END) AS BIGINT)
         / CAST(sum(updated) AS DOUBLE) AS cow_write_amplification,
       (sum(rows) + sum(updated)) / CAST(sum(rows) AS DOUBLE)
         AS mor_read_amplification
FROM files
"""


# ------------------------------------------------------------- q291

SMOOTH_PRIOR_WEIGHT = 20


def q291_smoothed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X252: Bayesian-smoothed popularity ranking — the cold-start
    fix every recommender's fallback ranking needs: raw
    purchase-per-view rates explode for low-traffic items, so each
    part type's BRAND ranking shrinks toward the type's global rate
    with prior weight {SMOOTH_PRIOR_WEIGHT}:
      smoothed = (purchases + w·global_rate) / (views + w).
    Exact integer counts feed an identically-formed double formula;
    the rank flips the raw ordering exactly where small samples lied
    — the emitted raw-vs-smoothed rank columns show the correction.

    Scale: one (type, brand) agg + a type-keyed window for the global
    rates and ranks — catalog-sized after the fact scan."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_returnflag") == "R").alias("ret")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    g = j.groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ret"), 1).otherwise(0)).alias("s"),
    )
    wtype = Window.partitionBy("p_type")
    staged = g.select(
        "p_type",
        "p_brand",
        "n",
        "s",
        F.sum("n").over(wtype).alias("tn"),
        F.sum("s").over(wtype).alias("ts"),
    )
    glob = F.col("ts") / F.col("tn").cast("double")
    smoothed = (F.col("s") + SMOOTH_PRIOR_WEIGHT * glob) / (
        F.col("n") + F.lit(float(SMOOTH_PRIOR_WEIGHT))
    )
    wraw = Window.partitionBy("p_type").orderBy(
        (F.col("s") / F.col("n").cast("double")).desc(), F.col("p_brand")
    )
    wsm = Window.partitionBy("p_type").orderBy(
        smoothed.desc(), F.col("p_brand")
    )
    return staged.select(
        "p_type",
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        (F.col("s") / F.col("n").cast("double")).alias("raw_rate"),
        smoothed.alias("smoothed_rate"),
        F.row_number().over(wraw).cast("int").alias("raw_rank"),
        F.row_number().over(wsm).cast("int").alias("smoothed_rank"),
    )


Q291_SQL = f"""
WITH g AS (
  SELECT p.p_type, p.p_brand, count(*) AS n,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS s
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
staged AS (
  SELECT p_type, p_brand, n, s,
         sum(n) OVER (PARTITION BY p_type) AS tn,
         sum(s) OVER (PARTITION BY p_type) AS ts
  FROM g
)
SELECT p_type, p_brand,
       CAST(n AS BIGINT) AS n_lines,
       s / CAST(n AS DOUBLE) AS raw_rate,
       (s + {SMOOTH_PRIOR_WEIGHT} * (ts / CAST(tn AS DOUBLE)))
         / (n + {float(SMOOTH_PRIOR_WEIGHT)}) AS smoothed_rate,
       CAST(row_number() OVER (PARTITION BY p_type
            ORDER BY s / CAST(n AS DOUBLE) DESC, p_brand) AS INT) AS raw_rank,
       CAST(row_number() OVER (PARTITION BY p_type
            ORDER BY (s + {SMOOTH_PRIOR_WEIGHT} * (ts / CAST(tn AS DOUBLE)))
                     / (n + {float(SMOOTH_PRIOR_WEIGHT)}) DESC, p_brand)
            AS INT) AS smoothed_rank
FROM staged
"""


# ------------------------------------------------------------- q292

RUNWAY_CAPACITY_ROWS_PER_DAY = 500


def q292_capacity_runway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X253: capacity runway projection — the ops question "when do we
    hit the limit?" answered from the event stream's own growth: the
    daily event-count trend fits by exact-integer OLS (X87's closed
    form: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) over day-index x), and
    the runway = days until the trend line crosses the capacity
    threshold. Slope numerator/denominator are exact integers; the
    crossing day is one double division, and a non-positive slope
    reports an infinite runway as NULL (never a negative date).

    Scale: |days|-row series after one agg; the fit is a 1-row fold
    of power sums — mergeable and incrementally updatable."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy().orderBy("day")
    staged = daily.select(
        F.row_number().over(w).alias("x"), "y"
    )
    g = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den.cast("double")
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n").cast("double")
    runway = F.when(
        num > 0,
        (
            F.lit(float(RUNWAY_CAPACITY_ROWS_PER_DAY))
            - intercept
        )
        / slope
        - F.col("n").cast("double"),
    )
    return g.select(
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("daily_growth"),
        intercept.alias("intercept"),
        runway.alias("days_until_capacity"),
        (num > 0).alias("growing"),
    )


Q292_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS y FROM events GROUP BY 1
),
staged AS (
  SELECT row_number() OVER (ORDER BY day) AS x, y FROM daily
),
g AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM staged
)
SELECT CAST(n AS BIGINT) AS n_days,
       (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS daily_growth,
       (sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)) * sx)
         / CAST(n AS DOUBLE) AS intercept,
       CASE WHEN n * sxy - sx * sy > 0 THEN
         ({float(RUNWAY_CAPACITY_ROWS_PER_DAY)}
          - (sy - ((n * sxy - sx * sy)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) * sx)
            / CAST(n AS DOUBLE))
         / ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
         - CAST(n AS DOUBLE)
       END AS days_until_capacity,
       n * sxy - sx * sy > 0 AS growing
FROM g
"""


# ------------------------------------------------------------- q293


def q293_plan_equivalence_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X254: plan-equivalence probe — the engine-consistency check run
    as a query: the same metric (each nation's share of its REGION's
    revenue) computed through two STRUCTURALLY different plans inside
    one DataFrame — (a) a region-partitioned window over the
    nation-grain aggregate, (b) a region-grain re-aggregation joined
    back on the region key (a real BroadcastHashJoin, not a scalar
    attach) — and emitted with the row-level equality verdict. Both
    engines must produce identical shares through both plans: a
    disagreement would mean a window/aggregate inconsistency INSIDE
    an engine, the class of bug conformance suites exist to catch.

    Scale: both plans share the one fact aggregation; the probe adds
    a |nations|-row window and one broadcast join."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_nationkey", "n_regionkey")
        .agg(F.sum("cents").alias("r"))
    )
    # Plan A: region-partitioned window.
    wreg = Window.partitionBy("n_regionkey")
    a = g.select(
        "c_nationkey",
        "n_regionkey",
        "r",
        (F.col("r") / F.sum("r").over(wreg).cast("double")).alias(
            "share_window"
        ),
    )
    # Plan B: region-grain re-aggregation joined back on the region key.
    reg = g.groupBy("n_regionkey").agg(F.sum("r").alias("t"))
    b = g.select(
        F.col("c_nationkey").alias("nk"), F.col("n_regionkey").alias("rk"), "r"
    ).join(F.broadcast(reg), F.col("rk") == reg.n_regionkey).select(
        "nk", (F.col("r") / F.col("t").cast("double")).alias("share_join")
    )
    return a.join(b, a.c_nationkey == b.nk).select(
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
        (F.col("r") / F.lit(100.0)).alias("revenue"),
        "share_window",
        "share_join",
        (F.col("share_window") == F.col("share_join")).alias("plans_agree"),
    )


Q293_SQL = """
WITH g AS (
  SELECT c.c_nationkey, n.n_regionkey,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS r
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
a AS (
  SELECT c_nationkey, n_regionkey, r,
         r / CAST(sum(r) OVER (PARTITION BY n_regionkey) AS DOUBLE)
           AS share_window
  FROM g
),
reg AS (SELECT n_regionkey, sum(r) AS t FROM g GROUP BY n_regionkey),
b AS (
  SELECT g.c_nationkey AS nk, g.r / CAST(reg.t AS DOUBLE) AS share_join
  FROM g JOIN reg ON reg.n_regionkey = g.n_regionkey
)
SELECT CAST(a.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(a.n_regionkey AS BIGINT) AS n_regionkey,
       CAST(a.r AS BIGINT) / 100.0 AS revenue,
       a.share_window, b.share_join,
       a.share_window = b.share_join AS plans_agree
FROM a JOIN b ON b.nk = a.c_nationkey
"""


QUERIES_EXT43 = {
    "q290_mor_vs_cow_cost": q290_mor_vs_cow_cost,
    "q291_smoothed_popularity": q291_smoothed_popularity,
    "q292_capacity_runway": q292_capacity_runway,
    "q293_plan_equivalence_probe": q293_plan_equivalence_probe,
}


def _oracles_ext43() -> dict[str, str]:
    return {
        "q290_mor_vs_cow_cost": Q290_SQL,
        "q291_smoothed_popularity": Q291_SQL,
        "q292_capacity_runway": Q292_SQL,
        "q293_plan_equivalence_probe": Q293_SQL,
    }
