"""Round-5 driver query families, batch 64 (q363-q366): the dynamic-SQL
door (Spark 4 ``EXECUTE IMMEDIATE`` with ``USING`` binds and ``INTO``
capture), datetime conformance certificate #15 (with the three
documented cross-engine divergences), the bitmap-index distinct-count
door (``bitmap_construct_agg`` / ``bitmap_or_agg`` — the mergeable
exact-distinct pattern), and the ``approx_top_k`` sketch door certified
in its under-capacity (exact) regime.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q363


def q363_execute_immediate_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: dynamic SQL — Spark 4 ``EXECUTE IMMEDIATE``.  Three
    forms exercised end-to-end on real data: (1) the statement TEXT
    held in a session variable (the "SQL built elsewhere" shape —
    template stores, metadata-driven reporting); (2) positional ``?``
    binds via ``USING`` (parameters stay out of the SQL string — no
    injection, plan reuse by text); (3) scalar capture via ``INTO`` a
    session variable, which then binds as a LITERAL in the final
    query so the predicate reaches the scan pushed, exactly like
    q357's variable door.  The oracle is the fully-inlined static SQL
    — dynamic dispatch must never change the answer.

    Scale: the INTO capture is one agg job; the parameterized report
    is one filtered hash-agg with the captured scalar folded into the
    pushed predicate.  Nothing about dynamism adds a shuffle — the
    door's point is that driver-side SQL assembly costs zero
    distributed work."""
    _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).createOrReplaceTempView("q363_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE q363_stmt STRING")
    spark.sql("DECLARE OR REPLACE VARIABLE q363_maxf DECIMAL(18,2)")
    # Form 1+3: statement text from a variable, a USING bind inside
    # it, and the exact scalar captured INTO a typed variable.
    spark.sql(
        """SET VARIABLE q363_stmt =
           'SELECT max(price) FROM q363_orders WHERE o_orderstatus = ?'"""
    )
    spark.sql("EXECUTE IMMEDIATE q363_stmt INTO q363_maxf USING 'F'")
    # Form 2: positional USING binds for the report parameters.  The
    # threshold compare is integer-exact (price*2 > maxf), so dynamic
    # dispatch can never drift the row set.
    return spark.sql(
        """
EXECUTE IMMEDIATE
  'SELECT o_orderstatus,
          CAST(count(*) AS BIGINT) AS n_big,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
          CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS revenue_big,
          CAST(q363_maxf AS DOUBLE) AS max_f_price
   FROM q363_orders
   WHERE price * 2 > q363_maxf AND o_orderstatus <> ?
   GROUP BY o_orderstatus ORDER BY o_orderstatus'
  USING 'X'
"""
    )


Q363_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
p AS (SELECT max(price) AS maxf FROM o WHERE o_orderstatus = 'F')
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_big,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS revenue_big,
       CAST(p.maxf AS DOUBLE) AS max_f_price
FROM o, p WHERE price * 2 > p.maxf AND o_orderstatus <> 'X'
GROUP BY o_orderstatus, p.maxf ORDER BY o_orderstatus
"""


# ------------------------------------------------------------- q364

DT_MOD = 11  # bound the certified order subset
DT_ANCHOR = "2026-01-15"  # fixed comparison anchor


def q364_datetime_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #15: datetime semantics over real order
    dates — month-add end-of-month CLAMP (add_months ≡ DuckDB
    +INTERVAL: Jan-31 +1mo → Feb-29), last_day, next-Monday, ISO
    day-of-week, ISO week-of-year, Monday week_start via
    date_trunc('week'), quarter, whole-day difference, and calendar
    month-index difference — all certified value-identical.  THREE
    divergences this certificate documents (and routes around):

    1. ``dayofweek`` NUMBERING: Spark is 1..7 with Sunday=1; DuckDB is
       0..6 with Sunday=0.  Portable form: the ISO numbering — Spark
       ``weekday(d)+1`` ≡ DuckDB ``isodow(d)`` (Mon=1..Sun=7).
    2. Month difference: Spark ``months_between`` is FRACTIONAL with a
       both-ends-month-end special case (pinned in pytest:
       (Mar-31,Jan-31)→2.0 but (Mar-30,Jan-31)→1.96774194); DuckDB
       ``date_diff('month',..)`` counts calendar-boundary crossings
       (both → 2).  Portable form: the integer month index
       ``year*12+month`` differenced — identical in both engines.
    3. Day difference ARG ORDER: Spark ``datediff(end, start)`` vs
       DuckDB ``date_diff('day', start, end)`` — same value, operands
       swapped; certified against the fixed anchor.

    next_day has no DuckDB twin; the oracle derives it in closed form
    (strictly-after semantics): d + ((7 − isodow(d)) % 7) + 1 days.

    Scale: every column is a codegen'd date expression on the scan —
    no shuffle beyond the deterministic output sort."""
    d = F.to_date("o_orderdate")
    anchor = F.to_date(F.lit(DT_ANCHOR))
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % DT_MOD == 0)
        .select(
            "o_orderkey",
            F.add_months(d, 1).cast("string").alias("plus_1mo"),
            F.last_day(d).cast("string").alias("month_end"),
            F.next_day(d, "MON").cast("string").alias("next_monday"),
            (F.weekday(d) + 1).cast("int").alias("iso_dow"),
            F.weekofyear(d).cast("int").alias("iso_week"),
            F.date_trunc("week", d).cast("date").cast("string").alias("week_start"),
            F.quarter(d).cast("int").alias("qtr"),
            F.datediff(anchor, d).cast("int").alias("days_to_anchor"),
            (
                (F.lit(2026) * 12 + F.lit(1)) - (F.year(d) * 12 + F.month(d))
            ).cast("int").alias("months_to_anchor"),
        )
        .orderBy("o_orderkey")
    )


Q364_SQL = f"""
SELECT o_orderkey,
       CAST(CAST(d + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1mo,
       CAST(last_day(d) AS VARCHAR) AS month_end,
       CAST(d + CAST(((7 - isodow(d)) % 7) + 1 AS INT) AS VARCHAR)
         AS next_monday,
       CAST(isodow(d) AS INT) AS iso_dow,
       CAST(weekofyear(d) AS INT) AS iso_week,
       CAST(CAST(date_trunc('week', d) AS DATE) AS VARCHAR) AS week_start,
       CAST(quarter(d) AS INT) AS qtr,
       CAST(date_diff('day', d, DATE '{DT_ANCHOR}') AS INT) AS days_to_anchor,
       CAST((2026 * 12 + 1) - (year(d) * 12 + month(d)) AS INT)
         AS months_to_anchor
FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_orderkey % {DT_MOD} = 0)
ORDER BY o_orderkey
"""


# ------------------------------------------------------------- q365


def q365_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting (the Spark 4 ``bitmap_*`` door):
    exact COUNT(DISTINCT customer) per order priority via two-level
    bitmaps — the inner agg on (priority, bitmap_bucket_number(key))
    builds one ≤4 KB bitmap per bucket with ``bitmap_construct_agg``
    (partial-agg'd map-side: the exchange moves bitmaps, never raw
    keys); the outer agg sums ``bitmap_count``.  The global rollup
    rides the SAME single pass via the Spark-4 ``groupingSets``
    DataFrame API — GROUPING SETS ((priority, bkt), (bkt)) makes the
    (bkt)-only group's bitmap the all-priorities union directly, so
    there is no second corpus scan, no join at all (a 1-row attach
    would plan as BroadcastNestedLoopJoin — the q350 lesson; the
    total instead reaches every row through a whole-relation window
    max over the |priorities|-sized post-agg result, q350's idiom).
    Oracle: plain COUNT(DISTINCT) + a scalar-subquery total.

    Scale: this is the materialized-distinct pattern at 100 TB —
    bitmaps are MERGEABLE partial aggregates (associative OR), so
    per-segment bitmaps computed once serve every segment-combination
    distinct question (audience overlap, incremental refresh) at
    bucket-count cost; a plain COUNT(DISTINCT) re-shuffles the corpus
    per question.  Keys are dense BIGINTs (custkey), the bitmap sweet
    spot — 32768 positions per bucket."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_custkey",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
    )
    lvl1 = o.groupingSets(
        [["priority", "bkt"], ["bkt"]], "priority", "bkt"
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"))
    per = lvl1.groupBy("priority").agg(
        F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_custs")
    )
    w_all = Window.partitionBy()
    return (
        per.withColumn(
            "n_custs_total",
            F.max(F.when(F.col("priority").isNull(), F.col("n_custs"))).over(w_all),
        )
        .filter(F.col("priority").isNotNull())
        .orderBy("priority")
    )


Q365_SQL = """
SELECT o_orderpriority AS priority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
         AS n_custs_total
FROM orders GROUP BY 1 ORDER BY priority
"""


# ------------------------------------------------------------- q366

TOPK_K = 64  # sketch k, sized ABOVE the item cardinality (5*10=50)
TOPK_CAP = 100000  # maxItemsTracked: under-capacity => exact counts


def q366_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` sketch door, certified in its EXACT regime: a
    space-saving top-k sketch over the composite heavy-hitter item
    (event_type, user decile) — 50 distinct items, sketch capacity
    ``maxItemsTracked=100k`` ≥ cardinality and k=64 ≥ items, so the
    sketch provably degenerates to exact counts and the oracle is the
    plain GROUP BY.  The exploded rows re-sort on the portable
    (count DESC, item ASC) order, so sketch-internal tie order never
    leaks into the compared value.

    Scale: the dial this certifies is capacity-vs-exactness — at
    100 TB you size maxItemsTracked to the heavy-hitter regime
    (items ≫ capacity ⇒ counts carry the space-saving ±ε bound, the
    top ranks stay right), and the sketch is a mergeable partial
    aggregate: one map-side sketch per partition, one tiny merge —
    no raw-key shuffle at all, where exact top-k shuffles every
    distinct key."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat_ws(
            "/", "event_type", (F.col("user_id") % 10).cast("string")
        ).alias("item")
    )
    sk = ev.agg(
        F.expr(f"approx_top_k(item, {TOPK_K}, {TOPK_CAP})").alias("tk")
    )
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.desc("n"), "item")
    )


Q366_SQL = """
SELECT event_type || '/' || CAST(user_id % 10 AS VARCHAR) AS item,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY n DESC, item
"""


QUERIES_EXT64 = {
    "q363_execute_immediate_door": q363_execute_immediate_door,
    "q364_datetime_conformance": q364_datetime_conformance,
    "q365_bitmap_distinct": q365_bitmap_distinct,
    "q366_approx_top_k": q366_approx_top_k,
}


def _oracles_ext64() -> dict[str, str]:
    return {
        "q363_execute_immediate_door": Q363_SQL,
        "q364_datetime_conformance": Q364_SQL,
        "q365_bitmap_distinct": Q365_SQL,
        "q366_approx_top_k": Q366_SQL,
    }
