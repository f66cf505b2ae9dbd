"""Round-4 driver query families, batch 32 (q246-q249): cogrouped
pandas reconciliation, Datasketches HLL merge, MATCH_RECOGNIZE-lite
trace mining, and nested document assembly.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q246


def q246_cogroup_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 door #4: cogrouped applyInPandas — the two-sided custom
    kernel: orders and their lineitems arrive CO-GROUPED by order key
    as two aligned pandas frames per key batch, and the Python side
    reconciles header total vs item-sum (the finance close job:
    discrepancy per order in exact cents). This is the API for logic
    that genuinely needs both sides of a key at once in imperative
    form — the escape hatch beyond join+agg, exercised and then
    CHECKED against the join+agg oracle, which is the equivalence
    that licenses using it at all.

    Determinism: all arithmetic is int64 cents inside pandas — no
    float accumulation; per-key output is order-keyed rows.

    Scale: the cogroup KEY is a coarse bucket of the order key, not
    the order key itself — one Python call per key group is the
    cogroup cost model, so thousands of tiny groups would drown in
    per-call overhead (measured 31s → ~1s here); inside a bucket the
    reconciliation is vectorized pandas. Both sides shuffle by the
    bucket once (sort-merge-join economics), Arrow-batched into
    Python, state = one bucket at a time."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 64).alias("bkt"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("header_cents"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_orderkey") % 64).alias("bkt"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("item_cents"),
    )

    def reconcile(orders_pdf: "pd.DataFrame", items_pdf: "pd.DataFrame"):
        if orders_pdf.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "header_cents", "items_cents", "n_items"]
            )
        agg = (
            items_pdf.groupby("l_orderkey")["item_cents"]
            .agg(["sum", "count"])
            .reset_index()
            .rename(
                columns={
                    "l_orderkey": "o_orderkey",
                    "sum": "items_cents",
                    "count": "n_items",
                }
            )
            if len(items_pdf)
            else pd.DataFrame(
                columns=["o_orderkey", "items_cents", "n_items"]
            )
        )
        out = orders_pdf[["o_orderkey", "header_cents"]].merge(
            agg, on="o_orderkey", how="left"
        )
        out["items_cents"] = out["items_cents"].fillna(0).astype("int64")
        out["n_items"] = out["n_items"].fillna(0).astype("int64")
        return out

    out = (
        o.groupBy("bkt")
        .cogroup(li.groupBy("bkt"))
        .applyInPandas(
            reconcile,
            "o_orderkey bigint, header_cents bigint, items_cents bigint, "
            "n_items bigint",
        )
    )
    return out.select(
        "o_orderkey",
        (F.col("header_cents") / F.lit(100.0)).alias("header_total"),
        (F.col("items_cents") / F.lit(100.0)).alias("items_total"),
        "n_items",
        ((F.col("header_cents") - F.col("items_cents")) / F.lit(100.0)).alias(
            "discrepancy"
        ),
    )


Q246_SQL = """
WITH li AS (
  SELECT l_orderkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS items_cents,
         count(*) AS n_items
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS header_cents
  FROM orders
)
SELECT o.o_orderkey,
       CAST(o.header_cents AS BIGINT) / 100.0 AS header_total,
       CAST(coalesce(li.items_cents, 0) AS BIGINT) / 100.0 AS items_total,
       CAST(coalesce(li.n_items, 0) AS BIGINT) AS n_items,
       CAST(o.header_cents - coalesce(li.items_cents, 0) AS BIGINT) / 100.0
         AS discrepancy
FROM o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
"""


# ------------------------------------------------------------- q247

HLL_TOL_PCT = 5


def q247_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X208: Datasketches HLL build + MERGE — the real mergeable-
    state story (X126's algebra with the industry binary format):
    per-event-type HLL sketches of the user set are built
    independently, then hll_union folds them into the GLOBAL
    distinct-user estimate — the union is over OVERLAPPING sets, the
    case where summing per-group distinct counts is simply wrong and
    sketches are the only mergeable answer. The oracle cannot replay
    the sketch binary, so the emitted columns are the EXACT
    quantities plus the guarantee booleans (q155's discipline): the
    union estimate must land within ±{HLL_TOL_PCT}% of the true
    global distinct, and the naive per-type sum must OVERCOUNT.

    Scale: sketches are kilobytes per group, buildable map-side,
    unionable across days/partitions/clusters — the incremental-MV
    representation for COUNT DISTINCT at 100 TB."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    # ONE cube pass yields the per-type rows (sketch + exact) AND the
    # grand-total row (exact global) — no scalar join, no second scan.
    cubed = ev.cube("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    typed = F.col("event_type").isNotNull()
    folded = cubed.agg(
        F.sum(F.when(typed, 1)).cast("bigint").alias("n_types"),
        F.max(F.when(~typed, F.col("exact_users")))
        .cast("bigint")
        .alias("exact_global"),
        F.sum(F.when(typed, F.col("exact_users")))
        .cast("bigint")
        .alias("naive_sum"),
        F.expr(
            "hll_sketch_estimate(hll_union_agg("
            "CASE WHEN event_type IS NOT NULL THEN sk END))"
        ).alias("_est"),
    )
    return folded.select(
        "n_types",
        "exact_global",
        "naive_sum",
        (F.col("naive_sum") > F.col("exact_global")).alias("naive_overcounts"),
        (
            F.abs(F.col("_est") - F.col("exact_global"))
            <= F.col("exact_global") * HLL_TOL_PCT / 100.0
        ).alias("union_estimate_in_tolerance"),
    )


Q247_SQL = f"""
WITH per_type AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
),
g AS (SELECT count(DISTINCT user_id) AS exact_global FROM events)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       CAST(max(g.exact_global) AS BIGINT) AS exact_global,
       CAST(sum(per_type.exact_users) AS BIGINT) AS naive_sum,
       sum(per_type.exact_users) > max(g.exact_global) AS naive_overcounts,
       TRUE AS union_estimate_in_tolerance
FROM per_type, g
"""


# ------------------------------------------------------------- q248

TRACE_INITIALS = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
    "error": "e",
}


def q248_trace_regex_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X209: MATCH_RECOGNIZE-lite — row-pattern matching over event
    sequences without the (unimplemented) SQL clause: each user's
    trace becomes a compact initials string in STRICT event order
    (window-ORDERED collect_list — groupBy collect_list order is
    undefined, the X167 lesson), and behavioral patterns become plain
    regexes over it: 'vc*p' counts view→clicks→purchase funnels,
    'ee+' counts error bursts, '^s' tests signup-first. Non-
    overlapping leftmost matching is the shared semantics of Java
    regex and RE2 for these patterns, so counts agree bit-for-bit.

    Scale: one user-keyed shuffle builds every trace; the regex pass
    is map-side over |users| strings whose length is the user's
    event count — pattern mining at scan speed, no state machine
    operator, no self-joins per step."""
    init_map = F.create_map(
        *[F.lit(x) for kv in TRACE_INITIALS.items() for x in kv]
    )
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        init_map[F.col("event_type")].alias("ini"),
    )
    wfull = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wrn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    traced = ev.select(
        "user_id",
        F.array_join(F.collect_list("ini").over(wfull), "").alias("trace"),
        F.row_number().over(wrn).alias("rn"),
    ).filter(F.col("rn") == 1)
    return traced.select(
        "user_id",
        F.length("trace").cast("bigint").alias("trace_len"),
        F.expr("CAST(regexp_count(trace, 'vc*p') AS BIGINT)").alias(
            "n_funnels"
        ),
        F.expr("CAST(regexp_count(trace, 'ee+') AS BIGINT)").alias(
            "n_error_bursts"
        ),
        F.col("trace").startswith("s").alias("signup_first"),
    )


Q248_SQL = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                         WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                         WHEN 'error' THEN 'e' END AS ini
  FROM events
),
traced AS (
  SELECT user_id, string_agg(ini, '' ORDER BY ts, event_id) AS trace
  FROM ev GROUP BY user_id
)
SELECT user_id,
       CAST(length(trace) AS BIGINT) AS trace_len,
       CAST(len(regexp_extract_all(trace, 'vc*p')) AS BIGINT) AS n_funnels,
       CAST(len(regexp_extract_all(trace, 'ee+')) AS BIGINT)
         AS n_error_bursts,
       trace LIKE 's%' AS signup_first
FROM traced
"""


# ------------------------------------------------------------- q249


def q249_nested_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X210: nested document assembly + higher-order consumption —
    the API-serving shape: each order becomes ONE row carrying its
    lineitems as a SORTED array of structs (collect_list of structs,
    sort_array for a canonical item order), then every downstream
    stat is computed INSIDE the nested value with higher-order
    functions — F.aggregate folds the items array into exact cents
    totals, filter+size counts returns — no re-explode, no second
    shuffle. The oracle states the same stats relationally; equality
    certifies that nest → HOF-consume loses nothing vs join+agg.

    Scale: the nested row is the document store/feed export format;
    assembling it costs the one order-keyed shuffle and every
    consumer after that reads ONE row per order (locality the
    exploded form can't offer)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").alias("ln"),
            F.col("l_partkey").alias("pk"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            (F.col("l_returnflag") == "R").alias("returned"),
        ).alias("item"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("item")).alias("items")
    )
    return nested.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.size("items").cast("bigint").alias("n_items"),
        F.expr(
            "CAST(aggregate(items, CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x.cents) AS BIGINT)"
        ).alias("total_cents"),
        F.expr("CAST(size(filter(items, x -> x.returned)) AS BIGINT)").alias(
            "n_returned"
        ),
        F.expr(
            "CAST(aggregate(items, CAST(0 AS BIGINT),"
            " (acc, x) -> CASE WHEN x.cents > acc THEN x.cents ELSE acc END)"
            " AS BIGINT)"
        ).alias("max_item_cents"),
    )


Q249_SQL = """
SELECT l_orderkey AS o_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(max(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS max_item_cents
FROM lineitem GROUP BY l_orderkey
"""


QUERIES_EXT32 = {
    "q246_cogroup_reconciliation": q246_cogroup_reconciliation,
    "q247_hll_sketch_merge": q247_hll_sketch_merge,
    "q248_trace_regex_mining": q248_trace_regex_mining,
    "q249_nested_assembly": q249_nested_assembly,
}


def _oracles_ext32() -> dict[str, str]:
    return {
        "q246_cogroup_reconciliation": Q246_SQL,
        "q247_hll_sketch_merge": Q247_SQL,
        "q248_trace_regex_mining": Q248_SQL,
        "q249_nested_assembly": Q249_SQL,
    }
