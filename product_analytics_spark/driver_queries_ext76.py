"""Round-5 driver query families, batch 76 (q389-q390): config-string
parsing (``str_to_map``) and locale-style report formatting
(``format_number``).

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q389

CFG_MOD = 47


def q389_str_to_map_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-string parsing door: ``str_to_map`` over a realistic
    mixed-delimiter config payload built from real columns
    (``k=v`` pairs split on BOTH ``,`` and ``&`` via the regex pair
    delimiter) — the one-expression answer to ad-hoc key=value feeds
    (query strings, consent strings, flag blobs) that q382's JSON
    door answers for JSON.  DuckDB has no str_to_map; the oracle is
    the closed form — every extracted value must equal the column it
    was built from, and the missing-key lookup must be NULL.

    Scale: one codegen'd projection on a scan, no shuffle."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % CFG_MOD == 0)
    cfg = F.concat(
        F.lit("uid="),
        F.col("user_id").cast("string"),
        F.lit(",ty="),
        F.col("event_type"),
        F.lit("&vm="),
        (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long").cast(
            "string"
        ),
    )
    m = F.expr("str_to_map(_cfg, '[,&]', '=')")
    return (
        e.select("event_id", "user_id", "event_type", "value", cfg.alias("_cfg"))
        .select(
            "event_id",
            F.element_at(m, "ty").alias("cfg_type"),
            (F.element_at(m, "uid") == F.col("user_id").cast("string")).alias(
                "uid_ok"
            ),
            F.element_at(m, "vm").cast("long").alias("cfg_value_micro"),
            F.element_at(m, "zz").alias("cfg_missing"),
            F.size(m).alias("n_keys"),
        )
        .orderBy("event_id")
    )


Q389_SQL = f"""
SELECT event_id,
       event_type AS cfg_type,
       true AS uid_ok,
       CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         AS cfg_value_micro,
       CAST(NULL AS VARCHAR) AS cfg_missing,
       3 AS n_keys
FROM events WHERE event_id % {CFG_MOD} = 0 ORDER BY event_id
"""


# ------------------------------------------------------------- q390


def q390_format_number_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report-layer formatting door: ``format_number`` — grouped
    thousand-separated money and counts, the last-mile presentation
    step.  The formatted value is built from an EXACT DECIMAL(18,2)
    (no hidden double rounding — the q213 money discipline holds
    right through presentation); DuckDB cannot thousand-separate
    floats, so the oracle assembles the same string from exact cents:
    ``format('{{:,}}', cents // 100) || '.' || lpad(cents % 100)`` —
    a TRUE independent re-derivation of every character.

    Scale: formatting is a post-aggregate |groups|-sized projection;
    the only corpus work is the one nation-keyed hash-agg (broadcast
    dim join)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(_money_cents("o_totalprice")).alias("_c"),
        )
    )
    return g.select(
        "n_name",
        F.format_number((F.col("_c") / 100).cast("decimal(18,2)"), 2).alias(
            "revenue_fmt"
        ),
        F.format_number(F.col("_n").cast("long"), 0).alias("orders_fmt"),
    ).orderBy("n_name")


Q390_SQL = """
WITH g AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS c
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       format('{:,}', c // 100) || '.' ||
         lpad(CAST(c % 100 AS VARCHAR), 2, '0') AS revenue_fmt,
       format('{:,}', n) AS orders_fmt
FROM g ORDER BY n_name
"""


QUERIES_EXT76 = {
    "q389_str_to_map_config": q389_str_to_map_config,
    "q390_format_number_report": q390_format_number_report,
}


def _oracles_ext76() -> dict[str, str]:
    return {
        "q389_str_to_map_config": Q389_SQL,
        "q390_format_number_report": Q390_SQL,
    }
