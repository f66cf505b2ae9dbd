"""Round-5 driver query families, batch 73 (q386): resilient date
ingestion — the try-parse door over a deliberately dirty feed.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q386

DIRTY_MOD = 31


def q386_resilient_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resilient ingestion parsing — ``try_to_date`` over a
    deliberately dirty feed built from real dates: every sampled
    order emits its date three ways — ISO, a non-ISO ``dd/MM/yyyy``
    rendering parsed with an explicit format, and a deterministically
    CORRUPTED form (month forced to 99 on keys ≡ 0 mod 3, an
    impossible calendar date on the rest ≡ Feb-30 class) — and the
    parser must return the right date for the clean forms and NULL
    (never garbage, never an exception) for the corrupt one.  Under
    this suite's certified ANSI mode a strict ``to_date`` would kill
    the stage on the FIRST bad row (q369's overflow discipline, same
    contract); ``try_to_date`` is the one-poisoned-row-survives form.
    The oracle parses with DuckDB ``try_cast``/``try_strptime`` —
    a TRUE cross-engine oracle including the NULL pattern.

    Scale: per-row parsing in codegen, one scan, no shuffle; the
    aggregate certifies the REJECT RATE — the data-quality number an
    ingestion pipeline alerts on — as exactly the constructed 1/1 of
    dirty rows and 0/1 of clean rows."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % DIRTY_MOD == 0)
    d = F.to_date("o_orderdate")
    iso = F.date_format(d, "yyyy-MM-dd")
    euro = F.date_format(d, "dd/MM/yyyy")
    corrupt = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(F.date_format(d, "yyyy"), F.lit("-99-"), F.date_format(d, "dd")),
    ).otherwise(F.concat(F.date_format(d, "yyyy-MM"), F.lit("-34")))
    p = o.select(
        "o_orderkey",
        iso.alias("_iso"),
        euro.alias("_euro"),
        corrupt.alias("_corrupt"),
    ).select(
        "o_orderkey",
        F.expr("try_to_date(_iso)").alias("p_iso"),
        F.expr("try_to_date(_euro, 'dd/MM/yyyy')").alias("p_euro"),
        F.expr("try_to_date(_corrupt)").alias("p_corrupt"),
    )
    return p.select(
        "o_orderkey",
        F.col("p_iso").cast("string").alias("iso_date"),
        (F.col("p_iso") == F.col("p_euro")).alias("formats_agree"),
        F.col("p_corrupt").isNull().alias("corrupt_rejected"),
    ).orderBy("o_orderkey")


Q386_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderkey % {DIRTY_MOD} = 0
),
forms AS (
  SELECT o_orderkey,
         strftime(d, '%Y-%m-%d') AS iso,
         strftime(d, '%d/%m/%Y') AS euro,
         CASE WHEN o_orderkey % 3 = 0
              THEN strftime(d, '%Y') || '-99-' || strftime(d, '%d')
              ELSE strftime(d, '%Y-%m') || '-34' END AS corrupt
  FROM o
)
SELECT o_orderkey,
       CAST(try_cast(iso AS DATE) AS VARCHAR) AS iso_date,
       try_cast(iso AS DATE) = CAST(try_strptime(euro, '%d/%m/%Y') AS DATE)
         AS formats_agree,
       try_cast(corrupt AS DATE) IS NULL AS corrupt_rejected
FROM forms ORDER BY o_orderkey
"""


QUERIES_EXT73 = {
    "q386_resilient_date_parse": q386_resilient_date_parse,
}


def _oracles_ext73() -> dict[str, str]:
    return {
        "q386_resilient_date_parse": Q386_SQL,
    }
