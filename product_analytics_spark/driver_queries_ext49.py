"""Round-4 driver query families, batch 49 (q314-q317): positional
mod-97 checksums, a Zeller-congruence weekday probe, the ISO week-date
round trip, and base-36 shortcode encode/decode.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q314

_POW97 = [pow(10, i, 97) for i in range(12)]  # 10^i mod 97 per digit slot


def q314_mod97_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X275: IBAN-style mod-97 checksum, two ways — the modular
    arithmetic lesson the chunked-fold implementations get wrong:
    N mod 97 over a 12-digit account equals Σ digitᵢ·(10ⁱ mod 97),
    with the power table {_POW97} PRECOMPUTED in Python so both
    engines consume identical literals (the q238 constants
    discipline). Because 12 digits fit BIGINT, the probe ALSO
    computes the direct N % 97 and certifies the positional method
    agrees row-for-row — the property that lets the positional form
    scale to 30-digit IBANs no integer type holds. Residue histogram
    bucketed mod 10 keeps the output stable across SFs.

    Scale: map-side integer arithmetic; validation at scan speed."""
    terms = " + ".join(
        f"CAST(substring(acct, {12 - i}, 1) AS BIGINT) * {_POW97[i]}"
        for i in range(12)
    )
    c = _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "lpad(CAST(c_custkey AS STRING), 12, '0') AS acct",
    ).selectExpr(
        "c_custkey",
        f"({terms}) % 97 AS positional_mod",
        "CAST(lpad(CAST(c_custkey AS STRING), 12, '0') AS BIGINT) % 97"
        " AS direct_mod",
    )
    return c.groupBy((F.col("direct_mod") % 10).alias("residue_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_accounts"),
        F.sum(
            F.when(F.col("positional_mod") == F.col("direct_mod"), 0).otherwise(
                1
            )
        )
        .cast("bigint")
        .alias("method_disagreements"),
        F.sum(F.when(F.col("direct_mod") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_iban_valid"),
    )


def _q314_sql() -> str:
    terms = " + ".join(
        f"CAST(substring(acct, {12 - i}, 1) AS BIGINT) * {_POW97[i]}"
        for i in range(12)
    )
    return f"""
WITH c AS (
  SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS acct
  FROM customer
),
flagged AS (
  SELECT c_custkey,
         ({terms}) % 97 AS positional_mod,
         CAST(acct AS BIGINT) % 97 AS direct_mod
  FROM c
)
SELECT direct_mod % 10 AS residue_bucket,
       CAST(count(*) AS BIGINT) AS n_accounts,
       CAST(sum(CASE WHEN positional_mod = direct_mod THEN 0 ELSE 1 END)
            AS BIGINT) AS method_disagreements,
       CAST(sum(CASE WHEN direct_mod = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_iban_valid
FROM flagged GROUP BY 1
"""


# ------------------------------------------------------------- q315

_Z_ANCHOR = "1992-01-06"  # Monday


def q315_zeller_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X276: Zeller's congruence probe — the closed-form weekday
    formula certified against day-number arithmetic over every order
    date: Zeller's h = (q + ⌊13(m+1)/5⌋ + K + ⌊K/4⌋ + ⌊J/4⌋ + 5J)
    mod 7 (h=0 ⇒ Saturday, Jan/Feb counted as months 13/14 of the
    prior year) must equal the Monday-anchored day-number mod 7
    (shifted by the Saturday/Monday offset). Every division is a
    floor over POSITIVE integers (the year terms stay positive for
    CE dates), so `div` and `//` agree and the whole certificate is
    integer-exact. Disagreement count must be zero for every year.

    Scale: map-side date decomposition; |years|-row output."""
    d = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("dt")
    )
    staged = d.selectExpr(
        "year(dt) AS y0",
        "month(dt) AS m0",
        "dayofmonth(dt) AS q",
        f"CAST(datediff(dt, DATE '{_Z_ANCHOR}') % 7 AS BIGINT) AS anchor_dow",
    ).selectExpr(
        "y0",
        "q",
        "anchor_dow",
        "CASE WHEN m0 <= 2 THEN m0 + 12 ELSE m0 END AS m",
        "CASE WHEN m0 <= 2 THEN y0 - 1 ELSE y0 END AS y",
    ).selectExpr(
        "y0",
        "anchor_dow",
        "(q + CAST((13 * (m + 1)) div 5 AS BIGINT) + (y % 100)"
        " + CAST((y % 100) div 4 AS BIGINT)"
        " + CAST((y div 100) div 4 AS BIGINT)"
        " + 5 * (y div 100)) % 7 AS zeller_h",
    )
    # anchor_dow: 0=Monday … 6=Sunday; zeller_h: 0=Saturday … 6=Friday.
    # Monday ⇒ h=2, so h ≡ (anchor_dow + 2) mod 7.
    return staged.groupBy(F.col("y0").cast("int").alias("order_year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dates"),
        F.sum(
            F.when(
                F.col("zeller_h") == (F.col("anchor_dow") + 2) % 7, 0
            ).otherwise(1)
        )
        .cast("bigint")
        .alias("disagreements"),
    )


def _q315_sql() -> str:
    return f"""
WITH d AS (SELECT CAST(o_orderdate AS DATE) AS dt FROM orders),
s1 AS (
  SELECT year(dt) AS y0, month(dt) AS m0, dayofmonth(dt) AS q,
         CAST(CAST(dt - DATE '{_Z_ANCHOR}' AS BIGINT) % 7 AS BIGINT)
           AS anchor_dow
  FROM d
),
s2 AS (
  SELECT y0, q, anchor_dow,
         CASE WHEN m0 <= 2 THEN m0 + 12 ELSE m0 END AS m,
         CASE WHEN m0 <= 2 THEN y0 - 1 ELSE y0 END AS y
  FROM s1
),
s3 AS (
  SELECT y0, anchor_dow,
         (q + CAST((13 * (m + 1)) // 5 AS BIGINT) + (y % 100)
          + CAST((y % 100) // 4 AS BIGINT)
          + CAST((y // 100) // 4 AS BIGINT)
          + 5 * (y // 100)) % 7 AS zeller_h
  FROM s2
)
SELECT CAST(y0 AS INT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_dates,
       CAST(sum(CASE WHEN zeller_h = (anchor_dow + 2) % 7 THEN 0 ELSE 1 END)
            AS BIGINT) AS disagreements
FROM s3 GROUP BY 1
"""


# ------------------------------------------------------------- q316


def q316_iso_week_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X277: ISO-8601 week-date round trip — the calendar system
    behind every "fiscal week" report, certified end-to-end: each
    order date decomposes to (ISO year, ISO week, ISO weekday) with
    the ENGINE's functions, then RECONSTRUCTS through the closed form
    (week-1 Monday = Jan-4 of the ISO year shifted back to Monday by
    anchor-mod arithmetic; date = that Monday + 7·(week−1) +
    (isodow−1)) — and the reconstruction must equal the original
    date for every row. This certifies the two engines' ISO-week
    functions agree not just with each other but with the standard's
    own definition. Spark's weekday() is 0=Monday, DuckDB's isodow
    1=Monday — normalized inside each dialect.

    Scale: map-side date arithmetic; |ISO years|-row report."""
    d = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("dt")
    )
    staged = d.selectExpr(
        "dt",
        "extract(YEAROFWEEK FROM dt) AS iy",
        "weekofyear(dt) AS iw",
        "weekday(dt) + 1 AS idow",  # normalize to 1=Monday
    ).selectExpr(
        "dt",
        "iy",
        "iw",
        "idow",
        "make_date(CAST(iy AS INT), 1, 4) AS jan4",
    ).selectExpr(
        "dt",
        "iy",
        # week-1 Monday = jan4 − weekday(jan4) (0=Monday already)
        "date_add(date_sub(jan4, weekday(jan4)), (CAST(iw AS INT) - 1) * 7"
        " + CAST(idow AS INT) - 1) AS rec",
    )
    return staged.groupBy(F.col("iy").cast("int").alias("iso_year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dates"),
        F.sum(F.when(F.col("rec") == F.col("dt"), 0).otherwise(1))
        .cast("bigint")
        .alias("roundtrip_failures"),
    )


Q316_SQL = """
WITH d AS (SELECT CAST(o_orderdate AS DATE) AS dt FROM orders),
s1 AS (
  SELECT dt, isoyear(dt) AS iy, weekofyear(dt) AS iw, isodow(dt) AS idow
  FROM d
),
s2 AS (
  SELECT dt, iy,
         make_date(CAST(iy AS INT), 1, 4) AS jan4, iw, idow
  FROM s1
),
s3 AS (
  SELECT dt, iy,
         jan4 - CAST(isodow(jan4) - 1 AS INT)
           + CAST((iw - 1) * 7 + idow - 1 AS INT) AS rec
  FROM s2
)
SELECT CAST(iy AS INT) AS iso_year,
       CAST(count(*) AS BIGINT) AS n_dates,
       CAST(sum(CASE WHEN rec = dt THEN 0 ELSE 1 END) AS BIGINT)
         AS roundtrip_failures
FROM s3 GROUP BY 1
"""


# ------------------------------------------------------------- q317

_B36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def q317_base36_shortcodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X278: base-36 shortcode encode/decode — the URL-shortener /
    SKU-code kernel: order keys encode with the engine's radix
    conversion (Spark `conv(n, 10, 36)`, DuckDB `to_base(n, 36)` —
    both uppercase), and because DuckDB has no inverse, the DECODER
    is a shared positional parse over the alphabet (strpos per fixed
    position — the q20 hash-parse idiom applied to radix decoding),
    so the round trip is certified with the same code on both
    engines. Emits per code-length: counts, round-trip failures
    (must be 0), and distinct codes (must equal keys — injectivity).

    Scale: map-side string/integer arithmetic; |lengths|-row
    report."""
    maxlen = 8
    c = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "conv(CAST(o_orderkey AS STRING), 10, 36) AS code"
    )
    decode_terms = " + ".join(
        f"CASE WHEN length(code) >= {i} THEN "
        f"(CAST(instr('{_B36}', substring(code, length(code) - {i} + 1, 1))"
        f" AS BIGINT) - 1) * {36 ** (i - 1)} ELSE 0 END"
        for i in range(1, maxlen + 1)
    )
    flagged = c.selectExpr(
        "o_orderkey",
        "code",
        f"({decode_terms}) AS decoded",
    )
    return flagged.groupBy(
        F.length("code").cast("int").alias("code_len")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("decoded") == F.col("o_orderkey"), 0).otherwise(1))
        .cast("bigint")
        .alias("roundtrip_failures"),
        F.count_distinct("code").cast("bigint").alias("distinct_codes"),
    )


def _q317_sql() -> str:
    maxlen = 8
    decode_terms = " + ".join(
        f"CASE WHEN length(code) >= {i} THEN "
        f"(CAST(strpos('{_B36}', substring(code, length(code) - {i} + 1, 1))"
        f" AS BIGINT) - 1) * {36 ** (i - 1)} ELSE 0 END"
        for i in range(1, maxlen + 1)
    )
    return f"""
WITH c AS (
  SELECT o_orderkey, to_base(o_orderkey, 36) AS code FROM orders
),
flagged AS (
  SELECT o_orderkey, code, ({decode_terms}) AS decoded FROM c
)
SELECT CAST(length(code) AS INT) AS code_len,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN decoded = o_orderkey THEN 0 ELSE 1 END) AS BIGINT)
         AS roundtrip_failures,
       CAST(count(DISTINCT code) AS BIGINT) AS distinct_codes
FROM flagged GROUP BY 1
"""


QUERIES_EXT49 = {
    "q314_mod97_checksum": q314_mod97_checksum,
    "q315_zeller_probe": q315_zeller_probe,
    "q316_iso_week_roundtrip": q316_iso_week_roundtrip,
    "q317_base36_shortcodes": q317_base36_shortcodes,
}


def _oracles_ext49() -> dict[str, str]:
    return {
        "q314_mod97_checksum": _q314_sql(),
        "q315_zeller_probe": _q315_sql(),
        "q316_iso_week_roundtrip": Q316_SQL,
        "q317_base36_shortcodes": _q317_sql(),
    }
