"""Round-5 driver query families, batch 70 (q376-q381): six
previously-unexercised engine surfaces found by a function-surface
sweep of pyspark.sql.functions against the suite's source — Theta
sketch set algebra, the CSV interchange pair, the URL surface,
ordered string aggregation (conformance certificate #17), AES column
encryption, and timestamp constructors + width_bucket banding.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _money_cents, _t

# ------------------------------------------------------------- q376

THETA_MOD = 2048  # keyspace bound: below the sketch's 4096 nominal
# entries at every SF, so the estimates are provably exact (q366's
# under-capacity discipline applied to Theta sketches)


def q376_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (the Datasketches door): per-status
    customer-hash sketches combined with ``theta_union_agg``,
    ``theta_intersection`` and ``theta_difference`` answer the
    audience-overlap questions — |F ∪ O|, |F ∩ O|, |F \\ O| — that
    q365's exact bitmaps answer with bitmap OR; Theta is the
    fixed-size (lgK-bounded) alternative whose estimates stay
    mergeable at ANY key cardinality.  The keyspace is bounded below
    the sketch's nominal capacity, so every estimate is provably
    EXACT here and the oracle is plain distinct-count set algebra
    (q366's under-capacity certification discipline).

    Scale: sketches are tiny mergeable aggregates — per-segment
    sketches computed once answer every segment-combination overlap
    at sketch-size cost, with bounded error when the keyspace
    outgrows capacity (where q365's bitmaps grow linearly, Theta
    stays 32 KB — that trade is the door's point)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", (F.col("o_custkey") % THETA_MOD).alias("k")
    )
    # BOTH segment sketches from ONE agg pass via NULL-skipping
    # conditional aggregation — a two-1-row-relation join on a literal
    # condition would plan as BroadcastNestedLoopJoin (the q350/q365
    # lesson, caught by the plan audit on this query's first form).
    both = o.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'F' THEN k END)"
        ).alias("sf"),
        F.expr(
            "theta_sketch_agg(CASE WHEN o_orderstatus = 'O' THEN k END)"
        ).alias("so"),
        F.expr(
            "CAST(count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN k END)"
            " AS BIGINT)"
        ).alias("nf"),
        F.expr(
            "CAST(count(DISTINCT CASE WHEN o_orderstatus = 'O' THEN k END)"
            " AS BIGINT)"
        ).alias("no"),
    )
    return both.select(
        F.col("nf").alias("n_f"),
        F.col("no").alias("n_o"),
        F.expr("CAST(theta_sketch_estimate(theta_union(sf, so)) AS BIGINT)").alias(
            "n_union"
        ),
        F.expr(
            "CAST(theta_sketch_estimate(theta_intersection(sf, so)) AS BIGINT)"
        ).alias("n_intersect"),
        F.expr(
            "CAST(theta_sketch_estimate(theta_difference(sf, so)) AS BIGINT)"
        ).alias("n_f_only"),
    )


Q376_SQL = f"""
WITH o AS (
  SELECT o_orderstatus, o_custkey % {THETA_MOD} AS k FROM orders
),
f AS (SELECT DISTINCT k FROM o WHERE o_orderstatus = 'F'),
oo AS (SELECT DISTINCT k FROM o WHERE o_orderstatus = 'O')
SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_f,
       (SELECT CAST(count(*) AS BIGINT) FROM oo) AS n_o,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT k FROM f UNION SELECT k FROM oo)) AS n_union,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT k FROM f INTERSECT SELECT k FROM oo)) AS n_intersect,
       (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT k FROM f EXCEPT SELECT k FROM oo)) AS n_f_only
"""


# ------------------------------------------------------------- q377

CSV_MOD = 13


def q377_csv_interchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: the CSV interchange pair — ``to_csv``
    serialization with RFC-4180 quoting (the constructed name embeds
    a literal comma AND a double quote) and ``from_csv``
    schema-directed parse-back — the q362 XML discipline applied to
    the row format every feed still speaks.  The oracle is the closed
    form: every parsed field must round-trip to its base column and
    the ``*_ok`` booleans certify the quoting/escaping rather than
    assuming it.

    Scale: per-row codegen'd string expressions on one scan — the
    serialize/parse pair is a projection, no shuffle; this is the
    interchange path for CSV-bearing feeds at any size."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % CSV_MOD == 0)
    tricky = F.concat(F.col("c_name"), F.lit(', "vip"'))
    csv = F.to_csv(
        F.struct(
            F.col("c_custkey").alias("k"),
            tricky.alias("nm"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    parsed = F.from_csv(csv, F.lit("k BIGINT, nm STRING, bal DECIMAL(18,2)"))
    return (
        c.select("c_custkey", "c_name", "c_acctbal", csv.alias("_csv"), parsed.alias("_p"))
        .select(
            "c_custkey",
            F.col("_p.nm").alias("parsed_name"),
            (F.col("_p.nm") == F.concat(F.col("c_name"), F.lit(', "vip"'))).alias(
                "roundtrip_ok"
            ),
            (F.col("_p.bal") * 100).cast("long").alias("parsed_bal_cents"),
            F.col("_csv").contains('"').alias("quoted_ok"),
            (F.col("_p.k") == F.col("c_custkey")).alias("key_ok"),
        )
        .orderBy("c_custkey")
    )


Q377_SQL = f"""
SELECT c_custkey,
       c_name || ', "vip"' AS parsed_name,
       true AS roundtrip_ok,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         AS parsed_bal_cents,
       true AS quoted_ok,
       true AS key_ok
FROM customer WHERE c_custkey % {CSV_MOD} = 0 ORDER BY c_custkey
"""


# ------------------------------------------------------------- q378

URL_MOD = 17


def q378_url_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: the URL surface — ``parse_url`` component
    extraction (HOST, PATH, QUERY, and keyed query-parameter lookup)
    plus the ``url_encode``/``url_decode`` round-trip on a
    reserved-character payload built from real data.  DuckDB has no
    URL functions, so the oracle is the closed form (the URL never
    leaves Spark): every extracted component must equal the column it
    was built from, and decode(encode(x)) must reproduce x exactly.

    Scale: pure per-row string codegen on a scan — the clickstream /
    referrer-parsing pattern at any size, no shuffle."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % URL_MOD == 0)
    payload = F.concat(
        F.lit("u&"), F.col("user_id").cast("string"), F.lit(" /t=")
    )
    url = F.concat(
        F.lit("https://app.example.com/e/"),
        F.col("event_type"),
        F.lit("?uid="),
        F.col("user_id").cast("string"),
        F.lit("&ref="),
        F.expr("url_encode(concat('u&', CAST(user_id AS STRING), ' /t='))"),
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            url.alias("_u"),
            payload.alias("_pay"),
        )
        .select(
            "event_id",
            F.expr("parse_url(_u, 'HOST')").alias("host"),
            (
                F.expr("parse_url(_u, 'PATH')")
                == F.concat(F.lit("/e/"), F.col("event_type"))
            ).alias("path_ok"),
            (
                F.expr("parse_url(_u, 'QUERY', 'uid')")
                == F.col("user_id").cast("string")
            ).alias("uid_ok"),
            (
                F.expr("url_decode(parse_url(_u, 'QUERY', 'ref'))")
                == F.col("_pay")
            ).alias("ref_roundtrip_ok"),
        )
        .orderBy("event_id")
    )


Q378_SQL = f"""
SELECT event_id,
       'app.example.com' AS host,
       true AS path_ok,
       true AS uid_ok,
       true AS ref_roundtrip_ok
FROM events WHERE event_id % {URL_MOD} = 0 ORDER BY event_id
"""


# ------------------------------------------------------------- q379


def q379_listagg_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #17: ORDERED STRING AGGREGATION — the
    SQL:2023 ``listagg(expr, sep) WITHIN GROUP (ORDER BY ...)``
    (Spark 4) against DuckDB's ``string_agg(expr, sep ORDER BY ...)``
    and the engine-portable idiom the rest of this suite uses
    (``concat_ws`` over ``sort_array(collect_list(...))``) — all
    three must agree byte-for-byte, certified by emitting the listagg
    and the portable form side-by-side with an in-row equality flag.
    The ORDER BY is a TOTAL order (name is unique per nation group
    subset), so the certified value is deterministic by construction
    — unordered listagg is exactly as nondeterministic as
    collect_list and never appears in compared output.

    Scale: one |region|-group hash-agg over the 25-row nation dim;
    the pattern matters at the report layer, not the corpus layer —
    grouped string assembly is always |groups|-sized."""
    n = _t(spark, sf_dir, "nation")
    agg = n.groupBy(F.col("n_regionkey").alias("region")).agg(
        F.expr(
            "listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)"
        ).alias("names_listagg"),
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias(
            "names_portable"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )
    return agg.select(
        "region",
        "names_listagg",
        (F.col("names_listagg") == F.col("names_portable")).alias("forms_agree"),
        "n_nations",
    ).orderBy("region")


Q379_SQL = """
SELECT CAST(n_regionkey AS BIGINT) AS region,
       string_agg(n_name, '|' ORDER BY n_name) AS names_listagg,
       true AS forms_agree,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation GROUP BY 1 ORDER BY region
"""


# ------------------------------------------------------------- q380

AES_KEY = "0123456789abcdef"  # 16-byte demo key; prod = KMS-managed
AES_MOD = 19


def q380_aes_column_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption door: ``aes_encrypt``/``aes_decrypt``
    in deterministic ECB mode over the PII column (q52 masks PII
    destructively; this is the REVERSIBLE path — tokenize on write,
    decrypt under key custody), plus ``try_aes_decrypt`` certifying
    that a WRONG key yields NULL (the safe-degradation contract), not
    garbage or an exception.  ECB here because the certificate needs
    determinism; the docstring is the fence: production randomizes
    (GCM default) and trades this very testability for semantic
    security.  DuckDB cannot run AES, so the oracle is the closed
    form — decrypt∘encrypt must be the identity and the wrong-key
    probe must be NULL on every row.

    Scale: per-row JVM crypto inside codegen — one scan, no shuffle;
    key distribution is cluster config, not data."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % AES_MOD == 0)
    enc = F.expr(f"aes_encrypt(c_name, '{AES_KEY}', 'ECB')")
    return (
        c.select("c_custkey", "c_name", enc.alias("_e"))
        .select(
            "c_custkey",
            F.expr(f"CAST(aes_decrypt(_e, '{AES_KEY}', 'ECB') AS STRING)").alias(
                "decrypted"
            ),
            (
                F.expr(f"CAST(aes_decrypt(_e, '{AES_KEY}', 'ECB') AS STRING)")
                == F.col("c_name")
            ).alias("roundtrip_ok"),
            F.expr(
                f"try_aes_decrypt(_e, 'fedcba9876543210', 'ECB')"
            ).isNull().alias("wrong_key_is_null"),
            (F.length("_e") % 16 == 0).alias("block_aligned"),
        )
        .orderBy("c_custkey")
    )


Q380_SQL = f"""
SELECT c_custkey,
       c_name AS decrypted,
       true AS roundtrip_ok,
       true AS wrong_key_is_null,
       true AS block_aligned
FROM customer WHERE c_custkey % {AES_MOD} = 0 ORDER BY c_custkey
"""


# ------------------------------------------------------------- q381

WB_BUCKETS = 8
WB_LO = 0
WB_HI = 600_000  # cents


def q381_make_timestamp_width_bucket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Constructor door: ``make_timestamp`` (identical semantics in
    both engines — certified, including the fractional second),
    epoch extraction via ``unix_millis``, and ``width_bucket``
    equi-width banding of order value — Spark-only, so the oracle
    derives the same bucket in closed form: floor((x−lo)·n/(hi−lo))+1
    clamped to [0, n+1] (the below-range 0 and overflow n+1 buckets
    are part of the contract and appear in real data here).

    Scale: constructors and banding are per-row codegen; the
    |buckets|-group agg is the only (tiny) shuffle."""
    o = _t(spark, sf_dir, "orders").select(
        _money_cents("o_totalprice").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    ts = F.expr("make_timestamp(year(d), month(d), dayofmonth(d), 12, 30, 7.5)")
    b = o.select(
        "cents",
        F.expr(
            f"width_bucket(cents, {WB_LO}, {WB_HI}, {WB_BUCKETS})"
        ).alias("bucket"),
        F.expr(f"unix_millis({ts._jc.toString()})").alias("noon_ms"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents_sum"),
            F.min("noon_ms").alias("min_noon_ms"),
            F.max("noon_ms").alias("max_noon_ms"),
        )
        .orderBy("bucket")
    )


Q381_SQL = f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
),
b AS (
  SELECT cents,
         CASE WHEN cents < {WB_LO} THEN 0
              WHEN cents >= {WB_HI} THEN {WB_BUCKETS} + 1
              ELSE CAST((cents - {WB_LO}) * {WB_BUCKETS}
                        // ({WB_HI} - {WB_LO}) AS BIGINT) + 1 END AS bucket,
         CAST(epoch_ms(make_timestamp(year(d), month(d), day(d), 12, 30, 7.5))
              AS BIGINT) AS noon_ms
  FROM o
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents_sum,
       min(noon_ms) AS min_noon_ms,
       max(noon_ms) AS max_noon_ms
FROM b GROUP BY bucket ORDER BY bucket
"""


QUERIES_EXT70 = {
    "q376_theta_set_algebra": q376_theta_set_algebra,
    "q377_csv_interchange": q377_csv_interchange,
    "q378_url_surface": q378_url_surface,
    "q379_listagg_conformance": q379_listagg_conformance,
    "q380_aes_column_crypto": q380_aes_column_crypto,
    "q381_make_timestamp_width_bucket": q381_make_timestamp_width_bucket,
}


def _oracles_ext70() -> dict[str, str]:
    return {
        "q376_theta_set_algebra": Q376_SQL,
        "q377_csv_interchange": Q377_SQL,
        "q378_url_surface": Q378_SQL,
        "q379_listagg_conformance": Q379_SQL,
        "q380_aes_column_crypto": Q380_SQL,
        "q381_make_timestamp_width_bucket": Q381_SQL,
    }
