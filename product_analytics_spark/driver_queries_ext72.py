"""Round-5 driver query families, batch 72 (q384-q385): the JVM
reflection escape hatch and the binary encoding / digest surface.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q384

REFL_MOD = 37


def q384_jvm_reflect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine door: ``reflect()`` — calling arbitrary JVM STATIC
    methods from SQL, the zero-UDF escape hatch for library functions
    Spark has not wrapped (here ``java.lang.Long.toHexString/
    toBinaryString/bitCount/numberOfTrailingZeros`` over real keys).
    DuckDB's native ``to_hex``/``bin``/``bit_count`` are a TRUE
    cross-engine oracle for exactly those methods — which is the
    door's certification trick: reflection is only checkable where an
    independent implementation exists, so the certified subset is the
    bit-manipulation core, and the docstring is the fence for the
    rest.

    Scale: reflect is JVM-side per-row invocation — no Python
    boundary, no shuffle, but ALSO no codegen (reflective dispatch
    per row): fine for the escape-hatch role, wrong for the hot path
    — a hot-path bit op belongs to the built-ins (q365's
    bitmap_bit_position) or a compiled expression."""
    # o_orderkey > 0: numberOfTrailingZeros(0) is 64 (the Java word
    # width), which no closed form over bin() can reproduce.
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % REFL_MOD == 0) & (F.col("o_orderkey") > 0)
    )
    return o.select(
        "o_orderkey",
        F.expr("reflect('java.lang.Long', 'toHexString', o_orderkey)").alias(
            "key_hex"
        ),
        F.expr("reflect('java.lang.Long', 'toBinaryString', o_orderkey)").alias(
            "key_bin"
        ),
        F.expr(
            "CAST(reflect('java.lang.Long', 'bitCount', o_orderkey) AS INT)"
        ).alias("key_popcount"),
        F.expr(
            "CAST(reflect('java.lang.Long', 'numberOfTrailingZeros', o_orderkey)"
            " AS INT)"
        ).alias("key_ctz"),
    ).orderBy("o_orderkey")


Q384_SQL = f"""
SELECT o_orderkey,
       lower(to_hex(o_orderkey)) AS key_hex,
       bin(o_orderkey) AS key_bin,
       CAST(bit_count(o_orderkey) AS INT) AS key_popcount,
       CAST(CASE WHEN o_orderkey % 2 = 1 THEN 0
                 ELSE length(bin(o_orderkey))
                      - length(rtrim(bin(o_orderkey), '0')) END AS INT)
         AS key_ctz
FROM orders WHERE o_orderkey % {REFL_MOD} = 0 AND o_orderkey > 0
ORDER BY o_orderkey
"""


# ------------------------------------------------------------- q385

DIG_MOD = 41


def q385_encoding_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding + digest surface — ``base64``/``unbase64``
    round-trip, ``hex``, ``sha2(·,256)``, ``md5``, ``crc32`` (in-row
    consistency: equal inputs ⇒ equal digests), and the
    ``octet_length`` vs ``length`` UTF-8 distinction on a
    multi-byte-bearing payload — the content-addressing / PII-token
    pattern (X2's md5 BLOCKING hash is the consumer; this certifies
    the encode surface itself).  sha256/md5/base64/hex have native
    DuckDB twins — a TRUE cross-engine oracle; crc32 has none and is
    certified in-row (digest equality across two independent
    constructions of the same payload).

    Scale: per-row JVM digest inside codegen, one scan, no shuffle;
    at 100 TB this is the dedup-key / content-id map stage."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % DIG_MOD == 0)
    payload = F.concat(F.col("c_name"), F.lit("|é|"), F.col("c_mktsegment"))
    payload2 = F.concat(
        F.col("c_name"), F.lit("|"), F.lit("é"), F.lit("|"), F.col("c_mktsegment")
    )
    b = payload.cast("binary")
    return c.select(
        "c_custkey",
        F.base64(b).alias("b64"),
        (F.unbase64(F.base64(b)).cast("string") == payload).alias("b64_roundtrip_ok"),
        F.lower(F.hex(b)).alias("hex_form"),
        F.sha2(b, 256).alias("sha256_hex"),
        F.md5(b).alias("md5_hex"),
        (F.crc32(b) == F.crc32(payload2.cast("binary"))).alias("crc_consistent"),
        F.octet_length(payload).alias("n_bytes"),
        F.length(payload).alias("n_chars"),
    ).orderBy("c_custkey")


Q385_SQL = f"""
WITH c AS (
  SELECT c_custkey, c_name || '|é|' || c_mktsegment AS payload
  FROM customer WHERE c_custkey % {DIG_MOD} = 0
)
SELECT c_custkey,
       to_base64(encode(payload)) AS b64,
       true AS b64_roundtrip_ok,
       lower(to_hex(encode(payload))) AS hex_form,
       sha256(payload) AS sha256_hex,
       md5(payload) AS md5_hex,
       true AS crc_consistent,
       CAST(octet_length(encode(payload)) AS INT) AS n_bytes,
       CAST(length(payload) AS INT) AS n_chars
FROM c ORDER BY c_custkey
"""


QUERIES_EXT72 = {
    "q384_jvm_reflect": q384_jvm_reflect,
    "q385_encoding_digest": q385_encoding_digest,
}


def _oracles_ext72() -> dict[str, str]:
    return {
        "q384_jvm_reflect": Q384_SQL,
        "q385_encoding_digest": Q385_SQL,
    }
