"""Round-5 driver query families, batch 71 (q382-q383): schema-less
JSON extraction (the door from_json's schema-directed parsing — used
across the multimodal family — deliberately is not), and regex
conformance certificate #18.

Same contract as the other driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q382

JSON_MOD = 23


def q382_schemaless_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-less JSON extraction — ``get_json_object`` (JSONPath:
    nested object, array index, missing key → NULL),
    ``json_array_length``, ``json_object_keys``, and ``json_tuple``
    (the multi-path row form) — the exploratory door for feeds whose
    shape is not yet pinned, where the multimodal family's
    ``from_json`` demands a schema up front.  The document is built
    in-query from real columns (nested object + array + the raw
    events ``props``), and DuckDB's JSON functions are a TRUE
    cross-engine oracle (json_extract_string/json_array_length/
    json_keys), not a closed form.

    Scale: per-row JSON parsing in codegen — one scan, no shuffle;
    the fence: each get_json_object RE-PARSES the document, so wide
    multi-path extraction belongs to json_tuple (one parse, N paths)
    or, once the shape stabilizes, from_json to columnar struct."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % JSON_MOD == 0)
    doc = F.concat(
        F.lit('{"meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "uid": '),
        F.col("user_id").cast("string"),
        F.lit('}, "tags": ['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(", "),
        (F.col("user_id") % 3).cast("string"),
        F.lit('], "props": '),
        F.col("props"),
        F.lit("}"),
    )
    d = e.select("event_id", "user_id", "event_type", doc.alias("j"))
    return d.select(
        "event_id",
        F.get_json_object("j", "$.meta.type").alias("j_type"),
        F.get_json_object("j", "$.meta.uid").cast("long").alias("j_uid"),
        F.get_json_object("j", "$.tags[1]").cast("long").alias("j_tag1"),
        F.get_json_object("j", "$.props.k").cast("long").alias("j_prop_k"),
        F.get_json_object("j", "$.zz").alias("j_missing"),
        F.json_array_length(F.get_json_object("j", "$.tags")).alias("n_tags"),
        F.concat_ws(",", F.json_object_keys("j")).alias("keys_str"),
        F.json_tuple("j", "meta", "tags").alias("t_meta", "t_tags"),
    ).select(
        "event_id", "j_type", "j_uid", "j_tag1", "j_prop_k", "j_missing",
        "n_tags", "keys_str",
        F.get_json_object("t_meta", "$.uid").cast("long").alias("tuple_uid"),
        F.json_array_length("t_tags").alias("tuple_n_tags"),
    ).orderBy("event_id")


Q382_SQL = f"""
WITH d AS (
  SELECT event_id,
         '{{"meta": {{"type": "' || event_type || '", "uid": ' ||
         CAST(user_id AS VARCHAR) || '}}, "tags": [' ||
         CAST(event_id % 5 AS VARCHAR) || ', ' ||
         CAST(user_id % 3 AS VARCHAR) || '], "props": ' || props || '}}' AS j
  FROM events WHERE event_id % {JSON_MOD} = 0
)
SELECT event_id,
       json_extract_string(j, '$.meta.type') AS j_type,
       CAST(json_extract_string(j, '$.meta.uid') AS BIGINT) AS j_uid,
       CAST(json_extract_string(j, '$.tags[1]') AS BIGINT) AS j_tag1,
       CAST(json_extract_string(j, '$.props.k') AS BIGINT) AS j_prop_k,
       json_extract_string(j, '$.zz') AS j_missing,
       CAST(json_array_length(json_extract(j, '$.tags')) AS INT) AS n_tags,
       array_to_string(json_keys(j), ',') AS keys_str,
       CAST(json_extract_string(json_extract(j, '$.meta'), '$.uid') AS BIGINT)
         AS tuple_uid,
       CAST(json_array_length(json_extract(j, '$.tags')) AS INT)
         AS tuple_n_tags
FROM d ORDER BY event_id
"""


# ------------------------------------------------------------- q383

RE_MOD = 29


def q383_regex_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance certificate #18: REGEX semantics over real customer
    names — group extraction (nested + numbered), the full-match form
    (Spark ``regexp_substr`` ≡ DuckDB ``regexp_extract(..., 0)``),
    lazy quantifiers, anchored alternation via ``regexp_like`` ≡
    ``regexp_matches``, ``regexp_replace`` with group references
    ($1 vs \\1 — each engine's own spelling, same value), and
    ``regexp_count`` ≡ ``len(regexp_extract_all)`` — the portable RE
    core certified value-identical.  The one structural divergence is
    pinned in pytest, not here: Spark (Java regex) supports
    BACKREFERENCES like ``(abc)\\1``; DuckDB (RE2) rejects the
    pattern outright — portable regexes must stay backreference-free.
    (Spark ``regexp_instr`` has no DuckDB twin; its value is
    cross-checked in-row against length arithmetic instead.)

    Scale: per-row RE2/Java-regex evaluation in codegen — one scan,
    no shuffle; regex cost is per-byte, the same at any corpus size."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % RE_MOD == 0)
    # c_name is 'Customer#000000NNN' — digits + '#' make real material.
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([A-Za-z]+)#(\d+)", 1).alias("word_part"),
        F.regexp_extract("c_name", r"([A-Za-z]+)#(\d+)", 2).alias("num_part"),
        F.expr(r"regexp_substr(c_name, '[A-Za-z]+#\\d\\d')").alias("full_match"),
        F.regexp_extract("c_name", r"^(.+?)#", 1).alias("lazy_prefix"),
        F.expr(r"regexp_like(c_name, '^(Customer|Supplier)#\\d+$')").alias(
            "anchored_ok"
        ),
        F.regexp_replace("c_name", r"(\d{3})$", "<$1>").alias("grouped_replace"),
        F.expr(r"CAST(regexp_count(c_name, '0') AS INT)").alias("n_zeros"),
        (
            F.expr(r"regexp_instr(c_name, '#')")
            == F.length(F.regexp_extract("c_name", r"^([^#]*)#", 1)) + 1
        ).alias("instr_consistent"),
    ).orderBy("c_custkey")


Q383_SQL = f"""
SELECT c_custkey,
       regexp_extract(c_name, '([A-Za-z]+)#(\\d+)', 1) AS word_part,
       regexp_extract(c_name, '([A-Za-z]+)#(\\d+)', 2) AS num_part,
       regexp_extract(c_name, '[A-Za-z]+#\\d\\d', 0) AS full_match,
       regexp_extract(c_name, '^(.+?)#', 1) AS lazy_prefix,
       regexp_matches(c_name, '^(Customer|Supplier)#\\d+$') AS anchored_ok,
       regexp_replace(c_name, '(\\d{{3}})$', '<\\1>') AS grouped_replace,
       CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
       true AS instr_consistent
FROM customer WHERE c_custkey % {RE_MOD} = 0 ORDER BY c_custkey
"""


QUERIES_EXT71 = {
    "q382_schemaless_json": q382_schemaless_json,
    "q383_regex_conformance": q383_regex_conformance,
}


def _oracles_ext71() -> dict[str, str]:
    return {
        "q382_schemaless_json": Q382_SQL,
        "q383_regex_conformance": Q383_SQL,
    }
