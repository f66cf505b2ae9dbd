"""Round-4 driver query families, batch 27 (q226-q229): the Spark 4
SQL surface exercised as driver-checked queries — native recursive
CTEs, pipe-syntax pipelines, correlated LATERAL joins, and
parameterized SQL with IDENTIFIER().

These are engine-surface evidence: each feature runs through
``spark.sql`` (not the DataFrame API) and is certified equivalent to
a portable oracle formulation. Same contract as the other
driver_queries modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_analytics_spark.qcommon import _t

# ------------------------------------------------------------- q226

# Shared recursive-CTE text: parent(p) = floor((p-1)/4) computed via
# exact double division (p < 2^50, so (p-1)/4.0 and floor() are exact
# IEEE operations on BOTH engines) — this dodges the integer-division
# dialect split (Spark `div` vs DuckDB `//`) so ONE SQL string runs on
# both engines verbatim.
_Q226_BODY = """
WITH RECURSIVE walk(id, depth) AS (
  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
  UNION ALL
  SELECT p.p_partkey, w.depth + 1
  FROM walk w
  JOIN {part} p
    ON p.p_partkey >= 1
   AND CAST(FLOOR((p.p_partkey - 1) / 4.0) AS BIGINT) = w.id
)
SELECT CAST(id AS BIGINT) AS p_partkey,
       CAST(depth AS INT) AS depth
FROM walk
"""


def q226_recursive_cte_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189: NATIVE recursive CTE (Spark 4's WITH RECURSIVE) — the
    same dense-key part hierarchy q217 flattens in closed form, walked
    top-down by the engine's own recursion: seed at the root, join
    each frontier to its children until fixpoint, yielding every
    node's depth. The SQL text is shared VERBATIM with the oracle
    (parent derived by exact floor-double division, sidestepping the
    `div` vs `//` dialect split) — certifying that Spark's recursion
    semantics (UNION ALL iteration to fixpoint) match the reference
    engine's on a real hierarchy.

    q217 remains the 100 TB shape (closed-form ancestor explode, no
    iteration); this query is the ENGINE-SURFACE evidence that the
    declarative recursive form is available when the hierarchy has no
    closed form. Scale posture: each recursion step is one join of
    the frontier against the child relation — identical economics to
    graph.bfs_hops, but scheduled by the engine.

    Reference: vikneshwara-r-b/product_analytics has no recursive
    models; this extends the engine surface beyond it."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("q226_part")
    return spark.sql(_Q226_BODY.format(part="q226_part"))


# ------------------------------------------------------------- q227


def q227_pipe_syntax_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X190: SQL pipe syntax (Spark 4 `|>`) — the linear-dataflow SQL
    dialect (FROM … |> WHERE … |> AGGREGATE … |> ORDER BY) run as a
    real revenue report: filter open orders away, aggregate order
    count + cents-exact revenue per year, keep years with enough
    volume, rank. The oracle states the identical pipeline as nested
    standard SQL — certifying the pipe operators desugar to exactly
    the relational plan the classic form produces.

    Scale: the syntax is sugar — the plan is the same scan → filter →
    partial/final hash agg → HAVING filter as q10's family, with
    pushdown and map-side combine intact (verified by the shared
    value gate, not assumed)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q227_orders")
    return spark.sql(
        """
        FROM q227_orders
        |> WHERE o_orderstatus <> 'O'
        |> EXTEND year(o_orderdate) AS order_year,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(cents) AS BIGINT) AS sum_cents
           GROUP BY order_year
        |> WHERE n_orders >= 100
        |> SELECT CAST(order_year AS INT) AS order_year,
                  CAST(n_orders AS BIGINT) AS n_orders,
                  sum_cents / CAST(100.0 AS DOUBLE) AS revenue
        """
    )


Q227_SQL = """
SELECT CAST(order_year AS INT) AS order_year,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(sum_cents AS BIGINT) / 100.0 AS revenue
FROM (
  SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
         count(*) AS n_orders,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS sum_cents
  FROM orders
  WHERE o_orderstatus <> 'O'
  GROUP BY 1
)
WHERE n_orders >= 100
"""


# ------------------------------------------------------------- q228


def q228_lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191: correlated LATERAL join — the per-row-subquery form of
    top-k-per-group: for every nation, LATERAL-select its 2 highest-
    value orders (through the customer bridge), with the correlation
    (`o.c_nationkey = n.n_nationkey`) referenced INSIDE the lateral
    subquery's ORDER BY/LIMIT. Catalyst de-correlates this into the
    ranked-window plan q34 writes by hand — the engine-surface proof
    that the declarative correlated form is available and agrees.

    The oracle states the same semantics as a row_number window
    (DuckDB's planner handles correlated LATERAL LIMIT differently;
    the window form is the portable ground truth).

    Scale: after de-correlation the plan is one join + one
    nation-keyed window — no per-nation subquery execution."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("q228_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q228_orders")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q228_nation")
    return spark.sql(
        """
        SELECT n.n_name,
               l.o_orderkey,
               CAST(CAST(l.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 AS order_value
        FROM q228_nation n
        JOIN LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM q228_orders o
          JOIN q228_customer c ON c.c_custkey = o.o_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
          LIMIT 2
        ) l
        """
    )


Q228_SQL = """
WITH ranked AS (
  SELECT n.n_name, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY n.n_nationkey
           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         ) AS rk
  FROM nation n
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
)
SELECT n_name, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS order_value
FROM ranked WHERE rk <= 2
"""


# ------------------------------------------------------------- q229

AUDIT_TABLES = ["region", "nation", "customer", "orders"]
AUDIT_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
}


def q229_parameterized_sql_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X192: parameterized SQL + IDENTIFIER() — the injection-safe
    metadata-driven pattern: ONE SQL template with named parameters
    runs per catalog entry, the table name bound through
    ``IDENTIFIER(:tbl)`` (an identifier, not a string splice) and the
    key column through ``IDENTIFIER(:key)``. Emits the cross-table
    audit (rows, distinct keys, key-is-unique) — q194's sweep
    restated through the templating door a metadata-driven platform
    actually uses.

    Scale: one count-distinct agg per table, driven by catalog
    metadata — the template is the governed artifact, table names are
    data."""
    parts = []
    for t in AUDIT_TABLES:
        _t(spark, sf_dir, t).createOrReplaceTempView(f"q229_{t}")
        parts.append(
            spark.sql(
                """
                SELECT :name AS table_name,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(DISTINCT IDENTIFIER(:key)) AS BIGINT)
                         AS n_distinct_keys
                FROM IDENTIFIER(:tbl)
                """,
                args={
                    "name": t,
                    "tbl": f"q229_{t}",
                    "key": AUDIT_KEYS[t],
                },
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "table_name",
        "n_rows",
        "n_distinct_keys",
        (F.col("n_rows") == F.col("n_distinct_keys")).alias("key_unique"),
    )


def _q229_sql() -> str:
    parts = [
        f"""
SELECT '{t}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {AUDIT_KEYS[t]}) AS BIGINT) AS n_distinct_keys
FROM {t}"""
        for t in AUDIT_TABLES
    ]
    un = " UNION ALL ".join(parts)
    return f"""
SELECT table_name, n_rows, n_distinct_keys,
       n_rows = n_distinct_keys AS key_unique
FROM ({un})
"""


QUERIES_EXT27 = {
    "q226_recursive_cte_native": q226_recursive_cte_native,
    "q227_pipe_syntax_pipeline": q227_pipe_syntax_pipeline,
    "q228_lateral_topk_join": q228_lateral_topk_join,
    "q229_parameterized_sql_audit": q229_parameterized_sql_audit,
}


def _oracles_ext27() -> dict[str, str]:
    return {
        "q226_recursive_cte_native": _Q226_BODY.format(part="part"),
        "q227_pipe_syntax_pipeline": Q227_SQL,
        "q228_lateral_topk_join": Q228_SQL,
        "q229_parameterized_sql_audit": _q229_sql(),
    }
