"""Seeded differential query fuzzer: randomly generated SQL in the
dialect-shared subset runs VERBATIM on both Spark SQL and DuckDB over
the same parquet, and results must match row-for-row.

The hand-written oracle suite proves the queries we thought of; the
fuzzer probes the space of queries we didn't. The generated subset is
deliberately engine-portable (integer/cents arithmetic, no floats
across rows, no dialect-divergent functions) so any mismatch is a real
semantic disagreement, not representation noise. The seed is fixed —
failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from tests.conftest import SF_SMALL

SEED = 20260814
N_QUERIES = 30

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

DIMS = [
    "o_orderstatus",
    "o_orderpriority",
    "CAST(year(CAST(o_orderdate AS DATE)) AS INT)",
    "CAST(month(CAST(o_orderdate AS DATE)) AS INT)",
    "CAST(o_custkey % 7 AS BIGINT)",
]
AGGS = [
    "CAST(count(*) AS BIGINT)",
    f"CAST(sum({_CENTS}) AS BIGINT)",
    f"CAST(min({_CENTS}) AS BIGINT)",
    f"CAST(max({_CENTS}) AS BIGINT)",
    "CAST(count(DISTINCT o_custkey) AS BIGINT)",
    "CAST(min(o_orderkey) AS BIGINT)",
    "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)",
]
PREDS = [
    "o_custkey % 5 = {k}",
    "o_orderkey % 3 <> {k3}",
    "o_orderstatus <> 'O'",
    "o_orderpriority >= '3'",
    f"{_CENTS} > {{cents}}",
    "CAST(year(CAST(o_orderdate AS DATE)) AS INT) BETWEEN {y1} AND {y2}",
]


def _gen(rng: random.Random) -> str:
    dims = rng.sample(DIMS, rng.randint(0, 2))
    aggs = rng.sample(AGGS, rng.randint(1, 3))
    preds = rng.sample(PREDS, rng.randint(0, 2))
    bound = [
        p.format(
            k=rng.randint(0, 4),
            k3=rng.randint(0, 2),
            cents=rng.randint(10_000, 30_000_000),
            y1=1995 + rng.randint(0, 3),
            y2=1999 + rng.randint(0, 2),
        )
        for p in preds
    ]
    cols = [f"{d} AS g{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = f"SELECT {', '.join(cols)} FROM orders"
    if bound:
        sql += " WHERE " + " AND ".join(bound)
    if dims:
        sql += " GROUP BY " + ", ".join(str(i + 1) for i in range(len(dims)))
    return sql


@pytest.fixture(scope="module")
def engines(spark):
    from product_analytics_spark.catalog import read_parquet

    read_parquet(spark, f"{SF_SMALL}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    read_parquet(spark, f"{SF_SMALL}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/customer.parquet')"
    )
    return spark, con


def _normalize(rows, cols):
    return sorted(
        tuple("NULL" if v is None else str(v) for v in row) for row in rows
    )


def test_fuzz_differential(engines):
    spark, con = engines
    rng = random.Random(SEED)
    failures = []
    for qi in range(N_QUERIES):
        sql = _gen(rng)
        sdf = spark.sql(sql)
        srows = _normalize(
            [tuple(r) for r in sdf.collect()], sdf.columns
        )
        orows_raw = con.execute(sql).fetchall()
        orows = _normalize(orows_raw, None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures


# ---------------------------------------------------------------- join+window

JOIN_SEED = 20260815
N_JOIN_QUERIES = 15
N_WINDOW_QUERIES = 15

JDIMS = [
    "c.c_mktsegment",
    "CAST(c.c_nationkey AS INT)",
    "o.o_orderstatus",
    "CAST(o.o_custkey % 11 AS BIGINT)",
]
_OC = "CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
JAGGS = [
    "CAST(count(*) AS BIGINT)",
    f"CAST(sum({_OC}) AS BIGINT)",
    f"CAST(max({_OC}) AS BIGINT)",
    "CAST(count(DISTINCT o.o_custkey) AS BIGINT)",
]
WIN_FNS = [
    "CAST(row_number() OVER w AS BIGINT)",
    "CAST(rank() OVER w AS BIGINT)",
    "CAST(dense_rank() OVER w AS BIGINT)",
    f"CAST(sum({_CENTS}) OVER w2 AS BIGINT)",
    f"CAST(lag({_CENTS}, 1, 0) OVER w AS BIGINT)",
]
WIN_PARTS = ["o_orderstatus", "o_orderpriority", "o_custkey % 13"]


def _gen_join(rng: random.Random) -> str:
    """orders x customer star join with grouped aggregates + HAVING —
    the dialect-shared join/HAVING subset."""
    dims = rng.sample(JDIMS, rng.randint(1, 2))
    aggs = rng.sample(JAGGS, rng.randint(1, 3))
    cols = [f"{d} AS g{i}" for i, d in enumerate(dims)] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    sql = (
        f"SELECT {', '.join(cols)} FROM orders o "
        "JOIN customer c ON c.c_custkey = o.o_custkey"
    )
    if rng.random() < 0.6:
        sql += f" WHERE o.o_orderkey % {rng.randint(2, 5)} = 0"
    sql += " GROUP BY " + ", ".join(str(i + 1) for i in range(len(dims)))
    if rng.random() < 0.5:
        sql += f" HAVING count(*) > {rng.randint(1, 8)}"
    return sql


def _gen_window(rng: random.Random) -> str:
    """Window functions over a TOTAL order (cents, orderkey) so every
    rank/frame value is deterministic; bounded by an orderkey filter
    plus outer ORDER BY for a stable compared set."""
    part = rng.choice(WIN_PARTS)
    fns = rng.sample(WIN_FNS, rng.randint(1, 3))
    cols = ["CAST(o_orderkey AS BIGINT) AS k"] + [
        f"{f} AS w{i}" for i, f in enumerate(fns)
    ]
    return (
        f"SELECT {', '.join(cols)} FROM orders"
        f" WHERE o_orderkey % {rng.randint(7, 19)} = 0"
        f" WINDOW w AS (PARTITION BY {part}"
        f" ORDER BY {_CENTS}, o_orderkey),"
        f" w2 AS (PARTITION BY {part} ORDER BY {_CENTS}, o_orderkey"
        " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " ORDER BY k"
    )


def test_fuzz_join_differential(engines):
    spark, con = engines
    rng = random.Random(JOIN_SEED)
    failures = []
    for qi in range(N_JOIN_QUERIES):
        sql = _gen_join(rng)
        sdf = spark.sql(sql)
        srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        orows = _normalize(con.execute(sql).fetchall(), None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures


def test_fuzz_window_differential(engines):
    spark, con = engines
    rng = random.Random(JOIN_SEED + 1)
    failures = []
    for qi in range(N_WINDOW_QUERIES):
        sql = _gen_window(rng)
        sdf = spark.sql(sql)
        srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        orows = _normalize(con.execute(sql).fetchall(), None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures


# ---------------------------------------------------------------- datetime

DT_SEED = 20260816
N_DT_QUERIES = 20

_D = "CAST(o_orderdate AS DATE)"
DT_DIMS = [
    f"CAST(year({_D}) AS INT)",
    f"CAST(quarter({_D}) AS INT)",
    f"CAST(month({_D}) AS INT)",
    f"CAST(weekofyear({_D}) AS INT)",
    f"CAST(year({_D}) * 12 + month({_D}) AS INT)",
]
DT_PROJ = [
    f"CAST(last_day({_D}) AS STRING)",
    f"CAST(CAST(date_trunc('week', {_D}) AS DATE) AS STRING)",
    f"CAST(CAST({_D} + INTERVAL {{m}} MONTH AS DATE) AS STRING)",
    f"CAST(greatest({_D}, DATE '1997-06-15') AS STRING)",
    f"CAST(least({_D}, DATE '1996-09-01') AS STRING)",
    f"CAST(dayofmonth({_D}) AS INT)",
]
DT_PREDS = [
    f"{_D} BETWEEN DATE '199{{y1}}-01-01' AND DATE '199{{y2}}-12-31'",
    f"month({_D}) = {{mo}}",
    f"quarter({_D}) <> {{q}}",
]


def _gen_datetime(rng: random.Random) -> str:
    """Verbatim-shared datetime subset (certificate #15's portable
    core, fuzzed): grouped calendar rollups and per-row date
    expressions — every function here is name- and value-identical in
    both engines (the divergent ones — dayofweek, months_between,
    datediff, next_day — are excluded BY the certificate and routed
    through their portable forms in real queries)."""
    if rng.random() < 0.5:  # grouped calendar rollup
        dims = rng.sample(DT_DIMS, rng.randint(1, 2))
        cols = [f"{d} AS g{i}" for i, d in enumerate(dims)] + [
            "CAST(count(*) AS BIGINT) AS n",
            "CAST(min(o_orderkey) AS BIGINT) AS mn",
        ]
        sql = f"SELECT {', '.join(cols)} FROM orders"
        preds = rng.sample(DT_PREDS, rng.randint(0, 2))
    else:  # per-row projection, bounded + totally ordered
        projs = rng.sample(DT_PROJ, rng.randint(2, 4))
        cols = ["CAST(o_orderkey AS BIGINT) AS k"] + [
            p.format(m=rng.randint(1, 23)) + f" AS p{i}"
            for i, p in enumerate(projs)
        ]
        sql = (
            f"SELECT {', '.join(cols)} FROM orders"
            f" WHERE o_orderkey % {rng.randint(5, 17)} = 0"
        )
        preds = []
    bound = [
        p.format(
            y1=rng.randint(2, 5),
            y2=rng.randint(6, 9),
            mo=rng.randint(1, 12),
            q=rng.randint(1, 4),
        )
        for p in preds
    ]
    if bound:
        sql += (" AND " if " WHERE " in sql else " WHERE ") + " AND ".join(bound)
    if " AS g0" in sql:
        n_dims = sql.count(" AS g")
        sql += " GROUP BY " + ", ".join(str(i + 1) for i in range(n_dims))
    else:
        sql += " ORDER BY k"
    return sql


def test_fuzz_datetime_differential(engines):
    spark, con = engines
    rng = random.Random(DT_SEED)
    failures = []
    for qi in range(N_DT_QUERIES):
        sql = _gen_datetime(rng)
        sdf = spark.sql(sql)
        srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        orows = _normalize(con.execute(sql).fetchall(), None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures


# ------------------------------------------- correlated scalar subqueries

CORR_SEED = 20260817
N_CORR_QUERIES = 15

#: Correlated shapes: scalar-aggregate subqueries in SELECT (count —
#: which must be 0, not NULL, on empty groups — vs min/max — which must
#: be NULL), EXISTS / NOT EXISTS, and IN. This family is where
#: decorrelation rewrites diverge most across engines: a wrong rewrite
#: turns the empty-group scalar into a dropped row or a NULL count.
CORR_SCALARS = [
    "(SELECT CAST(count(*) AS BIGINT) FROM orders o"
    " WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % {m} = 0)",
    "(SELECT CAST(max(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100"
    " AS BIGINT)) AS BIGINT) FROM orders o"
    " WHERE o.o_custkey = c.c_custkey)",
    "(SELECT CAST(min(o.o_orderkey) AS BIGINT) FROM orders o"
    " WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'O')",
    "(SELECT CAST(count(DISTINCT o.o_orderstatus) AS BIGINT) FROM orders o"
    " WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % {m} <> 1)",
]
CORR_PREDS = [
    "EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    " AND o.o_orderkey % {m} = 0)",
    "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    " AND o.o_orderpriority >= '4')",
    "c.c_custkey IN (SELECT o.o_custkey FROM orders o"
    " WHERE o.o_orderkey % {m} = 0)",
    "c.c_custkey > (SELECT min(o.o_custkey) + {m} FROM orders o)",
]


def _gen_correlated(rng: random.Random) -> str:
    scalars = rng.sample(CORR_SCALARS, rng.randint(1, 3))
    cols = ["CAST(c.c_custkey AS BIGINT) AS k"] + [
        s.format(m=rng.randint(2, 6)) + f" AS s{i}"
        for i, s in enumerate(scalars)
    ]
    sql = f"SELECT {', '.join(cols)} FROM customer c"
    preds = [f"c.c_custkey % {rng.randint(3, 9)} = 0"]
    if rng.random() < 0.7:
        preds.append(rng.choice(CORR_PREDS).format(m=rng.randint(2, 6)))
    sql += " WHERE " + " AND ".join(preds) + " ORDER BY k"
    return sql


def test_fuzz_correlated_subquery_differential(engines):
    spark, con = engines
    rng = random.Random(CORR_SEED)
    failures = []
    for qi in range(N_CORR_QUERIES):
        sql = _gen_correlated(rng)
        sdf = spark.sql(sql)
        srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        orows = _normalize(con.execute(sql).fetchall(), None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures


# ------------------------------------------------ grouping sets / rollup

GS_SEED = 20260818
N_GS_QUERIES = 15

GS_DIMS = [
    "o_orderstatus",
    "o_orderpriority",
    "CAST(year(CAST(o_orderdate AS DATE)) AS INT)",
    "CAST(o_custkey % 5 AS BIGINT)",
]


def _gen_grouping_sets(rng: random.Random) -> str:
    """ROLLUP / CUBE / explicit GROUPING SETS with GROUPING() markers:
    super-aggregate rows carry NULL dims, so every output row is
    disambiguated by its grouping-function bitmap — the family where
    Expand-rewrite semantics (duplicate dims, partial sets, the grand
    total) diverge most across engines."""
    k = rng.randint(2, 3)
    dims = rng.sample(GS_DIMS, k)
    form = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if form == "SETS":
        subsets = [dims, dims[:1], []]
        if rng.random() < 0.5:
            subsets.insert(1, dims[1:])
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in subsets)
        group_by = f"GROUPING SETS ({sets_sql})"
    else:
        group_by = f"{form}({', '.join(dims)})"
    cols = (
        [f"{d} AS g{i}" for i, d in enumerate(dims)]
        + [f"CAST(GROUPING({d}) AS INT) AS gf{i}" for i, d in enumerate(dims)]
        + [
            "CAST(count(*) AS BIGINT) AS n",
            f"CAST(sum({_CENTS}) AS BIGINT) AS s",
        ]
    )
    sql = f"SELECT {', '.join(cols)} FROM orders"
    if rng.random() < 0.5:
        sql += f" WHERE o_orderkey % {rng.randint(2, 4)} = 0"
    sql += f" GROUP BY {group_by}"
    return sql


def test_fuzz_grouping_sets_differential(engines):
    spark, con = engines
    rng = random.Random(GS_SEED)
    failures = []
    for qi in range(N_GS_QUERIES):
        sql = _gen_grouping_sets(rng)
        sdf = spark.sql(sql)
        srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        orows = _normalize(con.execute(sql).fetchall(), None)
        if srows != orows:
            failures.append((qi, sql, srows[:3], orows[:3]))
    assert not failures, failures
