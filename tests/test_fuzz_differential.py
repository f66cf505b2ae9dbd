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
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet')"
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
