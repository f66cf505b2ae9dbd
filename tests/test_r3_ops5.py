"""Unit tests for the q165-q169 families (driver_queries_ext8):
skyline vs brute force, Gini vs a Python reference, seasonal-index
closure, scaler moments, stream-static parity vs the batch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext8 import (
    q165_pareto_frontier,
    q166_gini_concentration,
    q167_seasonal_index,
    q168_zscore_standardize,
    q169_stream_static_join_parity,
)

SF = "/root/testdata/sf0.001"


def _per_customer(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    n = read_parquet(spark, f"{SF}/nation.parquet")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).alias("x"),
            F.count(F.lit(1)).alias("y"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "x", "y")
        .collect()
    )


class TestParetoFrontier:
    def test_matches_bruteforce_dominance(self, spark):
        pts = _per_customer(spark)
        by_nation: dict[str, list] = {}
        for r in pts:
            by_nation.setdefault(r.n_name, []).append(r)
        expected = set()
        for nation, rows in by_nation.items():
            for p in rows:
                dominated = any(
                    q.x >= p.x and q.y >= p.y and (q.x > p.x or q.y > p.y)
                    for q in rows
                )
                if not dominated:
                    expected.add((nation, p.o_custkey))
        got = {
            (r.n_name, r.o_custkey)
            for r in q165_pareto_frontier(spark, SF).collect()
        }
        assert got == expected


class TestGini:
    def test_matches_python_reference(self, spark):
        pts = _per_customer(spark)
        vals = sorted(r.x for r in pts if r.n_name == pts[0].n_name)
        n, s = len(vals), sum(vals)
        t = sum((i + 1) * v for i, v in enumerate(vals))
        ref = 2.0 * t / (n * s) - (n + 1.0) / n
        row = {
            r.n_name: r for r in q166_gini_concentration(spark, SF).collect()
        }[pts[0].n_name]
        assert abs(row.gini - ref) < 1e-5
        assert 0.0 <= row.gini < 1.0
        # the top decile holds at least its uniform share
        assert row.top_decile_share >= 0.1 - 1e-9


class TestSeasonalIndex:
    def test_weighted_index_closes_to_one(self, spark):
        rows = q167_seasonal_index(spark, SF).collect()
        assert len(rows) == 12
        tot = sum(r.n_periods for r in rows)
        wavg = sum(r.seasonal_index * r.n_periods for r in rows) / tot
        assert abs(wavg - 1.0) < 1e-4


class TestZscore:
    def test_group_moments_standardized(self, spark):
        df = q168_zscore_standardize(spark, SF)
        m = (
            df.groupBy("l_returnflag")
            .agg(
                F.avg("price_z").alias("mu"),
                F.stddev_pop("price_z").alias("sd"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in m:
            assert abs(r.mu) < 1e-4
            assert abs(r.sd - 1.0) < 1e-4


class TestStreamStaticParity:
    def test_equals_batch_plan(self, spark):
        got = {
            r.n_name: (r.n_events, r.total_value)
            for r in q169_stream_static_join_parity(spark, SF).collect()
        }
        e = read_parquet(spark, f"{SF}/events.parquet")
        c = read_parquet(spark, f"{SF}/customer.parquet")
        n = read_parquet(spark, f"{SF}/nation.parquet")
        batch = (
            e.join(c, F.col("c_custkey") == F.col("user_id"))
            .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(
                        (F.col("value").cast("decimal(18,2)") * 100).cast("long")
                    )
                    / 100.0
                ).alias("total_value"),
            )
            .collect()
        )
        assert got == {r.n_name: (r.n_events, r.total_value) for r in batch}
