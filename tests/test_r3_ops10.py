"""Unit tests for the q187-q190 families (driver_queries_ext13):
rolling OLS vs per-window python refits, ABC classification vs a
python re-rank, gap ranges vs a python scan, and the WMA algebraic
identity vs the W-lag brute force."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext13 import (
    ABC_A_PCT,
    ABC_B_PCT,
    GAP_SHARD,
    ROLL_W,
    WMA_DENOM,
    WMA_W,
    q187_rolling_regression,
    q188_abc_classification,
    q189_sequence_gap_ranges,
    q190_weighted_moving_average,
)

SF = "/root/testdata/sf0.001"


def _daily_series(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet")
    c = read_parquet(spark, f"{SF}/customer.parquet")
    n = read_parquet(spark, f"{SF}/nation.parquet")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("y")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r.n_name].append((r.d, r.y))
    for v in series.values():
        v.sort()
    return series


class TestRollingRegression:
    def test_matches_python_per_window_fit(self, spark):
        series = _daily_series(spark)
        got = {
            (r.n_name, r.d): (r.slope_cents_per_day, r.intercept_cents)
            for r in q187_rolling_regression(spark, SF).collect()
        }
        expected_keys = set()
        for name, pts in series.items():
            ys = [y for _, y in pts]
            for t in range(ROLL_W - 1, len(pts)):
                xs = list(range(t - ROLL_W + 2, t + 2))  # k is 1-based
                win = ys[t - ROLL_W + 1 : t + 1]
                m = float(ROLL_W)
                sx = float(sum(xs))
                sy = float(sum(win))
                sxy = float(sum(x * y for x, y in zip(xs, win)))
                sxx = float(sum(x * x for x in xs))
                slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
                inter = (sy - slope * sx) / m
                key = (name, pts[t][0].isoformat())
                expected_keys.add(key)
                g_slope, g_inter = got[key]
                assert abs(g_slope - slope) < 1e-6 * max(1.0, abs(slope))
                assert abs(g_inter - inter) < 1e-6 * max(1.0, abs(inter))
        assert set(got) == expected_keys


class TestAbcClassification:
    def test_matches_python_rerank(self, spark):
        o = read_parquet(spark, f"{SF}/orders.parquet")
        c = read_parquet(spark, f"{SF}/customer.parquet")
        n = read_parquet(spark, f"{SF}/nation.parquet")
        rows = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("n_name", "c_custkey")
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                ).alias("cents")
            )
            .collect()
        )
        per_nation = defaultdict(list)
        for r in rows:
            per_nation[r.n_name].append((r.cents, r.c_custkey))
        expected = defaultdict(lambda: [0, 0])  # (nation, cls) -> [n, cents]
        for name, lst in per_nation.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            total = sum(x for x, _ in lst)
            cum = 0
            for cents, _ in lst:
                cum += cents
                cls = (
                    "A"
                    if cum * 100 <= total * ABC_A_PCT
                    else ("B" if cum * 100 <= total * ABC_B_PCT else "C")
                )
                e = expected[(name, cls)]
                e[0] += 1
                e[1] += cents
        got = {
            (r.n_name, r.abc_class): (r.n_customers, round(r.class_revenue, 2))
            for r in q188_abc_classification(spark, SF).collect()
        }
        assert got == {
            k: (v[0], round(v[1] / 100.0, 2)) for k, v in expected.items()
        }


class TestSequenceGaps:
    def test_matches_python_scan_and_covers_complement(self, spark):
        keys = sorted(
            r.o_orderkey
            for r in read_parquet(spark, f"{SF}/orders.parquet")
            .filter(F.col("o_orderpriority") == GAP_SHARD)
            .select("o_orderkey")
            .distinct()
            .collect()
        )
        expected = []
        for a, b in zip(keys, keys[1:]):
            if b - a > 1:
                expected.append((a + 1, b - 1, b - a - 1))
        got = sorted(
            (r.gap_start, r.gap_end, r.gap_len)
            for r in q189_sequence_gap_ranges(spark, SF).collect()
        )
        assert got == expected
        assert got  # the shard stream genuinely has gaps
        # identity: keys + gap keys tile [min, max] exactly
        assert sum(g[2] for g in got) + len(keys) == keys[-1] - keys[0] + 1


class TestWeightedMovingAverage:
    def test_identity_matches_w_lag_bruteforce(self, spark):
        series = _daily_series(spark)
        got = {
            (r.n_name, r.d): r.wma
            for r in q190_weighted_moving_average(spark, SF).collect()
        }
        expected_keys = set()
        for name, pts in series.items():
            ys = [y for _, y in pts]
            for t in range(WMA_W - 1, len(pts)):
                num = sum(
                    (WMA_W - i) * ys[t - i] for i in range(WMA_W)
                )
                key = (name, pts[t][0].isoformat())
                expected_keys.add(key)
                assert got[key] == num / float(WMA_DENOM) / 100.0
        assert set(got) == expected_keys
