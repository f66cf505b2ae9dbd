"""Unit tests for the q202-q203 families (driver_queries_ext18)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext18 import (
    PATH_GAP_MIN,
    PATH_TOPK,
    SLIDE_W,
    q202_sliding_median,
    q203_top_conversion_paths,
)

SF = "/root/testdata/sf0.001"


class TestSlidingMedian:
    def test_matches_python_per_window_median(self, spark):
        o = read_parquet(spark, f"{SF}/orders.parquet")
        c = read_parquet(spark, f"{SF}/customer.parquet")
        n = read_parquet(spark, f"{SF}/nation.parquet")
        daily = (
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
        for r in daily:
            series[r.n_name].append((r.d, r.y))
        got = {
            (r.n_name, r.d): r.rolling_median
            for r in q202_sliding_median(spark, SF).collect()
        }
        expected_keys = set()
        for name, pts in series.items():
            pts.sort()
            ys = [y for _, y in pts]
            for t in range(SLIDE_W - 1, len(pts)):
                win = sorted(ys[t - SLIDE_W + 1 : t + 1])
                lo = win[(SLIDE_W + 1) // 2 - 1]
                hi = win[SLIDE_W // 2]
                key = (name, pts[t][0].isoformat())
                expected_keys.add(key)
                assert got[key] == (lo + hi) / 2.0 / 100.0
        assert set(got) == expected_keys


class TestConversionPaths:
    def test_matches_python_sessionized_paths(self, spark):
        ev = read_parquet(spark, f"{SF}/events.parquet").select(
            "user_id", "ts", "event_id", "event_type"
        ).collect()
        by_user = defaultdict(list)
        for r in ev:
            by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
        paths = Counter()
        import datetime as dt

        gap = dt.timedelta(minutes=PATH_GAP_MIN)
        for rows in by_user.values():
            rows.sort()
            cur, prev_ts = [], None
            for ts, _eid, et in rows:
                if prev_ts is not None and ts > prev_ts + gap:
                    paths[">".join(cur)] += 1
                    cur = []
                cur.append(et)
                prev_ts = ts
            if cur:
                paths[">".join(cur)] += 1
        top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOPK]
        got = [
            (r.path, r.n_sessions, r.conversion_share)
            for r in q203_top_conversion_paths(spark, SF).collect()
        ]
        assert [(p, n) for p, n, _ in got] == top
        for p, n, share in got:
            expected_share = 1.0 if "purchase" in p else 0.0
            # every session with the same path has the same conversion
            assert share == expected_share
