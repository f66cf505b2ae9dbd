"""Round-3 batch-2 operator tests: triangle counting, bounded BFS,
grouped linear regression, and the checksum/chi2/MAD/nearest-join
query kernels — hand examples and brute-force cross-checks."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.operators import graph, stats


class TestTriangleCounts:
    def _counts(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {r.id: r.n_triangles for r in graph.triangle_counts(df).collect()}

    def test_single_triangle(self, spark):
        got = self._counts(spark, [(1, 2), (2, 3), (1, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_k4_every_vertex_in_three_triangles(self, spark):
        edges = [(a, b) for a, b in itertools.combinations(range(4), 2)]
        got = self._counts(spark, edges)
        # K4 has 4 triangles; each vertex participates in C(3,2)=3.
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_path_has_no_triangles(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
        assert graph.triangle_counts(df).count() == 0

    def test_duplicate_and_reversed_edges_ignored(self, spark):
        got = self._counts(
            spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)]
        )
        assert got == {1: 1, 2: 1, 3: 1}

    def test_matches_bruteforce_on_random_graph(self, spark):
        # Deterministic pseudo-random graph from a fixed LCG.
        s, edges = 12345, set()
        for _ in range(120):
            s = (s * 1103515245 + 12345) % (1 << 31)
            a = s % 15
            s = (s * 1103515245 + 12345) % (1 << 31)
            b = s % 15
            if a != b:
                edges.add((min(a, b), max(a, b)))
        expect: dict[int, int] = {}
        for u, v, w in itertools.combinations(sorted({x for e in edges for x in e}), 3):
            if ((u, v) in edges) and ((v, w) in edges) and ((u, w) in edges):
                for x in (u, v, w):
                    expect[x] = expect.get(x, 0) + 1
        got = self._counts(spark, sorted(edges))
        assert got == expect


class TestBfsHops:
    def test_hops_on_path_capped(self, spark):
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        src = spark.createDataFrame([(1,)], "id long")
        got = {r.id: r.hops for r in graph.bfs_hops(e, src, max_hops=3).collect()}
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 unreached within 3 hops

    def test_min_hops_through_cycle(self, spark):
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
        )
        src = spark.createDataFrame([(1,)], "id long")
        got = {r.id: r.hops for r in graph.bfs_hops(e, src, max_hops=3).collect()}
        assert got == {1: 0, 2: 1, 3: 1, 4: 2}


class TestGroupedLinreg:
    def test_exact_line_recovered(self, spark):
        # y = 3x + 50 exactly -> slope 3, intercept 50, r2 == 1.
        rows = [("g", x, 3 * x + 50) for x in range(1, 20)]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        r = stats.grouped_linreg(df, ["g"], "x", "y").collect()[0]
        assert r.n == 19
        assert r.slope == pytest.approx(3.0, abs=1e-12)
        assert r.intercept == pytest.approx(50.0, abs=1e-9)
        assert r.r2 == pytest.approx(1.0, abs=1e-12)

    def test_matches_numpy_polyfit(self, spark):
        import numpy as np

        xs = [3, 7, 11, 19, 23, 31, 37, 41]
        ys = [10, 25, 31, 60, 71, 90, 111, 120]
        df = spark.createDataFrame(
            [("a", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
        )
        r = stats.grouped_linreg(df, ["g"], "x", "y").collect()[0]
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        assert r.slope == pytest.approx(slope, rel=1e-9)
        assert r.intercept == pytest.approx(intercept, rel=1e-9)
        cc = np.corrcoef(xs, ys)[0, 1]
        assert r.r2 == pytest.approx(cc * cc, rel=1e-9)


class TestQueryKernels:
    def test_checksum_detects_single_cell_drift(self, spark):
        from product_analytics_spark.driver_queries_ext3 import q116_table_checksum

        base = q116_table_checksum(spark, "/root/testdata/sf0.001")
        rows = {r.block_id: r for r in base.collect()}
        assert len(rows) == 16
        assert sum(r.n_rows for r in rows.values()) == 1500
        # xor/sum/min/max all deterministic across recomputation
        again = {r.block_id: r for r in q116_table_checksum(spark, "/root/testdata/sf0.001").collect()}
        assert all(
            rows[b].xor60 == again[b].xor60
            and (rows[b].sum_h_hi, rows[b].sum_h_lo)
            == (again[b].sum_h_hi, again[b].sum_h_lo)
            for b in rows
        )

    def test_chi2_contributions_sum_matches_scipy_free_formula(self, spark):
        from product_analytics_spark.driver_queries_ext3 import q119_contingency_chi2

        rows = q119_contingency_chi2(spark, "/root/testdata/sf0.001").collect()
        # expected counts preserve margins: sum(expected) == n
        n = sum(r.n_obs for r in rows)
        assert sum(r.expected for r in rows) == pytest.approx(n, rel=1e-9)
        for r in rows:
            direct = (r.n_obs - r.expected) ** 2 / r.expected
            assert r.chi2_contrib == pytest.approx(direct, rel=1e-9)

    def test_nearest_event_prefers_closer_and_breaks_tie_earlier(self, spark):
        from product_analytics_spark.driver_queries_ext3 import q120_nearest_event_join

        df = spark.createDataFrame(
            [
                (1, 100, "2024-01-01 10:00:00", "purchase"),
                (2, 100, "2024-01-01 10:00:30", "click"),     # prev 30s, next 30s -> tie, prev
                (3, 100, "2024-01-01 10:01:00", "purchase"),
                (4, 100, "2024-01-01 10:02:10", "click"),     # prev 70s, nothing after -> prev
                (5, 200, "2024-01-01 09:00:00", "click"),     # only a later purchase
                (6, 200, "2024-01-01 09:05:00", "purchase"),
                (7, 300, "2024-01-01 09:00:00", "click"),     # no purchase at all -> dropped
            ],
            "event_id long, user_id long, ts string, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "events.parquet")
            df.write.parquet(path)
            got = {r.click_id: r for r in q120_nearest_event_join(spark, tmp).collect()}
        assert got[2].purchase_id == 1 and got[2].direction == "before"
        assert got[4].purchase_id == 3 and got[4].gap_us == 70_000_000
        assert got[5].purchase_id == 6 and got[5].direction == "after"
        assert 7 not in got


class TestBatch3Kernels:
    def test_weighted_median_hand_example(self, spark):
        import os
        import tempfile

        from product_analytics_spark.driver_queries_ext4 import q131_weighted_median

        # group A: prices 1,2,9 weights 1,1,1 -> median 2
        # group B: price 5 w=1, price 7 w=10 -> weighted median 7
        rows = [
            ("A", 1.0, 1.0, 1), ("A", 2.0, 1.0, 2), ("A", 9.0, 1.0, 3),
            ("B", 5.0, 1.0, 4), ("B", 7.0, 10.0, 5),
        ]
        df = spark.createDataFrame(
            rows, "l_returnflag string, l_extendedprice double, l_quantity double, i long"
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "lineitem.parquet"))
            got = {r.l_returnflag: r for r in q131_weighted_median(spark, tmp).collect()}
        assert got["A"].weighted_median_price == 2.0
        assert got["B"].weighted_median_price == 7.0
        assert got["B"].total_weight == 11

    def test_ema_first_event_is_value_and_weights_decay(self, spark):
        import os
        import tempfile

        from product_analytics_spark.driver_queries_ext4 import q129_ema_smoothing

        rows = [
            (1, 1, "2024-01-01 00:00:00", 100.0),
            (2, 1, "2024-01-01 00:01:00", 200.0),
        ]
        df = (
            spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "events.parquet"))
            got = {r.event_id: r.ema_value for r in q129_ema_smoothing(spark, tmp).collect()}
        assert got[1] == 100.0                      # no history -> the value itself
        # dyadic decay, exact in the engine's fixed op order (cents,
        # then one division, then /100)
        assert got[2] == ((20000.0 + 0.5 * 10000.0) / 1.5) / 100.0

    def test_column_profile_counts_nulls_and_distincts(self, spark):
        import os
        import tempfile

        from product_analytics_spark.driver_queries_ext4 import q130_column_profile

        rows = [
            (1, 10, "O", "1-URGENT", 5.0, "2024-01-01 00:00:00"),
            (2, 10, None, "2-HIGH", 6.0, "2024-01-02 00:00:00"),
            (3, 20, "F", "2-HIGH", 7.0, "2024-01-02 00:00:00"),
        ]
        df = (
            spark.createDataFrame(
                rows,
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_orderpriority string, o_totalprice double, o_orderdate string",
            )
            .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "orders.parquet"))
            got = {r.column_name: r for r in q130_column_profile(spark, tmp).collect()}
        assert got["o_orderstatus"].n_null == 1
        assert got["o_orderstatus"].n_distinct == 2
        assert got["o_custkey"].n_distinct == 2
        assert got["o_totalprice_cents"].min_v == "500"
        assert got["o_orderdate_day"].max_v == "2024-01-02"


class TestVersionedMerge:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, ts long, v string")

    def test_stale_batch_does_not_clobber(self, spark):
        from product_analytics_spark.operators.incremental import (
            merge_upsert_versioned,
        )

        snap = self._df(spark, [(1, 10, "new"), (2, 5, "cur")])
        stale = self._df(spark, [(1, 3, "old"), (3, 1, "ins")])
        got = {
            r.id: (r.ts, r.v)
            for r in merge_upsert_versioned(
                snap, stale, key="id", ts_col="ts", tiebreak_col="id"
            ).collect()
        }
        assert got == {1: (10, "new"), 2: (5, "cur"), 3: (1, "ins")}

    def test_batch_order_does_not_matter(self, spark):
        from product_analytics_spark.operators.incremental import (
            merge_upsert_versioned,
        )

        base = self._df(spark, [(1, 1, "a"), (2, 1, "a")])
        b1 = self._df(spark, [(1, 5, "b1"), (3, 2, "b1")])
        b2 = self._df(spark, [(1, 3, "b2"), (2, 9, "b2")])

        def apply(s, batches):
            for b in batches:
                s = merge_upsert_versioned(s, b, key="id", ts_col="ts", tiebreak_col="id")
            return {(r.id, r.ts, r.v) for r in s.collect()}

        assert apply(base, [b1, b2]) == apply(base, [b2, b1])
        # replaying a batch is a no-op
        assert apply(base, [b1, b2, b1]) == apply(base, [b1, b2])
