"""Distribution-statistics operators (operators/stats.py) plus the
round-3 additions: edit-distance pairs, event transitions, snapshot
diff, bigram counts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from product_analytics_spark.operators import corpus, incremental, product_metrics, stats, text


class TestGroupedMoments:
    def test_known_moments(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)], ["g", "v"]
        )
        rows = {r.g: r for r in stats.grouped_moments(df, ["g"], "v").collect()}
        a = rows["a"]
        assert a.n == 3
        assert math.isclose(a.mean, 2.0)
        assert math.isclose(a.var_pop, 2.0 / 3.0)
        assert math.isclose(a.stddev_pop, math.sqrt(2.0 / 3.0))
        assert abs(a.skewness) < 1e-12  # symmetric
        b = rows["b"]
        assert b.n == 1 and b.var_pop == 0.0 and b.skewness == 0.0

    def test_skew_sign(self, spark):
        # Right-tailed data -> positive skewness.
        df = spark.createDataFrame([("a", float(v)) for v in (1, 1, 1, 10)], ["g", "v"])
        r = stats.grouped_moments(df, ["g"], "v").first()
        assert r.skewness > 0


class TestModePerGroup:
    def test_mode_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [("g1", "x"), ("g1", "x"), ("g1", "y"),
             ("g2", "b"), ("g2", "a")],  # tie: a and b both count 1 -> 'a'
            ["g", "v"],
        )
        rows = {r.g: r for r in stats.mode_per_group(df, ["g"], "v").collect()}
        assert rows["g1"].mode_value == "x" and rows["g1"].mode_count == 2
        assert rows["g2"].mode_value == "a" and rows["g2"].mode_count == 1


class TestEquidepthBins:
    def test_uniform_quartiles(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
        rows = {r.bin: r for r in stats.equidepth_bins(df, "v", n_bins=4).collect()}
        assert sorted(rows) == [1, 2, 3, 4]
        assert all(rows[b].n_rows == 25 for b in rows)
        assert rows[1].min_v == 1.0 and rows[4].max_v == 100.0


class TestGroupedTopkConcat:
    def test_order_and_k(self, spark):
        df = spark.createDataFrame(
            [("g", 3.0, 1, "c"), ("g", 9.0, 2, "a"), ("g", 5.0, 3, "b"),
             ("g", 9.0, 4, "d")],
            ["grp", "score", "id", "name"],
        )
        r = stats.grouped_topk_concat(
            df, ["grp"], order_col="score", tiebreak_col="id", label_col="name", k=3
        ).first()
        # 9.0/id2 -> a, 9.0/id4 -> d, 5.0 -> b
        assert r.top_labels == "a,d,b"
        assert r.n_in_group == 3


class TestEditDistancePairs:
    def test_blocked_distances(self, spark):
        df = spark.createDataFrame(
            [(1, "blk1", "kitten"), (2, "blk1", "sitting"), (3, "blk2", "kitten")],
            ["id", "blk", "name"],
        )
        rows = text.edit_distance_pairs(
            df, text_col="name", id_col="id", block_cols=("blk",), max_dist=5, k=10
        ).collect()
        # Cross-block pair (1,3) never generated despite distance 0.
        assert [(r.id_a, r.id_b, r.edit_dist) for r in rows] == [(1, 2, 3)]


class TestEventTransitions:
    def test_counts_and_probs(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "a"), (2, 2, "c")],
            ["user_id", "event_id", "event_type"],
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(mins=F.col("event_id")))
        rows = {
            (r.event_type, r.next_event_type): r
            for r in product_metrics.event_transitions(df).collect()
        }
        assert rows[("a", "b")].n_transitions == 1
        assert rows[("a", "c")].n_transitions == 1
        assert rows[("b", "a")].n_transitions == 1
        assert math.isclose(rows[("a", "b")].p_transition, 0.5)
        assert math.isclose(rows[("b", "a")].p_transition, 1.0)


class TestSnapshotDiff:
    def test_all_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (5, None, 5.0)],
            ["k", "t", "v"],
        )
        new = spark.createDataFrame(
            [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0), (5, None, 5.0)],
            ["k", "t", "v"],
        )
        rows = {
            r.k: r.status
            for r in incremental.snapshot_diff(old, new, ["k"], ["t", "v"]).collect()
        }
        assert rows == {
            1: "removed", 2: "unchanged", 3: "changed", 4: "added",
            5: "unchanged",  # null-safe compare: NULL == NULL
        }


class TestBigramCounts:
    def test_counts_and_order(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
        )
        rows = [
            (r.token_a, r.token_b, r.n)
            for r in corpus.bigram_counts(df, min_count=1, k=10).collect()
        ]
        assert rows[0] == ("a", "b", 3)
        assert ("b", "a", 1) in rows and ("b", "c", 1) in rows


class TestAsofForward:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (1, "2024-01-05 10:00:00"), (2, "2024-01-01 00:00:00")],
            ["k", "ts"],
        ).withColumn("ts", F.to_timestamp("ts"))
        right = spark.createDataFrame(
            [(1, "2024-01-02 10:00:00", 5.0), (1, "2024-01-01 10:00:00", 7.0)],
            ["k", "r_ts", "v"],
        ).withColumn("r_ts", F.to_timestamp("r_ts"))
        return left, right

    def test_forward_inclusive_and_tolerance(self, spark):
        from product_analytics_spark.operators.joins import asof_join

        left, right = self._frames(spark)
        out = {
            (r.k, str(r.ts)): (r.r_ts_asof, r.v_asof)
            for r in asof_join(
                left, right, ["k"], "ts", "r_ts", ["v"],
                direction="forward", tolerance="24 HOURS",
            ).collect()
        }
        # Equal ts matches (inclusive); 01-05 row has no following
        # purchase; k=2 has no right rows at all.
        assert out[(1, "2024-01-01 10:00:00")][1] == 7.0
        assert out[(1, "2024-01-05 10:00:00")] == (None, None)
        assert out[(2, "2024-01-01 00:00:00")] == (None, None)

    def test_backward_tolerance_nulls_far_match(self, spark):
        from product_analytics_spark.operators.joins import asof_join

        left, right = self._frames(spark)
        out = {
            (r.k, str(r.ts)): r.v_asof
            for r in asof_join(
                left, right, ["k"], "ts", "r_ts", ["v"],
                direction="backward", tolerance="24 HOURS",
            ).collect()
        }
        # 01-05 left row's nearest preceding right is 01-02 — outside 24h.
        assert out[(1, "2024-01-05 10:00:00")] is None
        assert out[(1, "2024-01-01 10:00:00")] == 7.0


class TestKeyedIntervalJoin:
    def test_key_isolation(self, spark):
        from product_analytics_spark.operators.joins import interval_join

        pts = spark.createDataFrame(
            [(1, "2024-01-01 12:00:00", "p1"), (2, "2024-01-01 12:00:00", "p2")],
            ["k", "pts", "pid"],
        ).withColumn("pts", F.to_timestamp("pts"))
        iv = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "i1")],
            ["k", "s", "e", "iid"],
        ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
        rows = interval_join(
            pts, iv, "pts", "s", "e", bucket="1 day", key_cols=("k",)
        ).collect()
        # p2 is inside i1's time range but has a different key.
        assert [(r.pid, r.iid) for r in rows] == [("p1", "i1")]


class TestAttributionAndRollingDistinct:
    def test_first_touch(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "click", "2024-01-01 00:00:00"),
             (1, 2, "click", "2024-01-02 00:00:00"),
             (1, 3, "purchase", "2024-01-03 00:00:00"),
             (2, 4, "purchase", "2024-01-03 00:00:00")],
            ["user_id", "event_id", "event_type", "ts"],
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = {
            r.conv_event_id: r
            for r in product_metrics.first_touch_attribution(
                df, touch_type="click", conversion_type="purchase", window_days=7
            ).collect()
        }
        assert rows[3].first_touch_event_id == 1 and rows[3].attributed
        assert rows[4].first_touch_event_id is None and not rows[4].attributed

    def test_rolling_distinct(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 05:00:00"), (2, "2024-01-01 06:00:00"),
             (1, "2024-01-03 05:00:00")],
            ["user_id", "ts"],
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = {
            str(r.day): (r.dau, r.rolling_7d)
            for r in product_metrics.rolling_distinct_users(df).collect()
        }
        assert rows["2024-01-01 00:00:00"] == (2, 2)
        # Day 3: DAU 1 (user 1), rolling window covers both days -> 2.
        assert rows["2024-01-03 00:00:00"] == (1, 2)
