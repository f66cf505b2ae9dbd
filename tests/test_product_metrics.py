"""Funnel + cohort-retention operator semantics on hand-built events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.operators import product_metrics

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(hours=h), u, e) for i, (h, u, e) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


class TestFunnel:
    def test_greedy_walk_and_window(self, spark):
        rows = [
            # u1 completes a->b->c in order, inside 2h windows.
            (0.0, 1, "a"), (1.0, 1, "b"), (2.5, 1, "c"),
            # u2: b BEFORE a never counts; no b after a -> depth 1.
            (0.0, 2, "b"), (1.0, 2, "a"),
            # u3: b arrives 3h after a -> outside the 2h window, and
            # greedy does NOT retry from u3's later a (there is none).
            (0.0, 3, "a"), (3.0, 3, "b"),
            # u4 never emits a -> depth 0 (b alone cannot start).
            (0.0, 4, "b"), (1.0, 4, "c"),
        ]
        out = product_metrics.funnel_counts(
            _ev(spark, rows), ["a", "b", "c"], max_step_gap_hours=2
        )
        got = {r["step"]: r["n_users"] for r in out.collect()}
        assert got == {"a": 3, "b": 1, "c": 1}

    def test_zero_conversion_steps_report_zero(self, spark):
        out = product_metrics.funnel_counts(
            _ev(spark, [(0.0, 1, "a")]), ["a", "b", "c"]
        )
        assert [(r["step_idx"], r["n_users"]) for r in out.orderBy("step_idx").collect()] == [
            (1, 1), (2, 0), (3, 0),
        ]

    def test_same_timestamp_tiebreak_by_event_id(self, spark):
        # b at the SAME timestamp as a, larger event_id: sorted after
        # a, so it advances the funnel (matches the oracle's
        # (ts, event_id) tuple comparison).
        rows = [(0.0, 1, "a"), (0.0, 1, "b")]
        out = product_metrics.funnel_counts(_ev(spark, rows), ["a", "b"])
        got = {r["step"]: r["n_users"] for r in out.collect()}
        assert got == {"a": 1, "b": 1}

    def test_unbounded_window(self, spark):
        rows = [(0.0, 1, "a"), (1000.0, 1, "b")]
        out = product_metrics.funnel_counts(_ev(spark, rows), ["a", "b"])
        assert {r["step"]: r["n_users"] for r in out.collect()} == {"a": 1, "b": 1}

    def test_rejects_single_step(self, spark):
        with pytest.raises(ValueError):
            product_metrics.funnel_counts(_ev(spark, [(0.0, 1, "a")]), ["a"])


class TestCohortRetention:
    def test_matrix(self, spark):
        day = 24.0
        rows = [
            # u1 signs up week0 (Mon Jan 1), purchases week0 and week2.
            (0.0, 1, "signup"), (1.0, 1, "purchase"), (14 * day, 1, "purchase"),
            # u2 signs up week0, never purchases.
            (2.0, 2, "signup"),
            # u3 purchases before signup but within the SAME week —
            # retention is week-granular, so it counts for week 0 —
            # then purchases again in week1.
            (1.0, 3, "purchase"), (2.0, 3, "signup"), (8 * day, 3, "purchase"),
            # u4 never signs up -> excluded entirely.
            (0.0, 4, "purchase"),
        ]
        out = product_metrics.cohort_retention(
            _ev(spark, rows), cohort_event="signup", activity_event="purchase"
        )
        rows_out = {
            (r["week_offset"]): (r["n_active"], r["n_cohort"], r["retention_rate"])
            for r in out.collect()
        }
        # Cohort = week of Jan 1, size 3 (u1,u2,u3).
        assert rows_out[0] == (2, 3, pytest.approx(2 / 3))
        assert rows_out[1] == (1, 3, pytest.approx(1 / 3))
        assert rows_out[2] == (1, 3, pytest.approx(1 / 3))

    def test_duplicate_activity_weeks_count_once(self, spark):
        rows = [(0.0, 1, "signup"), (1.0, 1, "purchase"), (2.0, 1, "purchase")]
        out = product_metrics.cohort_retention(
            _ev(spark, rows), cohort_event="signup", activity_event="purchase"
        )
        assert out.count() == 1
        assert out.first()["n_active"] == 1

    def test_single_shuffle_feeds_cohort_and_activity(self, spark):
        df = _ev(spark, [(0.0, 1, "signup"), (1.0, 1, "purchase")])
        plan = product_metrics.cohort_retention(
            df, "signup", "purchase"
        )._jdf.queryExecution().executedPlan().toString()
        # The per-user aggregation shuffles once; sizes reuse it.
        assert plan.count("Exchange hashpartitioning(user_id") <= 2
