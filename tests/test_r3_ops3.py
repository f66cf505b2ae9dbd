"""Unit tests for the q154-q159 families (driver_queries_ext6):
invariants the DuckDB oracle can't express — sketch guarantees
actually holding, merge-algebra split-invariance, per-doc boilerplate
arithmetic, Benford share closure."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from product_analytics_spark import driver_queries_ext6 as ext6
from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext6 import (
    SEG_TOKENS,
    q154_segment_boilerplate,
    q155_sketch_accuracy,
    q156_cuped_adjustment,
    q157_key_skew_profile,
    q158_agg_state_merge,
    q159_benford_audit,
)

SF = "/root/testdata/sf0.001"


class TestSegmentBoilerplate:
    def test_per_doc_arithmetic_invariants(self, spark):
        rows = q154_segment_boilerplate(spark, SF).collect()
        assert len(rows) == 500
        for r in rows:
            assert 0 <= r.n_boiler <= r.n_segments
            assert r.n_segments == r.n_tokens // SEG_TOKENS
            assert r.kept_tokens == r.n_tokens - r.n_boiler * SEG_TOKENS
            assert 0 <= r.kept_tokens <= r.n_tokens
            if r.n_segments:
                assert abs(r.boiler_share - r.n_boiler / r.n_segments) < 1e-6

    def test_templated_corpus_has_boilerplate(self, spark):
        # The synthetic docs share heavy templates — the screen must
        # actually fire, not vacuously pass with zero boiler segments.
        rows = q154_segment_boilerplate(spark, SF).collect()
        assert sum(r.n_boiler for r in rows) > 0
        assert any(r.kept_tokens < r.n_tokens for r in rows)


class TestSketchAccuracy:
    def test_sketch_guarantees_hold(self, spark):
        rows = q155_sketch_accuracy(spark, SF).collect()
        assert len(rows) == 5
        assert all(r.hll_ok for r in rows)
        assert all(r.pct_ok for r in rows)


class TestCuped:
    def test_population_partition_and_variance_reduced(self, spark):
        rows = q156_cuped_adjustment(spark, SF).collect()
        assert sorted(r.arm for r in rows) == [0, 1]
        # every ordering customer lands in exactly one arm
        n_cust = (
            read_parquet(spark, f"{SF}/orders.parquet")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert sum(r.n_customers for r in rows) == n_cust
        for r in rows:
            # CUPED can't exceed total variance removal. Per-arm it
            # may go slightly negative (theta is the POOLED fit; the
            # guarantee is pooled and in-expectation), but a large
            # negative means the moment algebra is wrong.
            assert r.var_reduction <= 1.0
            assert r.var_reduction > -0.2

    def test_theta_shared_across_arms(self, spark):
        rows = q156_cuped_adjustment(spark, SF).collect()
        assert rows[0].theta == rows[1].theta


class TestKeySkewProfile:
    def test_buckets_cover_all_rows(self, spark):
        rows = q157_key_skew_profile(spark, SF).collect()
        li_rows = read_parquet(spark, f"{SF}/lineitem.parquet").count()
        assert sum(r.n_rows for r in rows) == li_rows
        assert abs(sum(r.row_share for r in rows) - 1.0) < 1e-5
        for r in rows:
            # max freq in band b lies in [2^b, 2^(b+1))
            assert (1 << r.freq_bucket) <= r.max_freq < (1 << (r.freq_bucket + 1))


class TestAggStateMerge:
    def test_merge_is_split_invariant(self, spark):
        base = {
            r.o_orderpriority: r for r in q158_agg_state_merge(spark, SF).collect()
        }
        old_split = ext6.STATE_SPLIT
        try:
            ext6.STATE_SPLIT = dt.datetime(1996, 6, 15)
            other = {
                r.o_orderpriority: r
                for r in q158_agg_state_merge(spark, SF).collect()
            }
        finally:
            ext6.STATE_SPLIT = old_split
        assert base.keys() == other.keys()
        for k in base:
            a, b = base[k], other[k]
            assert (a.n_orders, a.min_price, a.max_price) == (
                b.n_orders,
                b.min_price,
                b.max_price,
            )
            # exact integer sums -> identical doubles, any split point
            assert a.mean_price == b.mean_price
            assert a.var_price == b.var_price


class TestBenford:
    def test_shares_close_and_terms_nonnegative(self, spark):
        rows = q159_benford_audit(spark, SF).collect()
        assert {r.lead_digit for r in rows} <= {str(d) for d in range(1, 10)}
        assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert r.chi2_term >= 0.0
            assert math.isclose(
                r.exp_share,
                math.log10(1 + 1 / int(r.lead_digit)),
                rel_tol=1e-12,
            )
