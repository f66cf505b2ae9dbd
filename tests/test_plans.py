"""Physical-plan regression guards (SURVEY.md §4, SCALE.md).

The 100 TB story rests on plan properties, not hopes: filters reach
the parquet scan, dimension joins broadcast, CDC dedup combines
map-side, top-k never globally sorts, and nothing ever degenerates
into a cartesian product or a row-at-a-time Python eval. These tests
pin those properties so a refactor that silently regresses the plan
fails CI, not the cluster.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from product_analytics_spark import cache
from product_analytics_spark.driver_queries import QUERIES
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in QUERIES.items():
        out[name] = _plan(fn(spark, SF_SMALL))
        cache.clear_all()
    return out


class TestPlanProperties:
    def test_filters_push_down_to_parquet_scan(self, plans):
        p = plans["q02_filter_predicates"]
        assert "PushedFilters" in p
        assert "GreaterThan(o_totalprice,1000.0)" in p.replace(" ", "")

    def test_dimension_joins_broadcast(self, plans):
        # Fact side must not shuffle for dim joins (q09 validation
        # join, q44 existence joins).
        assert "BroadcastHashJoin" in plans["q09_left_join_validate"]
        p44 = plans["q44_semi_anti_join"]
        assert "LeftSemi" in p44 and "LeftAnti" in p44
        assert "SortMergeJoin" not in p44

    def test_cdc_dedup_combines_map_side(self, plans):
        # max_by partial aggregation before the Exchange: the shuffle
        # moves ~|keys| rows, not |events|.
        assert "partial_max_by" in plans["q03_dedup_latest"]

    def test_topk_has_no_global_sort(self, plans):
        assert "TakeOrderedAndProject" in plans["q21_similarity_topk"]

    def test_analytic_windows_share_one_shuffle(self, plans):
        p = plans["q42_running_and_moving_agg"]
        # One hash-partition Exchange feeds all three window functions.
        assert p.count("+- Exchange") == 1

    def test_grouping_sets_expand_map_side(self, plans):
        for q in ("q33_rollup_agg", "q43_cube_agg"):
            p = plans[q]
            assert "Expand" in p
            assert p.count("+- Exchange") == 1

    def test_no_cartesian_products_anywhere(self, plans):
        for name, p in plans.items():
            assert "CartesianProduct" not in p, name
            assert "BroadcastNestedLoopJoin" not in p, name

    def test_no_row_at_a_time_python_anywhere(self, plans):
        # Arrow-batched Python (MapInPandas / ArrowEvalPython) is the
        # only allowed Python boundary; pickled row UDFs are banned.
        for name, p in plans.items():
            assert "BatchEvalPython" not in p, name

    def test_cogroup_boundary_only_where_declared(self, plans):
        cogroup_users = {
            name for name, p in plans.items() if "FlatMapCoGroupsInPandas" in p
        }
        assert cogroup_users <= {"q246_cogroup_reconciliation"}, cogroup_users

    def test_python_boundary_only_where_declared(self, plans):
        arrow_users = {
            name for name, p in plans.items() if "MapInPandas" in p
        }
        assert arrow_users <= {
            "q27_embedding_near_dup",
            "q32_multimodal_features",
            "q39_ivf_ann_topk",
            "q61_kmeans_update",
            "q85_knn_join",
            "q99_mutual_nn",
            "q192_knn_vote_accuracy",  # rides q85's Arrow kNN kernel
            "q207_triplet_mining",  # rides the same Arrow kNN kernel
        }, arrow_users

    def test_split_assignment_adds_no_shuffle(self, plans):
        # q49's split column is a pure per-row hash expression; the
        # only Exchange is the final (split, lang) aggregation.
        assert plans["q49_train_test_split"].count("+- Exchange") == 1

    def test_scd2_windows_share_one_shuffle(self, plans):
        # lag/row_number + lead both partition on user_id: ONE
        # Exchange serves both window passes.
        assert plans["q48_scd2_history"].count("+- Exchange") == 1

    def test_stratified_sample_windows_share_one_shuffle(self, plans):
        assert plans["q50_stratified_sample"].count("+- Exchange") == 1

    def test_chunking_and_masking_are_narrow(self, plans):
        # Chunking (sequence+posexplode+slice) and PII masking
        # (regexp_replace chain) must stay shuffle-free.
        assert "Exchange" not in plans["q53_doc_chunking"]
        assert "Exchange" not in plans["q52_pii_mask"]

    def test_vocab_topk_never_globally_sorts(self, plans):
        p = plans["q51_vocab_topk"]
        assert "TakeOrderedAndProject" in p
        assert "Generate" in p  # explode stays in-plan, map-side

    def test_salted_agg_is_two_stage(self, plans):
        # The whole point: (key, salt) partial stage then key merge
        # stage — exactly two Exchanges, each a hash aggregation.
        assert plans["q55_salted_skew_agg"].count("+- Exchange") == 2


class TestTpchPlans:
    """The canonical TPC-H shapes must keep their canonical plans."""

    def test_q1_single_shuffle_with_partial_agg(self, plans):
        p = plans["q250_tpch_q1_pricing_summary"]
        assert "partial_sum" in p
        assert p.count("+- Exchange") == 1

    def test_q5_star_join_all_broadcast(self, plans):
        # The fact table must never shuffle before the final nation
        # aggregation: every join broadcasts its dim side.
        p = plans["q252_tpch_q5_local_supplier"]
        assert "SortMergeJoin" not in p
        assert p.count("BroadcastHashJoin") >= 4
        assert p.count("+- Exchange") == 1

    def test_q6_pushdown_no_prefilter_shuffle(self, plans):
        p = plans["q251_tpch_q6_revenue_forecast"]
        assert "PushedFilters" in p
        assert "SortMergeJoin" not in p

    def test_q4_exists_decorellates_to_semi_join(self, plans):
        # The correlated EXISTS must become a semi join (no row
        # amplification, no DISTINCT), with the quarter filter pushed
        # to the orders scan.
        p = plans["q322_tpch_q4_order_priority"]
        assert "LeftSemi" in p
        assert "CartesianProduct" not in p
        assert "PushedFilters" in p

    def test_q19_single_pass_disjunction(self, plans):
        # The OR-of-conjuncts must stay ONE broadcast-join pass with a
        # residual predicate — not expand into three scan-unions.
        p = plans["q339_tpch_q19_discounted_revenue"]
        # formatted explain mentions each scan twice (tree + details):
        # 2 mentions x (lineitem + part) = 4; a 3-way scan-union
        # expansion would show more.
        assert p.count("Scan parquet") == 4
        assert "BroadcastHashJoin" in p
        assert "Union" not in p

    def test_q2_window_min_broadcast_dims(self, plans):
        p = plans["q333_tpch_q2_min_cost_supplier"]
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
        assert "TakeOrderedAndProject" in p  # spec ordering + LIMIT 100

    def test_q21_one_order_shuffle_broadcast_dims(self, plans):
        # EXISTS/NOT-EXISTS pair rides ONE per-order aggregate; the
        # supplier/nation restriction broadcasts; nothing degenerates
        # into a nested-loop join.
        p = plans["q323_tpch_q21_waiting_supplier"]
        assert "BroadcastHashJoin" in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        # spec ordering with LIMIT never global-sorts
        assert "TakeOrderedAndProject" in p


class TestRound4Plans:
    def test_velocity_rules_share_one_shuffle(self, plans):
        # Both RANGE-frame rule windows and the final per-user agg ride
        # the single user-keyed Exchange.
        assert plans["q279_velocity_rules"].count("+- Exchange") == 1

    def test_dwell_lead_reuses_session_sort(self, plans):
        # sessionize's lag/cumsum windows AND the dwell lead() all
        # partition on user_id and share ONE Exchange (three Window
        # nodes over one Sort); the remaining two Exchanges are the
        # event_type aggregation and the 5-row share window.
        p = plans["q272_dwell_time_allocation"]
        assert p.count("+- Exchange") == 3
        # Three stacked Window nodes ride the single user sort.
        assert p.count("+- Window") >= 3


class TestRound5Plans:
    def test_bucketed_layout_erases_agg_shuffle(self, plans):
        # q360 aggregates (incl. a count-distinct, normally TWO hash
        # exchanges) over the user_id-bucketed table: the scan reports
        # its bucketing, so the whole aggregate runs exchange-free.
        # The single remaining Exchange is the deterministic-output
        # orderBy's rangepartitioning over |users| post-agg rows.
        p = plans["q360_bucketed_layout"]
        assert "Bucketed: true" in p
        assert "hashpartitioning" not in p
        assert p.count("+- Exchange") == 1
        assert "rangepartitioning" in p

    def test_approx_top_k_is_a_mergeable_partial_agg(self, plans):
        # q366: the space-saving sketch partial-aggregates map-side —
        # the one Exchange moves per-partition sketches, never raw
        # item keys; no other shuffle exists in the plan.
        p = plans["q366_approx_top_k"]
        assert "partial_approx_top_k" in p
        assert p.count("+- Exchange") == 1

    def test_bitmap_distinct_shuffles_bitmaps_not_keys(self, plans):
        # q365: ONE corpus pass — GROUPING SETS expands to both levels
        # before the map-side partial bitmap construction, the global
        # rollup attaches by whole-relation window (no join node of
        # any kind), and exactly one Exchange touches corpus-derived
        # rows (the bitmap shuffle; the rest sit on |priorities| rows).
        p = plans["q365_bitmap_distinct"]
        assert "partial_bitmap_construct_agg" in p
        assert "Expand" in p
        assert "Join" not in p
        assert p.count("Scan parquet") <= 2  # one scan: tree + detail

    def test_bloom_filter_join_prunes_at_the_scan(self, plans):
        # q371: the runtime bloom filter must reach the fact scan —
        # a bloom_filter_agg subquery on the filtered dim side and a
        # might_contain predicate on the orders side; and the conf
        # scoping must have pinned it into the CACHED plan (this
        # fixture explains AFTER the builder restored the confs).
        p = plans["q371_bloom_filter_join"]
        assert "bloom_filter_agg" in p
        assert "might_contain" in p

    def test_cluster_by_distribution_is_reused_by_the_agg(self, plans):
        # q375: CLUSTER BY compiles to a REPARTITION_BY_COL hash
        # Exchange; the aggregate (count-distinct included — normally
        # TWO extra exchanges) REUSES that distribution, so the only
        # other Exchange is the deterministic orderBy's range
        # partition. The clause's partition-local sort is correctly
        # DROPPED by EliminateSorts under an aggregate.
        p = plans["q375_cluster_by_door"]
        assert "hashpartitioning(user_id" in p
        assert "REPARTITION_BY_COL" in p
        assert p.count("+- Exchange") == 2
        assert "rangepartitioning" in p


class TestRound7Plans:
    def test_advised_cobucket_join_is_exchange_free(self, plans):
        # q393: LAYOUT_ADVICE.json's custkey bucketing applied to BOTH
        # join sides with the same bucket count — the merge join and
        # the per-custkey aggregate both ride the bucket partitioning,
        # so the ONLY Exchange in the plan is the deterministic
        # orderBy's range partitioning over post-agg rows.
        p = plans["q393_advised_cobucket_join"]
        assert p.count("Bucketed: true") == 2
        assert "SortMergeJoin" in p
        assert "hashpartitioning" not in p
        assert p.count("+- Exchange") == 1
        assert "rangepartitioning" in p

    def test_advised_partition_prune_reaches_the_scan(self, plans):
        # q394: the event_type filter over the hive-partitioned
        # snapshot must prune DIRECTORIES (PartitionFilters), not rows
        # (PushedFilters) — the scan lists 1 of the 5 type dirs.
        p = plans["q394_advised_partition_prune"]
        assert "PartitionFilters" in p
        assert "purchase" in p
