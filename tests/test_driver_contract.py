"""Driver-contract invariants.

The external driver's correctness gate checks the FIRST 50 keys of
``queries()`` (its check window) — those keys are the canonical
SURVEY §2 evidence set, so they must never rotate out of the head
positions when new query families are appended. This is pure
dict-ordering logic; no SparkSession is needed.
"""

from __future__ import annotations

from product_analytics_spark.driver_queries import QUERIES

# Frozen canonical head: the driver's q01-q50 check window. Append new
# queries AFTER these; renaming or reordering any of them silently
# changes what the driver verifies.
CANONICAL_HEAD = [
    "q01_scan_project",
    "q02_filter_predicates",
    "q03_dedup_latest",
    "q04_case_canonicalize",
    "q05_financial_clamp",
    "q06_string_validate",
    "q07_date_enrich",
    "q08_datediff_metrics",
    "q09_left_join_validate",
    "q10_group_metrics",
    "q11_rfm_scores",
    "q12_multi_join_dim",
    "q13_watermark_filter",
    "q14_first_seen_backfill",
    "q15_quality_score",
    "q16_geo_mapping",
    "q17_incremental_merge",
    "q18_json_extract",
    "q19_exact_dedup",
    "q20_fuzzy_dedup",
    "q21_similarity_topk",
    "q22_text_stats",
    "q23_sessionize",
    "q24_tumbling_window_agg",
    "q25_simhash_near_dup",
    "q26_ngram_jaccard_pairs",
    "q27_embedding_near_dup",
    "q28_lsh_bucket_topk",
    "q29_language_id",
    "q30_text_quality",
    "q31_fingerprint_groups",
    "q32_multimodal_features",
    "q33_rollup_agg",
    "q34_topk_per_group",
    "q35_asof_join",
    "q36_sliding_window_agg",
    "q37_set_ops",
    "q38_pivot_counts",
    "q39_ivf_ann_topk",
    "q40_snapshot_merge_write",
    "q41_percentiles",
    "q42_running_and_moving_agg",
    "q43_cube_agg",
    "q44_semi_anti_join",
    "q45_unpivot_long",
    "q46_histogram",
    "q47_data_quality_report",
    "q48_scd2_history",
    "q49_train_test_split",
    "q50_stratified_sample",
]


class TestDriverContract:
    def test_check_window_head_is_stable(self):
        assert list(QUERIES)[: len(CANONICAL_HEAD)] == CANONICAL_HEAD

    def test_every_query_has_unique_prefix(self):
        # qNNN prefixes are the bench/correctness join key — collisions
        # would silently merge two queries' timings.
        prefixes = [k.split("_", 1)[0] for k in QUERIES]
        assert len(prefixes) == len(set(prefixes))

    def test_oracles_cover_queries(self):
        import __spark_entry__ as entry

        oracles = entry.oracle_sql()
        missing = [k for k in oracles if k not in QUERIES]
        assert not missing, f"oracle keys without a query: {missing}"
