"""Unit tests for the q173-q175 families (driver_queries_ext10):
prefix filtering vs brute-force all-pairs (no false negatives), the
pandas UDAF vs its builtin twin, KWIC snippet structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_analytics_spark import cache
from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext10 import (
    KWIC_TERM,
    KWIC_WINDOW,
    PPJOIN_T_DEN,
    PPJOIN_T_NUM,
    q173_prefix_similarity_join,
    q174_udaf_door,
    q175_kwic_snippets,
)

SF = "/root/testdata/sf0.001"


class TestPrefixSimilarityJoin:
    def test_matches_bruteforce_all_pairs(self, spark):
        docs = read_parquet(spark, f"{SF}/documents.parquet").collect()
        sets = {
            r.doc_id: {t for t in r.text.strip().lower().split() if t}
            for r in docs
        }
        ids = sorted(sets)
        expected = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                uni = len(sets[a] | sets[b])
                if inter * PPJOIN_T_DEN >= uni * PPJOIN_T_NUM:
                    expected[(a, b)] = (inter, uni)
        got = {
            (r.id_a, r.id_b): (r.n_common, r.n_union)
            for r in q173_prefix_similarity_join(spark, SF).collect()
        }
        cache.clear_all()
        # prefix filtering is EXACT: no false negatives, no extras
        assert got == expected


class TestUdafDoor:
    def test_equals_builtin_percentile(self, spark):
        got = {
            r.o_orderpriority: r.median_price
            for r in q174_udaf_door(spark, SF).collect()
        }
        o = read_parquet(spark, f"{SF}/orders.parquet").select(
            "o_orderpriority",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("c"),
        )
        builtin = {
            r.o_orderpriority: r.med
            for r in o.groupBy("o_orderpriority")
            .agg((F.percentile("c", F.lit(0.5)) / 100.0).alias("med"))
            .collect()
        }
        assert got == builtin


class TestKwicSnippets:
    def test_snippets_centered_and_bounded(self, spark):
        rows = q175_kwic_snippets(spark, SF).collect()
        assert rows
        for r in rows:
            toks = r.snippet.split(" ")
            assert KWIC_TERM in toks
            assert len(toks) <= 2 * KWIC_WINDOW + 1
