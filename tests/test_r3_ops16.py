"""Unit tests for the q207-q209 families (driver_queries_ext21)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext21 import (
    TRIPLET_K,
    q207_triplet_mining,
    q208_mixture_weights,
    q209_padding_waste,
)

SF = "/root/testdata/sf0.001"


class TestTripletMining:
    def test_recomputed_from_knn_graph(self, spark):
        from product_analytics_spark import driver_queries as dq
        from product_analytics_spark.operators import similarity

        emb = read_parquet(spark, f"{SF}/embeddings.parquet")
        labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
        knn = similarity.knn_join_ivf(
            emb,
            centroids=similarity.CENTROIDS_FINE,
            k=TRIPLET_K,
            dim=dq.EMBEDDING_DIM,
            cap_per_cell=dq.NEAR_DUP_CAP_PER_CELL,
        ).collect()
        nbs = defaultdict(list)
        for r in knn:
            nbs[r.vec_id].append((r.neighbor_id, r.cosine_sim))
        expected = {}
        for vid, lst in nbs.items():
            lst.sort(key=lambda t: (-t[1], t[0]))
            pos = next(((i, s) for i, s in lst if labels[i] == labels[vid]), None)
            neg = next(((i, s) for i, s in lst if labels[i] != labels[vid]), None)
            if pos and neg:
                expected[vid] = (pos[0], neg[0], pos[1] - neg[1])
        got = {
            r.anchor_id: (r.pos_id, r.neg_id, r.margin)
            for r in q207_triplet_mining(spark, SF).collect()
        }
        assert got == expected
        assert got  # non-trivial output


class TestMixtureWeights:
    def test_matches_python_ordered_sum(self, spark):
        import math

        docs = read_parquet(spark, f"{SF}/documents.parquet").select(
            "lang", "source", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
        counts = defaultdict(int)
        for r in docs:
            counts[(r.lang, r.source)] += r.n
        keys = sorted(counts)
        norm = sum(math.isqrt(counts[k]) for k in keys)  # exact int sum
        total = sum(counts[k] for k in keys)
        got = {
            (r.lang, r.source): (r.tokens, r.weight, r.epochs)
            for r in q208_mixture_weights(spark, SF).collect()
        }
        assert set(got) == set(keys)
        wsum = 0.0
        for k in keys:
            t, w, e = got[k]
            assert t == counts[k]
            assert w == float(math.isqrt(counts[k])) / float(norm)
            assert e == w * float(total) / float(counts[k])
            wsum += w
        assert abs(wsum - 1.0) < 1e-9


class TestPaddingWaste:
    def test_matches_python_buckets(self, spark):
        docs = read_parquet(spark, f"{SF}/documents.parquet").select(
            F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
        expected = defaultdict(lambda: [0, 0, 0])
        for r in docs:
            if r.n <= 0:
                continue
            cap = 1 if r.n == 1 else 1 << (r.n - 1).bit_length()
            e = expected[cap]
            e[0] += 1
            e[1] += r.n
            e[2] += cap - r.n
        got = {
            r.cap: (r.n_docs, r.total_tokens, r.padding_waste, r.utilization)
            for r in q209_padding_waste(spark, SF).collect()
        }
        assert set(got) == set(expected)
        for cap, (nd, tt, pw) in ((k, tuple(v)) for k, v in expected.items()):
            g = got[cap]
            assert g[:3] == (nd, tt, pw)
            assert g[3] == float(tt) / float(nd * cap)


class TestCanonicalDocSelection:
    def test_one_survivor_per_cluster_longest_wins(self, spark):
        from product_analytics_spark.driver_queries_ext22 import (
            q210_canonical_doc_selection,
        )

        rows = q210_canonical_doc_selection(spark, SF).collect()
        by_cluster = defaultdict(list)
        for r in rows:
            by_cluster[r.cluster_id].append(r)
        docs = read_parquet(spark, f"{SF}/documents.parquet")
        assert sum(len(v) for v in by_cluster.values()) == docs.count()
        for cid, members in by_cluster.items():
            keepers = [m for m in members if m.keep]
            assert len(keepers) == 1
            best = min(members, key=lambda m: (-m.n_chars, m.doc_id))
            assert keepers[0].doc_id == best.doc_id
            assert all(m.survivor_id == best.doc_id for m in members)


class TestFilterFunnel:
    def test_monotone_stages_and_totals(self, spark):
        from product_analytics_spark.driver_queries_ext22 import (
            q211_filter_funnel,
        )

        rows = q211_filter_funnel(spark, SF).collect()
        docs = read_parquet(spark, f"{SF}/documents.parquet")
        assert sum(r.n_docs for r in rows) == docs.count()
        for r in rows:
            assert r.n_docs >= r.n_length_ok >= r.n_tokens_ok >= r.n_final >= 0
            assert r.retention == r.n_final / r.n_docs


class TestNullSemanticsProbe:
    def test_three_valued_identities(self, spark):
        from product_analytics_spark.driver_queries_ext23 import (
            q212_null_semantics_probe,
        )

        r = q212_null_semantics_probe(spark, SF).collect()[0]
        assert r.n_not_in_with_null == 0  # the NOT IN trap
        assert r.n_nullsafe_eq_null == r.n_null
        assert r.n_coalesced == r.n_null
        assert r.n_count_col_skips_nulls == r.n_rows - r.n_null
        assert r.n_null > 0 and r.n_eq_f > 0


class TestRoundingSemanticsProbe:
    def test_half_up_everywhere(self, spark):
        from product_analytics_spark.driver_queries_ext23 import (
            q213_rounding_semantics_probe,
        )
        from collections import defaultdict

        cents = [
            r.c
            for r in read_parquet(spark, f"{SF}/orders.parquet")
            .select(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("long")
                .alias("c")
            )
            .collect()
        ]
        expected = defaultdict(lambda: [0, 0])
        for c in cents:
            e = expected[c % 10]
            e[0] += 1
            e[1] += c + 1  # HALF-UP: x.xx5 -> (c+1)/100
        got = {
            r.last_digit: (r.n, r.n_even_result, int(r.sum_rounded_cents))
            for r in q213_rounding_semantics_probe(spark, SF).collect()
        }
        for d, (n, s) in ((k, tuple(v)) for k, v in expected.items()):
            gn, geven, gsum = got[d]
            assert gn == n
            assert gsum == s
            # half-up: result last digit is (d+1)%10 for every row
            assert geven == (n if (d + 1) % 2 == 0 else 0)
