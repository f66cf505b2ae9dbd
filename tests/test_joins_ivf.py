"""Unit tests for the as-of join and IVF ANN operators (q35/q39)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from product_analytics_spark.operators import similarity
from product_analytics_spark.operators.joins import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(left_rows, "k long, ts timestamp, lv string")
        right = spark.createDataFrame(right_rows, "k long, ts timestamp, rv string")
        out = asof_join(
            left, right, key_cols=("k",), left_ts="ts", right_ts="ts",
            value_cols=("rv",),
        )
        return {(r.k, r.ts): (r.ts_asof, r.rv_asof) for r in out.collect()}

    def test_backward_pick_and_no_match_nulls(self, spark):
        got = self._run(
            spark,
            [(1, _ts(0), "early"), (1, _ts(30), "late"), (2, _ts(30), "other")],
            [(1, _ts(10), "a"), (1, _ts(20), "b")],
        )
        assert got[(1, _ts(0))] == (None, None)          # nothing at-or-before
        assert got[(1, _ts(30))] == (_ts(20), "b")       # latest preceding
        assert got[(2, _ts(30))] == (None, None)         # key never on right

    def test_equal_timestamp_is_inclusive(self, spark):
        got = self._run(
            spark,
            [(1, _ts(10), "x")],
            [(1, _ts(10), "same-instant")],
        )
        assert got[(1, _ts(10))] == (_ts(10), "same-instant")

    def test_right_duplicates_same_ts_deterministic(self, spark):
        # Two right rows at the identical (key, ts): max value tuple wins.
        got = self._run(
            spark,
            [(1, _ts(10), "x")],
            [(1, _ts(5), "aaa"), (1, _ts(5), "zzz")],
        )
        assert got[(1, _ts(10))] == (_ts(5), "zzz")

    def test_left_row_count_preserved(self, spark):
        left = [(1, _ts(i), f"l{i}") for i in range(10)]
        right = [(1, _ts(3), "r")]
        assert len(self._run(spark, left, right)) == 10

    def test_null_value_in_nearest_right_row_is_kept(self, spark):
        # The nearest preceding right row has rv=NULL: the output must
        # carry THAT row's (ts, NULL), not mix the older row's value
        # with the newer row's timestamp (round-1 bug: per-column
        # last(ignorenulls) skipped the NULL back to the older row).
        got = self._run(
            spark,
            [(1, _ts(30), "x")],
            [(1, _ts(5), "old"), (1, _ts(20), None)],
        )
        assert got[(1, _ts(30))] == (_ts(20), None)

    def test_internal_names_do_not_clobber_user_columns(self, spark):
        # Left carries columns named _ts/_is_left: they must survive.
        left = spark.createDataFrame(
            [(1, _ts(10), "keep-ts", "keep-flag")],
            "k long, ts timestamp, _ts string, _is_left string",
        )
        right = spark.createDataFrame([(1, _ts(5), "r")], "k long, ts timestamp, rv string")
        out = asof_join(
            left, right, key_cols=("k",), left_ts="ts", right_ts="ts", value_cols=("rv",)
        ).collect()
        assert out[0]._ts == "keep-ts"
        assert out[0]._is_left == "keep-flag"
        assert out[0].rv_asof == "r"


class TestIvfAnn:
    def test_cells_in_range_and_deterministic(self, spark):
        from tests.conftest import SF_SMALL
        from product_analytics_spark.catalog import read_parquet

        emb = read_parquet(spark, f"{SF_SMALL}/embeddings.parquet")
        assigned = similarity.ivf_assign(emb)
        cells = [r.ivf_cell for r in assigned.select("ivf_cell").collect()]
        n = len(similarity.DEFAULT_CENTROIDS)
        assert all(0 <= c < n for c in cells)
        again = [r.ivf_cell for r in similarity.ivf_assign(emb).select("ivf_cell").collect()]
        assert cells == again

    def test_arrow_and_expr_backends_bit_identical(self, spark):
        from tests.conftest import SF_SMALL
        from product_analytics_spark.catalog import read_parquet

        emb = read_parquet(spark, f"{SF_SMALL}/embeddings.parquet")
        for cents in (similarity.DEFAULT_CENTROIDS, similarity.CENTROIDS_FINE):
            arrow = {
                r.vec_id: r.ivf_cell
                for r in similarity.ivf_assign(emb, cents, backend="arrow").collect()
            }
            expr = {
                r.vec_id: r.ivf_cell
                for r in similarity.ivf_assign(emb, cents, backend="expr").collect()
            }
            assert arrow == expr

    def test_full_nprobe_equals_brute_force(self, spark):
        from tests.conftest import SF_SMALL
        from product_analytics_spark.catalog import read_parquet

        emb = read_parquet(spark, f"{SF_SMALL}/embeddings.parquet")
        probe = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        others = emb.filter(F.col("vec_id") != 0)
        n = len(similarity.DEFAULT_CENTROIDS)
        ivf_all = similarity.cosine_topk_ivf(others, probe, k=5, n_probe_cells=n)
        brute = similarity.cosine_topk(others, probe, k=5)
        assert [tuple(r) for r in ivf_all.collect()] == [tuple(r) for r in brute.collect()]

    def test_nprobe_one_is_subset_of_brute_force_candidates(self, spark):
        from tests.conftest import SF_SMALL
        from product_analytics_spark.catalog import read_parquet

        emb = read_parquet(spark, f"{SF_SMALL}/embeddings.parquet")
        probe = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        others = emb.filter(F.col("vec_id") != 0)
        got = similarity.cosine_topk_ivf(others, probe, k=5, n_probe_cells=1).collect()
        assert 0 < len(got) <= 5
        sims = [r.cosine_sim for r in got]
        assert sims == sorted(sims, reverse=True)


class TestMultiProbeLsh:
    def test_more_probes_never_lose_recall(self, spark):
        from tests.conftest import SF_SMALL
        from product_analytics_spark.catalog import read_parquet

        emb = read_parquet(spark, f"{SF_SMALL}/embeddings.parquet")
        probe = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        others = emb.filter(F.col("vec_id") != 0)
        brute = {r.vec_id for r in similarity.cosine_topk(others, probe, k=10).collect()}

        def recall(nprobe):
            got = {
                r.vec_id
                for r in similarity.cosine_topk_lsh(
                    others, probe, similarity.DEFAULT_PLANES, k=10,
                    n_probe_buckets=nprobe,
                ).collect()
            }
            return len(got & brute)

        r1, r4 = recall(1), recall(4)
        assert r1 <= r4 <= 10


class TestPairBackendEquivalence:
    """The Arrow-grouped numpy kernel and the pure-expression
    self-join must be BIT-identical (dim-order accumulation contract,
    similarity._cell_pair_sims) — this is what licenses the fast
    backend as the default."""

    def test_knn_backends_bit_equal(self, spark):
        from product_analytics_spark.catalog import read_parquet
        from product_analytics_spark.operators import similarity

        emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
        kw = dict(centroids=similarity.CENTROIDS_FINE, k=3, dim=64, cap_per_cell=500)
        a = similarity.knn_join_ivf(emb, backend="arrow", **kw).collect()
        b = similarity.knn_join_ivf(emb, backend="join", **kw).collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}

    def test_pair_backends_bit_equal(self, spark):
        from product_analytics_spark.catalog import read_parquet
        from product_analytics_spark.operators import similarity

        emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
        kw = dict(centroids=similarity.CENTROIDS_FINE, k=20, dim=64, cap_per_cell=500)
        a = similarity.embedding_near_dup_pairs_ivf(emb, backend="arrow", **kw).collect()
        b = similarity.embedding_near_dup_pairs_ivf(emb, backend="join", **kw).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestKnnJoin:
    def test_knn_ranks_and_symmetric_blocking(self, spark):
        from product_analytics_spark.operators import similarity

        # 2 cells' worth of obvious geometry: e1~e2 aligned, e3 orthogonal.
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
            ["vec_id", "embedding"],
        )
        cents = [[1.0, 0.0], [0.0, 1.0]]
        rows = similarity.knn_join_ivf(
            emb, centroids=cents, k=2, dim=2
        ).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
        # 1 and 2 share the first cell; 3 sits alone -> no neighbors.
        assert by_src[1] == [(1, 2)]
        assert by_src[2] == [(1, 1)]
        assert 3 not in by_src
