"""Unit tests for the q191-q195 families (driver_queries_ext14)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext14 import (
    ANALYZE_KEYS,
    GINI_COLS,
    VOTE_K,
    q191_gini_impurity_profile,
    q192_knn_vote_accuracy,
    q193_target_encoding_loo,
    q194_analyze_tables_sweep,
    q195_punchcard,
)

SF = "/root/testdata/sf0.001"


class TestGiniImpurity:
    def test_matches_python_recount(self, spark):
        got = {
            r.column_name: (r.n, r.n_distinct, r.gini_impurity)
            for r in q191_gini_impurity_profile(spark, SF).collect()
        }
        assert set(got) == {f"{t}.{c}" for t, c in GINI_COLS}
        for tbl, col in GINI_COLS:
            vals = [
                r[0]
                for r in read_parquet(spark, f"{SF}/{tbl}.parquet")
                .select(col)
                .collect()
            ]
            c = Counter(vals)
            n = len(vals)
            s2 = sum(v * v for v in c.values())
            imp = (float(n) * float(n) - float(s2)) / (float(n) * float(n))
            gn, gd, gi = got[f"{tbl}.{col}"]
            assert gn == n
            assert gd == len(c)
            assert abs(gi - imp) < 1e-15


class TestKnnVote:
    def test_vote_recomputed_from_knn_graph(self, spark):
        from product_analytics_spark import driver_queries as dq
        from product_analytics_spark.operators import similarity

        emb = read_parquet(spark, f"{SF}/embeddings.parquet")
        labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
        knn = similarity.knn_join_ivf(
            emb,
            centroids=similarity.CENTROIDS_FINE,
            k=VOTE_K,
            dim=dq.EMBEDDING_DIM,
            cap_per_cell=dq.NEAR_DUP_CAP_PER_CELL,
        ).collect()
        nbs = defaultdict(list)
        for r in knn:
            nbs[r.vec_id].append(labels[r.neighbor_id])
        per_label = defaultdict(lambda: [0, 0])
        for vid, ls in nbs.items():
            c = Counter(ls)
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            e = per_label[labels[vid]]
            e[0] += 1
            e[1] += 1 if best == labels[vid] else 0
        got = {
            r.label: (r.n_vectors, r.n_correct, r.accuracy)
            for r in q192_knn_vote_accuracy(spark, SF).collect()
        }
        assert set(got) == set(per_label)
        for lbl, (n, corr) in per_label.items():
            gn, gc, acc = got[lbl]
            assert (gn, gc) == (n, corr)
            assert acc == corr / n


class TestTargetEncoding:
    def test_matches_python_loo(self, spark):
        cust = read_parquet(spark, f"{SF}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        ).collect()
        orders = read_parquet(spark, f"{SF}/orders.parquet").select(
            "o_custkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y"),
        ).collect()
        y = defaultdict(int)
        for r in orders:
            y[r.o_custkey] += r.y
        seg_sum = defaultdict(int)
        seg_n = defaultdict(int)
        for r in cust:
            seg_sum[r.c_mktsegment] += y[r.c_custkey]
            seg_n[r.c_mktsegment] += 1
        got = {
            r.c_custkey: r.loo_encoding
            for r in q193_target_encoding_loo(spark, SF).collect()
        }
        assert len(got) == len(cust)
        for r in cust:
            s, n = seg_sum[r.c_mktsegment], seg_n[r.c_mktsegment]
            exp = float(s - y[r.c_custkey]) / (n - 1) / 100.0
            assert got[r.c_custkey] == exp


class TestAnalyzeSweep:
    def test_counts_and_ranges(self, spark):
        got = {r.table_name: r for r in q194_analyze_tables_sweep(spark, SF).collect()}
        assert set(got) == {t for t, _ in ANALYZE_KEYS}
        for tbl, key in ANALYZE_KEYS[:4]:  # spot-check a subset
            t = read_parquet(spark, f"{SF}/{tbl}.parquet")
            r = got[tbl]
            assert r.n_rows == t.count()
            agg = t.agg(
                F.countDistinct(key).alias("d"),
                F.min(key).cast("long").alias("mn"),
                F.max(key).cast("long").alias("mx"),
            ).collect()[0]
            assert r.n_distinct_keys == agg.d
            assert int(r.min_key) == agg.mn
            assert int(r.max_key) == agg.mx


class TestPunchcard:
    def test_totals_and_shares(self, spark):
        rows = q195_punchcard(spark, SF).collect()
        ev = read_parquet(spark, f"{SF}/events.parquet")
        assert sum(r.n for r in rows) == ev.count()
        by_dow = defaultdict(float)
        for r in rows:
            assert 1 <= r.dow <= 7 and 0 <= r.hour <= 23
            by_dow[r.dow] += r.dow_share
        for s in by_dow.values():
            assert abs(s - 1.0) < 1e-9
