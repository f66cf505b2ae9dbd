"""Unit tests for the round-2 pipeline operators: sampling/splits,
SCD2 history, corpus prep (vocab/chunking/PII/contamination), salted
skew aggregation, and connected-components dup clustering. The
DuckDB-oracle parity of q48-q56 is covered by tools/check.py; these
pin operator semantics on controlled inputs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.operators import corpus, graph, sampling, scd, skew


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSampling:
    def test_split_is_deterministic_and_partitioning_invariant(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "k")
        a = sampling.with_hash_split(df, "k")
        b = sampling.with_hash_split(df.repartition(7), "k")
        assert a.orderBy("k").collect() == b.orderBy("k").collect()

    def test_split_fractions_roughly_hold_and_cover_all_rows(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "k")
        counts = dict(
            sampling.with_hash_split(df, "k")
            .groupBy("split").count().collect()
        )
        assert sum(counts.values()) == 5000
        assert abs(counts["train"] / 5000 - 0.8) < 0.03
        assert abs(counts["val"] / 5000 - 0.1) < 0.03
        assert abs(counts["test"] / 5000 - 0.1) < 0.03

    def test_membership_stable_under_data_growth(self, spark):
        small = spark.range(100).withColumnRenamed("id", "k")
        big = spark.range(1000).withColumnRenamed("id", "k")
        s = {r.k: r.split for r in sampling.with_hash_split(small, "k").collect()}
        b = {r.k: r.split for r in sampling.with_hash_split(big, "k").collect()}
        assert all(b[k] == v for k, v in s.items())

    def test_stratified_exact_sample_sizes(self, spark):
        rows = [(i, "en" if i < 70 else "de") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = sampling.stratified_exact_sample(df, "lang", "doc_id", 0.1)
        by_lang = dict(out.groupBy("lang").count().collect())
        assert by_lang == {"en": 7, "de": 3}

    def test_stratified_per_stratum_fractions(self, spark):
        rows = [(i, "en" if i < 50 else "de") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = sampling.stratified_exact_sample(
            df, "lang", "doc_id", {"en": 0.2, "de": 0.0}
        )
        by_lang = dict(out.groupBy("lang").count().collect())
        assert by_lang == {"en": 10}

    def test_hash_sample_bounds(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "k")
        n = sampling.hash_sample(df, "k", 0.25).count()
        assert abs(n / 5000 - 0.25) < 0.03
        with pytest.raises(ValueError):
            sampling.hash_sample(df, "k", 1.5)


class TestScd2:
    TS = dt.datetime(2024, 1, 1)

    def _hist(self, spark):
        t = self.TS
        rows = [
            # user 1: A -> A (no change) -> B -> B -> A
            (1, t, 1, "A"),
            (1, t + dt.timedelta(hours=1), 2, "A"),
            (1, t + dt.timedelta(hours=2), 3, "B"),
            (1, t + dt.timedelta(hours=3), 4, "B"),
            (1, t + dt.timedelta(hours=4), 5, "A"),
            # user 2: single row
            (2, t, 6, "Z"),
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, state string"
        )

    def test_versions_and_intervals(self, spark):
        out = scd.scd2_history(
            self._hist(spark), "user_id", "ts", "state", tiebreak_cols=("event_id",)
        )
        u1 = sorted(
            [(r.state, r.valid_from, r.valid_to, r.is_current)
             for r in out.filter(F.col("user_id") == 1).collect()],
            key=lambda r: r[1],
        )
        t = self.TS
        assert [r[0] for r in u1] == ["A", "B", "A"]
        # Contiguous, non-overlapping intervals; only last is open.
        assert u1[0][2] == u1[1][1] and u1[1][2] == u1[2][1]
        assert [r[3] for r in u1] == [False, False, True]
        assert u1[0][1] == t and u1[2][2] is None

    def test_single_row_entity_is_current(self, spark):
        out = scd.scd2_history(
            self._hist(spark), "user_id", "ts", "state", tiebreak_cols=("event_id",)
        ).filter(F.col("user_id") == 2)
        r = out.first()
        assert r.is_current and r.valid_to is None

    def test_null_safe_tracking(self, spark):
        t = self.TS
        rows = [(1, t, 1, None), (1, t + dt.timedelta(hours=1), 2, None),
                (1, t + dt.timedelta(hours=2), 3, "A")]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, state string"
        )
        out = scd.scd2_history(df, "user_id", "ts", "state", tiebreak_cols=("event_id",))
        # NULL == NULL under the check strategy: 2 versions, not 3.
        assert out.count() == 2


class TestCorpus:
    def test_vocab_topk_counts_and_tiebreak(self, spark):
        df = _docs(spark, [(1, "b a a"), (2, "a b c")])
        rows = corpus.vocab_topk(df, k=3).collect()
        assert [(r.token, r.n_occurrences, r.n_docs) for r in rows] == [
            ("a", 3, 2), ("b", 2, 2), ("c", 1, 1)
        ]

    def test_chunking_covers_all_tokens_with_overlap(self, spark):
        txt = " ".join(f"t{i}" for i in range(70))
        df = _docs(spark, [(1, txt)])
        rows = sorted(
            corpus.chunk_documents(df, chunk_tokens=32, overlap=8).collect(),
            key=lambda r: r.chunk_idx,
        )
        # 70 tokens, step 24: starts 1, 25, 49 -> 3 chunks.
        assert [r.chunk_idx for r in rows] == [0, 1, 2]
        assert [r.n_tokens for r in rows] == [32, 32, 22]
        assert rows[0].chunk_text.split()[:1] == ["t0"]
        assert rows[1].chunk_text.split()[0] == "t24"
        assert rows[2].chunk_text.split()[-1] == "t69"
        # Overlap: last 8 tokens of chunk 0 == first 8 of chunk 1.
        assert rows[0].chunk_text.split()[-8:] == rows[1].chunk_text.split()[:8]

    def test_chunking_short_doc_single_chunk(self, spark):
        df = _docs(spark, [(1, "only four tokens here")])
        rows = corpus.chunk_documents(df, chunk_tokens=32, overlap=8).collect()
        assert len(rows) == 1 and rows[0].n_tokens == 4

    def test_chunking_rejects_bad_overlap(self, spark):
        with pytest.raises(ValueError):
            corpus.chunk_documents(_docs(spark, [(1, "x")]), chunk_tokens=8, overlap=8)

    def test_mask_pii_phone_and_email(self, spark):
        df = spark.createDataFrame(
            [(1, "call 25-989-741-2988 or mail a.b@ex.com now"), (2, "clean")],
            "id long, s string",
        )
        rows = {r.id: r for r in corpus.mask_pii(df, {"s": "m"}).collect()}
        assert rows[1].m == "call [PII] or mail [PII] now"
        assert rows[1].m_n_masked == 2
        assert rows[2].m == "clean" and rows[2].m_n_masked == 0

    def test_contamination_flags_only_overlapping_train_docs(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        bench = _docs(spark, [(100, shared)])
        train = _docs(
            spark,
            [(1, "prefix " + shared), (2, "totally different tokens " + " ".join(f"z{i}" for i in range(10)))],
        )
        flagged = [r.doc_id for r in corpus.contamination_screen(train, bench, ngram=8).collect()]
        assert flagged == [1]


class TestSkew:
    def test_salted_agg_matches_direct(self, spark):
        df = (
            spark.range(10000)
            .select(
                (F.col("id") % 7).alias("k"),
                (F.col("id") % 100).cast("decimal(18,2)").alias("v"),
            )
        )
        direct = {
            r.k: (r.n, r.s, r.mn, r.mx)
            for r in df.groupBy("k")
            .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
                 F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        }
        salted = {
            r.k: (r.n, r.s, r.mn, r.mx)
            for r in skew.salted_agg(
                df, "k",
                {"n": ("count", "v"), "s": ("sum", "v"),
                 "mn": ("min", "v"), "mx": ("max", "v")},
                n_salts=8,
            ).collect()
        }
        assert salted == direct

    def test_salted_avg(self, spark):
        df = spark.range(100).select(
            (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
        )
        direct = {r.k: r.a for r in df.groupBy("k").agg(F.avg("v").alias("a")).collect()}
        salted = {
            r.k: r.a
            for r in skew.salted_agg(df, "k", {"a": ("avg", "v")}, n_salts=4).collect()
        }
        assert salted.keys() == direct.keys()
        for k in direct:
            assert abs(salted[k] - direct[k]) < 1e-9

    def test_rejects_unsupported_aggregate(self, spark):
        df = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
        with pytest.raises(ValueError):
            skew.salted_agg(df, "k", {"d": ("count_distinct", "v")})


class TestGraph:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a long, id_b long")

    def test_chain_and_separate_component(self, spark):
        # 1-2-3 chained; 10-11 separate.
        e = self._edges(spark, [(2, 1), (2, 3), (10, 11)])
        comp = {r.id: r.component for r in graph.connected_components(e).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_dup_clusters_canonical_flags(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
        pairs = self._edges(spark, [(1, 3), (3, 5)])
        out = {r.doc_id: (r.cluster_id, r.is_canonical)
               for r in graph.dup_clusters(docs, pairs).collect()}
        assert out == {
            1: (1, True), 2: (2, True), 3: (1, False), 4: (4, True), 5: (1, False),
        }

    def test_non_convergence_raises(self, spark):
        # A 6-chain needs >1 round; cap at 1 to hit the guard.
        e = self._edges(spark, [(i, i + 1) for i in range(1, 6)])
        with pytest.raises(RuntimeError):
            graph.connected_components(e, max_iterations=1)


class TestPrioritySample:
    def _weighted(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, w long")

    def test_exactly_k_and_partitioning_invariant(self, spark):
        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
        )
        a = sampling.priority_sample(df, "w", k=50).collect()
        b = sampling.priority_sample(df.repartition(11), "w", k=50).collect()
        assert len(a) == 50
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)

    def test_k_at_least_n_returns_all(self, spark):
        df = self._weighted(spark, [(i, 1) for i in range(5)])
        out = sampling.priority_sample(df, "w", k=10)
        assert out.count() == 5

    def test_heavy_row_dominates(self, spark):
        # One row with weight 1e15 vs 100 rows with weight 1: its
        # priority (h+1)/1e15 <= 2^60/1e15 ~ 1.2e3 is far below the
        # light rows' (h+1)/1 ~ uniform over [1, 2^60]. Deterministic
        # because the hash is content-derived.
        rows = [(i, 1) for i in range(100)] + [(999, 10**15)]
        df = self._weighted(spark, rows)
        winner = sampling.priority_sample(df, "w", k=1).collect()[0]
        assert winner.doc_id == 999


class TestTfidf:
    def test_scores_and_ranking(self, spark):
        docs = _docs(spark, [(1, "apple banana banana"), (2, "apple cherry")])
        out = {
            (r.doc_id, r.term_rank): (r.token, r.tf, r.df, r.score)
            for r in corpus.tfidf_topk(docs, k=3).collect()
        }
        # N=2. idf(apple)=(2-2+0.5)/2.5=0.2, idf(banana)=idf(cherry)=1.5/1.5=1.0
        assert out[(1, 1)] == ("banana", 2, 1, 2.0)
        assert out[(1, 2)] == ("apple", 1, 2, 0.2)
        assert out[(2, 1)] == ("cherry", 1, 1, 1.0)
        assert out[(2, 2)] == ("apple", 1, 2, 0.2)

    def test_tie_breaks_on_token_asc(self, spark):
        docs = _docs(spark, [(1, "zebra alpha"), (2, "other words")])
        out = corpus.tfidf_topk(docs, k=2).filter(F.col("doc_id") == 1).collect()
        assert [r.token for r in sorted(out, key=lambda r: r.term_rank)] == [
            "alpha", "zebra",
        ]

    def test_k_caps_terms_per_doc(self, spark):
        docs = _docs(spark, [(1, "a b c d e f"), (2, "x")])
        out = corpus.tfidf_topk(docs, k=2)
        counts = {r.doc_id: r.n for r in
                  out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
        assert counts == {1: 2, 2: 1}


class TestKmeansUpdate:
    def test_member_means_per_cell(self, spark):
        from product_analytics_spark.operators import similarity

        cents = [[1.0, 0.0], [0.0, 1.0]]
        vecs = [
            (1, [0.9, 0.1]),   # cell 0
            (2, [0.7, 0.3]),   # cell 0
            (3, [0.1, 0.95]),  # cell 1
        ]
        df = spark.createDataFrame(vecs, "doc_id long, embedding array<double>")
        out = {
            (r.cell, r.dim): (r.n_members, r.centroid)
            for r in similarity.kmeans_update(df, cents).collect()
        }
        assert out[(0, 0)] == (2, pytest.approx(0.8))
        assert out[(0, 1)] == (2, pytest.approx(0.2))
        assert out[(1, 0)] == (1, pytest.approx(0.1))
        assert out[(1, 1)] == (1, pytest.approx(0.95))

    def test_partitioning_invariant_bitwise(self, spark):
        from product_analytics_spark.operators import similarity

        import random

        rng = random.Random(7)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(200)]
        cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
        df = spark.createDataFrame(vecs, "doc_id long, embedding array<double>")
        a = sorted(map(tuple, similarity.kmeans_update(df, cents).collect()))
        b = sorted(map(tuple,
                       similarity.kmeans_update(df.repartition(13), cents).collect()))
        assert a == b  # exact equality: quantized integer sums


class TestIntervalJoin:
    def _data(self, spark):
        import datetime as dt

        pts = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 5)), (2, dt.datetime(2024, 1, 2, 23)),
             (3, dt.datetime(2024, 1, 9, 0))],
            "pid long, ts timestamp",
        )
        iv = spark.createDataFrame(
            [(10, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3)),
             (11, dt.datetime(2024, 1, 2, 12), dt.datetime(2024, 1, 2, 23, 30)),
             (12, dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 9))],
            "wid long, w_start timestamp, w_end timestamp",
        )
        return pts, iv

    def test_bucketed_matches_broadcast(self, spark):
        from product_analytics_spark.operators import joins

        pts, iv = self._data(spark)
        bucketed = sorted(
            (r.pid, r.wid)
            for r in joins.interval_join(pts, iv, "ts", "w_start", "w_end",
                                         bucket="1 day").collect()
        )
        bcast = sorted(
            (r.pid, r.wid)
            for r in joins.interval_join(pts, iv, "ts", "w_start", "w_end",
                                         broadcast_intervals=True).collect()
        )
        assert bucketed == bcast
        # point 3 at exactly w_end of window 12 must be excluded
        # (half-open), point 2 in both 10 and 11, point 1 only in 10.
        assert bucketed == [(1, 10), (2, 10), (2, 11)]

    def test_interval_spanning_many_buckets(self, spark):
        import datetime as dt
        from product_analytics_spark.operators import joins

        pts = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 15, 12))], "pid long, ts timestamp"
        )
        iv = spark.createDataFrame(
            [(20, dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1))],
            "wid long, w_start timestamp, w_end timestamp",
        )
        out = joins.interval_join(pts, iv, "ts", "w_start", "w_end", bucket="1 day")
        # one match, not one per overlapped bucket
        assert [(r.pid, r.wid) for r in out.collect()] == [(1, 20)]


class TestPackedOffsets:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_offsets_are_a_permutation_prefix_sum(self, spark):
        docs = self._docs(spark, ["a b c", "d e", "f", "g h i j"])
        out = corpus.packed_offsets(docs, seq_len=4, n_buckets=4).collect()
        rows = sorted(out, key=lambda r: r.start_tok)
        # offsets tile the token stream exactly
        expect = 0
        for r in rows:
            assert r.start_tok == expect
            expect += r.n_tokens
        assert expect == 10

    def test_seq_span_arithmetic(self, spark):
        docs = self._docs(spark, ["a b c", "d e", "f", "g h i j"])
        for r in corpus.packed_offsets(docs, seq_len=4, n_buckets=4).collect():
            assert r.first_seq == r.start_tok // 4
            assert r.last_seq == (r.start_tok + r.n_tokens - 1) // 4
            assert r.n_seqs == r.last_seq - r.first_seq + 1

    def test_partitioning_invariant(self, spark):
        docs = self._docs(spark, [f"tok{i} tok{i} x" for i in range(50)])
        a = sorted(map(tuple, corpus.packed_offsets(docs, seq_len=8).collect()))
        b = sorted(map(tuple,
                       corpus.packed_offsets(docs.repartition(9), seq_len=8).collect()))
        assert a == b


class TestRepetitionSignals:
    def test_metrics_exact(self, spark):
        docs = _docs(spark, [(1, "a a a b"), (2, "x y z w")])
        out = {r.doc_id: r for r in corpus.repetition_signals(docs).collect()}
        r1 = out[1]
        assert (r1.n_tokens, r1.n_distinct) == (4, 2)
        assert r1.dup_token_frac == pytest.approx(0.5)
        assert r1.top_token_frac == pytest.approx(0.75)
        assert r1.simpson == pytest.approx((9 + 1) / 16)
        r2 = out[2]
        assert r2.dup_token_frac == 0.0
        assert r2.top_token_frac == 0.25
        assert r2.simpson == 0.25


class TestMixtureSample:
    def test_rates_roughly_hold_and_full_keep(self, spark):
        df = spark.range(4000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
        )
        kept = sampling.mixture_sample(df, "source", {"s0": 1.0, "s1": 0.25})
        counts = {r.source: r.n for r in
                  kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts["s0"] == 2000  # rate 1.0 keeps everything
        assert 350 < counts["s1"] < 650  # ~500

    def test_default_rate_zero_drops_unlisted(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit("other").alias("source")
        )
        assert sampling.mixture_sample(df, "source", {"s0": 1.0}).count() == 0

    def test_deterministic(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("doc_id"), F.lit("s").alias("source")
        )
        a = {r.doc_id for r in sampling.mixture_sample(df, "source", {"s": 0.3}).collect()}
        b = {r.doc_id for r in
             sampling.mixture_sample(df.repartition(7), "source", {"s": 0.3}).collect()}
        assert a == b


class TestApplyVocab:
    def test_ids_order_and_oov(self, spark):
        docs = _docs(spark, [(1, "the cat sat"), (2, "the the dog")])
        vocab = corpus.vocab_topk(docs, k=2)  # 'the' (3), then 'cat' ties...
        out = {r.doc_id: r for r in corpus.apply_vocab(docs, vocab).collect()}
        # vocab: the->1 (3 occurrences); cat->2 (tie vs dog/sat broken
        # by token asc). doc1 = the cat sat -> [1, 2, OOV].
        assert out[1].token_ids == [1, 2, 0]
        assert out[1].n_oov == 1
        # doc2 = the the dog -> [1, 1, OOV]
        assert out[2].token_ids == [1, 1, 0]
        assert out[2].n_oov == 1
