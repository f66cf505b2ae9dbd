"""Operator unit tests over synthetic micro-fixtures (fast, exact)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.functions import cleaning, dates, scoring
from product_analytics_spark.operators import dedup, incremental, text, windows


TS = dt.datetime


@pytest.fixture()
def cdc_df(spark):
    rows = [
        # key 1: three versions, last is UPDATE
        (1, "a@x.com", "INSERT", TS(2024, 1, 1), TS(2024, 1, 1, 0, 1)),
        (1, "b@x.com", "UPDATE", TS(2024, 1, 2), TS(2024, 1, 2, 0, 1)),
        (1, "c@x.com", "UPDATE", TS(2024, 1, 3), TS(2024, 1, 3, 0, 1)),
        # key 2: latest is DELETE
        (2, "d@x.com", "INSERT", TS(2024, 1, 1), TS(2024, 1, 1, 0, 1)),
        (2, "d@x.com", "DELETE", TS(2024, 1, 5), TS(2024, 1, 5, 0, 1)),
        # key 3: tie on _cdc_timestamp, broken by _ingested_at
        (3, "e@x.com", "INSERT", TS(2024, 1, 4), TS(2024, 1, 4, 0, 1)),
        (3, "f@x.com", "UPDATE", TS(2024, 1, 4), TS(2024, 1, 4, 0, 2)),
    ]
    return spark.createDataFrame(
        rows, "customer_id long, email string, _cdc_operation string, _cdc_timestamp timestamp, _ingested_at timestamp"
    )


class TestLatestByKey:
    def test_keeps_latest_version(self, cdc_df):
        out = {r["customer_id"]: r["email"] for r in dedup.latest_by_key(cdc_df, "customer_id").collect()}
        assert out[1] == "c@x.com"

    def test_tiebreak_on_ingested_at(self, cdc_df):
        out = {r["customer_id"]: r["email"] for r in dedup.latest_by_key(cdc_df, "customer_id").collect()}
        assert out[3] == "f@x.com"

    def test_window_form_identical(self, cdc_df):
        a = dedup.latest_by_key(cdc_df, "customer_id")
        b = dedup.latest_by_key_window(cdc_df, "customer_id")
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.select(*a.columns).collect())
        )

    def test_delete_exclusion(self, cdc_df):
        latest = dedup.latest_by_key(cdc_df, "customer_id")
        alive = dedup.drop_cdc_deletes(latest)
        assert sorted(r["customer_id"] for r in alive.collect()) == [1, 3]


class TestExactDedup:
    def test_keep_min_id(self, spark):
        df = spark.createDataFrame(
            [(3, "x"), (1, "x"), (2, "y")], "doc_id long, text string"
        )
        out = dedup.exact_dedup(df, "text", keep_min="doc_id")
        assert sorted((r["text"], r["doc_id"]) for r in out.collect()) == [("x", 1), ("y", 2)]


class TestIncremental:
    def test_watermark_roundtrip(self, spark):
        prev = spark.createDataFrame([(1, TS(2024, 1, 5))], "id long, ts timestamp")
        wm = incremental.high_watermark(prev, "ts")
        assert wm == TS(2024, 1, 5)
        batch = spark.createDataFrame(
            [(2, TS(2024, 1, 4)), (3, TS(2024, 1, 6))], "id long, ts timestamp"
        )
        out = incremental.watermark_filter(batch, "ts", wm).collect()
        assert [r["id"] for r in out] == [3]

    def test_watermark_empty_prev_uses_default(self, spark):
        prev = spark.createDataFrame([], "id long, ts timestamp")
        assert incremental.high_watermark(prev, "ts") == incremental.DEFAULT_WATERMARK

    def test_merge_upsert(self, spark):
        prev = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string")
        batch = spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string")
        out = {r["k"]: r["v"] for r in incremental.merge_upsert(prev, batch, "k").collect()}
        assert out == {1: "new", 2: "keep", 3: "ins"}

    def test_merge_schema_evolution(self, spark):
        prev = spark.createDataFrame([(1, "old")], "k long, v string")
        batch = spark.createDataFrame([(2, "ins", 9)], "k long, v string, extra long")
        out = incremental.merge_upsert(prev, batch, "k")
        assert "extra" in out.columns
        vals = {r["k"]: r["extra"] for r in out.collect()}
        assert vals[1] is None and vals[2] == 9

    def test_first_seen_backfill_prefers_prior(self, spark):
        prev = spark.createDataFrame(
            [(1, TS(2024, 1, 1))], "k long, first_seen_at timestamp"
        )
        batch = spark.createDataFrame([(1, TS(2024, 2, 1)), (2, TS(2024, 2, 2))], "k long, ts timestamp")
        out = {r["k"]: r["first_seen_at"] for r in
               incremental.first_seen_backfill(batch, prev, "k", "ts").collect()}
        assert out[1] == TS(2024, 1, 1)   # prior first-seen wins
        assert out[2] == TS(2024, 2, 2)   # new key falls back to own ts

    def test_incremental_equals_full_refresh(self, spark):
        """Property: replaying batches through watermark+dedup+merge
        equals one-shot dedup over the union (SURVEY.md §5.3)."""
        rows = [
            (k, v, TS(2024, 1, d, h))
            for k in range(1, 8)
            for d, (v, h) in enumerate([("a", 1), ("b", 2), ("c", 3)], start=1)
        ]
        df = spark.createDataFrame(rows, "k long, v string, ts timestamp")
        full = dedup.latest_by_key(df, "k", order_by=("ts",))

        snapshot = None
        for day in (1, 2, 3):
            batch = df.filter(F.dayofmonth("ts") == day)
            wm = incremental.high_watermark(snapshot, "ts") if snapshot is not None else None
            if wm is not None:
                batch = incremental.watermark_filter(batch, "ts", wm)
            latest = dedup.latest_by_key(batch, "k", order_by=("ts",))
            snapshot = incremental.merge_upsert(snapshot, latest, "k")
        assert sorted(map(tuple, snapshot.select("k", "v", "ts").collect())) == sorted(
            map(tuple, full.select("k", "v", "ts").collect())
        )


class TestCleaning:
    def test_canonicalize_with_default(self, spark):
        df = spark.createDataFrame([(" o ",), ("F",), ("zz",)], "s: string")
        out = df.select(
            cleaning.canonicalize(F.col("s"), {"OPEN": ["O"], "FULL": ["F"]}, "UNK").alias("c")
        )
        assert [r["c"] for r in out.collect()] == ["OPEN", "FULL", "UNK"]

    def test_clamp_money_branches(self, spark):
        df = spark.createDataFrame(
            [(None,), (-5.0,), (100.129,), (60000.0,)], "x: double"
        )
        out = [float(r["c"]) for r in df.select(cleaning.clamp_money(F.col("x"), 0.0, 50000.0).alias("c")).collect()]
        assert out == [0.0, 0.0, 100.13, 50000.0]

    def test_email_phone_validation(self, spark):
        df = spark.createDataFrame(
            [("a@b.com", "555-123-4567"), ("bad@", "000-000-0000"), (None, "12")],
            "email string, phone string",
        )
        out = df.select(
            cleaning.is_valid_email("email").alias("e"),
            cleaning.is_valid_phone("phone").alias("p"),
        ).collect()
        assert [(r["e"], r["p"]) for r in out] == [(True, True), (False, False), (False, False)]

    def test_concat_null_propagates(self, spark):
        df = spark.createDataFrame([("a", None)], "f string, l string")
        assert df.select(cleaning.full_name("f", "l").alias("n")).first()["n"] is None


class TestDatesScoring:
    def test_weekend_and_season(self, spark):
        df = spark.createDataFrame([(TS(2024, 1, 6),), (TS(2024, 7, 3),)], "d: timestamp")
        out = df.select(
            dates.is_weekend(F.col("d")).alias("w"), dates.season(F.col("d")).alias("s")
        ).collect()
        assert (out[0]["w"], out[0]["s"]) == (True, "Winter")   # Saturday
        assert (out[1]["w"], out[1]["s"]) == (False, "Summer")  # Wednesday

    def test_rfm_bucket_edges(self, spark):
        df = spark.createDataFrame([(30.0, 20.0, 5000.0), (366.0, 1.0, 50.0)], "r double, f double, m double")
        s = scoring.rfm_scores(F.col("r"), F.col("f"), F.col("m"))
        out = df.select(s["recency_score"].alias("rs"), s["frequency_score"].alias("fs"), s["monetary_score"].alias("ms")).collect()
        assert tuple(out[0]) == (5, 5, 5)
        assert tuple(out[1]) == (1, 1, 1)


class TestWindows:
    def test_sessionize_gap(self, spark):
        rows = [
            (1, 10, TS(2024, 1, 1, 0, 0)),
            (1, 11, TS(2024, 1, 1, 0, 10)),   # same session
            (1, 12, TS(2024, 1, 1, 1, 0)),    # gap 50min -> new session
            (2, 20, TS(2024, 1, 1, 0, 0)),
        ]
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
        out = windows.sessionize(df).collect()
        sess = {r["event_id"]: r["session_id"] for r in out}
        assert sess[10] == sess[11] == 1 and sess[12] == 2 and sess[20] == 1

    def test_tumbling_alignment(self, spark):
        df = spark.createDataFrame(
            [(TS(2024, 1, 1, 0, 59), "a", 1.0), (TS(2024, 1, 1, 1, 1), "a", 2.0)],
            "ts timestamp, event_type string, value double",
        )
        out = windows.tumbling_window_agg(df).collect()
        starts = sorted(r["window_start"] for r in out)
        assert starts == [TS(2024, 1, 1, 0, 0), TS(2024, 1, 1, 1, 0)]


class TestText:
    def test_shingles_and_jaccard(self, spark):
        df = spark.createDataFrame(
            [("the quick brown fox jumps", "the quick brown fox leaps")],
            "a string, b string",
        )
        sim = df.select(text.ngram_jaccard(F.col("a"), F.col("b"), 2).alias("j")).first()["j"]
        # 4 bigrams each, 3 shared -> 3/5
        assert abs(sim - 0.6) < 1e-9

    def test_approx_scale_variants_within_tolerance(self, spark):
        # The 100 TB swap-ins for exact distinct-count/percentiles
        # (SCALE.md): HLL++ and t-digest style sketches. Deterministic
        # for a given input; must land within their error bounds.
        from tests.conftest import SF_MED
        from product_analytics_spark.catalog import read_parquet

        o = read_parquet(spark, f"{SF_MED}/orders.parquet")
        exact = o.select(F.countDistinct("o_custkey")).first()[0]
        approx = o.select(F.approx_count_distinct("o_custkey", 0.02)).first()[0]
        assert abs(approx - exact) / exact < 0.05
        p50_exact = o.select(F.percentile("o_totalprice", 0.5)).first()[0]
        p50_approx = o.select(
            F.percentile_approx("o_totalprice", 0.5, 10000)
        ).first()[0]
        assert abs(p50_approx - p50_exact) / p50_exact < 0.01

    def test_minhash_pre_group_exact_output_identical(self, spark):
        # Dup-heavy corpus: 3 distinct texts, each duplicated several
        # times, two of them near-dups of each other. The pre-grouped
        # run (LSH over distinct texts only, pairs expanded back) must
        # produce the exact same pair set as the naive run.
        words = [f"tok{i}" for i in range(30)]
        base = " ".join(words)
        near = " ".join(["tokX"] + words[1:])
        far = " ".join(f"zzz{i}" for i in range(30))
        rows = []
        for i, text_val in [(0, base), (1, base), (2, base), (3, near), (4, near), (5, far), (6, far)]:
            rows.append((i, text_val))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        naive = {
            (r.id_a, r.id_b, r.est_jaccard)
            for r in text.minhash_near_dup_pairs(df, threshold=0.4).collect()
        }
        grouped = {
            (r.id_a, r.id_b, r.est_jaccard)
            for r in text.minhash_near_dup_pairs(
                df, threshold=0.4, pre_group_exact=True
            ).collect()
        }
        assert naive == grouped
        # sanity: exact dups are in there at est 1.0, near-dups found
        assert (0, 1, 1.0) in naive and (5, 6, 1.0) in naive

    def test_minhash_detects_near_dup(self, spark):
        words = [f"word{i}" for i in range(30)]
        base = " ".join(words)
        near = " ".join(["word0X"] + words[1:])       # jaccard ~0.87
        far = " ".join(f"other{i}" for i in range(30))
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string"
        )
        pairs = text.minhash_near_dup_pairs(df, threshold=0.4).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found
        assert (1, 3) not in found and (2, 3) not in found

    def test_fingerprint_normalizes_whitespace(self, spark):
        df = spark.createDataFrame([("a  b\tc", "a b c")], "x string, y string")
        r = df.select(
            text.fingerprint(F.col("x")).alias("fx"), text.fingerprint(F.col("y")).alias("fy")
        ).first()
        assert r["fx"] == r["fy"]
