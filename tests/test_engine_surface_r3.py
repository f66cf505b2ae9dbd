"""Round-3 engine-surface additions: gap fill, exact-sum correlation,
ntile, window value family, regex extract-all, OHLC, JSON round-trip,
and the Python UDTF door (with its mandatory built-in-twin
equivalence proof)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from product_analytics_spark import driver_queries as dq
from tests.conftest import SF_MED, SF_SMALL


class TestGapFill:
    def test_spine_is_dense_and_zero_filled(self, spark):
        out = dq.q90_gap_fill(spark, SF_MED).collect()
        by_type: dict[str, int] = {}
        for r in out:
            by_type[r["event_type"]] = by_type.get(r["event_type"], 0) + 1
        # every type covers the full 30-day spine
        assert set(by_type.values()) == {30}
        # zero-filled rows carry 0, not NULL
        for r in out:
            assert r["n_events"] is not None and r["total_value"] is not None

    def test_gap_rows_add_nothing(self, spark):
        out = dq.q90_gap_fill(spark, SF_MED)
        raw = (
            dq._t(spark, SF_MED, "events").count()
        )
        assert out.agg(F.sum("n_events")).collect()[0][0] == raw


class TestCorrelation:
    def test_against_builtin_corr(self, spark):
        """The exact-sums formula must agree with Spark's builtin corr
        to float tolerance (the builtin is merge-order-dependent in its
        last bits, which is exactly why q91 doesn't use it)."""
        out = {
            r["l_returnflag"]: r["corr_qty_price"]
            for r in dq.q91_correlation(spark, SF_MED).collect()
        }
        ref = {
            r["l_returnflag"]: r["c"]
            for r in dq._t(spark, SF_MED, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
            .collect()
        }
        assert set(out) == set(ref)
        for k in out:
            assert math.isclose(out[k], ref[k], rel_tol=1e-9, abs_tol=1e-12)


class TestNtileDeciles:
    def test_decile_sizes(self, spark):
        rows = dq.q92_ntile_deciles(spark, SF_MED).collect()
        total = sum(r["n_orders"] for r in rows)
        sizes = {r["decile"]: r["n_orders"] for r in rows}
        assert len(sizes) == 10
        # ntile spreads rows as evenly as possible: sizes differ by <= 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert total == dq._t(spark, SF_MED, "orders").count()

    def test_deciles_are_ordered(self, spark):
        rows = sorted(
            dq.q92_ntile_deciles(spark, SF_MED).collect(), key=lambda r: r["decile"]
        )
        for lo, hi in zip(rows, rows[1:]):
            assert lo["max_total"] <= hi["min_total"]


class TestWindowValueFamily:
    def test_first_last_consistent_with_sort(self, spark):
        rows = dq.q93_window_value_family(spark, SF_SMALL, ).collect()
        # first/last/second totals are constant within a customer
        per_cust: dict[int, set] = {}
        for r in rows:
            per_cust.setdefault(
                r["customer_id"], set()
            ).add((r["first_total"], r["last_total"], r["second_total"]))
        assert all(len(v) == 1 for v in per_cust.values())

    def test_single_order_customer_has_null_second(self, spark):
        rows = dq.q93_window_value_family(spark, SF_SMALL).collect()
        n_orders: dict[int, int] = {}
        for r in rows:
            n_orders[r["customer_id"]] = n_orders.get(r["customer_id"], 0) + 1
        for r in rows:
            if n_orders[r["customer_id"]] == 1:
                assert r["second_total"] is None
                assert r["first_total"] == r["last_total"] == r["order_total"]


class TestOhlc:
    def test_bounds(self, spark):
        for r in dq.q95_ohlc_downsample(spark, SF_MED).collect():
            assert r["low_value"] <= r["open_value"] <= r["high_value"]
            assert r["low_value"] <= r["close_value"] <= r["high_value"]
            assert r["n_trades"] > 0


class TestUdtfTokenize:
    def test_udtf_equals_builtin_twin(self, spark):
        """Row-for-row equivalence of the Python UDTF against the
        built-in explode(split) fast path — the contract that lets
        production pipelines use the built-in form."""
        from product_analytics_spark.functions import udtfs

        udtfs.register_all(spark)
        docs = dq._t(spark, SF_SMALL, "documents")
        docs.createOrReplaceTempView("_udtf_docs")
        via_udtf = spark.sql(
            "SELECT d.doc_id, t.pos, t.token FROM _udtf_docs d, LATERAL tokenize(d.text) t"
        )
        via_builtin = (
            docs.select(
                "doc_id",
                F.posexplode(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
                .alias("pos", "token"),
            )
        )
        a = {tuple(r) for r in via_udtf.collect()}
        b = {tuple(r) for r in via_builtin.collect()}
        assert a == b

    def test_udtf_skips_nulls_and_empties(self, spark):
        from product_analytics_spark.functions import udtfs

        udtfs.register_all(spark)
        df = spark.createDataFrame(
            [(1, "a  b"), (2, None), (3, ""), (4, " ")], "id int, text string"
        )
        df.createOrReplaceTempView("_udtf_edge")
        rows = spark.sql(
            "SELECT e.id, t.pos, t.token FROM _udtf_edge e, LATERAL tokenize(e.text) t"
        ).collect()
        assert {(r["id"], r["pos"], r["token"]) for r in rows} == {
            (1, 0, "a"),
            (1, 1, "b"),
        }


class TestTwap:
    def test_weights_tile_the_day(self, spark):
        """Coverage runs from each group's first observation to the end
        of its day — never more than 86400s — and TWAP stays inside the
        group's value range."""
        from product_analytics_spark.catalog import read_parquet

        rows = dq.q98_twap(spark, SF_MED).collect()
        assert rows
        for r in rows:
            assert 0 < r["covered_seconds"] <= 86400.0
        e = read_parquet(spark, f"{SF_MED}/events.parquet")
        bounds = {
            (r["event_type"], r["day"]): (r["lo"], r["hi"])
            for r in e.groupBy(
                "event_type", F.date_trunc("day", "ts").alias("day")
            )
            .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
            .collect()
        }
        for r in rows:
            lo, hi = bounds[(r["event_type"], r["day"])]
            assert lo - 0.01 <= r["twap_value"] <= hi + 0.01


class TestMutualNN:
    def test_mutual_pairs_are_reciprocal_top1(self, spark):
        from product_analytics_spark.operators import similarity

        emb = dq._t(spark, SF_MED, "embeddings")
        nn = {
            r["vec_id"]: r["neighbor_id"]
            for r in similarity.knn_join_ivf(
                emb,
                centroids=similarity.CENTROIDS_FINE,
                k=1,
                dim=dq.EMBEDDING_DIM,
                cap_per_cell=dq.NEAR_DUP_CAP_PER_CELL,
            ).collect()
        }
        pairs = dq.q99_mutual_nn(spark, SF_MED).collect()
        assert pairs
        for r in pairs:
            assert r["id_a"] < r["id_b"]
            assert nn[r["id_a"]] == r["id_b"] and nn[r["id_b"]] == r["id_a"]
        # completeness: every reciprocal top-1 pair is reported
        expected = {
            (a, b) for a, b in nn.items() if a < b and nn.get(b) == a
        }
        assert {(r["id_a"], r["id_b"]) for r in pairs} == expected


class TestJsonRoundtrip:
    def test_micros_survive(self, spark, tmp_path):
        from pyspark.sql import types as T

        from product_analytics_spark.sources import readers

        ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        src = dq._t(spark, SF_SMALL, "events").select("event_id", "ts").limit(200)
        path = str(tmp_path / "land")
        src.write.option("timestampNTZFormat", ts_fmt).option(
            "timestampFormat", ts_fmt
        ).json(path)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", src.schema["ts"].dataType),
            ]
        )
        back, rejects = readers.split_rejects(
            readers.read_json_lines(spark, path, schema, timestamp_format=ts_fmt)
        )
        assert rejects.count() == 0
        assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}
