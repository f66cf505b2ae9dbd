"""Threaded DAG executor (dbt `threads: 5` parity — reference
profiles.yml:8): dependency-ordered N-thread scheduling, FAIR-pool
jobs, run ledger, downstream SKIP on upstream error, and
is_incremental() high-watermark re-run semantics through a second run
over a cumulative source."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from tests.fixtures_cdc import make_cdc_frames

from product_analytics_spark.models.pipeline import build_registry
from product_analytics_spark.plans.executor import DagExecutor
from product_analytics_spark.plans.registry import Model, ModelRegistry
from product_analytics_spark.sources.sinks import SnapshotStore

AS_OF = dt.date(2025, 6, 1)
AS_OF_TS = dt.datetime(2025, 6, 1, 12, 0, 0)


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


class TestExecutorParity:
    def test_matches_sequential_registry_run(self, spark, tmp_path):
        customers_cdc, orders_cdc = make_cdc_frames(spark)
        sources = {"customers_cdc": customers_cdc, "orders_cdc": orders_cdc}
        reg = build_registry(AS_OF, AS_OF_TS)

        seq_store = SnapshotStore(spark, str(tmp_path / "seq"))
        seq_out = reg.run(seq_store, sources)

        ex_store = SnapshotStore(spark, str(tmp_path / "par"))
        ex = DagExecutor(reg, ex_store, threads=5)
        par_out, ledger = ex.run(sources)

        for name in ("customers_latest", "orders_cleaned", "dim_customer"):
            assert _as_sets(par_out[name]) == _as_sets(seq_out[name]), name
        by_model = {e["model"]: e for e in ledger}
        assert all(e["status"] == "success" for e in ledger)
        # chain DAG ⇒ levels 0,1,2 and builds reflect model output rows
        assert by_model["customers_latest"]["level"] == 0
        assert by_model["orders_cleaned"]["level"] == 1
        assert by_model["dim_customer"]["level"] == 2
        assert (
            by_model["customers_latest"]["rows_built"]
            == seq_out["customers_latest"].count()
        )

    def test_independent_roots_run_concurrently(self, spark, tmp_path):
        reg = ModelRegistry()

        def slow_builder(tag):
            def b(deps, prev, full):
                time.sleep(0.6)  # hold the worker so overlap is observable
                return spark.range(3).selectExpr("id AS k", f"'{tag}' AS tag")

            return b

        reg.register(Model(name="root_a", builder=slow_builder("a")))
        reg.register(Model(name="root_b", builder=slow_builder("b")))
        reg.register(
            Model(
                name="join_ab",
                deps=("root_a", "root_b"),
                builder=lambda deps, prev, full: deps["root_a"].unionByName(
                    deps["root_b"]
                ),
            )
        )
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ex = DagExecutor(reg, store, threads=5)
        out, ledger = ex.run({})
        assert ex._last_max_concurrency >= 2  # roots genuinely overlapped
        assert out["join_ab"].count() == 6
        by_model = {e["model"]: e for e in ledger}
        assert by_model["root_a"]["level"] == by_model["root_b"]["level"] == 0
        assert by_model["join_ab"]["level"] == 1

    def test_upstream_error_skips_downstream_not_siblings(self, spark, tmp_path):
        reg = ModelRegistry()

        def boom(deps, prev, full):
            raise RuntimeError("synthetic model failure")

        reg.register(Model(name="bad", builder=boom))
        reg.register(
            Model(
                name="child_of_bad",
                deps=("bad",),
                builder=lambda deps, prev, full: deps["bad"],
            )
        )
        reg.register(
            Model(
                name="grandchild",
                deps=("child_of_bad",),
                builder=lambda deps, prev, full: deps["child_of_bad"],
            )
        )
        reg.register(
            Model(
                name="independent",
                builder=lambda deps, prev, full: spark.range(2).selectExpr(
                    "id AS k"
                ),
            )
        )
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ex = DagExecutor(reg, store, threads=3)
        out, ledger = ex.run({})
        by_model = {e["model"]: e for e in ledger}
        assert by_model["bad"]["status"] == "error"
        assert "synthetic model failure" in by_model["bad"]["error"]
        assert by_model["child_of_bad"]["status"] == "skipped"
        assert by_model["grandchild"]["status"] == "skipped"
        assert by_model["independent"]["status"] == "success"
        assert "bad" not in out and "independent" in out

    def test_second_run_processes_only_post_watermark_rows(
        self, spark, tmp_path
    ):
        """dbt is_incremental() re-run: run 2 sees the CUMULATIVE bronze
        source, but each incremental model's watermark filter must cut
        the work to rows newer than its prior snapshot's max timestamp —
        the ledger's rows_built is the evidence."""
        customers_cdc, orders_cdc = make_cdc_frames(spark)
        cut = dt.datetime(2024, 1, 3)
        c1 = customers_cdc.filter(F.col("_cdc_timestamp") <= F.lit(cut))
        o1 = orders_cdc.filter(F.col("_cdc_timestamp") <= F.lit(cut))

        reg = build_registry(AS_OF, AS_OF_TS)
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ex = DagExecutor(reg, store, threads=5)
        _, ledger1 = ex.run({"customers_cdc": c1, "orders_cdc": o1})
        wm = store.read("customers_latest").agg(
            F.max("last_updated_at")
        ).first()[0]

        # run 2: FULL cumulative source (batch 1 rows included again)
        _, ledger2 = ex.run(
            {"customers_cdc": customers_cdc, "orders_cdc": orders_cdc}
        )
        by2 = {e["model"]: e for e in ledger2}
        assert by2["customers_latest"]["incremental"] is True
        from product_analytics_spark.operators import dedup

        expected = (
            dedup.latest_by_key(
                customers_cdc.filter(F.col("_cdc_timestamp") > F.lit(wm)),
                "customer_id",
            )
            .filter(F.col("_cdc_operation") != "DELETE")
            .count()
        )
        # dedup keeps one non-DELETE row per key from the post-watermark
        # slice only; re-processing batch-1 rows would inflate this
        # toward all keys.
        assert by2["customers_latest"]["rows_built"] == expected
        total_keys = customers_cdc.select("customer_id").distinct().count()
        assert expected < total_keys  # the assertion above is non-vacuous

    def test_ledger_df_schema(self, spark, tmp_path):
        reg = build_registry(AS_OF, AS_OF_TS)
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ex = DagExecutor(reg, store, threads=2)
        customers_cdc, orders_cdc = make_cdc_frames(spark)
        _, ledger = ex.run(
            {"customers_cdc": customers_cdc, "orders_cdc": orders_cdc}
        )
        ldf = ex.ledger_df(ledger)
        assert ldf.count() == 3
        assert set(ldf.columns) == {
            "model", "level", "status", "rows_built",
            "incremental", "duration_s", "thread", "error",
        }


class TestRetry:
    """dbt retry parity: re-run only error/skipped models, serving
    successful upstreams from their stored snapshots (no rebuild)."""

    def test_retry_runs_only_failed_subset(self, spark, tmp_path):
        reg = ModelRegistry()
        calls = {"good": 0, "flaky": 0, "child": 0}

        def good(deps, prev, full):
            calls["good"] += 1
            return spark.range(5).selectExpr("id AS k")

        state = {"fail": True}

        def flaky(deps, prev, full):
            calls["flaky"] += 1
            if state["fail"]:
                raise RuntimeError("transient")
            return spark.range(3).selectExpr("id AS k", "id * 2 AS v")

        def child(deps, prev, full):
            calls["child"] += 1
            return deps["flaky"].join(deps["good"], "k")

        reg.register(Model(name="good", builder=good))
        reg.register(Model(name="flaky", builder=flaky))
        reg.register(
            Model(name="child", deps=("flaky", "good"), builder=child)
        )
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ex = DagExecutor(reg, store, threads=3)
        _, ledger1 = ex.run({})
        by1 = {e["model"]: e["status"] for e in ledger1}
        assert by1 == {"good": "success", "flaky": "error", "child": "skipped"}

        state["fail"] = False
        out, ledger2 = ex.retry({}, ledger1)
        by2 = {e["model"]: e["status"] for e in ledger2}
        assert by2 == {"flaky": "success", "child": "success"}
        assert calls["good"] == 1  # success NOT rebuilt on retry
        assert calls["flaky"] == 2 and calls["child"] == 1
        assert out["child"].count() == 3

    def test_retry_noop_when_all_green(self, spark, tmp_path):
        reg = ModelRegistry()
        reg.register(
            Model(
                name="only",
                builder=lambda d, p, f: spark.range(2).selectExpr("id AS k"),
            )
        )
        store = SnapshotStore(spark, str(tmp_path / "wh2"))
        ex = DagExecutor(reg, store, threads=2)
        _, ledger = ex.run({})
        out, ledger2 = ex.retry({}, ledger)
        assert ledger2 == []


class TestConcurrentExecutorsOCC:
    """VERDICT r9: two schedulers racing one warehouse — the isolated
    merge path must detect the interleaved commit and retry, never
    silently clobber the other run's rows (q425's cert, pinned here
    with a minimal deterministic interleave)."""

    def test_interleaved_executor_merge_retries_and_preserves_both(
        self, spark, tmp_path
    ):
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        base = spark.range(60).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
        store.overwrite("t", base)

        batch_a = spark.range(60).selectExpr(
            "id AS k", "CAST(1 AS LONG) AS v"
        ).where("k % 2 = 0")
        batch_b = spark.range(60).selectExpr(
            "id AS k", "CAST(2 AS LONG) AS v"
        ).where("k % 3 = 0")

        reg_b = ModelRegistry()
        reg_b.register(
            Model(name="t", builder=lambda d, p, f: batch_b, unique_key="k")
        )
        exec_b = DagExecutor(reg_b, store, threads=1, isolated=True)

        scans = {"n": 0}

        def hook():
            scans["n"] += 1
            if scans["n"] == 1:
                _, lb = exec_b.run({})
                assert {e["status"] for e in lb} == {"success"}

        reg_a = ModelRegistry()
        reg_a.register(
            Model(name="t", builder=lambda d, p, f: batch_a, unique_key="k")
        )
        exec_a = DagExecutor(
            reg_a, store, threads=1, isolated=True, merge_hooks={"t": hook}
        )
        _, la = exec_a.run({})
        assert {e["status"] for e in la} == {"success"}
        assert scans["n"] >= 2  # A's merge re-scanned after the conflict

        got = {r.k: r.v for r in store.read("t").collect()}
        for k in range(60):
            exp = 1 if k % 2 == 0 else (2 if k % 3 == 0 else 0)
            assert got[k] == exp, (k, got[k], exp)

    def test_unisolated_executor_is_last_writer_wins(self, spark, tmp_path):
        """Without isolated=True the interleaved commit is silently
        overwritten — documents WHY q425 runs isolated (dbt default
        incremental semantics are last-writer-wins)."""
        store = SnapshotStore(spark, str(tmp_path / "wh2"), retain_versions=3)
        store.overwrite(
            "t", spark.range(6).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
        )
        batch_a = spark.range(6).selectExpr(
            "id AS k", "CAST(1 AS LONG) AS v"
        ).where("k % 2 = 0")
        batch_b = spark.range(6).selectExpr(
            "id AS k", "CAST(2 AS LONG) AS v"
        ).where("k % 3 = 0")

        reg_b = ModelRegistry()
        reg_b.register(
            Model(name="t", builder=lambda d, p, f: batch_b, unique_key="k")
        )
        exec_b = DagExecutor(reg_b, store, threads=1)
        fired = {"n": 0}

        def hook():
            fired["n"] += 1
            if fired["n"] == 1:
                exec_b.run({})

        reg_a = ModelRegistry()
        reg_a.register(
            Model(name="t", builder=lambda d, p, f: batch_a, unique_key="k")
        )
        exec_a = DagExecutor(
            reg_a, store, threads=1, merge_hooks={"t": hook}
        )
        exec_a.run({})
        got = {r.k: r.v for r in store.read("t").collect()}
        # B's non-overlapping row (k=3) was LOST: A merged against the
        # pre-B snapshot and committed blind.
        assert got[3] == 0
