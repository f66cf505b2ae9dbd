"""Exactly-once streaming sink under checkpoint-restart replay
(VERDICT r8 item 5): foreachBatch + idempotent merge absorbs the
at-least-once re-delivery a mid-commit crash causes.

Complements q424 (driver_queries_ext90.py): the driver cert compares
the full closed-form feed cross-engine; these tests pin the protocol
details — the replayed batch keeps its epoch id, the append sink
measures the duplicate delivery, the merge sink stays duplicate-free,
and a crash-free run delivers every batch exactly once.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.sources import pyds
from product_analytics_spark.sources.sinks import SnapshotStore

TOTAL, BATCH, SHARDS = 1200, 400, 2


def _run_stream(spark, ckpt, sink, expect_failure):
    src = (
        spark.readStream.format("cdc_pstream")
        .option("total_rows", str(TOTAL))
        .option("batch_rows", str(BATCH))
        .option("shards", str(SHARDS))
        .load()
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    except Exception:
        if not expect_failure:
            raise
        try:
            q.stop()
        except Exception:  # noqa: BLE001
            pass


class TestExactlyOnceRestart:
    def test_replay_absorbed_by_merge_measured_by_append(
        self, spark, tmp_path
    ):
        pyds.register_parallel_stream(spark)
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        ledger = tmp_path / "deliveries.jsonl"
        append_dir = str(tmp_path / "append")
        ckpt = str(tmp_path / "ckpt")

        def make_sink(crash_at):
            def sink(df, batch_id):
                df = df.persist()
                df.write.mode("append").parquet(append_dir)
                store.merge("t", df, "op_id")
                df.unpersist()
                with open(ledger, "a", encoding="utf-8") as fh:
                    fh.write(json.dumps({"b": batch_id}) + "\n")
                if crash_at is not None and batch_id == crash_at:
                    raise RuntimeError("injected crash pre-offset-commit")

            return sink

        _run_stream(spark, ckpt, make_sink(1), expect_failure=True)
        _run_stream(spark, ckpt, make_sink(None), expect_failure=False)

        delivered = [
            json.loads(ln)["b"] for ln in open(ledger, encoding="utf-8")
        ]
        # batch 1 delivered twice WITH THE SAME EPOCH ID; 0 and 2 once
        assert sorted(delivered) == [0, 1, 1, 2]

        merged = store.read("t")
        appended = spark.read.parquet(append_dir)
        assert merged.count() == TOTAL
        assert merged.select("op_id").distinct().count() == TOTAL
        assert appended.count() == TOTAL + BATCH  # the replay, measured
        # no losses either: every feed op_id present exactly once
        expect = spark.range(TOTAL).selectExpr("id AS op_id")
        assert merged.select("op_id").exceptAll(expect).count() == 0
        assert expect.exceptAll(merged.select("op_id")).count() == 0

    def test_crash_free_run_is_exactly_once_everywhere(
        self, spark, tmp_path
    ):
        pyds.register_parallel_stream(spark)
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        append_dir = str(tmp_path / "append")
        ckpt = str(tmp_path / "ckpt")

        def sink(df, batch_id):
            df = df.persist()
            df.write.mode("append").parquet(append_dir)
            store.merge("t", df, "op_id")
            df.unpersist()

        _run_stream(spark, ckpt, sink, expect_failure=False)
        assert store.read("t").count() == TOTAL
        assert spark.read.parquet(append_dir).count() == TOTAL

    def test_restart_after_clean_finish_is_a_noop(self, spark, tmp_path):
        """A second run over a DRAINED checkpoint delivers nothing —
        the availability reseed must not re-deliver committed data."""
        pyds.register_parallel_stream(spark)
        ledger = tmp_path / "l.jsonl"
        ckpt = str(tmp_path / "ckpt")

        def sink(df, batch_id):
            n = df.count()
            with open(ledger, "a", encoding="utf-8") as fh:
                fh.write(json.dumps({"b": batch_id, "n": n}) + "\n")

        _run_stream(spark, ckpt, sink, expect_failure=False)
        _run_stream(spark, ckpt, sink, expect_failure=False)
        entries = [
            json.loads(ln) for ln in open(ledger, encoding="utf-8")
        ]
        nonempty = [e for e in entries if e["n"] > 0]
        assert sum(e["n"] for e in nonempty) == TOTAL
        assert sorted(e["b"] for e in nonempty) == [0, 1, 2]
