"""Tests for the jsonl_sink Python DataSourceWriter: two-phase
commit, manifest, no staged leftovers, round-trip fidelity, and
abort cleanup."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from product_analytics_spark.sources import pyds


class TestJsonlSinkEndToEnd:
    def test_commit_protocol_and_roundtrip(self, spark, tmp_path):
        pyds.register_sink(spark)
        out = str(tmp_path / "out")
        df = spark.range(0, 1000, 1, 4).select(
            F.col("id"), (F.col("id") * 7 % 13).alias("v")
        )
        df.write.format("jsonl_sink").mode("append").option("path", out).save()
        names = sorted(os.listdir(out))
        assert "_MANIFEST.json" in names
        assert not [n for n in names if n.startswith(".staging-")]
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["total_rows"] == 1000
        assert sum(f["rows"] for f in manifest["files"]) == 1000
        # every listed file exists and line counts match the manifest
        for entry in manifest["files"]:
            p = os.path.join(out, entry["file"])
            assert sum(1 for _ in open(p)) == entry["rows"]
        back = spark.read.json(os.path.join(out, "part-*.jsonl"))
        assert back.count() == 1000
        got = sorted((r.id, r.v) for r in back.collect())
        assert got == [(i, i * 7 % 13) for i in range(1000)]

    def test_empty_partitions_leave_no_files(self, spark, tmp_path):
        pyds.register_sink(spark)
        out = str(tmp_path / "empty")
        spark.range(0, 0, 1, 4).write.format("jsonl_sink").mode("append").option(
            "path", out
        ).save()
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest == {"files": [], "total_rows": 0}
        assert sorted(os.listdir(out)) == ["_MANIFEST.json"]


class TestWriterUnitLevel:
    def test_abort_removes_staged_files(self, tmp_path):
        out = str(tmp_path / "abort")
        w = pyds.JsonlWriter({"path": out})

        class _Row:
            def __init__(self, i):
                self.i = i

            def asDict(self):  # noqa: N802 (Row API)
                return {"i": self.i}

        msgs = [w.write(iter([_Row(1), _Row(2)])), w.write(iter([_Row(3)]))]
        assert all(os.path.exists(m.path) for m in msgs)
        w.abort(msgs)
        assert os.listdir(out) == []

    def test_missing_path_option_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="path"):
            pyds.JsonlWriter({})
