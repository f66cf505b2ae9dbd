"""SnapshotStore commit protocol + physical layout (S4-S7).

The pointer-commit property is what makes the OSS fallback honest:
an uncommitted version write must be invisible to readers, and the
commit must be a single atomic pointer replace. The layout tests pin
the S6/S7 guarantees the scale notes promise: one file per hive
partition directory and cluster-key ordering inside each file.
"""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.sources.sinks import SnapshotStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    return SnapshotStore(spark, str(tmp_path_factory.mktemp("sink_wh")))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, part string, v double")


class TestCommitProtocol:
    def test_uncommitted_version_is_invisible(self, spark, store):
        v1 = _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
        store.overwrite("t1", v1)
        # Write a new version WITHOUT committing (= crash before the
        # pointer replace): readers must still see v1.
        v2 = _df(spark, [(1, "a", 9.0)])
        pending = store._write_version("t1", v2)
        got = {(r.k, r.v) for r in store.read("t1").collect()}
        assert got == {(1, 1.0), (2, 2.0)}
        # Commit -> readers see v2; superseded version is GC'd.
        store._commit("t1", pending)
        got = {(r.k, r.v) for r in store.read("t1").collect()}
        assert got == {(1, 9.0)}
        versions = [
            d for d in os.listdir(store.path("t1")) if d.startswith("v_")
        ]
        assert versions == [pending]

    def test_merge_reads_old_version_while_writing_new(self, spark, store):
        store.overwrite("t2", _df(spark, [(1, "a", 1.0), (2, "a", 2.0)]))
        merged = store.merge("t2", _df(spark, [(2, "a", 20.0), (3, "a", 3.0)]), "k")
        got = {(r.k, r.v) for r in merged.collect()}
        assert got == {(1, 1.0), (2, 20.0), (3, 3.0)}

    def test_exists_and_first_run(self, spark, store):
        assert not store.exists("never_written")
        assert store.read("never_written") is None


class TestPhysicalLayout:
    def test_one_file_per_hive_partition(self, spark, store):
        rows = [(i, "p%d" % (i % 3), float(i)) for i in range(300)]
        store.overwrite("t3", _df(spark, rows), partition_by=("part",), cluster_by=("k",))
        data = store.current_data_dir("t3")
        part_dirs = sorted(glob.glob(os.path.join(data, "part=*")))
        assert len(part_dirs) == 3
        for d in part_dirs:
            files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
            assert len(files) == 1, f"expected one file in {d}, got {files}"

    def test_cluster_keys_sorted_within_files(self, spark, store):
        rows = [(i * 37 % 500, "x", float(i)) for i in range(500)]
        store.overwrite("t4", _df(spark, rows), partition_by=("part",), cluster_by=("k",))
        data = store.current_data_dir("t4")
        for f in glob.glob(os.path.join(data, "part=*", "*.parquet")):
            ks = [r.k for r in spark.read.parquet(f).select("k").collect()]
            assert ks == sorted(ks), f"cluster key not sorted in {f}"

    def test_append_lands_in_committed_version(self, spark, store):
        store.overwrite("t5", _df(spark, [(1, "a", 1.0)]))
        store.append("t5", _df(spark, [(2, "a", 2.0)]))
        got = {r.k for r in store.read("t5").collect()}
        assert got == {1, 2}


class TestBucketedJoin:
    def test_bucketed_tables_join_without_exchange(self, spark, tmp_path):
        """SCALE.md's co-located-join claim, proven at the plan level:
        two tables bucketed on the join key by the same bucket count
        hash-partition identically on disk, so the sort-merge join
        needs NO Exchange on either side — the 100 TB recipe for
        repeated large-large joins (bucket once, join many times)."""
        a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "va", F.col("k") * 2
        )
        b = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
            "vb", F.col("k") + 7
        )
        # DROP TABLE alone is not enough across sessions: the
        # in-memory catalog forgets the table but the warehouse dir
        # survives, and a later managed CREATE fails on the leftover
        # location — clear both.
        import shutil

        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
        b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
        # Tiny test tables would broadcast (which also avoids the
        # shuffle, but proves nothing about bucketing) — force the
        # sort-merge path the co-location argument is about.
        keys = (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
        prev = {k: spark.conf.get(k, None) for k in keys}
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert j.count() == 1000
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for t in ("bkt_a", "bkt_b"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
                shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


class TestCompaction:
    """q199's planner executes for real: plan ≡ execution, contents
    hash-identical, file count drops, prior layout time-travelable."""

    def test_compact_plan_equals_execution(self, spark, tmp_path):
        from product_analytics_spark.sources.sinks import SnapshotStore

        store = SnapshotStore(spark, str(tmp_path / "wh"), retain_versions=2)
        df = spark.range(0, 1000).selectExpr("id AS k", "id * 7 AS v")
        # Land 8 deliberately-small files.
        store.overwrite("t", df.repartition(8))
        data_dir = store.current_data_dir("t")
        n_small = len(
            [f for f in __import__("os").listdir(data_dir) if f.endswith(".parquet")]
        )
        assert n_small == 8
        before_rows = sorted(tuple(r) for r in store.read("t").collect())

        # Target ~3 groups: total bytes / 3 (rounded up) per group.
        import os as _os

        total = sum(
            _os.path.getsize(_os.path.join(data_dir, f))
            for f in _os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        target = total // 3 + 1
        plan = store.plan_compaction("t", target_bytes=target)
        stats = store.compact("t", target_bytes=target)

        # plan ≡ execution: the executed group count is the planned one
        # and every planned file was consumed exactly once.
        assert stats["groups"] == len(plan)
        assert stats["files_before"] == n_small
        assert stats["files_after"] == len(plan) < n_small

        # contents identical, prior version still readable (time travel).
        after_rows = sorted(tuple(r) for r in store.read("t").collect())
        assert after_rows == before_rows
        prior = store.read("t", version=0)
        assert sorted(tuple(r) for r in prior.collect()) == before_rows

    def test_compact_partitioned_table(self, spark, tmp_path):
        """Round-6 verdict medium: a hive-partitioned table must plan
        and execute compaction PER PARTITION DIRECTORY (previously the
        top-level-only listing yielded an empty plan and compact
        silently no-oped). Groups never mix partitions; rewritten
        files land in the same relative subdir so the dir-encoded
        partition column survives read-back."""
        from product_analytics_spark.sources.sinks import SnapshotStore

        store = SnapshotStore(spark, str(tmp_path / "whp"), retain_versions=2)
        base = spark.range(0, 300).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part", "id * 1.5 AS v"
        )
        store.overwrite("tp", base, partition_by=["part"])
        # Land 3 extra small files per partition via appends.
        for i in range(3):
            store.append(
                "tp",
                base.withColumn("k", F.col("k") + 1000 * (i + 1)),
                partition_by=["part"],
            )
        data = store.current_data_dir("tp")
        per_dir_before = {
            rel: len(fs) for rel, fs in store._partition_dirs(data)
        }
        assert set(per_dir_before) == {"part=0", "part=1", "part=2"}
        assert all(n >= 4 for n in per_dir_before.values())
        before_rows = sorted(tuple(r) for r in store.read("tp").collect())

        # Huge target -> exactly one group per partition directory.
        plan = store.plan_compaction("tp", target_bytes=1 << 30)
        assert len(plan) == 3  # loud, not an empty no-op plan
        for group in plan:
            assert len({os.path.dirname(f) for f in group}) == 1

        stats = store.compact("tp", target_bytes=1 << 30)
        assert stats["groups"] == len(plan)
        assert stats["files_before"] == sum(per_dir_before.values())
        assert stats["files_after"] == 3 < stats["files_before"]
        per_dir_after = {
            rel: len(fs)
            for rel, fs in store._partition_dirs(store.current_data_dir("tp"))
        }
        assert per_dir_after == {"part=0": 1, "part=1": 1, "part=2": 1}
        # Contents (incl. the dir-encoded partition column) identical.
        after_rows = sorted(tuple(r) for r in store.read("tp").collect())
        assert after_rows == before_rows


class TestCopyOnWriteDML:
    """Delta-style COW DELETE/UPDATE: only files containing a matching
    row are rewritten; untouched files are HARDLINKED into the new
    version (same inode — zero data movement); pointer commit flips
    readers atomically; prior version stays time-travelable."""

    def test_delete_where_rewrites_only_touched_files(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "dml"), retain_versions=2)
        df = spark.range(0, 800).selectExpr("id AS k", "id % 10 AS v")
        # range-partitioned 8 files => the k-range predicate touches 1-2
        store.overwrite("t", df.repartitionByRange(8, "k").sortWithinPartitions("k"))
        before = store.current_data_dir("t")
        inodes_before = {
            os.path.basename(f): os.stat(f).st_ino
            for _r, fs in store._partition_dirs(before)
            for f in fs
        }
        stats = store.delete_where("t", "k >= 700")
        assert stats["rows_before"] == 800
        assert stats["rows_after"] == 700
        assert stats["files_rewritten"] <= 2
        assert stats["files_linked"] == stats["files_total"] - stats["files_rewritten"]
        # linked files are the SAME inodes (no copy)
        after = store.current_data_dir("t")
        inodes_after = {
            os.path.basename(f): os.stat(f).st_ino
            for _r, fs in store._partition_dirs(after)
            for f in fs
        }
        shared = set(inodes_before) & set(inodes_after)
        assert sum(inodes_before[b] == inodes_after[b] for b in shared) >= stats[
            "files_linked"
        ]
        got = {r.k for r in store.read("t").collect()}
        assert got == set(range(700))
        # pre-delete version still readable
        prior = store.read("t", version=0)
        assert prior.count() == 800

    def test_update_where_partitioned_touches_one_dir(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "dml2"), retain_versions=2)
        df = spark.range(0, 300).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part", "id * 1.0 AS v"
        )
        store.overwrite("tp", df, partition_by=["part"])
        stats = store.update_where(
            "tp", "part = '1' AND k % 2 = 0", {"v": "v + 1000.0"}
        )
        assert stats["rows_before"] == stats["rows_after"] == 300
        # only part=1's file(s) contain matches; part=0/2 hardlinked
        assert stats["files_rewritten"] >= 1
        assert stats["files_linked"] >= 2
        rows = {(r.k, r.part, r.v) for r in store.read("tp").collect()}
        for k in range(300):
            part = str(k % 3)
            expect_v = k + 1000.0 if (part == "1" and k % 2 == 0) else float(k)
            assert (k, int(part) if False else part, expect_v) in rows or (
                k,
                int(part),
                expect_v,
            ) in {(r[0], r[1], r[2]) for r in rows}

    def test_update_partition_column_raises(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "dml3"))
        df = spark.range(0, 30).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part"
        )
        store.overwrite("tq", df, partition_by=["part"])
        with pytest.raises(ValueError, match="partition columns"):
            store.update_where("tq", "k > 5", {"part": "'9'"})


class TestOptimisticConcurrency:
    """Delta-style optimistic concurrency on the pointer commit: a
    transaction presents the version it READ; if another writer moved
    the pointer in between, the commit refuses (nothing flips, the
    uncommitted version dir is cleaned up) instead of silently
    dropping the other writer's rows. isolated merge retries."""

    def test_conflicting_overwrite_raises_and_cleans_up(self, spark, tmp_path):
        from product_analytics_spark.sources.sinks import (
            ConcurrentWriteError,
            SnapshotStore,
        )

        store = SnapshotStore(spark, str(tmp_path / "occ"))
        store.overwrite("t", spark.range(5).selectExpr("id AS k"))
        v0 = store.current_version("t")
        # Another writer commits in between.
        store.overwrite("t", spark.range(5, 9).selectExpr("id AS k"))
        with pytest.raises(ConcurrentWriteError, match="version moved"):
            store.overwrite(
                "t",
                spark.range(100, 103).selectExpr("id AS k"),
                expected_version=v0,
            )
        # Loser's uncommitted version dir was cleaned; winner intact.
        dirs = [d for d in os.listdir(store.path("t")) if d.startswith("v_")]
        assert len(dirs) == 1
        assert {r.k for r in store.read("t").collect()} == {5, 6, 7, 8}

    def test_first_write_expects_none(self, spark, tmp_path):
        from product_analytics_spark.sources.sinks import SnapshotStore

        store = SnapshotStore(spark, str(tmp_path / "occ2"))
        assert store.current_version("fresh") is None
        store.overwrite(
            "fresh", spark.range(3).selectExpr("id AS k"), expected_version=None
        )
        assert store.read("fresh").count() == 3

    def test_isolated_merge_retries_after_conflict(
        self, spark, tmp_path, monkeypatch
    ):
        from product_analytics_spark.sources.sinks import SnapshotStore

        store = SnapshotStore(spark, str(tmp_path / "occ3"))
        store.overwrite(
            "t", spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
        )
        # First snapshot read returns a STALE version (simulating a
        # concurrent commit between read and commit); later reads are
        # real, so the retry succeeds.
        real = store.current_version
        calls = {"n": 0}

        def stale_once(name):
            calls["n"] += 1
            if calls["n"] == 1:
                return "v_gone_stale"
            return real(name)

        monkeypatch.setattr(store, "current_version", stale_once)
        out = store.merge(
            "t",
            spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, v double"),
            "k",
            isolated=True,
        )
        got = {(r.k, r.v) for r in out.collect()}
        assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}
        assert calls["n"] >= 3  # stale read + conflict check + retry

    def test_isolated_merge_exhausts_retries(self, spark, tmp_path, monkeypatch):
        from product_analytics_spark.sources.sinks import (
            ConcurrentWriteError,
            SnapshotStore,
        )

        store = SnapshotStore(spark, str(tmp_path / "occ4"))
        store.overwrite("t", spark.range(3).selectExpr("id AS k"))
        # Odd calls = the merge's snapshot read (stale), even calls =
        # the commit's conflict check (real) -> every attempt conflicts.
        real = store.current_version
        calls = {"n": 0}

        def alternating(name):
            calls["n"] += 1
            return "v_always_stale" if calls["n"] % 2 == 1 else real(name)

        monkeypatch.setattr(store, "current_version", alternating)
        with pytest.raises(ConcurrentWriteError):
            store.merge(
                "t",
                spark.range(3, 5).selectExpr("id AS k"),
                "k",
                isolated=True,
                max_retries=2,
            )


class TestDmlOptimisticConcurrency:
    """Round-8: OCC threaded through the COW DML and compaction commit
    paths (VERDICT r7 item 1 — these committed UNCHECKED before, so a
    merge landing between a DML scan and its commit was a silent lost
    update). The fault-injection hook (post_scan) lands the concurrent
    commit deterministically inside the scan→commit window."""

    def test_delete_where_retries_on_concurrent_merge(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "d1"), retain_versions=3)
        store.overwrite(
            "t",
            spark.createDataFrame(
                [(k, 100.0) for k in range(10)], "k long, v double"
            ),
        )
        batch = spark.createDataFrame([(1, 999.0), (4, 999.0)], "k long, v double")
        scans = {"n": 0}

        def merge_once():
            scans["n"] += 1
            if scans["n"] == 1:
                store.merge("t", batch, "k")

        store.delete_where("t", "k % 2 = 0", post_scan=merge_once)
        assert scans["n"] == 2  # conflict forced a second scan
        got = {(r.k, r.v) for r in store.read("t").collect()}
        # Serial merge→delete: k=4's update deleted with it, k=1's kept.
        assert got == {(1, 999.0), (3, 100.0), (5, 100.0), (7, 100.0), (9, 100.0)}

    def test_update_where_retries_on_concurrent_merge(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "u1"), retain_versions=3)
        store.overwrite(
            "t",
            spark.createDataFrame(
                [(k, 100.0) for k in range(6)], "k long, v double"
            ),
        )
        batch = spark.createDataFrame([(0, 50.0)], "k long, v double")
        scans = {"n": 0}

        def merge_once():
            scans["n"] += 1
            if scans["n"] == 1:
                store.merge("t", batch, "k")

        store.update_where("t", "k < 2", {"v": "v + 1"}, post_scan=merge_once)
        assert scans["n"] == 2
        got = {(r.k, r.v) for r in store.read("t").collect()}
        # Serial merge→update: k=0 is 50+1, not 100+1 (lost-update check).
        assert (0, 51.0) in got and (1, 101.0) in got

    def test_compact_replans_on_concurrent_merge(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "c1"), retain_versions=3)
        store.overwrite(
            "t",
            spark.createDataFrame(
                [(k, 1.0) for k in range(64)], "k long, v double"
            ).repartition(8),
        )
        batch = spark.createDataFrame([(0, 777.0)], "k long, v double")
        plans = {"n": 0}

        def merge_once():
            plans["n"] += 1
            if plans["n"] == 1:
                store.merge("t", batch, "k")

        stats = store.compact("t", post_scan=merge_once)
        assert plans["n"] == 2  # stale rewrite refused, replanned
        assert stats["files_after"] == 1
        got = {r.v for r in store.read("t").where("k = 0").collect()}
        assert got == {777.0}  # the merge survived the compaction

    def test_delete_where_exhausts_retries(self, spark, tmp_path):
        from product_analytics_spark.sources.sinks import ConcurrentWriteError

        store = SnapshotStore(spark, str(tmp_path / "d2"), retain_versions=3)
        store.overwrite(
            "t",
            spark.createDataFrame([(k, 1.0) for k in range(4)], "k long, v double"),
        )

        def always_conflict():  # a writer lands inside EVERY attempt
            store.merge(
                "t",
                spark.createDataFrame([(0, 2.0)], "k long, v double"),
                "k",
            )

        with pytest.raises(ConcurrentWriteError):
            store.delete_where(
                "t", "k >= 0", post_scan=always_conflict
            )
        # The table still reflects only committed merges — nothing lost,
        # nothing half-deleted, and no orphan uncommitted version dirs
        # beyond the retention window.
        assert store.read("t").count() == 4
        dirs = [d for d in os.listdir(store.path("t")) if d.startswith("v_")]
        assert len(dirs) <= 3

    def test_cow_survives_snapshot_gc(self, spark, tmp_path):
        # retain_versions=1: the concurrent merge GCs the version the
        # delete scanned mid-rewrite; the hardlink source vanishing is
        # the SAME conflict, surfaced earlier — must retry, not crash.
        store = SnapshotStore(spark, str(tmp_path / "d3"), retain_versions=1)
        store.overwrite(
            "t",
            spark.createDataFrame(
                [(k, 1.0) for k in range(8)], "k long, v double"
            ).repartition(4),
        )
        scans = {"n": 0}

        def merge_once():
            scans["n"] += 1
            if scans["n"] == 1:
                store.merge(
                    "t",
                    spark.createDataFrame([(0, 9.0)], "k long, v double"),
                    "k",
                )

        store.delete_where("t", "k >= 6", post_scan=merge_once)
        assert scans["n"] == 2
        got = {(r.k, r.v) for r in store.read("t").collect()}
        assert got == {(0, 9.0)} | {(k, 1.0) for k in range(1, 6)}


class TestCowUriDecoding:
    """ADVICE r7: input_file_name() returns percent-encoded URIs; paths
    or hive partition values with encoded characters (space, %, #,
    non-ASCII) must still match the os.walk manifest, or their files
    silently escape the rewrite (DELETE no-ops on them)."""

    @pytest.mark.parametrize("subdir", ["with space", "pct%40dir", "uni_é"])
    def test_delete_in_encoded_warehouse_path(self, spark, tmp_path, subdir):
        store = SnapshotStore(spark, str(tmp_path / subdir / "wh"))
        store.overwrite(
            "t",
            spark.createDataFrame([(k, 1.0) for k in range(6)], "k long, v double"),
        )
        stats = store.delete_where("t", "k < 3")
        assert stats["files_rewritten"] >= 1
        assert {r.k for r in store.read("t").collect()} == {3, 4, 5}

    def test_delete_with_encoded_partition_values(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "whp"))
        df = spark.createDataFrame(
            [(0, "north america", 1.0), (1, "north america", 2.0),
             (2, "emea#south", 3.0), (3, "100% juice", 4.0)],
            "k long, region string, v double",
        )
        store.overwrite("t", df, partition_by=["region"])
        stats = store.delete_where("t", "k IN (0, 2)")
        assert stats["files_rewritten"] >= 2  # both encoded dirs rewritten
        got = {(r.k, r.region) for r in store.read("t").collect()}
        assert got == {(1, "north america"), (3, "100% juice")}

    def test_stray_scan_file_fails_loudly(self, spark, tmp_path, monkeypatch):
        # If decoding ever regresses (scanned URIs no longer resolve to
        # manifest paths), the manifest-subset assertion must raise
        # rather than silently hardlink the stray file unchanged.
        import urllib.parse

        store = SnapshotStore(spark, str(tmp_path / "whs"))
        store.overwrite(
            "t", spark.createDataFrame([(1, 1.0)], "k long, v double")
        )
        monkeypatch.setattr(
            urllib.parse, "unquote", lambda s, *a, **kw: s + ".GONE"
        )
        with pytest.raises(RuntimeError, match="manifest"):
            store.delete_where("t", "k = 1")


class TestCommitLockLease:
    """ADVICE r7+r8: the commit mutex is an fcntl.flock on a PERSISTENT
    lock file — the kernel releases it when the holder's fd closes
    (including on crash), so there is no staleness heuristic and none
    of the lease-breaking races an age-judged O_EXCL file has."""

    def test_crashed_holder_lock_is_instantly_acquirable(
        self, spark, tmp_path
    ):
        store = SnapshotStore(spark, str(tmp_path / "lk"))
        store.overwrite("t", spark.range(2).selectExpr("id AS k"))
        lock = os.path.join(store.path("t"), "_COMMIT_LOCK")
        # A crashed writer leaves the FILE but no kernel lock — the
        # next committer proceeds immediately (no 30s lease wait).
        assert os.path.exists(lock)
        t0 = time.time()
        store.overwrite("t", spark.range(5).selectExpr("id AS k"))
        assert time.time() - t0 < 8.0  # no lease timeout was waited
        assert store.read("t").count() == 5

    def test_held_lock_blocks_until_timeout(self, spark, tmp_path):
        import fcntl

        store = SnapshotStore(spark, str(tmp_path / "lk2"))
        store.overwrite("t", spark.range(2).selectExpr("id AS k"))
        lock = os.path.join(store.path("t"), "_COMMIT_LOCK")
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        fcntl.flock(fd, fcntl.LOCK_EX)  # live holder (other writer)
        try:
            with pytest.raises(TimeoutError, match="lock busy"):
                store.overwrite("t", spark.range(5).selectExpr("id AS k"))
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)
        # Holder released ⇒ the same commit now goes through.
        store.overwrite("t", spark.range(7).selectExpr("id AS k"))
        assert store.read("t").count() == 7


class TestZorderLayout:
    """Round-8: true multi-column Z-ORDER in the write path (reference
    orders_cleaned.sql:15 OPTIMIZE ... ZORDER BY). The composite sort
    clusters only its FIRST key — every file spans nearly the full
    range of the 2nd key, so min/max stats prune nothing for 2nd-key
    predicates. The Morton layout must prune most files for the same
    predicate, with identical data read back."""

    @staticmethod
    def _skip_fraction(data_dir, col, lo, hi):
        """Fraction of parquet files whose [min,max] footer stats for
        ``col`` do NOT overlap [lo, hi] — exactly the files a stats-
        based reader skips."""
        import pyarrow.parquet as pq

        files = sorted(
            glob.glob(os.path.join(data_dir, "*.parquet"))
        )
        skipped = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            overlap = False
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        st = c.statistics
                        if st.min <= hi and st.max >= lo:
                            overlap = True
            if not overlap:
                skipped += 1
        return skipped / len(files), len(files)

    def test_zorder_prunes_second_key_composite_does_not(
        self, spark, tmp_path
    ):
        df = spark.range(256 * 256).selectExpr(
            "id % 256 AS x", "id div 256 AS y", "id AS payload"
        )
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        store.overwrite("comp", df, cluster_by=("x", "y"), n_files=16)
        store.overwrite("zo", df, zorder_by=("x", "y"), n_files=16)

        # predicate on the SECOND key: y in the bottom 1/16 of its range
        f_comp, n_comp = self._skip_fraction(
            store.current_data_dir("comp"), "y", 0, 15
        )
        f_zo, n_zo = self._skip_fraction(
            store.current_data_dir("zo"), "y", 0, 15
        )
        assert n_comp >= 8 and n_zo >= 8  # layout actually split files
        assert f_comp <= 0.2  # composite: y spans ~everything per file
        assert f_zo >= 0.5   # z-order: most files are prunable
        assert f_zo > f_comp + 0.25

        # first key still prunes under zorder too (locality is 2-D)
        f_zo_x, _ = self._skip_fraction(
            store.current_data_dir("zo"), "x", 0, 15
        )
        assert f_zo_x >= 0.5

        # identical logical content
        a = {tuple(r) for r in store.read("comp").collect()}
        b = {tuple(r) for r in store.read("zo").collect()}
        assert a == b and len(a) == 256 * 256

    def test_zorder_three_columns_and_exclusivity(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh3"))
        df = spark.range(4096).selectExpr(
            "id % 16 AS a", "(id div 16) % 16 AS b", "id div 256 AS c"
        )
        store.overwrite("t", df, zorder_by=("a", "b", "c"), n_files=8)
        assert store.read("t").count() == 4096
        assert "__zval" not in store.read("t").columns
        with pytest.raises(ValueError, match="exclusive"):
            store.overwrite(
                "t2", df, cluster_by=("a",), zorder_by=("a", "b")
            )


class TestOptimizeRecluster:
    """Round-8: OPTIMIZE proper — compaction that RESTORES the table's
    declared clustering from the recorded _LAYOUT metadata. Appends
    degrade footer-stat skipping (new files span arbitrary key
    ranges); optimize() re-sorts each partition dir on the layout keys
    (recomputed Morton z-value for zorder_by) and skipping returns."""

    def test_optimize_restores_zorder_after_append(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        base = spark.range(256 * 256).selectExpr(
            "id % 256 AS x", "id div 256 AS y", "id AS payload"
        )
        store.overwrite("t", base, zorder_by=("x", "y"), n_files=16)
        f0, _ = TestZorderLayout._skip_fraction(
            store.current_data_dir("t"), "y", 0, 15
        )
        assert f0 >= 0.5

        # degrade: append files spanning the full y range
        extra = spark.range(16384).selectExpr(
            "id % 256 AS x", "(id * 37) % 256 AS y", "id + 100000 AS payload"
        ).repartition(16)
        store.append("t", extra)
        f_degraded, n_deg = TestZorderLayout._skip_fraction(
            store.current_data_dir("t"), "y", 0, 15
        )
        assert n_deg >= 30  # appended files landed
        assert f_degraded <= f0 - 0.3  # skipping decayed materially

        before = {tuple(r) for r in store.read("t").collect()}
        total = sum(
            os.path.getsize(f)
            for f in glob.glob(
                os.path.join(store.current_data_dir("t"), "*.parquet")
            )
        )
        stats = store.optimize("t", target_bytes=max(1, total // 12))
        assert stats["reclustered"] is True
        assert stats["files_after"] < stats["files_before"]
        f_restored, _ = TestZorderLayout._skip_fraction(
            store.current_data_dir("t"), "y", 0, 15
        )
        assert f_restored >= 0.5 and f_restored > f_degraded + 0.2
        assert {tuple(r) for r in store.read("t").collect()} == before

    def test_optimize_without_layout_falls_back_to_compact(
        self, spark, tmp_path
    ):
        store = SnapshotStore(spark, str(tmp_path / "wh2"))
        store.overwrite(
            "t", spark.range(1000).selectExpr("id AS k").repartition(8)
        )
        stats = store.optimize("t")
        assert stats["reclustered"] is False
        assert stats["files_after"] == 1
        assert store.read("t").count() == 1000

    def test_optimize_partitioned_cluster_by(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh3"))
        df = spark.createDataFrame(
            [(k, f"g{k % 2}", k * 31 % 97) for k in range(2000)],
            "k long, grp string, v long",
        )
        store.overwrite(
            "t", df, partition_by=["grp"], cluster_by=["v"]
        )
        store.append(
            "t",
            spark.createDataFrame(
                [(k + 5000, f"g{k % 2}", 96 - (k * 7 % 97)) for k in range(500)],
                "k long, grp string, v long",
            ).repartition(3),
            partition_by=["grp"],
        )
        before = {tuple(r) for r in store.read("t").collect()}
        stats = store.optimize("t")
        assert stats["reclustered"] is True
        # hive dirs survive, files sorted by v within each
        data = store.current_data_dir("t")
        dirs = sorted(glob.glob(os.path.join(data, "grp=*")))
        assert len(dirs) == 2
        for d in dirs:
            for f in glob.glob(os.path.join(d, "*.parquet")):
                vs = [r.v for r in spark.read.parquet(f).select("v").collect()]
                assert vs == sorted(vs)
        assert {tuple(r) for r in store.read("t").collect()} == before

    def test_merge_does_not_wipe_layout(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh4"))
        df = spark.range(100).selectExpr("id AS k", "id % 10 AS a", "id % 7 AS b")
        store.overwrite("t", df, zorder_by=("a", "b"))
        store.merge(
            "t",
            spark.range(100, 110).selectExpr("id AS k", "id % 10 AS a", "id % 7 AS b"),
            "k",
        )
        assert store.layout("t")["zorder_by"] == ["a", "b"]


class TestCommitLogGc:
    """Round-8: the commit log truncates to the retention window
    (Delta log-cleanup analog), GC deletes only previously COMMITTED
    versions, and a concurrent writer's uncommitted dir survives
    another writer's commit (the old every-v_-dir sweep destroyed the
    last writer's data under unchecked concurrency); crashed writers'
    orphans are vacuumed by age."""

    def test_log_truncates_to_retention_window(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh"), retain_versions=2)
        for i in range(5):
            store.overwrite("t", spark.range(i + 1).selectExpr("id AS k"))
        log = store._log_path("t")
        with open(log, encoding="utf-8") as fh:
            lines = [ln for ln in fh if ln.strip()]
        assert len(lines) == 2  # retention window, not 5
        assert len(store.versions("t")) == 2
        assert store.read("t", version=0).count() == 4  # time travel intact

    def test_inflight_writer_dir_survives_concurrent_commit(
        self, spark, tmp_path
    ):
        store = SnapshotStore(spark, str(tmp_path / "wh2"))
        store.overwrite("t", spark.range(3).selectExpr("id AS k"))
        # writer A stages but has not committed
        staged = store._write_version(
            "t", spark.range(100, 105).selectExpr("id AS k")
        )
        # writer B commits; its GC must NOT sweep A's uncommitted dir
        store.overwrite("t", spark.range(7).selectExpr("id AS k"))
        assert os.path.isdir(os.path.join(store.path("t"), staged))
        # A (last-writer-wins) now commits; its data must be readable
        store._commit("t", staged)
        assert store.read("t").count() == 5

    def test_aged_orphan_is_vacuumed(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "wh3"))
        store.overwrite("t", spark.range(3).selectExpr("id AS k"))
        staged = store._write_version(
            "t", spark.range(9).selectExpr("id AS k")
        )
        p = os.path.join(store.path("t"), staged)
        old = os.path.getmtime(p) - store.ORPHAN_TTL_S - 60
        os.utime(p, (old, old))
        store.overwrite("t", spark.range(4).selectExpr("id AS k"))
        assert not os.path.isdir(p)  # crashed-writer debris vacuumed
        assert store.read("t").count() == 4


class TestEqualDepthZorder:
    """Skew-robust zorder lanes: equal-WIDTH bucketization collapses a
    skewed key's dense region into one lane (no z-locality inside 90%
    of the data → no skipping for predicates there); equal-DEPTH
    (approxQuantile range ids, Delta's scheme) spreads the mass across
    all lanes and restores it."""

    def test_equal_depth_prunes_inside_dense_region(self, spark, tmp_path):
        # 99% of x-values packed into [0, 16), 1% spread to 1e9.
        # Input partitioning pinned (range numPartitions=16) so
        # approxQuantile boundaries and range-exchange sampling don't
        # drift with whatever session state earlier test modules left,
        # and y DECORRELATED from x (id div 16, not id — id%16 and
        # id%256 are congruent mod 16, which smuggles x-locality into
        # y-sorted files and contaminates the width baseline).
        df = spark.range(0, 60000, 1, 16).selectExpr(
            "CASE WHEN id % 100 < 99 THEN id % 16 "
            "ELSE (id % 1000) * 1000000 END AS x",
            "(id div 16) % 256 AS y",
            "id AS payload",
        )
        store = SnapshotStore(spark, str(tmp_path / "wh"))
        store.overwrite("w", df, zorder_by=("x", "y"), n_files=32)
        store.overwrite(
            "d", df, zorder_by=("x", "y"), n_files=32, zorder_depth=True
        )
        assert store.layout("d")["zorder_depth"] is True

        # predicate inside the dense region: x in [2, 3]
        f_width, _ = TestZorderLayout._skip_fraction(
            store.current_data_dir("w"), "x", 2, 3
        )
        f_depth, _ = TestZorderLayout._skip_fraction(
            store.current_data_dir("d"), "x", 2, 3
        )
        # Structural claim (measured 0.0 vs 0.656): width lanes map the
        # whole dense region to lane 0 — no file can exclude x∈[2,3];
        # depth lanes spread it and most files skip.
        assert f_width <= 0.1
        assert f_depth >= 0.4
        assert f_depth >= f_width + 0.3
        # identical content either way
        a = {tuple(r) for r in store.read("w").collect()}
        b = {tuple(r) for r in store.read("d").collect()}
        assert a == b

    def test_optimize_honors_recorded_depth(self, spark, tmp_path):
        df = spark.range(0, 20000, 1, 16).selectExpr(
            "CASE WHEN id % 100 < 99 THEN id % 16 "
            "ELSE (id % 500) * 1000000 END AS x",
            "(id div 16) % 64 AS y",
            "id AS payload",
        )
        store = SnapshotStore(spark, str(tmp_path / "wh2"))
        store.overwrite(
            "t", df, zorder_by=("x", "y"), n_files=8, zorder_depth=True
        )
        store.append(
            "t",
            spark.range(20000, 24000).selectExpr(
                "id % 16 AS x", "(id * 7) % 64 AS y", "id AS payload"
            ).repartition(4),
        )
        before = {tuple(r) for r in store.read("t").collect()}
        data = store.current_data_dir("t")
        total = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(data, "*.parquet"))
        )
        stats = store.optimize("t", target_bytes=max(1, total // 8))
        assert stats["reclustered"] is True
        f_depth, _ = TestZorderLayout._skip_fraction(
            store.current_data_dir("t"), "x", 2, 3
        )
        # ~9 output files ⇒ coarse cells; the bar is that skipping
        # exists at all inside the dense region post-recluster (the
        # width-lane layout measures 0 there)
        assert f_depth >= 0.2  # depth lanes survived the recluster
        assert {tuple(r) for r in store.read("t").collect()} == before
