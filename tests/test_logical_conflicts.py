"""Logical conflict detection + commit rebase (Delta PROTOCOL.md
"Concurrency Control" / delta-spark ConflictChecker): blanket
version-OCC treats every concurrent commit as a conflict; the
checker classifies winners against the transaction's read/write
sets so logically-disjoint commits REBASE instead of failing.
SPARK-FREE — pure log manipulation.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from product_analytics_spark.sources import delta_log as dl

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}}
        ],
    }
)


def _mk(tmp_path, part_cols=()) -> str:
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, dl.LOG_DIR))
    dl.DeltaLog(table).commit(
        [{"protocol": dl.PROTOCOL_ACTION},
         {"metaData": dl.make_metadata(SCHEMA, list(part_cols))}],
        version=0,
    )
    return table


def _add(name: str, pv: dict | None = None) -> dict:
    return {"add": {"path": f"{name}.parquet",
                    "partitionValues": pv or {}, "size": 4,
                    "modificationTime": 0, "dataChange": True}}


def _rm(name: str) -> dict:
    return {"remove": {"path": f"{name}.parquet", "dataChange": True,
                       "deletionTimestamp": 0}}


def test_blind_appends_rebase_without_conflict(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    # two appends planned against the SAME snapshot (version 0):
    v1 = log.commit_with_rebase([_add("a")], expected_version=0)
    v2 = log.commit_with_rebase([_add("b")], expected_version=0)
    assert (v1, v2) == (1, 2)  # second rebased, no exception
    assert sorted(log.snapshot().files) == [
        "a.parquet", "b.parquet"
    ]


def test_metadata_change_never_rebases(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    meta = dict(log.snapshot().metadata)
    log.commit([{"metaData": meta}], version=1)
    with pytest.raises(dl.MetadataChangedError):
        log.commit_with_rebase([_add("a")], expected_version=0)


def test_delete_read_and_delete_delete(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit([_add("a"), _add("b")], version=1)
    # winner deletes a.parquet at v2
    log.commit([_rm("a")], version=2)
    # loser planned at v1 and READ a.parquet
    with pytest.raises(dl.ConcurrentDeleteReadError):
        log.commit_with_rebase(
            [_add("c")], expected_version=1,
            read_files={"a.parquet"},
        )
    # loser also REMOVES a.parquet
    with pytest.raises(dl.ConcurrentDeleteDeleteError):
        log.commit_with_rebase(
            [_rm("a"), _add("c")], expected_version=1,
        )
    # loser that read only b.parquet is disjoint: rebases
    assert log.commit_with_rebase(
        [_add("c")], expected_version=1, read_files={"b.parquet"}
    ) == 3


def test_append_conflicts_only_with_reads(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit([_add("a")], version=1)  # winner appended
    # full-table reader conflicts with the append
    with pytest.raises(dl.ConcurrentAppendError):
        log.commit_with_rebase(
            [_add("b")], expected_version=0, read_whole_table=True,
        )
    # blind append does not
    assert log.commit_with_rebase(
        [_add("c")], expected_version=0
    ) == 2


def test_partition_scoped_append_conflict(tmp_path):
    table = _mk(tmp_path, part_cols=("p",))
    log = dl.DeltaLog(table)
    log.commit([_add("a", {"p": "1"})], version=1)
    # a txn that read only partition p=2 is blind to the p=1 add
    assert log.commit_with_rebase(
        [_add("b", {"p": "2"})], expected_version=0,
        read_partitions={"p": "2"},
    ) == 2
    # one that read p=1 conflicts
    with pytest.raises(dl.ConcurrentAppendError):
        log.commit_with_rebase(
            [_add("c", {"p": "1"})], expected_version=0,
            read_partitions={"p": "1"},
        )


def test_threaded_blind_appenders_all_land(tmp_path):
    table = _mk(tmp_path)
    errs: list[Exception] = []

    def _w(tag: int):
        log = dl.DeltaLog(table)
        base = log.latest_version() or 0
        for i in range(4):
            try:
                log.commit_with_rebase(
                    [_add(f"w{tag}c{i}")], expected_version=base,
                )
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

    ts = [threading.Thread(target=_w, args=(t,)) for t in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    snap = dl.DeltaLog(table).snapshot()
    assert len(snap.files) == 12  # every append landed exactly once
    assert dl.DeltaLog(table).latest_version() == 12
