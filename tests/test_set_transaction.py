"""SetTransaction / ``txn`` actions (Delta PROTOCOL.md "Transaction
Identifiers"): the idempotent-writer protocol — a retried
application version is a no-op, state survives every checkpoint
form. SPARK-FREE.
"""

from __future__ import annotations

import json
import os

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


def _mk(tmp_path) -> str:
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, dl.LOG_DIR))
    dl.DeltaLog(table).commit(
        [{"protocol": dl.PROTOCOL_ACTION},
         {"metaData": dl.make_metadata(SCHEMA)}],
        version=0,
    )
    return table


def _add(name: str) -> dict:
    return {"add": {"path": f"{name}.parquet", "partitionValues": {},
                    "size": 4, "modificationTime": 0,
                    "dataChange": True}}


def test_commit_txn_idempotent(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    assert log.txn_version("app-1") is None
    v = log.commit_txn([_add("b0")], "app-1", 0)
    assert v == 1 and log.txn_version("app-1") == 0
    # replay of batch 0: no-op, nothing committed
    assert log.commit_txn([_add("b0dup")], "app-1", 0) is None
    assert log.latest_version() == 1
    assert "b0dup.parquet" not in dl.DeltaLog(table).snapshot().files
    # an OLDER version replay is also a no-op
    log.commit_txn([_add("b1")], "app-1", 1)
    assert log.commit_txn([_add("stale")], "app-1", 0) is None
    # independent applications do not interfere
    assert log.commit_txn([_add("other")], "app-2", 0) is not None
    snap = dl.DeltaLog(table).snapshot()
    assert snap.transactions == {"app-1": 1, "app-2": 0}


@pytest.mark.parametrize("form", ["v1", "multipart", "v2", "v2json"])
def test_txn_state_survives_checkpoints(tmp_path, form):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit_txn([_add("b0")], "app-1", 7)
    log.commit_txn([_add("x")], "app-2", 3)
    if form == "v1":
        log.write_checkpoint(log.latest_version())
    elif form == "multipart":
        log.write_checkpoint_multipart(log.latest_version())
    elif form == "v2":
        log.write_checkpoint_v2(log.latest_version())
    else:
        log.write_checkpoint_v2(
            log.latest_version(), manifest_format="json"
        )
    # truncate the tail so the checkpoint is the ONLY source
    dl.DeltaLog(table).cleanup_log(now_ms=10_000 * 86_400_000)
    dl.clear_snapshot_cache()
    fresh = dl.DeltaLog(table)
    assert fresh.snapshot().transactions == {"app-1": 7, "app-2": 3}
    # the idempotence gate still holds post-checkpoint
    assert fresh.commit_txn([_add("dup")], "app-1", 7) is None
    assert fresh.commit_txn([_add("b8")], "app-1", 8) is not None


_DAY = 86_400_000


def test_txn_retention_expires_at_checkpoint(tmp_path):
    """delta.setTransactionRetentionDuration: lapsed txn entries are
    dropped AT CHECKPOINT TIME — the expired app loses its
    idempotence gate (the spec's documented cost), fresh apps keep
    theirs."""
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    meta = dict(log.snapshot().metadata)
    meta["configuration"] = {
        dl.SET_TXN_RETENTION_PROP: "interval 7 days"
    }
    log.commit([{"metaData": meta}], version=1)
    log.commit_txn([_add("old")], "app-old", 5,
                   last_updated_ms=1 * _DAY)
    log.commit_txn([_add("new")], "app-new", 9,
                   last_updated_ms=53 * _DAY)
    # both gates live pre-checkpoint (state from the JSON tail)
    assert log.txn_version("app-old") == 5
    log.write_checkpoint(log.latest_version(), now_ms=55 * _DAY)
    dl.DeltaLog(table).cleanup_log(now_ms=10_000 * _DAY)
    dl.clear_snapshot_cache()
    fresh = dl.DeltaLog(table)
    # expired entry gone from checkpoint state; fresh one kept with
    # its original stamp
    assert fresh.txn_version("app-old") is None
    assert fresh.txn_version("app-new") == 9
    assert fresh.snapshot().txn_updated["app-new"] == 53 * _DAY
    # the expired app's replay gate is GONE (documented risk)...
    assert fresh.commit_txn([_add("old2")], "app-old", 5) is not None
    # ...while the fresh app still dedupes
    assert fresh.commit_txn([_add("dup")], "app-new", 9) is None


def test_no_retention_property_keeps_forever(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit_txn([_add("b")], "app-1", 1, last_updated_ms=0)
    log.write_checkpoint(log.latest_version(), now_ms=10_000 * _DAY)
    dl.DeltaLog(table).cleanup_log(now_ms=10_000 * _DAY)
    dl.clear_snapshot_cache()
    assert dl.DeltaLog(table).txn_version("app-1") == 1
