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
