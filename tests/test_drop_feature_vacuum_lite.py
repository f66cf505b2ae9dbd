"""DROP FEATURE (explicit protocol downgrade, Delta PROTOCOL.md) and
VACUUM LITE (log-derived victim set, Delta 4.0) — SPARK-FREE, pure
log manipulation over handcrafted tables.
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

_DAY = 86_400_000


def _mk(tmp_path, name="t") -> str:
    table = str(tmp_path / name)
    os.makedirs(os.path.join(table, dl.LOG_DIR))
    return table


def _add(name: str, dv: dict | None = None) -> dict:
    a = {"path": f"{name}.parquet", "partitionValues": {},
         "size": 4, "modificationTime": 0, "dataChange": True}
    if dv:
        a["deletionVector"] = dv
    return {"add": a}


def _remove(name: str, ts: int, dv: dict | None = None) -> dict:
    r = {"path": f"{name}.parquet", "dataChange": True,
         "deletionTimestamp": ts}
    if dv:
        r["deletionVector"] = dv
    return {"remove": r}


def _touch(table: str, name: str):
    with open(os.path.join(table, f"{name}.parquet"), "wb") as fh:
        fh.write(b"PAR1")


# ------------------------------------------------------- vacuum lite


def test_vacuum_lite_collects_lapsed_tombstones_only(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": dl.make_metadata(SCHEMA)},
                _add("f0"), _add("f1")], version=0)
    log.commit([_remove("f0", ts=1 * _DAY), _add("f2")], version=1)
    log.commit([_remove("f1", ts=50 * _DAY), _add("f3")], version=2)
    for f in ("f0", "f1", "f2", "f3", "orphan"):
        _touch(table, f)
    now = 55 * _DAY  # f0 lapsed (7d default), f1 still retained
    victims = dl.DeltaLog(table).vacuum_lite(now_ms=now)
    assert victims == ["f0.parquet"]
    assert not os.path.exists(os.path.join(table, "f0.parquet"))
    # retained tombstone, live files, and the UNTRACKED orphan all
    # survive — lite never lists, so it cannot see the orphan
    for f in ("f1", "f2", "f3", "orphan"):
        assert os.path.exists(os.path.join(table, f + ".parquet"))
    # ...while FULL vacuum's listing does find the orphan
    full = dl.DeltaLog(table).vacuum(dry_run=True, now_ms=now)
    assert "orphan.parquet" in full


def test_vacuum_lite_readded_path_is_live(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": dl.make_metadata(SCHEMA)},
                _add("f0")], version=0)
    log.commit([_remove("f0", ts=1 * _DAY)], version=1)
    log.commit([_add("f0")], version=2)  # re-added: live again
    _touch(table, "f0")
    assert dl.DeltaLog(table).vacuum_lite(now_ms=100 * _DAY) == []
    assert os.path.exists(os.path.join(table, "f0.parquet"))


def test_vacuum_lite_protocol_check(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": [], "writerFeatures": ["martianWrite"]}
    log.commit([{"protocol": proto},
                {"metaData": dl.make_metadata(SCHEMA)},
                _add("f0")], version=0)
    with pytest.raises(dl.DeltaProtocolError, match="martianWrite"):
        dl.DeltaLog(table).vacuum_lite(now_ms=100 * _DAY)


# ------------------------------------------------------ drop feature

DV = {"storageType": "u", "pathOrInlineDv": "ab^-aqEH.-t@S}K{vb[*k^",
      "offset": 1, "sizeInBytes": 36, "cardinality": 2}


def _dv_table(tmp_path) -> str:
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["deletionVectors"],
             "writerFeatures": ["deletionVectors"]}
    meta = dl.make_metadata(SCHEMA)
    meta["configuration"] = {"delta.enableDeletionVectors": "true"}
    log.commit([{"protocol": proto}, {"metaData": meta},
                _add("f0")], version=0)
    log.commit([_remove("f0", ts=0, dv=None), _add("f1", dv=DV)],
               version=1)
    return table


def test_drop_refused_while_active_then_history_dirty(tmp_path):
    table = _dv_table(tmp_path)
    # gate 1a: property still enabled
    with pytest.raises(dl.DeltaProtocolError, match="still true"):
        dl.drop_table_feature(table, "deletionVectors")
    log = dl.DeltaLog(table)
    meta = dict(log.snapshot().metadata)
    meta["configuration"] = {}
    log.commit([{"metaData": meta}], version=2)
    # gate 1b: a live file still carries a DV
    with pytest.raises(dl.DeltaProtocolError, match="purge"):
        dl.drop_table_feature(table, "deletionVectors")
    # purge: rewrite the DV'd file
    log.commit([_remove("f1", ts=0, dv=DV), _add("f2")], version=3)
    # gate 2: history still carries traces
    with pytest.raises(dl.DeltaProtocolError,
                       match="TRUNCATE HISTORY"):
        dl.drop_table_feature(table, "deletionVectors")


def test_drop_succeeds_after_history_truncation(tmp_path):
    table = _dv_table(tmp_path)
    log = dl.DeltaLog(table)
    meta = dict(log.snapshot().metadata)
    meta["configuration"] = {}
    log.commit([{"metaData": meta}], version=2)
    log.commit([_remove("f1", ts=0, dv=DV), _add("f2")], version=3)
    _touch(table, "f2")
    # TRUNCATE HISTORY: checkpoint the clean snapshot, lapse the log
    log.write_checkpoint(3)
    dl.DeltaLog(table).cleanup_log(now_ms=10_000 * _DAY)
    v = dl.drop_table_feature(table, "deletionVectors")
    snap = dl.DeltaLog(table).snapshot()
    assert snap.version == v
    assert "deletionVectors" not in (
        snap.protocol.get("readerFeatures") or [])
    assert "deletionVectors" not in (
        snap.protocol.get("writerFeatures") or [])
    # idempotent once gone
    assert dl.drop_table_feature(table, "deletionVectors") == v


def test_drop_writer_only_feature(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    proto = {"minReaderVersion": 1, "minWriterVersion": 7,
             "writerFeatures": ["appendOnly"]}
    meta = dl.make_metadata(SCHEMA)
    meta["configuration"] = {dl.APPEND_ONLY_PROP: "true"}
    log.commit([{"protocol": proto}, {"metaData": meta},
                _add("f0")], version=0)
    with pytest.raises(dl.DeltaProtocolError, match="appendOnly"):
        dl.drop_table_feature(table, "appendOnly")
    meta2 = dict(dl.DeltaLog(table).snapshot().metadata)
    meta2["configuration"] = {}
    dl.DeltaLog(table).commit([{"metaData": meta2}], version=1)
    dl.drop_table_feature(table, "appendOnly")
    assert "appendOnly" not in (
        dl.DeltaLog(table).snapshot().protocol.get("writerFeatures")
        or [])
