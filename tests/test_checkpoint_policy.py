"""Auto-checkpoint cadence and form as TABLE PROPERTIES
(``delta.checkpointInterval`` / ``delta.checkpointPolicy``) —
SPARK-FREE log manipulation.
"""

from __future__ import annotations

import json
import os

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


def _mk(tmp_path, conf: dict | None = None) -> str:
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, dl.LOG_DIR))
    meta = dl.make_metadata(SCHEMA)
    meta["configuration"] = dict(conf or {})
    dl.DeltaLog(table).commit(
        [{"protocol": dl.PROTOCOL_ACTION}, {"metaData": meta}],
        version=0,
    )
    return table


def _dm(tag: str) -> dict:
    return {"domainMetadata": {"domain": f"t.{tag}",
                               "configuration": "{}",
                               "removed": False}}


def _cp_files(table: str) -> list[str]:
    return sorted(
        f for f in os.listdir(os.path.join(table, dl.LOG_DIR))
        if ".checkpoint." in f or f.endswith(".checkpoint.parquet")
    )


def test_custom_interval(tmp_path):
    table = _mk(tmp_path, {"delta.checkpointInterval": "3"})
    log = dl.DeltaLog(table)
    for i in range(7):
        log.commit([_dm(f"c{i}")])
    # interval 3: checkpoints at versions 2 and 5 ((v+1) % 3 == 0)
    cps = _cp_files(table)
    vers = sorted(int(f.split(".")[0]) for f in cps)
    assert vers == [2, 5]


def test_v2_policy_writes_v2_manifests(tmp_path):
    table = _mk(tmp_path, {"delta.checkpointInterval": "2",
                           "delta.checkpointPolicy": "v2"})
    log = dl.DeltaLog(table)
    for i in range(4):
        log.commit([_dm(f"c{i}")])
    cps = _cp_files(table)
    # v2 manifests are <v>.checkpoint.<uuid>.parquet (not the
    # classic single-file <v>.checkpoint.parquet name)
    assert cps and all(
        not f.endswith(".checkpoint.parquet")
        or f.count(".") > 2
        for f in cps
    )
    # and the snapshot reconstructs through them after truncation
    dl.DeltaLog(table).cleanup_log(now_ms=10_000 * 86_400_000)
    dl.clear_snapshot_cache()
    snap = dl.DeltaLog(table).snapshot()
    assert sum(1 for d in snap.domains if d.startswith("t.")) == 4


def test_default_interval_unchanged(tmp_path):
    table = _mk(tmp_path)
    log = dl.DeltaLog(table)
    for i in range(10):
        log.commit([_dm(f"c{i}")])
    vers = sorted(int(f.split(".")[0]) for f in _cp_files(table))
    assert vers == [9]  # classic default interval 10
