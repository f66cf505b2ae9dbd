"""Time-based retention horizons (delta.io semantics) — round-11
verdict item 2:

* VACUUM spares tombstones inside
  ``delta.deletedFileRetentionDuration`` (default 7 days), so time
  travel to versions referencing them keeps working inside the
  window and dies after it lapses;
* ``cleanup_log`` spares commits inside
  ``delta.logRetentionDuration`` (default 30 days) and retreats its
  cutoff to a checkpoint at or below the first retained commit so
  every retained version stays reconstructible.

Both clocks are injectable (``now_ms``) — the engine's deterministic
tombstones sit at epoch 0, so wall-clock defaults preserve the old
collect-everything behavior for offline tables.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from product_analytics_spark.sources import delta_log as dl

DAY_MS = 86_400_000


def _mk_table(tmp_path, n_files=3, retention_conf=None):
    """A handcrafted log-managed table with ``n_files`` one-row
    parquet files, all added at version 1."""
    tdir = str(tmp_path / "t")
    os.makedirs(os.path.join(tdir, dl.LOG_DIR))
    meta = dl.make_metadata(json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long",
                    "nullable": True, "metadata": {}}],
    }))
    if retention_conf:
        meta["configuration"] = dict(retention_conf)
    log = dl.DeltaLog(tdir)
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": meta}], version=0)
    adds = []
    for i in range(n_files):
        rel = f"part-{i}.parquet"
        pq.write_table(
            pa.table({"k": pa.array([i], pa.int64())}),
            os.path.join(tdir, rel),
        )
        adds.append(dl.make_add(tdir, os.path.join(tdir, rel)))
    log.commit([{"add": a} for a in adds], version=1)
    return tdir, log


def _remove_at(log, rel, ts_ms, version=None):
    rm = dl.make_remove(rel)
    rm["deletionTimestamp"] = ts_ms
    return log.commit([{"remove": rm}], version=version,
                      operation="DELETE")


def test_vacuum_spares_tombstones_inside_window(tmp_path):
    tdir, log = _mk_table(tmp_path)
    now = 100 * DAY_MS
    _remove_at(log, "part-0.parquet", now - 2 * DAY_MS)   # recent
    _remove_at(log, "part-1.parquet", now - 30 * DAY_MS)  # lapsed

    victims = log.vacuum(now_ms=now)  # default 7d retention
    assert victims == ["part-1.parquet"]
    assert os.path.isfile(os.path.join(tdir, "part-0.parquet"))
    assert not os.path.isfile(os.path.join(tdir, "part-1.parquet"))

    # after the window lapses, the survivor is collected too
    victims2 = log.vacuum(now_ms=now + 10 * DAY_MS)
    assert victims2 == ["part-0.parquet"]


def test_vacuum_respects_table_property(tmp_path):
    tdir, log = _mk_table(
        tmp_path,
        retention_conf={
            dl.DELETED_FILE_RETENTION_PROP: "interval 1 hours"
        },
    )
    now = 100 * DAY_MS
    _remove_at(log, "part-0.parquet", now - 30 * 60 * 1000)  # 30 min
    _remove_at(log, "part-1.parquet", now - 2 * 3_600_000)   # 2 h
    victims = log.vacuum(now_ms=now)
    assert victims == ["part-1.parquet"]
    # explicit retention_ms overrides the property
    assert log.vacuum(retention_ms=0, now_ms=now) == ["part-0.parquet"]


def test_time_travel_survives_vacuum_inside_window(spark, tmp_path):
    tdir, log = _mk_table(tmp_path)
    now = 100 * DAY_MS
    _remove_at(log, "part-0.parquet", now - DAY_MS)
    assert log.vacuum(now_ms=now) == []
    # version 1 still references the tombstoned file — readable
    old = dl.read_delta(spark, tdir, version=1)
    assert old.count() == 3
    cur = dl.read_delta(spark, tdir)
    assert cur.count() == 2
    # outside the window the file goes, and travel to v1 with it
    assert log.vacuum(now_ms=now + 30 * DAY_MS) == ["part-0.parquet"]
    with pytest.raises(Exception):
        dl.read_delta(spark, tdir, version=1).collect()


def test_vacuum_wall_clock_default_collects_epoch_tombstones(tmp_path):
    """The engine's deterministic tombstones sit at epoch 0 — with
    the wall-clock default they are always past the 7-day window, so
    pre-existing behavior (collect everything dead) is unchanged."""
    tdir, log = _mk_table(tmp_path)
    _remove_at(log, "part-0.parquet", dl._FIXED_TIME_MS)
    assert log.vacuum() == ["part-0.parquet"]


def test_parse_interval_ms():
    assert dl.parse_interval_ms(None, 42) == 42
    assert dl.parse_interval_ms("interval 7 days", 0) == 7 * DAY_MS
    assert dl.parse_interval_ms("interval 1 week", 0) == 7 * DAY_MS
    assert dl.parse_interval_ms("INTERVAL 90 MINUTES", 0) == 5_400_000
    with pytest.raises(dl.DeltaProtocolError):
        dl.parse_interval_ms("7 days", 0)
    with pytest.raises(dl.DeltaProtocolError):
        dl.parse_interval_ms("interval seven days", 0)


def test_cleanup_log_spares_commits_inside_window(tmp_path):
    tdir, log = _mk_table(tmp_path)  # versions 0, 1
    now = 1000 * DAY_MS
    # versions 2..11: tombstone-free no-op metaData re-commits with
    # controlled in-commit timestamps — old below, recent above
    snap = log.snapshot()
    for v in range(2, 12):
        ts = (
            now - 60 * DAY_MS if v < 8      # expired (>30d)
            else now - 1 * DAY_MS + v       # retained (<30d)
        )
        log.commit([{"metaData": snap.metadata}], version=v,
                   timestamp_ms=ts)
    # checkpoints at 5 and 11 (explicit, interval-independent)
    log.write_checkpoint(5)
    log.write_checkpoint(11)

    removed = log.cleanup_log(now_ms=now)
    # first retained commit is v8; newest checkpoint <= 8 is 5 —
    # cutoff retreats to 5: versions 0..4 removed, 5+ survive
    assert removed == 5
    surviving = [v for v, _p in log._commits()]
    assert surviving == list(range(5, 12))
    # retained versions stay reconstructible
    assert log.snapshot(8).version == 8
    assert log.snapshot(11).version == 11


def test_cleanup_log_no_checkpoint_below_retained_is_noop(tmp_path):
    tdir, log = _mk_table(tmp_path)
    now = 1000 * DAY_MS
    snap = log.snapshot()
    # all commits RECENT; checkpoint above them
    for v in range(2, 6):
        log.commit([{"metaData": snap.metadata}], version=v,
                   timestamp_ms=now - 1000 + v)
    log.write_checkpoint(5)
    # v0/v1 carry ict 0/1000 (expired) but v2 is retained and no
    # checkpoint exists at or below 2 — nothing may be cleaned
    assert log.cleanup_log(now_ms=now) == 0
    assert [v for v, _p in log._commits()] == list(range(0, 6))


def test_cleanup_log_wall_clock_default_unchanged(tmp_path):
    """Deterministic ICTs (version*1000 ≈ epoch) are all past the
    30-day window under the wall clock — old behavior preserved."""
    tdir, log = _mk_table(tmp_path)
    snap = log.snapshot()
    for v in range(2, 6):
        log.commit([{"metaData": snap.metadata}], version=v)
    log.write_checkpoint(5)
    assert log.cleanup_log() == 5
    assert [v for v, _p in log._commits()] == [5]
