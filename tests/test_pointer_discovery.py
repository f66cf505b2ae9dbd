"""Pointer-first checkpoint discovery (round 11): readers resolve
the checkpoint from ``_last_checkpoint`` — one O(1) read, the spec's
documented path — instead of LISTing the log directory; a stale or
torn pointer falls back to listing discovery. Pure-filesystem tests
(no Spark): the log layer is JSON + pyarrow only.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from product_analytics_spark.sources import delta_log as dl

TDIR = "/tmp/pa_test_ptrdisc/t"

SCHEMA = (
    '{"type":"struct","fields":[{"name":"k","type":"long",'
    '"nullable":true,"metadata":{}}]}'
)


@pytest.fixture()
def tdir():
    shutil.rmtree("/tmp/pa_test_ptrdisc", ignore_errors=True)
    os.makedirs(TDIR, exist_ok=True)
    yield TDIR
    shutil.rmtree("/tmp/pa_test_ptrdisc", ignore_errors=True)


def _add(name: str) -> dict:
    return {
        "add": {
            "path": name,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
            "stats": '{"numRecords":1,"minValues":{"k":1},'
            '"maxValues":{"k":1},"nullCount":{"k":0}}',
        }
    }


def _build(tdir, n_commits=4):
    log = dl.DeltaLog(tdir)
    log.commit(
        [
            {"protocol": dict(dl.PROTOCOL_ACTION)},
            {"metaData": dl.make_metadata(SCHEMA, [])},
            _add("f0.parquet"),
        ],
        version=0,
    )
    for i in range(1, n_commits):
        log.commit([_add(f"f{i}.parquet")], version=i)
    return log


def _no_listing(monkeypatch):
    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("listing discovery used despite pointer")

    monkeypatch.setattr(dl.DeltaLog, "_checkpoint_groups", boom)


@pytest.mark.parametrize("form", ["v1", "mp", "v2", "v2json"])
def test_pointer_resolves_every_form(tdir, monkeypatch, form):
    log = _build(tdir)
    v = log.latest_version()
    if form == "v1":
        log.write_checkpoint(v)
    elif form == "mp":
        log.write_checkpoint_multipart(v, n_parts=2)
    elif form == "v2":
        log.write_checkpoint_v2(v, max_actions_per_sidecar=2)
    else:
        log.write_checkpoint_v2(
            v, max_actions_per_sidecar=2, manifest_format="json"
        )
    dl.clear_snapshot_cache()
    _no_listing(monkeypatch)
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.version == v
    assert len(snap.files) == 4


def test_pointer_plus_tail(tdir, monkeypatch):
    log = _build(tdir, n_commits=3)
    log.write_checkpoint(2)
    log.commit([_add("f3.parquet")], version=3)
    dl.clear_snapshot_cache()
    _no_listing(monkeypatch)
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.version == 3 and len(snap.files) == 4


def test_stale_pointer_with_cleaned_tail_falls_back(tdir):
    log = _build(tdir, n_commits=3)
    log.write_checkpoint(2)
    stale = json.load(
        open(os.path.join(log.log_dir, "_last_checkpoint"))
    )
    log.commit([_add("f3.parquet")], version=3)
    log.write_checkpoint(3)
    log.cleanup_log()  # commits 0..2 gone
    # regress the pointer to the SUPERSEDED checkpoint (its file is
    # also gone): replay from it would gap — must fall back to listing
    with open(
        os.path.join(log.log_dir, "_last_checkpoint"), "w"
    ) as fh:
        json.dump(stale, fh)
    dl.clear_snapshot_cache()
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.version == 3 and len(snap.files) == 4


def test_torn_pointer_falls_back(tdir):
    log = _build(tdir)
    v = log.latest_version()
    paths = log.write_checkpoint_multipart(v, n_parts=2)
    log.write_checkpoint(v)  # second, complete form at same version
    os.unlink(paths[1])  # tear the multi-part the pointer... points at?
    # force the pointer at the torn mp form
    dl.DeltaLog(tdir)._write_last_checkpoint(
        {"version": v, "size": 6, "parts": 2}
    )
    dl.clear_snapshot_cache()
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.version == v and len(snap.files) == 4


def test_missing_pointer_uses_listing(tdir):
    log = _build(tdir)
    v = log.latest_version()
    log.write_checkpoint(v)
    os.unlink(os.path.join(log.log_dir, "_last_checkpoint"))
    dl.clear_snapshot_cache()
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.version == v and len(snap.files) == 4
