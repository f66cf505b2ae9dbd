"""Coordinated commits with Delta 4.x's ``_staged_commits/`` file
layout (round-11 verdict item 5): commits are staged as immutable
UUID-named files, ratified in the owner's flock'd registry, readable
BEFORE backfill, and backfillable to canonical ``<version>.json``
names for coordinator-unaware readers.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from product_analytics_spark.sources import delta_log as dl

SCHEMA = json.dumps({
    "type": "struct",
    "fields": [{"name": "k", "type": "long",
                "nullable": True, "metadata": {}}],
})


def _mk(tmp_path):
    tdir = str(tmp_path / "t")
    os.makedirs(os.path.join(tdir, dl.LOG_DIR))
    log = dl.DeltaLog(tdir, owner=dl.StagedCommitOwner())
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": dl.make_metadata(SCHEMA)}], version=0)
    return tdir, log


def _dm(tag):
    return {"domainMetadata": {"domain": tag, "configuration": "{}",
                               "removed": False}}


def test_staged_commits_readable_before_backfill(tmp_path):
    tdir, log = _mk(tmp_path)
    log.commit([_dm("a")], version=1)
    log.commit([_dm("b")], version=2)
    ldir = os.path.join(tdir, dl.LOG_DIR)
    # nothing published at canonical names...
    assert not any(
        f.endswith(".json") and not f.startswith("_")
        for f in os.listdir(ldir)
        if os.path.isfile(os.path.join(ldir, f))
    )
    sdir = os.path.join(ldir, dl.STAGED_DIR)
    staged = [f for f in os.listdir(sdir) if dl._STAGED_RE.match(f)]
    assert len(staged) == 3
    # ...yet ANY reader sees the full history via the registry
    fresh = dl.DeltaLog(tdir)
    assert fresh.latest_version() == 2
    snap = fresh.snapshot()
    assert {"a", "b"} <= set(snap.domains)


def test_race_one_winner_then_backfill_sweeps_losers(tmp_path):
    tdir, log = _mk(tmp_path)
    owner = dl.StagedCommitOwner()
    log2 = dl.DeltaLog(tdir, owner=owner)
    log.commit([_dm("w1")], version=1)
    with pytest.raises(dl.DeltaConflictError):
        log2.commit([_dm("w2")], version=1)
    sdir = os.path.join(tdir, dl.LOG_DIR, dl.STAGED_DIR)
    v1_files = [f for f in os.listdir(sdir)
                if f.startswith(f"{1:020d}.")]
    assert len(v1_files) == 2  # winner + loser garbage
    published = dl.StagedCommitOwner.backfill(
        os.path.join(tdir, dl.LOG_DIR))
    assert published == 2  # v0, v1
    v1_after = [f for f in os.listdir(sdir)
                if f.startswith(f"{1:020d}.")]
    assert len(v1_after) == 1  # loser swept, ratified file kept
    # the published file IS the ratified content
    reg = dl._staged_ratified(os.path.join(tdir, dl.LOG_DIR))
    with open(os.path.join(sdir, reg[1]), encoding="utf-8") as fh:
        staged_body = fh.read()
    with open(os.path.join(tdir, dl.LOG_DIR, f"{1:020d}.json"),
              encoding="utf-8") as fh:
        assert fh.read() == staged_body
    # a coordinator-unaware reader reads the backfilled table
    snap = dl.DeltaLog(tdir).snapshot()
    assert "w1" in snap.domains and "w2" not in snap.domains


def test_filesystem_owner_refuses_ratified_version(tmp_path):
    tdir, log = _mk(tmp_path)
    log.commit([_dm("staged")], version=1)  # ratified, unbackfilled
    fs_log = dl.DeltaLog(tdir)  # hardlink default owner
    with pytest.raises(dl.DeltaConflictError, match="coordinator"):
        fs_log.owner.put_if_absent(
            os.path.join(tdir, dl.LOG_DIR), 1, "{}\n")
    # and the fs owner's natural next version lands fine
    fs_log.commit([_dm("after")], version=2)
    assert dl.DeltaLog(tdir).latest_version() == 2


def test_grant_survives_staged_file_loss(tmp_path):
    """The catalog property: a granted version stays granted even if
    the staged FILE vanishes out-of-band — re-minting is refused."""
    tdir, log = _mk(tmp_path)
    log.commit([_dm("x")], version=1)
    ldir = os.path.join(tdir, dl.LOG_DIR)
    reg = dl._staged_ratified(ldir)
    os.unlink(os.path.join(ldir, dl.STAGED_DIR, reg[1]))
    with pytest.raises(dl.DeltaConflictError):
        dl.StagedCommitOwner().put_if_absent(ldir, 1, "{}\n")


def test_threaded_race_contiguous_staged(tmp_path):
    tdir, _log = _mk(tmp_path)
    errs: list[Exception] = []

    def _writer(tag: int):
        log = dl.DeltaLog(tdir, owner=dl.StagedCommitOwner())
        for i in range(4):
            dm = _dm(f"st.w{tag}.c{i}")
            for _ in range(300):
                v = (log.latest_version() or 0) + 1
                try:
                    log.commit([dm], version=v)
                    break
                except dl.DeltaConflictError:
                    continue
            else:  # pragma: no cover
                errs.append(RuntimeError(f"w{tag} starved"))

    ts = [threading.Thread(target=_writer, args=(t,)) for t in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    log = dl.DeltaLog(tdir)
    assert log.latest_version() == 12
    snap = log.snapshot()
    assert sum(1 for d in snap.domains if d.startswith("st.")) == 12
    # ratification order IS version order: registry covers 0..12
    reg = dl._staged_ratified(os.path.join(tdir, dl.LOG_DIR))
    assert sorted(reg) == list(range(13))
    # backfill publishes the whole history for unaware readers
    assert dl.StagedCommitOwner.backfill(
        os.path.join(tdir, dl.LOG_DIR)) == 13
    assert dl.DeltaLog(tdir).latest_version() == 12


def test_ict_monotonic_across_staged_boundary(tmp_path):
    tdir, log = _mk(tmp_path)
    log.commit([_dm("a")], version=1, timestamp_ms=5000)
    # _prev_ict must find version 1 in the staged dir
    log.commit([_dm("b")], version=2, timestamp_ms=10)  # clock skew
    hist = dl.DeltaLog(tdir).history()
    icts = {h["version"]: h.get("inCommitTimestamp") for h in hist}
    assert icts[2] == 5001  # clamped to prev + 1, not 10
