"""Coordinated-commits DECLARATION (Delta 4.x
``coordinatedCommits-preview``): the table's metadata names its
commit coordinator, and ``DeltaLog.commit`` refuses any owner whose
``coordinator_name`` doesn't match — turning the q456/q463 owner
seam from a convention every writer must know into an enforced
protocol. SPARK-FREE — pure log manipulation.
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
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {}}
        ],
    }
)


def _mk_table(tmp_path) -> str:
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, dl.LOG_DIR))
    log = dl.DeltaLog(table)
    log.commit(
        [{"protocol": dl.PROTOCOL_ACTION},
         {"metaData": dl.make_metadata(SCHEMA)}],
        version=0,
    )
    return table


def _dm(tag: str) -> dict:
    return {
        "domainMetadata": {
            "domain": f"t.{tag}", "configuration": "{}",
            "removed": False,
        }
    }


def test_declaration_refuses_filesystem_writer(tmp_path):
    table = _mk_table(tmp_path)
    dl.DeltaLog(table).commit([_dm("pre")])  # v1 via filesystem: fine
    v = dl.enable_coordinated_commits(
        table, "staged-registry", {"endpoint": "local"}
    )
    assert v == 2  # the declaration is the LAST filesystem commit
    # coordinator-unaware writer must refuse, version unchanged
    foreign = dl.DeltaLog(table)
    with pytest.raises(dl.DeltaProtocolError, match="coordinator"):
        foreign.commit([_dm("forged")])
    assert foreign.latest_version() == 2
    # wrong-named coordinator refuses too
    wrong = dl.DeltaLog(
        table, owner=dl.StagedCommitOwner(coordinator_name="other")
    )
    with pytest.raises(dl.DeltaProtocolError, match="coordinator"):
        wrong.commit([_dm("forged2")])
    # the DECLARED coordinator routes
    right = dl.DeltaLog(
        table,
        owner=dl.StagedCommitOwner(coordinator_name="staged-registry"),
    )
    assert right.commit([_dm("ok")]) == 3
    snap = dl.DeltaLog(table).snapshot()
    assert "t.ok" in snap.domains and "t.forged" not in snap.domains


def test_declared_in_protocol_and_metadata(tmp_path):
    table = _mk_table(tmp_path)
    dl.enable_coordinated_commits(table, "cat", {"region": "x"})
    snap = dl.DeltaLog(table).snapshot()
    assert dl.COORDINATED_COMMITS_FEATURE in (
        snap.protocol.get("writerFeatures") or []
    )
    conf = snap.metadata["configuration"]
    assert conf[dl.COMMIT_COORDINATOR_PROP] == "cat"
    assert json.loads(conf[dl.COMMIT_COORDINATOR_CONF_PROP]) == {
        "region": "x"
    }
    # idempotent for the same name; switching requires disable
    assert dl.enable_coordinated_commits(table, "cat") == 1
    with pytest.raises(dl.DeltaProtocolError, match="already"):
        dl.enable_coordinated_commits(table, "other-cat")


def test_disable_goes_through_coordinator(tmp_path):
    table = _mk_table(tmp_path)
    dl.enable_coordinated_commits(table, "cat")
    # a foreign writer cannot unilaterally un-coordinate the table
    with pytest.raises(dl.DeltaProtocolError, match="coordinator"):
        dl.disable_coordinated_commits(
            table, dl.FileSystemCommitOwner()
        )
    owner = dl.StagedCommitOwner(coordinator_name="cat")
    v = dl.disable_coordinated_commits(table, owner)
    assert v == 2
    # filesystem commits resume after the disable lands
    assert dl.DeltaLog(table).commit([_dm("post")]) == 3
    conf = dl.DeltaLog(table).snapshot().metadata["configuration"]
    assert dl.COMMIT_COORDINATOR_PROP not in conf


def test_enable_commit_itself_is_filesystem(tmp_path):
    """The declaration commit is written via plain putIfAbsent (prev
    metadata is still un-coordinated) — the spec's 'last filesystem
    commit' rule — so its canonical <v>.json exists on disk."""
    table = _mk_table(tmp_path)
    v = dl.enable_coordinated_commits(table, "cat")
    assert os.path.isfile(
        os.path.join(table, dl.LOG_DIR, f"{v:020d}.json")
    )


def test_uncoordinated_tables_unaffected(tmp_path):
    """No declaration -> any owner commits, including named ones."""
    table = _mk_table(tmp_path)
    assert dl.DeltaLog(table).commit([_dm("a")]) == 1
    named = dl.DeltaLog(
        table, owner=dl.StagedCommitOwner(coordinator_name="cat")
    )
    assert named.commit([_dm("b")]) == 2
