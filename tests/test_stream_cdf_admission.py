"""Mode-aware streaming admission (round 12): `_commit_cost` prices
what the read path actually serves — cdc files in change-feed mode
(not the COW rewrite's add churn), adds+removes for derived changes,
and ZERO for commits skip_change_commits will drop. Driven at the
reader-object level over handcrafted logs (no Spark needed).
"""

from __future__ import annotations

import os
import shutil

import pytest

from product_analytics_spark.sources import delta_log as dl
from product_analytics_spark.sources.delta_stream import (
    DeltaTailStreamReader,
)

TDIR = "/tmp/pa_test_cdfadm/t"

SCHEMA = (
    '{"type":"struct","fields":[{"name":"k","type":"long",'
    '"nullable":true,"metadata":{}}]}'
)


def _add(name: str, size: int, data_change: bool = True) -> dict:
    return {"add": {
        "path": name + ".parquet", "partitionValues": {},
        "size": size, "modificationTime": 0,
        "dataChange": data_change,
    }}


def _remove(name: str, size: int | None = None) -> dict:
    r = {"path": name + ".parquet", "dataChange": True,
         "deletionTimestamp": 0}
    if size is not None:
        r["size"] = size
    return {"remove": r}


def _cdc(name: str, size: int) -> dict:
    return {"cdc": {
        "path": f"_change_data/{name}.parquet",
        "partitionValues": {}, "size": size, "dataChange": False,
    }}


@pytest.fixture()
def tdir():
    shutil.rmtree("/tmp/pa_test_cdfadm", ignore_errors=True)
    os.makedirs(TDIR, exist_ok=True)
    log = dl.DeltaLog(TDIR)
    log.commit(
        [{"protocol": dict(dl.PROTOCOL_ACTION)},
         {"metaData": dl.make_metadata(SCHEMA, [])},
         _add("f0", 10)],
        version=0,
    )
    # v1: COW rewrite — 1000 B of add/remove churn, a 10 B cdc file
    log.commit([_cdc("c1", 10), _add("f1", 1000),
                _remove("f0", 10)], version=1)
    # v2: small append
    log.commit([_add("f2", 10)], version=2)
    # v3: derived-change commit (remove without cdc), remove w/o size
    log.commit([_add("f3", 10), _remove("f1")], version=3)
    yield TDIR
    shutil.rmtree("/tmp/pa_test_cdfadm", ignore_errors=True)


def _drain(reader) -> list[tuple[int, int]]:
    batches = []
    start = reader.initialOffset()["version"]
    for _ in range(50):
        end = reader.latestOffset()["version"]
        if end <= start:
            break
        reader.commit({"version": end})
        batches.append((start, end))
        start = end
    return batches


def test_cdf_prices_cdc_files_not_rewrite_churn(tdir):
    """Budget 30 B: v0(10) + v1(cdc 10) + v2(10) batch together in
    ONE trigger — pricing v1 by its 1010 B add/remove churn (the old
    bug) would force it to page alone."""
    b = _drain(DeltaTailStreamReader({
        "path": tdir, "read_change_feed": "true",
        "skip_change_commits": "false",
        "max_bytes_per_trigger": "30",
    }))
    assert b[0] == (0, 3) and (3, 4) in b


def test_cdf_derived_commit_prices_adds_plus_removes(tdir):
    """v3 has no cdc: its changes derive from the add (10 B) AND the
    remove (no size -> 0 B but 1 file). A 2-file cap must split v3
    from a preceding 1-file commit."""
    b = _drain(DeltaTailStreamReader({
        "path": tdir, "read_change_feed": "true",
        "skip_change_commits": "false",
        "max_files_per_trigger": "2",
    }))
    # v0 (1 file) + v1 (1 cdc file) fill the cap; v2+v3 = 1+2 files
    assert b[0] == (0, 2)
    assert (2, 3) in b and (3, 4) in b


def test_append_mode_skipped_change_commits_cost_zero(tdir):
    """skip_change_commits drops v1 and v3 entirely — their churn
    must not burn byte budget: v0+v2's 20 B ride one 30 B trigger
    spanning the skipped commits."""
    b = _drain(DeltaTailStreamReader({
        "path": tdir, "skip_change_commits": "true",
        "max_bytes_per_trigger": "30",
    }))
    assert b[0] == (0, 4)


def test_append_mode_unskipped_still_prices_adds(tdir):
    """Without skipping, append-mode admission prices v1's 1000 B add
    churn: a 30 B budget pages v1 alone (oversized, never starves)."""
    b = _drain(DeltaTailStreamReader({
        "path": tdir, "skip_change_commits": "false",
        "max_bytes_per_trigger": "30",
    }))
    assert b[0] == (0, 1) and (1, 2) in b
