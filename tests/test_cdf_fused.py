"""Round-13: cross-version CDF frame fusion (_table_changes_fused).

Pins that the fused reader is value- AND schema-identical to the
legacy per-version loop it replaces, on feeds that mix cdc commits
with add/remove-derived commits, flat and hive-partitioned, and that
the ineligibility guards actually route heterogeneous feeds to the
legacy path.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.sources import delta_log as dl
from product_analytics_spark.sources.sinks import SnapshotStore

WH = "/tmp/pa_test_cdf_fused_wh"


@pytest.fixture()
def store(spark):
    shutil.rmtree(WH, ignore_errors=True)
    yield SnapshotStore(
        spark, WH, retain_versions=20, delta_log=True, cdf=True
    )
    shutil.rmtree(WH, ignore_errors=True)


def _base(spark, n=40):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 10).alias("v"),
    )


def _legacy_rows(spark, tdir, s, e):
    """Run table_changes with fusion disabled (monkey-free: call the
    module with the fused helper forced ineligible via empty specs is
    not possible, so patch it to return None)."""
    orig = dl._table_changes_fused
    dl._table_changes_fused = lambda *_a, **_k: None
    try:
        ch = dl.table_changes(spark, tdir, s, e)
        return ch.columns, sorted(map(tuple, ch.collect()))
    finally:
        dl._table_changes_fused = orig


def _fused_rows(spark, tdir, s, e):
    ch = dl.table_changes(spark, tdir, s, e)
    return ch.columns, sorted(map(tuple, ch.collect()))


def test_fused_matches_legacy_partitioned_mixed_feed(spark, store):
    """cdc commits (merge/delete) + add-derived commits (append) on a
    hive-partitioned table: fused == legacy, columns AND values."""
    st = store
    st.overwrite("t", _base(spark), partition_by=("p",))     # v0 adds
    st.merge(
        "t",
        spark.createDataFrame(
            [(1, "1", -1), (100, "2", -2)], "k long, p string, v long"
        ),
        "k",
        partition_by=("p",),
    )                                                        # v1 cdc
    st.append(
        "t",
        spark.createDataFrame([(200, "0", 5)], "k long, p string, v long"),
        partition_by=("p",),
    )                                                        # v2 adds
    st.delete_where("t", "k >= 35 and k < 38")               # v3 cdc
    tdir = st.path("t")
    cols_f, rows_f = _fused_rows(spark, tdir, 0, None)
    cols_l, rows_l = _legacy_rows(spark, tdir, 0, None)
    assert cols_f == cols_l
    assert rows_f == rows_l
    assert len(rows_f) > 40


def test_fused_matches_legacy_flat_subrange(spark, store):
    st = store
    st.overwrite("t", _base(spark, 20))
    st.merge(
        "t",
        spark.createDataFrame([(3, "x", 7)], "k long, p string, v long"),
        "k",
    )
    st.append(
        "t", spark.createDataFrame([(50, "y", 9)], "k long, p string, v long")
    )
    tdir = st.path("t")
    for s, e in ((0, None), (1, None), (2, 2), (1, 2)):
        cols_f, rows_f = _fused_rows(spark, tdir, s, e)
        cols_l, rows_l = _legacy_rows(spark, tdir, s, e)
        assert cols_f == cols_l, (s, e)
        assert rows_f == rows_l, (s, e)


def test_rename_mid_feed_falls_back_and_matches(spark, store):
    """A column-mapping rename mid-feed changes the files' PHYSICAL
    names across versions — mixed footer schemas within a kind must
    route to the legacy loop, and the end-to-end result (served under
    the END version's logical names) must be unchanged."""
    st = store
    st.overwrite("t", _base(spark, 10))
    tdir = st.path("t")
    dl.enable_column_mapping(tdir)
    dl.rename_column(tdir, "v", "val")
    st.append(
        "t",
        spark.createDataFrame([(90, "z", 3)], "k long, p string, val long"),
    )
    cols_f, rows_f = _fused_rows(spark, tdir, 0, None)
    cols_l, rows_l = _legacy_rows(spark, tdir, 0, None)
    assert cols_f == cols_l
    assert rows_f == rows_l
    assert "val" in cols_f and "v" not in cols_f
