"""Column mapping mode ``id`` (Delta PROTOCOL.md "Column Mapping",
the Iceberg-compat half) — round-11 verdict item 3: reads resolve by
parquet FIELD ID (Spark's native ``parquet.field.id`` path), the
parquet column NAME is irrelevant, and rename/widen lifecycles hold
under id mode exactly as under name mode.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from product_analytics_spark.sources import delta_log as dl

SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "long", "nullable": True, "metadata": {}},
    ],
})


def _write_ids(tdir, name, ks, vs, colnames=("k", "v"), ids=(1, 2)):
    """One parquet file whose columns carry PARQUET:field_id."""
    sch = pa.schema([
        pa.field(colnames[0], pa.int64(),
                 metadata={b"PARQUET:field_id": str(ids[0]).encode()}),
        pa.field(colnames[1], pa.int64(),
                 metadata={b"PARQUET:field_id": str(ids[1]).encode()}),
    ])
    path = os.path.join(tdir, name)
    pq.write_table(
        pa.table({colnames[0]: pa.array(ks, pa.int64()),
                  colnames[1]: pa.array(vs, pa.int64())}).cast(sch),
        path,
    )
    return path


def _mk(tmp_path, with_ids=True):
    tdir = str(tmp_path / "t")
    os.makedirs(os.path.join(tdir, dl.LOG_DIR))
    log = dl.DeltaLog(tdir)
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": dl.make_metadata(SCHEMA_JSON)}], version=0)
    if with_ids:
        p = _write_ids(tdir, "f0.parquet", [1, 2, 3], [10, 20, 30])
    else:
        p = os.path.join(tdir, "f0.parquet")
        pq.write_table(
            pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([10, 20, 30], pa.int64())}), p)
    log.commit([{"add": dl.make_add(tdir, p)}], version=1)
    return tdir, log


def test_enable_id_mode_verifies_live_files(tmp_path):
    tdir, _log = _mk(tmp_path, with_ids=False)
    with pytest.raises(dl.DeltaProtocolError, match="field id"):
        dl.enable_column_mapping(tdir, mode="id")
    # name mode never needs ids
    dl.enable_column_mapping(tdir, mode="name")
    snap = dl.DeltaLog(tdir).snapshot()
    conf = snap.metadata["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"


def test_enable_id_mode_on_id_carrying_files(tmp_path):
    tdir, _log = _mk(tmp_path, with_ids=True)
    dl.enable_column_mapping(tdir, mode="id")
    snap = dl.DeltaLog(tdir).snapshot()
    assert snap.metadata["configuration"][
        "delta.columnMapping.mode"] == "id"
    assert snap.column_mapping_ids() == {"k": 1, "v": 2}


def test_id_mode_resolves_by_field_id_not_name(spark, tmp_path):
    """THE id-mode property: a file whose parquet column names are
    garbage still reads correctly because its field ids match — a
    name-mode reader could never resolve it."""
    tdir, log = _mk(tmp_path, with_ids=True)
    dl.enable_column_mapping(tdir, mode="id")
    p = _write_ids(tdir, "f1.parquet", [100], [1000],
                   colnames=("zzz_0", "zzz_1"), ids=(1, 2))
    log.commit([{"add": dl.make_add(tdir, p, with_stats=False)}])
    df = dl.read_delta(spark, tdir)
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(1, 10), (2, 20), (3, 30), (100, 1000)}


def test_rename_under_id_mode(spark, tmp_path):
    tdir, _log = _mk(tmp_path, with_ids=True)
    dl.enable_column_mapping(tdir, mode="id")
    dl.rename_column(tdir, "v", "value_cents")
    df = dl.read_delta(spark, tdir)
    assert df.columns == ["k", "value_cents"]
    assert df.groupBy().sum("value_cents").collect()[0][0] == 60
    # stats skipping survives the rename (physical stats keys)
    snap = dl.DeltaLog(tdir).snapshot()
    kept = snap.plan_files([("value_cents", ">=", 10)])
    assert len(kept) == 1


def test_widen_under_id_mode(spark, tmp_path):
    """int→long widening on an id-mode table: old int32 files and
    new int64 files resolve by field id AND conform to the widened
    logical type in one forced-schema scan."""
    tdir = str(tmp_path / "t")
    os.makedirs(os.path.join(tdir, dl.LOG_DIR))
    narrow_schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    })
    log = dl.DeltaLog(tdir)
    log.commit([{"protocol": dl.PROTOCOL_ACTION},
                {"metaData": dl.make_metadata(narrow_schema)}],
               version=0)
    sch = pa.schema([
        pa.field("k", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("v", pa.int32(),
                 metadata={b"PARQUET:field_id": b"2"}),
    ])
    p0 = os.path.join(tdir, "f0.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64()),
                             "v": pa.array([7, 8], pa.int32())}).cast(sch),
                   p0)
    log.commit([{"add": dl.make_add(tdir, p0, with_stats=False)}],
               version=1)
    dl.enable_column_mapping(tdir, mode="id")
    dl.widen_column_type(tdir, "v", "long")
    p1 = _write_ids(tdir, "f1.parquet", [3], [4_000_000_000],
                    colnames=("anything", "else"), ids=(1, 2))
    log.commit([{"add": dl.make_add(tdir, p1, with_stats=False)}])
    df = dl.read_delta(spark, tdir)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {tuple(r) for r in df.collect()} == {
        (1, 7), (2, 8), (3, 4_000_000_000)
    }


def test_spark_native_writer_stamps_field_ids(spark, tmp_path):
    """with_field_ids + Spark's default fieldId.write.enabled stamp
    PARQUET:field_id into the footer — the zero-custom-code write
    path for id-mode tables. (df.to(schema-with-metadata) silently
    DROPS the metadata — the helper exists because of that trap.)"""
    from pyspark.sql import functions as F

    out = str(tmp_path / "out")
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dl.with_field_ids(df, {"k": 1, "v": 2}).coalesce(1).write.parquet(out)
    for n in os.listdir(out):
        if not n.endswith(".parquet"):
            continue
        sch = pq.read_schema(os.path.join(out, n))
        got = {
            fld.name: int(
                (fld.metadata or {}).get(b"PARQUET:field_id", -1)
            )
            for fld in sch
        }
        assert got == {"k": 1, "v": 2}, n


def test_arrow_schema_helper():
    sch = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    out = dl.arrow_schema_with_field_ids(sch, {"a": 7})
    assert out.field("a").metadata[b"PARQUET:field_id"] == b"7"
    assert out.field("b").metadata in (None, {})
