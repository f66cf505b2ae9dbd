"""Streaming FROM the Delta transaction log: a Spark 4 Python
DataSource (``spark.readStream.format("delta_tail")``) that tails a
``_delta_log`` table and emits each commit's ADDED rows — the public
Delta streaming-source contract, implemented over the pure-Python log
(``sources/delta_log.py``).

Semantics (delta.io streaming source):

* **offset = log version.** ``{"version": v}`` means "versions below
  v are consumed". ``latestOffset`` lists the log (one directory
  listing — O(tail), no data I/O); each micro-batch covers the
  commit range ``[start, end)``.
* **one InputPartition per added file.** Partition PLANNING happens
  on the driver from the commit JSON alone (paths + partitionValues
  + schema snippets travel in the partition value); row READING
  happens on executors, one task per file — a 1000-file commit fans
  out across the cluster exactly like Delta's own source.
* **appends stream; changes don't.** A commit whose actions include
  a ``remove`` with ``dataChange`` (COW DML, RESTORE) or an ``add``
  carrying a ``deletionVector`` is NOT an append. With
  ``skip_change_commits=true`` (Delta's ``skipChangeCommits``) such
  commits are skipped whole; otherwise the source raises — silently
  streaming a rewritten file would double-emit every untouched row
  it carries. OPTIMIZE/compaction commits (``dataChange: false``
  adds) are invisible either way, per the protocol.
* **replay-safe.** Offsets are versions; re-planning ``[s, e)``
  yields the same files and the same rows — checkpoint restart
  re-emits the identical micro-batch, the exactly-once-by-replay
  contract the q437 cert drives end to end.

Reference: the incremental models chain Delta tables into downstream
models (dbt_project.yml:39 ``file_format: delta``); on Databricks the
chain runs as a streaming read of exactly this shape. At 100 TB the
log tail IS the change queue: per trigger the source lists a handful
of JSON files and schedules O(files added since the watermark) tasks
— never a table scan.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


@dataclass
class _AddFilePartition(InputPartition):
    """Everything an executor needs to read one added file — no log
    access on the executor side."""

    abs_path: str
    fields: list  # [(name, type_str, partition_value_or_None), ...]
    version: int = 0
    empty: bool = False


def _snapshot_schema(table_dir: str):
    from product_analytics_spark.sources import delta_log as dl

    snap = dl.DeltaLog(table_dir).snapshot()
    if not snap.metadata:
        raise dl.DeltaProtocolError(f"no metaData in {table_dir}")
    schema = json.loads(snap.metadata["schemaString"])
    part_cols = snap.metadata.get("partitionColumns") or []
    return schema, part_cols


def _py_value(raw: str | None, type_str: str):
    """Partition literal (string in the log) -> Python value of the
    declared type — the reader-side cast every Delta reader does."""
    if raw is None:
        return None
    t = str(type_str)
    if t in ("byte", "short", "integer", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw.lower() == "true"
    return raw  # string/date/... stay strings for this source


class DeltaTailStreamReader(DataSourceStreamReader):
    """See module doc. Options: ``path`` (table dir, required),
    ``starting_version`` (default 0), ``skip_change_commits``
    (default true)."""

    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("delta_tail requires .option('path', table_dir)")
        self.start_version = int(options.get("starting_version", "0"))
        self.skip_change = (
            str(options.get("skip_change_commits", "true")).lower() == "true"
        )

    # ---------------------------------------------------- offsets

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        from product_analytics_spark.sources import delta_log as dl

        latest = dl.DeltaLog(self.table_dir).latest_version()
        nxt = self.start_version if latest is None else latest + 1
        return {"version": max(nxt, self.start_version)}

    # -------------------------------------------------- planning

    def _commit_actions(self, version: int) -> list[dict]:
        from product_analytics_spark.sources import delta_log as dl

        log = dl.DeltaLog(self.table_dir)
        commits = dict(log._commits())
        if version not in commits:
            raise dl.DeltaProtocolError(
                f"streaming source: commit {version} missing from "
                f"{self.table_dir} (cleaned below the checkpoint?)"
            )
        with open(commits[version], encoding="utf-8") as fh:
            return [json.loads(ln) for ln in fh if ln.strip()]

    def partitions(self, start, end):
        from product_analytics_spark.sources import delta_log as dl

        s, e = int(start["version"]), int(end["version"])
        if e <= s:
            return [_AddFilePartition("", [], empty=True)]
        schema, part_cols = _snapshot_schema(self.table_dir)
        types = {f["name"]: f["type"] for f in schema["fields"]}
        out: list[_AddFilePartition] = []
        for v in range(s, e):
            actions = self._commit_actions(v)
            adds = [
                a["add"]
                for a in actions
                if a.get("add") and a["add"].get("dataChange", True)
            ]
            is_change = any(
                a.get("remove") and a["remove"].get("dataChange", True)
                for a in actions
            ) or any(a.get("deletionVector") for a in adds)
            if is_change:
                if self.skip_change:
                    continue  # skipChangeCommits: drop the whole commit
                raise dl.DeltaProtocolError(
                    f"commit {v} is not an append (COW rewrite / DV "
                    "DML / RESTORE); set skip_change_commits=true or "
                    "start above it"
                )
            for a in adds:
                pv = a.get("partitionValues") or {}
                fields = [
                    (
                        f["name"],
                        str(f["type"]),
                        pv.get(f["name"]) if f["name"] in part_cols else None,
                    )
                    for f in schema["fields"]
                ]
                out.append(
                    _AddFilePartition(
                        dl.resolve_path(self.table_dir, a["path"]),
                        fields,
                        version=v,
                    )
                )
        return out or [_AddFilePartition("", [], empty=True)]

    # --------------------------------------------------- reading

    def read(self, partition: _AddFilePartition) -> Iterator:
        # Runs on an EXECUTOR: one parquet file, no log access.
        if partition.empty:
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.abs_path)
        cols = {}
        nrows = tbl.num_rows
        for name, type_str, pv in partition.fields:
            if pv is not None or name not in tbl.column_names:
                val = _py_value(pv, type_str)
                cols[name] = [val] * nrows
            else:
                cols[name] = tbl.column(name).to_pylist()
        names = [f[0] for f in partition.fields]
        for i in range(nrows):
            yield tuple(cols[n][i] for n in names)

    def commit(self, end):
        pass  # offsets are durable in the engine's checkpoint


class DeltaTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_tail"

    def schema(self):
        from pyspark.sql.types import StructType

        schema, _parts = _snapshot_schema(self.options.get("path"))
        return StructType.fromJson(schema)

    def streamReader(self, schema) -> DeltaTailStreamReader:
        return DeltaTailStreamReader(self.options)


def register_delta_tail(spark) -> None:
    spark.dataSource.register(DeltaTailDataSource)
