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
    access on the executor side. In change-feed mode (``cdf``) the
    emitted rows append ``_change_type`` (the constant
    ``change_type``, or the file's own column for cdc change files)
    and ``_commit_version``."""

    abs_path: str
    fields: list  # [(name, type_str, partition_value_or_None), ...]
    version: int = 0
    empty: bool = False
    cdf: bool = False
    change_type: str | None = None  # None in cdf mode = read from file


def _snapshot_schema(table_dir: str):
    from product_analytics_spark.sources import delta_log as dl

    snap = dl.DeltaLog(table_dir).snapshot()
    if not snap.metadata:
        raise dl.DeltaProtocolError(f"no metaData in {table_dir}")
    schema = json.loads(snap.metadata["schemaString"])
    part_cols = snap.metadata.get("partitionColumns") or []
    # logical -> physical under column mapping: the stream is served
    # under the LATEST logical names while the files (and cdc files)
    # keep their stable physical names — same rule as the batch
    # table_changes reader
    mapping = snap.column_mapping()
    return schema, part_cols, mapping


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
    (default true), ``read_change_feed`` (default false — Delta's
    ``readChangeFeed``: emit the Change Data Feed instead of raw
    appends; rows carry ``_change_type`` + ``_commit_version``,
    change files come from the commits' ``cdc`` actions, append
    commits derive inserts, and nothing is skipped)."""

    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("delta_tail requires .option('path', table_dir)")
        self.start_version = int(options.get("starting_version", "0"))
        self.skip_change = (
            str(options.get("skip_change_commits", "true")).lower() == "true"
        )
        self.read_cdf = (
            str(options.get("read_change_feed", "false")).lower() == "true"
        )
        # Admission control (Delta's maxFilesPerTrigger +
        # maxBytesPerTrigger): cap the number of data files / total
        # data BYTES one micro-batch plans. 0/absent = unlimited.
        # At 100 TB a restarted stream facing 10k pending commits
        # must page through them in bounded batches, not plan one
        # giant scan that outlives its executors. The byte budget
        # (from the adds' ``size``) is the robust twin: a file-count
        # cap under-admits small-file tables and over-admits
        # compacted ones — 100 files can be 10 MB or 12 GB.
        self.max_files = int(options.get("max_files_per_trigger", "0"))
        self.max_bytes = int(options.get("max_bytes_per_trigger", "0"))
        #: last batch-end version this reader instance planned or
        #: committed — the reference point rate limiting caps from.
        #: None until the first initialOffset/partitions call (a
        #: restart learns it from the engine's first partitions()
        #: call; that first batch is admitted uncapped, like Delta's
        #: best-effort contract).
        self._pos: int | None = None

    # ---------------------------------------------------- offsets

    def initialOffset(self):
        self._pos = self.start_version
        return {"version": self.start_version}

    def _commit_cost(self, version: int) -> tuple[int, int]:
        """(data files, data bytes) the READ PATH would actually load
        for this commit under the current mode — admission must price
        what ``partitions`` serves, or byte budgets mis-admit:

        * cdf mode, commit WITH ``cdc`` actions: the change files
          ALONE (the reader ignores the add/remove churn of a COW
          rewrite — pricing those adds would make a tiny logical
          change look like the whole rewritten table);
        * cdf mode, commit WITHOUT ``cdc``: dataChange adds (inserts)
          PLUS dataChange removes (delete rows are read from the
          removed files; a remove without ``size`` prices 0 bytes but
          still counts against the file cap);
        * append mode: dataChange adds; a change commit that
          ``skip_change_commits`` will drop entirely costs ZERO
          (burning budget on files never read would split batches
          around skipped commits).

        One O(commit-size) JSON read."""
        actions = self._commit_actions(version)
        adds = [
            a["add"] for a in actions
            if a.get("add") and a["add"].get("dataChange", True)
        ]
        if self.read_cdf:
            cdc = [a["cdc"] for a in actions if a.get("cdc")]
            if cdc:
                files = cdc
            else:
                files = adds + [
                    a["remove"] for a in actions
                    if a.get("remove")
                    and a["remove"].get("dataChange", True)
                ]
        else:
            is_change = any(
                a.get("remove") and a["remove"].get("dataChange", True)
                for a in actions
            ) or any(a.get("deletionVector") for a in adds)
            if is_change and self.skip_change:
                return 0, 0
            files = adds
        return (
            len(files),
            sum(int(f.get("size") or 0) for f in files),
        )

    def latestOffset(self):
        from product_analytics_spark.sources import delta_log as dl

        latest = dl.DeltaLog(self.table_dir).latest_version()
        nxt = self.start_version if latest is None else latest + 1
        end = max(nxt, self.start_version)
        if (self.max_files > 0 or self.max_bytes > 0) and (
            self._pos is not None
        ):
            admitted = self._pos
            fbudget = self.max_files if self.max_files > 0 else None
            bbudget = self.max_bytes if self.max_bytes > 0 else None
            while admitted < end:
                try:
                    nf, nb = self._commit_cost(admitted)
                except Exception:  # noqa: BLE001 — cleaned tail etc.
                    break
                over = (
                    (fbudget is not None and nf > fbudget)
                    or (bbudget is not None and nb > bbudget)
                )
                if over and admitted > self._pos:
                    break  # cap reached (always admit >= 1 commit)
                if fbudget is not None:
                    fbudget -= nf
                if bbudget is not None:
                    bbudget -= nb
                admitted += 1
                if (fbudget is not None and fbudget <= 0) or (
                    bbudget is not None and bbudget <= 0
                ):
                    break
            end = max(admitted, self._pos)
        return {"version": end}

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
        # learn/advance the rate-limit reference point (a restarted
        # reader first hears its true position here)
        self._pos = max(self._pos, e) if self._pos is not None else e
        if e <= s:
            return [_AddFilePartition("", [], empty=True)]
        schema, part_cols, mapping = _snapshot_schema(self.table_dir)

        def _fields(pv: dict) -> list:
            return [
                (
                    f["name"],
                    str(f["type"]),
                    pv.get(f["name"]) if f["name"] in part_cols else None,
                    mapping.get(f["name"], f["name"]),  # physical name
                )
                for f in schema["fields"]
            ]

        out: list[_AddFilePartition] = []
        for v in range(s, e):
            actions = self._commit_actions(v)
            adds = [
                a["add"]
                for a in actions
                if a.get("add") and a["add"].get("dataChange", True)
            ]
            cdc = [a["cdc"] for a in actions if a.get("cdc")]
            removes = [
                a["remove"]
                for a in actions
                if a.get("remove") and a["remove"].get("dataChange", True)
            ]
            has_dv = any(a.get("deletionVector") for a in adds)
            if self.read_cdf:
                # Delta readChangeFeed: serve the commit's CHANGES.
                # cdc files carry their own _change_type; commits
                # without cdc derive insert/delete from dataChange
                # adds/removes (table_changes' exact rule).
                if cdc:
                    for c in cdc:
                        out.append(
                            _AddFilePartition(
                                dl.resolve_path(self.table_dir, c["path"]),
                                _fields(c.get("partitionValues") or {}),
                                version=v,
                                cdf=True,
                                change_type=None,
                            )
                        )
                    continue
                if has_dv:
                    raise dl.DeltaProtocolError(
                        f"commit {v} carries deletion vectors but no "
                        "cdc files — enable cdf on the writer to "
                        "stream its changes"
                    )
                for a in adds:
                    out.append(
                        _AddFilePartition(
                            dl.resolve_path(self.table_dir, a["path"]),
                            _fields(a.get("partitionValues") or {}),
                            version=v,
                            cdf=True,
                            change_type="insert",
                        )
                    )
                for r in removes:
                    pv = r.get("partitionValues") or dl._partition_values(
                        r["path"]
                    )
                    out.append(
                        _AddFilePartition(
                            dl.resolve_path(self.table_dir, r["path"]),
                            _fields(pv),
                            version=v,
                            cdf=True,
                            change_type="delete",
                        )
                    )
                continue
            is_change = bool(removes) or has_dv
            if is_change:
                if self.skip_change:
                    continue  # skipChangeCommits: drop the whole commit
                raise dl.DeltaProtocolError(
                    f"commit {v} is not an append (COW rewrite / DV "
                    "DML / RESTORE); set skip_change_commits=true or "
                    "start above it"
                )
            for a in adds:
                out.append(
                    _AddFilePartition(
                        dl.resolve_path(self.table_dir, a["path"]),
                        _fields(a.get("partitionValues") or {}),
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
        for name, type_str, pv, phys in partition.fields:
            if pv is not None or phys not in tbl.column_names:
                val = _py_value(pv, type_str)
                cols[name] = [val] * nrows
            else:
                cols[name] = tbl.column(phys).to_pylist()
        names = [f[0] for f in partition.fields]
        if partition.cdf:
            if partition.change_type is not None:
                ct = [partition.change_type] * nrows
            else:  # cdc change file: the column is IN the file
                ct = tbl.column("_change_type").to_pylist()
            ver = partition.version
            for i in range(nrows):
                yield tuple(cols[n][i] for n in names) + (ct[i], ver)
            return
        for i in range(nrows):
            yield tuple(cols[n][i] for n in names)

    def commit(self, end):
        # offsets are durable in the engine's checkpoint; track the
        # committed position for rate-limit admission
        try:
            v = int(end["version"])
        except (TypeError, KeyError, ValueError):
            return
        self._pos = max(self._pos, v) if self._pos is not None else v


class DeltaTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_tail"

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema, _parts, _mapping = _snapshot_schema(self.options.get("path"))
        st = StructType.fromJson(schema)
        if str(self.options.get("read_change_feed", "false")).lower() == "true":
            st = StructType(
                st.fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return st

    def streamReader(self, schema) -> DeltaTailStreamReader:
        return DeltaTailStreamReader(self.options)


def register_delta_tail(spark) -> None:
    spark.dataSource.register(DeltaTailDataSource)
