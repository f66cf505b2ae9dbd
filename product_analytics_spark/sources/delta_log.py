"""Pure-Python Delta Lake transaction log (``_delta_log``) — writer,
reader, and stats-based scan planner.

The reference materializes every model as a Delta table
(``dbt_project.yml:39`` ``+file_format: delta``; ``orders_cleaned.sql``
post-hook ``OPTIMIZE``). delta-spark is not installable in this
container, but the transaction-log format itself is a PUBLIC protocol
(delta.io PROTOCOL.md): a table is a directory of parquet data files
plus ``_delta_log/`` holding one newline-delimited-JSON *commit* per
version (zero-padded 20-digit filenames), each a list of actions:

  {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
  {"metaData": {"id": ..., "format": {"provider": "parquet", ...},
                "schemaString": <Spark schema JSON>,
                "partitionColumns": [...], "configuration": {}, ...}}
  {"add":    {"path": ..., "partitionValues": {...}, "size": ...,
              "modificationTime": ..., "dataChange": true,
              "stats": "{\"numRecords\":N,\"minValues\":{...},
                         \"maxValues\":{...},\"nullCount\":{...}}"}}
  {"remove": {"path": ..., "deletionTimestamp": ..., "dataChange": true}}
  {"commitInfo": {...}}                     (informational)

plus optional parquet *checkpoints* (``NNN.checkpoint.parquet`` +
``_last_checkpoint``) so readers replay a bounded JSON tail.

This module implements that protocol in pure Python:

* **Commit = putIfAbsent.** The version-N JSON file is created by
  writing a temp file and hard-linking it to the final name —
  ``os.link`` fails with EEXIST if version N already exists, which is
  the local-FS analog of the object-store putIfAbsent Delta's LogStore
  contract requires: two racing writers of the same version conflict
  deterministically, and readers can never observe a partial commit
  (the link appears with its full content or not at all).

* **Stats at write time, planning from the log.** ``add.stats``
  carries per-file numRecords / minValues / maxValues / nullCount,
  collected from the parquet footer ONCE when the file is committed.
  Scan planning (``DeltaSnapshot.plan_files``) then prunes files from
  the log alone — zero parquet footer opens at read time. At 100 TB
  this is the difference between a metadata lookup and a
  million-file footer storm: Delta, Iceberg and Hudi all plan from
  log/manifest stats for exactly this reason.

* **Snapshot reconstruction.** Replay: latest checkpoint (if any),
  then JSON commits in version order; ``add`` inserts into the live
  set keyed by path, ``remove`` deletes. Time travel = replay to an
  older version (valid while the data files are retained — after GC/
  VACUUM old versions are unreadable, same as Delta).

Cross-engine conformance: the q421/q423 driver certs parse the SAME
log with DuckDB's ``read_json_auto`` as an independent oracle, and
``tests/test_delta_log.py`` asserts planner decisions involve no file
opens.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal

LOG_DIR = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")

#: Fixed timestamp written into protocol-required *Time fields.
#: The engine's certs compare log CONTENT cross-engine; wall-clock
#: would make commits non-reproducible (and Date.now-style calls are
#: banned in the driver harness). Real writers put wall-clock here;
#: nothing in the protocol reads these fields for correctness.
_FIXED_TIME_MS = 0


class DeltaProtocolError(RuntimeError):
    """The log on disk violates the protocol (gap in versions, missing
    metaData, unparseable commit)."""


class DeltaConflictError(RuntimeError):
    """putIfAbsent lost: the target commit version already exists.
    The writer must re-read the snapshot and retry at the new version
    — the same commit-retry loop ConcurrentWriteError drives for the
    pointer store."""


# ------------------------------------------------------------------
# JSON-safe stats values
# ------------------------------------------------------------------


def _stats_value(v):
    """Parquet-footer stat -> JSON-safe value. Timestamps/dates/
    decimals/bytes go to strings (ISO-8601 / repr), matching how Delta
    serializes non-JSON-native types in ``add.stats``."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None  # binary stats are not comparable — drop
    return None


def _coerce_like(raw, template):
    """Parse a JSON-stored stat back to the LITERAL's type so pruning
    compares like with like. Unknown combinations return None (caller
    keeps the file — pruning must stay conservative)."""
    if raw is None:
        return None
    t = type(template)
    try:
        if t is bool:
            return bool(raw)
        if t is int:
            return int(raw) if not isinstance(raw, str) else int(float(raw))
        if t is float:
            return float(raw)
        if t is Decimal:
            return Decimal(str(raw))
        if t is datetime:
            return datetime.fromisoformat(str(raw))
        if t is date:
            return date.fromisoformat(str(raw)[:10])
        if t is str:
            return str(raw)
    except (ValueError, TypeError):
        return None
    return None


def file_stats(path: str) -> dict:
    """Per-file stats from ONE parquet footer read — called at WRITE/
    commit time only (see module doc). Aggregates row-group stats;
    columns without usable stats are simply absent from min/max
    (planner keeps the file). Parquet writers may truncate long binary
    min/max but guarantee they remain valid bounds, so pruning on them
    stays sound."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    names: set[str] = set()
    # A column's file-level min/max is sound only if EVERY row group
    # carries usable stats for it — one statless row group could hold
    # values outside the others' range, so it invalidates the column.
    bad_minmax: set[str] = set()
    bad_null: set[str] = set()
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (Delta skips too)
                continue
            names.add(name)
            st = col.statistics
            if st is None or not st.has_null_count:
                bad_null.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if st is None or not st.has_min_max:
                bad_minmax.add(name)
                continue
            lo, hi = _stats_value(st.min), _stats_value(st.max)
            if lo is None or hi is None:
                bad_minmax.add(name)
                continue
            try:
                if name not in mins or lo < mins[name]:
                    mins[name] = lo
                if name not in maxs or hi > maxs[name]:
                    maxs[name] = hi
            except TypeError:  # mixed stat types across row groups
                bad_minmax.add(name)
    ok = sorted(names - bad_minmax)
    return {
        "numRecords": md.num_rows,
        "minValues": {k: mins[k] for k in ok if k in mins},
        "maxValues": {k: maxs[k] for k in ok if k in maxs},
        "nullCount": {k: nulls[k] for k in sorted(names - bad_null)},
    }


def resolve_path(table_dir: str, p: str) -> str:
    """Resolve an action's ``path`` to a filesystem path. Per the
    protocol, ``add.path`` is either a path RELATIVE to the table
    root or an ABSOLUTE URI — shallow clones use the absolute form to
    reference the source table's files without copying them."""
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(p).path)
    return os.path.join(table_dir, p)  # absolute p wins the join


def _partition_values(rel_path: str) -> dict[str, str]:
    """Hive ``col=value`` segments of a path, as Delta partitionValues."""
    out: dict[str, str] = {}
    for seg in rel_path.split("/")[:-1]:
        col, eq, val = seg.partition("=")
        if eq:
            out[col] = val
    return out


def make_add(table_dir: str, abs_path: str, with_stats: bool = True) -> dict:
    """Build an ``add`` action for one data file under ``table_dir``."""
    rel = os.path.relpath(abs_path, table_dir).replace(os.sep, "/")
    add = {
        "path": rel,
        "partitionValues": _partition_values(rel),
        "size": os.path.getsize(abs_path),
        "modificationTime": _FIXED_TIME_MS,
        "dataChange": True,
    }
    if with_stats:
        add["stats"] = json.dumps(
            file_stats(abs_path), separators=(",", ":"), sort_keys=True
        )
    return add


def make_remove(rel_path: str) -> dict:
    return {
        "path": rel_path,
        "deletionTimestamp": _FIXED_TIME_MS,
        "dataChange": True,
    }


def make_metadata(
    schema_string: str,
    partition_columns: list[str] | tuple[str, ...] = (),
    table_id: str | None = None,
) -> dict:
    return {
        "id": table_id or str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": list(partition_columns),
        "configuration": {},
        "createdTime": _FIXED_TIME_MS,
    }


PROTOCOL_ACTION = {"minReaderVersion": 1, "minWriterVersion": 2}

#: Table-features protocol required once any add carries a
#: ``deletionVector`` descriptor (Delta PROTOCOL.md: DVs are a
#: reader+writer table feature on protocol 3/7).
PROTOCOL_DV_ACTION = {
    "minReaderVersion": 3,
    "minWriterVersion": 7,
    "readerFeatures": ["deletionVectors"],
    "writerFeatures": ["deletionVectors"],
}


# ------------------------------------------------------------------
# Snapshot
# ------------------------------------------------------------------


@dataclass
class DeltaSnapshot:
    """The reconstructed state of a Delta table at one version: the
    live file set (path -> add action) plus table metadata."""

    version: int
    protocol: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)
    files: dict[str, dict] = field(default_factory=dict)

    def num_records(self) -> int | None:
        """LIVE rows from log stats alone (None if any file lacks
        stats) — Delta's ``SELECT count(*)`` metadata-only fast path.
        Files carrying a ``deletionVector`` descriptor contribute
        their physical numRecords minus the DV's cardinality."""
        total = 0
        for add in self.files.values():
            s = add.get("stats")
            if not s:
                return None
            total += json.loads(s)["numRecords"]
            dvd = add.get("deletionVector")
            if dvd:
                total -= dvd["cardinality"]
        return total

    def column_mapping(self) -> dict[str, str]:
        """Logical name -> PHYSICAL name when column mapping is
        enabled (``delta.columnMapping.mode`` name/id), else empty.
        Physical names are what the data files and ``add.stats``
        carry; logical names are what users query — a rename flips
        only the logical side, zero files rewritten."""
        conf = (self.metadata or {}).get("configuration") or {}
        if conf.get("delta.columnMapping.mode") not in ("name", "id"):
            return {}
        schema = json.loads(self.metadata["schemaString"])
        return {
            f["name"]: (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )
            for f in schema["fields"]
        }

    def dv_positions(self, table_dir: str) -> list[tuple[str, int]]:
        """Decode every live file's deletion vector into (relative
        path, row_index) pairs — the reader-side tombstone set. Cost
        is O(total DV cardinality), independent of table size."""
        from product_analytics_spark.sources import deletion_vectors as dvs

        out: list[tuple[str, int]] = []
        for path in sorted(self.files):
            dvd = self.files[path].get("deletionVector")
            if dvd:
                out.extend((path, ri) for ri in dvs.read_dv(table_dir, dvd))
        return out

    # ---------------------------------------------- data skipping

    @staticmethod
    def _file_overlaps(add: dict, col: str, op: str, lit) -> bool:
        """True iff the file MAY contain a row satisfying
        ``col <op> lit``, judged from log stats / partition values
        only. Conservative: missing information keeps the file."""
        template = lit[0] if op == "between" else lit
        pv = add.get("partitionValues") or {}
        if col in pv:
            v = _coerce_like(pv[col], template)
            if v is None:
                return True
            lo = hi = v
        else:
            s = add.get("stats")
            if not s:
                return True
            stats = json.loads(s)
            n = stats.get("numRecords")
            nulls = (stats.get("nullCount") or {}).get(col)
            if n is not None and nulls is not None and nulls == n:
                return False  # all-null column can satisfy no comparison
            lo = _coerce_like((stats.get("minValues") or {}).get(col), template)
            hi = _coerce_like((stats.get("maxValues") or {}).get(col), template)
            if lo is None or hi is None:
                return True
        try:
            if op == "=":
                return lo <= lit <= hi
            if op == "<":
                return lo < lit
            if op == "<=":
                return lo <= lit
            if op == ">":
                return hi > lit
            if op == ">=":
                return hi >= lit
            if op == "between":  # lit = (lo_lit, hi_lit) inclusive
                a, b = lit
                return lo <= b and hi >= a
        except TypeError:
            return True
        return True  # unknown op: never prune on it

    def plan_files(
        self, conjuncts: list[tuple[str, str, object]] | None = None
    ) -> list[str]:
        """Relative paths of live files that may satisfy ALL conjuncts
        — the data-skipping scan plan, computed from the log with zero
        parquet footer opens. ``conjuncts``: (column, op, literal)
        with op in =, <, <=, >, >=, between. Columns are LOGICAL
        names; under column mapping they are translated to the
        physical names the stats are keyed by."""
        m = self.column_mapping()
        out = []
        for path in sorted(self.files):
            add = self.files[path]
            if all(
                self._file_overlaps(add, m.get(c, c), op, lit)
                for (c, op, lit) in (conjuncts or [])
            ):
                out.append(path)
        return out


# ------------------------------------------------------------------
# The log
# ------------------------------------------------------------------


class DeltaLog:
    """Reader/writer for one table's ``_delta_log`` directory."""

    #: write a parquet checkpoint every N commits (Delta defaults to 10)
    CHECKPOINT_INTERVAL = 10

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, LOG_DIR)

    def exists(self) -> bool:
        return os.path.isdir(self.log_dir) and self.latest_version() is not None

    # -------------------------------------------------- file listing

    def _commits(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in os.listdir(self.log_dir):
            m = _COMMIT_RE.match(f)
            if m:
                out.append((int(m.group(1)), os.path.join(self.log_dir, f)))
        return sorted(out)

    def _checkpoints(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in os.listdir(self.log_dir):
            m = _CHECKPOINT_RE.match(f)
            if m:
                out.append((int(m.group(1)), os.path.join(self.log_dir, f)))
        return sorted(out)

    def latest_version(self) -> int | None:
        commits = self._commits()
        return commits[-1][0] if commits else None

    # ------------------------------------------------------- commit

    def commit(
        self,
        actions: list[dict],
        version: int | None = None,
        operation: str = "WRITE",
    ) -> int:
        """Append one commit. ``version`` defaults to latest+1; if that
        file already exists the putIfAbsent link fails and
        DeltaConflictError tells the caller to re-read and retry.
        Readers never see partial content: the name appears only via
        os.link of a fully-written temp file."""
        os.makedirs(self.log_dir, exist_ok=True)
        if version is None:
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
        target = os.path.join(self.log_dir, f"{version:020d}.json")
        lines = [
            json.dumps(
                {
                    "commitInfo": {
                        "timestamp": _FIXED_TIME_MS,
                        # In-commit timestamps (Delta's
                        # inCommitTimestamp): monotonic per-version,
                        # deterministic (wall-clock is banned in the
                        # cert harness) — the field timestamp-based
                        # time travel resolves against.
                        "inCommitTimestamp": version * 1000,
                        "operation": operation,
                        "engineInfo": "product-analytics-spark",
                    }
                },
                separators=(",", ":"),
            )
        ]
        lines += [
            json.dumps(a, separators=(",", ":"), sort_keys=True)
            for a in actions
        ]
        tmp = os.path.join(self.log_dir, f"_tmp_{uuid.uuid4().hex[:12]}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("".join(ln + "\n" for ln in lines))
        try:
            os.link(tmp, target)  # putIfAbsent: EEXIST on conflict
        except FileExistsError:
            raise DeltaConflictError(
                f"delta commit {version} already exists in {self.log_dir}; "
                "re-read the snapshot and retry"
            ) from None
        finally:
            os.unlink(tmp)
        if (version + 1) % self.CHECKPOINT_INTERVAL == 0:
            try:
                self.write_checkpoint(version)
            except Exception:  # noqa: BLE001 — checkpoint is an optimization
                pass
        try:
            self.write_checksum(version)
        except Exception:  # noqa: BLE001 — crc is auxiliary, like Delta's
            pass
        return version

    # ---------------------------------------------------- checksum

    def _crc_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.crc")

    def write_checksum(self, version: int) -> str:
        """Delta's per-version CHECKSUM file (``<version>.crc``, the
        VERSION_CHECKSUM sidecar real Delta writers emit): a JSON
        summary of the post-commit snapshot — file count, total
        bytes, live row count from stats, protocol and metaData —
        letting any reader VALIDATE a reconstructed state in O(1)
        instead of trusting its own replay. Cost: the snapshot replay
        the committer just did anyway (checkpoint-bounded)."""
        snap = self.snapshot(version)
        body = {
            "tableSizeBytes": sum(
                int(a.get("size") or 0) for a in snap.files.values()
            ),
            "numFiles": len(snap.files),
            "numDeletionVectors": sum(
                1 for a in snap.files.values() if a.get("deletionVector")
            ),
            "numMetadata": 1,
            "numProtocol": 1,
            "protocol": snap.protocol or PROTOCOL_ACTION,
            "metadata": snap.metadata,
        }
        nrec = snap.num_records()
        if nrec is not None:
            body["numRecords"] = nrec
        tmp = os.path.join(self.log_dir, f"_crc_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(json.dumps(body, separators=(",", ":"), sort_keys=True))
        os.replace(tmp, self._crc_path(version))
        return self._crc_path(version)

    def validate_checksum(self, version: int | None = None) -> bool:
        """Recompute the snapshot and compare against the stored
        ``.crc`` — the reader-side integrity check. Returns True on
        match; raises DeltaProtocolError on MISMATCH (a corrupted or
        tampered log); returns False if no crc exists for the
        version (older writer — validation unavailable, not failed)."""
        if version is None:
            version = self.latest_version()
        path = self._crc_path(version)
        if not os.path.isfile(path):
            return False
        with open(path, encoding="utf-8") as fh:
            stored = json.load(fh)
        snap = self.snapshot(version)
        actual = {
            "tableSizeBytes": sum(
                int(a.get("size") or 0) for a in snap.files.values()
            ),
            "numFiles": len(snap.files),
            "numRecords": snap.num_records(),
        }
        for k, v in actual.items():
            if k in stored and stored[k] != v:
                raise DeltaProtocolError(
                    f"checksum mismatch at version {version}: "
                    f"{k} stored={stored[k]} actual={v}"
                )
        return True

    # ------------------------------------------------------ snapshot

    @staticmethod
    def _apply(snap: DeltaSnapshot, action: dict) -> None:
        if "metaData" in action and action["metaData"] is not None:
            snap.metadata = action["metaData"]
        elif "protocol" in action and action["protocol"] is not None:
            snap.protocol = action["protocol"]
        elif "add" in action and action["add"] is not None:
            snap.files[action["add"]["path"]] = action["add"]
        elif "remove" in action and action["remove"] is not None:
            snap.files.pop(action["remove"]["path"], None)

    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        """Reconstruct the table state at ``version`` (default:
        latest): start from the newest checkpoint at or below it, then
        replay the JSON commits after it in order."""
        commits = self._commits()
        if not commits:
            raise DeltaProtocolError(f"no commits in {self.log_dir}")
        if version is None:
            version = commits[-1][0]
        snap = DeltaSnapshot(version=version)
        start = 0
        cps = [c for c in self._checkpoints() if c[0] <= version]
        if cps:
            cp_version, cp_path = cps[-1]
            self._load_checkpoint(snap, cp_path)
            start = cp_version + 1
        expected = start
        for v, path in commits:
            if v < start or v > version:
                continue
            if v != expected:
                raise DeltaProtocolError(
                    f"version gap in {self.log_dir}: expected {expected}, "
                    f"found {v}"
                )
            expected += 1
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        self._apply(snap, json.loads(line))
        if expected <= version:
            raise DeltaProtocolError(
                f"missing commits {expected}..{version} in {self.log_dir}"
            )
        return snap

    # ---------------------------------------------------- checkpoint

    def write_checkpoint(self, version: int | None = None) -> str:
        """Parquet checkpoint of the snapshot at ``version`` + the
        ``_last_checkpoint`` pointer — bounds the JSON tail readers
        replay. One row per action; struct columns add/metaData/
        protocol, maps for partitionValues/configuration (the
        protocol's checkpoint schema)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self.snapshot(version)
        version = snap.version
        pv_type = pa.map_(pa.string(), pa.string())
        dv_t = pa.struct(
            [
                ("storageType", pa.string()),
                ("pathOrInlineDv", pa.string()),
                ("offset", pa.int32()),
                ("sizeInBytes", pa.int32()),
                ("cardinality", pa.int64()),
            ]
        )
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pv_type),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
                ("deletionVector", dv_t),
            ]
        )
        meta_t = pa.struct(
            [
                ("id", pa.string()),
                (
                    "format",
                    pa.struct(
                        [("provider", pa.string()), ("options", pv_type)]
                    ),
                ),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pv_type),
                ("createdTime", pa.int64()),
            ]
        )
        proto_t = pa.struct(
            [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
        )

        def _map(d):
            return list((d or {}).items())

        rows_add: list = [None, None]
        rows_meta: list = [None]
        rows_proto: list = [snap.protocol or PROTOCOL_ACTION]
        m = snap.metadata
        rows_meta.append(
            {
                "id": m.get("id"),
                "format": {
                    "provider": (m.get("format") or {}).get(
                        "provider", "parquet"
                    ),
                    "options": _map((m.get("format") or {}).get("options")),
                },
                "schemaString": m.get("schemaString"),
                "partitionColumns": m.get("partitionColumns") or [],
                "configuration": _map(m.get("configuration")),
                "createdTime": m.get("createdTime", _FIXED_TIME_MS),
            }
        )
        for path in sorted(snap.files):
            a = snap.files[path]
            rows_add.append(
                {
                    "path": a["path"],
                    "partitionValues": _map(a.get("partitionValues")),
                    "size": a.get("size"),
                    "modificationTime": a.get(
                        "modificationTime", _FIXED_TIME_MS
                    ),
                    "dataChange": False,
                    "stats": a.get("stats"),
                    "deletionVector": a.get("deletionVector"),
                }
            )
            rows_proto.append(None)
            rows_meta.append(None)
        rows_proto += [None] * (len(rows_add) - len(rows_proto))
        rows_meta += [None] * (len(rows_add) - len(rows_meta))
        table = pa.table(
            {
                "protocol": pa.array(rows_proto, type=proto_t),
                "metaData": pa.array(rows_meta, type=meta_t),
                "add": pa.array(rows_add, type=add_t),
            }
        )
        cp_path = os.path.join(
            self.log_dir, f"{version:020d}.checkpoint.parquet"
        )
        tmp = cp_path + f".tmp{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp)
        os.replace(tmp, cp_path)
        lc_tmp = os.path.join(self.log_dir, f"_lc_{uuid.uuid4().hex[:8]}")
        with open(lc_tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": version, "size": len(rows_add)}, fh)
        os.replace(lc_tmp, os.path.join(self.log_dir, "_last_checkpoint"))
        return cp_path

    def _load_checkpoint(self, snap: DeltaSnapshot, cp_path: str) -> None:
        import pyarrow.parquet as pq

        table = pq.read_table(cp_path)
        for row in table.to_pylist():
            proto = row.get("protocol")
            meta = row.get("metaData")
            add = row.get("add")
            if proto is not None:
                snap.protocol = proto
            if meta is not None:
                meta = dict(meta)
                fmt = dict(meta.get("format") or {})
                fmt["options"] = dict(fmt.get("options") or {})
                meta["format"] = fmt
                meta["configuration"] = dict(meta.get("configuration") or {})
                snap.metadata = meta
            if add is not None:
                add = dict(add)
                add["partitionValues"] = dict(add.get("partitionValues") or {})
                if add.get("stats") is None:
                    add.pop("stats", None)
                if add.get("deletionVector") is None:
                    add.pop("deletionVector", None)
                snap.files[add["path"]] = add


    # ------------------------------------------------- log retention

    def cleanup_log(self) -> int:
        """Delta's metadata-retention pass: delete JSON commits
        STRICTLY BELOW the newest checkpoint — readers reconstruct any
        retained version from the checkpoint + tail, so those commits
        are dead weight (Delta does the same after
        ``delta.logRetentionDuration``). Returns the number of commit
        files removed; no checkpoint ⇒ no-op (never orphan readers)."""
        cps = self._checkpoints()
        if not cps:
            return 0
        cutoff = cps[-1][0]
        removed = 0
        for v, path in self._commits():
            if v < cutoff:
                try:
                    os.unlink(path)
                    removed += 1
                except OSError:
                    pass
                try:  # the version's crc sidecar goes with it
                    os.unlink(self._crc_path(v))
                except OSError:
                    pass
        return removed

    def history(self) -> list[dict]:
        """``DESCRIBE HISTORY``: one entry per surviving commit,
        newest first — version, operation, inCommitTimestamp, and
        action counts (adds/removes/cdc), all from the JSON tail
        (O(tail) file reads, zero data I/O)."""
        out: list[dict] = []
        for v, path in sorted(self._commits(), reverse=True):
            entry = {
                "version": v,
                "operation": None,
                "inCommitTimestamp": None,
                "n_add": 0,
                "n_remove": 0,
                "n_cdc": 0,
            }
            try:
                with open(path, encoding="utf-8") as fh:
                    for ln in fh:
                        if not ln.strip():
                            continue
                        a = json.loads(ln)
                        if "commitInfo" in a:
                            ci = a["commitInfo"] or {}
                            entry["operation"] = ci.get("operation")
                            entry["inCommitTimestamp"] = ci.get(
                                "inCommitTimestamp"
                            )
                        elif a.get("add"):
                            entry["n_add"] += 1
                        elif a.get("remove"):
                            entry["n_remove"] += 1
                        elif a.get("cdc"):
                            entry["n_cdc"] += 1
            except OSError:
                continue
            out.append(entry)
        return out

    def version_at_timestamp(self, ts_ms: int) -> int:
        """Timestamp-based time travel (``TIMESTAMP AS OF``): the
        LATEST version whose inCommitTimestamp ≤ ``ts_ms`` — Delta's
        exact resolution rule. Raises if every surviving commit is
        newer (the requested instant predates retained history)."""
        best = None
        for h in self.history():
            ts = h.get("inCommitTimestamp")
            if ts is not None and ts <= ts_ms:
                best = h["version"] if best is None else max(best, h["version"])
        if best is None:
            raise DeltaProtocolError(
                f"no commit at or before timestamp {ts_ms} in "
                f"{self.log_dir} (history cleaned?)"
            )
        return best

    def referenced_cdc_paths(self) -> set[str]:
        """Change-file paths referenced by a ``cdc`` action in any
        SURVIVING commit JSON — the set a CDF-aware VACUUM must keep.
        O(|commit tail|) file reads; checkpoints don't carry cdc
        actions (they snapshot state, not per-commit changes), so the
        JSON tail is the single source of truth."""
        out: set[str] = set()
        for _v, path in self._commits():
            try:
                with open(path, encoding="utf-8") as fh:
                    for ln in fh:
                        if not ln.strip():
                            continue
                        c = json.loads(ln).get("cdc")
                        if c and c.get("path"):
                            out.add(c["path"])
            except OSError:
                continue
        return out

    def vacuum(self, dry_run: bool = False) -> list[str]:
        """Delta VACUUM for a standalone log-managed table: delete
        data files under the table dir that the CURRENT snapshot does
        not reference (tombstoned by remove actions, or orphaned).
        After this, time travel below the current version is gone —
        exactly Delta's contract. Returns the (relative) paths
        removed; ``dry_run`` lists without deleting. Candidates are
        parquet data files outside ``_delta_log`` plus deletion-vector
        sidecars (``deletion_vector_*.bin``) no live add references,
        plus Change-Data-Feed files under ``_change_data/`` that no
        SURVIVING commit's ``cdc`` action references (after
        ``cleanup_log`` truncates the JSON tail, the dead commits'
        change files are unreachable by ``table_changes`` and go with
        them — Delta's CDF retention follows log retention the same
        way)."""
        from product_analytics_spark.sources import deletion_vectors as dvs

        snap = self.snapshot()
        live = set(snap.files)
        referenced_cdc = self.referenced_cdc_paths()
        live_dv_bins = set()
        for add in snap.files.values():
            dvd = add.get("deletionVector")
            if dvd and dvd.get("storageType") == "u":
                live_dv_bins.add(
                    os.path.relpath(
                        dvs.dv_file_path(self.table_dir, dvd), self.table_dir
                    ).replace(os.sep, "/")
                )
        victims: list[str] = []
        for root, dirs, files in os.walk(self.table_dir):
            dirs[:] = [d for d in dirs if d != LOG_DIR]
            for f in files:
                if f.startswith((".", "_")):
                    continue
                rel = os.path.relpath(
                    os.path.join(root, f), self.table_dir
                ).replace(os.sep, "/")
                if rel.startswith(CDC_DIR + "/"):
                    if rel not in referenced_cdc:
                        victims.append(rel)
                elif f.endswith(".parquet"):
                    if rel not in live:
                        victims.append(rel)
                elif f.startswith("deletion_vector_") and f.endswith(".bin"):
                    if rel not in live_dv_bins:
                        victims.append(rel)
        if not dry_run:
            for rel in victims:
                try:
                    os.unlink(os.path.join(self.table_dir, rel))
                except OSError:
                    pass
        return sorted(victims)


# ------------------------------------------------------------------
# Conversion of existing parquet tables
# ------------------------------------------------------------------


def convert_to_delta(spark, table_dir: str) -> int:
    """``CONVERT TO DELTA parquet.`path``` — retrofit a transaction
    log onto an EXISTING plain-parquet table (hive-partitioned or
    flat): one commit 0 with protocol + metaData (Spark schemaString,
    partition columns from the directory layout) + one stats-bearing
    add per data file. The data files are not touched — conversion is
    a pure metadata operation, which is why Delta can convert
    petabyte tables in minutes. Returns the created version (0).
    Refuses if a log already exists."""
    log = DeltaLog(table_dir)
    if log.exists():
        raise DeltaProtocolError(f"{table_dir} already has a _delta_log")
    data_files: list[str] = []
    part_cols: list[str] = []
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = sorted(
            d for d in dirs if not d.startswith((".", "_"))
        )
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                p = os.path.join(root, f)
                data_files.append(p)
                for c in _partition_values(
                    os.path.relpath(p, table_dir).replace(os.sep, "/")
                ):
                    if c not in part_cols:
                        part_cols.append(c)
    if not data_files:
        raise DeltaProtocolError(f"no parquet files under {table_dir}")
    schema_json = spark.read.parquet(table_dir).schema.json()
    actions: list[dict] = [
        {"protocol": dict(PROTOCOL_ACTION)},
        {"metaData": make_metadata(schema_json, part_cols)},
    ]
    actions += [{"add": make_add(table_dir, p)} for p in data_files]
    return log.commit(actions, version=0, operation="CONVERT")


# ------------------------------------------------------------------
# Standalone consumption
# ------------------------------------------------------------------


def apply_dv_filter(spark, df, table_dir: str, positions):
    """Filter a file-scan DataFrame by deletion-vector positions:
    broadcast anti-join on (table-relative path, ``_metadata.
    row_index``). Cost bounded by total DV cardinality — the exact
    read-side trade MoR buys. Must be applied directly on the scan
    (``_metadata`` is a scan pseudo-column; it does not survive
    joins/unions)."""
    if not positions:
        return df
    from pyspark.sql import functions as F

    pos_df = spark.createDataFrame(
        positions, schema="path string, row_index bigint"
    )
    prefix = "file:" + os.path.abspath(table_dir).rstrip("/") + "/"
    cols = df.columns
    tagged = df.select(
        "*",
        F.substring(
            F.col("_metadata.file_path"), len(prefix) + 1, 1 << 20
        ).alias("__dv_f"),
        F.col("_metadata.row_index").alias("__dv_ri"),
    )
    return tagged.join(
        F.broadcast(pos_df),
        (F.col("__dv_f") == pos_df["path"])
        & (F.col("__dv_ri") == pos_df["row_index"]),
        "left_anti",
    ).select(*cols)


def read_delta(spark, table_dir: str, version: int | None = None):
    """Consume ANY ``_delta_log`` table: plan the live file set from
    the log and load exactly those files. Partition columns come from
    the log's partitionValues (Delta stores them in the log, not the
    files), injected as literal columns per the metadata's declared
    partitionColumns. Files carrying ``deletionVector`` descriptors
    (protocol 3/7 table feature) have their tombstoned positions
    decoded from the roaring-bitmap sidecars and anti-joined out.
    Under column mapping, data files carry PHYSICAL column names; the
    returned DataFrame exposes the metadata's LOGICAL names (a rename
    is therefore visible instantly, zero files rewritten)."""
    from pyspark.sql import functions as F

    snap = DeltaLog(table_dir).snapshot(version)
    part_cols = (snap.metadata or {}).get("partitionColumns") or []
    paths = sorted(snap.files)
    if not paths:
        raise DeltaProtocolError(f"empty table at {table_dir}")
    positions = snap.dv_positions(table_dir)

    def _to_logical(df):
        m = snap.column_mapping()
        if not m:
            return df
        return df.select(
            *[F.col(phys).alias(logical) for logical, phys in m.items()]
        )

    if not part_cols:
        df = spark.read.parquet(
            *[resolve_path(table_dir, p) for p in paths]
        )
        return _to_logical(apply_dv_filter(spark, df, table_dir, positions))
    # Partition literals are STRINGS in the log (partitionValues);
    # the table's real column types live in metaData.schemaString —
    # cast each literal to its declared type, like Delta readers do.
    part_types: dict[str, object] = {}
    schema_str = (snap.metadata or {}).get("schemaString")
    if schema_str:
        try:
            from pyspark.sql.types import StructType

            st = StructType.fromJson(json.loads(schema_str))
            part_types = {f.name: f.dataType for f in st.fields}
        except Exception:  # noqa: BLE001 — fall back to strings
            part_types = {}
    # Group by partition tuple so each group injects its literals.
    # The DV filter applies per group, BEFORE the literal columns —
    # _metadata resolves only on the raw scan.
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        pv = snap.files[p].get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(p)
    out = None
    for key in sorted(groups, key=lambda k: tuple(str(x) for x in k)):
        df = spark.read.parquet(
            *[resolve_path(table_dir, p) for p in groups[key]]
        )
        df = apply_dv_filter(spark, df, table_dir, positions)
        for c, v in zip(part_cols, key):
            df = df.withColumn(
                c, F.lit(v).cast(part_types.get(c, "string"))
            )
        out = df if out is None else out.unionByName(df)
    return _to_logical(out)


# ------------------------------------------------------------------
# Change Data Feed
# ------------------------------------------------------------------

#: Directory (relative to the table root) where CDF change files live
#: — Delta's exact layout (PROTOCOL.md "Add CDC File"): DML commits
#: write their change rows to ``_change_data/cdc-*.parquet`` and
#: reference them with ``cdc`` actions.
CDC_DIR = "_change_data"

#: CDF metadata columns (Delta's reserved names).
CDC_TYPE_COL = "_change_type"
CDC_VERSION_COL = "_commit_version"


def _part_types_of(snap: "DeltaSnapshot") -> dict:
    """Partition-column name -> Spark DataType from the snapshot's
    ``schemaString`` (partition literals are strings in the log and
    must be cast back to their declared types, like every Delta
    reader does)."""
    schema_str = (snap.metadata or {}).get("schemaString")
    if not schema_str:
        return {}
    try:
        from pyspark.sql.types import StructType

        st = StructType.fromJson(json.loads(schema_str))
        return {f.name: f.dataType for f in st.fields}
    except Exception:  # noqa: BLE001 — fall back to strings
        return {}


def _load_with_partitions(
    spark, table_dir: str, files_pv: list[tuple[str, dict]],
    part_cols: list[str], part_types: dict,
):
    """Read the given (rel path, partitionValues) files, injecting the
    log's partition literals as typed columns (data files under a hive
    layout do not store partition columns — the log does)."""
    from pyspark.sql import functions as F

    gone = [
        rel
        for rel, _pv in files_pv
        if not os.path.isfile(resolve_path(table_dir, rel))
    ]
    if gone:
        # Retention/VACUUM dropped the data files this range's changes
        # live in — same failure Delta reports when CDF is requested
        # below the vacuum horizon.
        raise DeltaProtocolError(
            f"change-feed data file(s) no longer on disk (GC'd/"
            f"VACUUMed below the retention window): {sorted(gone)[:3]}"
        )
    groups: dict[tuple, list[str]] = {}
    for rel, pv in files_pv:
        key = tuple((pv or {}).get(c) for c in part_cols)
        groups.setdefault(key, []).append(rel)
    out = None
    for key in sorted(groups, key=lambda k: tuple(str(x) for x in k)):
        df = spark.read.parquet(
            *[resolve_path(table_dir, p) for p in groups[key]]
        )
        for c, v in zip(part_cols, key):
            if v is not None and c not in df.columns:
                df = df.withColumn(
                    c, F.lit(v).cast(part_types.get(c, "string"))
                )
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=True
        )
    return out


def table_changes(
    spark,
    table_dir: str,
    start_version: int,
    end_version: int | None = None,
):
    """Delta **Change Data Feed** reader (``table_changes(t, s, e)``):
    every row-level change committed in versions ``[start, end]``,
    with the reserved ``_change_type`` (insert / delete /
    update_preimage / update_postimage) and ``_commit_version``
    columns appended — the contract downstream incremental consumers
    (dbt models reading "what changed since my watermark") depend on.

    Per Delta's spec, a commit that carries ``cdc`` actions is read
    from those change files ALONE (the add/remove churn of a
    copy-on-write rewrite re-adds every unchanged row and must be
    ignored); a commit without ``cdc`` actions derives its changes
    from the actions: ``add`` files with ``dataChange`` ⇒ their rows
    are inserts, ``remove`` files with ``dataChange`` ⇒ their rows
    are deletes (readable until VACUUM, exactly Delta's window).
    OPTIMIZE/compaction commits mark ``dataChange: false`` on both
    sides and contribute nothing — rearranging bytes is not a change.

    Scale: cost is O(rows actually changed) — the cdc files a DML
    wrote, or the files an append added — never O(table). Requesting
    a version below the checkpoint-cleaned tail raises
    ``DeltaProtocolError`` (the commit JSON is gone), matching
    Delta's behavior after log retention.

    Reference: the incremental models consume exactly this shape
    (``customers_latest.sql:3-6`` merge on the CDC stream;
    ``dbt_project.yml:39`` ``file_format: delta``)."""
    from pyspark.sql import functions as F

    log = DeltaLog(table_dir)
    latest = log.latest_version()
    if latest is None:
        raise DeltaProtocolError(f"no _delta_log at {table_dir}")
    end = latest if end_version is None else int(end_version)
    if end > latest:
        raise DeltaProtocolError(
            f"end_version {end} beyond latest commit {latest}"
        )
    commits = dict(log._commits())
    out = None
    for v in range(int(start_version), end + 1):
        if v not in commits:
            raise DeltaProtocolError(
                f"commit {v} missing from the log (cleaned below the "
                "checkpoint?) — change feed unavailable for it"
            )
        with open(commits[v], encoding="utf-8") as fh:
            actions = [json.loads(ln) for ln in fh if ln.strip()]
        cdc = [a["cdc"] for a in actions if a.get("cdc")]
        snap = log.snapshot(v)
        part_cols = (snap.metadata or {}).get("partitionColumns") or []
        part_types = _part_types_of(snap)
        frames = []
        if cdc:
            df = _load_with_partitions(
                spark,
                table_dir,
                [(c["path"], c.get("partitionValues")) for c in cdc],
                part_cols,
                part_types,
            )
            if df is not None:
                frames.append(df)  # cdc files carry _change_type
        else:
            adds = [
                a["add"]
                for a in actions
                if a.get("add") and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in actions
                if a.get("remove") and a["remove"].get("dataChange", True)
            ]
            if adds:
                df = _load_with_partitions(
                    spark,
                    table_dir,
                    [(a["path"], a.get("partitionValues")) for a in adds],
                    part_cols,
                    part_types,
                )
                if df is not None:
                    frames.append(
                        df.withColumn(CDC_TYPE_COL, F.lit("insert"))
                    )
            if removes:
                df = _load_with_partitions(
                    spark,
                    table_dir,
                    [
                        (r["path"], r.get("partitionValues") or
                         _partition_values(r["path"]))
                        for r in removes
                    ],
                    part_cols,
                    part_types,
                )
                if df is not None:
                    frames.append(
                        df.withColumn(CDC_TYPE_COL, F.lit("delete"))
                    )
        for df in frames:
            df = df.withColumn(
                CDC_VERSION_COL, F.lit(v).cast("long")
            )
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
    if out is None:
        raise DeltaProtocolError(
            f"no changes in versions [{start_version}, {end}]"
        )
    return out


# ------------------------------------------------------------------
# Shallow clone
# ------------------------------------------------------------------


def shallow_clone(src_table_dir: str, dst_table_dir: str) -> int:
    """Delta **SHALLOW CLONE**: create a NEW log-managed table whose
    version-0 commit references the SOURCE table's live data files by
    ABSOLUTE path — zero bytes copied (the protocol allows
    ``add.path`` to be "a relative path ... or an absolute URI";
    clones are the canonical use). The clone starts its own history:
    commits to it add files under its OWN directory and never touch
    the source; per-file ``stats`` come along by value, so scan
    planning on the clone prunes from its log with zero footer opens.

    Returns the number of files referenced. Raises if the source has
    outstanding deletion vectors (materialize with ``purge_dv``/
    OPTIMIZE first — a cloned DV descriptor's sidecar offsets would
    dangle) or no readable snapshot.

    Scale: cloning a 100 TB table is O(|files|) log entries — the
    dev/staging-fork workflow (test a risky migration against
    production data without copying it) costs metadata, not a second
    copy of the lake. VACUUM on the clone never deletes source files
    (they live outside its table dir); VACUUM on the source CAN break
    clones past their retention, exactly Delta's documented caveat.

    Reference: dbt's ``file_format: delta`` tables are forked this
    way for CI runs (dbt_project.yml:39); the clone is how a staging
    run materializes against prod inputs without a 100 TB copy."""
    src_log = DeltaLog(src_table_dir)
    snap = src_log.snapshot()
    if not snap.metadata:
        raise DeltaProtocolError(f"no metaData in source {src_table_dir}")
    actions: list[dict] = [
        {"protocol": dict(snap.protocol or PROTOCOL_ACTION)}
    ]
    meta = dict(snap.metadata)
    meta["id"] = str(uuid.uuid4())  # a clone is a NEW table identity
    actions.append({"metaData": meta})
    src_abs = os.path.abspath(src_table_dir)
    n = 0
    for rel in sorted(snap.files):
        add = dict(snap.files[rel])
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "shallow_clone: source has outstanding deletion "
                "vectors — OPTIMIZE/purge them first"
            )
        add["path"] = "file://" + os.path.join(src_abs, rel)
        add["dataChange"] = True
        actions.append({"add": add})
        n += 1
    os.makedirs(dst_table_dir, exist_ok=True)
    DeltaLog(dst_table_dir).commit(actions, version=0, operation="CLONE")
    return n


# ------------------------------------------------------------------
# Column mapping (rename without rewrite)
# ------------------------------------------------------------------


def enable_column_mapping(table_dir: str) -> int:
    """Upgrade a log-managed table to column mapping
    (``delta.columnMapping.mode = name``): every schema field gets a
    stable ``delta.columnMapping.id`` and a
    ``delta.columnMapping.physicalName`` equal to its CURRENT name
    (so existing data files stay valid byte-for-byte), and the
    protocol moves to reader 2 / writer 5 (the legacy columnMapping
    requirement) unless already higher. MetaData-only commit — zero
    data I/O at any table size."""
    log = DeltaLog(table_dir)
    snap = log.snapshot()
    if not snap.metadata:
        raise DeltaProtocolError(f"no metaData at {table_dir}")
    conf = dict(snap.metadata.get("configuration") or {})
    if conf.get("delta.columnMapping.mode") in ("name", "id"):
        return snap.version  # already enabled — idempotent
    schema = json.loads(snap.metadata["schemaString"])
    max_id = 0
    for i, f in enumerate(schema["fields"], start=1):
        md = dict(f.get("metadata") or {})
        md.setdefault("delta.columnMapping.id", i)
        md.setdefault("delta.columnMapping.physicalName", f["name"])
        f["metadata"] = md
        max_id = max(max_id, int(md["delta.columnMapping.id"]))
    meta = dict(snap.metadata)
    meta["schemaString"] = json.dumps(schema, separators=(",", ":"))
    conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(max_id)
    meta["configuration"] = conf
    actions: list[dict] = []
    proto = dict(snap.protocol or PROTOCOL_ACTION)
    if (
        proto.get("minReaderVersion", 1) < 2
        or proto.get("minWriterVersion", 2) < 5
    ):
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": max(
                        2, proto.get("minReaderVersion", 1)
                    ),
                    "minWriterVersion": max(
                        5, proto.get("minWriterVersion", 2)
                    ),
                }
            }
        )
    actions.append({"metaData": meta})
    return log.commit(actions, operation="UPGRADE")


def rename_column(table_dir: str, old: str, new: str) -> int:
    """``ALTER TABLE t RENAME COLUMN old TO new`` under column
    mapping: flip the LOGICAL field name in metaData; the physical
    name (what every data file and every ``add.stats`` entry carries)
    is untouched — ZERO files rewritten, one metaData commit.
    ``read_delta`` exposes the new logical name immediately and
    ``plan_files`` translates predicates on it back to the physical
    stats keys, so data skipping survives the rename.

    Partition columns are refused (their physical names live in the
    hive directory layout; Delta requires a rewrite for those too).

    Scale: renaming a column of a 100 TB table is one JSON commit.
    The alternative — rewrite every file with the new parquet column
    name — is exactly what column mapping exists to avoid."""
    log = DeltaLog(table_dir)
    snap = log.snapshot()
    conf = (snap.metadata or {}).get("configuration") or {}
    if conf.get("delta.columnMapping.mode") not in ("name", "id"):
        raise DeltaProtocolError(
            "rename_column requires column mapping — call "
            "enable_column_mapping first"
        )
    if old in ((snap.metadata or {}).get("partitionColumns") or []):
        raise DeltaProtocolError(
            f"cannot rename partition column {old!r} (physical name "
            "is the hive directory layout; rewrite required)"
        )
    schema = json.loads(snap.metadata["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if old not in names:
        raise DeltaProtocolError(f"no column {old!r} in {names}")
    if new in names:
        raise DeltaProtocolError(f"column {new!r} already exists")
    for f in schema["fields"]:
        if f["name"] == old:
            f["name"] = new  # physicalName in metadata stays put
    meta = dict(snap.metadata)
    meta["schemaString"] = json.dumps(schema, separators=(",", ":"))
    return log.commit([{"metaData": meta}], operation="RENAME COLUMN")
