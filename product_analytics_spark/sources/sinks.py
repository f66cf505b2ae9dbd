"""Warehouse sinks: snapshot store with merge/upsert, partitioned
writes, and the ZORDER-analog layout pass.

Reference mapping (SURVEY.md §2.1):
  S4 merge/upsert        dbt incremental_strategy='merge' + unique_key
                         (customers_latest.sql:3-6, orders_cleaned.sql:9-12)
  S5 append              dbt default strategy (dbt_project.yml:40-41)
  S6 partitioned write   partition_by=['order_year','order_month'] /
                         ['country'] (orders_cleaned.sql:14, dim_customer.sql:7)
  S7 ZORDER post-hook    OPTIMIZE ... ZORDER BY (customers_latest.sql:7 etc.)
  S8 schema evolution    on_schema_change='sync_all_columns'

Commit protocol (no delta-spark in this container — fallback is the
tested path): every overwrite/merge writes a fresh immutable version
directory ``<table>/v_<uuid>/`` and then commits by atomically
replacing the one-line pointer file ``<table>/_CURRENT`` via
``os.replace`` (POSIX-atomic). A crash at ANY point leaves the
pointer naming a fully-written version: before the replace, readers
still see the old version; after, the new one. Superseded versions
are garbage-collected on the next successful commit. This is the
classic table-format commit (Delta/Iceberg do the same with a
transaction log instead of a pointer file).

Object-store caveat: ``os.replace`` atomicity holds on POSIX
filesystems (local disk, NFS, HDFS via mounts). On S3-like stores
there is no atomic rename — swap this pointer for a real table format
(Delta/Iceberg), whose log commit plays the same role; nothing above
this class changes. With delta-spark installed, ``DeltaTable.merge``
replaces the anti-join merge and ``OPTIMIZE ZORDER`` replaces the
cluster pass (HAVE_DELTA gates it).

The ZORDER analog is repartitionByRange + sortWithinPartitions: same
data-skipping effect (clustered min/max ranges per file) from OSS
primitives.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from product_analytics_spark.operators.incremental import merge_upsert

try:  # delta-spark is optional; everything falls back to parquet.
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    HAVE_DELTA = False

_POINTER = "_CURRENT"
_LOG = "_LOG"
_LAYOUT = "_LAYOUT"
_CONSTRAINTS = "_CONSTRAINTS"
_GENERATED = "_GENERATED"
_IDENTITY = "_IDENTITY"
_PROPS = "_PROPS"
_INVARIANTS = "_INVARIANTS"
_ROW_TRACKING = "_ROW_TRACKING"

#: Sentinel default for ``expected_version`` — distinct from None,
#: which is a MEANINGFUL expectation (first write: no pointer yet).
UNCHECKED = object()

#: Read schema per immutable version dir (see _read_version_dir):
#: metadata-only memo — (abs dir, mergeSchema flag) -> StructType.
_VERSION_DIR_SCHEMAS: dict[tuple[str, bool], object] = {}

#: Resolved-DataFrame memo per store directory (see _read_version_dir,
#: round-13): (applicationId, abs dir, mergeSchema, content signature)
#: -> DataFrame. Holds the LAZY resolved plan only — every action
#: still scans the parquet files; NOT result caching. The signature
#: (relpath, size, mtime_ns per data file) guards the two mutable-dir
#: cases (append writes into the live data dir; MoR DMLs add _dv
#: files): any file change produces a new key and the stale plan is
#: evicted. ~15 ms of py4j reader resolution per call removed (q428
#: paid it 66×).
_VERSION_DIR_PLANS: dict[tuple, DataFrame] = {}
_VERSION_DIR_PLANS_LOCK = __import__("threading").Lock()


def _dir_signature(d: str) -> tuple:
    """Content signature of a store directory's data files: sorted
    (relative path, size, mtime_ns) per parquet file, skipping
    hidden/metadata entries — cheap driver metadata (~1 ms for
    cert-sized dirs), no Spark involvement."""
    sig = []
    for root, dirs, files in os.walk(d):
        dirs[:] = sorted(
            x for x in dirs if not x.startswith((".", "_"))
        )
        for f in sorted(files):
            if not f.endswith(".parquet") or f.startswith((".", "_")):
                continue
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            sig.append(
                (os.path.relpath(p, d), st.st_size, st.st_mtime_ns)
            )
    return tuple(sig)


def _submit_inheritable(fn, *args):
    """Run ``fn(*args)`` on a ``pyspark.InheritableThread``, returning a
    Future. Replaces the throwaway one-thread ThreadPoolExecutor the
    overlapped cdc/validation jobs used (ADVICE r12): under py4j
    pinned-thread mode (PySpark's default) a plain Python thread running
    Spark actions leaves its paired JVM thread behind on exit and does
    NOT inherit the submitter's JVM-thread locals, so overlapped jobs
    lost their job group / scheduler pool / description and a
    long-running driver accumulated JVM threads across DMLs.
    InheritableThread copies the locals in and deterministically
    releases the pinned connection when the thread finishes."""
    from concurrent.futures import Future

    from pyspark import InheritableThread
    from pyspark.sql import SparkSession

    fut: Future = Future()

    def _run() -> None:
        try:
            fut.set_result(fn(*args))
        except BaseException as exc:  # noqa: BLE001 — settled into the Future
            fut.set_exception(exc)

    InheritableThread(
        target=_run, daemon=True, session=SparkSession.getActiveSession()
    ).start()
    return fut


class ConcurrentWriteError(RuntimeError):
    """Optimistic-concurrency conflict: the table's committed version
    moved between a transaction's snapshot read and its commit. The
    caller re-reads and retries (the Delta/Iceberg commit-retry loop);
    blind retry would silently drop the other writer's rows."""


class ConstraintViolationError(RuntimeError):
    """A write contained rows violating a declared CHECK constraint
    (Delta ``delta.constraints.<name>``). NOTHING commits — the
    constraint is enforced at write time, never repaired after."""


class SnapshotStore:
    """Keyed SCD-1 snapshots in a warehouse directory, one table per
    model, with atomic pointer-commit replace and merge/upsert.

    At 100 TB the same interface maps onto Delta/Iceberg tables: the
    pointer commit becomes the table format's log commit and merge
    becomes MERGE INTO with file pruning on the unique key; nothing
    above this class changes.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        retain_versions: int = 1,
        delta_log: bool = False,
        cdf: bool = False,
        commit_owner=None,
    ):
        """``retain_versions`` — how many committed versions to keep on
        disk (≥1). With >1, superseded versions stay readable via
        ``read(name, version=...)`` — the pointer-file analog of
        Delta/Iceberg time travel; GC drops versions that fall off the
        retention window at the next commit (VACUUM analog).

        ``delta_log=True`` additionally emits a protocol-conformant
        Delta Lake ``_delta_log/`` (sources/delta_log.py) inside every
        commit's locked section: JSON commits with protocol/metaData/
        add/remove actions and per-file ``stats`` (numRecords +
        min/max/nullCount collected once from the parquet footer at
        write time). Readers — including scan planning via
        ``scan_files``/``read_pruned`` and any independent protocol
        parser — then plan from the log with ZERO parquet footer
        opens. Files a COW rewrite hardlinks into the new version
        reuse their previous add action's stats (same inode, same
        content — no footer re-read). History older than the
        retention window references GC'd files, exactly like Delta
        history after VACUUM.

        ``cdf=True`` (requires ``delta_log=True``) enables the Change
        Data Feed: every DML path (merge / delete / update, COW and
        MoR alike) writes its row-level changes to
        ``_change_data/cdc-*.parquet`` and references them with
        ``cdc`` actions in the same commit, per Delta's
        ``delta.enableChangeDataFeed`` contract;
        ``delta_log.table_changes`` reads them back with
        ``_change_type``/``_commit_version`` columns."""
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.retain_versions = max(1, retain_versions)
        self.delta_log = bool(delta_log)
        if cdf and not delta_log:
            raise ValueError("cdf=True requires delta_log=True")
        self.cdf = bool(cdf)
        #: CommitOwner for the table's _delta_log commits (None =
        #: hardlink putIfAbsent). A registry/catalog owner makes the
        #: store's DML commits coordinator-mediated — the
        #: multi-cluster story (see delta_log.CommitOwner, q456).
        self.commit_owner = commit_owner
        import threading

        # Staged-but-uncommitted CDF files, keyed by table name.
        # THREAD-LOCAL: a DML stages its change files immediately
        # before its own commit on the same thread; concurrent
        # writers (DagExecutor workers) must never pop each other's.
        self._cdc_local = threading.local()
        os.makedirs(warehouse_dir, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, name)

    def _pointer_path(self, name: str) -> str:
        return os.path.join(self.path(name), _POINTER)

    def _log_path(self, name: str) -> str:
        return os.path.join(self.path(name), _LOG)

    # ---------------------------------------------- layout metadata

    def layout(self, name: str) -> dict:
        """The table's declared physical layout (partition/cluster/
        zorder keys), recorded at write time — the pointer-file analog
        of Delta's table properties. ``optimize`` consumes it to
        restore clustering; empty dict if never declared."""
        import json

        p = os.path.join(self.path(name), _LAYOUT)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def _record_layout(
        self,
        name: str,
        partition_by: Sequence[str],
        cluster_by: Sequence[str],
        zorder_by: Sequence[str],
        zorder_depth: bool = False,
    ) -> None:
        import json

        meta = {
            "partition_by": list(partition_by),
            "cluster_by": list(cluster_by),
            "zorder_by": list(zorder_by),
            "zorder_depth": bool(zorder_depth),
        }
        meta_keys = {k: v for k, v in meta.items() if k != "zorder_depth"}
        if not any(meta_keys.values()):
            # A layout-less write (e.g. merge's internal overwrite)
            # keeps the standing declaration — dbt model config is
            # constant across runs, not per-write.
            return
        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(self.path(name), f"_layout_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(self.path(name), _LAYOUT))

    # --------------------------------------------- CHECK constraints

    def constraints(self, name: str) -> dict[str, str]:
        """Declared CHECK constraints, name -> SQL expression — the
        pointer-file analog of Delta's ``delta.constraints.<name>``
        table properties (mirrored into the delta log's metaData when
        ``delta_log=True``)."""
        import json

        p = os.path.join(self.path(name), _CONSTRAINTS)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def _write_constraints(self, name: str, cons: dict[str, str]) -> None:
        import json

        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(
            self.path(name), f"_cons_{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(cons, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path(name), _CONSTRAINTS))

    def add_constraint(self, name: str, cname: str, expr_sql: str) -> None:
        """``ALTER TABLE t ADD CONSTRAINT cname CHECK (expr)`` —
        Delta's CHECK-constraint semantics exactly:

        * the EXISTING data must already satisfy the expression
          (one validating scan, or the ALTER fails — a constraint
          that the table violates is a lie);
        * every subsequent write (overwrite / append / merge, COW
          and MoR alike) validates its rows and raises
          :class:`ConstraintViolationError` with NOTHING committed;
        * NULL evaluates as satisfied (SQL CHECK semantics — use
          ``x IS NOT NULL`` to forbid nulls);
        * under ``delta_log=True`` the constraint lands in metaData
          configuration as ``delta.constraints.<cname>`` and the
          protocol is upgraded to writer version ≥ 3 (the legacy
          checkConstraints writer feature), so any protocol-aware
          writer knows it must enforce or refuse.

        RESTORE is exempt: a restored version was validated under
        the constraints in force when it committed.

        Scale: enforcement is one codegen'd predicate fused into the
        write's existing scan — no extra shuffle; the validating
        ALTER scan is the one unavoidable full pass, same as Delta."""
        df = self.read(name)
        if df is None:
            raise ValueError(f"unknown table {name!r}")
        self._assert_satisfies(df, cname, expr_sql)
        cons = self.constraints(name)
        cons[cname] = expr_sql
        self._write_constraints(name, cons)
        if self.delta_log and self.current_data_dir(name) is not None:
            # surface the property in the log without waiting for the
            # next data commit (metaData-only commit, like Delta's
            # ALTER TABLE)
            with self._commit_lock(name):
                self._delta_commit(name, operation="ADD CONSTRAINT")

    def drop_constraint(self, name: str, cname: str) -> None:
        cons = self.constraints(name)
        cons.pop(cname, None)
        self._write_constraints(name, cons)
        if self.delta_log and self.current_data_dir(name) is not None:
            with self._commit_lock(name):
                self._delta_commit(name, operation="DROP CONSTRAINT")

    def _assert_satisfies(
        self, df: DataFrame, cname: str, expr_sql: str
    ) -> None:
        # agg(first) instead of take(1): in the no-violation case
        # take(1) runs up to 4 escalating jobs (1/4/20/... partitions)
        # and still ends up scanning everything; one aggregate scans
        # once, fully parallel, in a single job (round-12, guide §1.2).
        bad = (
            df.where(~F.coalesce(F.expr(expr_sql), F.lit(True)))
            .agg(F.first(F.struct(*df.columns)))
            .collect()[0][0]
        )
        if bad is not None:
            raise ConstraintViolationError(
                f"CHECK constraint {cname!r} ({expr_sql}) violated, "
                f"e.g. by row {bad.asDict()!r}; nothing committed"
            )

    def _validate_constraints(self, name: str, df: DataFrame) -> None:
        """Validate a write's rows against every declared CHECK
        constraint AND column invariant (called by the write paths
        BEFORE any data lands). Invariants use Delta's stricter
        rule — NULL violates (delta-spark CheckDeltaInvariant throws
        on null or false), unlike CHECK where NULL satisfies.

        All predicates are fused into ONE scan (round-12
        optimization, guide §1.2): the per-rule form ran one full
        pass over the write per declared rule — a table with k rules
        paid k validation scans per write. One ``take(1)`` over the
        OR of every violation predicate, with per-rule flag columns
        so the raised error still names the violated rule and an
        example row. Resolution errors (missing nested fields) are
        caught at ANALYSIS time per rule — driver-only, no job."""
        cons = self.constraints(name)
        invs = self.invariants(name)
        if not cons and not invs:
            return
        checks: list[tuple[str, str, str, object]] = []
        for cname, expr_sql in cons.items():
            checks.append(
                (
                    "check", cname, expr_sql,
                    ~F.coalesce(F.expr(expr_sql), F.lit(True)),
                )
            )
        for col, expr_sql in invs.items():
            if col.split(".", 1)[0] not in df.columns:
                raise ConstraintViolationError(
                    f"column invariant on {col!r} ({expr_sql}): the "
                    "write is missing the column entirely (all-null "
                    "violates an invariant); nothing committed"
                )
            viol = ~F.coalesce(F.expr(expr_sql), F.lit(False))
            try:
                df.select(viol)  # analysis only — no job
            except AnalysisException:
                # nested field the write's struct lacks — all-null,
                # which violates an invariant
                raise ConstraintViolationError(
                    f"column invariant on {col!r} ({expr_sql}): the "
                    "write cannot resolve the invariant's column "
                    "(missing nested field is all-null, which "
                    "violates); nothing committed"
                ) from None
            checks.append(("inv", col, expr_sql, viol))
        any_viol = checks[0][3]
        for _, _, _, v in checks[1:]:
            any_viol = any_viol | v
        # agg(first) instead of take(1) — one fully-parallel job in
        # the (common) all-pass case; take's partition escalation ran
        # up to 4 jobs per validated write and scanned everything
        # anyway when nothing violated (round-12, guide §1.2).
        bad = (
            df.where(any_viol)
            .select(
                F.struct(
                    F.struct(*df.columns).alias("__row"),
                    *[
                        F.coalesce(v, F.lit(False)).alias(f"__v{i}")
                        for i, (_, _, _, v) in enumerate(checks)
                    ],
                ).alias("__b")
            )
            .agg(F.first("__b"))
            .collect()[0][0]
        )
        if bad is None:
            return
        row = bad["__row"].asDict()
        for i, (kind, label, expr_sql, _) in enumerate(checks):
            if not bad[f"__v{i}"]:
                continue
            if kind == "check":
                raise ConstraintViolationError(
                    f"CHECK constraint {label!r} ({expr_sql}) "
                    f"violated, e.g. by row {row!r}; nothing committed"
                )
            raise ConstraintViolationError(
                f"column invariant on {label!r} ({expr_sql}) "
                f"violated (null or false), e.g. by row "
                f"{row!r}; nothing committed"
            )

    # ------------------------------------- table properties / invariants

    def table_properties(self, name: str) -> dict[str, str]:
        """Declared table properties (``delta.appendOnly``, ...) —
        the pointer-file analog of Delta's TBLPROPERTIES, mirrored
        into the delta log's metaData configuration when
        ``delta_log=True``."""
        import json

        p = os.path.join(self.path(name), _PROPS)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def set_table_property(self, name: str, key: str, value: str) -> None:
        """``ALTER TABLE t SET TBLPROPERTIES (key = value)`` — one
        sidecar write plus (under ``delta_log=True``) a metaData-only
        log commit so protocol-aware readers see the property
        immediately, like Delta's ALTER TABLE."""
        import json

        props = self.table_properties(name)
        props[str(key)] = str(value)
        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(self.path(name), f"_props_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(props, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path(name), _PROPS))
        if self.delta_log and self.current_data_dir(name) is not None:
            with self._commit_lock(name):
                self._delta_commit(name, operation="SET TBLPROPERTIES")

    def set_append_only(self, name: str, enabled: bool = True) -> None:
        """Activate Delta's **append-only** writer feature
        (``delta.appendOnly = true``, PROTOCOL.md "Append-only
        Tables"): every mutating path — DELETE/UPDATE/MERGE (COW and
        MoR alike), overwrite, RESTORE — refuses with nothing
        written; appends and OPTIMIZE (rearrange-only,
        ``dataChange: false``) still land. The reference's bronze CDC
        tables are exactly this shape (bronze.yml: immutable change
        streams)."""
        from product_analytics_spark.sources import delta_log as dl

        self.set_table_property(
            name, dl.APPEND_ONLY_PROP, "true" if enabled else "false"
        )

    def append_only(self, name: str) -> bool:
        from product_analytics_spark.sources import delta_log as dl

        return self.table_properties(name).get(
            dl.APPEND_ONLY_PROP
        ) == "true"

    def _assert_appendable(self, name: str, op: str) -> None:
        """The writer-side append-only gate: called at the TOP of
        every data-mutating path, before any data is written — a
        compliant Delta writer must refuse, not repair (PROTOCOL.md
        "Append-only Tables")."""
        from product_analytics_spark.sources import delta_log as dl

        if self.append_only(name):
            raise dl.DeltaProtocolError(
                f"table {name!r} is append-only "
                f"({dl.APPEND_ONLY_PROP}=true): {op} is forbidden; "
                "appends and rearrange-only OPTIMIZE still land"
            )

    def invariants(self, name: str) -> dict[str, str]:
        """Declared column invariants, column -> SQL expression
        (Delta's ``delta.invariants`` field metadata, the legacy
        writer-version-2 feature) — enforced on every write by
        ``_validate_constraints``; mirrored into the log metaData's
        schemaString field metadata when ``delta_log=True``."""
        import json

        p = os.path.join(self.path(name), _INVARIANTS)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def set_invariant(self, name: str, col: str, expr_sql: str) -> None:
        """Declare a column invariant: existing data must already
        satisfy it (one validating scan, null-violates rule — an
        invariant the table breaks is a lie), then every subsequent
        write validates its rows and raises
        :class:`ConstraintViolationError` with NOTHING committed."""
        import json

        df = self.read(name)
        if df is None:
            raise ValueError(f"unknown table {name!r}")
        if col.split(".", 1)[0] not in df.columns:
            raise ValueError(f"no column {col!r} in table {name!r}")
        try:
            # agg(first) not take(1): one job (round-12, guide §1.2).
            bad = (
                df.where(~F.coalesce(F.expr(expr_sql), F.lit(False)))
                .agg(F.first(F.struct(*df.columns)))
                .collect()[0][0]
            )
        except AnalysisException:
            raise ValueError(
                f"no column {col!r} in table {name!r} (nested field "
                "missing)"
            ) from None
        if bad is not None:
            raise ConstraintViolationError(
                f"existing data violates invariant on {col!r} "
                f"({expr_sql}), e.g. row {bad.asDict()!r}"
            )
        invs = self.invariants(name)
        invs[col] = expr_sql
        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(self.path(name), f"_invs_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(invs, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path(name), _INVARIANTS))
        if self.delta_log and self.current_data_dir(name) is not None:
            with self._commit_lock(name):
                self._delta_commit(name, operation="ALTER TABLE")

    # --------------------------------------------- generated columns

    def generated_columns(self, name: str) -> dict[str, str]:
        """Declared generated columns, column -> SQL generation
        expression (Delta's ``delta.generationExpression`` field
        metadata, the writer-version-4 generatedColumns feature)."""
        import json

        p = os.path.join(self.path(name), _GENERATED)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def set_generated(self, name: str, col: str, expr_sql: str) -> None:
        """Declare ``col`` GENERATED ALWAYS AS (expr) — Delta's
        generated-column contract:

        * a write that OMITS the column gets it computed (and
          materialized into the files, like Delta);
        * a write that SUPPLIES it is validated — any row where the
          supplied value differs from the expression (null-safe) is
          a ConstraintViolationError with nothing committed;
        * under ``delta_log=True`` the expression lands in the
          field's metadata as ``delta.generationExpression`` and the
          protocol floor moves to writer ≥ 4.

        Declare BEFORE the first write that should carry the column
        (the canonical use: a partition column derived from an event
        timestamp, so writers can't desynchronize the partition key
        from the data — at 100 TB a mispartitioned day is a silent
        full-scan tax on every downstream query until repaired)."""
        import json

        gens = self.generated_columns(name)
        gens[col] = expr_sql
        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(self.path(name), f"_gen_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(gens, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path(name), _GENERATED))

    def _apply_generated(self, name: str, df: DataFrame) -> DataFrame:
        """Compute absent generated columns; validate supplied ones
        (exact null-safe equality with the generation expression)."""
        gens = self.generated_columns(name)
        for col, expr_sql in gens.items():
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr_sql))
            else:
                # agg(first) not take(1): one job in the all-pass case
                # (round-12, guide §1.2 — same rationale as
                # _validate_constraints).
                bad = (
                    df.where(~F.col(col).eqNullSafe(F.expr(expr_sql)))
                    .agg(F.first(F.struct(*df.columns)))
                    .collect()[0][0]
                )
                if bad is not None:
                    raise ConstraintViolationError(
                        f"generated column {col!r} = ({expr_sql}) "
                        f"violated by supplied value, e.g. row "
                        f"{bad.asDict()!r}; nothing committed"
                    )
        return df

    # ---------------------------------------------- identity columns

    def identity_columns(self, name: str) -> dict[str, dict]:
        """Declared identity columns, column -> {start, step,
        high_water_mark} (Delta's ``delta.identity.*`` field
        metadata, the writer-version-6 identityColumns feature)."""
        import json

        p = os.path.join(self.path(name), _IDENTITY)
        if not os.path.isfile(p):
            return {}
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    def _write_identity(self, name: str, ids: dict[str, dict]) -> None:
        import json

        os.makedirs(self.path(name), exist_ok=True)
        tmp = os.path.join(self.path(name), f"_id_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(ids, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path(name), _IDENTITY))

    def set_identity(
        self, name: str, col: str, start: int = 1, step: int = 1
    ) -> None:
        """Declare ``col`` as GENERATED ALWAYS AS IDENTITY (START
        WITH ``start`` INCREMENT BY ``step``) — Delta's identity
        columns (writer-version-6 feature):

        * a write that OMITS the column gets fresh values allocated
          above the persisted high-water mark (monotonic per
          allocation order; Delta guarantees uniqueness+monotonicity,
          NOT gap-freedom — neither do we: a failed transaction may
          burn a range, exactly like every database sequence);
        * a write that SUPPLIES the column is refused (GENERATED
          ALWAYS semantics — Delta's writer does the same);
        * the high-water mark is persisted (``delta.identity.
          highWaterMark`` analog) so restarts never re-issue ids.

        Declare BEFORE the first write. Scale: allocation is one
        window-free ``zipWithIndex``-style pass over ONLY the new
        rows (monotonically_increasing_id + a rank over partition
        ids would shuffle; instead we use the partition-local offsets
        trick — O(rows written), no extra shuffle, no global sort)."""
        if step == 0:
            raise ValueError("identity step must be non-zero")
        ids = self.identity_columns(name)
        ids[col] = {"start": int(start), "step": int(step),
                    "high_water_mark": None}
        self._write_identity(name, ids)

    def _identity_lock(self, name: str):
        """Serializes the identity read-allocate-persist cycle
        (ADVICE r9: two concurrent writers both reading the same HWM
        would mint duplicate surrogate keys). A dedicated lock file —
        NOT the commit lock, which is held for microseconds; the
        allocation holds this one across a small Spark job (the
        localCheckpoint pin + max), so the deadline is longer."""
        os.makedirs(self.path(name), exist_ok=True)
        return self._flock(
            os.path.join(self.path(name), "_ID_LOCK"), deadline_s=120.0
        )

    def _apply_identity(self, name: str, df: DataFrame) -> DataFrame:
        """Allocate identity values for absent identity columns;
        refuse supplied ones. The whole read-HWM / allocate / persist
        cycle runs under ``_identity_lock`` so concurrent writers get
        DISJOINT ranges, and the allocated (nondeterministic) column
        is PINNED via localCheckpoint before the HWM is computed from
        it — a later re-plan (AQE, a different join order in
        ``_identity_merge_batch``) can therefore never write ids that
        differ from the ones the HWM covered. Advances the persisted
        high-water mark BEFORE the write (a crashed write burns the
        range — ids stay unique, like any sequence)."""
        ids = self.identity_columns(name)
        if not ids:
            return df
        for col in ids:
            if col in df.columns:
                raise ConstraintViolationError(
                    f"column {col!r} is GENERATED ALWAYS AS IDENTITY —"
                    " writers must not supply it"
                )
        with self._identity_lock(name):
            ids = self.identity_columns(name)  # re-read under the lock
            for col, spec in ids.items():
                step = int(spec["step"])
                hwm = spec["high_water_mark"]
                base = int(spec["start"]) if hwm is None else int(hwm) + step
                # JVM-side allocation: base + monotonically_increasing_id
                # · step — zero shuffles, zero Python row round-trips.
                # Values within a batch are unique and increasing but
                # NOT contiguous (the per-partition id space leaves
                # gaps) — exactly Delta's own identity allocator, which
                # hands each task a range and burns the remainder.
                # Gap-freedom was never the contract; uniqueness +
                # monotonic-above-HWM is.
                df = df.withColumn(
                    col,
                    (
                        F.lit(base)
                        + F.monotonically_increasing_id() * F.lit(step)
                    ).cast("long"),
                )
            # Pin the nondeterministic ids ONCE: after this, the HWM
            # job below and the downstream write read the SAME
            # materialized values. Cost: one pass over only the new
            # rows (O(batch), never O(table)). Round-13 (guide §1.2):
            # the checkpoint is LAZY and the HWM aggregate right below
            # is its materializing action — the full-relation agg
            # computes (and thereby caches) every checkpoint
            # partition, so pin + HWM cost ONE job instead of the old
            # eager-checkpoint-then-agg two.
            df = df.localCheckpoint(eager=False)
            # the high-water mark is the furthest value IN THE STEP
            # DIRECTION (negative increments descend, like SQL
            # sequences and Delta's) — one combined agg job for all
            # identity columns
            row = df.agg(
                *[
                    (
                        F.max(c) if int(ids[c]["step"]) > 0 else F.min(c)
                    ).alias(c)
                    for c in ids
                ]
            ).collect()[0]
            changed = False
            for col, spec in ids.items():
                v = row[col]
                if v is not None:
                    spec["high_water_mark"] = int(v)
                    changed = True
            if changed:
                self._write_identity(name, ids)
        return df

    def _advance_identity_hwm(self, name: str, version: str) -> None:
        """After a write that SUPPLIED identity values (``overwrite``
        doubles as the engine's internal rewrite primitive, and a user
        full-refresh may legitimately carry existing keys), push the
        persisted high-water mark past the furthest supplied value so
        later allocations never duplicate them (ADVICE r9). The
        furthest value comes from the written files' parquet FOOTERS
        — zero Spark jobs, O(|files|) metadata reads."""
        import pyarrow.parquet as pq

        ids = self.identity_columns(name)
        if not ids:
            return
        vdir = os.path.join(self.path(name), version)
        far: dict[str, int] = {}
        for root, dirs, files in os.walk(vdir):
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            for f in files:
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(root, f)).metadata
                except OSError:
                    continue
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        col = md.row_group(rg).column(ci)
                        cname = col.path_in_schema
                        spec = ids.get(cname)
                        st = col.statistics
                        if spec is None or st is None or not st.has_min_max:
                            continue
                        v = int(st.max if int(spec["step"]) > 0 else st.min)
                        if cname not in far:
                            far[cname] = v
                        elif int(spec["step"]) > 0:
                            far[cname] = max(far[cname], v)
                        else:
                            far[cname] = min(far[cname], v)
        if not far:
            return
        with self._identity_lock(name):
            ids = self.identity_columns(name)
            changed = False
            for col, spec in ids.items():
                v = far.get(col)
                if v is None:
                    continue
                step, hwm = int(spec["step"]), spec["high_water_mark"]
                if (
                    hwm is None
                    or (step > 0 and v > int(hwm))
                    or (step < 0 and v < int(hwm))
                ):
                    spec["high_water_mark"] = v
                    changed = True
            if changed:
                self._write_identity(name, ids)

    def _identity_merge_batch(
        self, name: str, prev: DataFrame | None, batch: DataFrame,
        keys: list[str],
    ) -> DataFrame:
        """MERGE semantics for an identity table: matched keys INHERIT
        their existing identity value (one key-join against the live
        side's key+identity projection — broadcastable when the batch
        is small); unmatched rows get fresh allocations. Supplying the
        column in the batch is refused (GENERATED ALWAYS)."""
        ids = self.identity_columns(name)
        if not ids:
            return batch
        if len(ids) > 1:
            raise ValueError(
                "at most one identity column per table is supported"
            )
        col = next(iter(ids))
        if col in batch.columns:
            raise ConstraintViolationError(
                f"column {col!r} is GENERATED ALWAYS AS IDENTITY —"
                " writers must not supply it"
            )
        if prev is None:
            return self._apply_identity(name, batch)
        tagged = batch.join(prev.select(*keys, col), keys, "left")
        existing = tagged.where(F.col(col).isNotNull())
        fresh = self._apply_identity(
            name, tagged.where(F.col(col).isNull()).drop(col)
        )
        return existing.unionByName(fresh.select(*existing.columns))

    def versions(self, name: str) -> list[str]:
        """Committed versions still on disk, oldest→newest (the
        retention window's tail of the commit log)."""
        log = self._log_path(name)
        if not os.path.isfile(log):
            return []
        with open(log, encoding="utf-8") as fh:
            committed = [ln.strip() for ln in fh if ln.strip()]
        return [
            v for v in committed if os.path.isdir(os.path.join(self.path(name), v))
        ]

    def current_data_dir(self, name: str) -> str | None:
        """Directory of the committed version, or None if absent.

        Pointer layout if present; otherwise a plain parquet dir
        (append-only tables, pre-existing data) is its own version.
        """
        table = self.path(name)
        ptr = self._pointer_path(name)
        if os.path.isfile(ptr):
            with open(ptr, encoding="utf-8") as fh:
                version = fh.read().strip()
            vdir = os.path.join(table, version)
            return vdir if os.path.isdir(vdir) else None
        return table if os.path.isdir(table) else None

    def current_version(self, name: str) -> str | None:
        """The committed version id (pointer contents) — the snapshot
        identity an optimistic transaction reads and later presents as
        ``expected_version`` at commit. None before the first commit
        (and for plain pre-existing dirs, which have no pointer)."""
        ptr = self._pointer_path(name)
        if not os.path.isfile(ptr):
            return None
        with open(ptr, encoding="utf-8") as fh:
            return fh.read().strip()

    def exists(self, name: str) -> bool:
        return self.current_data_dir(name) is not None

    def read(self, name: str, version: int | str | None = None) -> DataFrame | None:
        """Prior snapshot ({{ this }}) or None on first run.

        ``version`` time-travels within the retention window: an int
        indexes ``versions()`` (0 = oldest retained, -1 = current), a
        str names a version directory directly. Requires the store to
        have been created with ``retain_versions > 1`` for anything
        but the current version to still exist.

        If the version carries a deletion vector (``_dv/`` — written
        by ``delete_where_mor``), the tombstoned row positions are
        filtered out via a broadcast anti-join on
        (file basename, ``_metadata.row_index``) — the merge-on-read
        half of the DELETE cost model (q290)."""
        rt = self._row_tracking(name)

        def _hide_rt(df: DataFrame) -> DataFrame:
            # the materialized row-id columns are PHYSICAL, not
            # logical — plain reads never expose them (Delta hides
            # them the same way); read_row_ids is the id-aware reader
            if not rt:
                return df
            from product_analytics_spark.sources import delta_log as dl

            return df.drop(
                dl.MATERIALIZED_ROW_ID_COL, dl.MATERIALIZED_ROW_COMMIT_COL
            )

        if version is None:
            data = self.current_data_dir(name)
            if data is None:
                return None
            return _hide_rt(self._apply_dv(data, merge_schema=rt))
        if isinstance(version, int):
            vs = self.versions(name)
            if not vs:
                return None
            version = vs[version]
        vdir = os.path.join(self.path(name), version)
        if not os.path.isdir(vdir):
            return None
        return _hide_rt(self._apply_dv(vdir, merge_schema=rt))

    # ------------------------------------------ deletion vectors (MoR)

    @staticmethod
    def _dv_dir(data_dir: str) -> str:
        # underscore prefix ⇒ invisible to spark.read.parquet(data_dir)
        # and to _partition_dirs, like _delta_log / _SUCCESS
        return os.path.join(data_dir, "_dv")

    def _has_dv(self, name: str) -> bool:
        data = self.current_data_dir(name)
        return data is not None and os.path.isdir(self._dv_dir(data))

    @classmethod
    def _dv_file_rows(cls, data_dir: str) -> int:
        """Row count of a version's deletion vector from its parquet
        FOOTERS (round-13, guide §1.2): the MoR DMLs wrote the _dv
        relation themselves moments earlier, so reporting its size
        back ran a full Spark count JOB per DML for a number the
        footers already hold — O(|files|) driver metadata reads."""
        import pyarrow.parquet as pq

        dv_dir = cls._dv_dir(data_dir)
        n = 0
        for f in sorted(os.listdir(dv_dir)):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                n += pq.ParquetFile(
                    os.path.join(dv_dir, f)
                ).metadata.num_rows
        return n

    @staticmethod
    def _rel_path_col(data_dir: str):
        """``_metadata.file_path`` relative to the version dir — the
        DV's file key. Basenames alone are NOT unique (a partitionBy
        task reuses its part-file name in every hive dir it writes),
        but the version-relative path is, and it stays stable across
        hardlinked versions because links mirror the relative layout."""
        prefix = "file:" + os.path.abspath(data_dir).rstrip("/") + "/"
        return F.substring(
            F.col("_metadata.file_path"), len(prefix) + 1, 1 << 20
        )

    def _row_tracking(self, name: str) -> bool:
        """O(1) row-tracking check (marker file written by
        ``enable_row_tracking`` — the log's configuration is the
        source of truth, this avoids a snapshot replay per read)."""
        return os.path.isfile(os.path.join(self.path(name), _ROW_TRACKING))

    def enable_row_tracking(self, name: str) -> int:
        """Enable the Delta row-tracking writer feature on this table
        (requires ``delta_log=True``): protocol upgrade + per-file
        ``baseRowId`` backfill + ``delta.rowTracking`` domainMetadata
        high-water mark (see ``delta_log.enable_row_tracking``). From
        then on every commit allocates fresh id ranges for new files,
        and the MoR DML paths PRESERVE matched rows' ids by
        materializing them into the rewritten files. Read ids back
        with ``delta_log.read_row_ids``."""
        if not self.delta_log:
            raise ValueError("row tracking requires delta_log=True")
        from product_analytics_spark.sources import delta_log as dl

        v = dl.enable_row_tracking(self.path(name))
        marker = os.path.join(self.path(name), _ROW_TRACKING)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("enabled\n")
        return v

    def _rt_base_df(self, name: str, data_dir: str):
        """Broadcastable (version-relative path, baseRowId,
        defaultRowCommitVersion) map of the CURRENT snapshot — the
        O(|files|) side of the virtual-row-id computation."""
        from product_analytics_spark.sources import delta_log as dl

        snap = dl.DeltaLog(self.path(name)).snapshot()
        vbase = os.path.basename(os.path.normpath(data_dir))
        rows = []
        for rel in sorted(snap.files):
            add = snap.files[rel]
            if add.get("baseRowId") is None:
                raise dl.DeltaProtocolError(
                    f"row-tracked table {name!r}: live file {rel!r} "
                    "has no baseRowId"
                )
            vrel = (
                rel.split("/", 1)[1]
                if rel.startswith(vbase + "/")
                else rel
            )
            rows.append(
                (
                    vrel,
                    int(add["baseRowId"]),
                    int(add.get("defaultRowCommitVersion") or 0),
                )
            )
        return dl._positions_df(
            self.spark, rows,
            "__rt_p string, __rt_base bigint, __rt_cv bigint",
        )

    def _rt_attach_ids(
        self, name: str, data_dir: str, scan: DataFrame, base_df=None
    ):
        """Tag a raw scan with the stable ``_pa_row_id_m`` /
        ``_pa_row_commit_m`` columns: materialized values (from a
        prior rewrite) win; otherwise ``baseRowId + row_index``. Must
        be applied directly on the scan (``_metadata`` is a scan
        pseudo-column). Pass a precomputed ``base_df`` when calling
        in a loop — it costs one log-snapshot replay per build."""
        from product_analytics_spark.sources import delta_log as dl

        rt_id, rt_cv = (
            dl.MATERIALIZED_ROW_ID_COL,
            dl.MATERIALIZED_ROW_COMMIT_COL,
        )
        if base_df is None:
            base_df = self._rt_base_df(name, data_dir)
        mat_id = (
            F.col(rt_id)
            if rt_id in scan.columns
            else F.lit(None).cast("long")
        )
        mat_cv = (
            F.col(rt_cv)
            if rt_cv in scan.columns
            else F.lit(None).cast("long")
        )
        logical = [c for c in scan.columns if c not in (rt_id, rt_cv)]
        return (
            scan.select(
                "*",
                self._rel_path_col(data_dir).alias("__rt_relp"),
                F.col("_metadata.row_index").alias("__rt_ri"),
            )
            .join(
                F.broadcast(base_df),
                F.col("__rt_relp") == F.col("__rt_p"),
                "left",
            )
            .select(
                *logical,
                F.coalesce(mat_id, F.col("__rt_base") + F.col("__rt_ri"))
                .cast("long")
                .alias(rt_id),
                F.coalesce(mat_cv, F.col("__rt_cv"))
                .cast("long")
                .alias(rt_cv),
            )
        )

    #: Target bytes per written file/task (guide §6: output files in
    #: the 128 MB - 1 GB range). Drives the size-adaptive write task
    #: count below; env-overridable for clusters with different file
    #: sizing goals.
    _WRITE_TARGET_BYTES = int(
        os.environ.get("SPARK_GRAFT_WRITE_TARGET_BYTES", str(128 << 20))
    )

    def _n_write_tasks(self, df: DataFrame, floor: int = 1) -> int:
        """Size-adaptive task count for a write repartition (round-12,
        guide §2.5/§6): ``ceil(estimated bytes / 128 MB target)``
        clamped to ``[floor, spark.sql.shuffle.partitions]``.

        The estimate is Catalyst's ``analyzed().stats()`` — a
        driver-only py4j call on the ALREADY-analyzed plan (no job,
        and no extra optimizer pass: the write re-optimizes its own
        tree regardless); for parquet-backed plans it is the sum of
        the input file sizes, and for plans with unknown stats it
        degenerates to Long.MaxValue, which the clamp turns into the
        conf count (the previous fixed behavior, so the fallback is
        never worse). A 15k-row lifecycle write thus gets a handful
        of tasks (measured: 512 ms at 32 tasks -> ~300 ms) while a
        100 GB write gets est/128MB tasks up to the conf cap, which a
        cluster submit raises with the cluster."""
        conf_parts = int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        floor = max(1, min(floor, conf_parts))
        try:
            est = int(
                df._jdf.queryExecution().analyzed().stats().sizeInBytes()
            )
        except Exception:  # noqa: BLE001 — estimate is best-effort
            return conf_parts
        n = (est + self._WRITE_TARGET_BYTES - 1) // self._WRITE_TARGET_BYTES
        return max(floor, min(conf_parts, int(n)))

    def _existing_dir_floor(self, name: str) -> int:
        """Floor for a partitioned write's task count: the committed
        version's hive-directory count (driver metadata, no job), so
        a many-directory table never collapses to one task writing
        every directory serially (measured 1.1 s/write at ~80 dirs);
        8 for a fresh table (no dirs to count yet)."""
        try:
            cur = self.current_version(name)
            if cur:
                return max(
                    1,
                    len(
                        self._partition_dirs(
                            os.path.join(self.path(name), cur)
                        )
                    ),
                )
        except Exception:  # noqa: BLE001 — metadata probe only
            pass
        return 8

    def _read_version_dir(
        self, data_dir: str, merge_schema: bool = False
    ) -> DataFrame:
        """Parquet read of an IMMUTABLE store directory with the read
        schema memoized per (dir, mergeSchema) for the life of the
        process (round-12, guide §1.2/§6): version dirs are
        ``v_<uuid>``-named and written exactly once before their
        commit, so the schema inference every repeated read paid
        (~70-80 ms of footer resolution per ``spark.read.parquet``
        call; the DML certs re-read the same version several times
        per op) resolves once and is forced thereafter. The memo
        holds METADATA only (StructType per dir) — never rows — and
        uuid naming means a rebuilt table can never collide with a
        stale entry."""
        key = (os.path.abspath(data_dir), bool(merge_schema))
        # Resolved-plan memo (round-13, guide §1.2): even with the
        # schema memoized, every call paid ~15 ms of py4j reader
        # resolution (file listing + relation construction). The
        # RESOLVED DataFrame is immutable and reusable; the content
        # signature in the key catches in-place mutation (append into
        # the live dir, a new _dv file) and evicts the stale plan.
        app_id = self.spark.sparkContext.applicationId
        pkey = (app_id, *key, _dir_signature(data_dir))
        cached = _VERSION_DIR_PLANS.get(pkey)
        if cached is not None:
            return cached
        sch = _VERSION_DIR_SCHEMAS.get(key)
        if sch is not None:
            base = self.spark.read.schema(sch).parquet(data_dir)
        else:
            reader = self.spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            base = reader.parquet(data_dir)
            _VERSION_DIR_SCHEMAS[key] = base.schema
        with _VERSION_DIR_PLANS_LOCK:
            # evict superseded signatures of this dir and entries from
            # stopped sessions so the memo stays bounded
            for k in [
                k
                for k in _VERSION_DIR_PLANS
                if k[:3] == pkey[:3] or k[0] != app_id
            ]:
                _VERSION_DIR_PLANS.pop(k, None)
            # hard cap (FIFO): a long sweep touches thousands of
            # version dirs and each entry pins a JVM plan — the memo
            # only needs to span one operator's handful of re-reads.
            while len(_VERSION_DIR_PLANS) >= 256:
                _VERSION_DIR_PLANS.pop(next(iter(_VERSION_DIR_PLANS)))
            _VERSION_DIR_PLANS[pkey] = base
        return base

    def _apply_dv(
        self, data_dir: str, merge_schema: bool = False
    ) -> DataFrame:
        """Read a version dir, filtering deletion-vectored positions:
        broadcast anti-join on (version-relative path, row_index).
        ``merge_schema`` is set by row-tracked tables, whose rewritten
        files carry the materialized row-id columns the hardlinked
        ones lack."""
        base = self._read_version_dir(data_dir, merge_schema=merge_schema)
        dv_dir = self._dv_dir(data_dir)
        if not os.path.isdir(dv_dir):
            return base
        dv = self._read_version_dir(dv_dir)
        cols = base.columns
        return (
            base.select(
                "*",
                self._rel_path_col(data_dir).alias("__dv_f"),
                F.col("_metadata.row_index").alias("__dv_ri"),
            )
            .join(
                F.broadcast(dv),
                (F.col("__dv_f") == dv["path"])
                & (F.col("__dv_ri") == dv["row_index"]),
                "left_anti",
            )
            .select(*cols)
        )

    def delete_where_mor(
        self,
        name: str,
        predicate: str,
        max_retries: int = 3,
        post_scan=None,
    ) -> dict:
        """Merge-on-read DELETE (Delta deletion vectors' semantics):
        NO data file is rewritten — matching LIVE rows' (file,
        row_index) positions are appended to the version's deletion
        vector, every data file is hardlinked into the new version,
        and readers apply the DV as a broadcast anti-join. This is
        the low-write-amplification half of the q290 cost model:
        deleting 3 rows from a 128 MB file costs a few DV bytes, not
        a 128 MB rewrite; reads pay one broadcast anti-join until the
        next OPTIMIZE/compact/merge materializes the deletes and drops
        the DV. Optimistic transaction like the COW paths
        (``post_scan`` = the same fault-injection window).

        With ``delta_log=True`` the commit additionally emits
        protocol-v3 ``deletionVector`` descriptors on the affected
        adds (roaring-bitmap sidecar per commit, protocol upgraded to
        reader 3 / writer 7 with the deletionVectors table feature —
        see ``sources/deletion_vectors.py``), so log consumers
        (``read_delta``/``read_pruned``) see exactly the live rows."""
        self._assert_appendable(name, "DELETE (merge-on-read)")
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            cdc_fut = None
            try:
                data = self.current_data_dir(name)
                if data is None:
                    raise ValueError(f"unknown table {name!r}")
                # positions of matching rows among LIVE rows only.
                # With CDF on, the matched rows feed BOTH the change
                # file and the deletion vector — one persisted
                # O(matched) intermediate instead of two full scans
                # of the live relation (round-12 optimization, guide
                # §1.2: every extra consumer re-ran the scan + DV
                # anti-join).
                live = self._apply_dv(data)
                matched = live.where(predicate).select(
                    "*",
                    self._rel_path_col(data).alias("__pos_f"),
                    F.col("_metadata.row_index").alias("__pos_ri"),
                )
                if self.cdf:
                    matched = matched.persist(
                        StorageLevel.MEMORY_AND_DISK
                    )
                try:
                    new_pos = matched.select(
                        F.col("__pos_f").alias("path"),
                        F.col("__pos_ri").alias("row_index"),
                    )
                    old_dv_dir = self._dv_dir(data)
                    if os.path.isdir(old_dv_dir):
                        merged_dv = (
                            self._read_version_dir(old_dv_dir)
                            .unionByName(new_pos)
                            .distinct()
                        )
                    else:
                        merged_dv = new_pos.distinct()
                    if post_scan is not None:
                        post_scan()
                    # Materialize-then-fork (round-13, VERDICT r12
                    # item 2, guide §2.6): the round-12 async attempt
                    # lost because the cdc and DV jobs raced to fill
                    # the `matched` cache. Materializing the persisted
                    # intermediate FIRST (one cheap count — the scan
                    # that one consumer was paying anyway) lets the
                    # cdc stage overlap the hardlink pass and the DV
                    # write, both now pure cache readers.
                    if self.cdf:
                        matched.count()
                        cdc_fut = self._stage_cdc_async(
                            name,
                            matched.drop("__pos_f", "__pos_ri").withColumn(
                                "_change_type", F.lit("delete")
                            ),
                        )
                    n_link = 0
                    for rel, files in self._partition_dirs(data):
                        out_dir = (
                            vdir if rel == "." else os.path.join(vdir, rel)
                        )
                        os.makedirs(out_dir, exist_ok=True)
                        for f in files:
                            os.link(
                                f, os.path.join(out_dir, os.path.basename(f))
                            )
                            n_link += 1
                    merged_dv.coalesce(1).write.parquet(self._dv_dir(vdir))
                    self._adopt_cdc(name, cdc_fut)
                    self._commit(
                        name, version, expected_version=expected,
                        operation="DELETE",
                    )
                finally:
                    if self.cdf:
                        matched.unpersist(False)
            except ConcurrentWriteError as exc:
                last_err = exc
                self._abort_cdc(name, cdc_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except Exception:
                self._abort_cdc(name, cdc_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under MoR delete"
                )
                continue
            return {
                "files_linked": n_link,
                "files_rewritten": 0,
                "dv_rows": self._dv_file_rows(
                    os.path.join(self.path(name), version)
                ),
            }
        assert last_err is not None
        raise last_err

    def update_where_mor(
        self,
        name: str,
        predicate: str,
        assignments: dict[str, str],
        max_retries: int = 3,
        post_scan=None,
    ) -> dict:
        """Merge-on-read UPDATE (Delta's deletion-vector UPDATE shape):
        matching LIVE rows are tombstoned into the deletion vector and
        their UPDATED versions are written as new data files into the
        same version — every pre-existing file is hardlinked, so write
        amplification is O(matched rows), not O(touched files).
        ``assignments`` maps column -> SQL expression (cast back to the
        column's original type, same schema-enforcement rule as the
        COW update). Partition-column reassignment is refused (it
        would move rows across hive directories). Under
        ``delta_log=True`` the commit carries protocol-v3
        ``deletionVector`` descriptors like ``delete_where_mor``."""
        data0 = self.current_data_dir(name)
        if data0 is not None:
            part_cols = {
                c
                for rel, _fs in self._partition_dirs(data0)
                for c, _v in self._partition_literals(rel)
            }
            bad = part_cols & set(assignments)
            if bad:
                raise ValueError(
                    f"update_where_mor cannot reassign partition columns "
                    f"{sorted(bad)}"
                )
        self._assert_appendable(name, "UPDATE (merge-on-read)")
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            cdc_fut = None
            val_fut = None
            dv_fut = None
            try:
                data = self.current_data_dir(name)
                if data is None:
                    raise ValueError(f"unknown table {name!r}")
                rt = self._row_tracking(name)
                live = self._apply_dv(data, merge_schema=rt)
                if rt:
                    from product_analytics_spark.sources import (
                        delta_log as dl,
                    )

                    rt_cols = (
                        dl.MATERIALIZED_ROW_ID_COL,
                        dl.MATERIALIZED_ROW_COMMIT_COL,
                    )
                    logical_cols = [
                        c for c in live.columns if c not in rt_cols
                    ]
                else:
                    rt_cols = ()
                    logical_cols = list(live.columns)
                part_cols_now = [
                    c
                    for rel, _fs in self._partition_dirs(data)
                    for c, _v in self._partition_literals(rel)
                ]
                part_cols_now = list(dict.fromkeys(part_cols_now))
                # ONE scan finds the matched rows WITH their positions;
                # everything downstream (deletion vector, rewritten
                # rows, constraint validation, CDF pre/post images)
                # derives from this persisted O(matched) intermediate.
                # The per-consumer form re-ran the live scan + DV
                # anti-join up to 4x per UPDATE (round-12 optimization,
                # guide §1.2).
                matched = live.where(predicate).select(
                    "*",
                    self._rel_path_col(data).alias("__pos_f"),
                    F.col("_metadata.row_index").alias("__pos_ri"),
                ).persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    new_pos = matched.select(
                        F.col("__pos_f").alias("path"),
                        F.col("__pos_ri").alias("row_index"),
                    )
                    old_dv_dir = self._dv_dir(data)
                    if os.path.isdir(old_dv_dir):
                        merged_dv = (
                            self._read_version_dir(old_dv_dir)
                            .unionByName(new_pos)
                            .distinct()
                        )
                    else:
                        merged_dv = new_pos.distinct()
                    # Row tracking: the rewritten rows carry their OLD
                    # ids in the materialized columns, so identity
                    # survives the tombstone-and-rewrite (Delta's exact
                    # mechanism). The position tags double as the
                    # row-id join key — no second scan.
                    if rt:
                        from product_analytics_spark.sources import (
                            delta_log as dl,
                        )

                        rt_id, rt_cv = (
                            dl.MATERIALIZED_ROW_ID_COL,
                            dl.MATERIALIZED_ROW_COMMIT_COL,
                        )
                        base_df = self._rt_base_df(name, data)
                        mat_id = (
                            F.col(rt_id)
                            if rt_id in live.columns
                            else F.lit(None).cast("long")
                        )
                        mat_cv = (
                            F.col(rt_cv)
                            if rt_cv in live.columns
                            else F.lit(None).cast("long")
                        )
                        updated = matched.join(
                            F.broadcast(base_df),
                            F.col("__pos_f") == F.col("__rt_p"),
                            "left",
                        ).select(
                            *logical_cols,
                            F.coalesce(
                                mat_id,
                                F.col("__rt_base") + F.col("__pos_ri"),
                            )
                            .cast("long")
                            .alias(rt_id),
                            F.coalesce(mat_cv, F.col("__rt_cv"))
                            .cast("long")
                            .alias(rt_cv),
                        )
                    else:
                        updated = matched.drop("__pos_f", "__pos_ri")
                    for col, expr_sql in assignments.items():
                        updated = updated.withColumn(
                            col,
                            F.expr(expr_sql).cast(live.schema[col].dataType),
                        )
                    updated = updated.select(*logical_cols, *rt_cols)
                    # Materialize-then-fork (round-13, VERDICT r12
                    # item 2, guide §2.6): fill the shared `matched`
                    # cache with ONE count — the scan its first
                    # consumer was paying anyway — then run the
                    # validation probe, the cdc stage and the DV write
                    # as overlapped cache readers alongside the
                    # hardlink pass and the rewrite write. The
                    # round-12 fork-without-materialize attempt lost
                    # exactly because the forks raced to fill this
                    # cache.
                    matched.count()
                    val_fut = self._validate_async(
                        name, updated.select(*logical_cols)
                    )
                    if post_scan is not None:
                        post_scan()
                    if self.cdf:
                        cdc_fut = self._stage_cdc_async(
                            name,
                            matched.select(*logical_cols)
                            .withColumn(
                                "_change_type", F.lit("update_preimage")
                            )
                            .unionByName(
                                updated.select(*logical_cols).withColumn(
                                    "_change_type",
                                    F.lit("update_postimage"),
                                )
                            ),
                        )
                    n_link = 0
                    for rel, files in self._partition_dirs(data):
                        out_dir = (
                            vdir if rel == "." else os.path.join(vdir, rel)
                        )
                        os.makedirs(out_dir, exist_ok=True)
                        for f in files:
                            os.link(
                                f, os.path.join(out_dir, os.path.basename(f))
                            )
                            n_link += 1
                    dv_fut = _submit_inheritable(
                        lambda: merged_dv.coalesce(1)
                        .write.parquet(self._dv_dir(vdir))
                    )
                    if part_cols_now:
                        # size-adaptive keyed repartition: keep the
                        # partitioned write parallel under AQE
                        # coalescing without 32-task overhead on an
                        # O(matched)-row rewrite (same rationale as
                        # _write_version, round-12).
                        updated = updated.repartition(
                            self._n_write_tasks(updated),
                            *part_cols_now,
                        )
                    writer = updated.write.mode("append")
                    if part_cols_now:
                        writer = writer.partitionBy(*part_cols_now)
                    writer.parquet(vdir)
                    dv_fut.result()
                    if val_fut is not None:
                        val_fut.result()
                    self._adopt_cdc(name, cdc_fut)
                    self._commit(
                        name, version, expected_version=expected,
                        operation="UPDATE",
                    )
                finally:
                    matched.unpersist(False)
            except ConcurrentWriteError as exc:
                last_err = exc
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except ConstraintViolationError:
                # the violation must surface as such, never be
                # reclassified as a concurrency conflict below
                # (same rule as merge/_rewrite_where, ADVICE r12)
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                raise
            except Exception:
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under MoR update"
                )
                continue
            return {
                "files_linked": n_link,
                "files_rewritten": 0,
                "dv_rows": self._dv_file_rows(
                    os.path.join(self.path(name), version)
                ),
            }
        assert last_err is not None
        raise last_err

    def merge_mor(
        self,
        name: str,
        batch: DataFrame,
        key: str | Sequence[str],
        max_retries: int = 3,
        post_scan=None,
    ) -> dict:
        """Merge-on-read MERGE via deletion vectors (Delta's low-shuffle
        MERGE shape, completing the DV DML trio with
        :meth:`delete_where_mor` / :meth:`update_where_mor`): live rows
        whose key appears in ``batch`` are tombstoned into the deletion
        vector and ALL batch rows (matched replacements + inserts) are
        written as NEW files into the same version — every pre-existing
        file is hardlinked, so write amplification is O(batch rows),
        never O(touched files). Semantically identical to
        :meth:`merge` / ``merge_upsert`` (``prev ANTI batch-keys UNION
        batch``), but a 100-row upsert against a 100 TB table writes
        100 rows + DV bytes instead of rewriting every touched file.

        Unlike ``update_where_mor``, a matched row MAY move partitions:
        the old position is tombstoned in its hive dir and the
        replacement lands in the batch row's dir — a partition move
        without any rewrite. Batch columns must equal the table's
        (MoR appends raw files next to hardlinked old ones, so the
        on-disk schemas must agree — use :meth:`merge` for
        ``sync_all_columns`` schema evolution); values are cast to the
        table's column types. OCC transaction with the same
        ``post_scan`` fault-injection window as the other DML paths.
        Under ``delta_log=True`` the commit carries protocol-v3
        ``deletionVector`` descriptors like the other MoR ops."""
        self._assert_appendable(name, "MERGE (merge-on-read)")
        keys = [key] if isinstance(key, str) else list(key)
        last_err: ConcurrentWriteError | None = None
        batch = self._apply_generated(name, batch)
        for _ in range(max_retries):
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            cdc_fut = None
            val_fut = None
            dv_fut = None
            try:
                data = self.current_data_dir(name)
                if data is None:
                    raise ValueError(f"unknown table {name!r}")
                rt = self._row_tracking(name)
                live = self._apply_dv(data, merge_schema=rt)
                if rt:
                    from product_analytics_spark.sources import (
                        delta_log as dl,
                    )

                    rt_cols = (
                        dl.MATERIALIZED_ROW_ID_COL,
                        dl.MATERIALIZED_ROW_COMMIT_COL,
                    )
                    logical_cols = [
                        c for c in live.columns if c not in rt_cols
                    ]
                else:
                    rt_cols = ()
                    logical_cols = list(live.columns)
                batch_eff = (
                    self._identity_merge_batch(name, live, batch, keys)
                    if self.identity_columns(name)
                    else batch
                )
                missing = set(logical_cols) - set(batch_eff.columns)
                extra = set(batch_eff.columns) - set(logical_cols)
                if missing or extra:
                    raise ValueError(
                        f"merge_mor requires identical column sets "
                        f"(missing={sorted(missing)}, extra="
                        f"{sorted(extra)}); use merge() for schema "
                        f"evolution"
                    )
                aligned = batch_eff.select(
                    *[
                        F.col(c).cast(live.schema[c].dataType).alias(c)
                        for c in logical_cols
                    ]
                )
                part_cols_now = [
                    c
                    for rel, _fs in self._partition_dirs(data)
                    for c, _v in self._partition_literals(rel)
                ]
                part_cols_now = list(dict.fromkeys(part_cols_now))
                # ONE live scan: the semi-join against the batch keys
                # finds every matched row WITH its position, the
                # logical columns (CDF preimages) and — on row-tracked
                # tables — the materialized id columns. The deletion
                # vector, the CDF classification (matched keys stand
                # in for "batch keys present in live") and the
                # inherited row ids all derive from this persisted
                # O(matched) intermediate; the per-consumer form
                # re-scanned live + DV anti-join up to 4x per MERGE
                # (round-12 optimization, guide §1.2). The batch side
                # is persisted too — it feeds the key broadcast, the
                # CDF post/insert images and the data write.
                aligned = aligned.persist(StorageLevel.MEMORY_AND_DISK)
                matched = live.select(
                    "*",
                    self._rel_path_col(data).alias("__pos_f"),
                    F.col("_metadata.row_index").alias("__pos_ri"),
                ).join(
                    F.broadcast(aligned.select(*keys).distinct()),
                    on=keys,
                    how="left_semi",
                ).persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    new_pos = matched.select(
                        F.col("__pos_f").alias("path"),
                        F.col("__pos_ri").alias("row_index"),
                    )
                    old_dv_dir = self._dv_dir(data)
                    if os.path.isdir(old_dv_dir):
                        merged_dv = (
                            self._read_version_dir(old_dv_dir)
                            .unionByName(new_pos)
                            .distinct()
                        )
                    else:
                        merged_dv = new_pos.distinct()
                    # Materialize-then-fork (round-13, VERDICT r12
                    # item 2, guide §2.6): one count fills BOTH caches
                    # (computing `matched` builds the broadcast over
                    # `aligned`, so the batch cache fills as a side
                    # effect); the validation probe, cdc stage and DV
                    # write then overlap the hardlink pass and the
                    # data write as pure cache readers. CHECK
                    # constraints gate the NEW rows only — the
                    # hardlinked side was validated when it committed.
                    matched.count()
                    val_fut = self._validate_async(name, aligned)
                    if post_scan is not None:
                        post_scan()
                    # batch keys that matched a live row — O(matched),
                    # broadcastable; "batch ∩ live" == "batch ∩ matched"
                    # by construction, so CDF classification needs no
                    # further live scan.
                    mkeys = matched.select(*keys).distinct()
                    if self.cdf:
                        ct = "_change_type"
                        cdc_fut = self._stage_cdc_async(
                            name,
                            matched.select(*logical_cols)
                            .withColumn(ct, F.lit("update_preimage"))
                            .unionByName(
                                aligned.join(
                                    F.broadcast(mkeys), keys, "left_semi"
                                ).withColumn(ct, F.lit("update_postimage"))
                            )
                            .unionByName(
                                aligned.join(
                                    F.broadcast(mkeys), keys, "left_anti"
                                ).withColumn(ct, F.lit("insert"))
                            ),
                        )
                    # Row tracking: matched batch rows INHERIT the live
                    # row's id via the materialized columns (O(matched)
                    # map, broadcast onto the batch); inserts carry
                    # NULL and read back as fresh baseRowId+index ids.
                    if rt:
                        from product_analytics_spark.sources import (
                            delta_log as dl,
                        )

                        rt_id, rt_cv_c = (
                            dl.MATERIALIZED_ROW_ID_COL,
                            dl.MATERIALIZED_ROW_COMMIT_COL,
                        )
                        base_df = self._rt_base_df(name, data)
                        mat_id = (
                            F.col(rt_id)
                            if rt_id in live.columns
                            else F.lit(None).cast("long")
                        )
                        mat_cv = (
                            F.col(rt_cv_c)
                            if rt_cv_c in live.columns
                            else F.lit(None).cast("long")
                        )
                        # One id per key: the live side may hold
                        # duplicate keys (e.g. appended dups) — a left
                        # join against per-row ids would emit the batch
                        # row once per duplicate, breaking the
                        # merge_upsert contract. The replacement row
                        # inherits the smallest (oldest) matched row
                        # id, deterministically.
                        matched_ids = (
                            matched.join(
                                F.broadcast(base_df),
                                F.col("__pos_f") == F.col("__rt_p"),
                                "left",
                            )
                            .select(
                                *keys,
                                F.coalesce(
                                    mat_id,
                                    F.col("__rt_base")
                                    + F.col("__pos_ri"),
                                )
                                .cast("long")
                                .alias(rt_id),
                                F.coalesce(mat_cv, F.col("__rt_cv"))
                                .cast("long")
                                .alias(rt_cv_c),
                            )
                            .groupBy(*keys)
                            .agg(
                                *[
                                    F.min(F.col(c)).alias(c)
                                    for c in rt_cols
                                ]
                            )
                        )
                        to_write = aligned.join(
                            F.broadcast(matched_ids), keys, "left"
                        ).select(*logical_cols, *rt_cols)
                    else:
                        to_write = aligned
                    n_link = 0
                    for rel, files in self._partition_dirs(data):
                        out_dir = (
                            vdir if rel == "." else os.path.join(vdir, rel)
                        )
                        os.makedirs(out_dir, exist_ok=True)
                        for f in files:
                            os.link(
                                f, os.path.join(out_dir, os.path.basename(f))
                            )
                            n_link += 1
                    if part_cols_now:
                        # size-adaptive keyed repartition (same
                        # rationale as _write_version, round-12).
                        to_write = to_write.repartition(
                            self._n_write_tasks(to_write),
                            *part_cols_now,
                        )
                    dv_fut = _submit_inheritable(
                        lambda: merged_dv.coalesce(1)
                        .write.parquet(self._dv_dir(vdir))
                    )
                    writer = to_write.write.mode("append")
                    if part_cols_now:
                        writer = writer.partitionBy(*part_cols_now)
                    writer.parquet(vdir)
                    dv_fut.result()
                    if val_fut is not None:
                        val_fut.result()
                    self._adopt_cdc(name, cdc_fut)
                    self._commit(
                        name, version, expected_version=expected,
                        operation="MERGE",
                    )
                finally:
                    matched.unpersist(False)
                    aligned.unpersist(False)
            except ConcurrentWriteError as exc:
                last_err = exc
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except ConstraintViolationError:
                # surface the violation itself (same rule as merge/
                # _rewrite_where, ADVICE r12)
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                raise
            except Exception:
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                self._abort_validation(dv_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under MoR merge"
                )
                continue
            return {
                "files_linked": n_link,
                "files_rewritten": 0,
                "dv_rows": self._dv_file_rows(
                    os.path.join(self.path(name), version)
                ),
            }
        assert last_err is not None
        raise last_err

    def purge_dv(self, name: str, max_retries: int = 3) -> bool:
        """Materialize outstanding deletion vectors: rewrite the table
        through the DV-aware reader (restoring the recorded layout)
        so the new version has plain files and no ``_dv`` — what Delta
        does when OPTIMIZE or a rewrite touches DV'd files. Returns
        True if a purge happened. OCC with retry."""
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            if not self._has_dv(name):
                return False
            expected = self.current_version(name)
            layout = self.layout(name)
            if self._row_tracking(name):
                # Row tracking: the rewrite must MATERIALIZE every
                # row's id into the new files (coalesce of
                # materialized-or-virtual), or the fresh baseRowId
                # ranges of the rewritten files would re-mint ids —
                # Delta preserves ids through OPTIMIZE the same way.
                data = self.current_data_dir(name)
                df = self._rt_attach_ids(
                    name, data, self._apply_dv(data, merge_schema=True)
                )
            else:
                df = self.read(name)
            assert df is not None
            try:
                self.overwrite(
                    name,
                    df,
                    partition_by=tuple(layout.get("partition_by") or ()),
                    cluster_by=tuple(layout.get("cluster_by") or ()),
                    zorder_by=tuple(layout.get("zorder_by") or ()),
                    zorder_depth=bool(layout.get("zorder_depth")),
                    expected_version=expected,
                    # Materializing ALREADY-COMMITTED logical deletes
                    # moves no rows: like OPTIMIZE, the log commit
                    # must carry dataChange=false on both sides or
                    # the change feed would re-report every row.
                    operation="OPTIMIZE",
                )
                return True
            except ConcurrentWriteError as exc:
                last_err = exc
                continue
        assert last_err is not None
        raise last_err

    def restore(
        self, name: str, version: int | str, max_retries: int = 3
    ) -> dict:
        """Delta ``RESTORE TABLE t TO VERSION AS OF v``: make the
        table's content equal an EARLIER committed version's, via a
        NEW commit — history above the restore point is preserved
        (the restore is itself just another version; time travel to
        the pre-restore state still works within retention), which is
        what distinguishes RESTORE from rolling back the pointer.

        ``version`` is a committed version dir name (``v_...``) or an
        index into :meth:`versions` (negative = from the end, like
        ``read``). Every file of the target version — data files,
        hive subdirs, and an outstanding ``_dv`` deletion vector — is
        HARDLINKED into the new version dir: zero data movement, cost
        O(|files|) metadata ops, exactly how Delta's RESTORE re-adds
        the old snapshot's files by reference. The delta log (if
        enabled) reconciles automatically: the restored files are
        re-added (stats reused by inode — no footer re-reads) and the
        abandoned version's files removed, with ``dataChange: true``
        (rows DID change — streams and the change feed correctly see
        the restore as delete-all + insert-all of the delta, Delta's
        own RESTORE semantics).

        OCC transaction: presents the version current at its start;
        a concurrent commit in the window conflicts and the restore
        re-reads and retries (the target is named, so retry is safe).

        Scale: restoring a 100 TB table touches ZERO data bytes —
        |files| hardlinks/manifest entries. The expensive mistake
        this removes at scale is "full-refresh back to yesterday":
        RESTORE is a metadata operation, the refresh is a rewrite."""
        self._assert_appendable(name, "RESTORE")
        table = self.path(name)
        if isinstance(version, int):
            vs = self.versions(name)
            if not vs:
                raise ValueError(f"unknown table {name!r}")
            version = vs[version]
        src = os.path.join(table, version)
        if not os.path.isdir(src):
            raise ValueError(
                f"table {name!r}: version {version!r} is not on disk "
                "(GC'd past the retention window?)"
            )
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            expected = self.current_version(name)
            new_version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(table, new_version)
            n_link = 0
            try:
                for root, _dirs, files in os.walk(src):
                    rel = os.path.relpath(root, src)
                    out = vdir if rel == "." else os.path.join(vdir, rel)
                    os.makedirs(out, exist_ok=True)
                    for f in files:
                        os.link(
                            os.path.join(root, f), os.path.join(out, f)
                        )
                        n_link += 1
                self._commit(
                    name, new_version,
                    expected_version=expected,
                    operation="RESTORE",
                )
            except ConcurrentWriteError as exc:
                last_err = exc
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except Exception:
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under restore"
                )
                continue
            return {"restored_to": version, "files_linked": n_link}
        assert last_err is not None
        raise last_err

    # -------------------------------------------------- commit protocol

    def _write_version(
        self,
        name: str,
        df: DataFrame,
        partition_by: Sequence[str] = (),
        cluster_by: Sequence[str] = (),
        zorder_by: Sequence[str] = (),
        n_files: int | None = None,
        zorder_depth: bool = False,
    ) -> str:
        """Write a new UNCOMMITTED version directory; return its name.

        ``cluster_by`` is the single-key clustering pass (S7):
        range-partition + sort-within-partitions on the cluster keys,
        so parquet min/max stats give data skipping on the FIRST key
        (later keys span nearly their full range in every file).

        ``zorder_by`` is true multi-column Z-ORDER (reference
        ``OPTIMIZE ... ZORDER BY (order_id, customer_id, order_date)``,
        orders_cleaned.sql:15): rows are range-partitioned and sorted
        on the interleaved Morton z-value of ALL the named columns
        (functions/zorder.py), so every file is a locality
        hyper-rectangle and min/max skipping works on each column —
        the q416 cert measures 2nd-key pruning beating the composite
        sort. Mutually exclusive with cluster_by.

        Partitioned writes first hash-repartition on the partition
        columns so each hive partition directory is written by one
        task (one well-sized file per directory instead of
        tasks x partitions small files), then sort within by the
        cluster keys (or z-value) for row-group stat skipping inside
        each partition. ``n_files`` pins the file count for layout
        tests; production leaves it None (AQE-sized).
        """
        if cluster_by and zorder_by:
            raise ValueError("cluster_by and zorder_by are exclusive")
        zcol = "__zval"
        if zorder_by:
            from product_analytics_spark.functions.zorder import morton_zvalue

            df = df.withColumn(
                zcol,
                morton_zvalue(df, list(zorder_by), equal_depth=zorder_depth),
            )
            cluster_by = (zcol,)
        if partition_by:
            # n_files pins the TASK count here (ADVICE r8: it used to be
            # silently ignored on partitioned writes); each hive dir
            # still gets whole files since tasks are keyed on the
            # partition columns. Without n_files the count is
            # size-adaptive (round-12, guide §2.5/§6):
            # ceil(est bytes / 128 MB) clamped to the shuffle-partition
            # conf, floored at the table's current hive-dir count — an
            # explicit count because a keyed repartition with NO count
            # has a coalescable shuffle origin and AQE collapses a
            # small write to ONE task writing every hive directory
            # serially (measured 1.1 s/write on an ~80-partition
            # table); the dir floor keeps the write spread while each
            # directory still receives whole files (a partition value
            # hashes to exactly one task).
            parts = [
                n_files
                if n_files
                else self._n_write_tasks(
                    df, floor=self._existing_dir_floor(name)
                )
            ]
            df = df.repartition(*parts, *partition_by).sortWithinPartitions(
                *partition_by, *cluster_by
            )
        elif cluster_by:
            parts = [n_files] if n_files else []
            df = df.repartitionByRange(*parts, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        elif n_files:
            df = df.repartition(n_files)
        if zorder_by:
            df = df.drop(zcol)
        version = f"v_{uuid.uuid4().hex[:12]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.path(name), version))
        return version

    def _commit_lock(self, name: str):
        """Short mutex around the compare-and-commit critical section
        (held for microseconds — the version data is already on disk
        before _commit runs): an exclusive ``fcntl.flock`` on a
        PERSISTENT lock file. The kernel releases the lock when the
        holder's fd closes — including on crash — so there is no
        staleness heuristic at all, and therefore none of the
        lease-breaking races an age-judged O_EXCL file has (ADVICE r8:
        the rename-back window let a second waiter slip in). The lock
        file itself is never unlinked: unlink+recreate would let two
        waiters lock DIFFERENT inodes under the same path. On object
        stores the table format's log-entry putIfAbsent plays this
        role natively."""
        return self._flock(
            os.path.join(self.path(name), "_COMMIT_LOCK"), deadline_s=10.0
        )

    @staticmethod
    def _flock(lock: str, deadline_s: float):
        """Exclusive ``fcntl.flock`` on a persistent lock file (see
        ``_commit_lock`` doc for why flock and why the file is never
        unlinked). Distinct lock FILES are independent; the same file
        from two fds — even in one process — conflicts, so holders
        must never nest the SAME lock."""
        import contextlib
        import fcntl
        import time

        @contextlib.contextmanager
        def _held():
            fd = os.open(lock, os.O_CREAT | os.O_WRONLY, 0o644)
            try:
                deadline = time.time() + deadline_s
                while True:
                    try:
                        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                        break
                    except OSError:
                        if time.time() > deadline:
                            raise TimeoutError(f"lock busy: {lock}")
                        time.sleep(0.01)
                try:
                    yield
                finally:
                    fcntl.flock(fd, fcntl.LOCK_UN)
            finally:
                os.close(fd)

        return _held()

    def _commit(
        self,
        name: str,
        version: str,
        expected_version=UNCHECKED,
        operation: str = "WRITE",
    ) -> None:
        """Atomically point ``_CURRENT`` at ``version`` (the commit
        point), append it to the commit log, then garbage-collect
        versions that fell off the retention window.

        Optimistic concurrency: with ``expected_version`` set (the
        version the transaction READ — ``current_version()`` at its
        start, None for first-write), the pointer must still name it
        inside the locked section, or ConcurrentWriteError is raised
        and NOTHING commits — the Delta/Iceberg conflict check. The
        default stays last-writer-wins (dbt full-refresh semantics)."""
        table = self.path(name)
        tmp = os.path.join(table, f"_ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        with self._commit_lock(name):
            if expected_version is not UNCHECKED:
                cur = self.current_version(name)
                if cur != expected_version:
                    os.unlink(tmp)
                    raise ConcurrentWriteError(
                        f"table {name!r}: committed version moved "
                        f"{expected_version!r} -> {cur!r} since this "
                        "transaction's snapshot read; re-read and retry"
                    )
            os.replace(tmp, self._pointer_path(name))  # POSIX-atomic
            log = self._log_path(name)
            committed: list[str] = []
            if os.path.isfile(log):
                with open(log, encoding="utf-8") as fh:
                    committed = [ln.strip() for ln in fh if ln.strip()]
            committed.append(version)
            live = [
                v
                for v in committed
                if os.path.isdir(os.path.join(table, v))
            ]
            retained_list = live[-self.retain_versions :]
            if version not in retained_list:
                retained_list.append(version)
            # Truncate the commit log to the retention window (Delta's
            # log checkpoint/cleanup analog): without this it grows one
            # line per commit forever. Inside the lock so a concurrent
            # committer's fresh append can never be stomped; atomic
            # replace so readers only ever see a complete log.
            log_tmp = os.path.join(table, f"_log_{uuid.uuid4().hex[:8]}")
            with open(log_tmp, "w", encoding="utf-8") as fh:
                fh.write("".join(v + "\n" for v in retained_list))
            os.replace(log_tmp, log)
            if self.delta_log:
                # Inside the lock so delta-log version order matches
                # pointer-commit order exactly (the log's own
                # putIfAbsent is a second, independent guard).
                self._delta_commit(name, operation=operation)
        # GC deletes ONLY previously COMMITTED versions that fell off
        # the retention window. A bare "every v_ dir not retained"
        # sweep (the old rule) could destroy a CONCURRENT writer's
        # uncommitted version dir — under last-writer-wins that writer
        # then commits a pointer to a deleted directory (data loss).
        # Uncommitted dirs belong to in-flight writers; crashed
        # writers' orphans are vacuumed by age instead.
        retained = set(retained_list)
        for v in committed:
            if v not in retained:
                shutil.rmtree(os.path.join(table, v), ignore_errors=True)
        self._vacuum_orphans(name, retained)

    #: age after which an uncommitted version dir is presumed to belong
    #: to a CRASHED writer and may be vacuumed (in-flight writers finish
    #: in seconds-to-minutes; Delta's VACUUM uses hours for the same
    #: reason — err far on the side of not touching live work).
    ORPHAN_TTL_S = 3600.0

    def _vacuum_orphans(self, name: str, retained: set[str]) -> None:
        """Delete version dirs that are neither retained nor recently
        modified — the leftovers of writers that crashed between
        _write_version and _commit. Age-gated so a concurrent IN-FLIGHT
        writer's uncommitted dir is never swept."""
        import time

        table = self.path(name)
        now = time.time()
        for entry in os.listdir(table):
            if not entry.startswith("v_") or entry in retained:
                continue
            p = os.path.join(table, entry)
            try:
                if now - os.path.getmtime(p) > self.ORPHAN_TTL_S:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass

    # ------------------------------------------- Delta transaction log

    def _cdc_pending(self, name: str) -> list[str]:
        """This THREAD's staged-but-uncommitted change-file rel paths
        for ``name`` (see ``__init__`` — thread-local so concurrent
        DML writers never pop each other's stage)."""
        d = getattr(self._cdc_local, "pending", None)
        if d is None:
            d = {}
            self._cdc_local.pending = d
        return d.setdefault(name, [])

    def _stage_cdc(self, name: str, cdc_df: DataFrame) -> None:
        """Materialize a DML's row-level changes for its upcoming
        commit: write ``cdc_df`` (table columns + ``_change_type``)
        under ``<table>/_change_data/`` — Delta's CDF layout — and
        remember the file paths so ``_delta_commit`` can reference
        them with ``cdc`` actions in the SAME log commit. Zero-row
        part files are dropped (a no-match DML emits no cdc action).
        If the transaction later loses its OCC race, ``_discard_cdc``
        unlinks the staged files; a crash in between leaves orphans
        no commit references, which ``DeltaLog.vacuum`` collects."""
        if not self.cdf:
            return
        self._cdc_pending(name).extend(self._stage_cdc_files(name, cdc_df))

    def _stage_cdc_async(self, name: str, cdc_df: DataFrame):
        """Run the change-file write as an OVERLAPPED Spark job
        (guide §2.6 — the cdc write and the DML's version write are
        independent consumers of the same pinned inputs, so their
        jobs back-fill each other's task tails instead of running
        back to back). Returns a Future of the staged rel paths, or
        None when CDF is off. The caller MUST settle the future
        before its commit: ``_adopt_cdc`` on the success path (the
        commit adopts the files), ``_abort_cdc`` in every failure
        handler (waits, then unlinks). Pending-list bookkeeping stays
        in the CALLER's thread — ``_cdc_pending`` is thread-local."""
        if not self.cdf:
            return None
        return _submit_inheritable(self._stage_cdc_files, name, cdc_df)

    def _adopt_cdc(self, name: str, fut) -> None:
        """Settle an async cdc stage into THIS thread's pending list
        (call before the commit that references the files)."""
        if fut is not None:
            self._cdc_pending(name).extend(fut.result())

    def _abort_cdc(self, name: str, fut) -> None:
        """Failure-path settle: wait for an in-flight cdc stage (never
        leave its write racing the caller's cleanup), adopt whatever
        it staged, then discard it all."""
        if fut is not None:
            try:
                self._adopt_cdc(name, fut)
            except Exception:  # noqa: BLE001 — the stage itself failed
                pass
        self._discard_cdc(name)

    @staticmethod
    def _abort_validation(fut) -> None:
        """Failure-path settle for an overlapped validation probe
        (ADVICE r12 — the _abort_cdc analog): wait for the in-flight
        job and swallow its outcome, so it never runs concurrently
        with the caller's cleanup/retry and its own exception never
        shadows the failure being handled."""
        if fut is not None:
            try:
                fut.result()
            except Exception:  # noqa: BLE001 — the primary error wins
                pass

    def _validate_async(self, name: str, df: DataFrame):
        """Run the fused CHECK/invariant probe as an OVERLAPPED job
        (guide §2.6): the probe and the version write scan the same
        pinned input, so running them back to back serialized two
        full-parallel jobs. Returns a Future (or None when the table
        declares no rules); the caller MUST join it before its commit
        — a violation then still refuses the write before anything
        becomes visible, with the just-written uncommitted version
        dir dropped like a lost commit."""
        if not (self.constraints(name) or self.invariants(name)):
            return None
        return _submit_inheritable(self._validate_constraints, name, df)

    def _stage_cdc_files(self, name: str, cdc_df: DataFrame) -> list[str]:
        """Write ``cdc_df`` under ``_change_data/`` and return the
        staged rel paths — no pending bookkeeping (thread-safe body
        shared by ``_stage_cdc`` and ``_stage_cdc_async``)."""
        import pyarrow.parquet as pq

        from product_analytics_spark.sources import delta_log as dl

        table = self.path(name)
        tmp = os.path.join(table, f"_cdc_tmp_{uuid.uuid4().hex[:8]}")
        # Right-size the change files (round-12, guide §6): the change
        # set inherits its producer's partitioning (32 near-empty
        # shuffle partitions for a small DML), so the write emitted
        # up to 32 tiny files, each paying a task + a pyarrow
        # metadata probe + a rename below. coalesce (narrow, no extra
        # shuffle) to ceil(est bytes / 128 MB) — one file for a
        # cert-sized change set, many for a real churn batch.
        cdc_df.coalesce(self._n_write_tasks(cdc_df)).write.parquet(tmp)
        dest = os.path.join(table, dl.CDC_DIR)
        os.makedirs(dest, exist_ok=True)
        tag = uuid.uuid4().hex[:12]
        staged: list[str] = []
        try:
            i = 0
            for f in sorted(os.listdir(tmp)):
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                src = os.path.join(tmp, f)
                if pq.ParquetFile(src).metadata.num_rows == 0:
                    continue
                rel = f"{dl.CDC_DIR}/cdc-{tag}-{i:05d}.parquet"
                os.rename(src, os.path.join(table, rel))
                staged.append(rel)
                i += 1
        except Exception:
            # Mid-loop failure: unlink what was already renamed in so
            # nothing orphan-able outlives the raise.
            for rel in staged:
                try:
                    os.unlink(os.path.join(table, rel))
                except OSError:
                    pass
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(tmp, ignore_errors=True)
        return staged

    def _discard_cdc(self, name: str) -> None:
        """Drop this thread's staged change files (the DML attempt
        lost its OCC race or failed) — both the on-disk files and the
        pending list, so the retry stages fresh ones."""
        pending = self._cdc_pending(name)
        for rel in pending:
            try:
                os.unlink(os.path.join(self.path(name), rel))
            except OSError:
                pass
        pending.clear()

    def _delta_commit(self, name: str, operation: str = "WRITE") -> None:
        """Emit one protocol-conformant ``_delta_log`` commit
        reconciling the log's live file set against the CURRENT data
        dir (called inside the commit lock, right after the pointer
        flip, so log order == commit order):

        * adds    = files on disk the log doesn't know (stats from one
                    footer read each — or REUSED from the prior add
                    when the file is a COW hardlink of a live file:
                    same inode ⇒ same content ⇒ same stats, zero
                    re-reads for the untouched side of a DML);
        * removes = live log paths no longer in the data dir (the old
                    version's files — still on disk for time travel
                    until GC, exactly Delta's remove-then-VACUUM).

        metaData (Spark schemaString + partitionColumns) is emitted on
        the first commit and re-emitted when the data files' arrow
        schema fingerprint changes (schema evolution)."""
        import hashlib
        import json

        from product_analytics_spark.sources import delta_log as dl

        table = self.path(name)
        data = self.current_data_dir(name)
        if data is None:
            return
        log = dl.DeltaLog(table, owner=self.commit_owner)
        latest = log.latest_version()
        prev = log.snapshot(latest) if latest is not None else None

        parts = self._partition_dirs(data)
        part_cols = []
        for rel, _fs in parts:
            for c, _v in self._partition_literals(rel):
                if c not in part_cols:
                    part_cols.append(c)
        disk: dict[str, str] = {}  # rel path from TABLE root -> abs
        for _rel, files in parts:
            for f in files:
                disk[os.path.relpath(f, table).replace(os.sep, "/")] = f

        old_by_ino: dict[int, dict] = {}
        if prev is not None:
            for rel, add in prev.files.items():
                try:
                    old_by_ino[os.stat(os.path.join(table, rel)).st_ino] = add
                except OSError:
                    pass

        # Outstanding deletion vector of the CURRENT version (written
        # by the MoR DML paths): version-relative (path, row_index)
        # positions, keyed up to table-relative add paths below.
        dv_by_rel: dict[str, list[int]] = {}
        dv_dir = self._dv_dir(data)
        if os.path.isdir(dv_dir):
            import pyarrow.parquet as pq

            vbase = os.path.basename(os.path.normpath(data))
            t = pq.read_table(dv_dir)
            for p, ri in zip(
                t.column("path").to_pylist(),
                t.column("row_index").to_pylist(),
            ):
                dv_by_rel.setdefault(f"{vbase}/{p}", []).append(ri)

        actions: list[dict] = []
        new_adds: list[dict] = []
        first_abs = next(iter(disk.values()), None)
        for rel in sorted(disk):
            if prev is not None and rel in prev.files:
                continue  # already live (append case)
            abs_p = disk[rel]
            try:
                old = old_by_ino.get(os.stat(abs_p).st_ino)
            except OSError:
                old = None
            if old is not None and "stats" in old:
                add = dict(old)
                add["path"] = rel
                add["partitionValues"] = dl._partition_values(rel)
                add.pop("deletionVector", None)  # re-derived below
            else:
                add = dl.make_add(table, abs_p)
            new_adds.append(add)

        if dv_by_rel:
            from product_analytics_spark.sources import (
                deletion_vectors as dvs,
            )

            descriptors = dvs.write_dv_file(table, dv_by_rel)
            for add in new_adds:
                dvd = descriptors.get(add["path"])
                if dvd is None:
                    # reused stats may carry a stale tightBounds from
                    # a previously DV'd incarnation — normalize
                    if "tightBounds" in (add.get("stats") or ""):
                        st = json.loads(add["stats"])
                        st.pop("tightBounds", None)
                        add["stats"] = json.dumps(
                            st, separators=(",", ":"), sort_keys=True
                        )
                    continue
                add["deletionVector"] = dvd
                # stats still describe the PHYSICAL file, so bounds
                # are wide over the live rows: declare tightBounds
                # false (Delta's exact contract for DV'd files;
                # min/max pruning stays sound — conservative).
                if "stats" in add:
                    st = json.loads(add["stats"])
                    st["tightBounds"] = False
                    add["stats"] = json.dumps(
                        st, separators=(",", ":"), sort_keys=True
                    )

        # Row tracking: allocate fresh baseRowId ranges for files the
        # snapshot hasn't seen. Hardlinked COW/MoR copies INHERIT
        # their range via the inode-reuse add copy above (same inode
        # ⇒ same rows ⇒ same ids); only genuinely new files draw from
        # the high-water mark, which advances in the same commit's
        # domainMetadata action (Delta PROTOCOL.md "Row Tracking").
        rt_enabled = prev is not None and prev.row_tracking_enabled()
        rt_domain_action = None
        if rt_enabled:
            rt_hwm = prev.row_id_high_water_mark()
            rt_hwm0 = rt_hwm
            this_version = (latest + 1) if latest is not None else 0
            for add in new_adds:
                if add.get("baseRowId") is not None:
                    continue
                s = add.get("stats")
                if not s:
                    raise dl.DeltaProtocolError(
                        "row tracking requires per-file numRecords "
                        f"stats; add {add.get('path')!r} has none"
                    )
                n = int(json.loads(s)["numRecords"])
                add["baseRowId"] = rt_hwm + 1
                add["defaultRowCommitVersion"] = this_version
                rt_hwm += n
            if rt_hwm != rt_hwm0:
                rt_domain_action = {
                    "domainMetadata": {
                        "domain": dl.ROW_TRACKING_DOMAIN,
                        "configuration": json.dumps(
                            {"rowIdHighWaterMark": rt_hwm},
                            separators=(",", ":"),
                        ),
                        "removed": False,
                    }
                }

        # Schema fingerprint from ONE data file's arrow schema (cheap,
        # no Spark job); full Spark schemaString only when it changes.
        rt_marker = self._row_tracking(name)
        rt_phys_cols = ()
        if rt_marker:
            rt_phys_cols = (
                dl.MATERIALIZED_ROW_ID_COL,
                dl.MATERIALIZED_ROW_COMMIT_COL,
            )
        schema_hash = None
        if first_abs is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            # remove_metadata(): Spark embeds its schema JSON in the
            # parquet key-value metadata and that varies by write path
            # — only names/types should fingerprint the schema. The
            # materialized row-id columns are PHYSICAL, not logical —
            # excluded, or the fingerprint would flap per-file.
            sch_obj = pq.read_schema(first_abs).remove_metadata()
            if rt_phys_cols:
                sch_obj = pa.schema(
                    [f for f in sch_obj if f.name not in rt_phys_cols]
                )
            schema_hash = hashlib.sha1(str(sch_obj).encode()).hexdigest()
        prev_conf = (prev.metadata.get("configuration") or {}) if prev else {}
        dv_enabled = bool(dv_by_rel) or (
            prev_conf.get("delta.enableDeletionVectors") == "true"
        )
        cdf_enabled = self.cdf or (
            prev_conf.get("delta.enableChangeDataFeed") == "true"
        )
        cons = self.constraints(name)
        prev_cons = {
            k[len("delta.constraints."):]: v
            for k, v in prev_conf.items()
            if k.startswith("delta.constraints.")
        }
        gens = self.generated_columns(name)
        idents = self.identity_columns(name)
        props = self.table_properties(name)
        invs = self.invariants(name)
        # The spec's persisted-rule form for delta.invariants field
        # metadata (Delta PROTOCOL.md "Column Invariants").
        invs_json = {
            c: json.dumps(
                {"expression": {"expression": e}}, separators=(",", ":")
            )
            for c, e in invs.items()
        }
        prev_gens: dict[str, str] = {}
        prev_idents: dict[str, dict] = {}
        prev_invs: dict[str, str] = {}
        if prev is not None and (prev.metadata or {}).get("schemaString"):
            for fpath, f in dl.walk_schema_fields(
                json.loads(prev.metadata["schemaString"])["fields"]
            ):
                fmd = f.get("metadata") or {}
                ge = fmd.get("delta.generationExpression")
                if ge:
                    prev_gens[fpath] = ge
                iv = fmd.get(dl.INVARIANTS_META_KEY)
                if iv:
                    prev_invs[fpath] = iv
                if "delta.identity.start" in fmd:
                    prev_idents[fpath] = {
                        "start": fmd.get("delta.identity.start"),
                        "step": fmd.get("delta.identity.step"),
                        "high_water_mark": fmd.get(
                            "delta.identity.highWaterMark"
                        ),
                    }
        need_meta = (
            prev is None
            or not prev.metadata
            or (
                schema_hash is not None
                and prev_conf.get("engine.arrowSchemaHash")
                not in (None, schema_hash)
            )
            or (
                dv_enabled
                and prev_conf.get("delta.enableDeletionVectors") != "true"
            )
            or (
                cdf_enabled
                and prev_conf.get("delta.enableChangeDataFeed") != "true"
            )
            or prev_cons != cons
            or prev_gens != gens
            or prev_invs != invs_json
            or any(prev_conf.get(k) != v for k, v in props.items())
            or prev_idents
            != {
                c: {
                    "start": s.get("start"),
                    "step": s.get("step"),
                    "high_water_mark": s.get("high_water_mark"),
                }
                for c, s in idents.items()
            }
        )
        # Legacy writer-version floors: 3 = checkConstraints,
        # 4 = generatedColumns (Delta PROTOCOL.md) — a protocol-aware
        # writer must enforce these features or refuse the table.
        need_writer = 2
        if cons:
            need_writer = 3
        if gens:
            need_writer = max(need_writer, 4)
        if idents:
            # identityColumns is the legacy writer-version-6 feature
            need_writer = max(need_writer, 6)
        if prev is None:
            proto = dict(
                dl.PROTOCOL_DV_ACTION if dv_by_rel else dl.PROTOCOL_ACTION
            )
            if proto["minWriterVersion"] < need_writer:
                proto["minWriterVersion"] = need_writer
            actions.append({"protocol": proto})
        elif dv_by_rel and (
            (prev.protocol or {}).get("minReaderVersion", 1) < 3
            or "deletionVectors"
            not in ((prev.protocol or {}).get("writerFeatures") or [])
        ):
            # first DV on an existing table: in-place protocol upgrade
            # to the deletionVectors table feature (reader 3 / writer
            # 7). MERGED into the existing protocol — a blind replace
            # would forget previously-declared features (rowTracking,
            # domainMetadata) and readers would stop enforcing them.
            actions.append(
                {
                    "protocol": dl.merge_protocol(
                        prev.protocol or dl.PROTOCOL_ACTION,
                        dl.PROTOCOL_DV_ACTION,
                    )
                }
            )
        elif need_writer > (prev.protocol or {}).get("minWriterVersion", 2):
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": (prev.protocol or {}).get(
                            "minReaderVersion", 1
                        ),
                        "minWriterVersion": need_writer,
                    }
                }
            )
        if need_meta:
            if prev_conf.get("delta.columnMapping.mode") in (
                "name", "id",
            ) or prev_conf.get("delta.enableTypeWidening") == "true":
                # Under column mapping the files carry PHYSICAL names,
                # and under type widening the files carry MIXED
                # physical widths; re-deriving the schema from them
                # would silently undo a logical rename or a widening
                # (and drop the delta.typeChanges history). Schema
                # changes on such tables need explicit DDL (Delta's
                # rule too) — keep the previous logical schemaString.
                schema_json = prev.metadata["schemaString"]
            else:
                # NOT routed through the _read_version_dir memo
                # (round-13, examined and left): this branch runs
                # exactly when the files' schema may have CHANGED
                # (fingerprint drift), and append writes into the
                # live data dir in place — a memoized schema here
                # could be the pre-append one. Fresh inference is the
                # correct ~80 ms.
                reader = self.spark.read
                if rt_marker:
                    reader = reader.option("mergeSchema", "true")
                schema_json = reader.parquet(data).schema.json()
            if rt_phys_cols:
                # the materialized row-id columns live in the FILES,
                # never in the logical schema (Delta hides them too)
                sch = json.loads(schema_json)
                sch["fields"] = [
                    f
                    for f in sch["fields"]
                    if f["name"] not in rt_phys_cols
                ]
                schema_json = json.dumps(sch, separators=(",", ":"))
            if gens or idents or invs_json:
                # generation expressions, identity specs, and column
                # invariants live in the FIELD metadata, not
                # configuration
                sch = json.loads(schema_json)
                # invariants may target NESTED fields (dotted paths):
                # the rule lives in the inner field's metadata, per
                # Delta's persistence of nested-column invariants
                for ipath, rule in invs_json.items():
                    if "." not in ipath:
                        continue
                    tgt = dl.schema_field_at(sch, ipath)
                    if tgt is not None:
                        tmd = dict(tgt.get("metadata") or {})
                        tmd[dl.INVARIANTS_META_KEY] = rule
                        tgt["metadata"] = tmd
                for f in sch["fields"]:
                    md = dict(f.get("metadata") or {})
                    if f["name"] in gens:
                        md["delta.generationExpression"] = gens[f["name"]]
                    if f["name"] in invs_json:
                        md[dl.INVARIANTS_META_KEY] = invs_json[f["name"]]
                    if f["name"] in idents:
                        spec = idents[f["name"]]
                        md["delta.identity.start"] = spec.get("start")
                        md["delta.identity.step"] = spec.get("step")
                        md["delta.identity.highWaterMark"] = spec.get(
                            "high_water_mark"
                        )
                        md["delta.identity.allowExplicitInsert"] = False
                    if md:
                        f["metadata"] = md
                schema_json = json.dumps(sch, separators=(",", ":"))
            table_id = (
                prev.metadata.get("id") if prev and prev.metadata else None
            )
            meta = dl.make_metadata(
                schema_json, part_cols, table_id=table_id
            )
            # start from the PREVIOUS configuration so table
            # properties written by out-of-band upgrades (row
            # tracking, column mapping) survive a metaData
            # re-emission; constraint keys are rebuilt from the
            # current declarations
            conf = {
                k: v
                for k, v in prev_conf.items()
                if not k.startswith("delta.constraints.")
            }
            if schema_hash:
                conf["engine.arrowSchemaHash"] = schema_hash
            if dv_enabled:
                conf["delta.enableDeletionVectors"] = "true"
            if cdf_enabled:
                conf["delta.enableChangeDataFeed"] = "true"
            for cn, ce in cons.items():
                conf[f"delta.constraints.{cn}"] = ce
            # declared table properties (delta.appendOnly, ...) win
            # over whatever a previous commit recorded
            for pk, pv in props.items():
                conf[pk] = pv
            meta["configuration"] = conf
            actions.append({"metaData": meta})
        # OPTIMIZE/compaction rearranges bytes without changing rows:
        # Delta marks BOTH sides dataChange=false so streams and the
        # change feed skip the commit entirely.
        rearrange_only = operation == "OPTIMIZE"
        if rearrange_only:
            for a in new_adds:
                a["dataChange"] = False
        if prev is not None:
            for rel in sorted(set(prev.files) - set(disk)):
                rm = dl.make_remove(rel)
                if rearrange_only:
                    rm["dataChange"] = False
                actions.append({"remove": rm})
        actions.extend({"add": a} for a in new_adds)
        if rt_domain_action is not None:
            actions.append(rt_domain_action)
        # Change Data Feed: reference this thread's staged change
        # files in the SAME commit (Delta "Add CDC File" action).
        # When cdc actions are present, table_changes reads them
        # ALONE and ignores the COW add/remove churn.
        if self.cdf:
            for rel in self._cdc_pending(name):
                p = os.path.join(table, rel)
                try:
                    sz = os.path.getsize(p)
                except OSError:
                    # A staged change file vanished between _stage_cdc
                    # and this commit (e.g. an aggressive VACUUM swept
                    # the not-yet-referenced file). Committing anyway
                    # would silently drop these rows from the feed —
                    # downstream incrementals would miss changes with
                    # no error anywhere (ADVICE r9). Fail the commit
                    # loudly instead; the caller retries and restages.
                    raise dl.DeltaProtocolError(
                        f"staged change file {rel!r} vanished before "
                        f"commit of table {name!r} — refusing to commit "
                        "a change feed with silently missing rows "
                        "(was VACUUM run concurrently? use "
                        "cdc_grace_s)"
                    ) from None
                actions.append(
                    {
                        "cdc": {
                            "path": rel,
                            "partitionValues": {},
                            "size": sz,
                            "dataChange": False,
                        }
                    }
                )
            self._cdc_pending(name).clear()
        if prev is not None and not any(
            k in a for a in actions for k in ("add", "remove", "metaData", "cdc")
        ):
            return  # nothing changed — no empty commits
        log.commit(
            actions,
            version=0 if latest is None else latest + 1,
            operation=operation,
        )

    def delta_snapshot(self, name: str, version: int | None = None):
        """The table's Delta snapshot (live file set + metadata) at a
        log version — requires ``delta_log=True`` writes."""
        from product_analytics_spark.sources import delta_log as dl

        return dl.DeltaLog(self.path(name)).snapshot(version)

    def scan_files(
        self,
        name: str,
        conjuncts: Sequence[tuple] = (),
        version: int | None = None,
    ) -> tuple[list[str], int]:
        """Data-skipping scan plan from the transaction log ALONE
        (zero parquet footer opens — the log's per-file stats decide):
        returns (kept relative paths, total live files). ``conjuncts``
        are (column, op, literal) with op in =, <, <=, >, >=,
        between."""
        snap = self.delta_snapshot(name, version)
        kept = snap.plan_files(list(conjuncts))
        return kept, len(snap.files)

    def read_pruned(
        self,
        name: str,
        conjuncts: Sequence[tuple] = (),
        version: int | None = None,
    ) -> DataFrame:
        """Read only the files the log-stats planner keeps (Delta's
        data-skipping scan): prune via ``scan_files``, then load
        exactly those files. The caller still applies the row-level
        filter — file pruning is a superset guarantee, same contract
        as Delta/Iceberg. Partition columns come back as string
        literals from the log's partitionValues. Files with
        ``deletionVector`` descriptors have their tombstoned
        positions anti-joined out (decoded from the roaring
        sidecars), so pruned reads never resurrect MoR-deleted
        rows."""
        from product_analytics_spark.sources import delta_log as dl

        snap = self.delta_snapshot(name, version)
        kept = snap.plan_files(list(conjuncts))
        table = self.path(name)
        part_cols = (snap.metadata or {}).get("partitionColumns") or []
        if not kept:
            schema = self.spark.read.parquet(
                self.current_data_dir(name)
            ).schema
            return self.spark.createDataFrame([], schema)
        positions = snap.dv_positions(table)
        if not part_cols:
            df = self.spark.read.parquet(
                *[os.path.join(table, p) for p in kept]
            )
            return dl.apply_dv_filter(self.spark, df, table, positions)
        groups: dict[tuple, list[str]] = {}
        for p in kept:
            pv = snap.files[p].get("partitionValues") or {}
            key = tuple(pv.get(c) for c in part_cols)
            groups.setdefault(key, []).append(p)
        out = None
        for key in sorted(groups, key=lambda k: tuple(str(x) for x in k)):
            df = self.spark.read.parquet(
                *[os.path.join(table, p) for p in groups[key]]
            )
            df = dl.apply_dv_filter(self.spark, df, table, positions)
            for c, v in zip(part_cols, key):
                df = df.withColumn(c, F.lit(v).cast("string"))
            out = df if out is None else out.unionByName(df)
        return out

    # ---------------------------------------------------------- sinks

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: Sequence[str] = (),
        cluster_by: Sequence[str] = (),
        zorder_by: Sequence[str] = (),
        n_files: int | None = None,
        zorder_depth: bool | str = False,
        expected_version=UNCHECKED,
        operation: str = "WRITE",
        _validate: bool = True,
        _generated_applied: bool = False,
        _pre_commit=None,
    ) -> None:
        """Atomic full replace: write a version dir, commit the pointer.

        ``zorder_by`` lays the files out on the multi-column Morton
        curve (see ``_write_version``) — the ``OPTIMIZE ZORDER BY``
        write path. ``expected_version`` (optional) turns the commit
        into an optimistic transaction: pass ``current_version(name)``
        from the transaction's snapshot read and the commit refuses
        (ConcurrentWriteError, uncommitted version cleaned up) if
        another writer got there first — a blind overwrite would drop
        that writer's rows.

        ``zorder_depth="auto"`` lets the skew advisor pick the lane
        scheme (functions/zorder.choose_equal_depth): any skewed
        z-order key flips the write to equal-DEPTH quantile lanes; the
        RESOLVED boolean is what gets recorded in the layout, so a
        later ``optimize()`` reclusters with the same scheme."""
        if operation != "OPTIMIZE" and self.current_data_dir(name) is not None:
            # Replacing an EXISTING table's rows removes data —
            # forbidden on an append-only table (PROTOCOL.md). The
            # initial write and rearrange-only rewrites (purge_dv's
            # OPTIMIZE) are not removals.
            self._assert_appendable(name, "overwrite")
        ident = self.identity_columns(name)
        ident_supplied = bool(ident) and next(iter(ident)) in df.columns
        if ident and not ident_supplied:
            # first write / explicit refresh omitting the identity
            # column: allocate. A df CARRYING the column passes —
            # overwrite is also the engine's own rewrite primitive
            # (merge/purge_dv/optimize) and those rows already own
            # their ids; the user-facing insert paths (append/merge)
            # enforce GENERATED ALWAYS refusal.
            df = self._apply_identity(name, df)
        # _generated_applied (round-13, guide §1.2 — the constraint-
        # validation induction, applied to generated columns): merge
        # computes/validates the BATCH's generated columns up front,
        # and the kept prev-side rows were computed-or-validated by
        # their own commits, so re-probing the whole merged relation
        # here was a redundant full-scan job per merge.
        if not _generated_applied:
            df = self._apply_generated(name, df)
        # Validation rides ALONGSIDE the version write (guide §2.6 —
        # _validate_async); joined in the pre-commit window below, so
        # a violating write still commits nothing and leaves nothing.
        val_fut = self._validate_async(name, df) if _validate else None
        if zorder_by and zorder_depth == "auto":
            from product_analytics_spark.functions.zorder import (
                choose_equal_depth,
            )

            zorder_depth = choose_equal_depth(df, list(zorder_by))
        version = self._write_version(
            name,
            df,
            partition_by=partition_by,
            cluster_by=cluster_by,
            zorder_by=zorder_by,
            n_files=n_files,
            zorder_depth=zorder_depth,
        )
        if val_fut is not None or _pre_commit is not None:
            # Join the overlapped validation probe and (merge seam)
            # the overlapped cdc stage so the commit below adopts
            # only validated, fully-staged state; on failure drop the
            # just-written uncommitted version dir like a lost commit.
            try:
                if val_fut is not None:
                    val_fut.result()
                if _pre_commit is not None:
                    _pre_commit()
            except Exception:
                shutil.rmtree(
                    os.path.join(self.path(name), version),
                    ignore_errors=True,
                )
                raise
        try:
            self._commit(
                name, version,
                expected_version=expected_version,
                operation=operation,
            )
        except ConcurrentWriteError:
            shutil.rmtree(
                os.path.join(self.path(name), version), ignore_errors=True
            )
            raise
        # Record the layout declaration only AFTER the commit succeeds
        # (ADVICE r8): a transaction that loses the OCC race committed
        # nothing, so it must not redefine the clustering a later
        # optimize() applies either.
        self._record_layout(
            name, partition_by, cluster_by, zorder_by, zorder_depth=zorder_depth
        )
        if ident_supplied:
            # A full refresh carrying ids above the HWM must advance
            # it, or later appends would allocate duplicates of
            # existing keys (ADVICE r9).
            self._advance_identity_hwm(name, version)

    def append(self, name: str, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S5: plain append materialization.

        Appends land in the current committed data dir (or the plain
        table dir on first write). Appends are NOT atomic — matching
        dbt's default incremental behavior; use merge/overwrite for
        transactional semantics.
        """
        self._assert_coordinator_routed(name)
        df = self._apply_identity(name, df)
        df = self._apply_generated(name, df)
        self._validate_constraints(name, df)
        if (
            self.table_properties(name).get(
                "delta.autoOptimize.optimizeWrite"
            )
            == "true"
        ):
            # optimizeWrite (delta.io auto optimize): shuffle the
            # incoming batch so each hive partition receives ONE
            # writer task — one file per partition per append instead
            # of one per (task × partition). At 100 TB the property
            # is what keeps a 200-task micro-batch from minting 200
            # small files per partition every trigger.
            df = (
                df.repartition(*[F.col(c) for c in partition_by])
                if partition_by
                else df.coalesce(1)
            )
        data = self.current_data_dir(name) or self.path(name)
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data)
        if self.delta_log:
            # An append IS a commit in Delta terms: add actions for the
            # new files (reconciled: disk minus log-live), no removes.
            with self._commit_lock(name):
                self._delta_commit(name, operation="WRITE")
        self._maybe_auto_compact(name)

    def _assert_coordinator_routed(self, name: str) -> None:
        """Coordinated-commits FAIL-FAST for the in-place append
        path (found by the q476 composition capstone): ``append``
        writes parquet into the CURRENT data dir before the log
        commit, so letting ``DeltaLog.commit`` refuse afterwards
        leaves orphaned data files that the next writer's
        disk-minus-log reconcile silently ADOPTS — committing rows a
        writer was just told it could not commit. Check the table's
        coordinator declaration BEFORE any byte lands."""
        if not self.delta_log:
            return
        from product_analytics_spark.sources import delta_log as dl

        try:
            conf = (
                self.delta_snapshot(name).metadata or {}
            ).get("configuration") or {}
        except Exception:  # noqa: BLE001 — no log yet: nothing declared
            return
        declared = conf.get(dl.COMMIT_COORDINATOR_PROP)
        if declared and (
            getattr(self.commit_owner, "coordinator_name", None)
            != declared
        ):
            raise dl.DeltaProtocolError(
                f"table {name!r} commits are owned by coordinator "
                f"{declared!r} ({dl.COMMIT_COORDINATOR_PROP}): "
                "configure SnapshotStore(commit_owner=...) with that "
                "coordinator; nothing written"
            )

    def _maybe_auto_compact(self, name: str) -> None:
        """``delta.autoOptimize.autoCompact`` (delta.io auto
        optimize): after an append, any partition that accumulated
        ``engine.autoCompact.minNumFiles`` (default 8) or more files
        is compacted INLINE through the partition-scoped
        :meth:`optimize` — the cold partitions ride along by
        hardlink, and the compaction commit is rearrange-only
        (``dataChange: false``), so change feeds and streams see
        nothing. This is the writer-side half of small-file hygiene:
        the scheduled OPTIMIZE job stops being load-bearing for
        tables whose writers keep themselves tidy."""
        props = self.table_properties(name)
        if props.get("delta.autoOptimize.autoCompact") != "true":
            return
        try:
            min_files = int(
                props.get("engine.autoCompact.minNumFiles") or 8
            )
        except (TypeError, ValueError):
            min_files = 8
        data = self.current_data_dir(name)
        if data is None:
            return
        parts = self._partition_dirs(data)
        hot = [rel for rel, fs in parts if len(fs) >= max(2, min_files)]
        if not hot:
            return
        if "." in hot:
            self.optimize(name)  # flat table: whole-table compaction
            return
        for rel in hot:
            self.optimize(
                name, where=dict(self._partition_literals(rel))
            )

    def merge(
        self,
        name: str,
        batch: DataFrame,
        key: str | Sequence[str],
        partition_by: Sequence[str] = (),
        cluster_by: Sequence[str] = (),
        isolated: bool = False,
        max_retries: int = 3,
        post_scan=None,
    ) -> DataFrame:
        """S4: MERGE batch into the named snapshot on ``key``;
        returns the merged snapshot DataFrame (freshly readable).

        The merged relation lazily reads the OLD version's files;
        writing the new version before the pointer commit means the
        read and the write never race — the commit happens only after
        the new version is fully on disk.

        ``isolated=True`` makes the read-merge-commit an optimistic
        TRANSACTION: the commit presents the version this merge read,
        and if another writer committed in between the merge re-reads
        and retries (up to ``max_retries``) instead of silently
        clobbering the other writer's rows — the Delta MERGE
        commit-retry loop. Default stays last-writer-wins (dbt
        incremental semantics, q17's contract).

        ``post_scan`` (optional zero-arg callable) is the same
        fault-injection point the DML/compaction paths expose: fired
        after each attempt's snapshot read and before its commit, so
        interleaving certs (q425) can land a concurrent commit inside
        the exact window the OCC check must catch.
        """
        self._assert_appendable(name, "MERGE")
        attempts = max_retries if isolated else 1
        last_err: ConcurrentWriteError | None = None
        # Generated columns: a batch that omits them gets them
        # computed HERE (absent-vs-null matters — after the upsert
        # union the distinction is gone and validation would reject
        # the nulls).
        batch = self._apply_generated(name, batch)
        keys_l = [key] if isinstance(key, str) else list(key)
        for _ in range(attempts):
            snapshot_version = self.current_version(name) if isolated else UNCHECKED
            cdc_fut = None
            prev = self.read(name)
            batch_eff = (
                self._identity_merge_batch(name, prev, batch, keys_l)
                if self.identity_columns(name)
                else batch
            )
            merged = merge_upsert(prev, batch_eff, key)
            # CHECK/invariant validation on the NEW rows only (round-12
            # optimization, guide §1.2): the kept prev-side rows were
            # validated by their own commits, and add_constraint /
            # set_invariant validate EXISTING data at declaration time,
            # so induction covers them — the old form re-scanned the
            # whole merged table once PER RULE per merge. The batch is
            # aligned to the merged schema first (batch rows acquire
            # typed NULLs for prev-only columns in the union, and an
            # invariant on such a column must still see them).
            val_fut = None
            if prev is not None and (
                self.constraints(name) or self.invariants(name)
            ):
                val_df = batch_eff
                have = set(batch_eff.columns)
                for fld in prev.schema.fields:
                    if fld.name not in have:
                        val_df = val_df.withColumn(
                            fld.name,
                            F.lit(None).cast(fld.dataType),
                        )
                # Overlapped with the cdc stage + version write below
                # (guide §2.6); joined in overwrite's pre-commit
                # window, so a violating batch still commits nothing.
                val_fut = self._validate_async(name, val_df)
            if post_scan is not None:
                post_scan()
            if self.cdf and prev is not None:
                # Change feed for MERGE: matched keys emit pre+post
                # image (the replaced row and its replacement),
                # unmatched batch rows emit inserts — exactly what
                # merge_upsert's prev-ANTI-batch ∪ batch does.
                bkeys = batch_eff.select(*keys_l).distinct()
                pkeys = prev.select(*keys_l).distinct()
                ct = "_change_type"
                # Overlapped cdc write (guide §2.6): runs while
                # overwrite() below writes the merged version —
                # independent consumers of the same immutable prev
                # files + pinned batch (identity ids localCheckpoint'd
                # in _identity_merge_batch). The commit adopts the
                # staged files via the _pre_commit join below.
                cdc_fut = self._stage_cdc_async(
                    name,
                    prev.join(bkeys, keys_l, "left_semi")
                    .withColumn(ct, F.lit("update_preimage"))
                    .unionByName(
                        batch_eff.join(pkeys, keys_l, "left_semi").withColumn(
                            ct, F.lit("update_postimage")
                        ),
                        allowMissingColumns=True,
                    )
                    .unionByName(
                        batch_eff.join(pkeys, keys_l, "left_anti").withColumn(
                            ct, F.lit("insert")
                        ),
                        allowMissingColumns=True,
                    ),
                )
            def _join_pre_commit(vf=None, cf=None):
                if vf is not None:
                    vf.result()
                self._adopt_cdc(name, cf)

            try:
                self.overwrite(
                    name,
                    merged,
                    partition_by=partition_by,
                    cluster_by=cluster_by,
                    expected_version=snapshot_version,
                    _validate=prev is None,
                    # The batch's generated columns were computed/
                    # validated at the top of this merge and the kept
                    # prev-side rows by their own commits (round-13,
                    # guide §1.2) — skip overwrite's full-relation
                    # re-probe. Only safe when prev actually CARRIES
                    # every declared column (a declare-after-data
                    # table that was never rewritten must still fail
                    # the probe on its NULL prev side).
                    _generated_applied=(
                        prev is None
                        or all(
                            c in prev.columns
                            for c in self.generated_columns(name)
                        )
                    ),
                    _pre_commit=(
                        (
                            lambda vf=val_fut, cf=cdc_fut: _join_pre_commit(
                                vf, cf
                            )
                        )
                        if (cdc_fut is not None or val_fut is not None)
                        else None
                    ),
                )
            except ConcurrentWriteError as exc:
                last_err = exc
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                continue
            except ConstraintViolationError:
                # A violating batch must surface as such (ADVICE r12):
                # since the validation probe joined inside overwrite's
                # try, the generic handler below would reclassify the
                # violation as a concurrency conflict whenever another
                # writer committed during the attempt — masking the
                # real error and paying a full version write per retry.
                self._abort_cdc(name, cdc_fut)
                raise
            except Exception:
                # A concurrent commit may have GC'd the snapshot this
                # merge's plan lazily reads (retention window) — with
                # isolation on, that is the same conflict surfaced
                # during the write instead of at the pointer compare.
                # Version unmoved ⇒ genuine failure: re-raise.
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                if (
                    not isolated
                    or self.current_version(name) == snapshot_version
                ):
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under merge"
                )
                continue
            out = self.read(name)
            assert out is not None
            return out
        assert last_err is not None
        raise last_err

    # ----------------------------------------------------- compaction

    def _partition_dirs(self, data: str) -> list[tuple[str, list[str]]]:
        """Every directory under ``data`` that holds parquet files, as
        (relative subdir, sorted file paths) pairs in deterministic
        order. Flat tables yield one ``(".", files)`` pair; hive-
        partitioned tables yield one pair per leaf partition directory
        (``order_year=1996/order_month=3``). Hidden/metadata entries
        (``_SUCCESS``, ``.crc``, the pointer/log files) are skipped."""
        out: list[tuple[str, list[str]]] = []
        for root, dirs, files in os.walk(data):
            dirs[:] = sorted(d for d in dirs if not d.startswith((".", "_")))
            pq = sorted(
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            if pq:
                out.append((os.path.relpath(root, data), pq))
        return sorted(out)

    def plan_compaction(
        self, name: str, target_bytes: int = 128 << 20
    ) -> list[list[str]]:
        """Bin-pack the current version's parquet files into
        target-size rewrite groups — the q199 planner applied to the
        REAL file manifest: files in deterministic (path) order,
        group = cumulative-size-before div target (≤2x worst-case
        overshoot, the bound file compactors accept). Pure metadata:
        |files| rows, no data read.

        Partitioned tables are planned PER PARTITION DIRECTORY — a
        group never mixes files from two hive partitions, because the
        partition-column values live in the directory name, not the
        files, so a cross-partition rewrite would lose them (exactly
        what Delta OPTIMIZE does: compaction is within-partition)."""
        data = self.current_data_dir(name)
        if data is None:
            return []
        plan: list[list[str]] = []
        for _rel, files in self._partition_dirs(data):
            groups: dict[int, list[str]] = {}
            before = 0
            for f in files:
                groups.setdefault(before // target_bytes, []).append(f)
                before += os.path.getsize(f)
            plan.extend(groups[g] for g in sorted(groups))
        return plan

    @staticmethod
    def _parallel_jobs(thunks, max_workers: int = 4) -> None:
        """Run independent Spark write jobs concurrently (round-12,
        guide §2.6 — overlap independent jobs): a maintenance rewrite
        of N partition directories / bin-pack groups is N independent
        actions whose tails otherwise serialize (each job's last task
        leaves the rest of local[32] idle). 2-4 jobs in flight
        back-fill those tails; results are unchanged because each
        thunk writes a distinct output directory of the same
        uncommitted version. On failure every in-flight thunk still
        completes before the first exception propagates, so the
        caller's cleanup (rmtree of the version dir) never races a
        live write task."""
        thunks = list(thunks)
        if len(thunks) <= 1:
            for t in thunks:
                t()
            return
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.util import inheritable_thread_target

        # inheritable_thread_target (ADVICE r12, same fix as the async
        # cdc/validation threads): pool threads running Spark actions
        # must inherit the submitter's JVM-thread locals (job group /
        # scheduler pool) and release their pinned py4j connection per
        # task instead of parking a JVM thread until pool GC.
        with ThreadPoolExecutor(
            max_workers=min(max_workers, len(thunks))
        ) as tp:
            futs = [tp.submit(inheritable_thread_target(t)) for t in thunks]
            for f in futs:
                f.result()

    def compact(
        self,
        name: str,
        target_bytes: int = 128 << 20,
        max_retries: int = 3,
        post_scan=None,
    ) -> dict:
        """Execute the compaction plan (OPTIMIZE's rewrite half): each
        planned group is rewritten as ONE file into a fresh version
        dir, then the pointer commits atomically — readers switch from
        N small files to |groups| files in one rename, with the prior
        version retained per the retention window (time travel to the
        pre-compaction layout still works).

        Contents are hash-identical by construction: the groups
        partition the file list, and each rewrite is a plain scan →
        coalesce(1) → write of exactly those files. For hive-
        partitioned tables each group is rewritten into the SAME
        relative partition subdirectory inside the new version, so the
        directory-encoded partition columns survive the rewrite and
        read-back re-infers them unchanged. Returns
        {files_before, files_after, groups} so callers can assert the
        file-count drop.

        Optimistic transaction: the commit presents the version whose
        file manifest was planned; if a writer (merge/overwrite/DML)
        committed in between, the stale rewrite is discarded and the
        compaction REPLANS against the new manifest (up to
        ``max_retries``) — blind commit would resurrect rows the
        concurrent writer deleted or drop rows it merged (lost
        update). Delta's OPTIMIZE resolves the same conflict the same
        way: rewrite-only transactions retry cheaply.

        ``post_scan`` (optional zero-arg callable) is a fault-injection
        point fired after each attempt's manifest plan and before its
        commit — interleaving tests use it to land a concurrent commit
        inside the window the OCC check must catch."""
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            # A pending deletion vector must be MATERIALIZED before a
            # raw-file rewrite: these paths read data files directly,
            # so committing without applying the DV would resurrect
            # MoR-deleted rows (and the new version drops the _dv).
            if self._has_dv(name):
                self.purge_dv(name)
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            # The try covers the SCAN phase too (plan_compaction's
            # getsize walk), not just the rewrite: with a small
            # retention window a concurrent commit can GC the scanned
            # version mid-plan, and that must surface as a conflict
            # retry, not a raw OSError (ADVICE r8).
            try:
                plan = self.plan_compaction(name, target_bytes)
                if post_scan is not None:
                    post_scan()
                if not plan:
                    return {"files_before": 0, "files_after": 0, "groups": 0}
                data = self.current_data_dir(name)
                assert data is not None  # plan non-empty ⇒ data exists
                rt = self._row_tracking(name)
                rt_base = self._rt_base_df(name, data) if rt else None
                n_before = sum(len(g) for g in plan)

                def _rewrite_group(group: list[str]) -> None:
                    rel = os.path.relpath(
                        os.path.dirname(group[0]), data
                    )
                    out_dir = (
                        vdir if rel == "." else os.path.join(vdir, rel)
                    )
                    reader = self.spark.read
                    if rt:
                        reader = reader.option("mergeSchema", "true")
                    df = reader.parquet(*group)
                    if rt:
                        # materialize ids so the merged file keeps them
                        # (fresh baseRowIds on the new file lose to the
                        # materialized column via coalesce at read)
                        df = self._rt_attach_ids(
                            name, data, df, base_df=rt_base
                        )
                    # Groups of one directory share out_dir, and two
                    # concurrent append jobs into one directory race
                    # on the commit protocol's shared _temporary/0
                    # staging dir — write each group into its own
                    # staging dir and rename the parquet in (the
                    # _stage_cdc pattern; rename is same-fs atomic).
                    tmp = os.path.join(
                        vdir, f"_grp_{uuid.uuid4().hex[:8]}"
                    )
                    df.coalesce(1).write.parquet(tmp)
                    os.makedirs(out_dir, exist_ok=True)
                    for f in sorted(os.listdir(tmp)):
                        if f.endswith(".parquet") and not f.startswith(
                            (".", "_")
                        ):
                            os.rename(
                                os.path.join(tmp, f),
                                os.path.join(out_dir, f),
                            )
                    shutil.rmtree(tmp, ignore_errors=True)

                # independent per-group rewrites overlap (guide §2.6)
                self._parallel_jobs(
                    [
                        (lambda g: lambda: _rewrite_group(g))(group)
                        for group in plan
                    ]
                )
                self._commit(name, version, expected_version=expected, operation="OPTIMIZE")
            except ConcurrentWriteError as exc:
                last_err = exc
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except Exception:
                # A concurrent commit may have GC'd this attempt's
                # snapshot mid-rewrite (retention window) — same
                # conflict, detected one step earlier. Anything with
                # the version UNMOVED is a real error: re-raise.
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under compaction"
                )
                continue
            n_after = sum(len(fs) for _r, fs in self._partition_dirs(vdir))
            return {
                "files_before": n_before,
                "files_after": n_after,
                "groups": len(plan),
            }
        assert last_err is not None
        raise last_err

    def optimize(
        self,
        name: str,
        target_bytes: int = 128 << 20,
        max_retries: int = 3,
        where: dict | None = None,
    ) -> dict:
        """Delta's ``OPTIMIZE [ZORDER BY …]`` proper: compaction that
        RESTORES the table's declared clustering. Appends and COW
        rewrites degrade a clustered layout over time (new files carry
        arbitrary key ranges, so footer-stat skipping decays);
        ``compact`` alone bin-packs file bytes but concatenates key
        ranges. optimize() instead rewrites each partition directory
        as a whole: re-sorts on the recorded layout keys
        (``zorder_by`` → recomputed Morton z-value; else
        ``cluster_by``), range-partitioned into ceil(bytes/target)
        files — tight per-file min/max again. Falls back to plain
        ``compact`` when the table never declared clustering.

        Optimistic transaction like compact: the commit presents the
        scanned version; a concurrent writer forces a re-scan.
        Returns {files_before, files_after, reclustered}.

        ``where`` ({partition col -> value}) is ``OPTIMIZE t WHERE
        p = v``: only matching hive partition dirs are rewritten;
        everything else is carried into the new version by HARDLINK
        (zero bytes moved, same inodes) — at 100 TB you compact the
        hot day's partition, never the table.

        Scale: this is the maintenance job real lakehouses schedule —
        cost is one shuffle of the rewritten partitions' bytes on the
        cluster key; without ``where``, untouched partition dirs
        rewrite too, where Delta would skip dirs already within
        tolerance (the planner hook to add when partition counts make
        it matter)."""
        # Liquid clustering: keys declared IN THE LOG
        # (``delta.clustering`` domainMetadata, set_clustering) take
        # precedence over the engine-local _LAYOUT declaration — any
        # engine maintaining the table reclusters the same way, which
        # is the point of putting them in the log (Delta's successor
        # to ZORDER post-hooks).
        liquid_keys: list[str] = []
        if self.delta_log:
            from product_analytics_spark.sources import delta_log as dl

            try:
                liquid_keys = self.delta_snapshot(
                    name
                ).clustering_columns()
            except dl.DeltaProtocolError:
                liquid_keys = []
        layout = self.layout(name)
        keys = liquid_keys or list(
            layout.get("zorder_by") or layout.get("cluster_by") or ()
        )
        if not keys and where is None:
            out = self.compact(name, target_bytes, max_retries=max_retries)
            out["reclustered"] = False
            return out
        # single clustering column = plain range sort (morton
        # interleave needs >= 2 dimensions to mean anything)
        zorder = bool(layout.get("zorder_by")) or (
            bool(liquid_keys) and len(keys) >= 2
        )
        zdepth = bool(layout.get("zorder_depth"))
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            # A pending deletion vector must be MATERIALIZED before a
            # raw-file rewrite: these paths read data files directly,
            # so committing without applying the DV would resurrect
            # MoR-deleted rows (and the new version drops the _dv).
            if self._has_dv(name):
                self.purge_dv(name)
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            # Scan phase inside the try: getsize/walk over a snapshot a
            # concurrent commit may GC mid-scan must become a conflict
            # retry, not a raw OSError (ADVICE r8).
            try:
                data = self.current_data_dir(name)
                if data is None:
                    raise ValueError(f"unknown table {name!r}")
                parts = self._partition_dirs(data)
                if not parts:
                    return {
                        "files_before": 0,
                        "files_after": 0,
                        "reclustered": False,
                    }
                rt = self._row_tracking(name)
                rt_base = self._rt_base_df(name, data) if rt else None
                n_before = sum(len(fs) for _r, fs in parts)

                def _recluster_dir(rel: str, files: list[str]) -> None:
                    out_dir = (
                        vdir if rel == "." else os.path.join(vdir, rel)
                    )
                    n_files = max(
                        1,
                        -(-sum(os.path.getsize(f) for f in files) // target_bytes),
                    )
                    reader = self.spark.read
                    if rt:
                        reader = reader.option("mergeSchema", "true")
                    df = reader.parquet(*files)
                    if rt:
                        # recluster preserves row identity by
                        # materializing ids into the rewritten files
                        df = self._rt_attach_ids(
                            name, data, df, base_df=rt_base
                        )
                    if zorder:
                        from product_analytics_spark.functions.zorder import (
                            morton_zvalue,
                        )

                        df = df.withColumn(
                            "__zval",
                            morton_zvalue(df, keys, equal_depth=zdepth),
                        )
                        sort_keys = ["__zval"]
                    else:
                        sort_keys = keys
                    if sort_keys:
                        df = df.repartitionByRange(
                            n_files, *sort_keys
                        ).sortWithinPartitions(*sort_keys)
                    else:
                        # no declared clustering (WHERE-scoped
                        # compaction of an unclustered table):
                        # plain bin-pack
                        df = df.repartition(n_files)
                    if zorder:
                        df = df.drop("__zval")
                    df.write.mode("append").parquet(out_dir)

                rewrites = []
                for rel, files in parts:
                    out_dir = vdir if rel == "." else os.path.join(vdir, rel)
                    if where is not None and not all(
                        (k, str(v)) in self._partition_literals(rel)
                        for k, v in where.items()
                    ):
                        # OPTIMIZE ... WHERE: partitions outside the
                        # predicate are carried by HARDLINK — zero
                        # bytes moved, same inodes (Delta skips
                        # untouched partitions the same way; at
                        # 100 TB you compact the hot day's
                        # partition, never the table)
                        os.makedirs(out_dir, exist_ok=True)
                        for f in files:
                            os.link(
                                f,
                                os.path.join(
                                    out_dir, os.path.basename(f)
                                ),
                            )
                        continue
                    rewrites.append(
                        (lambda r, fs: lambda: _recluster_dir(r, fs))(
                            rel, list(files)
                        )
                    )
                # per-directory stats pass + sorted rewrite are
                # independent jobs — overlap them (guide §2.6); the
                # per-directory z-value/lane stats are unchanged, so
                # file layouts and skipping stats stay identical.
                self._parallel_jobs(rewrites)
                self._commit(name, version, expected_version=expected, operation="OPTIMIZE")
            except ConcurrentWriteError as exc:
                last_err = exc
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except Exception:
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under optimize"
                )
                continue
            n_after = sum(
                len(fs) for _r, fs in self._partition_dirs(vdir)
            )
            return {
                "files_before": n_before,
                "files_after": n_after,
                "reclustered": bool(keys),
            }
        assert last_err is not None
        raise last_err

    # ------------------------------------------- copy-on-write DML

    @staticmethod
    def _partition_literals(rel: str) -> list[tuple[str, str]]:
        """Decode a hive-relative path ('event_type=click/…') into
        (column, string-value) pairs; flat tables ('.') decode to []."""
        if rel == ".":
            return []
        out = []
        for seg in rel.split(os.sep):
            col, _, val = seg.partition("=")
            out.append((col, val))
        return out

    def _rewrite_where(
        self,
        name: str,
        predicate: str,
        transform,
        max_retries: int = 3,
        post_scan=None,
        cdc_build=None,
    ) -> dict:
        """Copy-on-write rewrite — the kernel under DELETE and UPDATE
        (Delta/Iceberg COW semantics): only files that CONTAIN a
        matching row are rewritten; every untouched file is HARDLINKED
        into the new version (zero data movement), and the pointer
        commit flips readers atomically.

        Touched files are discovered by Spark itself: one filtered
        scan projecting input_file_name() — partition pruning and
        parquet row-group stats make this the cheap metadata-shaped
        pass it is at any scale, and the driver receives a FILE
        MANIFEST (|files| rows), not data (the documented
        driver-scalar collect pattern). Each touched hive directory is
        rewritten with its partition values injected as literals (the
        dir name carries them, so predicates over partition columns
        work), transformed, then written back into the same relative
        subdir with the partition columns dropped again.

        ``transform(df, pred_col)`` receives the file's rows plus the
        evaluated predicate column and returns the replacement rows.
        Returns {files_total, files_rewritten, files_linked,
        rows_before, rows_after}.

        Optimistic transaction: the commit presents the version whose
        files were scanned and hardlinked; if a writer committed in
        between (merge/overwrite/compact), this rewrite is discarded
        and the DML re-scans the NEW version (up to ``max_retries``) —
        committing blind would resurrect that writer's deleted rows or
        drop its merged ones (the lost-update VERDICT r7 flagged).

        ``post_scan`` (optional zero-arg callable) is a fault-injection
        point fired after each attempt's touched-file scan and before
        its commit — interleaving certs (q413) land a concurrent merge
        there to exercise the conflict-and-retry path deterministically.
        """
        self._assert_appendable(name, "DELETE/UPDATE (COW rewrite)")
        last_err: ConcurrentWriteError | None = None
        for _ in range(max_retries):
            # A pending deletion vector must be MATERIALIZED before a
            # raw-file rewrite: these paths read data files directly,
            # so committing without applying the DV would resurrect
            # MoR-deleted rows (and the new version drops the _dv).
            if self._has_dv(name):
                self.purge_dv(name)
            expected = self.current_version(name)
            version = f"v_{uuid.uuid4().hex[:12]}"
            vdir = os.path.join(self.path(name), version)
            n_link = n_rewrite = 0
            cdc_fut = None
            val_fut = None
            # Scan phase inside the try (ADVICE r8): the full.count()
            # and input_file_name() collect read a snapshot a concurrent
            # commit can GC mid-scan under a small retention window —
            # that must take the version-moved ⇒ retry path, not
            # surface as a raw Spark/OS error.
            try:
                data = self.current_data_dir(name)
                if data is None:
                    raise ValueError(f"unknown table {name!r}")
                parts = self._partition_dirs(data)
                all_files = [f for _rel, fs in parts for f in fs]
                manifest_local = {os.path.normpath(f) for f in all_files}
                # basePath == the dir itself ⇒ identical to a plain
                # dir read; route through the schema memo.
                full = self._read_version_dir(data)
                # ONE scan yields both the row count and the touched-
                # file manifest (round-12 optimization, guide §1.2:
                # these were two full passes). collect_set over the
                # conditional file name is |touched files|-sized —
                # still the documented driver-scalar manifest collect,
                # never data. input_file_name() is PROJECTED first:
                # the analyzer refuses non-deterministic expressions
                # as direct aggregate arguments
                # (AGGREGATE_FUNCTION_WITH_NONDETERMINISTIC_EXPRESSION);
                # over the projected attribute the aggregate is legal.
                agg_row = (
                    full.select(
                        F.when(
                            F.expr(predicate), F.input_file_name()
                        ).alias("__f")
                    )
                    .select(
                        F.count(F.lit(1)).alias("__n"),
                        F.collect_set("__f").alias("__files"),
                    )
                    .collect()[0]
                )
                rows_before = agg_row["__n"]
                touched = set(agg_row["__files"])

                def _local(p: str) -> str:
                    # input_file_name() yields a percent-encoded file:
                    # URI; decode it or paths/hive values with encoded
                    # chars (space, %, #, non-ASCII) never match the
                    # os.walk manifest and their files silently escape
                    # the rewrite.
                    from urllib.parse import unquote, urlparse

                    parsed = urlparse(p)
                    return unquote(parsed.path) if parsed.scheme else unquote(p)

                touched_local = {os.path.normpath(_local(p)) for p in touched}
                if post_scan is not None:
                    post_scan()
                stray = touched_local - manifest_local
                if stray:
                    raise RuntimeError(
                        f"COW rewrite of {name!r}: {len(stray)} scanned "
                        f"file(s) missing from the on-disk manifest (URI "
                        f"decode mismatch?): {sorted(stray)[:3]}"
                    )
                if cdc_build is not None and self.cdf:
                    # Change feed BEFORE the rewrite: the builder reads
                    # the matching rows of THIS attempt's snapshot
                    # (``full`` carries the hive partition columns via
                    # basePath), so the staged change files pair with
                    # this attempt's commit; a lost race discards them.
                    # Overlapped with the hardlink pass + rewrite write
                    # below (guide §2.6) — both read the same immutable
                    # snapshot files; joined before the commit.
                    cdc_fut = self._stage_cdc_async(
                        name, cdc_build(full, F.expr(predicate))
                    )
                touched_by_rel: list[tuple[str, list[str]]] = []
                for rel, files in parts:
                    out_dir = vdir if rel == "." else os.path.join(vdir, rel)
                    os.makedirs(out_dir, exist_ok=True)
                    dir_touched = [
                        f for f in files if os.path.normpath(f) in touched_local
                    ]
                    for f in files:
                        if os.path.normpath(f) not in touched_local:
                            os.link(
                                f, os.path.join(out_dir, os.path.basename(f))
                            )
                            n_link += 1
                    if dir_touched:
                        touched_by_rel.append((rel, dir_touched))
                        n_rewrite += len(dir_touched)
                # ONE rewrite pass over every touched file (round-12,
                # guide §1.2/§6): the per-directory loop paid one
                # schema resolution, one constraint probe and one
                # write JOB per touched hive dir, serially — a
                # partitioned table whose predicate touched every
                # partition serialized 3×|dirs| tiny jobs. One
                # hive-aware read (partition columns attached by the
                # scan; type inference disabled so they arrive as the
                # same STRINGS the literal injection produced), one
                # transform, one validation probe, one partitioned
                # write clustered by the partition key (1 file per
                # touched dir, matching the old per-dir output).
                if touched_by_rel and touched_by_rel[0][0] == ".":
                    df = self.spark.read.parquet(*touched_by_rel[0][1])
                    replaced = transform(df, F.expr(predicate))
                    # COW UPDATE can mint violating rows — gate the
                    # rewritten rows (DELETE only removes, but the
                    # check is one fused predicate either way).
                    # Overlapped with the rewrite write (guide §2.6);
                    # joined before the commit below.
                    val_fut = self._validate_async(name, replaced)
                    replaced.write.mode("append").parquet(vdir)
                elif touched_by_rel:
                    part_cols = [
                        c
                        for c, _v in self._partition_literals(
                            touched_by_rel[0][0]
                        )
                    ]
                    all_touched = sorted(
                        f for _rel, fs in touched_by_rel for f in fs
                    )
                    # Partition values must arrive as the same STRINGS
                    # the literal injection produced ("03" stays "03",
                    # never int 3). The old form toggled the session
                    # conf partitionColumnTypeInference.enabled, a
                    # cross-thread mutation of shared SQLConf while
                    # the overlapped cdc job may still run (ADVICE
                    # r12). An explicit read schema with STRING
                    # partition columns is the per-reader equivalent:
                    # user-specified partition types take the raw
                    # unescaped directory value (verified identical
                    # rows + schema to the conf-off read).
                    from pyspark.sql import types as T

                    part_set = set(part_cols)
                    rd_schema = T.StructType(
                        [
                            T.StructField(f.name, T.StringType(), True)
                            if f.name in part_set
                            else f
                            for f in full.schema.fields
                        ]
                    )
                    df = (
                        self.spark.read.schema(rd_schema)
                        .option("basePath", data)
                        .parquet(*all_touched)
                    )
                    replaced = transform(df, F.expr(predicate))
                    # Overlapped validation (guide §2.6), joined
                    # before the commit below.
                    val_fut = self._validate_async(name, replaced)
                    (
                        replaced.repartition(
                            max(len(touched_by_rel), 1), *part_cols
                        )
                        .write.mode("append")
                        .partitionBy(*part_cols)
                        .parquet(vdir)
                    )
                if val_fut is not None:
                    val_fut.result()
                self._adopt_cdc(name, cdc_fut)
                self._commit(name, version, expected_version=expected, operation="DML")
            except ConcurrentWriteError as exc:
                last_err = exc
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                continue
            except ConstraintViolationError:
                # Same as merge (ADVICE r12): a COW UPDATE that mints
                # violating rows must raise the violation, not be
                # retried as a concurrency conflict when another
                # writer happened to commit during the attempt.
                self._abort_cdc(name, cdc_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                raise
            except Exception:
                # A concurrent commit may have GC'd this attempt's
                # snapshot mid-rewrite (hardlink source vanished) —
                # same conflict, surfaced earlier. Version unmoved ⇒
                # genuine failure: re-raise.
                self._abort_cdc(name, cdc_fut)
                self._abort_validation(val_fut)
                shutil.rmtree(vdir, ignore_errors=True)
                if self.current_version(name) == expected:
                    raise
                last_err = ConcurrentWriteError(
                    f"table {name!r}: snapshot GC'd under COW rewrite"
                )
                continue
            # rows_after from the committed version's parquet footers
            # (round-13, guide §1.2): this was a full count JOB per
            # DML (`self.read(name).count()`). The committed version
            # is exactly ``vdir`` (hardlinks + rewritten files, no
            # _dv — a pending deletion vector was purged before the
            # scan), so the footers' num_rows sum IS the live row
            # count — O(|files|) driver metadata reads, zero jobs.
            import pyarrow.parquet as pq

            rows_after = 0
            for _rel, fs in self._partition_dirs(vdir):
                for f in fs:
                    rows_after += pq.ParquetFile(f).metadata.num_rows
            return {
                "files_total": len(all_files),
                "files_rewritten": n_rewrite,
                "files_linked": n_link,
                "rows_before": rows_before,
                "rows_after": rows_after,
            }
        assert last_err is not None
        raise last_err

    def delete_where(self, name: str, predicate: str, post_scan=None) -> dict:
        """Copy-on-write DELETE (Delta ``DELETE FROM t WHERE``): drop
        matching rows, rewriting ONLY the files that contain one —
        with a partition-column predicate the scan prunes to the
        matching hive dirs, so whole untouched partitions survive as
        hardlinks. Time travel to the pre-delete version still works
        within the retention window. Commits are optimistic (see
        ``_rewrite_where``); ``post_scan`` is the fault-injection hook."""
        return self._rewrite_where(
            name,
            predicate,
            lambda df, pred: df.where(~pred),
            post_scan=post_scan,
            cdc_build=lambda df, pred: df.where(pred).withColumn(
                "_change_type", F.lit("delete")
            ),
        )

    def update_where(
        self,
        name: str,
        predicate: str,
        assignments: dict[str, str],
        post_scan=None,
    ) -> dict:
        """Copy-on-write UPDATE (Delta ``UPDATE t SET ... WHERE``):
        ``assignments`` maps column -> SQL expression, applied only to
        matching rows (CASE WHEN predicate THEN expr ELSE old END) in
        the files that contain one. Updating a PARTITION column would
        move rows across directories — raise loudly rather than
        silently corrupting the layout (Delta requires a
        delete+insert for that too)."""
        data = self.current_data_dir(name)
        if data is not None:
            part_cols = {
                c
                for rel, _fs in self._partition_dirs(data)
                for c, _v in self._partition_literals(rel)
            }
            bad = part_cols & set(assignments)
            if bad:
                raise ValueError(
                    f"update_where cannot reassign partition columns {sorted(bad)}; "
                    "delete + re-append moves rows across partitions"
                )

        def _apply(df: DataFrame, pred) -> DataFrame:
            for col, expr_sql in assignments.items():
                # Cast back to the column's ORIGINAL type: SQL literal
                # arithmetic widens (double + 1000.0 -> wider DECIMAL),
                # and a rewritten file whose column type drifted from
                # the hardlinked files' would poison every later read
                # (schema enforcement — Delta does the same cast).
                df = df.withColumn(
                    col,
                    F.when(pred, F.expr(expr_sql))
                    .otherwise(F.col(col))
                    .cast(df.schema[col].dataType),
                )
            return df

        def _cdc(df: DataFrame, pred) -> DataFrame:
            pre = df.where(pred)
            post = pre
            for col, expr_sql in assignments.items():
                # Same cast-back-to-original-type rule as _apply: the
                # postimage must show exactly what landed on disk.
                post = post.withColumn(
                    col, F.expr(expr_sql).cast(df.schema[col].dataType)
                )
            return pre.withColumn(
                "_change_type", F.lit("update_preimage")
            ).unionByName(
                post.withColumn("_change_type", F.lit("update_postimage"))
            )

        return self._rewrite_where(
            name, predicate, _apply, post_scan=post_scan, cdc_build=_cdc
        )
