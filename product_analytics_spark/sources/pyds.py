"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic CDC-feed generator source with partition planning,
Arrow-batch reads, and filter pushdown.

Why this exists: the reference consumes bronze CDC feeds that land
via connectors outside dbt (SURVEY.md §2.1) — this source is the
engine-side answer for feeds with no file representation (message
buses, change streams, synthetic load): a first-class `spark.read
.format("cdc_feed")` relation that

- plans one `InputPartition` per shard, so a 1000-executor cluster
  reads 1000 shards concurrently (partition planning is the source's
  job, not the user's),
- yields **Arrow RecordBatches** (the vectorized path — rows never
  cross Python one at a time),
- implements `pushFilters`, accepting `op = '…'` equality and
  `op_id` range bounds so the GENERATOR skips work — the same
  contract parquet pushdown gives a scan (tested: unsupported
  filters are returned to Spark for re-evaluation, supported ones
  shrink the generated range).

The row function is pure modular arithmetic, so a SQL oracle can
reproduce the feed exactly (`generate_series` — see q196).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: generator constants — shared verbatim by the q196 oracle SQL
CDC_N_CUSTOMERS = 1500
CDC_AMOUNT_A = 1103515245
CDC_AMOUNT_B = 12345
CDC_AMOUNT_MOD = 10_000_000
CDC_TS_BASE = 1_700_000_000
CDC_OPS = ("INSERT", "UPDATE", "DELETE")  # op_id%10: 0-6 / 7-8 / 9


def cdc_op(op_id: int) -> str:
    m = op_id % 10
    return "INSERT" if m <= 6 else ("UPDATE" if m <= 8 else "DELETE")


def cdc_row(op_id: int) -> tuple:
    return (
        op_id,
        op_id % CDC_N_CUSTOMERS,
        cdc_op(op_id),
        CDC_TS_BASE + op_id * 60,
        (op_id * CDC_AMOUNT_A + CDC_AMOUNT_B) % CDC_AMOUNT_MOD,
    )


CDC_SCHEMA = StructType(
    [
        StructField("op_id", LongType()),
        StructField("customer_id", LongType()),
        StructField("op", StringType()),
        StructField("ts_epoch", LongType()),
        StructField("amount_cents", LongType()),
    ]
)


@dataclass
class _ShardPartition(InputPartition):
    start: int
    end: int  # exclusive


class CdcFeedReader(DataSourceReader):
    def __init__(self, options):
        self.shards = int(options.get("shards", "8"))
        self.rows_per_shard = int(options.get("rows_per_shard", "10000"))
        self.lo = 0
        self.hi = self.shards * self.rows_per_shard  # exclusive
        self.op_filter: str | None = None

    # -- filter pushdown -------------------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and attr == ("op",):
                self.op_filter = f.value
            elif isinstance(f, GreaterThanOrEqual) and attr == ("op_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and attr == ("op_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and attr == ("op_id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and attr == ("op_id",):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # unsupported -> Spark re-evaluates it

    # -- partition planning ---------------------------------------------
    def partitions(self):
        parts = []
        for s in range(self.shards):
            a = max(self.lo, s * self.rows_per_shard)
            b = min(self.hi, (s + 1) * self.rows_per_shard)
            if a < b:
                parts.append(_ShardPartition(a, b))
        # never return zero partitions (Spark requires >= 1)
        return parts or [_ShardPartition(0, 0)]

    # -- vectorized read -------------------------------------------------
    def read(self, partition: _ShardPartition) -> Iterator:
        import pyarrow as pa

        ids = range(partition.start, partition.end)
        if self.op_filter is not None:
            ids = [i for i in ids if cdc_op(i) == self.op_filter]
        else:
            ids = list(ids)
        if not ids:
            return
        import numpy as np

        a = np.asarray(ids, dtype=np.int64)
        batch = pa.record_batch(
            [
                pa.array(a),
                pa.array(a % CDC_N_CUSTOMERS),
                pa.array([cdc_op(int(i)) for i in a]),
                pa.array(CDC_TS_BASE + a * 60),
                pa.array((a * CDC_AMOUNT_A + CDC_AMOUNT_B) % CDC_AMOUNT_MOD),
            ],
            names=[f.name for f in CDC_SCHEMA.fields],
        )
        yield batch


class CdcFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_feed"

    def schema(self):
        return CDC_SCHEMA

    def reader(self, schema) -> CdcFeedReader:
        return CdcFeedReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the cdc_feed source."""
    spark.dataSource.register(CdcFeedDataSource)


# ---------------------------------------------------------------------
# Writer side: a JSONL sink with a real two-phase commit protocol.
# ---------------------------------------------------------------------

from dataclasses import field  # noqa: E402
from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    path: str = ""
    rows: int = 0


class JsonlWriter(DataSourceWriter):
    """Executor-side writer with the standard two-phase commit: each
    task streams rows to a STAGED file (`.staging-<job>-<uuid>.jsonl`),
    returns a commit message, and only the driver-side `commit()`
    renames staged files into place and writes a `_MANIFEST.json`
    (file list + row counts) — the atomicity contract object-store
    committers provide. `abort()` removes staged files, so a failed
    job leaves no partial output visible. Readers treat the manifest
    as the source of truth (exactly the _SUCCESS/manifest discipline
    sinks.py documents for the parquet path)."""

    def __init__(self, options):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")
        # One id per WRITE JOB (the writer is built on the driver and
        # pickled to every task): staged files carry it so commit()'s
        # orphan sweep only ever touches THIS job's staging files —
        # two concurrent jobs writing the same directory can no longer
        # delete each other's staged output mid-commit.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlCommit:
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f".staging-{self.job_id}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True, default=str))
                f.write("\n")
                n += 1
        return _JsonlCommit(path=staged, rows=n)

    def commit(self, messages) -> None:
        import json as _json
        import os

        final = []
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)  # empty tasks leave no files
                continue
            dest = os.path.join(
                self.path, os.path.basename(m.path).replace(".staging-", "part-")
            )
            os.rename(m.path, dest)
            final.append({"file": os.path.basename(dest), "rows": m.rows})
        # Sweep orphaned staged files from failed/speculative attempts that
        # never produced a commit message — they must not survive a commit.
        import glob as _glob

        for orphan in _glob.glob(
            os.path.join(self.path, f".staging-{self.job_id}-*.jsonl")
        ):
            try:
                os.remove(orphan)
            except OSError:
                pass
        # Manifest write is itself atomic: temp file + rename, so a crash
        # mid-write can never leave a truncated manifest for readers.
        manifest = os.path.join(self.path, "_MANIFEST.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {"files": sorted(final, key=lambda d: d["file"]),
                 "total_rows": sum(d["rows"] for d in final)},
                f,
            )
        os.rename(tmp, manifest)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


# --------------------------------------------------------------------
# Streaming half: the same deterministic CDC feed as an unbounded
# source (Spark 4 SimpleDataSourceStreamReader).  Offsets are plain
# op_id positions, so replay (readBetweenOffsets — exactly-once on
# restart) regenerates identical rows, and the SQL oracle reproduces
# the whole stream with generate_series (see q367).


class CdcStreamReader(SimpleDataSourceStreamReader):
    """Offset-based micro-batch reader over the cdc_row generator.

    ``total_rows`` bounds the feed (so availableNow/processAllAvailable
    drains it); ``batch_rows`` is the per-trigger slice — batch
    BOUNDARIES must never change any downstream answer, which is what
    q367's oracle certifies.  read() is driver-side prefetch by
    design (the Simple API): right for control-plane-sized feeds;
    heavy streams belong to the partition-planning DataSourceStreamReader
    or Kafka, and the docstring is the fence."""

    def __init__(self, options):
        self.total = int(options.get("total_rows", "4000"))
        self.batch = int(options.get("batch_rows", "512"))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        # Concrete lists, not generators: the prefetcher PICKLES the
        # returned batch to hand it to the micro-batch that commits it.
        s = int(start["pos"])
        if s >= self.total:
            return iter(()), {"pos": s}
        e = min(s + self.batch, self.total)
        return iter([cdc_row(i) for i in range(s, e)]), {"pos": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            [cdc_row(i) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class CdcStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_stream"

    def schema(self):
        return CDC_SCHEMA

    def simpleStreamReader(self, schema) -> CdcStreamReader:
        return CdcStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(CdcStreamDataSource)


# Executor-parallel streaming half: the PARTITION-PLANNING
# DataSourceStreamReader — the corpus-scale path the Simple reader's
# docstring fences off. The driver only does offset arithmetic
# (latestOffset/partitions); row GENERATION happens in read(), which
# Spark executes ON EXECUTORS, one task per InputPartition — so a
# micro-batch's work spreads across the cluster instead of being
# prefetched on the driver.


@dataclass
class _StreamSlice(InputPartition):
    start: int
    end: int


class CdcParallelStreamReader(DataSourceStreamReader):
    """Offset-range planner for the deterministic CDC feed.

    Per trigger: ``latestOffset`` advances the available watermark by
    ``batch_rows`` (a feed producing that much per trigger — for a
    real source this is "what has arrived"); ``partitions(start, end)``
    splits the micro-batch's offset range into ``shards``
    InputPartitions; ``read(partition)`` regenerates exactly that
    slice on an executor. Offsets are plain positions, so restart
    replay re-plans the same partitions and regenerates identical rows
    — exactly-once by construction, same contract the Simple reader's
    readBetweenOffsets gives, now with executor-side parallel reads.
    Batch boundaries AND shard boundaries must never change any
    downstream answer — q420's closed-form oracle certifies both.

    Availability (``_available``) is per-driver-lifetime state; after
    a checkpoint restart it is RE-SEEDED from the engine's replayed
    offsets (``partitions``/``commit`` clamp it up to the durable
    position, ADVICE r8), so ``latestOffset`` resumes from the
    checkpoint instead of stalling below it until the counter catches
    back up."""

    def __init__(self, options):
        self.total = int(options.get("total_rows", "4000"))
        self.batch = int(options.get("batch_rows", "1024"))
        self.shards = int(options.get("shards", "4"))
        self._available = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._available = min(self._available + self.batch, self.total)
        return {"pos": self._available}

    def partitions(self, start, end):
        s, e = int(start["pos"]), int(end["pos"])
        # Restart re-seed: the engine re-plans from the durable offset
        # log while a fresh driver's _available restarts at 0 — clamp
        # availability up to the replayed range so the next
        # latestOffset never returns below the checkpoint.
        self._available = max(self._available, min(max(s, e), self.total))
        if e <= s:
            return [_StreamSlice(s, s)]
        n = max(1, self.shards)
        step = -(-(e - s) // n)
        return [
            _StreamSlice(lo, min(lo + step, e)) for lo in range(s, e, step)
        ]

    def read(self, partition: _StreamSlice) -> Iterator:
        # Runs on an EXECUTOR: regenerate this slice only.
        for i in range(partition.start, partition.end):
            yield cdc_row(i)

    def commit(self, end):
        # Positions below ``end`` are durable in the checkpoint; a real
        # source would release upstream resources here. The generator
        # is stateless — just keep the availability watermark at least
        # at the durable position (restart re-seed, see class doc).
        self._available = max(self._available, min(int(end["pos"]), self.total))


class CdcParallelStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_pstream"

    def schema(self):
        return CDC_SCHEMA

    def streamReader(self, schema) -> CdcParallelStreamReader:
        return CdcParallelStreamReader(self.options)


def register_parallel_stream(spark) -> None:
    spark.dataSource.register(CdcParallelStreamDataSource)
