"""Threaded DAG executor — dbt's concurrent scheduler analog.

The reference runs its 3-model medallion DAG through dbt with
``threads: 5`` (reference profiles.yml:8): dbt topo-sorts the graph,
keeps up to N models in flight, starts a model the moment its last
dependency finishes, marks downstream models SKIPPED when an upstream
errors, and writes a run ledger (run_results.json). This module is
that scheduler on Spark:

  * ``DagExecutor(registry, store, threads=5)`` — dependency-ordered
    N-thread execution of a :class:`ModelRegistry`. Independent
    subgraphs genuinely overlap: each worker thread materializes its
    model through the SnapshotStore (separate tables — no write
    contention) and sets a FAIR scheduler pool so concurrent Spark
    jobs share executors instead of FIFO-starving each other (the
    bench.py pool discipline; tools/fairscheduler.xml).
  * is_incremental() re-run semantics come from the models themselves
    (high-watermark filter against the prior snapshot —
    operators/incremental.py); the executor feeds each model its
    prior snapshot and records ``rows_built`` per run, so a second
    run over a cumulative source demonstrably processes only
    post-watermark rows (the ledger is the evidence; q415 compares it
    against the oracle's expected counts).
  * The ledger is one dict per model attempt: name, status
    (success | error | skipped), level (longest-path depth — the
    deterministic "wave" the scheduler releases it in), rows_built,
    incremental flag, wall-clock start/end, thread name, error text.
    dbt's run_results.json carries the same fields.

Scale: the scheduler itself is driver-side metadata (|models| nodes);
all heavy lifting stays in Spark jobs. FAIR pools matter at 100 TB:
five concurrent MERGEs on one cluster otherwise serialize behind the
first model's full-stage FIFO claim.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Mapping
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from product_analytics_spark.plans.registry import Model, ModelRegistry
from product_analytics_spark.sources.sinks import SnapshotStore


class DagExecutor:
    def __init__(
        self,
        registry: ModelRegistry,
        store: SnapshotStore,
        threads: int = 5,
        pool: str | None = "dag",
        isolated: bool = False,
        merge_hooks: Mapping[str, object] | None = None,
    ):
        """``isolated=True`` turns every incremental model's MERGE into
        an optimistic transaction (sinks.merge ``isolated``): when TWO
        schedulers run overlapping jobs against one warehouse — dbt
        users do — a merge that loses the commit race re-reads the
        other run's commit and retries instead of silently clobbering
        it (q425's cert). ``merge_hooks`` maps model name → zero-arg
        callable fired inside each merge attempt's scan→commit window
        (the sinks post_scan fault-injection point) so interleavings
        are DETERMINISTIC in tests, never timing-dependent."""
        self.registry = registry
        self.store = store
        self.threads = max(1, threads)
        self.pool = pool
        self.isolated = bool(isolated)
        self.merge_hooks = dict(merge_hooks or {})

    # ------------------------------------------------------------ run

    def run(
        self,
        sources: Mapping[str, DataFrame],
        select: set[str] | None = None,
        full_refresh: bool = False,
        select_exact: bool = False,
    ) -> tuple[dict[str, DataFrame], list[dict]]:
        """Execute the (selected) DAG with up to ``threads`` models in
        flight; returns (outputs, ledger). Semantics match
        ``ModelRegistry.run`` exactly — same builder contract, same
        merge-vs-overwrite materialization — plus concurrency and the
        ledger. ``select_exact`` runs only the named models, serving
        their upstreams from ``sources`` (the retry path)."""
        ordered = self.registry.topo_order(select, exact=select_exact)
        wanted = {m.name for m in ordered}
        level: dict[str, int] = {}
        for m in ordered:  # topo order ⇒ deps resolved first
            in_dag = [level[d] for d in m.deps if d in wanted]
            level[m.name] = max(in_dag) + 1 if in_dag else 0

        outputs: dict[str, DataFrame] = dict(sources)
        ledger: list[dict] = []
        status: dict[str, str] = {}
        submitted: set[str] = set()
        lock = threading.Lock()
        done_cv = threading.Condition(lock)
        concurrency = {"now": 0, "max": 0}

        def _worker(m: Model, deps: dict[str, DataFrame]) -> None:
            spark = self.store.spark
            if self.pool:
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", self.pool
                )
            spark.sparkContext.setJobDescription(f"model:{m.name}")
            t0 = time.time()
            with lock:
                concurrency["now"] += 1
                concurrency["max"] = max(concurrency["max"], concurrency["now"])
            entry = {
                "model": m.name,
                "level": level[m.name],
                "started_at": t0,
                "thread": threading.current_thread().name,
            }
            built = None
            try:
                prev = None if full_refresh else self.store.read(m.name)
                incremental = (
                    m.unique_key is not None
                    and prev is not None
                    and not full_refresh
                )
                built = m.builder(
                    deps, prev, full_refresh or prev is None
                ).persist(StorageLevel.MEMORY_AND_DISK)
                rows_built = built.count()
                if m.unique_key and not full_refresh:
                    out = self.store.merge(
                        m.name,
                        built,
                        m.unique_key,
                        partition_by=m.partition_by,
                        cluster_by=m.cluster_by,
                        isolated=self.isolated,
                        max_retries=5 if self.isolated else 3,
                        post_scan=self.merge_hooks.get(m.name),
                    )
                else:
                    self.store.overwrite(
                        m.name,
                        built,
                        partition_by=m.partition_by,
                        cluster_by=m.cluster_by,
                    )
                    out = self.store.read(m.name)
                entry.update(
                    status="success",
                    rows_built=rows_built,
                    incremental=incremental,
                    error=None,
                )
                result_df = out
            except Exception as e:  # noqa: BLE001 — dbt records, not raises
                entry.update(
                    status="error",
                    rows_built=-1,
                    incremental=False,
                    error=f"{type(e).__name__}: {e}",
                )
                result_df = None
            finally:
                if built is not None:
                    built.unpersist(False)
            entry["finished_at"] = time.time()
            entry["duration_s"] = round(entry["finished_at"] - t0, 3)
            with done_cv:
                concurrency["now"] -= 1
                status[m.name] = entry["status"]
                if result_df is not None:
                    outputs[m.name] = result_df
                ledger.append(entry)
                done_cv.notify_all()

        by_name = {m.name: m for m in ordered}
        with ThreadPoolExecutor(
            max_workers=self.threads, thread_name_prefix="dag"
        ) as tp:
            with done_cv:
                while len(status) < len(wanted):
                    progressed = False
                    for m in ordered:
                        if m.name in submitted or m.name in status:
                            continue
                        dag_deps = [d for d in m.deps if d in wanted]
                        if any(
                            status.get(d) in ("error", "skipped")
                            for d in dag_deps
                        ):
                            # dbt: upstream failure ⇒ SKIPPED, siblings run on
                            status[m.name] = "skipped"
                            ledger.append(
                                {
                                    "model": m.name,
                                    "level": level[m.name],
                                    "status": "skipped",
                                    "rows_built": -1,
                                    "incremental": False,
                                    "error": "upstream failure",
                                    "started_at": time.time(),
                                    "finished_at": time.time(),
                                    "duration_s": 0.0,
                                    "thread": None,
                                }
                            )
                            progressed = True
                            continue
                        if all(status.get(d) == "success" for d in dag_deps):
                            deps = {d: outputs[d] for d in m.deps}
                            submitted.add(m.name)
                            tp.submit(_worker, by_name[m.name], deps)
                            progressed = True
                    if len(status) >= len(wanted):
                        break
                    if not progressed or len(submitted) > len(status):
                        done_cv.wait(timeout=1.0)
        ledger.sort(key=lambda e: (e["level"], e["model"]))
        self._last_max_concurrency = concurrency["max"]
        return outputs, ledger

    def retry(
        self,
        sources: Mapping[str, DataFrame],
        ledger: list[dict],
        full_refresh: bool = False,
    ) -> tuple[dict[str, DataFrame], list[dict]]:
        """``dbt retry``: re-run ONLY the models the given ledger left
        unfinished (status error/skipped), reusing every successful
        model's materialized snapshot from the store instead of
        rebuilding it. The returned ledger covers just the retried
        subset; successful models don't even get a builder call."""
        failed = {
            e["model"] for e in ledger if e["status"] in ("error", "skipped")
        }
        if not failed:
            return dict(sources), []
        succeeded = [
            e["model"] for e in ledger if e["status"] == "success"
        ]
        outputs: dict[str, DataFrame] = dict(sources)
        for name in succeeded:
            df = self.store.read(name)
            if df is not None:
                outputs[name] = df
        return self.run(
            outputs, select=failed, full_refresh=full_refresh,
            select_exact=True,
        )

    def ledger_df(self, ledger: list[dict]) -> DataFrame:
        """The run ledger as a DataFrame (dbt run_results.json analog),
        ready to persist as a warehouse table or query directly."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("model", T.StringType()),
                T.StructField("level", T.IntegerType()),
                T.StructField("status", T.StringType()),
                T.StructField("rows_built", T.LongType()),
                T.StructField("incremental", T.BooleanType()),
                T.StructField("duration_s", T.DoubleType()),
                T.StructField("thread", T.StringType()),
                T.StructField("error", T.StringType()),
            ]
        )
        rows = [
            (
                e["model"],
                e["level"],
                e["status"],
                int(e["rows_built"]),
                bool(e["incremental"]),
                float(e["duration_s"]),
                e.get("thread"),
                e.get("error"),
            )
            for e in ledger
        ]
        from product_analytics_spark.qcommon import local_rows_df

        return local_rows_df(self.store.spark, rows, schema)
