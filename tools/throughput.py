"""Concurrent-workload throughput benchmark (QpH-style).

bench.py measures one query at a time — the latency story. This tool
measures the CONCURRENCY story a shared cluster lives with: N worker
threads replay a representative query mix against one SparkSession
(Spark schedules concurrent jobs across its executor pool; with the
FAIR scheduler each job gets an even share instead of FIFO
head-of-line blocking).

Usage:
    python tools/throughput.py [threads] [rounds]

Prints one JSON line:
    {"metric": "queries_per_hour", "value": ..., "threads": N,
     "rounds": R, "n_queries": total, "wall_seconds": ...,
     "serial_estimate_seconds": ..., "speedup_vs_serial": ...}

The speedup_vs_serial column is the headline: how much wall time
concurrent submission recovers vs running the same mix serially
(inter-job parallelism on top of intra-job parallelism).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_analytics_spark import cache
from product_analytics_spark.driver_queries import QUERIES
from product_analytics_spark.session import get_spark

# A representative mix: scan-agg, star join, window, dedup, text,
# percentile, TPC-H — no streaming/stateful queries (they manage their
# own landing dirs and conf, unsafe to interleave concurrently).
MIX = [
    "q01_scan_project",
    "q02_filter_predicates",
    "q10_group_metrics",
    "q12_multi_join_dim",
    "q23_sessionize",
    "q34_topk_per_group",
    "q41_percentiles",
    "q57_funnel_conversion",
    "q81_rank_family",
    "q250_tpch_q1_pricing_summary",
    "q252_tpch_q5_local_supplier",
    "q256_tpch_q13_customer_distribution",
]


def main() -> None:
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # FAIR must be a SparkConf at context creation (it is NOT a job-local
    # property; round-4 set it via setLocalProperty, which is a no-op).
    # Within one pool FAIR mode still runs jobs FIFO, so each worker
    # thread below pins its own pool; the pools are DECLARED in
    # tools/fairscheduler.xml rather than created on demand, because
    # on-demand pools log a "pool not configured" warning per thread
    # (noise in the stdout tail the bench driver parses).
    spark = get_spark(
        "throughput",
        extra_conf={
            "spark.scheduler.mode": "FAIR",
            "spark.scheduler.allocation.file": os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "fairscheduler.xml"
            ),
        },
    )
    if spark.sparkContext.getConf().get("spark.scheduler.mode") != "FAIR":
        print("warning: session pre-existed with FIFO scheduler", file=sys.stderr)

    # Warm each query once (codegen + scan caches) and record the
    # serial per-query time for the speedup baseline.
    serial: dict[str, float] = {}
    for name in MIX:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in MIX:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        serial[name] = time.time() - t0
    cache.clear_all()

    work: list[str] = [name for _ in range(rounds) for name in MIX]
    lock = threading.Lock()
    idx = {"i": 0}
    errors: list[str] = []

    def worker(pool: str) -> None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        while True:
            with lock:
                if idx["i"] >= len(work):
                    return
                name = work[idx["i"]]
                idx["i"] += 1
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # pragma: no cover - diagnostics
                with lock:
                    errors.append(f"{name}: {exc}")

    t0 = time.time()
    pool = [
        threading.Thread(target=worker, args=(f"w{i}",)) for i in range(threads)
    ]
    for t in pool:
        t.start()
    for t in pool:
        t.join()
    wall = time.time() - t0
    cache.clear_all()

    serial_estimate = sum(serial.values()) * rounds
    payload = {
        "metric": "queries_per_hour",
        "value": round(len(work) / wall * 3600, 1),
        "threads": threads,
        "rounds": rounds,
        "n_queries": len(work),
        "wall_seconds": round(wall, 2),
        "serial_estimate_seconds": round(serial_estimate, 2),
        "speedup_vs_serial": round(serial_estimate / wall, 2),
        "errors": len(errors),
    }
    print(json.dumps(payload, separators=(",", ":")))
    if errors:
        for e in errors[:5]:
            print("ERROR:", e[:200], file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
