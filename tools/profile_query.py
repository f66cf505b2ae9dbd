"""Per-query job-level profiler (round-12 optimization measurement).

Runs one or more driver queries through the noop sink with the Spark
event log enabled, then parses the event log and prints, for the
SECOND (warm) run of each query: every Spark job with its wall time,
stage count, task count, and the callsite/description — so the cost
of multi-action queries (the Delta-lifecycle certs are dozens of tiny
actions) can be attributed to specific engine calls instead of guessed.

Usage:
    python tools/profile_query.py [sf_dir] q438_check_constraints [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from product_analytics_spark import cache
    from product_analytics_spark.driver_queries import QUERIES
    from product_analytics_spark.session import get_spark

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": EVDIR,
        },
    )
    sc = spark.sparkContext

    marks: dict[str, tuple[float, float]] = {}
    for key in args:
        fn = QUERIES[key]
        # warm run (codegen/JIT/page cache) — excluded from the window
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cache.clear_all()
        t0 = time.time()
        sc.setJobGroup(key, "")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup(None, None)  # type: ignore[arg-type]
        t1 = time.time()
        cache.clear_all()
        marks[key] = (t0, t1)
        print(f"== {key}: warm wall {t1 - t0:.2f}s", flush=True)

    # flush the event log
    spark.stop()

    ev_files = []
    for root, _dirs, files in os.walk(EVDIR):
        ev_files.extend(
            os.path.join(root, f) for f in files if "appstatus" not in f
        )
    events = []
    for p in ev_files:
        with open(p) as f:
            for line in f:
                try:
                    events.append(json.loads(line))
                except ValueError:
                    pass

    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, int] = {}
    stage_names: dict[int, str] = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            props = e.get("Properties") or {}
            jobs[e["Job ID"]] = {
                "start": e["Submission Time"],
                "stages": len(e.get("Stage IDs", [])),
                "stage_ids": e.get("Stage IDs", []),
                "group": props.get("spark.jobGroup.id"),
                "desc": (props.get("spark.job.description") or "")[:90],
                "site": (props.get("callSite.short") or "")[:90],
            }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e.get("Stage Info", {})
            stage_tasks[si.get("Stage ID")] = si.get("Number of Tasks", 0)
            stage_names[si.get("Stage ID")] = si.get("Stage Name", "")[:100]

    for key, (t0, t1) in marks.items():
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("group") == key and "end" in j
        ]
        tot = sum(j["end"] - j["start"] for _, j in sel) / 1000.0
        print(f"\n### {key}: {len(sel)} jobs, sum job time {tot:.2f}s, "
              f"wall {t1 - t0:.2f}s (gap = driver/python/log I/O)")
        for jid, j in sel:
            dur = (j["end"] - j["start"]) / 1000.0
            ntask = sum(stage_tasks.get(s, 0) for s in j["stage_ids"])
            label = j["site"] or j["desc"]
            print(f"  job {jid:4d}  {dur:7.3f}s  stages={j['stages']:2d} "
                  f"tasks={ntask:4d}  {label}")
            if dur >= 0.2:
                for s in j["stage_ids"]:
                    if s in stage_names:
                        print(f"        stage {s}: tasks="
                              f"{stage_tasks.get(s, 0)} {stage_names[s]}")


if __name__ == "__main__":
    main()
