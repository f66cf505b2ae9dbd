"""Warm per-key timing harness (round-12 optimization measurement).

Runs each named key N+1 times through the noop sink in ONE session and
prints every rep's wall plus the min-of-warm — the same-session
before/after evidence the bench's run-to-run drift would otherwise
swamp. Also counts Spark jobs per warm run via the status tracker.

Usage:
    python tools/time_keys.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = int(os.environ.get("TIME_KEYS_REPS", "3"))

    from product_analytics_spark import cache
    from product_analytics_spark.driver_queries import QUERIES
    from product_analytics_spark.session import get_spark

    spark = get_spark("time_keys")
    spark.range(1000).count()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for key in args:
        fn = QUERIES[key]
        walls = []
        jobs = []
        for i in range(reps):
            grp = f"tk_{key}_{i}"
            spark.sparkContext.setJobGroup(grp, key)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            spark.sparkContext.setJobGroup(None, None)
            cache.clear_all()
            cache.clear_shared()
            walls.append(round(w, 2))
            # deterministic per-rep Spark job count (the noise-immune
            # currency): async engine threads inherit the group via
            # InheritableThread, so overlapped jobs are counted too.
            jobs.append(len(tracker.getJobIdsForGroup(grp) or []))
        out[key] = {
            "walls": walls, "min_warm": min(walls[1:]), "jobs": jobs,
        }
        print(key, walls, "min_warm", min(walls[1:]), "jobs", jobs,
              flush=True)
    print("JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
