"""Attribute py4j round trips to engine call sites (round-13).

Patches py4j's ClientServerConnection.send_command to sample the
Python stack at every round trip, then runs each named key once warm
and once traced, printing per-call-site trip counts and wall time.
The stack is reduced to the innermost frames inside /root/repo so the
report names engine functions, not pyspark plumbing.

Usage:
    python tools/py4j_trace.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import collections
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    from py4j import clientserver

    from product_analytics_spark import cache
    from product_analytics_spark.driver_queries import QUERIES
    from product_analytics_spark.session import get_spark

    spark = get_spark("py4j_trace")
    spark.range(1000).count()

    stats: collections.Counter = collections.Counter()
    wall: collections.defaultdict = collections.defaultdict(float)
    enabled = [False]
    orig = clientserver.ClientServerConnection.send_command

    def traced(self, command):
        if not enabled[0]:
            return orig(self, command)
        frames = traceback.extract_stack(limit=60)
        site = None
        # innermost repo frame that is not this tracer
        for fr in reversed(frames):
            fn = fr.filename
            if fn.startswith(REPO) and "py4j_trace" not in fn:
                site = f"{os.path.relpath(fn, REPO)}:{fr.lineno} {fr.name}"
                break
        if site is None:
            # no engine frame: name the innermost non-py4j frame so
            # the <other> bucket is attributable (pyspark internals,
            # listener/callback threads)
            site = "<other>"
            for fr in reversed(frames):
                fn = fr.filename
                if "py4j" not in fn and "py4j_trace" not in fn:
                    site = f"<lib> {os.path.basename(fn)}:{fr.lineno} {fr.name}"
                    break
        t0 = time.perf_counter()
        try:
            return orig(self, command)
        finally:
            dt = time.perf_counter() - t0
            stats[site] += 1
            wall[site] += dt

    clientserver.ClientServerConnection.send_command = traced
    try:
        for key in args:
            fn = QUERIES[key]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cache.clear_all()
            cache.clear_shared()
            stats.clear()
            wall.clear()
            enabled[0] = True
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall_total = time.time() - t0
            enabled[0] = False
            cache.clear_all()
            cache.clear_shared()
            print(f"\n##### {key}: warm wall {wall_total:.2f}s, "
                  f"{sum(stats.values())} round trips, "
                  f"{sum(wall.values()):.2f}s in send_command")
            rows = sorted(wall.items(), key=lambda kv: -kv[1])[:30]
            for site, w in rows:
                print(f"  {stats[site]:5d} trips {w:7.3f}s  {site}")
    finally:
        clientserver.ClientServerConnection.send_command = orig
    spark.stop()


if __name__ == "__main__":
    main()
