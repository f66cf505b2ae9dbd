"""Driver-side Python profiler for one query (round-12 optimization).

The job-level profiler (profile_query.py) showed wall >> sum(job time)
for the lifecycle/streaming certs — the cost is driver-side Python
(log I/O, py4j, streaming machinery), invisible to the event log.
This tool runs the key once warm, then cProfiles the second run and
prints the top functions by cumulative time.

Usage:
    python tools/pyprofile_query.py [sf_dir] q437_delta_tail_stream [...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    from product_analytics_spark import cache
    from product_analytics_spark.driver_queries import QUERIES
    from product_analytics_spark.session import get_spark

    spark = get_spark("pyprofile")

    for key in args:
        fn = QUERIES[key]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cache.clear_all()
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.time() - t0
        cache.clear_all()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(45)
        print(f"\n##### {key}: warm wall {wall:.2f}s")
        print(s.getvalue())


if __name__ == "__main__":
    main()
