"""Physical-plan audit across the whole driver-query surface.

Explains every ``queries()`` entry at sf0.001 and tallies the plan
nodes that matter at 100 TB — exchanges (shuffles), joins by strategy,
sorts, whole-stage-codegen spans, Python boundaries, top-k operators,
and scan pushdown — into ``PLAN_AUDIT.json`` next to this script.

This is the quantified form of SCALE.md's claims: the per-query rows
show where every shuffle is, that no query contains a cartesian
product / nested-loop join / row-at-a-time Python eval, and that the
Python (Arrow) boundary appears only in the declared operators.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, "/root/repo")

MARKERS = {
    "exchanges": "Exchange hashpartitioning",
    "range_exchanges": "Exchange rangepartitioning",
    "single_exchanges": "Exchange SinglePartition",
    "reused_exchanges": "ReusedExchange",
    "broadcast_exchanges": "BroadcastExchange",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "sort_merge_joins": "SortMergeJoin",
    "shuffled_hash_joins": "ShuffledHashJoin",
    "nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian_products": "CartesianProduct",
    "sorts": "Sort [",
    "codegen_spans": "*(",
    "take_ordered_topk": "TakeOrderedAndProject",
    "window_ops": "Window",
    "arrow_python": "MapInPandas",
    "row_python": "BatchEvalPython",
    "pushed_filters": "PushedFilters: [I",  # non-empty filter list
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from product_analytics_spark import cache
    from product_analytics_spark.driver_queries import QUERIES
    from product_analytics_spark.session import get_spark

    spark = get_spark("plan-audit")
    rows: dict[str, dict[str, int]] = {}
    for name, fn in QUERIES.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            # simple mode: node arguments inline (hashpartitioning,
            # PushedFilters, *(n) codegen ids) — one marker per node.
            fn(spark, sf_dir).explain()
        cache.clear_all()
        p = buf.getvalue()
        rows[name] = {k: p.count(m) for k, m in MARKERS.items()}

    summary = {
        "n_queries": len(rows),
        "totals": {
            k: sum(r[k] for r in rows.values()) for k in MARKERS
        },
        "queries_with_cartesian_or_nested_loop": sorted(
            n
            for n, r in rows.items()
            if r["cartesian_products"] or r["nested_loop_joins"]
        ),
        "queries_with_row_at_a_time_python": sorted(
            n for n, r in rows.items() if r["row_python"]
        ),
        "queries_with_arrow_python": sorted(
            n for n, r in rows.items() if r["arrow_python"]
        ),
        "max_exchanges": max(
            ((r["exchanges"], n) for n, r in rows.items()), default=(0, "")
        ),
    }
    out = {"sf_dir": sf_dir, "summary": summary, "queries": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PLAN_AUDIT.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
