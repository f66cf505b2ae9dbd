"""Generated-column partition pruning (delta.io "use generated
columns for partition pruning"): a predicate on a data column prunes
through any partition column generated from it. SPARK-FREE — the
planner is pure log metadata.
"""

from __future__ import annotations

import json
from datetime import date, datetime

from product_analytics_spark.sources.delta_log import DeltaSnapshot


def _snap(gen_expr: str, part_col: str = "day", pvs=None):
    fields = [
        {"name": "ts", "type": "timestamp", "nullable": True,
         "metadata": {}},
        {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        {"name": part_col, "type": "date", "nullable": True,
         "metadata": {"delta.generationExpression": gen_expr}},
    ]
    files = {}
    for i, pv in enumerate(pvs or []):
        files[f"f{i}.parquet"] = {
            "path": f"f{i}.parquet",
            "partitionValues": {part_col: pv},
            "size": 1,
            "dataChange": True,
        }
    return DeltaSnapshot(
        version=0,
        metadata={
            "schemaString": json.dumps({"type": "struct",
                                        "fields": fields}),
            "partitionColumns": [part_col],
            "configuration": {},
        },
        files=files,
    )


def test_sources_recognize_forms():
    for expr, want in (
        ("CAST(ts AS DATE)", ("ts", "date", None)),
        ("cast(ts as date)", ("ts", "date", None)),
        ("to_date(ts)", ("ts", "date", None)),
        ("year(ts)", ("ts", "year", None)),
        ("month(ts)", ("ts", "month", None)),
        ("date_trunc('month', ts)", ("ts", "trunc_month", None)),
        ("substring(ts, 1, 7)", ("ts", "prefix", 7)),
        ("left(ts, 4)", ("ts", "prefix", 4)),
    ):
        s = _snap(expr)
        assert s.generated_partition_sources() == {"day": want}, expr
    # unrecognized expressions derive NOTHING (conservative)
    assert _snap("ts + 1").generated_partition_sources() == {}


def test_range_predicate_prunes_date_partitions():
    s = _snap("CAST(ts AS DATE)",
              pvs=["2024-01-05", "2024-02-10", "2024-03-15"])
    kept = s.plan_files(
        [("ts", ">=", datetime(2024, 2, 1)),
         ("ts", "<", datetime(2024, 3, 1))]
    )
    assert kept == ["f1.parquet"]
    # string literals work too
    kept2 = s.plan_files([("ts", "=", "2024-03-15 11:22:33")])
    assert kept2 == ["f2.parquet"]


def test_strict_ops_keep_boundary_partition():
    """c > v must NOT prune the partition containing v — f(c) >= f(v)
    is the sound derivation (rows later the same day satisfy c > v)."""
    s = _snap("CAST(ts AS DATE)", pvs=["2024-01-05", "2024-01-06"])
    kept = s.plan_files([("ts", ">", datetime(2024, 1, 5, 23, 0))])
    assert kept == ["f0.parquet", "f1.parquet"]


def test_month_is_equality_only():
    s = _snap("month(ts)", part_col="m", pvs=["1", "6", "12"])
    # equality derives m = 6
    kept = s.plan_files([("ts", "=", datetime(2024, 6, 15))])
    assert kept == ["f1.parquet"]
    # ranges derive NOTHING through a wrapping generation
    kept2 = s.plan_files([("ts", ">=", datetime(2024, 6, 1))])
    assert kept2 == ["f0.parquet", "f1.parquet", "f2.parquet"]


def test_prefix_generation_prunes_string_ranges():
    s = _snap("substring(ts, 1, 7)", part_col="ym",
              pvs=["2024-01", "2024-02", "2024-03"])
    kept = s.plan_files([("ts", "between",
                          ("2024-02-01", "2024-02-29"))])
    assert kept == ["f1.parquet"]


def test_between_and_year():
    s = _snap("year(ts)", part_col="y", pvs=["2022", "2023", "2024"])
    kept = s.plan_files(
        [("ts", "between", (date(2023, 2, 1), date(2023, 11, 30)))]
    )
    assert kept == ["f1.parquet"]


def test_explicit_partition_conjuncts_unchanged():
    s = _snap("CAST(ts AS DATE)", pvs=["2024-01-05", "2024-02-10"])
    kept = s.plan_files([("day", "=", date(2024, 2, 10))])
    assert kept == ["f1.parquet"]
