"""Focused tests for the round-12 one-job multiset probes in qcommon.

``multiset_equal`` / ``multiset_diff_counts`` replace the multi-action
``exceptAll``+``count`` probes inside the Delta-lifecycle certs; these
tests pin their semantics against the exceptAll reference, including
the edge cases bag-equality cares about (duplicates, NULLs, NaN).
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

from product_analytics_spark.qcommon import (
    multiset_diff_counts,
    multiset_equal,
)

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _ref_diff(a, b):
    return a.exceptAll(b).count(), b.exceptAll(a).count()


CASES = [
    # (a_rows, b_rows, label)
    ([], [], "both empty"),
    ([(1, 1.0, "x")], [], "b empty"),
    ([(1, 1.0, "x")], [(1, 1.0, "x")], "equal singleton"),
    (
        [(1, 1.0, "x"), (1, 1.0, "x")],
        [(1, 1.0, "x")],
        "duplicate multiplicity differs",
    ),
    (
        [(1, None, None), (2, float("nan"), "y")],
        [(2, float("nan"), "y"), (1, None, None)],
        "nulls and NaN, order shuffled",
    ),
    (
        [(1, None, None)],
        [(1, None, "z")],
        "null vs non-null cell",
    ),
    (
        [(1, 1.0, "x"), (2, 2.0, "y"), (2, 2.0, "y"), (3, 3.0, "z")],
        [(2, 2.0, "y"), (1, 1.0, "x"), (4, 4.0, "w")],
        "overlapping bags",
    ),
]


def test_multiset_equal_matches_exceptall(spark):
    for a_rows, b_rows, label in CASES:
        a, b = _df(spark, a_rows), _df(spark, b_rows)
        only_a, only_b = _ref_diff(a, b)
        expected = only_a == 0 and only_b == 0
        assert multiset_equal(a, b) is expected, label


def test_multiset_diff_counts_matches_exceptall(spark):
    for a_rows, b_rows, label in CASES:
        a, b = _df(spark, a_rows), _df(spark, b_rows)
        assert multiset_diff_counts(a, b) == _ref_diff(a, b), label


def test_multiset_mismatch_flag_matches_exceptall(spark):
    """The single-row flag frame (round-12 batch 8: folded into
    combined probe actions) must be NULL exactly when the exceptAll
    reference says the bags are equal, and survive the
    combine_single_rows union+max fold unchanged."""
    from pyspark.sql import functions as F

    from product_analytics_spark.qcommon import (
        combine_single_rows,
        multiset_mismatch_flag,
    )

    for a_rows, b_rows, label in CASES:
        a, b = _df(spark, a_rows), _df(spark, b_rows)
        only_a, only_b = _ref_diff(a, b)
        expected_equal = only_a == 0 and only_b == 0
        flag = multiset_mismatch_flag(a, b, "__bad").collect()[0]["__bad"]
        assert (flag is None) is expected_equal, label
        # folded alongside another single-row aggregate (the certs'
        # combined-probe shape) the flag must come through unchanged
        row = combine_single_rows(
            multiset_mismatch_flag(a, b, "__bad"),
            a.agg(F.count(F.lit(1)).alias("__n_a")),
        ).collect()[0]
        assert (row["__bad"] is None) is expected_equal, label
        assert row["__n_a"] == len(a_rows), label


def test_local_rows_df_matches_classic_path(spark):
    """local_rows_df (Arrow) must be value-identical to the classic
    createDataFrame(list, schema) path across the type matrix the
    certs actually use — ints/strings/doubles with NULLs, NaN,
    booleans, dates, timestamps, decimals, arrays."""
    import datetime as dt
    from decimal import Decimal

    from product_analytics_spark.qcommon import local_rows_df

    schema = (
        "i int, l long, s string, d double, b boolean, "
        "dt date, ts timestamp, dec decimal(10,2), arr array<int>"
    )
    rows = [
        (
            1,
            2**40,
            "x",
            1.5,
            True,
            dt.date(2020, 1, 2),
            dt.datetime(2020, 1, 2, 3, 4, 5),
            Decimal("12.34"),
            [1, 2],
        ),
        (None, None, None, None, None, None, None, None, None),
        (
            -3,
            7,
            "",
            float("nan"),
            False,
            dt.date(1970, 1, 1),
            dt.datetime(1970, 1, 1),
            Decimal("0.00"),
            [],
        ),
    ]
    fast = local_rows_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.schema == slow.schema
    import math

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return repr(v)

    f_rows = [[norm(v) for v in r] for r in fast.collect()]
    s_rows = [[norm(v) for v in r] for r in slow.collect()]
    assert f_rows == s_rows


def test_local_rows_df_empty(spark):
    from product_analytics_spark.qcommon import local_rows_df

    df = local_rows_df(spark, [], "a int, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_nan_groups_equal(spark):
    # exceptAll treats NaN == NaN; the grouped probe must too.
    nan = float("nan")
    a = _df(spark, [(1, nan, "x")])
    b = _df(spark, [(1, nan, "x")])
    assert math.isnan(a.collect()[0]["v"])
    assert multiset_equal(a, b)
    assert multiset_diff_counts(a, b) == (0, 0)


def test_widen_if_narrow_value_identity_and_noop(spark, tmp_path):
    """widen_if_narrow must (a) preserve rows exactly, (b) widen a
    narrow scan to defaultParallelism, and (c) return the SAME plan
    (no Exchange) when the input is already wide enough."""
    from pyspark.sql import functions as F

    from product_analytics_spark.qcommon import widen_if_narrow

    p = str(tmp_path / "one_file")
    spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    ).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen_if_narrow(narrow)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert sorted(r["k"] for r in wide.collect()) == list(range(10_000))

    already = narrow.repartition(
        spark.sparkContext.defaultParallelism
    )
    # wide-enough input: returned UNCHANGED (same object, no second
    # Exchange stacked on top)
    assert widen_if_narrow(already) is already
