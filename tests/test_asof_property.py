"""Property test: asof_join (both directions, with/without tolerance)
must agree with a brute-force per-row reference on randomized inputs —
duplicate timestamps, missing keys, empty sides included."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from product_analytics_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("lid", T.IntegerType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("r_ts", T.TimestampType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _reference(left, right, direction, tol_hours):
    """Brute force: dedup right per (k, ts) keeping max v (the
    operator's documented tie rule), then nearest-in-direction within
    tolerance per left row."""
    dedup: dict[tuple[int, dt.datetime], int] = {}
    for k, ts, v in right:
        key = (k, ts)
        if key not in dedup or v > dedup[key]:
            dedup[key] = v
    out = {}
    for lid, (k, ts) in enumerate(left):
        if direction == "backward":
            cands = [(rts, v) for (rk, rts), v in dedup.items() if rk == k and rts <= ts]
            best = max(cands, default=None)
        else:
            cands = [(rts, v) for (rk, rts), v in dedup.items() if rk == k and rts >= ts]
            best = min(cands, default=None)
        if best is not None and tol_hours is not None:
            if abs((best[0] - ts).total_seconds()) > tol_hours * 3600:
                best = None
        out[lid] = best
    return out


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 48)), min_size=0, max_size=8
    ),
    right=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 48), st.integers(0, 100)),
        min_size=0,
        max_size=8,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 5]),
)
def test_asof_matches_reference(spark, left, right, direction, tol):
    left_rows = [(i, k, BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(left)]
    right_rows = [(k, BASE + dt.timedelta(hours=h), v) for k, h, v in right]
    ldf = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    rdf = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    got = {
        r.lid: (None if r.r_ts_asof is None else (r.r_ts_asof, r.v_asof))
        for r in asof_join(
            ldf,
            rdf,
            key_cols=("k",),
            left_ts="ts",
            right_ts="r_ts",
            value_cols=("v",),
            direction=direction,
            tolerance=None if tol is None else f"{tol} HOURS",
        ).collect()
    }
    want = _reference(
        [(k, BASE + dt.timedelta(hours=h)) for k, h in left], right_rows, direction, tol
    )
    assert got == want
