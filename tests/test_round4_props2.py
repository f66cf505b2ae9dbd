"""Second batch of round-4 property tests: the closed-form and
window-kernel claims of q274/q279/q268 executed against brute-force
sequential references.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTLE = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ANCHOR = dt.date(1992, 1, 6)  # a Monday — q274's anchor


def _bd_closed_form(a: int, b: int) -> int:
    """q274's formula over Monday-anchored day numbers a <= b."""

    def f(m: int) -> int:
        return 5 * (m // 7) + min(m % 7, 5)

    return f(b) - f(a)


@given(
    start=st.integers(min_value=0, max_value=5000),
    span=st.integers(min_value=0, max_value=400),
)
@settings(max_examples=50, deadline=None)
def test_business_day_closed_form_matches_enumeration(start, span):
    """bd(a, b) must equal literally counting weekdays in [a, b)."""
    a, b = start, start + span
    brute = sum(
        1
        for m in range(a, b)
        if (_ANCHOR + dt.timedelta(days=m)).weekday() < 5
    )
    assert _bd_closed_form(a, b) == brute, (a, b)


@settings(**_SETTLE)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=90 * 60), min_size=1, max_size=30
    ),
    kinds=st.lists(st.booleans(), min_size=1, max_size=30),
)
def test_velocity_rule_window_matches_brute_force(spark, gaps, kinds):
    """q279's RANGE-frame burst rule (count of purchases in the
    preceding 30 min, inclusive) must equal a brute-force O(n²) scan
    over arbitrary event timings."""
    n = min(len(gaps), len(kinds))
    ts, t = [], 0
    for g in gaps[:n]:
        t += g
        ts.append(t)
    rows = [
        (i, ts[i], bool(kinds[i])) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "event_id int, s long, is_p boolean")
    w = Window.orderBy("s").rangeBetween(-30 * 60, 0)
    got = {
        r["event_id"]: r["ct"]
        for r in df.select(
            "event_id",
            F.when(
                F.col("is_p"), F.count(F.when(F.col("is_p"), 1)).over(w)
            )
            .otherwise(0)
            .alias("ct"),
        ).collect()
    }
    for i in range(n):
        expect = (
            sum(
                1
                for j in range(n)
                if kinds[j] and ts[i] - 30 * 60 <= ts[j] <= ts[i]
            )
            if kinds[i]
            else 0
        )
        assert got[i] == expect, (i, rows)


@settings(**_SETTLE)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    page=st.integers(min_value=1, max_value=20),
    pageno=st.integers(min_value=0, max_value=6),
)
def test_keyset_pagination_reconstructs_offset_slice(spark, keys, page, pageno):
    """q268's cursor walk: page N fetched as key > cursor LIMIT page
    must equal the OFFSET slice for any unique key set."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    ordered = sorted(keys)
    cursor_rows = ordered[: pageno * page]
    cursor = cursor_rows[-1] if cursor_rows else -1
    got = [
        r["k"]
        for r in df.filter(F.col("k") > cursor)
        .orderBy("k")
        .limit(page)
        .collect()
    ]
    assert got == ordered[pageno * page : pageno * page + page]
