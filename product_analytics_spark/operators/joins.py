"""Join operators beyond the built-in equi-join surface.

The reference exercises only LEFT equi-joins (SURVEY.md §2.3;
orders_cleaned.sql:372-373, dim_customer.sql:210-214) — those come
free from ``DataFrame.join``. This module adds the time-series join
Spark lacks as a primitive:

- :func:`asof_join` — for each left row, the latest right row with
  the same key and ``right_ts <= left_ts`` (backward as-of, inclusive
  — the standard market-data / state-at-time-of-event join).

Scale design: the classic formulations are a range join (explodes to
O(|left| x |right per key|) before filtering) or a per-key sort-merge
UDF. Neither survives 100 TB. The union+window form used here does:
one shuffle on the join key, one in-partition sort, zero row
multiplication — ``last(value, ignorenulls=True)`` carries the most
recent right-hand state forward onto each left row. This is also the
streaming-friendly shape (the same plan works over a keyed state
store).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row picks up ``value_cols`` from
    the latest right row of the same key with ``right_ts <= left_ts``
    (inclusive); NULLs when no right row precedes the left row.

    Right rows are first deduplicated to one per (key, ts) — latest
    wins by the order of ``value_cols[0]`` — so the result is
    deterministic even when the right side has same-timestamp rows.

    Output: all left columns + ``{right_ts}{suffix}`` + one
    ``{c}{suffix}`` per value column.
    """
    keys = list(key_cols)
    vals = list(value_cols)

    # One right row per (key, ts): keep the max of the value tuple —
    # any deterministic rule works, it only breaks exact-ts ties.
    r = (
        right.groupBy(*keys, F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*[F.col(c) for c in vals])).alias("_v"))
        .select(
            *keys,
            "_ts",
            *[F.col(f"_v.{c}").alias(f"{c}{suffix}") for c in vals],
        )
        .withColumn("_is_left", F.lit(0))
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_is_left", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts -> inclusive bound.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in vals
    ]
    ts_carried = F.last(
        F.when(F.col("_is_left") == 0, F.col("_ts")), ignorenulls=True
    ).over(w).alias(f"{right_ts}{suffix}")

    filled = u.select(
        *[c for c in left.columns],
        F.col("_is_left"),
        ts_carried,
        *carried,
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")
