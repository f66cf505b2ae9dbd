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
multiplication — a single ``last(payload_struct, ignorenulls=True)``
carries the most recent right-hand row (timestamp + every value
column together, so the output never mixes columns from different
right rows) forward onto each left row. This is also the
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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: each left row picks up ``value_cols`` from the
    nearest right row of the same key — ``backward`` (default) takes
    the latest right with ``right_ts <= left_ts``, ``forward`` the
    earliest right with ``right_ts >= left_ts`` (both inclusive);
    NULLs when no such right row exists. ``tolerance`` (a SQL interval
    string, e.g. ``"72 hours"``) bounds how far the match may sit from
    the left timestamp — a match outside the window NULLs out, exactly
    like pandas ``merge_asof(tolerance=...)``.

    Right rows are first deduplicated to one per (key, ts) — latest
    wins by the order of ``value_cols[0]`` — so the result is
    deterministic even when the right side has same-timestamp rows.

    Both directions are the same one-shuffle union+window plan; the
    forward variant just orders the in-partition sort descending, and
    tolerance is a scalar predicate on the carried payload (no extra
    join, no row multiplication).

    Output: all left columns + ``{right_ts}{suffix}`` + one
    ``{c}{suffix}`` per value column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    keys = list(key_cols)
    vals = list(value_cols)

    # Internal working columns must not clobber user columns named
    # _ts/_is_left/etc. — uniquify against both sides' schemas.
    taken = set(left.columns) | set(right.columns)

    def _internal(base: str) -> str:
        name = base
        while name in taken:
            name += "_"
        taken.add(name)
        return name

    ts_c = _internal("_ts")
    flag_c = _internal("_is_left")
    pay_c = _internal("_payload")
    vtmp_c = _internal("_v")

    # One right row per (key, ts): keep the max of the value tuple —
    # any deterministic rule works, it only breaks exact-ts ties.
    # ALL carried outputs (right ts + every value col) travel in ONE
    # struct: a single last(ignorenulls=True) then guarantees every
    # *_asof column comes from the SAME right row. Carrying columns
    # separately would conflate a NULL value inside the nearest right
    # row with "no right row", silently mixing values from an older
    # right row with the newer row's timestamp.
    r = (
        right.groupBy(*keys, F.col(right_ts).alias(ts_c))
        .agg(F.max(F.struct(*[F.col(c) for c in vals])).alias(vtmp_c))
        .select(
            *keys,
            ts_c,
            F.struct(
                F.col(ts_c).alias("ts"),
                *[F.col(f"{vtmp_c}.{c}").alias(f"v{i}") for i, c in enumerate(vals)],
            ).alias(pay_c),
        )
        .withColumn(flag_c, F.lit(0))
    )
    l = left.withColumn(ts_c, F.col(left_ts)).withColumn(flag_c, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)  # left rows: payload NULL

    # Right rows sort before left rows at equal ts -> inclusive bound.
    # backward walks time ascending (carry the latest preceding right);
    # forward walks descending (carry the earliest following right).
    ts_order = F.col(ts_c).asc() if direction == "backward" else F.col(ts_c).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(flag_c).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(pay_c, ignorenulls=True).over(w)

    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            ok = carried["ts"] >= F.col(ts_c) - bound
        else:
            ok = carried["ts"] <= F.col(ts_c) + bound
        carried = F.when(ok, carried)

    filled = u.select(
        *[c for c in left.columns],
        F.col(flag_c),
        carried[f"ts"].alias(f"{right_ts}{suffix}"),
        *[carried[f"v{i}"].alias(f"{c}{suffix}") for i, c in enumerate(vals)],
    )
    return filled.filter(F.col(flag_c) == 1).drop(flag_c)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 week",
    broadcast_intervals: bool = False,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Join point rows into every interval that contains them:
    ``start <= point_ts < end`` (half-open, the event-time convention).

    Spark has no interval-join primitive for batch (stream-stream
    interval joins exist in Structured Streaming); the naive
    formulation is a BroadcastNestedLoopJoin — O(|points|·|intervals|)
    comparisons — which is exactly what this operator avoids.

    Two physical strategies:

    - ``broadcast_intervals=True``: the interval side is dimension-
      sized (campaign windows, maintenance windows) — broadcast it and
      let the range predicate run map-side. Still nested-loop, but
      |intervals| is small and bounded; zero shuffles.
    - default (scale path): quantize time into fixed buckets. Each
      point maps to exactly ONE bucket; each interval explodes to
      every bucket it overlaps [floor(start), floor(end - 1ns)]. The
      join becomes a hash equi-join on the bucket key, and the exact
      range predicate filters within matched buckets. Each
      (point, interval) pair can meet in at most one bucket — the
      point's — so no post-join dedup is needed. Cost is
      O(|points| + Σ interval_spans/bucket) shuffled rows; pick
      ``bucket`` ≈ the median interval length so intervals explode to
      a handful of rows each. Skewed hot buckets split via AQE.

    ``key_cols`` adds equi-join keys alongside the time condition
    (e.g. per-user attribution windows): the hash join runs on
    (keys..., bucket), so hot buckets are further spread by key.

    Column hygiene: output = all point columns + all interval columns;
    callers ensure disjoint names beyond ``key_cols`` (join-key style).
    """
    keys = list(key_cols)
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) < F.col(end_col)
    )
    if broadcast_intervals:
        cond = exact
        for k in keys:
            cond = cond & (points[k] == intervals[k])
        joined = points.join(F.broadcast(intervals), on=cond, how="inner")
        if keys:  # de-duplicate the key columns like an equi-join would
            joined = joined.drop(*[intervals[k] for k in keys])
        return joined

    n_buckets_expr = F.sequence(
        F.window(F.col(start_col), bucket).getField("start"),
        # end is exclusive: the last covered bucket is the one holding
        # end - 1 microsecond (timestamps are microsecond-grained).
        F.window(
            F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"), bucket
        ).getField("start"),
        F.expr(f"INTERVAL {bucket}"),
    )
    iv = intervals.withColumn("_bucket", F.explode(n_buckets_expr))
    pt = points.withColumn(
        "_bucket", F.window(F.col(point_ts), bucket).getField("start")
    )
    return (
        pt.join(iv, on=[*keys, "_bucket"], how="inner").filter(exact).drop("_bucket")
    )
