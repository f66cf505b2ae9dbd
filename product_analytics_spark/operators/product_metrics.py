"""Product-analytics metrics over an event stream: conversion funnels
and cohort retention.

[EXTENSION] operators (SURVEY.md §2.11 X30/X31). The reference repo is
a *product analytics* dbt project (its models feed customer-behavior
dashboards — reference: models/gold/customers/dim_customer.sql builds
RFM/lifetime metrics); funnels and retention matrices are the two
canonical event-stream metrics such a platform serves, so the engine
provides them as first-class operators. Everything is built-in
expression work — one shuffle on the user key does the heavy lifting
in both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_step_gap_hours: int | None = None,
) -> DataFrame:
    """Strict-order conversion funnel: for each step k, the number of
    users who completed steps 1..k in order, each step strictly after
    the previously matched event (ties broken by ``tiebreak_col``) and
    — when ``max_step_gap_hours`` is set — within that window of the
    previous step's event.

    Matching is the deterministic greedy walk over the user's events
    sorted by (ts, tiebreak): the earliest event completing the next
    needed step advances the funnel. This is identical to the iterated
    min-chain definition (step k's match = minimum event after step
    k-1's match satisfying the window), which is how the SQL oracle
    states it.

    Plan shape: ONE shuffle on the user key. Events are filtered to
    funnel steps at the scan (predicate pushdown on ``event_col``),
    collected per user as a sorted struct array, and folded to a depth
    with ``F.aggregate`` — a linear JVM-side pass, no window function,
    no per-step join. Per-step counts then aggregate |steps| rows and
    broadcast-join the step dimension so zero-conversion steps still
    report 0.

    Scale: the per-user array holds only funnel-step events; at 100 TB
    partition-level skew is bounded by the hottest single user, which
    AQE's skew splitting cannot subdivide — for adversarial users
    (bots with millions of events) pre-cap with a per-(user, step)
    ``min_by`` pass or a date-bounded funnel window. The fold beats
    the k-way self-join formulation by k-1 shuffles.

    Returns (step_idx INT 1-based, step STRING, n_users BIGINT).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    step_idx: Column = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        step_idx = F.when(F.col(event_col) == s, F.lit(len(steps) - 1 - i)).otherwise(step_idx)

    seq = (
        events.filter(F.col(event_col).isin(steps))
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tb"),
                step_idx.alias("step"),
            ).alias("_e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("_e")).alias("_seq"))
    )

    gap = (
        F.expr(f"INTERVAL {int(max_step_gap_hours)} HOURS")
        if max_step_gap_hours is not None
        else None
    )
    init = F.struct(
        F.lit(0).alias("depth"), F.lit("1900-01-01").cast("timestamp").alias("ts")
    )

    def advance(acc: Column, e: Column) -> Column:
        # Sorted order guarantees e is strictly after the matched
        # event (tiebreak_col is unique), so only the step match and
        # the window need checking here; the oracle's (ts, tiebreak) >
        # prev tuple comparison encodes the same order constraint.
        matched = e["step"] == acc["depth"]
        if gap is not None:
            matched = matched & ((acc["depth"] == 0) | (e["ts"] <= acc["ts"] + gap))
        return F.when(
            matched,
            F.struct((acc["depth"] + 1).alias("depth"), e["ts"].alias("ts")),
        ).otherwise(acc)

    # Stage the fold ONCE: the explode expression references depth
    # twice (guard + sequence bound); staged as a projection attribute
    # it is computed once per user instead of the whole fold subtree
    # being duplicated — which also halves the generated-code size the
    # first run must Janino-compile (cold-run latency, measured ~1s).
    depth = F.aggregate(F.col("_seq"), init, advance)["depth"]
    staged = seq.select(depth.alias("_depth"))
    reached = staged.select(
        F.explode(
            F.when(
                F.col("_depth") > 0, F.sequence(F.lit(1), F.col("_depth"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("step_idx")
    )
    counts = reached.groupBy("step_idx").agg(F.count(F.lit(1)).alias("_n"))

    spark = events.sparkSession
    # Literal-array dimension, not createDataFrame: a local-collection
    # DataFrame costs a driver->JVM RDD round trip (~1s on first use in
    # a session) where plan-time literals cost nothing.
    steps_dim = spark.range(1).select(
        F.posexplode(F.array(*[F.lit(s) for s in steps])).alias("_i", "step")
    ).select((F.col("_i") + 1).cast("int").alias("step_idx"), "step")
    return (
        steps_dim.join(F.broadcast(counts), "step_idx", "left")
        .select(
            "step_idx",
            "step",
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_users"),
        )
    )


def cohort_retention(
    events: DataFrame,
    cohort_event: str,
    activity_event: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week
    of their FIRST ``cohort_event`` (e.g. signup); a cohort member is
    retained in week-offset k if they performed ``activity_event``
    during cohort_week + k. Activity before the cohort week is
    ignored; users who never emit ``cohort_event`` are excluded.

    Plan shape: ONE shuffle on the user key computes both the cohort
    week (min of cohort-event weeks) and the distinct activity weeks
    (``collect_set`` — skips non-matching rows via a NULL-producing
    CASE, and a user's distinct weeks are at most the calendar span,
    so the array is tiny). Exploding the set yields one row per
    (user, active week); the (cohort, offset) aggregation then counts
    users directly — no DISTINCT over the raw event stream. Cohort
    sizes reuse the same per-user relation (Catalyst reuses the
    shuffle) and broadcast into the final join at any scale because
    |cohorts| is calendar-bounded.

    Returns (cohort_week TIMESTAMP, week_offset INT, n_active BIGINT,
    n_cohort BIGINT, retention_rate DOUBLE).
    """
    wk = F.date_trunc("week", F.col(ts_col))
    g = (
        events.filter(F.col(event_col).isin([cohort_event, activity_event]))
        .select(F.col(user_col), F.col(event_col), wk.alias("_wk"))
        .groupBy(user_col)
        .agg(
            F.min(F.when(F.col(event_col) == cohort_event, F.col("_wk"))).alias(
                "_cohort"
            ),
            F.collect_set(
                F.when(F.col(event_col) == activity_event, F.col("_wk"))
            ).alias("_wks"),
        )
        .filter(F.col("_cohort").isNotNull())
    )
    active = (
        g.select(F.col("_cohort"), F.explode("_wks").alias("_wk"))
        .filter(F.col("_wk") >= F.col("_cohort"))
    )
    counts = active.groupBy(
        F.col("_cohort"),
        (F.datediff(F.col("_wk"), F.col("_cohort")) / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    sizes = g.groupBy("_cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        counts.join(F.broadcast(sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
                "retention_rate"
            ),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Next-event transition matrix: for every consecutive event pair
    within a user's (ts, tiebreak)-ordered stream, count
    (event_type -> next_event_type) and its probability among all
    transitions leaving event_type.

    Plan: one window shuffle on the user key computes ``lead``; the
    (from, to) counts hash-agg to |event_types|^2 rows, after which
    the per-source totals are a window over that tiny relation (no
    second data-scale shuffle). The probability is ONE double division
    of exact counts — bit-reproducible. This is the Markov-chain view
    of a product funnel: where users actually go next, not whether
    they complete a prescribed path (funnel_counts).
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    nxt = events.select(
        F.col(event_col).alias("event_type"),
        F.lead(event_col).over(w).alias("next_event_type"),
    ).filter(F.col("next_event_type").isNotNull())
    counts = nxt.groupBy("event_type", "next_event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_event_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double")
        ).alias("p_transition"),
    )


def first_touch_attribution(
    events: DataFrame,
    touch_type: str,
    conversion_type: str,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch attribution: every conversion event attributes to
    the user's EARLIEST touch event strictly before it and within
    ``window_days``. Unattributed conversions are kept with NULL touch
    columns.

    Plan: the conversion rows define per-user lookback intervals
    [ts - window, ts); touches are points. The match is the keyed
    interval join (operators/joins.py:interval_join with key_cols) —
    a hash equi-join on (user, time-bucket) plus the exact range
    predicate, never an all-pairs product. The earliest touch per
    conversion is one min(struct(ts, id)) hash-agg; conversions then
    left-join the attribution relation (same key, broadcastable when
    conversions are rare).

    Returns (conv_event_id, user_id, conv_ts, first_touch_ts,
    first_touch_event_id, attributed).
    """
    from product_analytics_spark.operators.joins import interval_join

    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col(user_col),
        F.col(id_col).alias("conv_event_id"),
        F.col(ts_col).alias("conv_ts"),
        (F.col(ts_col) - F.expr(f"INTERVAL {int(window_days)} DAYS")).alias("_w_start"),
        F.col(ts_col).alias("_w_end"),
    )
    touch = events.filter(F.col("event_type") == touch_type).select(
        F.col(user_col),
        F.col(ts_col).alias("_touch_ts"),
        F.col(id_col).alias("_touch_id"),
    )
    matched = interval_join(
        points=touch,
        intervals=conv,
        point_ts="_touch_ts",
        start_col="_w_start",
        end_col="_w_end",
        bucket="1 week",
        key_cols=(user_col,),
    )
    first = matched.groupBy("conv_event_id").agg(
        F.min(F.struct(F.col("_touch_ts").alias("ts"), F.col("_touch_id").alias("id"))).alias("_ft")
    )
    out = conv.join(first, "conv_event_id", "left")
    return out.select(
        "conv_event_id",
        F.col(user_col),
        "conv_ts",
        F.col("_ft.ts").alias("first_touch_ts"),
        F.col("_ft.id").alias("first_touch_event_id"),
        F.col("_ft").isNotNull().alias("attributed"),
    )


def rolling_distinct_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily active users + rolling ``window_days``-day distinct users
    (DAU/WAU) per observed day.

    Exact distinct over a sliding window cannot be composed from daily
    distinct counts (users overlap across days), and a range-window
    COUNT(DISTINCT) needs a global sort. The scale shape used here:
    reduce to distinct (user, day) pairs first (one hash-agg — the
    shuffle moves |user-days|, not |events|), then each user-day
    CONTRIBUTES itself to the ``window_days`` following days via a
    map-side explode, and one more hash-agg counts distinct users per
    target day. Cost is window_days x |user-days| exploded rows of
    16 bytes — at 100 TB swap the exact distinct for HLL sketches
    (approx_count_distinct partial merge) with the identical shape.
    Only observed days are reported (broadcast semi-join against the
    day dimension derived from the data).
    """
    day = F.date_trunc("day", F.col(ts_col))
    ud = events.select(day.alias("_d"), F.col(user_col).alias("_u")).distinct()
    dau = ud.groupBy(F.col("_d").alias("day")).agg(
        F.countDistinct("_u").alias("dau")
    )
    targets = F.sequence(
        F.col("_d"),
        F.col("_d") + F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
        F.expr("INTERVAL 1 DAY"),
    )
    contrib = ud.select(F.explode(targets).alias("day"), F.col("_u"))
    observed = dau.select("day")
    rolling = (
        contrib.join(F.broadcast(observed), "day")
        .groupBy("day")
        .agg(F.countDistinct("_u").alias(f"rolling_{int(window_days)}d"))
    )
    return dau.join(rolling, "day")


def daily_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
) -> DataFrame:
    """X73: gaps-and-islands — longest run of CONSECUTIVE active days
    per user (the engagement-streak metric). Classic islands trick:
    within a user's sorted distinct days, ``day_number - row_number``
    is constant exactly along a consecutive run, so it is the island
    key; two hash-aggs finish the job.

    Shuffle economics: the distinct() and the row_number window both
    key on the user — ONE user-keyed exchange serves both (Catalyst
    reuses it), then the island/user aggs reduce partials map-side.
    At 100 TB the state per user is |active days| ≤ a few thousand
    ints; no skew concern (per-user data is bounded by the calendar).
    The island anchor is integer day arithmetic (datediff from a fixed
    epoch), portable to any SQL engine."""
    days = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("day", F.col(ts_col)).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        (
            F.datediff(F.col("d").cast("date"), F.lit(epoch).cast("date"))
            - F.row_number().over(w)
        ).alias("anchor"),
    )
    runs = islands.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("best_streak"),
        F.sum("run_len").alias("n_active_days"),
    )


def debounce(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gap_seconds: int = 5,
) -> DataFrame:
    """X74: temporal dedup — flag events that repeat the same key
    within ``min_gap_seconds`` of the PREVIOUS event (double-clicks,
    retry storms, at-least-once delivery echoes). Adds a boolean
    ``kept``: true when the event is the key's first or arrived at
    least the gap after its predecessor.

    Lag-based (each event compares to its immediate predecessor), not
    chain-based (compare to last KEPT event): lag is one window over
    one key shuffle and catches the burst patterns above; the chain
    form needs a sequential scan per key (session-style fold) and is
    what ``operators/windows.py`` sessionization provides when needed.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # NTZ→LTZ identity (UTC session)
    prev = F.lag(us).over(w)
    return events.withColumn(
        "kept",
        prev.isNull() | (us - prev >= F.lit(min_gap_seconds * 1_000_000)),
    )


def cooccurrence_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """X75: market-basket association between event types — for each
    unordered type pair, how many users did both, and the lift
    ``P(a,b) / (P(a)·P(b))`` = ``(n_both · n_users) / (n_a · n_b)``.
    Log-free (no PMI), so the only float op is one fixed-order
    multiply/divide on exact integers — bit-reproducible anywhere.

    Plan: distinct (user, type) pairs — ONE user-keyed shuffle — then
    a self-join on the user key (co-located: same partitioning, AQE
    reuses the exchange) producing |types|² candidates per user;
    per-type totals are a tiny relation broadcast back onto the pair
    aggregate. At 100 TB the self-join fan-out is bounded by
    |event_types| (dozens), not data size."""
    ut = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).distinct()
    totals = ut.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    n_users = ut.select("u").distinct().count()  # driver scalar
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "u")
        .where(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(totals.withColumnsRenamed({"t": "type_a", "n_t": "n_a"})), "type_a"
        )
        .join(
            F.broadcast(totals.withColumnsRenamed({"t": "type_b", "n_t": "n_b"})), "type_b"
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                (F.col("n_both").cast("double") * F.lit(n_users))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )
