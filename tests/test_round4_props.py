"""Property tests for the round-4 kernels (q214-q261 families).

Each test pits a distributed/windowed formulation against an
independent sequential reference implementation — the properties the
docstrings CLAIM (reflection identity ≡ clamp recurrence, allocation
conservation, min-plus relaxation ≡ Dijkstra on non-negative weights,
content-defined chunking re-synchronizes after edits, SPRT crossing ≡
sequential replay) are executed, not asserted rhetorically.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTLE = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------ reflection balance


@settings(**_SETTLE)
@given(
    deltas=st.lists(
        st.integers(min_value=-500, max_value=500), min_size=1, max_size=40
    )
)
def test_reflection_identity_matches_sequential_clamp(spark, deltas):
    """level_t = cumsum_t − min(0, runmin(cumsum)_t) must equal the
    sequential recurrence level_t = max(0, level_{t−1} + δ_t) for ANY
    delta sequence (q220's identity) — including the shortfall."""
    rows = [(i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "i int, d long")
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    staged = df.select(
        "i", F.sum("d").over(wc).alias("cum")
    ).select(
        "i", "cum", F.min(F.least(F.col("cum"), F.lit(0))).over(
            Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("rm")
    )
    got = {
        r["i"]: r["cum"] - r["rm"]
        for r in staged.collect()
    }
    level = 0
    for i, d in enumerate(deltas):
        level = max(0, level + d)
        assert got[i] == level, (i, deltas)


# ------------------------------------------- allocation conservation


@settings(**_SETTLE)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12
    ),
    budget=st.integers(min_value=0, max_value=100_000),
)
def test_largest_remainder_conserves_budget(spark, weights, budget):
    """q214's allocation: Σ per-group budgets == global budget exactly,
    and each allocation is within 1 of the real-valued quota."""
    rows = [(f"g{i}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "g string, w long")
    wtot = Window.partitionBy()
    wr = Window.orderBy(F.desc("rem"), F.asc("g"))
    alloc = (
        df.select("g", "w", F.sum("w").over(wtot).alias("t"))
        .select(
            "g",
            "w",
            "t",
            F.expr(f"CAST({budget} * w div t AS BIGINT)").alias("fl"),
            F.expr(f"CAST({budget} * w % t AS BIGINT)").alias("rem"),
        )
        .select(
            "g",
            "w",
            "t",
            "fl",
            F.row_number().over(wr).alias("rn"),
            (F.lit(budget) - F.sum("fl").over(wtot)).alias("left"),
        )
        .select(
            "g",
            "w",
            "t",
            (F.col("fl") + F.when(F.col("rn") <= F.col("left"), 1).otherwise(0)).alias(
                "a"
            ),
        )
    )
    out = alloc.collect()
    assert sum(r["a"] for r in out) == budget
    total = sum(weights)
    for r in out:
        quota = budget * r["w"] / total
        assert quota - 1 < r["a"] < quota + 1 or abs(r["a"] - quota) <= 1


# ------------------------------------------------- Bellman-Ford ≡ Dijkstra


@settings(**_SETTLE)
@given(
    n=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_bellman_ford_matches_dijkstra(spark, n, seed):
    """graph.bellman_ford with rounds ≥ n−1 must equal single-source
    Dijkstra on any non-negative-weight digraph (min-plus fixpoint)."""
    from product_analytics_spark.operators import graph

    # Deterministic pseudo-random digraph from the seed (no RNG in
    # test body — hypothesis drives variety through the seed).
    edges = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            h = int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:4], 16
            )
            if h % 4 == 0:  # ~25% density
                edges.append((i, j, 1 + h % 9))
    if not edges:
        edges = [(0, 1, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    src = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in graph.bellman_ford(edf, src, rounds=n - 1).collect()
    }
    # Dijkstra reference.
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got == dist, (edges,)


# --------------------------------------- content-defined chunk resync


def _cdc_chunks(text: str, w: int = 8) -> list[str]:
    """Sequential reference for q215's chunking: boundary at position
    p (1-based) iff p == 1 or md5(text[p-1:p-1+w]) starts with '0'."""
    starts = [1]
    for p in range(2, len(text) - w + 2):
        if hashlib.md5(text[p - 1 : p - 1 + w].encode()).hexdigest()[0] == "0":
            starts.append(p)
    chunks = []
    for i, s in enumerate(starts):
        e = starts[i + 1] - 1 if i + 1 < len(starts) else len(text)
        chunks.append(text[s - 1 : e])
    return chunks


@settings(max_examples=12, deadline=None)
@given(
    base=st.text(alphabet="abcdef ", min_size=40, max_size=200),
    ins=st.text(alphabet="xyz", min_size=1, max_size=5),
    pos=st.integers(min_value=0, max_value=30),
)
def test_content_defined_chunking_resynchronizes(base, ins, pos):
    """Insert text near the front: every chunk that starts at least one
    full window AFTER the edit point must reappear verbatim in the
    edited document's chunk set — the re-synchronization property that
    makes chunk-level dedup survive edits (fixed-size blocking has no
    such property)."""
    pos = min(pos, len(base))
    edited = base[:pos] + ins + base[pos:]
    w = 8
    orig_chunks = _cdc_chunks(base, w)
    new_chunks = set(_cdc_chunks(edited, w))
    # Chunks fully after the edit's influence zone (start > pos + w).
    offset = 1
    for ch in orig_chunks:
        start = offset
        offset += len(ch)
        if start > pos + w and len(ch) >= 1:
            assert ch in new_chunks, (base, ins, pos, ch)


# -------------------------------------------------- SPRT replay


@settings(**_SETTLE)
@given(
    outcomes=st.lists(st.booleans(), min_size=1, max_size=60),
)
def test_sprt_first_crossing_matches_replay(spark, outcomes):
    """q238's windowed formulation: first boundary crossing over the
    integer-scaled cumulative LLR equals a plain sequential replay."""
    from product_analytics_spark.driver_queries_ext30 import (
        SPRT_K_FAILURE,
        SPRT_K_SUCCESS,
        SPRT_LOWER,
        SPRT_UPPER,
    )

    rows = [(i, bool(o)) for i, o in enumerate(outcomes)]
    df = spark.createDataFrame(rows, "i int, o boolean")
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("i")
    staged = df.select(
        F.sum(
            F.when(F.col("o"), SPRT_K_SUCCESS).otherwise(SPRT_K_FAILURE)
        )
        .over(wc)
        .alias("llr"),
        F.row_number().over(wn).alias("n"),
    )
    crossing = staged.filter(
        (F.col("llr") >= SPRT_UPPER) | (F.col("llr") <= SPRT_LOWER)
    ).agg(F.min("n").alias("n"))
    got = crossing.collect()[0]["n"]
    llr, expect = 0, None
    for i, o in enumerate(outcomes):
        llr += SPRT_K_SUCCESS if o else SPRT_K_FAILURE
        if llr >= SPRT_UPPER or llr <= SPRT_LOWER:
            expect = i + 1
            break
    assert got == expect
