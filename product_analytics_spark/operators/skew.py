"""Skew-resilient aggregation: salted two-stage group-by.

A plain ``groupBy(key).agg(...)`` shuffles every row of a hot key to
one reducer; at 100 TB a single key holding 1% of the data pins 1 TB
on one task. AQE's skew-join splitting does not help *aggregations* —
the standard remedy is salting: group on ``(key, salt)`` first (the
hot key's rows spread over ``n_salts`` reducers), then re-group the
per-salt partials on ``key`` alone (|keys|·n_salts rows — tiny).

The result is bit-identical to the direct aggregation for any
decomposable aggregate. This module implements the decompositions:

=========  ==========================================
requested  two-stage computation
=========  ==========================================
sum        sum of per-salt sums
count      sum of per-salt counts
min / max  min/max of per-salt mins/maxes
avg        sum(per-salt sums) / sum(per-salt counts)
=========  ==========================================

(`count distinct` is NOT salt-decomposable this way — use the
two-level ``groupBy(key, value)`` → ``groupBy(key)`` expansion or
HLL sketches instead; see SCALE.md.)

Note Spark's hash aggregation already does map-side partial
aggregation, which handles *moderate* skew; salting matters when a
hot key's partials still overwhelm one reducer — i.e. when
|rows per hot key| per map task is large enough that the reduce-side
merge, not the map side, is the bottleneck. The operator exists so
the pipeline author can flip one switch without rewriting the agg.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = ("sum", "count", "min", "max", "avg")


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation, bit-identical to the direct form.

    ``aggs`` maps output column → (function, input column) with
    function in {sum, count, min, max, avg}. The salt is derived from
    a uniform hash of the full row's monotonically-varying part — here
    ``spark_partition_id()`` + a per-row counter is unnecessary: any
    per-row expression that spreads a hot key works, and
    ``pmod(xxhash64(all input cols), n_salts)`` is deterministic for
    the same row content, keeping the operator pure (no rand()).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for name, (fn, _col) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(f"{name}: unsupported salted aggregate {fn!r}")

    in_cols = sorted({c for _fn, c in aggs.values()})
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in in_cols]), F.lit(n_salts))

    # Stage 1: partial aggregates per (keys, salt).
    partials = []
    for name, (fn, col) in aggs.items():
        if fn == "sum":
            partials.append(F.sum(col).alias(f"_s_{name}"))
        elif fn == "count":
            partials.append(F.count(col).alias(f"_s_{name}"))
        elif fn == "min":
            partials.append(F.min(col).alias(f"_s_{name}"))
        elif fn == "max":
            partials.append(F.max(col).alias(f"_s_{name}"))
        elif fn == "avg":
            partials.append(F.sum(col).alias(f"_s_{name}"))
            partials.append(F.count(col).alias(f"_c_{name}"))
    stage1 = df.groupBy(*keys, salt.alias("_salt")).agg(*partials)

    # Stage 2: merge partials per keys.
    finals = []
    for name, (fn, _col) in aggs.items():
        if fn == "sum":
            finals.append(F.sum(f"_s_{name}").alias(name))
        elif fn == "count":
            finals.append(F.sum(f"_s_{name}").alias(name))
        elif fn == "min":
            finals.append(F.min(f"_s_{name}").alias(name))
        elif fn == "max":
            finals.append(F.max(f"_s_{name}").alias(name))
        elif fn == "avg":
            finals.append(
                (F.sum(f"_s_{name}") / F.sum(f"_c_{name}")).alias(name)
            )
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    fact_salt: F.Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: replicate the (small) dim side across
    ``n_salts`` salt values and join the fact side on
    ``(key, salt)`` — a hot join key's rows spread over ``n_salts``
    reducers instead of pinning one.

    ``fact_salt`` must be a DETERMINISTIC integer expression in
    [0, n_salts) computed from fact columns (e.g. ``pmod`` of a
    high-cardinality id) — NOT rand(): retries/speculative tasks must
    re-derive the same salt or rows silently drop/duplicate under
    task re-execution. Result is row-identical to the plain join.

    When to use which: broadcast the dim if it fits (no shuffle at
    all); AQE skew-join split handles sort-merge skew at runtime;
    salting is the static remedy when the dim is too big to broadcast
    AND the hot keys are known/stable. Replication multiplies the dim
    ``n_salts``×: at 100 TB keep n_salts modest (4-16) and salt only
    the hot-key subset (split-union) if the dim is large."""
    keys = [on] if isinstance(on, str) else list(on)
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    fact_s = fact.withColumn("_salt", fact_salt.cast("int"))
    joined = fact_s.join(dim_rep, [*keys, "_salt"], how)
    return joined.drop("_salt")
