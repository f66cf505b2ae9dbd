"""Multi-column Z-ORDER (Morton) clustering key for the write path.

Reference mapping: ``OPTIMIZE ... ZORDER BY (order_id, customer_id,
order_date)`` (reference orders_cleaned.sql:15, customers_latest.sql:7).
A composite lexicographic sort — what ``cluster_by`` alone gives —
clusters only the FIRST key: every file spans nearly the full range of
the 2nd/3rd keys, so min/max row-group stats prune nothing for
predicates on them. Interleaving the bits of all keys (the Morton /
Z-order curve, q108's arithmetic) makes file ranges hyper-rectangles:
each file covers ~2^-k of EVERY key's range, and data skipping works
on all of them.

Normalization: each column is first mapped to a ``bits``-wide integer
with ``width_bucket`` over its (min, max) — equal-WIDTH buckets, one
metadata aggregate per write. Delta's OPTIMIZE uses sampled
range-partition ids (equal-DEPTH) instead, which is the skew-robust
upgrade at 100 TB: swap ``_bucketize`` for approxQuantile boundaries
if the cluster keys are heavily skewed; the interleave itself is
unchanged. Timestamp/date columns participate via their underlying
epoch value.

The z-value is computed as a pure Spark integer expression (bit
extract = div/mod, bit place = multiply — q108's engine-portable
idiom), so it runs at scan speed inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default per-column resolution: 8 bits x 3 cols = 24-bit z-values —
#: 16M distinct cells, far beyond file granularity at any table size.
DEFAULT_BITS = 8


def _value_expr(df: DataFrame, col: str) -> Column:
    dtype = df.schema[col].dataType.simpleString()
    if dtype.startswith("timestamp"):
        # unix_micros requires TIMESTAMP (ltz); NTZ columns cast first —
        # the session is pinned UTC so the mapping is order-preserving
        return F.unix_micros(F.col(col).cast("timestamp"))
    if dtype == "date":
        return F.unix_date(F.col(col))
    return F.col(col)


def _depth_bucket_expr(v: Column, bits: int, bounds: list[float]) -> Column:
    """Equal-DEPTH lane expression from precomputed quantile
    boundaries: bucket = count of boundaries <= v. The fold over the
    literal boundary array is value-identical whether expressed as
    ``aggregate`` or ``size(filter(...))``; the array itself is built
    with ONE ``F.lit(list)`` call (round-12: the per-element
    ``F.lit`` form paid ~2^bits py4j round trips per column,
    ~0.6 s of driver time per write)."""
    import math

    n = 1 << bits
    if not bounds:
        return F.lit(0).cast("long")
    if all(math.isfinite(b) for b in bounds):
        # ONE py4j call: the SQL parser builds the whole array
        # literal JVM-side. repr() is Python's shortest round-trip
        # form and Double.parseDouble recovers the identical bits,
        # so the literal values match the per-element form exactly.
        barr = F.expr(
            "array(" + ",".join(f"{b!r}D" for b in bounds) + ")"
        )
    else:  # non-finite boundary: fall back to per-element literals
        barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(v.cast("double") >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    # Rescale onto the FULL [0, 2^bits) lane: heavy repetition
    # dedups the boundary list (few distinct values ⇒ few distinct
    # bucket ids), and unscaled those ids live only in the lane's
    # LOW bits — the interleave then puts every x-distinction below
    # every y-bit and z-locality on x is lost. Spreading the ids
    # across the lane keeps each key's distinctions in high bits
    # proportional to its realized cardinality.
    scaled = (bucket.cast("long") * F.lit(n - 1)) / F.lit(len(bounds))
    return F.least(F.lit(n - 1), scaled.cast("long"))


def _width_bucket_expr(v: Column, bits: int, lo, hi) -> Column:
    """Equal-WIDTH lane expression from a precomputed (min, max)."""
    n = 1 << bits
    if lo is None or hi is None or lo == hi:
        return F.lit(0).cast("long")
    b = F.width_bucket(v, F.lit(lo), F.lit(hi), F.lit(n)) - 1
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), b)).cast("long")


def _bucketize(
    df: DataFrame, col: str, bits: int, equal_depth: bool = False
) -> Column:
    """Order-preserving map of ``col`` onto [0, 2^bits).

    Equal-WIDTH (default): width_bucket over the observed (min, max) —
    one tiny driver-side aggregate per write. Right for roughly
    uniform keys (dense surrogate ids, timestamps).

    Equal-DEPTH (``equal_depth=True``): approxQuantile boundaries, so
    each lane holds ~equal ROW mass — Delta's sampled range-id scheme.
    Right for skewed keys, where equal-width collapses the dense
    region into one lane and z-locality (hence file skipping) inside
    it is lost. Bucket lookup is a fold over the literal boundary
    array (pure codegen, O(2^bits) comparisons per row — keep bits
    modest for very wide configs).

    Single-column doorway kept for callers outside the write path;
    ``morton_zvalue`` computes every column's stats in ONE pass."""
    v = _value_expr(df, col)
    n = 1 << bits
    if equal_depth:
        qs = [i / n for i in range(1, n)]
        stats = df.select(v.cast("double").alias("_zq"))
        bounds = sorted(
            set(stats.approxQuantile("_zq", qs, 1.0 / (4 * n)))
        )
        return _depth_bucket_expr(v, bits, bounds)
    lo, hi = df.select(F.min(v), F.max(v)).first()
    return _width_bucket_expr(v, bits, lo, hi)


def morton_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    equal_depth: bool = False,
) -> Column:
    """The interleaved z-value column for ``cols`` (2+ columns, ~8
    bits each): bit b of column i lands at z-bit ``b*len(cols)+i``.
    ``equal_depth`` switches lane normalization to quantile range ids
    (see ``_bucketize``) for skewed cluster keys."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns; use cluster_by for 1")
    k = len(cols)
    # ONE stats pass for every lane (round-12, guide §1.2): the
    # per-column _bucketize form ran one quantile/min-max JOB per
    # column. approxQuantile on a column LIST builds the same
    # per-column sketches in a single scan (identical per-column
    # results — multipleApproxQuantiles is the one-column path's
    # implementation too), and the width stats fuse into one
    # aggregate row.
    vals = [_value_expr(df, c) for c in cols]
    n = 1 << bits
    if equal_depth:
        qs = [i / n for i in range(1, n)]
        names = [f"_zq{i}" for i in range(k)]
        all_bounds = df.select(
            *[v.cast("double").alias(a) for v, a in zip(vals, names)]
        ).approxQuantile(names, qs, 1.0 / (4 * n))
        buckets = [
            _depth_bucket_expr(v, bits, sorted(set(b)))
            for v, b in zip(vals, all_bounds)
        ]
    else:
        row = df.select(
            *[m for v in vals for m in (F.min(v), F.max(v))]
        ).first()
        buckets = [
            _width_bucket_expr(v, bits, row[2 * i], row[2 * i + 1])
            for i, v in enumerate(vals)
        ]
    z = F.lit(0).cast("long")
    for i, bucket in enumerate(buckets):
        for b in range(bits):
            bit = (bucket / F.lit(1 << b)).cast("long") % 2
            z = z + bit * F.lit(1 << (b * k + i))
    return z


# ------------------------------------------------------- skew advisor

#: range/IQR ratio above which a key counts as skewed: a uniform key
#: scores ~2 ((hi-lo)/(p75-p25) = 1/0.5), mild structure stays < 8,
#: heavy tails score orders of magnitude higher because the tail
#: stretches the range while the IQR stays pinned to the dense mass.
SKEW_RATIO_THRESHOLD = 8.0


def key_skew_ratio(df: DataFrame, col: str) -> float:
    """(max − min) / (p75 − p25) from one approxQuantile pass — the
    cheap, sampling-robust skew signal for layout decisions. inf for
    degenerate IQR (half the rows share one value: maximally skewed
    for equal-width lanes)."""
    v = _value_expr(df, col).cast("double").alias("_zs")
    lo, p25, p75, hi = df.select(v).approxQuantile(
        "_zs", [0.0, 0.25, 0.75, 1.0], 0.01
    )
    rng, iqr = hi - lo, p75 - p25
    if rng <= 0:
        return 1.0
    if iqr <= 0:
        return float("inf")
    return rng / (2.0 * iqr)


def choose_equal_depth(
    df: DataFrame,
    cols: Sequence[str],
    threshold: float = SKEW_RATIO_THRESHOLD,
) -> bool:
    """Auto-select the lane scheme for a Z-ORDER write (VERDICT r8
    item 7): equal-WIDTH lanes collapse a skewed key's dense region
    into one lane — z-locality inside it is lost and file skipping on
    that key decays to nothing — so ANY skewed key flips the whole
    write to equal-DEPTH (quantile) lanes. Uniform keys lose nothing
    under equal-depth (lanes coincide with width), so the flip is
    one-way safe; equal-width stays the default because it needs only
    a min/max aggregate instead of a quantile sketch.

    One multi-column approxQuantile pass (round-12, guide §1.2): the
    per-column key_skew_ratio form ran one quantile job per key; the
    fused sketch computes the identical per-column quartiles in a
    single scan."""
    names = [f"_zs{i}" for i in range(len(cols))]
    quarts = df.select(
        *[
            _value_expr(df, c).cast("double").alias(a)
            for c, a in zip(cols, names)
        ]
    ).approxQuantile(names, [0.0, 0.25, 0.75, 1.0], 0.01)
    for lo, p25, p75, hi in quarts:
        rng, iqr = hi - lo, p75 - p25
        if rng <= 0:
            continue
        ratio = float("inf") if iqr <= 0 else rng / (2.0 * iqr)
        if ratio >= threshold:
            return True
    return False
