"""Distribution-statistics operators: moments, mode, equi-depth bins.

[EXTENSION] engine-surface operators (SURVEY.md §2.12 X43-X45). The
common thread is cross-engine determinism at scale:

- Float aggregation is order-dependent, and Spark's partition/merge
  order varies with cluster size — so every moment here is built from
  EXACT integer power sums (value quantized to integer units, summed
  as DECIMAL(38,0)), with the float divisions applied once, in a fixed
  order, to the exact sums. The same discipline as kmeans_update
  (operators/similarity.py) and the winsorized stats (q62).
- Mode needs an explicit tie-break (count desc, value asc) or two
  engines legitimately disagree on equal counts.
- Equi-depth binning derives its boundaries from exact percentiles
  (F.percentile = DuckDB quantile_cont, both linear-interpolation) and
  assigns rows by comparison against those boundaries — ties land in
  the same bin (unlike ntile, whose positional tie-splitting needs a
  total order: a global sort at 100 TB). Boundaries are driver scalars
  (a k-element array), the same class of collect as a probe vector.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_moments(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group n / mean / population variance / stddev / skewness
    from exact integer power sums.

    q = round(value * scale) as long; S1 = sum q, S2 = sum q^2,
    S3 = sum q^3 as DECIMAL(38,0) (order-independent integer sums; q^3
    of a 10^7-cent value is ~10^21, far inside decimal(38,0), and
    10^12 rows of those stay inside it too). The float results divide
    the exact sums in one fixed sequence — bit-reproducible on any
    cluster size and in the DuckDB oracle, which mirrors the exact
    same expression order. sqrt is IEEE correctly-rounded everywhere.

    Plan: ONE hash-agg shuffle of |groups| x 4 partials; everything
    else is scalar arithmetic on the aggregated row.
    """
    g = list(group_cols)
    q = F.round(F.col(value_col).cast("double") * F.lit(float(scale))).cast("long")
    qd = q.cast("decimal(38,0)")
    agg = df.select(*g, qd.alias("_q")).groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_q")).alias("_s1"),
        F.sum(F.col("_q") * F.col("_q")).alias("_s2"),
        F.sum(F.col("_q") * F.col("_q") * F.col("_q")).alias("_s3"),
    )
    sc = float(scale)
    nd = F.col("n").cast("double")
    m1 = F.col("_s1").cast("double") / F.lit(sc) / nd
    m2 = F.col("_s2").cast("double") / F.lit(sc * sc) / nd
    m3 = F.col("_s3").cast("double") / F.lit(sc * sc * sc) / nd
    var_pop = m2 - m1 * m1
    std = F.sqrt(var_pop)
    skew = F.when(
        std > 0, (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / (std * std * std)
    ).otherwise(F.lit(0.0))
    return agg.select(
        *g,
        "n",
        m1.alias("mean"),
        var_pop.alias("var_pop"),
        std.alias("stddev_pop"),
        skew.alias("skewness"),
    )


def mode_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Most frequent value per group, deterministic tie-break
    (count DESC, value ASC).

    Two-level aggregation: (group, value) counts first — map-side
    partial aggregation compresses the shuffle to distinct pairs —
    then a per-group ``max_by`` on the (count, inverted-order value)
    tuple would need an order-reversible value; a row_number window
    over the compact counts relation (|distinct pairs| rows, not
    |rows|) keeps any value type. Returns (group..., mode_value,
    mode_count).
    """
    g = list(group_cols)
    counts = df.groupBy(*g, F.col(value_col).alias("mode_value")).agg(
        F.count(F.lit(1)).alias("mode_count")
    )
    w = Window.partitionBy(*g).orderBy(F.desc("mode_count"), F.asc("mode_value"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    key_col: str | None = None,
) -> DataFrame:
    """Equi-depth (quantile) binning: boundaries at the k/n_bins exact
    percentiles, rows assigned by comparison, per-bin count/min/max.

    vs ntile: ntile needs a TOTAL order (global sort — one partition
    at 100 TB) and splits equal values across bins by position.
    Percentile-boundary binning shuffles nothing for the assignment
    (a CASE ladder folded into the scan) and puts ties in one bin.
    The boundary fetch is a driver scalar (n_bins-1 doubles), the
    same class as a probe-vector ``first()``. At 100 TB swap the
    exact percentile for ``percentile_approx`` — the operator shape
    is unchanged.

    Returns (bin INT 1-based, n_rows, min_v, max_v) ordered by bin.
    """
    fracs = [k / n_bins for k in range(1, n_bins)]
    bounds_row = df.agg(
        F.percentile(F.col(value_col).cast("double"), F.array(*[F.lit(f) for f in fracs])).alias("b")
    ).first()
    bounds = list(bounds_row[0])
    v = F.col(value_col).cast("double")
    bin_c = F.lit(n_bins)
    for k in range(n_bins - 1, 0, -1):
        bin_c = F.when(v <= F.lit(bounds[k - 1]), F.lit(k)).otherwise(bin_c)
    return (
        df.select(bin_c.cast("int").alias("bin"), v.alias("_v"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
    )


def grouped_topk_concat(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    label_col: str,
    k: int = 5,
    sep: str = ",",
) -> DataFrame:
    """Per-group ordered top-k labels as one concatenated string
    (LISTAGG/STRING_AGG with ORDER BY — deterministic because the
    (order desc, tiebreak asc) ranking is total).

    Plan: one window shuffle ranks within groups; the filtered top-k
    rows (k x |groups|) aggregate with ``sort_array`` over
    (rank, label) structs so the concat order is explicit, never
    collect_list arrival order. Returns (group..., top_labels,
    n_in_group).
    """
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    top = ranked.filter(F.col("_rn") <= k)
    return top.groupBy(*g).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("_rn").alias("r"), F.col(label_col).alias("l")))),
                lambda s: s["l"],
            ),
            sep,
        ).alias("top_labels"),
        F.count(F.lit(1)).alias("n_in_group"),
    )


def grouped_linreg(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple (OLS) linear regression y = slope*x + intercept
    plus R², from EXACT integer power sums — the q91 correlation
    pattern extended to the full regression readout.

    ``x_col``/``y_col`` must already be exact integer (long) columns
    (quantize money to cents first). Per-row products fit BIGINT; their
    sums accumulate split into hi/lo BIGINT halves (codegen-friendly
    primitive sums — DECIMAL aggregation drops off the vectorized
    path), reassembled exactly in DECIMAL(38,0) on the |groups|-row
    result. Only the final fixed-order double formulas touch floating
    point, so the output is bit-reproducible on any cluster size and
    in any engine that mirrors the same expression order:

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        intercept = (Sy - slope*Sx) / n
        r2        = (n*Sxy - Sx*Sy)² / ((n*Sxx - Sx²) * (n*Syy - Sy²))

    Plan: ONE hash-agg shuffle of |groups| x 9 long partials.
    Returns (group..., n, slope, intercept, r2) — intercept in the
    same integer unit as y.

    Built-in ``regr_slope``/``regr_intercept`` are float running
    aggregates (merge-order-dependent low bits across cluster sizes);
    this form trades 9 long sums for bit-stable output.
    """
    g = list(group_cols)
    SPLIT = 1 << 20

    def hi(c: F.Column) -> F.Column:
        return (c / F.lit(SPLIT)).cast("long")

    def lo(c: F.Column) -> F.Column:
        return c % F.lit(SPLIT)

    x = F.col("_x")
    y = F.col("_y")
    s = (
        df.select(*g, F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_x").alias("sx_l"),
            F.sum("_y").alias("sy_l"),
            F.sum(hi(x * y)).alias("sxy_h"),
            F.sum(lo(x * y)).alias("sxy_l"),
            F.sum(hi(x * x)).alias("sxx_h"),
            F.sum(lo(x * x)).alias("sxx_l"),
            F.sum(hi(y * y)).alias("syy_h"),
            F.sum(lo(y * y)).alias("syy_l"),
        )
    )

    def reassemble(h: str, l: str) -> F.Column:
        return (
            F.col(h).cast("decimal(38,0)") * F.lit(SPLIT)
            + F.col(l).cast("decimal(38,0)")
        ).cast("double")

    nd = F.col("n").cast("double")
    sx = F.col("sx_l").cast("double")
    sy = F.col("sy_l").cast("double")
    sxy = reassemble("sxy_h", "sxy_l")
    sxx = reassemble("sxx_h", "sxx_l")
    syy = reassemble("syy_h", "syy_l")
    num = nd * sxy - sx * sy
    den = nd * sxx - sx * sx
    slope = num / den
    return s.select(
        *g,
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
        ((num * num) / (den * (nd * syy - sy * sy))).alias("r2"),
    )
