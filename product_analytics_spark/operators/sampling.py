"""Deterministic sampling & dataset-split operators.

A training-data pipeline needs reproducible splits: the same document
must land in the same split on every run, on any cluster size, and
after any repartition. Random sampling (``df.sample``) is none of
those — it is seed+partitioning dependent. These operators derive
membership from a **portable content hash** (md5 → 60-bit integer,
``operators.text.portable_hash60``) of a stable key column, so:

- membership is a pure per-row function — no shuffle, no state, no
  driver round-trip; the filter is evaluated map-side at the scan;
- the split survives repartitioning, re-ingestion, and engine swaps
  (DuckDB reproduces the hash bit-for-bit — see
  ``driver_queries._hash60_sql``);
- adding data never reassigns existing keys (hash-threshold, not
  rank-based).

Scale notes (100 TB):
- :func:`with_hash_split` / :func:`hash_sample` are narrow (zero
  shuffles) — they pipeline into whatever follows;
- :func:`stratified_exact_sample` is rank-based (exact per-stratum
  counts) and costs ONE shuffle on the stratum key; both its windows
  share that single shuffle. Use it when exact stratum proportions
  matter (eval sets); use hash_sample when a ±ε per-stratum count is
  fine (training mixes) — the hash form is the 100 TB default;
- skewed strata (one lang with 90% of rows) hit the rank window's
  single-partition-per-stratum limit: the hash form has no such
  bottleneck, which is another reason it is the scale default.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from product_analytics_spark.operators.text import portable_hash60

#: Number of hash buckets the split thresholds quantize into. 10_000
#: gives 0.01% split-fraction resolution while keeping thresholds
#: exact integers (no float boundary ambiguity between engines).
SPLIT_BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS) from a key column.

    The salt decouples this hash from every other md5 use of the same
    key (dedup fingerprints, band hashes), so split membership is
    independent of those.
    """
    return portable_hash60(F.concat_ws("\x1f", key.cast("string"), F.lit(salt))) % F.lit(
        SPLIT_BUCKETS
    )


def with_hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash threshold.

    ``splits`` maps split name → fraction (must sum to ≤ 1.0; any
    remainder falls into the LAST split). Assignment is a pure
    per-row expression: bucket = H(key, salt) mod 10000, then a CASE
    ladder over cumulative thresholds — no shuffle, order-independent,
    stable under data growth.
    """
    splits = dict(splits or {"train": 0.8, "val": 0.1, "test": 0.1})
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")

    b = split_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        thresh = int(round(cum * SPLIT_BUCKETS))
        cond = b < F.lit(thresh)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket is
    below fraction·SPLIT_BUCKETS. Narrow (no shuffle); per-stratum
    counts are binomial around the target — the 100 TB default."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    thresh = int(round(fraction * SPLIT_BUCKETS))
    return df.filter(split_bucket(F.col(key_col), salt) < F.lit(thresh))


def stratified_exact_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fraction: float | Mapping[str, float],
    salt: str = "stratum",
) -> DataFrame:
    """Exact per-stratum sample: the ⌈fraction·|stratum|⌉ rows with the
    smallest hash rank inside each stratum.

    Rank order is the portable hash of the key (content-deterministic,
    uniform), so the selected set is stable across runs/engines. Both
    window functions (rank + stratum size) share ONE shuffle on the
    stratum key. ``fraction`` may be a single float or a per-stratum
    mapping (missing strata default to 0 — dropped).
    """
    from pyspark.sql import Window

    h = portable_hash60(
        F.concat_ws("\x1f", F.col(key_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(stratum_col)
    rank = F.row_number().over(w.orderBy(h.asc(), F.col(key_col).asc()))
    size = F.count(F.lit(1)).over(w)

    if isinstance(fraction, Mapping):
        frac_col = None
        for k, v in fraction.items():
            cond = F.col(stratum_col) == F.lit(k)
            frac_col = (
                F.when(cond, F.lit(float(v)))
                if frac_col is None
                else frac_col.when(cond, F.lit(float(v)))
            )
        frac_col = frac_col.otherwise(F.lit(0.0)) if frac_col is not None else F.lit(0.0)
    else:
        frac_col = F.lit(float(fraction))

    keep = F.ceil(size * frac_col)
    return (
        df.withColumn("_rank", rank)
        .withColumn("_keep", keep)
        .filter(F.col("_rank") <= F.col("_keep"))
        .drop("_rank", "_keep")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sample of exactly ``k`` rows via priority sampling
    (Duffield-Lund-Thorup, JACM 2007): each row gets priority
    w/u for a uniform u derived from the portable content hash of its
    key, and the k highest-priority rows are kept — heavier rows are
    proportionally more likely to win, and the selection is a pure
    function of (key, weight), stable across runs, partitionings, and
    engines.

    Implemented as the k SMALLEST values of u_hat/w with
    u_hat = double(hash + 1): one IEEE cast and one IEEE division,
    both correctly rounded in every engine — deliberately NOT the
    Efraimidis-Spirakis exponential key (-ln(u)/w), whose ln() is
    libm-dependent and measured to differ between engines in the last
    ulp on ~8% of inputs.

    Plan shape: the priority is a narrow per-row expression;
    the top-k is TakeOrderedAndProject (per-partition heaps + driver
    merge of k·|partitions| candidates) — no global sort, no shuffle.
    """
    h = portable_hash60(
        F.concat_ws("\x1f", F.col(key_col).cast("string"), F.lit(salt))
    )
    prio = (h + F.lit(1)).cast("double") / F.col(weight_col).cast("double")
    return (
        df.withColumn("_prio", prio)
        .orderBy(F.col("_prio").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("_prio")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum subsampling to target mixture rates — the "source
    mixing" step of a training-data pipeline (e.g. keep 100% of books,
    30% of web, 5% of logs).

    A row survives iff its hash bucket < rate·SPLIT_BUCKETS for its
    stratum's rate; strata absent from ``rates`` get ``default_rate``.
    Membership is a pure function of (key, salt) — reproducible across
    runs, engines, and repartitioning, and independent of every other
    hash-derived decision (split/dedup) thanks to the salt.

    Plan shape: one CASE ladder over a broadcastable literal map plus
    the portable-hash filter — entirely narrow, evaluated at the scan;
    at 100 TB the dropped rows never leave the mapper. Rates quantize
    to 1/SPLIT_BUCKETS (0.01%) so thresholds are exact integers and no
    float boundary can disagree between engines.
    """
    bucket = split_bucket(F.col(key_col), salt=salt)
    thresh = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    expr = None
    for stratum, rate in sorted(rates.items()):
        t = int(round(rate * SPLIT_BUCKETS))
        cond = F.col(stratum_col) == stratum
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(bucket < thresh)
