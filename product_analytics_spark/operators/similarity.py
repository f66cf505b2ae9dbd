"""Vector-similarity operators over ``array<float>`` embedding columns.

[EXTENSION] operators (SURVEY.md §2.11 X3): brute-force cosine top-k
as the exact baseline, plus an LSH-bucketed variant as the 100 TB
scale path. All vector math uses built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python in the hot loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sum — stays in codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _probe_lit(probe: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in probe])


def cosine_topk(
    df: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_scale: int | None = 4,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a probe vector.

    Plan: one projection computing sim (codegen'd array math), then
    TakeOrderedAndProject — Spark's distributed top-k keeps k rows per
    partition and merges on the driver, so there is NO global sort and
    NO shuffle of the full table even at 100 TB. Deterministic
    tie-break on id_col.
    """
    p = _probe_lit(probe)
    sim = cosine(F.col(vec_col).cast("array<double>"), p)
    out = df.withColumn("_sim", sim).orderBy(F.desc("_sim"), F.col(id_col)).limit(k)
    sim_out = F.round(F.col("_sim"), sim_scale) if sim_scale is not None else F.col("_sim")
    return out.select(id_col, sim_out.alias("cosine_sim"))


def random_projection_buckets(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-random-projection LSH bucket id (SimHash for vectors).

    ``planes`` are fixed hyperplane normals (deterministic — caller
    derives them from a seeded RNG). Bucket = bit-packed signs of the
    projections. Candidate retrieval then only scans matching buckets:
    at 100 TB this turns ANN from full-scan into a partition-pruned
    lookup when the table is written partitioned/bucketed by
    ``lsh_bucket``.
    """
    vec = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        sign_bit = (dot(vec, _probe_lit(plane)) > 0).cast("long")
        bucket = bucket + (sign_bit * F.lit(2**i))
    return df.withColumn(bucket_col, bucket)


def cosine_topk_lsh(
    df: DataFrame,
    probe: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe_buckets: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force scan to the probe's
    LSH bucket (multi-probe = nearby buckets by Hamming distance would
    widen recall; v1 scans the exact bucket only)."""
    import math

    probe_bucket = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(probe, plane))
        if d > 0:
            probe_bucket += 2**i
    bucketed = random_projection_buckets(df, planes, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket") == probe_bucket)
    return cosine_topk(cand, probe, k=k, vec_col=vec_col, id_col=id_col)
