"""Round-12 optimization pins: the fused/one-call expression forms
must be VALUE-IDENTICAL to the per-element / per-column forms they
replaced (operators/text.py band+salt arrays, functions/zorder.py
stats fusion). The optimizations only change how expressions are
CONSTRUCTED (one SQL string / one stats pass instead of per-element
py4j calls / per-column jobs); these tests pin that the values never
drift."""

from __future__ import annotations

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F

from product_analytics_spark.operators.text import (
    BAND_FOLD_A,
    P31,
    _band_hash_array,
    _minhash_sig_fold,
)


@pytest.fixture(scope="module")
def sig_df(spark):
    # deterministic pseudo-signatures: 32 longs in [0, P31)
    return spark.range(50).select(
        F.col("id"),
        F.expr(
            f"transform(sequence(0, 31), "
            f"i -> (xxhash64(id, i) & 2147483647) % {P31}L)"
        ).alias("sig"),
    )


def _band_hash_reference(bands, rows_per_band, hasher):
    """The pre-round-12 per-band Column-chain construction."""

    def band_hash(b: int) -> Column:
        cols = [
            F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)
        ]
        if hasher == "portable":
            acc: Column = F.lit(b).cast("long")
            for c in cols:
                acc = (acc * F.lit(BAND_FOLD_A) + c) % F.lit(P31)
            return acc
        return F.xxhash64(F.lit(b), *cols)

    return F.array(*[band_hash(b) for b in range(bands)])


@pytest.mark.parametrize("hasher", ["portable", "xxhash64"])
@pytest.mark.parametrize("bands,rows_per_band", [(8, 4), (16, 2)])
def test_band_hash_array_matches_column_chain(
    spark, sig_df, hasher, bands, rows_per_band
):
    fused = sig_df.select(
        "id", _band_hash_array(bands, rows_per_band, hasher).alias("a")
    )
    ref = sig_df.select(
        "id", _band_hash_reference(bands, rows_per_band, hasher).alias("a")
    )
    mismatch = (
        fused.alias("f")
        .join(ref.alias("r"), "id")
        .where("f.a <> r.a")
        .count()
    )
    assert mismatch == 0


def test_minhash_fold_salt_array_values(spark, sig_df):
    # the named_struct SQL string must reproduce the salted fold
    # exactly: compare against an inline recomputation from the salts
    from product_analytics_spark.operators.text import minhash_salts

    num = 8
    salts_a, salts_b = minhash_salts(num)
    fused = sig_df.select(
        "id", _minhash_sig_fold(F.col("sig"), num, "portable").alias("s")
    ).collect()
    rows = sig_df.collect()
    by_id = {r["id"]: r["sig"] for r in rows}
    for r in fused:
        hashes = by_id[r["id"]]
        expect = [
            min((a * h + b) % P31 for h in hashes) if hashes else P31
            for a, b in zip(salts_a, salts_b)
        ]
        assert list(r["s"]) == expect


def test_zorder_fused_stats_match_per_column(spark):
    from product_analytics_spark.functions.zorder import (
        _bucketize,
        morton_zvalue,
    )

    df = spark.range(2000).select(
        (F.col("id") % 97).cast("long").alias("x"),
        (F.xxhash64("id") % 1000).cast("long").alias("y"),
    )
    for depth in (False, True):
        fused = df.select(
            "x", "y", morton_zvalue(df, ["x", "y"], equal_depth=depth).alias("z")
        )
        # per-column reference: the old one-job-per-column shape
        bits = 8
        bx = _bucketize(df, "x", bits, equal_depth=depth)
        by = _bucketize(df, "y", bits, equal_depth=depth)
        z = F.lit(0).cast("long")
        for i, bucket in enumerate((bx, by)):
            for b in range(bits):
                bit = (bucket / F.lit(1 << b)).cast("long") % 2
                z = z + bit * F.lit(1 << (b * 2 + i))
        ref = df.select("x", "y", z.alias("z"))
        a = sorted(tuple(r) for r in fused.collect())
        b_ = sorted(tuple(r) for r in ref.collect())
        assert a == b_, f"equal_depth={depth}"
