"""Unit tests for the q182-q186 families (driver_queries_ext12):
linkage scoring vs a python re-score, fingerprint near-dup vs a
python md5 brute force, ACF vs python power sums, Simpson audit vs
python sums, Bloom prefilter no-false-negatives."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext12 import (
    BLOOM_DIM_MIN_BAL,
    FP_BANDS,
    FP_BAND_BITS,
    FP_BITS,
    FP_MAX_HAMMING,
    RL_LEN_BUCKET,
    RL_LEN_TOL,
    RL_PREFIX_N,
    RL_THRESHOLD,
    q182_record_linkage,
    q183_fingerprint_near_dup,
    q184_autocorrelation,
    q185_simpson_flag,
    q186_bloom_prefilter_join,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestRecordLinkage:
    def test_matches_python_rescore(self, spark):
        docs = read_parquet(spark, f"{SF}/documents.parquet").collect()
        by_block = defaultdict(list)
        for r in docs:
            by_block[(r.lang, r.n_chars // RL_LEN_BUCKET)].append(r)
        expected = {}
        for rows in by_block.values():
            rows = sorted(rows, key=lambda r: r.doc_id)
            for i, a in enumerate(rows):
                for b in rows[i + 1 :]:
                    w = (
                        (3 if a.source == b.source else -1)
                        + (2 if abs(a.n_chars - b.n_chars) <= RL_LEN_TOL else -2)
                        + (6 if a.text[:RL_PREFIX_N] == b.text[:RL_PREFIX_N] else -4)
                    )
                    if w >= RL_THRESHOLD:
                        expected[(a.doc_id, b.doc_id)] = w
        got = {
            (r.id_a, r.id_b): r.match_weight
            for r in q182_record_linkage(spark, SF).collect()
        }
        assert got == expected


class TestFingerprintNearDup:
    def test_matches_python_bruteforce(self, spark):
        docs = read_parquet(spark, f"{SF}/documents.parquet").collect()
        fps = {}
        for r in docs:
            n = r.n_chars
            fp = 0
            for i in range(1, FP_BITS + 1):
                start = n * (i - 1) // FP_BITS  # 0-based
                end = n * i // FP_BITS
                chunk = r.text[start:end]
                fp |= (_h60(chunk) % 2) << (i - 1)
            fps[r.doc_id] = fp
        ids = sorted(fps)
        expected = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = bin(fps[a] ^ fps[b]).count("1")
                if ham <= FP_MAX_HAMMING:
                    expected[(a, b)] = ham
        rows = q183_fingerprint_near_dup(spark, SF).collect()
        got = {
            (r.id_a, r.id_b): r.hamming for r in rows if r.id_a != -1
        }
        # banding recall is EXACT here: hamming <= K over B bands
        # leaves <= floor(K/B)=1 bit errors in at least one band
        # (pigeonhole), and the ball-1 probe catches a 1-bit-off band
        # — so the banded join has no false negatives
        from product_analytics_spark.driver_queries_ext12 import FP_BALL

        assert FP_MAX_HAMMING <= FP_BANDS * (FP_BALL + 1) - 1
        assert FP_BANDS * FP_BAND_BITS == FP_BITS
        assert got == expected
        # the sentinel summary row carries the fp checksum both
        # engines must reproduce even when the pair set is empty
        sent = [r for r in rows if r.id_a == -1]
        assert len(sent) == 1
        assert sent[0].id_b == len(set(fps.values()))
        assert sent[0].hamming == (
            sum(v % 1000003 for v in fps.values()) % 2147483647
        )

    def test_planted_near_dups_are_found(self, spark, tmp_path):
        """Deterministic recall proof at the 60-bit width: same-length
        docs differing in <= FP_MAX_HAMMING chunk regions have hamming
        <= that GUARANTEED (unchanged chunks hash identically because
        proportional boundaries depend only on n_chars), so the banded
        ball-probe must surface every planted pair."""
        base = "the quick brown fox jumps over the lazy dog " * 20  # 900
        docs = [(0, base), (1, base)]  # exact dup -> hamming 0
        n = len(base)
        mut = list(base)
        for j in range(3):  # mutate inside 3 distinct chunks
            pos = (n * (10 + j * 7)) // FP_BITS + 2
            mut[pos] = "X"
        docs.append((2, "".join(mut)))  # <=3 chunk parities differ
        docs.append((3, "completely unrelated content " * 31))
        df = spark.createDataFrame(
            [
                (i, t, "en", "synthetic", len(t))
                for i, t in docs
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        rows = q183_fingerprint_near_dup(spark, str(tmp_path)).collect()
        got = {(r.id_a, r.id_b): r.hamming for r in rows if r.id_a != -1}
        assert got.get((0, 1)) == 0  # exact dup, intra-fp path
        assert (0, 2) in got and got[(0, 2)] <= 3  # planted near-dup
        assert (1, 2) in got
        assert not any(3 in p for p in got)  # unrelated doc clean


class TestAutocorrelation:
    def test_matches_python_power_sums(self, spark):
        o = read_parquet(spark, f"{SF}/orders.parquet")
        c = read_parquet(spark, f"{SF}/customer.parquet")
        n = read_parquet(spark, f"{SF}/nation.parquet")
        daily = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                ).alias("y")
            )
            .collect()
        )
        series = defaultdict(list)
        for r in daily:
            series[r.n_name].append((r.d, r.y))
        got = {
            (r.n_name, r.lag): (r.n_pairs, r.acf)
            for r in q184_autocorrelation(spark, SF).collect()
        }
        import math

        for name, pts in series.items():
            ys = [y for _, y in sorted(pts)]
            for lag in range(1, 8):
                pairs = list(zip(ys[:-lag], ys[lag:]))
                if not pairs:
                    continue
                m = len(pairs)
                sx = sum(x for x, _ in pairs)
                sy = sum(y for _, y in pairs)
                sxy = sum(x * y for x, y in pairs)
                sxx = sum(x * x for x, _ in pairs)
                syy = sum(y * y for _, y in pairs)
                r_ = (float(m) * float(sxy) - float(sx) * float(sy)) / (
                    math.sqrt(float(m) * float(sxx) - float(sx) * float(sx))
                    * math.sqrt(float(m) * float(syy) - float(sy) * float(sy))
                )
                n_got, acf_got = got[(name, lag)]
                assert n_got == m
                assert abs(acf_got - r_) < 1e-12


class TestSimpsonFlag:
    def test_matches_python_sums(self, spark):
        li = read_parquet(spark, f"{SF}/lineitem.parquet").select(
            "l_returnflag",
            (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long").alias("x"),
            (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long").alias("y"),
        ).collect()
        groups = defaultdict(lambda: [0, 0, 0, 0])  # n, sx, sy, sxy
        for r in li:
            g = groups[r.l_returnflag]
            g[0] += 1
            g[1] += r.x
            g[2] += r.y
            g[3] += r.x * r.y
        pn = sum(g[0] for g in groups.values())
        psx = sum(g[1] for g in groups.values())
        psy = sum(g[2] for g in groups.values())
        psxy = sum(g[3] for g in groups.values())
        p_num = pn * psxy - psx * psy
        p_sign = (p_num > 0) - (p_num < 0)
        rows = {r.l_returnflag: r for r in q185_simpson_flag(spark, SF).collect()}
        assert set(rows) == set(groups)
        for flag, g in groups.items():
            g_num = g[0] * g[3] - g[1] * g[2]
            g_sign = (g_num > 0) - (g_num < 0)
            r = rows[flag]
            assert r.n_items == g[0]
            assert r.group_sign == g_sign
            assert r.pooled_sign == p_sign
            assert r.simpson_flag == (g_sign * p_sign < 0)
            assert int(r.group_slope_num) == g_num


class TestBloomPrefilter:
    def test_no_false_negatives_and_consistent_counts(self, spark):
        row = q186_bloom_prefilter_join(spark, SF).collect()[0]
        orders = read_parquet(spark, f"{SF}/orders.parquet")
        cust = read_parquet(spark, f"{SF}/customer.parquet").filter(
            F.col("c_acctbal") > BLOOM_DIM_MIN_BAL
        )
        n_probe = orders.count()
        n_true = (
            orders.join(
                cust, orders.o_custkey == cust.c_custkey, "left_semi"
            ).count()
        )
        assert row.n_probe == n_probe
        assert row.n_true == n_true
        assert row.n_false_neg == 0  # Bloom filters never drop members
        assert row.n_pass_bloom == n_true + row.n_false_pos
        # 2 hashes, |keys| << 65536 bits: fp rate should be tiny
        assert row.n_false_pos <= max(10, n_probe // 100)
