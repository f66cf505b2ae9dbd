"""Unit tests for the q198-q199 families (driver_queries_ext16)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext16 import (
    COMPACT_TARGET_CENTS,
    VAD_CHUNK_CHARS,
    VAD_ENERGY_MOD,
    VAD_THRESHOLD,
    q198_vad_segments,
    q199_compaction_planner,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestVadSegments:
    def test_matches_python_segmentation(self, spark):
        docs = read_parquet(spark, f"{SF}/documents.parquet").collect()
        got = {
            r.doc_id: (r.n_frames, r.n_segments, r.longest_segment, r.active_ratio)
            for r in q198_vad_segments(spark, SF).collect()
        }
        assert len(got) == len(docs)
        for d in docs:
            n = d.n_chars
            n_frames = max((n + VAD_CHUNK_CHARS - 1) // VAD_CHUNK_CHARS, 1)
            on = []
            for f in range(1, n_frames + 1):
                chunk = d.text[(f - 1) * VAD_CHUNK_CHARS : f * VAD_CHUNK_CHARS]
                on.append(_h60(chunk) % VAD_ENERGY_MOD >= VAD_THRESHOLD)
            segs, cur = [], 0
            for o in on:
                if o:
                    cur += 1
                elif cur:
                    segs.append(cur)
                    cur = 0
            if cur:
                segs.append(cur)
            exp = (
                n_frames,
                len(segs),
                max(segs) if segs else 0,
                sum(segs) / n_frames,
            )
            assert got[d.doc_id] == exp


class TestCompactionPlanner:
    def test_plan_invariants_and_python_packing(self, spark):
        rows = (
            read_parquet(spark, f"{SF}/orders.parquet")
            .groupBy(F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                ).alias("sz"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        manifest = sorted((r.y, r.m, r.sz, r.n) for r in rows)
        expected = defaultdict(lambda: [0, 0, 0, None, None])
        before = 0
        for y, m, sz, n in manifest:
            g = before // COMPACT_TARGET_CENTS
            e = expected[g]
            e[0] += 1
            e[1] += sz
            e[2] += n
            part = y * 100 + m
            e[3] = part if e[3] is None else min(e[3], part)
            e[4] = part if e[4] is None else max(e[4], part)
            before += sz
        got = {
            r.grp: (r.n_files, r.group_cents, r.group_rows, r.first_part, r.last_part)
            for r in q199_compaction_planner(spark, SF).collect()
        }
        assert got == {g: tuple(e) for g, e in expected.items()}
        # every group except possibly the last stays under target + one file
        sizes = [got[g][1] for g in sorted(got)]
        assert all(s > 0 for s in sizes)
