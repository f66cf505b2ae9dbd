"""Unit tests for the q176-q181 families (driver_queries_ext11):
sweep-line vs brute-force point coverage, CUSUM identity checks,
interval-coalescing invariants vs a driver-side merge, grid join vs
brute-force distance pairs, Theil-Sen vs a numpy-free brute median,
and quantile-normalization distribution invariants."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext11 import (
    GRID_EPS,
    q176_max_concurrency,
    q177_cusum_changepoint,
    q178_interval_coalesce,
    q179_grid_spatial_join,
    q180_theilsen_slope,
    q181_quantile_normalize,
)

SF = "/root/testdata/sf0.001"


def _intervals(spark):
    o = read_parquet(spark, f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("s"),
    )
    e = (
        read_parquet(spark, f"{SF}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("e"))
    )
    return (
        o.join(e, o.o_orderkey == e.l_orderkey)
        .select(
            "o_custkey", "o_orderpriority", "s",
            F.greatest("s", "e").alias("e"),  # same clamp as the queries
        )
        .collect()
    )


class TestMaxConcurrency:
    def test_matches_bruteforce_point_coverage(self, spark):
        iv = _intervals(spark)
        by_prio = defaultdict(list)
        for r in iv:
            by_prio[r.o_orderpriority].append((r.s, r.e))
        got = {
            r.o_orderpriority: (r.peak_open, r.peak_date)
            for r in q176_max_concurrency(spark, SF).collect()
        }
        assert set(got) == set(by_prio)
        for prio, pairs in by_prio.items():
            # brute force: count open intervals on every boundary day
            days = sorted({s for s, _ in pairs} | {e for _, e in pairs})
            best_n, best_d = -1, None
            for d in days:
                n = sum(1 for s, e in pairs if s <= d <= e)
                if n > best_n:
                    best_n, best_d = n, d
            peak_open, peak_date = got[prio]
            assert peak_open == best_n
            # sweep reports the EARLIEST day attaining the peak; the
            # brute scan over boundary days finds the same count there
            pd = dt.date.fromisoformat(peak_date)
            assert sum(1 for s, e in pairs if s <= pd <= e) == best_n
            assert pd <= best_d


class TestCusum:
    def test_scaled_stat_identities(self, spark):
        rows = q177_cusum_changepoint(spark, SF).collect()
        assert rows
        for r in rows:
            # |S| is a scaled integer; nonnegative, parseable
            assert int(r.peak_scaled_dev) >= 0
            assert r.n_days > 0
            d = dt.date.fromisoformat(r.changepoint_date)
            assert dt.date(1995, 1, 1) <= d <= dt.date(2002, 12, 31)

    def test_matches_python_cusum(self, spark):
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
                ).alias("cents")
            )
            .collect()
        )
        series = defaultdict(list)
        for r in daily:
            series[r.n_name].append((r.d, r.cents))
        got = {
            r.n_name: (r.n_days, r.changepoint_date, int(r.peak_scaled_dev))
            for r in q177_cusum_changepoint(spark, SF).collect()
        }
        for name, pts in series.items():
            pts.sort()
            total = sum(x for _, x in pts)
            nd = len(pts)
            cum, best, best_d = 0, -1, None
            for k, (d, x) in enumerate(pts, start=1):
                cum += x
                s = abs(nd * cum - k * total)
                if s > best:
                    best, best_d = s, d
            assert got[name] == (nd, best_d.isoformat(), best)


class TestIntervalCoalesce:
    def test_matches_python_merge(self, spark):
        iv = _intervals(spark)
        by_cust = defaultdict(list)
        for r in iv:
            by_cust[r.o_custkey].append((r.s, r.e))
        got = {
            r.o_custkey: (r.n_spans, r.covered_days, r.longest_span)
            for r in q178_interval_coalesce(spark, SF).collect()
        }
        assert set(got) == set(by_cust)
        for cust, pairs in by_cust.items():
            pairs.sort()
            spans = []
            for s, e in pairs:
                if spans and s <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], e)
                else:
                    spans.append([s, e])
            n = len(spans)
            covered = sum((e - s).days + 1 for s, e in spans)
            longest = max((e - s).days + 1 for s, e in spans)
            assert got[cust] == (n, covered, longest)


class TestGridSpatialJoin:
    def test_matches_bruteforce_pairs(self, spark):
        pts = {
            r.vec_id: (float(r.embedding[0]), float(r.embedding[1]))
            for r in read_parquet(spark, f"{SF}/embeddings.parquet").collect()
        }
        ids = sorted(pts)
        expected = set()
        for i, a in enumerate(ids):
            xa, ya = pts[a]
            for b in ids[i + 1 :]:
                xb, yb = pts[b]
                if (xa - xb) ** 2 + (ya - yb) ** 2 <= GRID_EPS * GRID_EPS:
                    expected.add((a, b))
        rows = q179_grid_spatial_join(spark, SF).collect()
        got = {(r.id_a, r.id_b) for r in rows}
        assert len(rows) == len(got)  # each pair exactly once
        assert got == expected


class TestTheilSen:
    def test_matches_python_median_of_slopes(self, spark):
        o = read_parquet(spark, f"{SF}/orders.parquet")
        c = read_parquet(spark, f"{SF}/customer.parquet")
        n = read_parquet(spark, f"{SF}/nation.parquet")
        monthly = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy(
                "n_name",
                (
                    (F.year("o_orderdate") - F.lit(1995)) * 12
                    + F.month("o_orderdate")
                    - 1
                ).alias("k"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                ).alias("cents")
            )
            .collect()
        )
        pts = defaultdict(list)
        for r in monthly:
            pts[r.n_name].append((r.k, r.cents))
        got = {
            r.n_name: (r.theil_sen_cents_per_month, r.n_pairs)
            for r in q180_theilsen_slope(spark, SF).collect()
        }
        for name, p in pts.items():
            slopes = sorted(
                (cb - ca) / (kb - ka)
                for ka, ca in p
                for kb, cb in p
                if ka < kb
            )
            m = len(slopes)
            lo, hi = slopes[(m + 1) // 2 - 1], slopes[m // 2]
            assert got[name] == ((lo + hi) / 2, m)


class TestQuantileNormalize:
    def test_distribution_identical_across_segments(self, spark):
        rows = q181_quantile_normalize(spark, SF).collect()
        by_seg = defaultdict(dict)
        for r in rows:
            by_seg[r.c_mktsegment][r.seg_rank] = r.norm_bal
        sizes = {s: len(d) for s, d in by_seg.items()}
        m = min(sizes.values())
        # up to the shortest segment, every segment carries the SAME
        # normalized value at the same rank — the defining property
        ref = None
        for s, d in by_seg.items():
            vals = [d[r] for r in range(1, m + 1)]
            if ref is None:
                ref = vals
            else:
                assert vals == ref
        # and the reference is monotone in rank
        assert all(a <= b for a, b in zip(ref, ref[1:]))
