"""Unit tests for the q204-q205 families (driver_queries_ext19)."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext19 import (
    FISCAL_START_MONTH,
    SPC_BASELINE_DAYS,
    q204_fiscal_445_calendar,
    q205_spc_control_chart,
)

SF = "/root/testdata/sf0.001"


def _fiscal(d: dt.date) -> tuple:
    fy = d.year - (1 if d.month < FISCAL_START_MONTH else 0)
    off = (d - dt.date(fy, FISCAL_START_MONTH, 1)).days
    wk = off // 7 + 1
    fq = (wk - 1) // 13 + 1
    wq = (wk - 1) % 13 + 1
    fp = (fq - 1) * 3 + (1 if wq <= 4 else (2 if wq <= 8 else 3))
    return fy, fq, fp


class TestFiscal445:
    def test_matches_python_mapping(self, spark):
        orders = read_parquet(spark, f"{SF}/orders.parquet").select(
            F.to_date("o_orderdate").alias("d"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        ).collect()
        expected = defaultdict(lambda: [0, 0])
        for r in orders:
            e = expected[_fiscal(r.d)]
            e[0] += 1
            e[1] += r.cents
        got = {
            (r.fy, r.fq, r.fp): (r.n_orders, r.revenue)
            for r in q204_fiscal_445_calendar(spark, SF).collect()
        }
        assert got == {k: (v[0], v[1] / 100.0) for k, v in expected.items()}
        # structural invariants of 4-4-5
        for fy, fq, fp in got:
            assert 1 <= fq <= 5 and (fq - 1) * 3 + 1 <= fp <= fq * 3


class TestSpcControlChart:
    def test_matches_python_monitor(self, spark):
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
            r.n_name: (r.n_monitored, r.n_beyond_3sigma, r.n_runs_2sigma, r.first_violation)
            for r in q205_spc_control_chart(spark, SF).collect()
        }
        for name, pts in series.items():
            pts.sort()
            base = [y for _, y in pts[:SPC_BASELINE_DAYS]]
            mon = pts[SPC_BASELINE_DAYS:]
            if not mon:
                assert name not in got
                continue
            bn = float(len(base))
            mu = float(sum(base)) / bn
            sigma = math.sqrt(float(sum(y * y for y in base)) / bn - mu * mu)
            beyond3, runs2 = [], 0
            prev_hi2 = prev_lo2 = False
            for d, y in mon:
                yd = float(y)
                if yd > mu + 3 * sigma or yd < mu - 3 * sigma:
                    beyond3.append(d)
                hi2, lo2 = yd > mu + 2 * sigma, yd < mu - 2 * sigma
                if (hi2 and prev_hi2) or (lo2 and prev_lo2):
                    runs2 += 1
                prev_hi2, prev_lo2 = hi2, lo2
            first = beyond3[0].isoformat() if beyond3 else None
            assert got[name] == (len(mon), len(beyond3), runs2, first)


class TestDedupMethodEval:
    def test_confusion_identities(self, spark):
        from product_analytics_spark.driver_queries_ext20 import (
            q206_dedup_method_eval,
        )

        r = q206_dedup_method_eval(spark, SF).collect()[0]
        assert r.n_pred == r.n_tp + r.n_fp
        assert r.n_truth == r.n_tp + r.n_fn
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
        assert r.n_truth > 0  # the corpus genuinely contains near-dups
        # shared candidates + exact verify means the estimator's FN
        # set comes only from banding recall + estimate noise — at
        # 0.5 both are small, so recall should be high
        assert r.recall >= 0.8
