"""Unit tests for the q170-q172 families (driver_queries_ext9):
FIFO allocation vs a procedural simulation, apportionment
conservation, IVM equivalence to the from-scratch join."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from product_analytics_spark.catalog import read_parquet
from product_analytics_spark.driver_queries_ext9 import (
    ALLOC_BUDGET,
    q170_fifo_allocation,
    q171_budget_allocation,
    q172_delta_join_maintenance,
)

SF = "/root/testdata/sf0.001"


class TestFifoAllocation:
    def test_matches_procedural_fifo_simulation(self, spark):
        li = (
            read_parquet(spark, f"{SF}/lineitem.parquet")
            .select(
                "l_partkey",
                "l_orderkey",
                "l_linenumber",
                "l_linestatus",
                "l_shipdate",
                F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("qty"),
            )
            .collect()
        )
        by_part = defaultdict(lambda: {"F": [], "O": []})
        for r in li:
            by_part[r.l_partkey][r.l_linestatus].append(r)
        expected = set()
        for part, sides in by_part.items():
            receipts = sorted(
                sides["F"], key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber)
            )
            sales = sorted(
                sides["O"], key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber)
            )
            ri, r_rem = 0, receipts[0].qty if receipts else 0
            for s in sales:
                need = s.qty
                while need > 0 and ri < len(receipts):
                    take = min(need, r_rem)
                    if take > 0:
                        rr = receipts[ri]
                        expected.add(
                            (
                                part,
                                rr.l_orderkey,
                                rr.l_linenumber,
                                s.l_orderkey,
                                s.l_linenumber,
                                take,
                            )
                        )
                    need -= take
                    r_rem -= take
                    if r_rem == 0:
                        ri += 1
                        r_rem = receipts[ri].qty if ri < len(receipts) else 0
        got = {
            (
                r.partkey,
                r.r_orderkey,
                r.r_linenumber,
                r.s_orderkey,
                r.s_linenumber,
                r.alloc_qty,
            )
            for r in q170_fifo_allocation(spark, SF).collect()
        }
        assert got == expected


class TestBudgetAllocation:
    def test_exact_conservation_and_proportionality(self, spark):
        rows = q171_budget_allocation(spark, SF).collect()
        assert sum(r.allocation for r in rows) == ALLOC_BUDGET
        for r in rows:
            # largest-remainder never deviates more than 1 unit from quota
            assert abs(r.allocation - r.revenue_share * ALLOC_BUDGET) <= 1.0 + 1e-6


class TestDeltaJoinMaintenance:
    def test_equals_from_scratch_join(self, spark):
        got = {
            r.o_orderpriority: (r.n_items, r.revenue)
            for r in q172_delta_join_maintenance(spark, SF).collect()
        }
        o = read_parquet(spark, f"{SF}/orders.parquet")
        li = read_parquet(spark, f"{SF}/lineitem.parquet")
        full = (
            o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(
                        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                            "long"
                        )
                    )
                    / 100.0
                ).alias("rev"),
            )
            .collect()
        )
        assert got == {r.o_orderpriority: (r.n, r.rev) for r in full}
