"""Unit tests for the custom Python DataSource (sources/pyds.py):
pushFilters contract, partition planning, Arrow read path, and
end-to-end equality with the pure-python generator."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    StringContains,
)

from product_analytics_spark.sources import pyds


def _reader(shards=4, rows=100):
    return pyds.CdcFeedReader(
        {"shards": str(shards), "rows_per_shard": str(rows)}
    )


class TestPushFilters:
    def test_supported_filters_consumed_unsupported_returned(self):
        r = _reader()
        unsupported = list(
            r.pushFilters(
                [
                    EqualTo(("op",), "INSERT"),
                    GreaterThanOrEqual(("op_id",), 50),
                    LessThan(("op_id",), 350),
                    IsNotNull(("customer_id",)),          # not handled
                    StringContains(("op",), "SER"),        # not handled
                ]
            )
        )
        assert r.op_filter == "INSERT"
        assert r.lo == 50 and r.hi == 350
        assert {type(f) for f in unsupported} == {IsNotNull, StringContains}

    def test_partition_planning_respects_bounds(self):
        r = _reader(shards=4, rows=100)
        list(r.pushFilters([GreaterThanOrEqual(("op_id",), 150),
                            LessThan(("op_id",), 260)]))
        parts = r.partitions()
        assert [(p.start, p.end) for p in parts] == [(150, 200), (200, 260)]

    def test_empty_range_yields_one_empty_partition(self):
        r = _reader(shards=2, rows=10)
        list(r.pushFilters([GreaterThanOrEqual(("op_id",), 1000)]))
        parts = r.partitions()
        assert len(parts) == 1
        assert list(r.read(parts[0])) == []


class TestArrowRead:
    def test_batch_matches_row_function(self):
        r = _reader(shards=1, rows=50)
        list(r.pushFilters([EqualTo(("op",), "DELETE")]))
        [batch] = list(r.read(r.partitions()[0]))
        rows = list(zip(*(col.to_pylist() for col in batch.columns)))
        expected = [pyds.cdc_row(i) for i in range(50) if pyds.cdc_op(i) == "DELETE"]
        assert rows == expected


class TestEndToEnd:
    def test_spark_scan_equals_generator(self, spark):
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        pyds.register(spark)
        df = (
            spark.read.format("cdc_feed")
            .option("shards", "3")
            .option("rows_per_shard", "200")
            .load()
            .filter(F.col("op_id") < 450)
        )
        got = sorted(tuple(r) for r in df.collect())
        expected = sorted(pyds.cdc_row(i) for i in range(450))
        assert got == expected


class TestParallelStreamReader:
    """Partition-planning DataSourceStreamReader (q420): driver does
    offset arithmetic only; row generation is executor-side per
    InputPartition. Planning must tile offset ranges exactly (ragged
    batches and shards), and replanning the same range must regenerate
    identical rows (restart replay = exactly-once)."""

    def test_partitions_tile_the_offset_range(self):
        from product_analytics_spark.sources.pyds import (
            CdcParallelStreamReader,
        )

        r = CdcParallelStreamReader(
            {"total_rows": "3000", "batch_rows": "700", "shards": "3"}
        )
        assert r.initialOffset() == {"pos": 0}
        start = {"pos": 0}
        seen = []
        while int(start["pos"]) < 3000:
            end = r.latestOffset()
            parts = r.partitions(start, end)
            # exact tiling: contiguous, non-overlapping, covers [s, e)
            lo = int(start["pos"])
            for p in parts:
                assert p.start == lo
                assert p.end >= p.start
                lo = p.end
            assert lo == int(end["pos"])
            assert len(parts) <= 3
            seen.extend((p.start, p.end) for p in parts)
            start = end
        # availability clamps at the bound; final batch is ragged (200)
        assert int(start["pos"]) == 3000
        assert seen[-1][1] == 3000

    def test_replay_regenerates_identical_rows(self):
        from product_analytics_spark.sources.pyds import (
            CdcParallelStreamReader,
            _StreamSlice,
        )

        r = CdcParallelStreamReader({"total_rows": "100", "batch_rows": "40"})
        a = list(r.read(_StreamSlice(20, 60)))
        b = list(r.read(_StreamSlice(20, 60)))  # restart replay
        assert a == b and len(a) == 40
        # shard-boundary invariance: two half slices == the full slice
        halves = list(r.read(_StreamSlice(20, 40))) + list(
            r.read(_StreamSlice(40, 60))
        )
        assert halves == a

    def test_stream_equals_batch_closed_form(self, spark):
        from product_analytics_spark.sources import pyds

        pyds.register_parallel_stream(spark)
        src = (
            spark.readStream.format("cdc_pstream")
            .option("total_rows", "500")
            .option("batch_rows", "123")  # ragged on purpose
            .option("shards", "4")
            .load()
        )
        q = (
            src.groupBy().count()
            .writeStream.format("memory")
            .queryName("pstream_cnt")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert spark.table("pstream_cnt").collect()[0][0] == 500
