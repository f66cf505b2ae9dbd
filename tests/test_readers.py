"""Source-reader tests: schema enforcement and corrupt-row quarantine."""

from __future__ import annotations

from pyspark.sql import types as T

from product_analytics_spark.sources import readers

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


class TestCsv:
    def test_reads_clean_rows_and_quarantines_bad(self, spark, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id,name,amount\n1,alpha,10.5\nnot_a_number,beta,2.0\n3,gamma,7.25\n")
        df = readers.read_csv(spark, str(p), SCHEMA)
        clean, rejects = readers.split_rejects(df)
        got = {(r.id, r.name, r.amount) for r in clean.collect()}
        assert got == {(1, "alpha", 10.5), (3, "gamma", 7.25)}
        assert rejects.count() == 1
        assert "not_a_number" in rejects.collect()[0][readers.CORRUPT_COL]

    def test_clean_schema_has_no_quarantine_col(self, spark, tmp_path):
        p = tmp_path / "in2.csv"
        p.write_text("id,name,amount\n1,a,1.0\n")
        clean, _ = readers.split_rejects(readers.read_csv(spark, str(p), SCHEMA))
        assert clean.columns == ["id", "name", "amount"]


class TestJsonLines:
    def test_reads_ndjson_and_quarantines_garbage(self, spark, tmp_path):
        p = tmp_path / "in.jsonl"
        p.write_text(
            '{"id": 1, "name": "a", "amount": 2.5}\n'
            "this is not json\n"
            '{"id": 2, "name": "b", "amount": 4.0}\n'
        )
        df = readers.read_json_lines(spark, str(p), SCHEMA)
        clean, rejects = readers.split_rejects(df)
        assert {(r.id, r.amount) for r in clean.collect()} == {(1, 2.5), (2, 4.0)}
        assert rejects.count() == 1

    def test_missing_fields_are_null_not_corrupt(self, spark, tmp_path):
        p = tmp_path / "in2.jsonl"
        p.write_text('{"id": 5}\n')
        clean, rejects = readers.split_rejects(readers.read_json_lines(spark, str(p), SCHEMA))
        assert rejects.count() == 0
        row = clean.collect()[0]
        assert (row.id, row.name, row.amount) == (5, None, None)
