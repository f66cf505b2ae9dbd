"""Unit tests for the [EXTENSION] LLM-data-pipeline operators
(SURVEY.md §2.11): near-dup variants, language-ID, multimodal
plumbing. The DuckDB-oracle parity of the q25–q32 driver queries is
covered by tools/check.py; these tests pin the operator semantics
directly on controlled inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_analytics_spark.operators import multimodal, similarity, text
from tests.conftest import SF_SMALL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSimhash:
    def test_identical_texts_have_equal_simhash(self, spark):
        df = _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")])
        vals = [r.sh for r in df.select(text.simhash(F.col("text")).alias("sh")).collect()]
        assert vals[0] == vals[1]

    def test_near_dup_pairs_finds_close_and_skips_far(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely different words about spark partitions shuffles and codegen stages"
        df = _docs(spark, [(1, base), (2, near), (3, far)])
        pairs = {
            (r.id_a, r.id_b)
            for r in text.simhash_near_dup_pairs(df, hamming_max=12).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_hamming64_on_sign_bit(self, spark):
        df = spark.range(1).select(
            text.hamming64(F.lit(-(2**63)).cast("long"), F.lit(0).cast("long")).alias("h")
        )
        assert df.first().h == 1


class TestLanguageId:
    def test_marker_scoring_picks_language(self, spark):
        df = _docs(
            spark,
            [
                (1, "the cat is in the house and it is warm"),
                (2, "der hund ist nicht mit der katze und das ist gut"),
                (3, "xyzzy plugh qwertz"),
            ],
        )
        out = {r.doc_id: r.pred for r in df.select("doc_id", text.language_id(F.col("text")).alias("pred")).collect()}
        assert out[1] == "en"
        assert out[2] == "de"
        assert out[3] == "und"

    def test_tie_breaks_alphabetically(self, spark):
        # "la" scores 1 for both es and fr → es (alphabetical) wins.
        df = _docs(spark, [(1, "la zzz")])
        assert df.select(text.language_id(F.col("text")).alias("p")).first().p == "es"


class TestNgramJaccard:
    def test_exact_value(self, spark):
        a, b = "a b c d", "a b c e"
        df = spark.createDataFrame([(a, b)], "ta string, tb string")
        # 3-gram shingles: {a b c, b c d} vs {a b c, b c e} → 1/3.
        j = df.select(text.ngram_jaccard(F.col("ta"), F.col("tb"), 3).alias("j")).first().j
        assert j == pytest.approx(1 / 3)


class TestEmbeddingNearDup:
    def test_blocked_pairs_ranked_by_cosine(self, spark):
        rows = [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.9, 0.1, 0.0]),   # near 1
            (3, 0, [0.0, 1.0, 0.0]),   # orthogonal to 1
            (4, 1, [1.0, 0.0, 0.0]),   # other block: never paired with 1
        ]
        df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
        out = similarity.embedding_near_dup_pairs(df, block_col="label", k=2).collect()
        assert (out[0].id_a, out[0].id_b) == (1, 2)
        assert all({r.id_a, r.id_b} != {1, 4} for r in out)


class TestMultimodal:
    def test_feature_extraction_deterministic_and_sized(self, spark):
        d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
        media = multimodal.attach_payload(d, "doc_id", "text")
        f1 = {r.media_id: r for r in multimodal.extract_features(media, chunk_bytes=128).collect()}
        f2 = {r.media_id: r for r in multimodal.extract_features(media, chunk_bytes=128).collect()}
        src = {r.doc_id: r.n_chars for r in d.select("doc_id", "n_chars").collect()}
        for mid, row in f1.items():
            assert row.n_bytes == src[mid]
            assert row.n_chunks == (row.n_bytes + 127) // 128
            assert row.status == "ok"
            assert len(row.feature) == multimodal.FEATURE_DIM
            assert row.checksum == f2[mid].checksum
            assert row.feature == f2[mid].feature

    def test_strict_decode_reports_unavailable(self, spark):
        d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(3)
        media = multimodal.attach_payload(d, "doc_id", "text")
        out = multimodal.extract_features(media, strict_decode=True).collect()
        assert all(r.status == "decode_unavailable" and r.feature is None for r in out)

    def test_sample_chunks_takes_every_other(self, spark):
        df = spark.createDataFrame([(1, b"x" * 1000)], "media_id long, payload binary")
        chunks = multimodal.sample_chunks(df, every_n=2, chunk_bytes=100).collect()
        # 10 chunks of 100 bytes → sampled indices 0,2,4,6,8.
        assert [c.chunk_idx for c in chunks] == [0, 1, 2, 3, 4]
        assert all(len(c.chunk) == 100 for c in chunks)

    def test_decode_media_strict_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_media(b"abc", None, strict=True)


class TestBpeIshTokens:
    def test_splits_runs_and_punct(self, spark):
        df = spark.createDataFrame([("ab12 cd!e",)], "t string")
        toks = df.select(text.bpe_ish_tokens(F.col("t")).alias("b")).first().b
        assert toks == ["ab", "12", "cd", "!", "e"]
