"""Multimodal (opaque-binary) column operators.

[EXTENSION] (SURVEY.md §2.11 / driver north-star): image/audio/video
payloads are carried as ``binary`` columns next to a typed metadata
struct. The Spark-side plumbing — schema, Arrow batching, partition
sizing, UDF signatures — is real and tested; the media *decode* step
is stubbed (the image/audio libraries are not in this container)
behind :func:`decode_media`, which either raises
``NotImplementedError`` (strict mode) or produces a deterministic
fake feature vector (default), so every downstream stage is
exercisable end-to-end.

Design for 100 TB:
- payloads never pass through Python row-at-a-time — features are
  extracted with ``mapInPandas`` (Arrow-batched; batch size bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch``);
- feature extraction is a narrow map — no shuffle; writing features
  to a separate table keeps the heavy binary out of later joins
  (join on ``media_id`` instead of dragging bytes through shuffles);
- oversized payloads are the skew risk: partition the input by
  cumulative byte size (``repartitionByRange`` on ``n_bytes``), not
  by row count, so one executor doesn't get all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video | text
        T.StructField("format", T.StringType()),        # e.g. png, wav, mp4, utf8
        T.StructField("width", T.IntegerType()),        # pixels; NULL for audio
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),     # NULL for still images
    ]
)

#: Output schema of :func:`extract_features`.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

CHUNK_BYTES = 65536
FEATURE_DIM = 8


def decode_media(payload: bytes, meta: dict | None, strict: bool = False) -> list[float]:
    """STUB — media decode / feature extraction.

    Real deployments plug a decoder (PIL/torchvision/ffmpeg) in here.
    This container has none, so:
    - ``strict=True``  → raise NotImplementedError (the honest mode);
    - ``strict=False`` → deterministic fake: FEATURE_DIM moments of
      the byte stream (mean of byte values per stride), stable across
      runs and machines, so downstream similarity/dedup logic over
      the feature column is testable. Vectorized with numpy
      (``frombuffer`` + strided means) — no per-byte Python loop, so
      even the fake stays Arrow-batch-fast on large payloads.
    """
    if strict:
        raise NotImplementedError("media decode requires an image/audio library not present here")
    import numpy as np

    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = []
    for d in range(FEATURE_DIM):
        stride = arr[d::FEATURE_DIM]
        # int64 sum (exact) then one float division — bit-stable.
        total = int(stride.sum(dtype=np.int64))
        out.append(round(total / max(len(stride), 1) / 255.0, 6))
    return out


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "text", fmt: str = "utf8"
) -> DataFrame:
    """Driver-table adapter: wrap a string column as (payload binary,
    meta struct) so the multimodal pipeline runs on the public test
    tables. Real sources land payloads from object storage instead."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    df: DataFrame, strict_decode: bool = False, chunk_bytes: int = CHUNK_BYTES
) -> DataFrame:
    """Feature extraction over binary payloads.

    Split by where each output is cheapest:
    - n_bytes / n_chunks / checksum are pure byte-level facts →
      computed JVM-side in codegen (``length``, ``xxhash64`` on the
      binary column). At 100 TB of media, hashing in the JVM instead
      of Python removes the dominant CPU sink the round-1 version had
      (a per-byte Python rolling hash inside the UDF).
    - the decode/feature step is the only part that needs Python →
      ``mapInPandas`` (Arrow-batched; batch size bounded by
      ``spark.sql.execution.arrow.maxRecordsPerBatch``), carrying the
      precomputed columns through untouched.
    """
    base = df.select(
        F.col("media_id"),
        F.col("payload"),
        F.coalesce(F.length("payload").cast("long"), F.lit(0)).alias("n_bytes"),
        F.coalesce(F.ceil(F.length("payload") / F.lit(chunk_bytes)), F.lit(0))
        .cast("int")
        .alias("n_chunks"),
        F.xxhash64("payload").alias("checksum"),
    )

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, statuses = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                try:
                    feats.append(decode_media(b, None, strict=strict_decode))
                    statuses.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    statuses.append("decode_unavailable")
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "n_chunks": pdf["n_chunks"].astype("int32"),
                    "checksum": pdf["checksum"].astype("int64"),
                    "status": statuses,
                    "feature": feats,
                }
            )
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return base.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_chunks(df: DataFrame, every_n: int = 2, chunk_bytes: int = CHUNK_BYTES) -> DataFrame:
    """Frame/chunk sampling plumbing: split each payload into
    CHUNK_BYTES chunks and keep every ``every_n``-th — the shape of
    video frame-sampling (decode is per-chunk downstream). Built-in
    expression work: no Python on the fast path."""
    n_chunks = F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    out = df.select(
        "media_id",
        F.posexplode(
            F.transform(idx, lambda i: F.substr(F.col("payload"), i * chunk_bytes + 1, F.lit(chunk_bytes)))
        ).alias("chunk_idx", "chunk"),
    )
    return out.filter(F.length("chunk") > 0)
