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
      the byte stream (mean/spread of byte values per stride), stable
      across runs and machines, so downstream similarity/dedup logic
      over the feature column is testable.
    """
    if strict:
        raise NotImplementedError("media decode requires an image/audio library not present here")
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    out = []
    for d in range(FEATURE_DIM):
        stride = payload[d::FEATURE_DIM]
        out.append(round(sum(stride) / max(len(stride), 1) / 255.0, 6))
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
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame with
    ``payload`` as bytes; emits FEATURE_SCHEMA rows. checksum is a
    deterministic 64-bit rolling hash (polynomial, mod 2^61-1) of the
    bytes — the content-address used for exact media dedup.
    """

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        mersenne = (1 << 61) - 1
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = 0
                for byte in b:
                    h = (h * 131 + byte) % mersenne
                try:
                    feat = decode_media(b, None, strict=strict_decode)
                    status = "ok"
                except NotImplementedError:
                    feat, status = None, "decode_unavailable"
                rows.append(
                    {
                        "media_id": int(media_id),
                        "n_bytes": len(b),
                        "n_chunks": (len(b) + chunk_bytes - 1) // chunk_bytes if b else 0,
                        "checksum": h,
                        "status": status,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


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
