"""Multimodal (binary) columns: schema, partitioning, and Pandas-UDF
plumbing for image/audio/video payloads.

Media bytes are opaque ``binary`` columns with a typed metadata struct —
the storage model a 100 TB training pipeline needs (media inline up to a
size cap, else a URI reference). The Spark-side plumbing (schemas,
``mapInPandas`` batch shape, partition sizing) is real and tested; the
actual codec work (JPEG decode, resampling, frame extraction) is STUBBED —
the decode libraries are not in this container. Each stub either raises
``NotImplementedError`` (strict) or produces a deterministic fake
(``fake=True``) so the distributed plumbing can be exercised end-to-end.

Scale notes: media rows are orders of magnitude wider than text rows —
``media_repartition`` sizes partitions by *bytes* (target ~128 MB) rather
than row count, so decode tasks neither starve nor OOM. The mapInPandas
iterator form processes one Arrow batch at a time and never materializes a
partition in memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # jpeg|png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("uri", T.StringType()),          # set when bytes offloaded
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_repartition(df: DataFrame, payload_col: str = "payload",
                      target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition by cumulative payload size so each task sees ~target
    bytes of media — the knob that matters for decode workers, where row
    counts are meaningless. Uses a range partition on a hash to keep the
    shuffle balanced."""
    stats = df.select(
        F.sum(F.length(F.col(payload_col))).alias("total"), F.count(F.lit(1)).alias("n")
    ).first()
    if not stats or not stats.total:
        return df
    n_parts = max(1, int(stats.total // target_bytes) + 1)
    return df.repartition(n_parts, F.col("media_id"))


def decode_image(payload: bytes, fmt: str, fake: bool) -> list[float]:
    """STUB: real implementation uses PIL/libjpeg. The deterministic fake
    derives 8 'features' from payload bytes so tests can assert plumbing."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this container"
        )
    if payload is None:
        return []
    acc = [0] * 8
    for i, b in enumerate(payload[:1024]):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [float(x) / 997.0 for x in acc]


def image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Extract per-image feature vectors via mapInPandas (Arrow-batched).

    The batch shape (pandas DataFrame per Arrow batch, iterator in/out) is
    the production pattern; only ``decode_image`` is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, m, fake)
                for p, m in zip(pdf["payload"], pdf["meta"].map(lambda s: s["format"]))
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Sample frame timestamps for video rows. Real impl: container demux
    (ffmpeg). Fake: timestamps every ``every_ms`` across duration_ms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video demux requires ffmpeg")
            out_rows = []
            for _, row in pdf.iterrows():
                dur = row["meta"]["duration_ms"] or 0
                for ts in range(0, int(dur), every_ms):
                    out_rows.append({"media_id": row["media_id"], "frame_ts_ms": ts})
            yield pd.DataFrame(
                out_rows, columns=["media_id", "frame_ts_ms"]
            ).astype({"media_id": "int64", "frame_ts_ms": "int64"})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ts_ms", T.LongType()),
        ]
    )
    return df.filter(F.col("meta.media_type") == "video").mapInPandas(run, schema)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codec libs needed)."""
    import hashlib

    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 8)
        mt = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    mt,
                    {"image": "jpeg", "audio": "wav", "video": "mp4"}[mt],
                    64 + i,
                    48 + i,
                    (i + 1) * 2500 if mt == "video" else None,
                    None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_audio(payload: bytes, fake: bool) -> tuple[float, int]:
    """STUB: real implementation decodes WAV/FLAC via soundfile/librosa.
    The deterministic fake treats bytes as a crude PCM stream so the
    distributed plumbing (schema, batching, aggregation) is exercised."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa — not in this container"
        )
    if not payload:
        return 0.0, 0
    samples = [b - 128 for b in payload[:2048]]
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 128.0
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    return float(rms), zc


def audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-clip audio features via mapInPandas (same Arrow-batched shape
    as image_features; only the codec is stubbed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p, fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "rms": [f[0] for f in feats],
                    "zero_crossings": [f[1] for f in feats],
                }
            )

    return df.filter(F.col("meta.media_type") == "audio").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )
