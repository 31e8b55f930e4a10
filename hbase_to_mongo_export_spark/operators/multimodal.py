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
        # double, not float32: the value oracle compares bit-exact reprs,
        # and a float32 round-trip would promote with garbage decimals
        T.StructField("rms", T.DoubleType()),
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
    import math

    samples = [b - 128 for b in payload[:2048]]
    # math.sqrt is correctly rounded (IEEE), matching SQL SQRT in both
    # engines; x ** 0.5 goes through pow() which carries no such
    # guarantee — this keeps the value oracle bit-safe
    rms = math.sqrt(sum(s * s for s in samples) / len(samples)) / 128.0
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


# ---------------------------------------------------------------------------
# REAL decoders for self-describing formats (no codec library needed).
#
# PPM (P6) and WAV (RIFF/PCM16) are fully specified byte layouts parseable
# with numpy/struct alone — so for these two formats the decode step is NOT
# a stub: bytes in, pixels/samples out, end-to-end through mapInPandas.
# Compressed formats (jpeg/mp4/flac) stay behind the declared stubs above.
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> tuple[int, int, float, float, float]:
    """Parse a binary PPM (P6) image: 'P6\\n<w> <h>\\n<maxval>\\n' header
    (with optional '#' comments) followed by w*h*3 raw RGB bytes. Returns
    (width, height, mean_r, mean_g, mean_b). Raises ValueError on a
    malformed payload — the quarantine path, like any decode failure."""
    import numpy as np

    w, h, px = _decode_ppm_pixels(payload)
    means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64)
    return w, h, float(means[0]), float(means[1]), float(means[2])


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, float, int]:
    """Parse a RIFF/WAVE file with 16-bit PCM samples by walking the chunk
    list ('fmt ' for layout, 'data' for samples). Returns
    (n_samples, sample_rate, rms, peak) over all channels interleaved."""
    import struct

    import numpy as np

    if payload is None or bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    sample_rate = None
    data = None
    while pos + 8 <= n:
        cid = bytes(payload[pos:pos + 4])
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _ch, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    if samples.size == 0:
        return 0, sample_rate, 0.0, 0
    rms = float(np.sqrt(np.mean(samples * samples)))
    peak = int(np.max(np.abs(samples)))
    return int(samples.size), int(sample_rate), rms, peak


PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def ppm_image_stats(df: DataFrame) -> DataFrame:
    """Per-image channel statistics from REAL P6 decoding via mapInPandas.
    Malformed payloads yield a null row (media_id only) — the quarantine
    pattern, never a task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, r, g, b = decode_ppm(p)
                    rows.append((mid, w, h, round(r, 6), round(g, 6), round(b, 6)))
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.mapInPandas(run, PPM_STATS_SCHEMA)


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def wav_audio_stats(df: DataFrame) -> DataFrame:
    """Per-clip PCM statistics from REAL RIFF/PCM16 parsing via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    ns, sr, rms, peak = decode_wav_pcm16(p)
                    rows.append((mid, ns, sr, round(rms, 6), peak))
                except ValueError:
                    rows.append((mid, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "sample_rate", "rms", "peak"],
            )

    return df.mapInPandas(run, WAV_STATS_SCHEMA)


def synthetic_ppm_media(spark, n: int = 50, width: int = 16, height: int = 12) -> DataFrame:
    """Deterministic P6 images: pixel byte i of image ``id`` is
    (id*31 + i) % 256 — a closed form a SQL oracle can integrate over, so
    the decode path is value-checkable end-to-end."""
    import numpy as np

    header = f"P6\n{width} {height}\n255\n".encode()
    npx = width * height * 3
    rows = []
    for i in range(n):
        px = ((i * 31 + np.arange(npx)) % 256).astype(np.uint8)
        rows.append(
            (
                i,
                bytearray(header + px.tobytes()),
                ("image", "ppm", width, height, None, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_wav_media(spark, n: int = 50, n_samples: int = 256, rate: int = 8000) -> DataFrame:
    """Deterministic PCM16 WAV clips: sample s of clip ``id`` is
    ((id*7 + s*13) % 65536) - 32768 — closed-form for the oracle."""
    import struct

    import numpy as np

    rows = []
    for i in range(n):
        s = np.arange(n_samples)
        vals = (((i * 7 + s * 13) % 65536) - 32768).astype("<i2")
        data = vals.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        payload = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        rows.append(
            (
                i,
                bytearray(payload),
                ("audio", "wav", None, None, (n_samples * 1000) // rate, None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def ppm_resize_stats(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor image resize on decoded P6 pixels: output
    pixel (x,y) samples source pixel (x*w_in//out_w, y*h_in//out_h) —
    integer index math, so the resample grid (and therefore every channel
    mean) is engine-reproducible. Returns per-image channel means of the
    RESIZED image. Malformed payloads quarantine to null rows."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    # reuse the strict header parser, then view pixels
                    w, h, _, _, _ = decode_ppm(p)
                    header_len = len(p) - w * h * 3
                    px = np.frombuffer(
                        p, dtype=np.uint8, offset=header_len
                    ).reshape(h, w, 3)
                    xs = (np.arange(out_w) * w) // out_w
                    ys = (np.arange(out_h) * h) // out_h
                    resized = px[np.ix_(ys, xs)]
                    means = resized.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    rows.append(
                        (mid, out_w, out_h,
                         round(float(means[0]), 6),
                         round(float(means[1]), 6),
                         round(float(means[2]), 6))
                    )
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b"],
            )

    return df.mapInPandas(run, RESIZE_STATS_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
    ]
)


def _decode_ppm_pixels(payload: bytes):
    """decode_ppm's header walk, returning the HxWx3 uint8 pixel array."""
    import numpy as np

    if payload is None or not bytes(payload[:2]) == b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and payload[i] != ord("\n"):
                i += 1
        elif ord("0") <= c <= ord("9"):
            j = i
            while j < n and ord("0") <= payload[j] <= ord("9"):
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    i += 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    if px.size != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return w, h, px.reshape(h, w, 3)


def ppm_image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference hash (dHash) over REAL P6 decoding: sample a
    9x8 grid (nearest neighbor, (c*w) div 9 / (y*h) div 8 — all integer
    math), gray = r+g+b, bit = right neighbor brighter, packed row-major
    into two 32-bit halves (hi = rows 0-3) so no 1<<63 sign games are
    needed in either engine. Integer-exact end to end, so the oracle can
    recompute the hash from the pixel generator's closed form — the
    image near-dup primitive (hamming distance on dHashes) with a full
    value gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = _decode_ppm_pixels(p)
                    xs = [(c * w) // 9 for c in range(9)]
                    ys = [(y * h) // 8 for y in range(8)]
                    hi = lo = 0
                    for yi, y in enumerate(ys):
                        row = [int(px[y, x, 0]) + int(px[y, x, 1]) + int(px[y, x, 2])
                               for x in xs]
                        for c in range(8):
                            if row[c + 1] > row[c]:
                                if yi < 4:
                                    hi |= 1 << (yi * 8 + c)
                                else:
                                    lo |= 1 << ((yi - 4) * 8 + c)
                    rows.append((mid, hi, lo))
                except ValueError:
                    rows.append((mid, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "dhash_hi", "dhash_lo"])

    return df.mapInPandas(run, DHASH_SCHEMA)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fingerprint", T.IntegerType()),
        T.StructField("total_abs_energy", T.LongType()),
    ]
)


def wav_energy_fingerprint(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """Audio fingerprint from REAL RIFF/PCM16 decoding: the clip is cut
    into ``n_bands`` contiguous windows, each window's energy is the
    exact integer sum of |sample|, and bit w says window w+1 is louder
    than window w — the temporal-envelope analog of the image dHash
    (chromaprint's shape without the FFT). Integer-exact end to end, so
    the oracle recomputes it from the PCM generator's closed form."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples = _decode_wav_samples(p)
                    n = len(samples)
                    win = n // n_bands
                    e = [
                        int(np.abs(samples[w * win:(w + 1) * win].astype(np.int64)).sum())
                        for w in range(n_bands)
                    ]
                    fp = 0
                    for w in range(n_bands - 1):
                        if e[w + 1] > e[w]:
                            fp |= 1 << w
                    rows.append((mid, fp, sum(e)))
                except ValueError:
                    rows.append((mid, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "fingerprint", "total_abs_energy"]
            )

    return df.mapInPandas(run, AUDIO_FP_SCHEMA)


def _decode_wav_samples(payload: bytes):
    """RIFF/WAVE chunk walk returning the PCM16 sample array (the
    decode_wav_pcm16 parser, but yielding samples for downstream DSP)."""
    import numpy as np
    import struct as _struct

    if payload is None or bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    data = None
    while i + 8 <= n:
        cid = bytes(payload[i:i + 4])
        (sz,) = _struct.unpack("<I", bytes(payload[i + 4:i + 8]))
        body = payload[i + 8:i + 8 + sz]
        if cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if data is None:
        raise ValueError("no data chunk")
    return np.frombuffer(bytes(data), dtype="<i2")


def video_scene_cuts(
    df: DataFrame,
    every_ms: int = 1000,
    threshold: int = 10,
    fake: bool = True,
) -> DataFrame:
    """Scene-change detection over sampled video frames: per frame a
    luminance value, a cut wherever consecutive frames differ by more
    than ``threshold``. Real impl: decode sampled frames (ffmpeg) and
    average pixel luma. Fake: frame i's luma is the REAL payload byte at
    offset (i*7) mod len — the mapInPandas plumbing, frame loop, and
    cut logic run on actual bytes, only the codec is substituted, and a
    SQL oracle can reproduce the byte reads for ASCII payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame decode requires ffmpeg")
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                dur = int(row["meta"]["duration_ms"] or 0)
                nb = len(payload)
                if nb == 0:
                    continue
                lumas = [
                    payload[(i * 7) % nb] for i in range(dur // every_ms)
                ]
                cuts = [
                    i
                    for i in range(1, len(lumas))
                    if abs(lumas[i] - lumas[i - 1]) > threshold
                ]
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "n_frames": len(lumas),
                        "n_cuts": len(cuts),
                        "first_cut_ts": cuts[0] * every_ms if cuts else None,
                    }
                )
            out = pd.DataFrame(
                rows, columns=["media_id", "n_frames", "n_cuts", "first_cut_ts"]
            )
            out["media_id"] = out["media_id"].astype("int64")
            out["n_frames"] = out["n_frames"].astype("int64")
            out["n_cuts"] = out["n_cuts"].astype("int64")
            yield out

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_cuts", T.LongType()),
            T.StructField("first_cut_ts", T.LongType()),
        ]
    )
    return df.filter(F.col("meta.media_type") == "video").mapInPandas(
        run, schema
    )
