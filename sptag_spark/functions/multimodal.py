"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The reference treats every payload as raw bytes with typed envelope
metadata (MetadataSet byte blobs, AnnService/inc/Core/MetadataSet.h:13-45;
posting blobs of packed records, ExtraStaticSearcher.h:585-643). The same
discipline carries to a multimodal training-data pipeline: media is an
opaque `binary` column + a typed metadata struct; decode / feature-extract
/ resize / frame-sample are Arrow-batched pandas functions over
mapInPandas.

The image/audio codec libraries are NOT in this container, so the codec
boundary is explicit: `decode_image_real` / `decode_audio_real` raise
NotImplementedError with the library they would use, and the default
decoder is a DETERMINISTIC FAKE (bytes -> seeded ndarray) so every piece
of Spark-side plumbing — schema, batching, partition preservation, UDF
signatures — is real and tested. Swapping in Pillow/ffmpeg later changes
one function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("codec", StringType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("data", BinaryType(), False),       # opaque encoded payload
    StructField("meta", MEDIA_META, False),
])


def synth_media(spark: SparkSession, n: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    (media_id, seed) — md5-chained, so any row is reproducible anywhere
    (the reference's vec[i][*]=i fixture style, AlgoTest.cpp:175-245)."""
    rng = spark.range(0, n, 1,
                      partitions or spark.sparkContext.defaultParallelism)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    blob = F.unhex(F.concat(*[
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id"), F.lit(str(i))))
        for i in range(8)  # 8 x 16 bytes = 128-byte payload
    ]))
    meta = F.struct(
        (F.col("id") % 16 * 8 + 32).cast("int").alias("width"),
        (F.col("id") % 8 * 8 + 32).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (F.col("id") % 7 + 2).cast("int").alias("n_frames"),
        F.lit("fake").alias("codec"),
    )
    return rng.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        blob.alias("data"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# codec boundary
# ---------------------------------------------------------------------------

def decode_image_real(data: bytes, meta: dict) -> np.ndarray:
    """Real decoder slot. Would be `PIL.Image.open(io.BytesIO(data))`."""
    raise NotImplementedError(
        "image codec (Pillow/turbojpeg) not available in this environment; "
        "use decode_image_fake for plumbing tests"
    )


def decode_audio_real(data: bytes, meta: dict) -> np.ndarray:
    """Real decoder slot. Would be soundfile/ffmpeg -> float32 waveform."""
    raise NotImplementedError(
        "audio codec (soundfile/ffmpeg) not available in this environment; "
        "use decode_audio_fake for plumbing tests"
    )


def decode_image_fake(data: bytes, meta: dict) -> np.ndarray:
    """Deterministic fake: stretch payload bytes into an HxWxC uint8 array
    via sha256 counter-mode expansion. Pure function of (data, meta)."""
    h, w, c = meta["height"], meta["width"], meta["channels"]
    need = h * w * c
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(data + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w, c)


def decode_audio_fake(data: bytes, meta: dict) -> np.ndarray:
    """Deterministic fake waveform: 1 second of int16 samples."""
    n = meta["sample_rate"]
    out = bytearray()
    counter = 0
    while len(out) < 2 * n:
        out += hashlib.sha256(b"a" + data + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[: 2 * n]), dtype=np.int16)


# ---------------------------------------------------------------------------
# mapInPandas stages (Arrow-batched; no per-row Python at the Spark API)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("std_all", DoubleType()),
    StructField("phash16", LongType()),
])


def extract_image_features(df: DataFrame, decoder=decode_image_fake) -> DataFrame:
    """Per-image channel means + global std + a 16-bit average-hash.

    Batch shape: mapInPandas receives Arrow-sized pandas chunks; decode and
    reductions run per batch inside numpy. Only image rows are processed —
    push the kind filter BEFORE this stage so Parquet prunes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(
                pdf["media_id"], pdf["data"], pdf["meta"]
            ):
                img = decoder(bytes(data), meta).astype(np.float64)
                means = img.mean(axis=(0, 1))
                gray = img.mean(axis=2)
                # 4x4 average-hash: 16 bits, bit set iff cell mean > global
                hh, ww = gray.shape
                cells = gray[: hh - hh % 4, : ww - ww % 4].reshape(
                    4, hh // 4, 4, ww // 4
                ).mean(axis=(1, 3))
                bits = (cells > gray.mean()).flatten()
                phash = int(sum(1 << i for i, b in enumerate(bits) if b))
                rows.append((mid, means[0], means[1], means[2],
                             float(img.std()), phash))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("thumb", BinaryType()),
])


def resize_images(df: DataFrame, out_h: int = 8, out_w: int = 8,
                  decoder=decode_image_fake) -> DataFrame:
    """Nearest-neighbor thumbnail of each image, re-encoded as raw bytes.
    The real pipeline would swap decoder + a real resampler; the batching,
    schema and output envelope are what the engine owns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(
                pdf["media_id"], pdf["data"], pdf["meta"]
            ):
                img = decoder(bytes(data), meta)
                h, w = img.shape[0], img.shape[1]
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                thumb = img[np.ix_(yi, xi)].tobytes()
                rows.append((mid, out_h, out_w, thumb))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling WITHOUT decode: explode frame indices 0, k,
    2k, ... n_frames-1 from metadata — pure column expressions, so frame
    selection is JVM-side and only selected frames ever hit a decoder."""
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k)
    )
    return df.select(
        "media_id", "kind", "data", "meta",
        F.explode(idx).alias("frame_idx"),
    )


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("rms", DoubleType()),
    StructField("zero_cross_rate", DoubleType()),
    StructField("n_samples", LongType()),
])


def extract_audio_features(df: DataFrame,
                           decoder=decode_audio_fake) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(
                pdf["media_id"], pdf["data"], pdf["meta"]
            ):
                wav = decoder(bytes(data), meta).astype(np.float64)
                rms = float(np.sqrt((wav * wav).mean()))
                zc = float((np.diff(np.signbit(wav)) != 0).mean())
                rows.append((mid, rms, zc, len(wav)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
