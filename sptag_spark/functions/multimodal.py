"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The reference treats every payload as raw bytes with typed envelope
metadata (MetadataSet byte blobs, AnnService/inc/Core/MetadataSet.h:13-45;
posting blobs of packed records, ExtraStaticSearcher.h:585-643). The same
discipline carries to a multimodal training-data pipeline: media is an
opaque `binary` column + a typed metadata struct; decode / feature-extract
/ resize / frame-sample are Arrow-batched pandas functions over
mapInPandas.

The codec boundary is explicit and split by what this container can do:

- REAL decoders: WAV/PCM audio via the stdlib `wave` module, PPM (P6) /
  PGM (P5) / 24-bit BI_RGB BMP images via pure struct parsing, and
  8-bit PNG (gray/RGB/RGBA, non-interlaced) via stdlib zlib inflate +
  scanline unfilter — `decode_audio_real` / `decode_image_real` handle
  these end-to-end (round-trip tested against their encoders, all five
  PNG filter types exercised).
- TRANSFORM-CODED codecs (JPEG/WebP/MP3/Opus/H.264) raise
  NotImplementedError naming the library they would use (Pillow/ffmpeg
  — absent here).
- `decode_*_fake` remain as deterministic plumbing fixtures (bytes ->
  seeded ndarray) for tests that exercise batching/schema/partitioning
  without real payloads.

Swapping in Pillow/ffmpeg later changes one function, not the plan.
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

def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """HxW uint8 -> binary PGM (P5)."""
    h, w = img.shape
    assert img.dtype == np.uint8
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit uncompressed BI_RGB BMP (bottom-up)."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):                 # bottom-up rows
        body += img[y, :, ::-1].tobytes()           # RGB -> BGR
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return head + dib + bytes(body)


def _parse_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, HxWx3) / PGM (P5, HxW) parser. Every header scan
    is EOF-bounded: a truncated/corrupt byte string raises ValueError
    instead of spinning an executor task forever."""
    magic = data[:2]
    depth = 3 if magic == b"P6" else 1
    n = len(data)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < n and data[pos:pos + 1].isspace():
            pos += 1
        if pos >= n:
            raise ValueError("truncated PNM header")
        if data[pos:pos + 1] == b"#":                # comment line
            while pos < n and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not data[pos:pos + 1].isspace():
            pos += 1
        try:
            fields.append(int(data[start:pos]))
        except ValueError as e:
            raise ValueError(f"malformed PNM header token "
                             f"{data[start:pos]!r}") from e
    pos += 1                                         # single ws after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PNM supported")
    need = h * w * depth
    if n - pos < need:
        raise ValueError(f"truncated PNM body: need {need} bytes, "
                         f"have {n - pos}")
    arr = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape(h, w, 3) if depth == 3 else arr.reshape(h, w)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 -> PNG via stdlib zlib: IHDR +
    one IDAT (every scanline prefixed with `filter_type`) + IEND. PNG is
    the one compressed image codec implementable without an image
    library — the DEFLATE stream is stdlib, the scanline filters are
    pure arithmetic. filter_type 0-4 exercises each unfilter path in
    round-trip tests; 0 (None) is the fast default."""
    import struct
    import zlib

    assert img.dtype == np.uint8 and filter_type in range(5)
    if img.ndim == 2:
        h, w = img.shape
        color, bpp = 0, 1
        px = img[:, :, None]
    else:
        h, w, c = img.shape
        assert c == 3
        color, bpp = 2, 3
        px = img
    raw = bytearray()
    prev = np.zeros((w, bpp), dtype=np.int64)
    for y in range(h):
        line = px[y].astype(np.int64)
        left = np.vstack([np.zeros((1, bpp), dtype=np.int64), line[:-1]])
        upleft = np.vstack([np.zeros((1, bpp), dtype=np.int64), prev[:-1]])
        if filter_type == 0:
            out = line
        elif filter_type == 1:                       # Sub
            out = line - left
        elif filter_type == 2:                       # Up
            out = line - prev
        elif filter_type == 3:                       # Average
            out = line - (left + prev) // 2
        else:                                        # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            out = line - pred
        raw.append(filter_type)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _parse_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / RGB / RGBA) -> uint8 array:
    chunk walk, stdlib-zlib inflate of the concatenated IDAT stream,
    then per-scanline unfilter (None/Sub/Up/Average/Paeth). Truncated
    or malformed streams raise ValueError (loud, like _parse_pnm);
    palette/16-bit/interlaced variants raise NotImplementedError with
    the boundary named."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, n = 8, len(data)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        length, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length                           # len+tag+body+crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2, 6) or interlace != 0 \
            or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace}:"
            " only 8-bit gray/RGB/RGBA non-interlaced decodes without an"
            " image library")
    bpp = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * bpp
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, w, bpp), dtype=np.int64)
    zero = np.zeros((1, bpp), dtype=np.int64)
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=w * bpp, offset=y * stride + 1
        ).reshape(w, bpp).astype(np.int64)
        prev = out[y - 1] if y else zero.repeat(w, axis=0)
        if ft == 0:
            rec = line
        elif ft == 2:                                # Up
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):                        # left-sequential
            rec = np.zeros_like(line)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                up = prev[x]
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                                  np.abs(p - upleft))
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up, upleft))
                rec[x] = (line[x] + pred) % 256
                left = rec[x]
                upleft = up
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
    img = out.astype(np.uint8)
    return img[:, :, 0] if color == 0 else img


def _parse_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> HxWx3 uint8 RGB."""
    import struct

    offset = struct.unpack_from("<I", data, 10)[0]
    (hdr, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB is "
            "decodable without an image library"
        )
    flip = h > 0                                     # positive = bottom-up
    h = abs(h)
    row = w * 3
    stride = (row + 3) & ~3
    rows = []
    for y in range(h):
        line = np.frombuffer(data, dtype=np.uint8, count=row,
                             offset=offset + y * stride)
        rows.append(line.reshape(w, 3)[:, ::-1])     # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


def decode_image_real(data: bytes, meta: dict) -> np.ndarray:
    """Real image decoder for formats decodable without an image
    library: PPM/PGM/BMP (containers) and 8-bit PNG (stdlib-zlib inflate
    + scanline unfilter). Transform-coded codecs (JPEG/WebP) would go
    through Pillow/turbojpeg — absent here, so they raise with the
    boundary named."""
    if data[:2] in (b"P6", b"P5"):
        return _parse_pnm(data)
    if data[:2] == b"BM":
        return _parse_bmp(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _parse_png(data)
    raise NotImplementedError(
        "transform-coded image codecs (JPEG/WebP) need Pillow/turbojpeg, "
        "not available in this environment; PPM/PGM/BMP/PNG decode "
        "natively"
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """int16 waveform -> RIFF/WAVE PCM bytes (stdlib wave module)."""
    import io
    import wave

    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_audio_real(data: bytes, meta: dict) -> np.ndarray:
    """Real audio decoder for RIFF/WAVE PCM (stdlib wave module) ->
    int16 samples (channel 0 when multi-channel). Compressed codecs
    (MP3/Opus/AAC) would go through soundfile/ffmpeg — absent here."""
    import io
    import wave

    if data[:4] != b"RIFF":
        raise NotImplementedError(
            "compressed audio codecs (MP3/Opus/AAC) need soundfile/ffmpeg, "
            "not available in this environment; WAV/PCM decodes natively"
        )
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            # explicit error, not assert: under python -O an 8/32-bit
            # WAV would otherwise be silently reinterpreted as int16
            raise NotImplementedError(
                f"only 16-bit PCM supported (got sampwidth="
                f"{f.getsampwidth()})"
            )
        frames = np.frombuffer(
            f.readframes(f.getnframes()), dtype=np.int16
        )
        if f.getnchannels() > 1:
            frames = frames.reshape(-1, f.getnchannels())[:, 0].copy()
    return frames


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
