"""Multimodal plumbing tests: schema, determinism, batching, pruning.

The decode step is a documented deterministic fake (no codec libs in this
container); what's under test is the Spark-side contract — schemas,
mapInPandas batch shape, partition behavior, and that the real-decoder
slots fail loudly."""

from __future__ import annotations

import numpy as np
import pytest

from sptag_spark.functions.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_audio_real,
    decode_image_fake,
    decode_image_real,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 60, seed=42).cache()


def test_media_schema_and_determinism(spark, media):
    # simpleString ignores nullability (differs between literal-built and
    # declared schemas) but pins every name and type, nested included.
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    a = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["data"])
         for r in synth_media(spark, 60, seed=42).collect()}
    assert a == b                       # pure function of (id, seed)
    assert all(len(v) == 128 for v in a.values())
    c = {r["media_id"]: bytes(r["data"])
         for r in synth_media(spark, 60, seed=7).collect()}
    assert a[0] != c[0]                 # seed changes payload


def test_real_decoder_slots_fail_loudly():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"x", {})
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"x", {})


def test_image_features(media):
    imgs = media.filter("kind = 'image'")
    out = extract_image_features(imgs)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows = out.collect()
    assert len(rows) == imgs.count()
    for r in rows:
        assert 0 <= r["mean_r"] <= 255 and 0 <= r["std_all"] <= 255
        assert 0 <= r["phash16"] < (1 << 16)
    # determinism: same row twice -> same features
    again = {r["media_id"]: r for r in extract_image_features(imgs).collect()}
    assert all(again[r["media_id"]] == r for r in rows)


def test_image_features_match_local_decoder(media):
    row = media.filter("kind = 'image'").first()
    img = decode_image_fake(bytes(row["data"]), row["meta"].asDict())
    got = extract_image_features(
        media.filter(f"media_id = {row['media_id']}")
    ).collect()[0]
    assert got["mean_r"] == pytest.approx(img[:, :, 0].mean())
    assert got["std_all"] == pytest.approx(float(img.astype(np.float64).std()))


def test_resize_shape(media):
    out = resize_images(media.filter("kind = 'image'"), out_h=8, out_w=8)
    r = out.first()
    assert len(bytes(r["thumb"])) == 8 * 8 * 3
    assert (r["height"], r["width"]) == (8, 8)


def test_frame_sampling_is_jvm_side(media):
    vids = media.filter("kind = 'video'")
    out = sample_frames(vids, every_k=2)
    pdf = out.select("media_id", "frame_idx").toPandas()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in vids.collect()}
    for mid, grp in pdf.groupby("media_id"):
        expect = list(range(0, meta[mid], 2))
        assert sorted(grp["frame_idx"]) == expect
    # no Python stage in the plan: sample_frames is pure column expressions
    assert "mapInPandas" not in out._jdf.queryExecution().toString().lower()


def test_audio_features(media):
    out = extract_audio_features(media.filter("kind = 'audio'"))
    assert out.schema == AUDIO_FEATURES_SCHEMA
    for r in out.collect():
        assert r["n_samples"] == 16000
        assert r["rms"] > 0 and 0 <= r["zero_cross_rate"] <= 1


def test_real_codecs_round_trip():
    """The container-decodable formats decode for REAL: encode->decode is
    the identity for PPM/PGM/BMP images and WAV/PCM audio."""
    import numpy as np

    from sptag_spark.functions.multimodal import (
        decode_audio_real, decode_image_real, encode_bmp, encode_pgm,
        encode_ppm, encode_wav,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_image_real(encode_ppm(img), {}), img)
    assert np.array_equal(decode_image_real(encode_bmp(img), {}), img)
    gray = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    assert np.array_equal(decode_image_real(encode_pgm(gray), {}), gray)
    wav = rng.integers(-32768, 32767, size=1600, dtype=np.int16)
    assert np.array_equal(
        decode_audio_real(encode_wav(wav, 16000), {}), wav)
    # stereo: channel 0 comes back
    stereo = np.stack([wav, wav // 2], axis=1).reshape(-1).astype(np.int16)
    assert np.array_equal(
        decode_audio_real(encode_wav(stereo, 16000, channels=2), {}), wav)


def test_png_round_trip_all_filter_types():
    """PNG is the one COMPRESSED codec implementable with the stdlib
    (zlib inflate + arithmetic scanline filters): encode->decode is the
    identity for RGB and gray across every filter type 0-4, so each
    unfilter branch (None/Sub/Up/Average/Paeth) is exercised, and a
    foreign gradient image (where non-trivial filters actually shrink
    the stream) survives too."""
    import numpy as np

    from sptag_spark.functions.multimodal import (
        decode_image_real, encode_png,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    for ft in range(5):
        assert np.array_equal(
            decode_image_real(encode_png(img, filter_type=ft), {}), img)
        assert np.array_equal(
            decode_image_real(encode_png(gray, filter_type=ft), {}), gray)
    grad = (np.arange(32)[:, None, None]
            + np.arange(48)[None, :, None] * 3
            + np.arange(3)[None, None, :]).astype(np.uint8)
    paeth = encode_png(grad, filter_type=4)
    assert len(paeth) < len(encode_png(grad, filter_type=0))
    assert np.array_equal(decode_image_real(paeth, {}), grad)


def test_png_malformed_and_unsupported_raise():
    import pytest as _pytest

    from sptag_spark.functions.multimodal import decode_image_real

    with _pytest.raises(ValueError, match="IHDR|chunk"):
        decode_image_real(b"\x89PNG\r\n\x1a\n....", {})
    # 16-bit PNG: valid signature + IHDR with depth=16 -> named boundary
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with _pytest.raises(NotImplementedError, match="16"):
        decode_image_real(b"\x89PNG\r\n\x1a\n" + chunk, {})


def test_compressed_codecs_raise_named_boundary():
    import pytest as _pytest

    from sptag_spark.functions.multimodal import (
        decode_audio_real, decode_image_real,
    )

    with _pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_real(b"\xff\xd8\xff\xe0....", {})   # JPEG magic
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_audio_real(b"\xff\xfb\x90\x00....", {})


def test_real_decoder_through_spark_pipeline(spark):
    """End-to-end over REAL encoded payloads: a Spark table of PPM images
    and WAV clips -> feature extraction with the REAL decoders -> values
    match a pure-numpy recomputation."""
    import numpy as np

    from sptag_spark.functions.multimodal import (
        decode_image_real, encode_ppm, encode_wav,
        extract_audio_features, extract_image_features,
    )

    rng = np.random.default_rng(5)
    imgs = {i: rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            for i in range(6)}
    wavs = {i: rng.integers(-3000, 3000, size=800, dtype=np.int16)
            for i in range(6)}
    img_rows = [
        (i, "image", bytearray(encode_ppm(imgs[i])),
         (16, 16, 3, 0, 0, "ppm")) for i in range(6)
    ]
    wav_rows = [
        (i, "audio", bytearray(encode_wav(wavs[i], 16000)),
         (0, 0, 1, 16000, 0, "wav")) for i in range(6)
    ]
    from sptag_spark.functions.multimodal import MEDIA_SCHEMA
    img_df = spark.createDataFrame(img_rows, MEDIA_SCHEMA)
    wav_df = spark.createDataFrame(wav_rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_image_features(
        img_df, decoder=decode_image_real).collect()}
    for i, img in imgs.items():
        f = img.astype(np.float64)
        assert feats[i]["mean_r"] == f[:, :, 0].mean()
        assert feats[i]["std_all"] == f.std()

    afeats = {r["media_id"]: r for r in extract_audio_features(
        wav_df, decoder=lambda d, m: __import__(
            "sptag_spark.functions.multimodal",
            fromlist=["decode_audio_real"]).decode_audio_real(d, m)
    ).collect()}
    for i, wav in wavs.items():
        w = wav.astype(np.float64)
        assert afeats[i]["rms"] == float(np.sqrt((w * w).mean()))
        assert afeats[i]["n_samples"] == 800


def test_truncated_pnm_raises_instead_of_hanging():
    import pytest as _pytest

    from sptag_spark.functions.multimodal import decode_image_real

    for bad in (b"P6 1", b"P6\n2 2\n255\nab", b"P6\n# comment with no newline",
                b"P6\nx y\n255\n"):
        with _pytest.raises(ValueError):
            decode_image_real(bad, {})


def test_decode_audio_rejects_non_16bit_pcm():
    """8-bit WAV must raise (explicit NotImplementedError, not a bare
    assert that python -O strips into silent int16 garbage)."""
    import io
    import wave

    import pytest

    from sptag_spark.functions.multimodal import decode_audio_real

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)  # 8-bit PCM
        f.setframerate(8000)
        f.writeframes(bytes(range(16)))
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_audio_real(buf.getvalue(), {})
