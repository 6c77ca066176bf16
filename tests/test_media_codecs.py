"""Real media codec paths: bit-exact decode of PPM/PGM/BMP/WAV and the
frame container, through both the pure functions and the Spark
mapInPandas pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ftm_lakehouse_spark.functions.media_codecs import (
    decode_image,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    resize_nearest,
    split_ppm_frames,
)
from ftm_lakehouse_spark.operators.multimodal import (
    attach_media,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
)

RNG = np.random.default_rng(42)
IMG = RNG.integers(0, 256, (12, 10, 3), dtype=np.uint8)
GRAY = RNG.integers(0, 256, (6, 8), dtype=np.uint8)


def test_ppm_bmp_roundtrip_bit_exact():
    assert np.array_equal(decode_image(encode_ppm(IMG)), IMG)
    assert np.array_equal(decode_image(encode_ppm(GRAY)), GRAY)
    assert np.array_equal(decode_image(encode_bmp(IMG)), IMG)
    # odd width exercises BMP's 4-byte row padding
    odd = IMG[:, :9]
    assert np.array_equal(decode_image(encode_bmp(odd)), odd)


def test_compressed_formats_name_their_library():
    # baseline JPEG is decoded natively now; PROGRESSIVE still names
    # the library that would handle it (SOF2 in a minimal header)
    progressive = (
        b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(progressive)


def test_jpeg_roundtrip_within_quantization_error():
    """Baseline JPEG: our encoder (forward DCT) against our decoder
    (inverse DCT) — independent transform paths, so a huffman/zigzag/
    quant-table bug on either side destroys the image. Smooth content
    at q=95 must round-trip to within a few counts."""
    from ftm_lakehouse_spark.functions.media_codecs import encode_jpeg

    xx, yy = np.meshgrid(np.arange(37), np.arange(29))
    img = np.stack(
        [np.clip(xx * 4 + 10, 0, 255), np.clip(yy * 6 + 5, 0, 255),
         np.clip(120 + xx + yy, 0, 255)], -1
    ).astype(np.uint8)

    # flat gray: DC-only blocks decode EXACTLY
    flat = np.full((16, 24), 128, np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(flat, quality=90)), flat)

    # 4:4:4 color and grayscale: tight bound
    dec = decode_image(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    g = np.clip(xx * 3 + yy * 2, 0, 255).astype(np.uint8)
    decg = decode_image(encode_jpeg(g, quality=95))
    assert decg.shape == g.shape and np.abs(decg.astype(int) - g.astype(int)).max() <= 3

    # 4:2:0 chroma upsampling path: looser bound (chroma was averaged)
    dec420 = decode_image(encode_jpeg(img, quality=95, subsample=True))
    assert dec420.shape == img.shape
    assert np.abs(dec420.astype(int) - img.astype(int)).max() <= 16

    # odd dimensions exercise edge-block padding and cropping
    odd = img[:23, :19]
    assert decode_image(encode_jpeg(odd, quality=95)).shape == odd.shape


def test_jpeg_restart_markers():
    """DRI/RSTn: predictor reset + bit realignment every N MCUs."""
    from ftm_lakehouse_spark.functions.media_codecs import encode_jpeg

    xx, yy = np.meshgrid(np.arange(70), np.arange(50))
    img = np.stack(
        [np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255),
         np.clip(100 + xx + yy, 0, 255)], -1
    ).astype(np.uint8)
    for ri in (1, 3):
        dec = decode_image(encode_jpeg(img, quality=95, restart_interval=ri))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    dec = decode_image(encode_jpeg(img, quality=92, subsample=True, restart_interval=3))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24


def test_png_roundtrip_bit_exact():
    assert np.array_equal(decode_image(encode_png(IMG)), IMG)
    assert np.array_equal(decode_image(encode_png(GRAY)), GRAY)


def test_gif_roundtrip_bit_exact():
    from ftm_lakehouse_spark.functions.media_codecs import encode_gif

    assert np.array_equal(decode_image(encode_gif(IMG)), IMG)
    # >255 rows exercises sub-block splitting; 4 colors exercise a
    # small palette with min_code_size > needed bits
    big = np.repeat(np.repeat(IMG, 5, axis=0), 3, axis=1)
    assert np.array_equal(decode_image(encode_gif(big)), big)
    quad = (IMG // 64) * 64
    assert np.array_equal(decode_image(encode_gif(quad)), quad)


def test_gif_interlaced_decode():
    from ftm_lakehouse_spark.functions.media_codecs import encode_gif

    h = IMG.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    # store rows in interlace order, then set the interlace flag in the
    # image descriptor (offset: header 13 + global palette + 9th byte)
    blob = bytearray(encode_gif(IMG[order]))
    depth_bits = blob[10] & 7
    pal_bytes = (2 << depth_bits) * 3
    iflags_at = 13 + pal_bytes + 9
    assert blob[13 + pal_bytes] == 0x2C
    blob[iflags_at] |= 0x40
    assert np.array_equal(decode_image(bytes(blob)), IMG)


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Reference forward-filterer (PNG spec §9) so the decoder's
    unfilter path is tested against all five filter types, not just the
    filter-0 stream our encoder writes."""
    import struct
    import zlib

    h, w, c = arr.shape
    bpp = c
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    flat = arr.reshape(h, w * c).astype(np.int32)
    for y in range(h):
        row, f = flat[y], filters[y % len(filters)]
        filt = np.empty(w * c, dtype=np.int32)
        for i in range(w * c):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[i] = (row[i] - pred) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_decode():
    blob = _png_with_filters(IMG, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_image(blob), IMG)
    # every-row-Paeth and every-row-Average streams too
    assert np.array_equal(decode_image(_png_with_filters(IMG, [4])), IMG)
    assert np.array_equal(decode_image(_png_with_filters(IMG, [3])), IMG)


def test_png_palette_and_alpha():
    import struct
    import zlib

    # palette PNG: 4-color PLTE, indices 0..3
    idx = (np.arange(30, dtype=np.uint8) % 4).reshape(5, 6)
    plte = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 7, 7]], dtype=np.uint8
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    scan = np.concatenate([np.zeros((5, 1), np.uint8), idx], axis=1)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(blob), plte[idx])

    # RGBA PNG → alpha dropped, RGB preserved
    rgba = np.dstack([IMG, np.full(IMG.shape[:2], 128, np.uint8)])
    scan = np.concatenate(
        [np.zeros((rgba.shape[0], 1), np.uint8), rgba.reshape(rgba.shape[0], -1)],
        axis=1,
    )
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", IMG.shape[1], IMG.shape[0], 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(blob), IMG)


def test_wav_roundtrip():
    t = np.linspace(0, 1, 16000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and len(samples) == 16000
    assert np.abs(samples - sig).max() < 1e-3  # 16-bit quantization


def test_resize_nearest_exact():
    small = resize_nearest(GRAY, 3, 4)
    assert small.shape == (3, 4)
    ys = (np.arange(3) * 6 // 3).clip(0, 5)
    xs = (np.arange(4) * 8 // 4).clip(0, 7)
    assert np.array_equal(small, GRAY[ys][:, xs])


def test_split_ppm_frames():
    frames = [encode_ppm(IMG), encode_ppm(GRAY), encode_ppm(IMG[:3, :3])]
    out = split_ppm_frames(b"".join(frames))
    assert out == frames
    assert split_ppm_frames(b"not a container") == []


@pytest.fixture()
def image_media(spark):
    rows = [
        (1, bytearray(encode_ppm(IMG))),
        (2, bytearray(encode_bmp(IMG))),
        (3, bytearray(encode_png(IMG))),
    ]
    df = spark.createDataFrame(rows, "i long, payload binary")
    return attach_media(df, "payload", kind="image", mime="image/x-portable-pixmap")


def test_image_features_real_decode(spark, image_media):
    out = {r["media_id"]: r for r in extract_image_features(image_media, 16).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["decoded"] is True
        assert (r["height"], r["width"]) == IMG.shape[:2]
    # PPM, BMP, and PNG carry identical pixels → identical features
    a, b, c = out.values()
    assert a["features"] == b["features"] == c["features"]
    gray = IMG.mean(axis=2)
    expected = resize_nearest(gray, 4, 4).astype(np.float32).ravel()
    assert np.allclose(a["features"], expected)


def test_image_resize_pipeline(spark, image_media):
    out = resize_images(image_media, 5, 7).collect()
    for r in out:
        assert r["decoded"] is True
        arr = decode_image(bytes(r["blob"]))
        assert arr.shape == (5, 7, 3)


def test_undecodable_blob_degrades_not_aborts(spark):
    df = spark.createDataFrame([("just text",)], "payload string")
    media = attach_media(df, "payload", kind="image", mime="text/plain")
    rows = extract_image_features(media).collect()
    assert len(rows) == 1 and rows[0]["decoded"] is False
    assert len(rows[0]["features"]) == 16


def test_audio_features(spark):
    t = np.linspace(0, 1, 8000, endpoint=False)
    tone = 0.25 * np.sin(2 * np.pi * 440 * t)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(tone, 8000)))], "i long, payload binary"
    )
    media = attach_media(df, "payload", kind="audio", mime="audio/wav")
    r = extract_audio_features(media).collect()[0]
    assert r["decoded"] is True
    assert r["duration_ms"] == 1000
    assert abs(r["rms"] - 0.25 / np.sqrt(2)) < 1e-3
    assert abs(r["spectral_centroid_hz"] - 440) < 15  # tone dominates spectrum
    assert 0.05 < r["zcr"] < 0.2  # 440 Hz at 8 kHz ≈ 0.11 crossings/sample


def test_video_frame_sampling_real_container(spark):
    container = b"".join([encode_ppm(IMG), encode_ppm(GRAY), encode_ppm(IMG)])
    df = spark.createDataFrame([(1, bytearray(container))], "i long, payload binary")
    media = attach_media(df, "payload", kind="video", mime="video/x-ppm-frames")
    frames = sample_video_frames(media, every_n=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in frames] == [0, 1]
    assert all(r["decoded"] for r in frames)
    assert np.array_equal(decode_image(bytes(frames[0]["frame_blob"])), IMG)
    assert np.array_equal(decode_image(bytes(frames[1]["frame_blob"])), IMG)
