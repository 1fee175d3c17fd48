"""Golden + property tests for the stdlib PNG/WAV codecs and the real
decode paths of the multimodal operators."""

import hashlib
import struct
import zlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spark():
    import os

    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    session = get_spark(master="local[4]", app_name="codec-tests")
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


from fuzzy_search_spark.pipeline.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    to_rgb,
)


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1), (1, 1, 3), (16, 16, 3),
                                   (7, 5, 3), (3, 9, 4), (4, 4, 1),
                                   (2, 300, 3), (33, 2)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % (2 ** 31))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    want = arr if arr.ndim == 3 else arr[:, :, None]
    assert out.shape == want.shape
    assert np.array_equal(out, want)


def _manual_png(w, h, channels, scanlines, color_type, extra_chunks=b""):
    """Build a PNG with explicit per-scanline filter bytes."""
    raw = b"".join(scanlines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra_chunks
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    """Hand-filtered scanlines (Sub/Up/Average/Paeth) reconstruct the
    reference pixel grid — the spec recurrences, not just our encoder's
    filter-0 path."""
    # target 4x4 gray image
    target = np.arange(16, dtype=np.uint8).reshape(4, 4) * 13 % 251

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    lines = []
    prev = np.zeros(4, dtype=int)
    for y, ftype in enumerate([1, 2, 3, 4]):
        cur = target[y].astype(int)
        enc = []
        for x in range(4):
            a = cur[x - 1] if x else 0
            if ftype == 1:
                enc.append((cur[x] - a) % 256)
            elif ftype == 2:
                enc.append((cur[x] - prev[x]) % 256)
            elif ftype == 3:
                enc.append((cur[x] - (a + prev[x]) // 2) % 256)
            else:
                c = prev[x - 1] if x else 0
                enc.append((cur[x] - paeth(a, prev[x], c)) % 256)
        lines.append(bytes([ftype]) + bytes(enc))
        prev = cur
    out = decode_png(_manual_png(4, 4, 1, lines, color_type=0))
    assert np.array_equal(out[:, :, 0], target)


def test_png_palette_decodes_to_rgb():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    lines = [b"\x00" + bytes([0, 1, 2])]
    data = _manual_png(3, 1, 1, lines, color_type=3,
                       extra_chunks=chunk(b"PLTE", palette))
    out = decode_png(data)
    assert out.shape == (1, 3, 3)
    assert np.array_equal(out[0], [[255, 0, 0], [0, 255, 0], [0, 0, 255]])


def test_png_rejects_garbage():
    for bad in [b"", b"not a png", b"\x89PNG\r\n\x1a\x08xxxx",
                encode_png(np.zeros((2, 2, 3), np.uint8))[:20]]:
        with pytest.raises(ValueError):
            decode_png(bad)
    # corrupt the IDAT payload -> inflate error surfaces as ValueError
    good = bytearray(encode_png(np.ones((4, 4, 3), np.uint8)))
    good[45] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(good))


def test_to_rgb_normalizes_channels():
    gray = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    assert to_rgb(gray).shape == (2, 2, 3)
    assert np.array_equal(to_rgb(gray)[:, :, 0], gray[:, :, 0])
    rgba = np.zeros((2, 2, 4), np.uint8)
    assert to_rgb(rgba).shape == (2, 2, 3)


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    got, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and got.shape == (777, 1)
    assert np.array_equal((got[:, 0] * 32768).astype(np.int16), mono)

    stereo = rng.integers(-32768, 32768, size=(123, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (123, 2)
    assert np.array_equal((got * 32768).astype(np.int16), stereo)


def test_wav_8bit_and_float32():
    # 8-bit unsigned PCM, hand-built
    payload = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 3) + payload)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(data)
    assert got.shape == (3, 1)
    assert got[0, 0] == -1.0 and got[1, 0] == 0.0
    # float32 PCM
    f = np.array([0.5, -0.25, 1.0], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 12) + f.tobytes())
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(data)
    assert rate == 16000
    assert np.allclose(got[:, 0], [0.5, -0.25, 1.0])


def test_wav_rejects_garbage():
    for bad in [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE"]:
        with pytest.raises(ValueError):
            decode_wav(bad)


# --------------------------------------------------------------------------
# operators on real payloads (Spark)
# --------------------------------------------------------------------------

def test_image_features_real_png_decode(spark):
    """image_features over VALID PNGs computes the true pixel statistics
    (verified against direct NumPy on the same array), and skips
    undecodable payloads instead of failing the task."""
    from fuzzy_search_spark.pipeline.multimodal import image_features

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    rows = [("ok", bytearray(encode_png(arr))),
            ("junk", bytearray(b"\x89PNG\r\n\x1a\ncorrupt")),
            ("text", bytearray(b"plain bytes"))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in image_features(df).collect()}
    assert set(got) == {"ok"}
    r = got["ok"]
    assert (r["height"], r["width"]) == (8, 6)
    want_mean = arr.mean(axis=(0, 1)).round(6).tolist()
    assert r["mean_rgb"] == want_mean
    want_emb = (arr.astype(np.float32).reshape(-1)[:16] / 255.0).tolist()
    assert r["embedding"] == pytest.approx(want_emb)


def test_audio_features_real_wav_decode(spark):
    from fuzzy_search_spark.pipeline.multimodal import audio_features

    samples = np.array([1000, -1000, 2000, -1, 0, 5], dtype=np.int16)
    rows = [("ok", bytearray(encode_wav(samples, 22050))),
            ("bad", bytearray(b"RIFF????WAVEbroken"))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in audio_features(df).collect()}
    assert set(got) == {"ok"}
    r = got["ok"]
    pcm = samples.astype(np.float64) / 32768.0
    assert r["n_samples"] == 6 and r["sample_rate"] == 22050
    assert r["rms"] == round(float(np.sqrt((pcm ** 2).mean())), 6)
    # +->-, -->+, +->-, then -1 -> 0 flips signbit too; 0 -> 5 does not
    assert r["zero_crossings"] == 4


def test_synth_payload_generators_roundtrip(spark):
    """synth_png_payload / synth_wav_payload emit VALID files whose
    decoded content is the documented sha256(text) stream."""
    from fuzzy_search_spark.pipeline.multimodal import (
        synth_png_payload,
        synth_wav_payload,
    )

    docs = spark.createDataFrame([(5, "hello world"), (10, "tweede tekst")],
                                 "doc_id long, text string")
    pngs = {r["url"]: bytes(r["payload"])
            for r in synth_png_payload(docs).collect()}
    digest = hashlib.sha256(b"hello world").digest()
    want = np.frombuffer((digest * 24)[:768], np.uint8).reshape(16, 16, 3)
    assert np.array_equal(decode_png(pngs["5"]), want)

    wavs = {r["url"]: bytes(r["payload"])
            for r in synth_wav_payload(docs).collect()}
    got, rate = decode_wav(wavs["10"])
    digest = hashlib.sha256(b"tweede tekst").digest()
    raw = np.frombuffer((digest * 64)[:2048], "<i2")
    assert rate == 8000 and got.shape == (1024, 1)
    assert np.array_equal((got[:, 0] * 32768).astype(np.int16), raw)


# --------------------------------------------------------------------------
# APNG
# --------------------------------------------------------------------------

def test_apng_roundtrip_and_detection():
    from fuzzy_search_spark.pipeline.codecs import (
        decode_apng,
        encode_apng,
        is_apng,
    )

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (8, 5, 3), dtype=np.uint8)
              for _ in range(4)]
    data = encode_apng(frames)
    assert is_apng(data)
    back = decode_apng(data)
    assert len(back) == 4
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))
    # a still PNG is NOT an APNG, and decode_apng rejects it
    from fuzzy_search_spark.pipeline.codecs import encode_png

    still = encode_png(frames[0])
    assert not is_apng(still)
    with pytest.raises(ValueError):
        decode_apng(still)
    with pytest.raises(ValueError):
        decode_apng(b"garbage")


def test_video_frame_features_real_apng_decode(spark):
    """video_frame_features over a VALID APNG yields one row per real
    frame with true pixel statistics; non-animation payloads keep the
    documented fake path; corrupt APNGs are skipped."""
    from fuzzy_search_spark.pipeline.codecs import encode_apng
    from fuzzy_search_spark.pipeline.multimodal import video_frame_features

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
              for _ in range(5)]
    good = encode_apng(frames)
    bad = bytearray(good)
    bad[60] ^= 0xFF  # corrupt the first frame's compressed data
    rows = [("anim", bytearray(good)), ("corrupt", bytes(bad)),
            ("other", b"\x00\x00\x00\x18ftypmp42" + b"x" * 32)]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = video_frame_features(df, n_frames=3).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    # corrupt APNG skipped entirely; mp4 takes the fake (3 frames)
    assert set(by_url) == {"anim", "other"}
    anim = sorted(by_url["anim"], key=lambda r: r["frame_index"])
    assert [r["frame_index"] for r in anim] == [0, 1, 2]
    assert all(r["n_frames"] == 3 for r in anim)
    for fi, r in enumerate(anim):
        assert (r["height"], r["width"]) == (6, 6)
        assert r["mean_rgb"] == frames[fi].mean(axis=(0, 1)).round(6).tolist()
    assert len(by_url["other"]) == 3


def test_synth_apng_payload_roundtrip(spark):
    from fuzzy_search_spark.pipeline.codecs import decode_apng
    from fuzzy_search_spark.pipeline.multimodal import synth_apng_payload

    docs = spark.createDataFrame([(20, "animatie tekst")],
                                 "doc_id long, text string")
    payloads = {r["url"]: bytes(r["payload"])
                for r in synth_apng_payload(docs, n_frames=3).collect()}
    frames = decode_apng(payloads["20"])
    assert len(frames) == 3
    for i, frame in enumerate(frames):
        digest = hashlib.sha256(f"animatie tekst|{i}".encode()).digest()
        want = np.frombuffer((digest * 24)[:768], np.uint8).reshape(16, 16, 3)
        assert np.array_equal(frame, want)


def test_unfilter_sub_cumsum_matches_sequential():
    """The vectorized Sub unfilter (uint8 cumsum per channel lane) must
    equal the spec's sequential recurrence on random filtered data."""
    from fuzzy_search_spark.pipeline.codecs import _unfilter

    rng = np.random.default_rng(3)
    for trial in range(20):
        h = int(rng.integers(1, 6))
        w = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 3, 4]))
        stride = w * ch
        raw = bytearray()
        ref = np.zeros((h, stride), dtype=np.uint8)
        for y in range(h):
            ftype = int(rng.choice([0, 1, 2, 1, 1]))  # Sub-heavy mix
            line = rng.integers(0, 256, stride).astype(np.uint8)
            raw.append(ftype)
            raw.extend(line.tobytes())
            prev = ref[y - 1] if y else np.zeros(stride, np.uint8)
            cur = ref[y]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                if ftype == 0:
                    cur[x] = line[x]
                elif ftype == 2:
                    cur[x] = (int(line[x]) + int(prev[x])) & 0xFF
                else:
                    cur[x] = (int(line[x]) + a) & 0xFF
        got = _unfilter(bytes(raw), h, w, ch)
        assert np.array_equal(got.reshape(h, stride), ref), (trial, h, w, ch)


# ---------------------------------------------------------------------------
# GIF (LZW + palette + interlace + animation)
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrip_exhaustive():
    import random

    from fuzzy_search_spark.pipeline.codecs import _lzw_decode, _lzw_encode

    rng = random.Random(7)
    for n in (0, 1, 255, 4096, 30000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decode(8, _lzw_encode(8, data)) == data
    # long runs force table growth past 12-bit width -> CLEAR resets
    runs = b"".join(bytes([i % 4]) * 700 for i in range(80))
    assert _lzw_decode(8, _lzw_encode(8, runs)) == runs
    # small min-code-size (bilevel images)
    bits = bytes([i % 2 for i in range(5000)])
    assert _lzw_decode(2, _lzw_encode(2, bits)) == bits


def test_gif_encode_decode_frames():
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import decode_gif, encode_gif

    f = (np.arange(48 * 64, dtype=np.uint32).reshape(48, 64) % 256) \
        .astype(np.uint8)
    frames = [(f + 17 * i) % 256 for i in range(3)]
    frames = [x.astype(np.uint8) for x in frames]
    data = encode_gif(frames)
    assert data[:6] == b"GIF89a"
    assert encode_gif(frames) == data            # deterministic bytes
    dec = decode_gif(data)
    assert len(dec) == 3
    for got, want in zip(dec, frames):
        assert got.shape == (48, 64, 3)
        # grayscale palette: every channel equals the index raster
        for c in range(3):
            assert (got[:, :, c] == want).all()


def test_gif_interlace_and_transparency():
    """Hand-build an interlaced frame + a transparent second frame the
    encoder never emits, so the decoder paths real web GIFs hit are
    covered."""
    import struct

    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (_GIF_INTERLACE_PASSES,
                                                    _lzw_encode, decode_gif)

    h, w = 8, 4
    img = (np.arange(h * w, dtype=np.uint32).reshape(h, w) % 256) \
        .astype(np.uint8)
    # rows stored in interlace order
    order = [r for start, step in _GIF_INTERLACE_PASSES
             for r in range(start, h, step)]
    stored = img[order]

    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h) \
        + bytes([0xF7, 0, 0]) \
        + bytes(v for i in range(256) for v in (i, i, i))
    # frame 1: interlaced
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40" + bytes([8])
    lzw = _lzw_encode(8, stored.reshape(-1).tobytes())
    out += bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: 2x2 patch at (1,1), index 7 transparent, value 200 drawn
    out += b"\x21\xf9\x04\x05\x00\x00\x07\x00"   # GCE: transp idx 7
    out += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([8])
    patch = bytes([200, 7, 7, 200])
    lzw2 = _lzw_encode(8, patch)
    out += bytes([len(lzw2)]) + lzw2 + b"\x00" + b"\x3b"

    frames = decode_gif(bytes(out))
    assert len(frames) == 2
    assert (frames[0][:, :, 0] == img).all()     # de-interlaced
    f2 = frames[1][:, :, 0]
    assert f2[1, 1] == 200 and f2[2, 2] == 200   # drawn pixels
    assert f2[1, 2] == img[1, 2]                 # transparent -> shows prior
    assert f2[2, 1] == img[2, 1]


def test_gif_garbage_rejected_fast():
    from fuzzy_search_spark.pipeline.codecs import decode_gif

    for bad in (b"GIF89a", b"GIF89a" + bytes(range(60)),
                b"GIF89a\xff\xff\xff\xff\x87\x00" + b"xx" * 400,
                b"notagif"):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_image_features_real_gif(spark):
    """A valid GIF now decodes FOR REAL in image_features; garbage with a
    GIF magic is rejected (skipped) instead of faked."""
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import encode_gif
    from fuzzy_search_spark.pipeline.multimodal import image_features

    f = np.full((16, 16), 100, dtype=np.uint8)
    good = encode_gif([f])
    rows = spark.createDataFrame(
        [("good", bytearray(good)), ("junk", bytearray(b"GIF89a" + b"x" * 64))],
        "url string, payload binary")
    feats = {r.url: r for r in image_features(rows).collect()}
    assert set(feats) == {"good"}
    assert feats["good"].height == 16 and feats["good"].width == 16
    assert feats["good"].mean_rgb == [100.0, 100.0, 100.0]


# ---------------------------------------------------------------------------
# JPEG (baseline huffman + IDCT)
# ---------------------------------------------------------------------------


def test_jpeg_constant_blocks_exact():
    """Constant 8x8 blocks are DC-only; with all-ones quantization the
    lossy format round-trips them EXACTLY — the property the oracle
    relies on."""
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_jpeg,
                                                    encode_jpeg_gray)

    vals = np.array([[10, 200], [128, 77]], dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    data = encode_jpeg_gray(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert encode_jpeg_gray(img) == data          # deterministic bytes
    dec = decode_jpeg(data)
    assert dec.shape == (16, 16, 3)
    for c in range(3):
        assert (dec[:, :, c] == img).all()


def test_jpeg_arbitrary_image_near_exact():
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_jpeg,
                                                    encode_jpeg_gray)

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))[:, :, 0].astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 2


def test_jpeg_restart_markers():
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_jpeg,
                                                    encode_jpeg_gray)

    vals = (np.arange(12, dtype=np.uint32).reshape(3, 4) * 20) % 256
    img = np.kron(vals.astype(np.uint8), np.ones((8, 8), dtype=np.uint8))
    for ri in (1, 3):
        dec = decode_jpeg(encode_jpeg_gray(img, restart_interval=ri))
        assert (dec[:, :, 0] == img).all()


def test_jpeg_garbage_and_progressive_rejected():
    from fuzzy_search_spark.pipeline.codecs import decode_jpeg

    for bad in (b"\xff\xd8" + b"junk" * 30,
                b"\xff\xd8\xff\xc2\x00\x08aaaaaa",   # SOF2 progressive
                b"nope", b"\xff\xd8"):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_avi_mjpeg_roundtrip_and_sampling(spark):
    """A real video container decodes for real: AVI/MJPEG frames
    round-trip through video_frame_features exactly (constant blocks)."""
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_avi_mjpeg,
                                                    encode_avi_mjpeg,
                                                    encode_jpeg_gray)
    from fuzzy_search_spark.pipeline.multimodal import (
        sniff_media_type, video_frame_features)

    frames = []
    for i in range(3):
        vals = np.array([[40 + i, 200 - i], [5, 99 + i]], dtype=np.uint8)
        frames.append(np.kron(vals, np.ones((8, 8), dtype=np.uint8)))
    avi = encode_avi_mjpeg([encode_jpeg_gray(f) for f in frames], 16, 16)
    assert sniff_media_type(avi) == "video/avi"
    dec = decode_avi_mjpeg(avi)
    assert len(dec) == 3
    for got, want in zip(dec, frames):
        assert (got[:, :, 0] == want).all()

    df = spark.createDataFrame([("v1", bytearray(avi))],
                               "url string, payload binary")
    rows = sorted(video_frame_features(df, n_frames=3).collect(),
                  key=lambda r: r.frame_index)
    assert len(rows) == 3
    for r, want in zip(rows, frames):
        assert (r.height, r.width) == (16, 16)
        assert r.mean_rgb[0] == float(want.mean())

    # a bad frame is skipped, the rest decode
    broken = encode_avi_mjpeg(
        [encode_jpeg_gray(frames[0]), b"\xff\xd8junk",
         encode_jpeg_gray(frames[2])], 16, 16)
    assert len(decode_avi_mjpeg(broken)) == 2


def test_jpeg_color_420_decode_path():
    """The 4:2:0 interleaved-MCU + chroma-upsample + YCbCr paths — the
    layout virtually every web JPEG uses — decode correctly: a 2x2-cell
    color image (subsampling-lossless) round-trips within +-2, and a
    clip-free random image preserves luma within +-4."""
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_jpeg,
                                                    encode_jpeg_color)

    rng = np.random.default_rng(5)
    base = rng.integers(30, 220, (16, 16, 3))
    img = np.kron(base, np.ones((2, 2, 1))).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_color(img)).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 2

    img2 = rng.integers(64, 192, (32, 48, 3), dtype=np.uint8)
    dec2 = decode_jpeg(encode_jpeg_color(img2)).astype(int)
    lum = (0.299 * img2[:, :, 0] + 0.587 * img2[:, :, 1]
           + 0.114 * img2[:, :, 2])
    lum2 = (0.299 * dec2[:, :, 0] + 0.587 * dec2[:, :, 1]
            + 0.114 * dec2[:, :, 2])
    assert np.abs(lum2 - lum).max() <= 4
    # deterministic bytes
    assert encode_jpeg_color(img) == encode_jpeg_color(img)


def test_mp4_metadata_parse(spark):
    """ISO BMFF box walk extracts duration/dimensions/codec without
    touching coded samples; AVI headers parse too; garbage is skipped."""
    from fuzzy_search_spark.pipeline.codecs import (encode_avi_mjpeg,
                                                    encode_jpeg_gray,
                                                    encode_mp4_stub,
                                                    parse_mp4_meta)
    from fuzzy_search_spark.pipeline.multimodal import (sniff_media_type,
                                                        video_metadata)

    mp4 = encode_mp4_stub(640, 360, 12345, codec=b"vp09")
    assert sniff_media_type(mp4) == "video/mp4"
    assert parse_mp4_meta(mp4) == {"duration_ms": 12345, "width": 640,
                                   "height": 360, "codec": "vp09"}

    import numpy as np
    avi = encode_avi_mjpeg(
        [encode_jpeg_gray(np.zeros((16, 16), dtype=np.uint8))] * 2,
        16, 16, fps=10)
    df = spark.createDataFrame(
        [("m", bytearray(mp4)), ("a", bytearray(avi)),
         ("junk", bytearray(b"\x00\x00\x00\x0cftypxxxx"))],
        "url string, payload binary")
    rows = {r.url: r for r in video_metadata(df).collect()}
    assert set(rows) == {"m", "a"}
    assert (rows["m"].width, rows["m"].height, rows["m"].codec,
            rows["m"].duration_ms) == (640, 360, "vp09", 12345)
    assert (rows["a"].width, rows["a"].height, rows["a"].codec) == \
        (16, 16, "MJPG")
    assert rows["a"].duration_ms == 2 * (1_000_000 // 10) // 1000


def test_mp4_mjpeg_roundtrip_and_sampling(spark):
    """Motion-JPEG-in-MP4 decodes FOR REAL: the sample-table walk
    (stsd/stsz/stco) recovers each frame's JPEG bytes and the DC-exact
    constant-block frames round-trip pixel-identically; non-MJPEG codecs
    (avc1/vp09) are rejected so only they fall back to the fake; the
    Spark path decodes the same frames end-to-end."""
    import hashlib

    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import (decode_mp4_mjpeg,
                                                    encode_jpeg_gray,
                                                    encode_mp4_mjpeg,
                                                    encode_mp4_stub,
                                                    parse_mp4_meta)
    from fuzzy_search_spark.pipeline.multimodal import (
        sniff_media_type,
        synth_mp4_mjpeg_payload,
        video_frame_features,
    )

    jpegs, expected = [], []
    for i in range(3):
        digest = hashlib.sha256(f"doc|v{i}".encode()).digest()
        vals = np.frombuffer(digest[:4], dtype=np.uint8).reshape(2, 2)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        jpegs.append(encode_jpeg_gray(img))
        expected.append(img)
    mp4 = encode_mp4_mjpeg(jpegs, 16, 16)
    assert sniff_media_type(mp4) == "video/mp4"
    assert parse_mp4_meta(mp4)["codec"] == "mjpa"
    frames = decode_mp4_mjpeg(mp4)
    assert len(frames) == 3
    for got, exp in zip(frames, expected):
        assert got.shape == (16, 16, 3)
        assert (got == exp[:, :, None]).all()

    with pytest.raises(ValueError, match="not MJPEG"):
        decode_mp4_mjpeg(encode_mp4_stub(16, 16, 1000, codec=b"avc1"))

    docs = spark.createDataFrame([(7, "doc")], "doc_id long, text string")
    out = (video_frame_features(synth_mp4_mjpeg_payload(docs, n_frames=3),
                                n_frames=3)
           .orderBy("frame_index").collect())
    assert len(out) == 3
    for i, row in enumerate(out):
        digest = hashlib.sha256(f"doc|v{i}".encode()).digest()
        mean = sum(digest[:4]) / 4.0
        assert row.height == 16 and row.width == 16
        assert row.mean_rgb[0] == pytest.approx(mean, abs=1e-9)


def test_webm_metadata_parse(spark):
    """EBML tree walk extracts duration/dimensions/codec from webm
    (Matroska) payloads without touching coded samples; mixes with mp4
    in one video_metadata pass; garbage/truncation raise or are skipped."""
    import pytest

    from fuzzy_search_spark.pipeline.codecs import (encode_mp4_stub,
                                                    encode_webm_meta,
                                                    parse_webm_meta)
    from fuzzy_search_spark.pipeline.multimodal import (sniff_media_type,
                                                        video_metadata)

    webm = encode_webm_meta(1920, 1080, 654321, codec_id="V_VP9")
    assert sniff_media_type(webm) == "video/webm"
    assert parse_webm_meta(webm) == {"duration_ms": 654321, "width": 1920,
                                     "height": 1080, "codec": "V_VP9"}
    # zero duration still parses; the codec string round-trips
    zero = encode_webm_meta(64, 48, 0, codec_id="V_VP8")
    assert parse_webm_meta(zero) == {"duration_ms": 0, "width": 64,
                                     "height": 48, "codec": "V_VP8"}

    with pytest.raises(ValueError):
        parse_webm_meta(b"\x1a\x45\xdf\xa3")          # header only
    with pytest.raises(ValueError):
        parse_webm_meta(b"RIFFxxxxWEBP")              # not EBML at all

    mp4 = encode_mp4_stub(320, 240, 777, codec=b"avc1")
    df = spark.createDataFrame(
        [("w", bytearray(webm)), ("m", bytearray(mp4)),
         ("junk", bytearray(b"\x1a\x45\xdf\xa3\xff\xff\xff"))],
        "url string, payload binary")
    rows = {r.url: r for r in video_metadata(df).collect()}
    assert set(rows) == {"w", "m"}
    assert (rows["w"].media_type, rows["w"].width, rows["w"].height,
            rows["w"].codec, rows["w"].duration_ms) == \
        ("video/webm", 1920, 1080, "V_VP9", 654321)
    assert rows["m"].codec == "avc1"


def test_container_parsers_fail_cleanly_on_mutations():
    """Randomly mutated container payloads must either parse to a dict or
    raise ValueError — never escape with IndexError/struct.error/etc.
    (the Spark-side feature extractors skip ValueError rows; anything
    else would kill the executor task)."""
    import random

    from fuzzy_search_spark.pipeline.codecs import (encode_mp4_stub,
                                                    encode_webm_meta,
                                                    parse_mp4_meta,
                                                    parse_webm_meta)

    rng = random.Random(7)
    mp4 = bytearray(encode_mp4_stub(64, 48, 500, codec=b"avc1"))
    webm = bytearray(encode_webm_meta(64, 48, 500, codec_id="V_VP9"))
    for parser, payload in ((parse_mp4_meta, mp4), (parse_webm_meta, webm)):
        for _ in range(300):
            mutated = bytearray(payload)
            for _ in range(rng.randint(1, 4)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            try:
                out = parser(bytes(mutated))
                assert isinstance(out, dict)
            except ValueError:
                pass
        for cut in (0, 1, 3, 7, len(payload) // 2, len(payload) - 1):
            try:
                out = parser(bytes(payload[:cut]))
                assert isinstance(out, dict)
            except ValueError:
                pass
