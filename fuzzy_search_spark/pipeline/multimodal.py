"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

PNG, GIF (incl. animated), baseline JPEG, WAV, AVI/MJPEG and
Motion-JPEG-in-MP4 payloads decode FOR REAL via the stdlib+numpy codecs
in :mod:`fuzzy_search_spark.pipeline.codecs` (zlib inflate + scanline
unfilter; LZW + palette; huffman + dequant + IDCT; RIFF struct parse;
ISO BMFF sample-table walk).  Container METADATA is real for every
format — mp4 box tree, webm/Matroska EBML tree, AVI RIFF headers.
Only codec-bound PIXEL decode (H.264/VP9 in mp4, VP8/VP9 in webm) —
which genuinely needs external codec libraries — remains a STUB with a
deterministic fake behind ``FAKE_DECODE=True`` (and
``NotImplementedError`` otherwise); progressive JPEG is rejected as
undecodable like any malformed row.
The Spark-side plumbing is identical either way: schemas, batch
iteration, UDF signatures, partition-level batching, and raw-byte
metadata (magic sniffing, sizes, content hashes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuzzy_search_spark.pipeline.codecs import (
    PNG_SIGNATURE,
    decode_apng,
    decode_avi_mjpeg,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_apng,
    encode_avi_mjpeg,
    encode_jpeg_gray,
    encode_png,
    encode_wav,
    is_apng,
    to_rgb,
)

#: governs only the payloads with no stdlib codec (H.264/VP9 in mp4,
#: webm): flip to False to surface NotImplementedError where a real codec
#: belongs.  PNG, GIF, baseline JPEG, WAV, AVI/MJPEG and MJPEG-in-MP4
#: always decode for real (progressive JPEG is rejected as undecodable,
#: like any malformed row).
FAKE_DECODE = True

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav"),          # refined below via the WAVE tag
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"%PDF", "application/pdf"),
]


def sniff_media_type(payload: Optional[bytes]) -> str:
    if not payload:
        return "application/octet-stream"
    head = bytes(payload[:16])
    if len(head) >= 8 and head[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mtype in _MAGIC:
        if head.startswith(magic):
            if mtype == "audio/wav":
                if head[8:12] == b"AVI ":
                    return "video/avi"
                if head[8:12] != b"WAVE":
                    return "application/octet-stream"
            return mtype
    return "application/octet-stream"


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    # md5 of the lowercase hex encoding: reproducible by SQL engines whose
    # md5() only accepts strings (DuckDB) — the cross-engine content key
    T.StructField("content_md5", T.StringType()),
])

#: deterministic media prefixes used by :func:`synth_payload` (doc_id % 5)
_SYNTH_PREFIX_HEX = {
    0: "89504E470D0A1A0A",          # PNG
    1: "FFD8FFE0",                  # JPEG
    2: "474946383961",              # GIF89a
    3: "524946460000000057415645",  # RIFF....WAVE
}


def synth_payload(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Attach a deterministic opaque ``payload: binary`` column.

    The sandbox test tables carry no media bytes, so the multimodal path is
    exercised over synthetic payloads: a magic-number prefix chosen by
    ``id % 5`` (the 5th class has no prefix) followed by the UTF-8 text.
    Pure column expressions — reproducible by any engine."""
    m = F.col(id_col) % 5
    prefix = F.lit(b"")
    for k, hx in _SYNTH_PREFIX_HEX.items():
        prefix = F.when(m == k, F.unhex(F.lit(hx))).otherwise(prefix)
    return df.withColumn(
        "payload", F.concat(prefix, F.encode(F.col(text_col), "UTF-8")))


def media_metadata(df: DataFrame, url_col: str = "url",
                   payload_col: str = "payload") -> DataFrame:
    """Byte-level metadata over an opaque binary column (real, no stubs)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "url": pdf[url_col],
                "media_type": payloads.map(sniff_media_type),
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    if b is not None else None),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b).hex().encode()).hexdigest()
                    if b is not None else None),
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, MEDIA_META_SCHEMA)


def _fake_thumbnail(payload: bytes) -> np.ndarray:
    """Deterministic 16x16 RGB fake derived from the payload's sha256
    stream — the stand-in for formats with no stdlib codec."""
    digest = hashlib.sha256(bytes(payload)).digest()
    rng = np.frombuffer((digest * 24)[:768], dtype=np.uint8)
    return rng.reshape(16, 16, 3)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    PNG, GIF and baseline JPEG decode FOR REAL (codecs.decode_png:
    stdlib zlib inflate + scanline unfilter, gray/palette/alpha
    normalized to RGB; codecs.decode_gif: LZW + palette + interlace,
    first frame; codecs.decode_jpeg: huffman + dequant + IDCT, 4:2:0
    upsampling, restart markers).  Progressive JPEG raises ValueError
    like any other undecodable payload (callers skip the row)."""
    mtype = sniff_media_type(payload)
    if mtype == "image/png":
        return to_rgb(decode_png(bytes(payload)))
    if mtype == "image/gif":
        return decode_gif(bytes(payload))[0]
    if mtype == "image/jpeg":
        return decode_jpeg(bytes(payload))
    raise ValueError(f"not an image payload ({mtype})")


def _sample_frames(payload: bytes, n_frames: int) -> List[np.ndarray]:
    """Frame sampler for animation/video payloads.

    APNG, animated GIF, AVI/MJPEG and Motion-JPEG-in-MP4 decode FOR
    REAL (codecs.decode_apng / decode_gif / decode_avi_mjpeg /
    decode_mp4_mjpeg — the animation/container formats stdlib+numpy can
    handle); the first ``n_frames`` frames are returned.  Only
    codec-bound video payloads (H.264/VP9 in mp4, webm) genuinely need
    external codec libraries and keep the deterministic fake (per-frame
    sha256 thumbnails) behind ``FAKE_DECODE``."""
    from fuzzy_search_spark.pipeline.codecs import decode_mp4_mjpeg

    data = bytes(payload)
    if data.startswith(PNG_SIGNATURE) and is_apng(data):
        return decode_apng(data)[:n_frames]
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)[:n_frames]
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)[:n_frames]
    if len(data) >= 8 and data[4:8] == b"ftyp":
        try:
            return decode_mp4_mjpeg(data)[:n_frames]
        except ValueError:
            pass        # not MJPEG samples (avc1/vp09/...): fake or raise
    if not FAKE_DECODE:
        raise NotImplementedError("video codec not available in this env")
    return [_fake_thumbnail(data + bytes([i])) for i in range(n_frames)]


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def image_features(df: DataFrame, url_col: str = "url",
                   payload_col: str = "payload",
                   embedding_dim: int = 16) -> DataFrame:
    """Decode -> feature-extract over image payloads.

    PNG, GIF and baseline JPEG decode for real (stdlib inflate +
    unfilter; LZW + palette; huffman + IDCT).  Undecodable payloads are
    skipped (a 100-TB crawl
    always contains corrupt bytes; one bad row must not kill a task).
    The plumbing mirrors a production pipeline: one Arrow batch in, one
    feature frame out, NumPy work vectorized per batch; the embedding is
    the first ``embedding_dim`` pixel values scaled to [0, 1] (raw
    float32, no re-rounding)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, mtypes, heights, widths, means, embs = [], [], [], [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    arr = _decode_image(payload)
                except ValueError:
                    continue
                urls.append(url)
                mtypes.append(sniff_media_type(payload))
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
                means.append(arr.mean(axis=(0, 1)).round(6).tolist())
                flat = arr.astype(np.float32).reshape(-1)
                emb = flat[:embedding_dim] / 255.0
                embs.append(emb.tolist())
            if not urls:
                continue  # empty frames infer non-list column dtypes
            yield pd.DataFrame({
                "url": urls, "media_type": mtypes, "height": heights,
                "width": widths, "mean_rgb": means, "embedding": embs,
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, IMAGE_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
])


def video_frame_features(df: DataFrame, url_col: str = "url",
                         payload_col: str = "payload",
                         n_frames: int = 4) -> DataFrame:
    """Frame-sample video payloads and extract per-frame features: one
    output row per (video, sampled frame).

    Decode is stubbed like the image path (no codecs in this
    environment; the deterministic fake keeps every downstream shape
    real) — the Spark-side plumbing is the production one: Arrow batch
    in, row-per-frame frame out, vectorized NumPy per batch, explode-free
    (the fan-out happens inside the UDF so the payload bytes never
    replicate per frame in the shuffle)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nf, idx, hs, ws, means = [], [], [], [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    frames = _sample_frames(payload, n_frames)
                except ValueError:
                    continue  # undecodable animation payload: skip the row
                for fi, arr in enumerate(frames):
                    urls.append(url)
                    nf.append(len(frames))
                    idx.append(fi)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    means.append(arr.mean(axis=(0, 1)).round(6).tolist())
            if not urls:
                continue  # empty frames infer non-list column dtypes
            yield pd.DataFrame({
                "url": urls, "n_frames": nf, "frame_index": idx,
                "height": hs, "width": ws, "mean_rgb": means,
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, VIDEO_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.IntegerType()),
])


def _decode_audio(payload: bytes,
                  n_samples: int = 1024) -> "tuple[np.ndarray, int]":
    """Decode an audio payload to (mono float64 PCM in [-1, 1], rate).

    WAV decodes FOR REAL (codecs.decode_wav; multi-channel mixes down by
    channel mean).  Compressed formats (mp3/ogg/…) need external codecs —
    deterministic fake under ``FAKE_DECODE`` (sha256-derived PCM at a
    nominal 8000 Hz), NotImplementedError otherwise.  ValueError for
    non-audio payloads (callers skip)."""
    mtype = sniff_media_type(payload)
    if mtype == "audio/wav":
        samples, rate = decode_wav(bytes(payload))
        return samples.mean(axis=1), rate
    if mtype == "audio/mpeg":
        if not FAKE_DECODE:
            raise NotImplementedError(
                "no stdlib codec for compressed audio")
        digest = hashlib.sha256(bytes(payload)).digest()
        reps = (n_samples * 2 + len(digest) - 1) // len(digest)
        raw = np.frombuffer((digest * reps)[:n_samples * 2], dtype=np.int16)
        return raw.astype(np.float64) / 32768.0, 8000
    raise ValueError(f"not an audio payload ({mtype})")


def audio_features(df: DataFrame, url_col: str = "url",
                   payload_col: str = "payload",
                   n_samples: int = 1024) -> DataFrame:
    """Decode -> per-clip audio features (RMS energy, zero-crossing
    count, sample rate) over audio payloads.  WAV decodes for real;
    undecodable payloads are skipped (see :func:`image_features`)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ns, rates, rms, zc = [], [], [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    pcm, rate = _decode_audio(payload, n_samples)
                except ValueError:
                    continue
                urls.append(url)
                ns.append(len(pcm))
                rates.append(rate)
                rms.append(round(float(np.sqrt((pcm ** 2).mean())), 6)
                           if len(pcm) else 0.0)
                zc.append(int((np.signbit(pcm[1:]) !=
                               np.signbit(pcm[:-1])).sum()))
            yield pd.DataFrame({
                "url": urls, "n_samples": ns, "sample_rate": rates,
                "rms": rms, "zero_crossings": zc,
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, AUDIO_FEATURE_SCHEMA)


def synth_png_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(url, payload): a VALID 16x16 RGB PNG per row whose pixel stream
    is the row text's sha256 digest repeated (24x32 bytes = 768 = 16*16*3).

    Deterministic and ORACLE-COMPUTABLE: an external SQL engine can
    predict every decoded-pixel statistic from sha256(text) alone, which
    turns the full encode -> Spark binary column -> real decode ->
    feature path into a hash-checkable query."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.sha256(
                    (text or "").encode("utf-8")).digest()
                arr = np.frombuffer((digest * 24)[:768],
                                    dtype=np.uint8).reshape(16, 16, 3)
                urls.append(str(doc_id))
                payloads.append(encode_png(arr))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_apng_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       n_frames: int = 3) -> DataFrame:
    """(url, payload): a VALID full-frame APNG per row — frame ``i``'s
    16x16 RGB pixel stream is sha256(text + '|' + i) repeated.  Same
    oracle-computable construction as :func:`synth_png_payload`, per
    frame."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                frames = []
                for i in range(n_frames):
                    digest = hashlib.sha256(
                        f"{text or ''}|{i}".encode("utf-8")).digest()
                    frames.append(np.frombuffer(
                        (digest * 24)[:768], np.uint8).reshape(16, 16, 3))
                urls.append(str(doc_id))
                payloads.append(encode_apng(frames))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_samples: int = 1024,
                      sample_rate: int = 8000) -> DataFrame:
    """(url, payload): a VALID 16-bit mono WAV per row whose PCM stream is
    the row text's sha256 digest repeated, read as little-endian int16 —
    same oracle-computable construction as :func:`synth_png_payload`."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.sha256(
                    (text or "").encode("utf-8")).digest()
                reps = (n_samples * 2 + len(digest) - 1) // len(digest)
                raw = np.frombuffer((digest * reps)[:n_samples * 2],
                                    dtype="<i2")
                urls.append(str(doc_id))
                payloads.append(encode_wav(raw, sample_rate))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_gif_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      n_frames: int = 3) -> DataFrame:
    """(url, payload): a VALID animated GIF89a per row — frame ``i`` is a
    16x16 grayscale raster whose pixel stream is sha256(text + '|g' + i)
    repeated (8x32 = 256 bytes).  The grayscale palette maps index k to
    RGB (k, k, k), so every decoded channel mean equals the digest-byte
    mean — oracle-computable from sha256 alone, exactly like the PNG and
    APNG cases."""
    from fuzzy_search_spark.pipeline.codecs import encode_gif

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                frames = []
                for i in range(n_frames):
                    digest = hashlib.sha256(
                        f"{text or ''}|g{i}".encode("utf-8")).digest()
                    frames.append(np.frombuffer(
                        (digest * 8)[:256], dtype=np.uint8).reshape(16, 16))
                urls.append(str(doc_id))
                payloads.append(encode_gif(frames))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_jpeg_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(url, payload): a VALID baseline grayscale JPEG per row — a 16x16
    image of four constant 8x8 blocks whose values are the first four
    sha256(text) digest bytes.  Constant blocks are DC-only, and the
    encoder's all-ones quantization keeps the DC coefficient exact, so
    the LOSSY format round-trips these pixels EXACTLY — which is what
    makes the decoded statistics oracle-computable from sha256 alone."""
    from fuzzy_search_spark.pipeline.codecs import encode_jpeg_gray

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                digest = hashlib.sha256(
                    (text or "").encode("utf-8")).digest()
                vals = np.frombuffer(digest[:4],
                                     dtype=np.uint8).reshape(2, 2)
                img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                urls.append(str(doc_id))
                payloads.append(encode_jpeg_gray(img))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_avi_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      n_frames: int = 3) -> DataFrame:
    """(url, payload): a VALID AVI/MJPEG video per row — frame ``i`` is a
    16x16 grayscale JPEG of four constant 8x8 blocks taken from
    sha256(text + '|v' + i)[:4].  Constant blocks round-trip the lossy
    JPEG frames exactly (see :func:`synth_jpeg_payload`), so the decoded
    per-frame statistics of a real video CONTAINER are oracle-computable
    from sha256 alone."""
    from fuzzy_search_spark.pipeline.codecs import (encode_avi_mjpeg,
                                                    encode_jpeg_gray)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                jpegs = []
                for i in range(n_frames):
                    digest = hashlib.sha256(
                        f"{text or ''}|v{i}".encode("utf-8")).digest()
                    vals = np.frombuffer(digest[:4],
                                         dtype=np.uint8).reshape(2, 2)
                    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                    jpegs.append(encode_jpeg_gray(img))
                urls.append(str(doc_id))
                payloads.append(encode_avi_mjpeg(jpegs, 16, 16))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


VIDEO_META_SCHEMA = ("url string, media_type string, duration_ms long, "
                     "width int, height int, codec string")


def video_metadata(df: DataFrame, url_col: str = "url",
                   payload_col: str = "payload") -> DataFrame:
    """Container-level video metadata — REAL parse, no pixel decode:
    mp4/mov payloads walk the ISO BMFF box tree (mvhd duration, tkhd
    dimensions, stsd codec fourcc); AVI payloads take dimensions/frame
    count from the RIFF headers.  This is the resolution/duration gate a
    corpus pipeline applies long before any (expensive, codec-bound)
    frame decode.  webm/Matroska payloads walk the EBML tree (Segment >
    Info duration, Tracks > Video dimensions, CodecID).  Unparseable
    payloads are skipped."""
    from fuzzy_search_spark.pipeline.codecs import (parse_mp4_meta,
                                                    parse_webm_meta)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                mtype = sniff_media_type(payload)
                try:
                    if mtype == "video/mp4":
                        m = parse_mp4_meta(bytes(payload))
                        rows.append((url, mtype, m["duration_ms"],
                                     m["width"], m["height"], m["codec"]))
                    elif mtype == "video/webm":
                        m = parse_webm_meta(bytes(payload))
                        rows.append((url, mtype, m["duration_ms"],
                                     m["width"], m["height"], m["codec"]))
                    elif mtype == "video/avi":
                        data = bytes(payload)
                        import struct as _s
                        # avih is the first hdrl chunk: micro-sec/frame,
                        # ..., total frames @ +16, width @ +32, height @ +36
                        i = data.find(b"avih")
                        if i < 0:
                            continue
                        vals = _s.unpack("<14I", data[i + 8:i + 64])
                        usec, nframes, w, h = (vals[0], vals[4], vals[8],
                                               vals[9])
                        rows.append((url, mtype,
                                     usec * nframes // 1000,
                                     w, h, "MJPG"))
                except ValueError:
                    continue
            yield pd.DataFrame(rows, columns=[
                "url", "media_type", "duration_ms", "width", "height",
                "codec"])

    return df.select(url_col, payload_col).mapInPandas(
        process, VIDEO_META_SCHEMA)


def synth_mp4_mjpeg_payload(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            n_frames: int = 3) -> DataFrame:
    """(url, payload): a VALID Motion-JPEG mp4 per row — same per-frame
    construction as :func:`synth_avi_payload` (frame ``i`` = 16x16
    grayscale JPEG of sha256(text + '|v' + i)[:4], DC-exact), but packed
    in an ISO BMFF container with a full sample table, so a REAL modern
    video container decodes end-to-end and stays oracle-computable from
    sha256 alone."""
    from fuzzy_search_spark.pipeline.codecs import (encode_jpeg_gray,
                                                    encode_mp4_mjpeg)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                jpegs = []
                for i in range(n_frames):
                    digest = hashlib.sha256(
                        f"{text or ''}|v{i}".encode("utf-8")).digest()
                    vals = np.frombuffer(digest[:4],
                                         dtype=np.uint8).reshape(2, 2)
                    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                    jpegs.append(encode_jpeg_gray(img))
                urls.append(str(doc_id))
                payloads.append(encode_mp4_mjpeg(jpegs, 16, 16))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_webm_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(url, payload): a VALID metadata-only webm (EBML header +
    Segment(Info + Tracks)) per row, fields derived from the id — width
    16*(1+id%4), height 16*(1+id%3), duration 2000+id ms, codec
    V_VP9/V_VP8 by parity — all oracle-computable analytically."""
    from fuzzy_search_spark.pipeline.codecs import encode_webm_meta

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                urls.append(str(did))
                payloads.append(encode_webm_meta(
                    16 * (1 + did % 4), 16 * (1 + did % 3), 2000 + did,
                    codec_id="V_VP9" if did % 2 == 0 else "V_VP8"))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")


def synth_mp4_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(url, payload): a VALID ISO BMFF stub per row with metadata
    derived from the id — width 16*(1+id%4), height 16*(1+id%3),
    duration 1000+id ms, codec avc1/vp09 by parity — all
    oracle-computable analytically."""
    from fuzzy_search_spark.pipeline.codecs import encode_mp4_stub

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, payloads = [], []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                urls.append(str(did))
                payloads.append(encode_mp4_stub(
                    16 * (1 + did % 4), 16 * (1 + did % 3), 1000 + did,
                    codec=b"avc1" if did % 2 == 0 else b"vp09"))
            yield pd.DataFrame({"url": urls, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        process, "url string, payload binary")
