"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The image/audio codec libraries are not available in this environment, so
the decode kernels are STUBS with a deterministic fake behind
``FAKE_DECODE=True`` (and ``NotImplementedError`` otherwise) — but the
Spark-side plumbing is real and tested: schemas, batch iteration, UDF
signatures, partition-level batching, and the metadata extraction that CAN
be done on raw bytes (magic-number sniffing, sizes, stable content hashes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: flip to False to surface NotImplementedError where a real codec belongs
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
    for magic, mtype in _MAGIC:
        if head.startswith(magic):
            if mtype == "audio/wav" and head[8:12] != b"WAVE":
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


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image to an HxWx3 uint8 array.

    STUB: real implementation needs an image codec (Pillow/cv2), absent in
    this environment.  The deterministic fake derives a 16x16 thumbnail
    from the payload's sha256 stream so downstream shapes are exercised."""
    if not FAKE_DECODE:
        raise NotImplementedError("image codec not available in this env")
    digest = hashlib.sha256(bytes(payload)).digest()
    rng = np.frombuffer((digest * 24)[:768], dtype=np.uint8)
    return rng.reshape(16, 16, 3)


def _sample_frames(payload: bytes, n_frames: int) -> List[np.ndarray]:
    """STUB frame sampler for video payloads (same deterministic fake)."""
    if not FAKE_DECODE:
        raise NotImplementedError("video codec not available in this env")
    return [_decode_image(bytes(payload) + bytes([i])) for i in range(n_frames)]


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
    """Decode -> feature-extract over image payloads (decode stubbed).

    The plumbing mirrors a production pipeline: one Arrow batch in, one
    feature frame out, all NumPy work vectorized per batch."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, mtypes, heights, widths, means, embs = [], [], [], [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                arr = _decode_image(payload)
                urls.append(url)
                mtypes.append(sniff_media_type(payload))
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
                means.append(arr.mean(axis=(0, 1)).round(6).tolist())
                flat = arr.astype(np.float32).reshape(-1)
                emb = flat[:embedding_dim] / 255.0
                embs.append(emb.round(6).tolist())
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
                for fi, arr in enumerate(_sample_frames(payload, n_frames)):
                    urls.append(url)
                    nf.append(n_frames)
                    idx.append(fi)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    means.append(arr.mean(axis=(0, 1)).round(6).tolist())
            yield pd.DataFrame({
                "url": urls, "n_frames": nf, "frame_index": idx,
                "height": hs, "width": ws, "mean_rgb": means,
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, VIDEO_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.IntegerType()),
])


def _decode_audio(payload: bytes, n_samples: int = 1024) -> np.ndarray:
    """STUB audio decode (no codec libs in this environment): a
    deterministic fake PCM stream derived from the payload's sha256, so
    the feature math and batch shapes run for real."""
    if not FAKE_DECODE:
        raise NotImplementedError("audio codec not available in this env")
    digest = hashlib.sha256(bytes(payload)).digest()
    reps = (n_samples * 2 + len(digest) - 1) // len(digest)
    raw = np.frombuffer((digest * reps)[:n_samples * 2], dtype=np.int16)
    return raw.astype(np.float64) / 32768.0


def audio_features(df: DataFrame, url_col: str = "url",
                   payload_col: str = "payload",
                   n_samples: int = 1024) -> DataFrame:
    """Decode -> per-clip audio features (RMS energy, zero-crossing
    count) over audio payloads; decode stubbed, plumbing real."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ns, rms, zc = [], [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                pcm = _decode_audio(payload, n_samples)
                urls.append(url)
                ns.append(len(pcm))
                rms.append(round(float(np.sqrt((pcm ** 2).mean())), 6))
                zc.append(int((np.signbit(pcm[1:]) !=
                               np.signbit(pcm[:-1])).sum()))
            yield pd.DataFrame({
                "url": urls, "n_samples": ns, "rms": rms,
                "zero_crossings": zc,
            })

    return df.select(url_col, payload_col).mapInPandas(
        process, AUDIO_FEATURE_SCHEMA)
