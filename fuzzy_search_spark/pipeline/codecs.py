"""Stdlib-only media codecs: PNG (zlib inflate + scanline unfilter) and
WAV (RIFF struct parse).  No Pillow/cv2/soundfile — everything here is
``zlib`` + ``struct`` + NumPy, so the multimodal operators decode real
bytes in this sandbox.

Scope (documented, not hidden): PNG bit depth 8, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace — the
overwhelming majority of machine-generated web PNGs; WAV integer PCM
(8/16/24/32-bit) and float32, any channel count; APNG full-frame
animations (the stdlib-decodable video-like format).  JPEG/GIF and real
video containers (mp4/webm) remain genuinely un-decodable without codec
libraries and keep their clearly marked deterministic stubs in
multimodal.py.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Tuple

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 array as a
    valid PNG (filter 0 rows, one zlib-compressed IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    color_type = {1: 0, 3: 2, 4: 6}[arr.shape[2]]
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth).  None/Up are vectorized across the row; Sub is
    a per-channel-lane prefix sum, so uint8 cumsum (which wraps mod 256)
    computes the whole scanline at once; Average/Paeth genuinely recur on
    the left-neighbor AND the previous row and run the spec's sequential
    recurrence."""
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:
            out[y] = line + prev
        elif ftype == 1:
            out[y] = (line.reshape(w, channels)
                      .cumsum(axis=0, dtype=np.uint8).reshape(-1))
        elif ftype in (3, 4):
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                if ftype == 3:
                    cur[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
                else:
                    c = int(prev[x - channels]) if x >= channels else 0
                    cur[x] = (int(line[x])
                              + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an HxWxC uint8 array (C = 1/2/3/4 by color
    type; palette images expand to HxWx3).  Raises ValueError on
    malformed or out-of-scope input (depth != 8, interlaced)."""
    data = bytes(data)
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    header = None
    palette = None
    idat = []
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("PNG chunk truncated")
        if tag == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(chunk)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if header is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = header
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} interlace={interlace})")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    arr = _unfilter(raw, h, w, _PNG_CHANNELS[ctype])
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to HxWx3: gray replicates, alpha drops."""
    if arr.shape[2] == 3:
        return arr
    if arr.shape[2] == 4:
        return arr[:, :, :3]
    return np.repeat(arr[:, :, :1], 3, axis=2)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, channels) — as a
    canonical RIFF/WAVE file."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    payload = np.ascontiguousarray(arr).tobytes()  # interleaved LE
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode WAV bytes to (float64 array of shape (n, channels) in
    [-1, 1], sample_rate).  Supports integer PCM (8-bit unsigned,
    16/24/32-bit signed) and IEEE float32.  Raises ValueError on
    malformed input."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag, length = struct.unpack("<4sI", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            payload = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if ch == 0:
        raise ValueError("WAV with zero channels")
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        arr = (np.frombuffer(payload, dtype=np.uint8)
               .astype(np.float64) - 128.0) / 128.0
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(payload[:len(payload) - len(payload) % 3],
                          dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float64) / float(1 << 23)
    elif audio_format == 1 and bits == 32:
        arr = (np.frombuffer(payload, dtype="<i4").astype(np.float64)
               / float(1 << 31))
    elif audio_format == 3 and bits == 32:
        arr = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format} bits={bits})")
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# APNG (animated PNG): the one video-like format decodable with the stdlib
# alone, reusing the inflate + unfilter machinery above.  Scope: full-frame
# animations (every fcTL covers the whole canvas at offset 0,0) — the shape
# machine-generated frame stacks use; partial-frame composition raises.
# ---------------------------------------------------------------------------


def encode_apng(frames, delay_num: int = 1, delay_den: int = 10) -> bytes:
    """Encode a list of same-shape HxWx3 uint8 frames as a valid APNG
    (acTL + per-frame fcTL, first frame in IDAT, rest in fdAT)."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for a in arrs:
        if a.shape != arrs[0].shape or a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("frames must share one HxWx3 shape")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out = [PNG_SIGNATURE, _png_chunk(b"IHDR", ihdr),
           _png_chunk(b"acTL", struct.pack(">II", len(arrs), 0))]
    seq = 0
    for fi, arr in enumerate(arrs):
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0,
                           delay_num, delay_den, 0, 0)
        out.append(_png_chunk(b"fcTL", fctl))
        seq += 1
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
        comp = zlib.compress(raw, 9)
        if fi == 0:
            out.append(_png_chunk(b"IDAT", comp))
        else:
            out.append(_png_chunk(b"fdAT", struct.pack(">I", seq) + comp))
            seq += 1
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


def is_apng(data: bytes) -> bool:
    """True when PNG bytes carry an acTL chunk before IDAT."""
    data = bytes(data)
    if not data.startswith(PNG_SIGNATURE):
        return False
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def decode_apng(data: bytes):
    """Decode APNG bytes to a list of HxWx3 uint8 frames (full-frame
    subset: every fcTL must cover the canvas at offset 0,0 with blend
    'source'; anything else raises ValueError)."""
    data = bytes(data)
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    header = None
    num_frames = None
    frames = []          # list of (fctl, [data chunks])
    current = None
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("PNG chunk truncated")
        if tag == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"acTL":
            num_frames = struct.unpack(">II", chunk)[0]
        elif tag == b"fcTL":
            fctl = struct.unpack(">IIIIIHHBB", chunk)
            current = (fctl, [])
            frames.append(current)
        elif tag == b"IDAT":
            if current is None:
                raise ValueError("APNG IDAT without preceding fcTL")
            current[1].append(chunk)
        elif tag == b"fdAT":
            if current is None or length < 4:
                raise ValueError("APNG fdAT without preceding fcTL")
            current[1].append(chunk[4:])
        elif tag == b"IEND":
            break
        pos += 12 + length
    if header is None or num_frames is None or not frames:
        raise ValueError("not an APNG (missing IHDR/acTL/fcTL)")
    w, h, depth, ctype, comp, filt, interlace = header
    if depth != 8 or ctype != 2 or interlace != 0:
        raise ValueError("unsupported APNG (depth/color-type/interlace)")
    out = []
    for (seq, fw, fh, x0, y0, _dn, _dd, _dispose, blend), chunks in frames:
        if (fw, fh, x0, y0) != (w, h, 0, 0) or blend != 0:
            raise ValueError(
                "unsupported APNG frame (partial region or over-blend)")
        try:
            raw = zlib.decompress(b"".join(chunks))
        except zlib.error as exc:
            raise ValueError(f"APNG frame inflate failed: {exc}") from exc
        out.append(_unfilter(raw, h, w, 3))
    return out


# ---------------------------------------------------------------------------
# GIF (stdlib-only: GIF87a/89a LZW, interlace, multi-frame animation)
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits, LSB-first
    bit packing), CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = fresh()
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:                      # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode`; resets the table at 4096 codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    buf = b""
    for b in indices:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], code_size)
        table[nxt] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code > 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames, delay_cs: int = 10) -> bytes:
    """Minimal deterministic GIF89a writer: grayscale frames (HxW uint8,
    value = palette index = gray level), global 256-gray palette, one
    full-size non-interlaced image per frame, draw-over disposal.
    Multi-frame input gets a NETSCAPE loop block (an animated GIF any
    consumer plays)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])            # global table: 256 entries
    out += _GIF_GRAY_PALETTE
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) \
                + b"\x00\x00"             # GCE: draw-over, delay, no transp
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8])                 # LZW min code size
        lzw = _lzw_encode(8, f.reshape(-1).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """Decode GIF87a/89a to a list of HxWx3 uint8 RGB frames.

    Handles global/local palettes, interlace, transparency, and the
    draw-over / restore-background disposal modes — the cases real web
    GIFs use.  Raises ValueError on ANY malformed input (callers skip):
    truncation surfaces as IndexError/struct.error internally and is
    converted, so a crawl's garbage-with-GIF-magic rows cost rows,
    never tasks."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed GIF: {exc}") from None


_GIF_MAX_PIXELS = 64_000_000  # reject absurd dims before allocating


def _decode_gif(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    flags, bg = data[10], data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                 # trailer
            break
        if block == 0x21:                 # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = data[pos + 4] if gflags & 1 else None
            while data[pos]:              # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("GIF frame rect outside canvas")
        iflags = data[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a palette")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            size = data[pos]
            lzw += data[pos + 1:pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(_lzw_decode(min_code, bytes(lzw)),
                            dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("truncated GIF image data")
        idx = idx[:fw * fh].reshape(fh, fw)
        if iflags & 0x40:                 # interlace: reorder rows
            de = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        region = canvas[top:top + fh, left:left + fw]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:                 # restore background in rect
            if gct is not None and bg < len(gct):
                canvas[top:top + fh, left:left + fw] = gct[bg]
            else:
                canvas[top:top + fh, left:left + fw] = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


# ---------------------------------------------------------------------------
# JPEG (stdlib+numpy baseline: huffman entropy decode, dequant, IDCT,
# 4:4:4 / 4:2:0 chroma, grayscale + YCbCr; minimal grayscale encoder)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal DCT-II matrix: block = C.T @ coefs @ C reconstructs
_DCT_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_C[_k, _n] = math.cos(math.pi * (2 * _n + 1) * _k / 16) * \
            (math.sqrt(1 / 8) if _k == 0 else math.sqrt(2 / 8))


class _BitReader:
    """MSB-first bit reader over byte-stuffed JPEG entropy data."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad: spec allows 1-fill,
                self.nbits += 8                 # 0 keeps EOB decoding sane
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1               # stuffed FF
                else:
                    self.pos -= 1               # marker: stop consuming
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _build_huffman(bits, symbols):
    """code (as int with marker bit) -> symbol; decode walks bit by bit."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(1 << length) | code] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code = 1
    for _ in range(16):
        code = (code << 1) | reader.read(1)
        if code in table:
            return table[code]
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


_JPEG_MAX_PIXELS = 64_000_000


def decode_jpeg(data: bytes):
    """Baseline (SOF0/SOF1) JPEG decode to an HxWx3 uint8 RGB array.

    Stdlib+numpy only: marker walk, huffman entropy decode with byte
    unstuffing and restart markers, dequant, orthonormal IDCT, chroma
    upsampling for subsampled components (4:2:0/4:2:2), BT.601
    YCbCr->RGB; grayscale replicates.  Progressive (SOF2) and arithmetic
    coding are rejected with ValueError — callers skip, same contract as
    the PNG/GIF decoders."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from None


def _decode_jpeg(data: bytes):
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    huff = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128],
                                         dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64],
                                         dtype=np.uint8).astype(np.int64)
                    i += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):            # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if w == 0 or h == 0 or w * h > _JPEG_MAX_PIXELS:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                symbols = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, symbols)
                i += 17 + n
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(data, pos + seg_len, frame, scan, qt,
                                huff, restart_interval)
        pos += seg_len
    raise ValueError("no JPEG scan found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    reader = _BitReader(data[pos:])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader = _skip_restart(reader)
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, huff[(0, dc_t)])
                        preds[ci] += _extend(reader.read(s), s)
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff[(1, ac_t)])
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:      # EOB
                                break
                            if rs == 0xF0:      # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coefs[k] = _extend(reader.read(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coefs * q
                        spatial = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[ci][py:py + 8, px:px + 8] = spatial
    out = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255)
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(out) != 3:
        raise ValueError(f"unsupported component count {len(out)}")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


def _skip_restart(reader: _BitReader) -> _BitReader:
    """Byte-align and consume the RSTn marker, returning a fresh reader."""
    data = reader.data
    pos = reader.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and 0xD0 <= data[pos + 1] <= 0xD7:
            return _BitReader(data[pos + 2:])
        pos += 1
    raise ValueError("missing restart marker")


# standard Annex K luminance huffman tables (bits, symbols)
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_SYMS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _encode_codes(bits, symbols):
    """symbol -> (code, length) for the writer side."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)           # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # 1-fill per spec


def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Minimal deterministic baseline JPEG writer: single grayscale
    component, ALL-ONES quantization table (so DC-only blocks — e.g.
    constant 8x8 tiles — round-trip EXACTLY through the decoder), the
    Annex K standard huffman tables, no subsampling, optional DRI/RSTn
    restart markers.  Dimensions must be multiples of 8.  Fixture-side
    twin of :func:`decode_jpeg`."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    dc_codes = _encode_codes(_STD_DC_BITS, _STD_DC_SYMS)
    ac_codes = _encode_codes(_STD_AC_BITS, _STD_AC_SYMS)
    wr = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wr.flush()
                wr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            mcu += 1
            block = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coefs = _DCT_C @ block @ _DCT_C.T
            zz = np.round(coefs.reshape(-1)[_ZIGZAG]).astype(np.int64)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = diff.bit_length() if diff > 0 else (-diff).bit_length()
            code, n = dc_codes[s]
            wr.write(code, n)
            if s:
                wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    code, n = ac_codes[0x00]    # EOB
                    wr.write(code, n)
                    break
                while run >= 16:
                    code, n = ac_codes[0xF0]    # ZRL
                    wr.write(code, n)
                    run -= 16
                v = int(zz[k])
                s = v.bit_length() if v > 0 else (-v).bit_length()
                code, n = ac_codes[(run << 4) | s]
                wr.write(code, n)
                wr.write(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
    wr.flush()

    out = bytearray(b"\xff\xd8")                          # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(64)[:0] + bytes([1] * 64)                 # DQT all-ones
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])                             # SOF0 1 comp
    for tc, bits, syms in ((0, _STD_DC_BITS, _STD_DC_SYMS),
                           (1, _STD_AC_BITS, _STD_AC_SYMS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) \
            + bytes([tc << 4]) + bytes(bits) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 8) \
        + bytes([1, 1, 0x00, 0, 63, 0])                   # SOS
    out += wr.out
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI / MJPEG (RIFF container walk; frames decoded by the JPEG codec)
# ---------------------------------------------------------------------------

def encode_avi_mjpeg(jpeg_frames, width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal deterministic AVI writer with MJPEG video frames (the
    classic RIFF layout: hdrl(avih, strl(strh, strf)) + movi('00dc'
    chunks)).  Frames are pre-encoded JPEG bytes (see
    :func:`encode_jpeg_gray`)."""
    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack("<14I", 1_000_000 // fps, max_bytes * fps, 0, 0x10,
                       n, 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII4H",
                                           0, 0, 0, 0, 1, fps, 0, n,
                                           max_bytes, 0, 0, 0, 0,
                                           width, height)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes):
    """Decode an AVI's MJPEG video frames to HxWx3 uint8 RGB arrays.

    Walks the RIFF chunk tree to the ``movi`` list and decodes every
    ``..dc``/``..db`` chunk with :func:`decode_jpeg`.  Undecodable
    individual frames are skipped (same row-not-task contract as the
    other codecs); no frames at all raises ValueError."""
    try:
        frames = _decode_avi(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed AVI: {exc}") from None
    if not frames:
        raise ValueError("AVI with no decodable MJPEG frames")
    return frames


def _decode_avi(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    frames = []

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            payload_start = pos + 8
            payload_end = min(payload_start + size, end)
            if tag == b"LIST":
                kind = data[payload_start:payload_start + 4]
                if kind in (b"movi", b"hdrl", b"rec "):
                    walk(payload_start + 4, payload_end)
            elif tag[2:4] in (b"dc", b"db"):
                try:
                    frames.append(
                        decode_jpeg(data[payload_start:payload_end]))
                except ValueError:
                    pass                        # skip one bad frame
            pos = payload_end + (size & 1)

    walk(12, len(data))
    return frames


def _encode_block(wr, block, pred, dc_codes, ac_codes):
    """DCT + all-ones quant + huffman for one 8x8 block; returns new DC."""
    coefs = _DCT_C @ (block - 128.0) @ _DCT_C.T
    zz = np.round(coefs.reshape(-1)[_ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    s = diff.bit_length() if diff > 0 else (-diff).bit_length()
    code, n = dc_codes[s]
    wr.write(code, n)
    if s:
        wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            code, n = ac_codes[0x00]
            wr.write(code, n)
            break
        while run >= 16:
            code, n = ac_codes[0xF0]
            wr.write(code, n)
            run -= 16
        v = int(zz[k])
        s = v.bit_length() if v > 0 else (-v).bit_length()
        code, n = ac_codes[(run << 4) | s]
        wr.write(code, n)
        wr.write(v if v > 0 else v + (1 << s) - 1, s)
        k += 1
    return int(zz[0])


def encode_jpeg_color(img: np.ndarray) -> bytes:
    """Baseline color JPEG writer with 4:2:0 chroma subsampling — the
    layout virtually every web JPEG uses, so the DECODER's interleaved-
    MCU + upsampling + YCbCr paths get exercised by a self-made fixture.
    All-ones quantization, standard tables for all components.
    Dimensions must be multiples of 16 (one full MCU)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if h % 16 or w % 16:
        raise ValueError("dimensions must be multiples of 16")
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    dc_codes = _encode_codes(_STD_DC_BITS, _STD_DC_SYMS)
    ac_codes = _encode_codes(_STD_AC_BITS, _STD_AC_SYMS)
    wr = _BitWriter()
    preds = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    py, px = my * 16 + by * 8, mx * 16 + bx * 8
                    preds[0] = _encode_block(
                        wr, y[py:py + 8, px:px + 8], preds[0],
                        dc_codes, ac_codes)
            for ci, plane in ((1, cb), (2, cr)):
                py, px = my * 8, mx * 8
                preds[ci] = _encode_block(
                    wr, plane[py:py + 8, px:px + 8], preds[ci],
                    dc_codes, ac_codes)
    wr.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) \
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    for tc, bits, syms in ((0, _STD_DC_BITS, _STD_DC_SYMS),
                           (1, _STD_AC_BITS, _STD_AC_SYMS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) \
            + bytes([tc << 4]) + bytes(bits) + bytes(syms)
    out += b"\xff\xda" + struct.pack(">H", 12) \
        + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 metadata (ISO BMFF box walk — no pixel decode: H.264/VP9 payloads
# genuinely need external codecs; the container METADATA is pure struct)
# ---------------------------------------------------------------------------

def encode_mp4_stub(width: int, height: int, duration_ms: int,
                    codec: bytes = b"avc1",
                    timescale: int = 1000) -> bytes:
    """Minimal deterministic ISO BMFF writer: ftyp + moov(mvhd +
    trak(tkhd + mdia(hdlr + minf(stbl(stsd(codec entry)))))) + empty
    mdat.  Carries real dimensions/duration/codec metadata; no samples
    (fixture-side twin of :func:`parse_mp4_meta`)."""
    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    dur = duration_ms * timescale // 1000
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale,
                                               dur)
               + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
               + bytes(10) + _MP4_UNITY_MATRIX + bytes(24)
               + struct.pack(">I", 2))
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07"
               + struct.pack(">IIII", 0, 0, 1, 0)
               + struct.pack(">I", dur) + bytes(8)
               + struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_UNITY_MATRIX
               + struct.pack(">II", width << 16, height << 16))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"video\x00")
    entry = box(codec, bytes(6) + struct.pack(">H", 1) + bytes(16)
                + struct.pack(">HH", width, height) + bytes(50))
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov + box(b"mdat", b"")


_MP4_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000,
                                0, 0, 0, 0x40000000)


_MJPEG_FOURCCS = (b"mjpa", b"mjpb", b"jpeg", b"MJPG", b"mjpg", b"AVDJ")


def encode_mp4_mjpeg(jpeg_frames, width: int, height: int,
                     timescale: int = 1000, frame_ms: int = 100) -> bytes:
    """REAL Motion-JPEG-in-MP4 writer: ftyp + moov with a full sample
    table (stsd ``mjpa`` entry, stts, stsc, stsz, stco) + an mdat whose
    samples are the pre-encoded JPEG frames laid out as one contiguous
    chunk.  The stco offset is resolved with the classic two-pass trick
    (build moov with a placeholder, rebuild with the real offset — the
    box size does not change).  Twin of :func:`decode_mp4_mjpeg`."""
    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    n = len(jpeg_frames)
    frame_dur = frame_ms * timescale // 1000
    dur = n * frame_dur
    mdat_body = b"".join(jpeg_frames)

    def build_moov(chunk_off: int) -> bytes:
        mvhd = box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0,
                                                   timescale, dur)
                   + struct.pack(">i", 0x00010000)
                   + struct.pack(">h", 0x0100)
                   + bytes(10) + _MP4_UNITY_MATRIX + bytes(24)
                   + struct.pack(">I", 2))
        tkhd = box(b"tkhd", b"\x00\x00\x00\x07"
                   + struct.pack(">IIII", 0, 0, 1, 0)
                   + struct.pack(">I", dur) + bytes(8)
                   + struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_UNITY_MATRIX
                   + struct.pack(">II", width << 16, height << 16))
        hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"video\x00")
        entry = box(b"mjpa", bytes(6) + struct.pack(">H", 1) + bytes(16)
                    + struct.pack(">HH", width, height) + bytes(50))
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stts = box(b"stts", bytes(4) + struct.pack(">III", 1, n,
                                                   frame_dur))
        stsc = box(b"stsc", bytes(4) + struct.pack(">IIII", 1, 1, n, 1))
        stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, n)
                   + b"".join(struct.pack(">I", len(f))
                              for f in jpeg_frames))
        stco = box(b"stco", bytes(4) + struct.pack(">II", 1, chunk_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov = build_moov(0)
    chunk_off = len(ftyp) + len(moov) + 8       # +8 = mdat header
    moov = build_moov(chunk_off)
    return ftyp + moov + box(b"mdat", mdat_body)


def decode_mp4_mjpeg(data: bytes):
    """Decode the Motion-JPEG samples of an ISO BMFF (mp4/mov) payload
    to HxWx3 uint8 RGB arrays — the ONE modern-container pixel path
    stdlib+numpy can make real (every sample is a standalone baseline
    JPEG; :func:`decode_jpeg` does the pixels).

    Walks the box tree for the sample table: stsd must carry an MJPEG
    fourcc (``mjpa``/``mjpb``/``jpeg``/``MJPG``; anything else — avc1,
    vp09 … — raises ValueError, those genuinely need external codecs),
    stsz gives per-sample sizes, stco/co64 the chunk offset.  Samples
    are read contiguously from the first chunk (the layout
    :func:`encode_mp4_mjpeg` writes and the common faststart layout);
    undecodable individual frames are skipped, no frames raises."""
    try:
        frames = _decode_mp4_mjpeg(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed mp4: {exc}") from None
    if not frames:
        raise ValueError("mp4 with no decodable MJPEG samples")
    return frames


def _decode_mp4_mjpeg(data: bytes):
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file")
    info = {"codec": None, "sizes": None, "offset": None}

    def walk(start: int, end: int, depth: int = 0):
        pos = start
        while pos + 8 <= end and depth < 10:
            size, tag = struct.unpack(">I4s", data[pos:pos + 8])
            if size == 1:
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                body = pos + 16
            else:
                body = pos + 8
            if size < 8 or pos + size > end:
                raise ValueError(f"bad box size {size}")
            if tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, pos + size, depth + 1)
            elif tag == b"stsd" and info["codec"] is None:
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                if n >= 1:
                    info["codec"] = data[body + 12:body + 16]
            elif tag == b"stsz" and info["sizes"] is None:
                fixed, cnt = struct.unpack(">II", data[body + 4:body + 12])
                if fixed:
                    info["sizes"] = [fixed] * cnt
                else:
                    info["sizes"] = list(struct.unpack(
                        f">{cnt}I", data[body + 12:body + 12 + 4 * cnt]))
            elif tag == b"stco" and info["offset"] is None:
                cnt = struct.unpack(">I", data[body + 4:body + 8])[0]
                if cnt >= 1:
                    info["offset"] = struct.unpack(
                        ">I", data[body + 8:body + 12])[0]
            elif tag == b"co64" and info["offset"] is None:
                cnt = struct.unpack(">I", data[body + 4:body + 8])[0]
                if cnt >= 1:
                    info["offset"] = struct.unpack(
                        ">Q", data[body + 8:body + 16])[0]
            pos += size

    walk(0, len(data))
    if info["codec"] not in _MJPEG_FOURCCS:
        codec = (info["codec"] or b"?").decode("latin-1", "replace")
        raise ValueError(f"mp4 codec {codec!r} is not MJPEG")
    if not info["sizes"] or info["offset"] is None:
        raise ValueError("mp4 sample table incomplete (stsz/stco)")
    if info["offset"] + sum(info["sizes"]) > len(data):
        raise ValueError("mp4 samples exceed file size")
    frames, pos = [], info["offset"]
    for size in info["sizes"]:
        try:
            frames.append(decode_jpeg(data[pos:pos + size]))
        except ValueError:
            pass                                # skip one bad frame
        pos += size
    return frames


def parse_mp4_meta(data: bytes) -> dict:
    """Extract container metadata from an ISO BMFF (mp4/mov) payload:
    ``{duration_ms, width, height, codec}`` — the fields a corpus
    pipeline filters on (resolution/length gates) without touching the
    coded samples.  Raises ValueError on malformed input."""
    try:
        return _parse_mp4(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed mp4: {exc}") from None


def _parse_mp4(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file")
    meta = {"duration_ms": None, "width": None, "height": None,
            "codec": None}

    def walk(start: int, end: int, depth: int = 0):
        pos = start
        while pos + 8 <= end and depth < 10:
            size, tag = struct.unpack(">I4s", data[pos:pos + 8])
            if size == 1:       # 64-bit size
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                body = pos + 16
            else:
                body = pos + 8
            if size < 8 or pos + size > end:
                raise ValueError(f"bad box size {size}")
            if tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, pos + size, depth + 1)
            elif tag == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[body + 20:
                                                        body + 32])
                else:
                    ts, dur = struct.unpack(">II", data[body + 12:
                                                        body + 20])
                if ts:
                    meta["duration_ms"] = dur * 1000 // ts
            elif tag == b"tkhd":
                ver = data[body]
                off = body + (88 if ver == 1 else 76)
                wfx, hfx = struct.unpack(">II", data[off:off + 8])
                if meta["width"] is None and wfx:
                    meta["width"] = wfx >> 16
                    meta["height"] = hfx >> 16
            elif tag == b"stsd":
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                if n >= 1:
                    fourcc = data[body + 12:body + 16]
                    if meta["codec"] is None:
                        meta["codec"] = fourcc.decode("latin-1")
            pos += size

    walk(0, len(data))
    if meta["duration_ms"] is None and meta["width"] is None:
        raise ValueError("no mp4 metadata boxes found")
    return meta


# --- Matroska / webm (EBML) metadata ------------------------------------
# The container framing is plain EBML (variable-length ids + sizes); the
# resolution/duration/codec gate never touches the coded VP8/VP9 samples,
# so a metadata-only parse is REAL while pixel decode stays codec-bound.
# Element ids per the public Matroska spec (RFC 9559).

_EBML_HEADER = 0x1A45DFA3
_EBML_SEGMENT = 0x18538067
_EBML_INFO = 0x1549A966
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACK_ENTRY = 0xAE
_EBML_VIDEO = 0xE0
_EBML_TIMECODE_SCALE = 0x2AD7B1
_EBML_DURATION = 0x4489
_EBML_CODEC_ID = 0x86
_EBML_PIXEL_WIDTH = 0xB0
_EBML_PIXEL_HEIGHT = 0xBA
_EBML_DOCTYPE = 0x4282


def _ebml_size(n: int) -> bytes:
    """EBML size varint (known length, up to 4 bytes / 2^28-2)."""
    if n < 0x7F:
        return bytes([0x80 | n])
    if n < 0x3FFF:
        return struct.pack(">H", 0x4000 | n)
    if n < 0x1FFFFF:
        return (0x200000 | n).to_bytes(3, "big")
    if n < 0x0FFFFFFF:
        return struct.pack(">I", 0x10000000 | n)
    raise ValueError(f"EBML size too large: {n}")


def _ebml_id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_elem(eid: int, body: bytes) -> bytes:
    return _ebml_id_bytes(eid) + _ebml_size(len(body)) + body


def _ebml_uint(eid: int, value: int) -> bytes:
    body = value.to_bytes(max(1, (value.bit_length() + 7) // 8), "big")
    return _ebml_elem(eid, body)


def encode_webm_meta(width: int, height: int, duration_ms: int,
                     codec_id: str = "V_VP9") -> bytes:
    """Metadata-only webm: EBML header + Segment(Info + Tracks), no
    Clusters — the coded samples are exactly what a metadata gate never
    reads.  TimecodeScale is pinned to 1e6 ns so the float Duration is in
    integral milliseconds and round-trips exactly."""
    header = _ebml_elem(_EBML_HEADER, b"".join((
        _ebml_uint(0x4286, 1),            # EBMLVersion
        _ebml_uint(0x42F7, 1),            # EBMLReadVersion
        _ebml_uint(0x42F2, 4),            # EBMLMaxIDLength
        _ebml_uint(0x42F3, 8),            # EBMLMaxSizeLength
        _ebml_elem(_EBML_DOCTYPE, b"webm"),
        _ebml_uint(0x4287, 2),            # DocTypeVersion
        _ebml_uint(0x4285, 2),            # DocTypeReadVersion
    )))
    info = _ebml_elem(_EBML_INFO, b"".join((
        _ebml_uint(_EBML_TIMECODE_SCALE, 1_000_000),
        _ebml_elem(_EBML_DURATION, struct.pack(">d", float(duration_ms))),
    )))
    video = _ebml_elem(_EBML_VIDEO, b"".join((
        _ebml_uint(_EBML_PIXEL_WIDTH, width),
        _ebml_uint(_EBML_PIXEL_HEIGHT, height),
    )))
    track = _ebml_elem(_EBML_TRACK_ENTRY, b"".join((
        _ebml_uint(0xD7, 1),              # TrackNumber
        _ebml_uint(0x73C5, 1),            # TrackUID
        _ebml_uint(0x83, 1),              # TrackType: video
        _ebml_elem(_EBML_CODEC_ID, codec_id.encode("ascii")),
        video,
    )))
    tracks = _ebml_elem(_EBML_TRACKS, track)
    return header + _ebml_elem(_EBML_SEGMENT, info + tracks)


def _read_ebml_vint(data: bytes, pos: int, strip_marker: bool) -> tuple:
    """(value, next_pos); EBML variable-length integer at ``pos``."""
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint")
    mask = 0x80
    length = 1
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    val = (first & (mask - 1)) if strip_marker else first
    for b in data[pos + 1:pos + length]:
        val = (val << 8) | b
    return val, pos + length


def parse_webm_meta(data: bytes) -> dict:
    """Extract ``{duration_ms, width, height, codec}`` from a webm /
    Matroska payload by walking the EBML tree (Segment > Info for
    TimecodeScale/Duration, Segment > Tracks > TrackEntry > Video for
    dimensions, CodecID for the codec string).  Raises ValueError on
    malformed input or unknown-size elements (our writer and well-formed
    metadata sections always carry known sizes)."""
    try:
        return _parse_webm(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed webm: {exc}") from None


def _parse_webm(data: bytes) -> dict:
    found = {"timecode_scale": 1_000_000, "duration": None,
             "width": None, "height": None, "codec": None}
    containers = {_EBML_SEGMENT, _EBML_INFO, _EBML_TRACKS,
                  _EBML_TRACK_ENTRY, _EBML_VIDEO}

    def walk(start: int, end: int, depth: int = 0) -> None:
        pos = start
        while pos < end and depth < 8:
            eid, pos = _read_ebml_vint(data, pos, strip_marker=False)
            size, pos = _read_ebml_vint(data, pos, strip_marker=True)
            if pos + size > end:
                raise ValueError(f"bad EBML element size {size}")
            if eid in containers:
                walk(pos, pos + size, depth + 1)
            elif eid == _EBML_TIMECODE_SCALE:
                found["timecode_scale"] = int.from_bytes(
                    data[pos:pos + size], "big")
            elif eid == _EBML_DURATION:
                if size == 8:
                    found["duration"] = struct.unpack(
                        ">d", data[pos:pos + 8])[0]
                elif size == 4:
                    found["duration"] = struct.unpack(
                        ">f", data[pos:pos + 4])[0]
            elif eid == _EBML_PIXEL_WIDTH and found["width"] is None:
                found["width"] = int.from_bytes(data[pos:pos + size], "big")
            elif eid == _EBML_PIXEL_HEIGHT and found["height"] is None:
                found["height"] = int.from_bytes(data[pos:pos + size], "big")
            elif eid == _EBML_CODEC_ID and found["codec"] is None:
                found["codec"] = data[pos:pos + size].decode(
                    "ascii", "replace")
            pos += size

    if data[:4] != _ebml_id_bytes(_EBML_HEADER):
        raise ValueError("not an EBML file")
    walk(0, len(data))
    if found["duration"] is None and found["width"] is None:
        raise ValueError("no webm metadata elements found")
    duration_ms = None
    if found["duration"] is not None:
        duration_ms = int(round(
            found["duration"] * found["timecode_scale"] / 1e6))
    return {"duration_ms": duration_ms, "width": found["width"],
            "height": found["height"], "codec": found["codec"]}
