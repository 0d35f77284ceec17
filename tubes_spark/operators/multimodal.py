"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns + a typed
metadata struct.  The Spark-side plumbing (schemas, Arrow-batched
mapInPandas, partition sizing) is real and tested.  Codec status:
header metadata (PNG/GIF/JPEG dims, WAV duration), 24bpp BMP PIXEL
decode (:func:`decode_bmp`), 16-bit PCM WAV decode
(:func:`decode_wav_pcm16`), full PNG PIXEL decode/encode
(:func:`decode_png` / :func:`encode_png` — stdlib zlib inflate +
every unfilter path) and baseline JPEG PIXEL decode/encode
(:func:`decode_jpeg_gray` / :func:`encode_jpeg_gray` — real DCT,
quantization, Annex-K Huffman entropy coding) are REAL, pure
numpy/stdlib, and oracle-gated; only compressed AUDIO codecs
(MP3/AAC/Opus) remain stubbed behind ``decoder=`` hooks
(librosa/ffmpeg are not in this container) with a deterministic fake
so the batch shape / schema path is still exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField, StructType,
)

MEDIA_META = StructType([
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", IntegerType()),
])


def fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: derives a
    feature vector from the md5 of the payload.  Replace with a real
    codec (PIL/librosa) in production — same signature."""
    h = hashlib.md5(data or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "content",
    dim: int = 8,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas keeps decode work executor-side and batch-shaped; at
    100 TB the binary column never moves through the driver and each
    task holds only one Arrow batch in memory.  Raises NotImplementedError
    from the default decoder ONLY if a real codec is requested; the
    deterministic fake keeps plumbing testable in this container."""
    dec = decoder or (lambda b: fake_decode(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "feature": [dec(bytes(x) if x is not None else b"") for x in pdf[bytes_col]],
                "n_bytes": [len(x) if x is not None else 0 for x in pdf[bytes_col]],
            })
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def parse_media_header(data: bytes | None) -> tuple[str, int | None, int | None, int | None]:
    """Pure-stdlib container-header sniffing: ``(mime, width, height,
    duration_ms)`` from the first bytes of a payload.  This is REAL
    metadata (not the fake feature decoder): PNG/GIF/JPEG dimensions and
    WAV duration are fully determined by their headers, no codec needed.
    Unknown/truncated payloads degrade to (application/octet-stream,
    NULL, NULL, NULL) rather than raising — malformed media is data, not
    an error, at corpus scale."""
    b = data or b""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return ("image/png",
                    int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big"), None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return ("image/gif",
                    int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little"), None)
        if b[:2] == b"\xff\xd8":
            # walk JFIF segments to the first SOF marker (C0-CF minus
            # C4/C8/CC which are not frame headers).  Per the marker
            # grammar: 0xFF fill runs precede a marker byte; SOI/TEM/RSTn
            # are length-less; EOI/SOS end the header walk (reading a
            # "length" there would be entropy-coded garbage and could
            # jump past the real SOF); 0xFF00 is a stuffed data byte.
            i = 2
            while i + 1 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                j = i + 1
                while j < len(b) and b[j] == 0xFF:  # fill-byte run
                    j += 1
                if j >= len(b):
                    break
                marker = b[j]
                if marker == 0x00:  # byte-stuffed 0xFF00, not a marker
                    i = j + 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i = j + 1  # length-less markers
                    continue
                if marker in (0xD9, 0xDA):  # EOI / start-of-scan
                    break
                if j + 3 > len(b):
                    break
                seg_len = int.from_bytes(b[j + 1:j + 3], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if j + 8 <= len(b):
                        h = int.from_bytes(b[j + 4:j + 6], "big")
                        w = int.from_bytes(b[j + 6:j + 8], "big")
                        return ("image/jpeg", w, h, None)
                    break
                if seg_len < 2:
                    break  # malformed length; stop rather than loop
                i = j + 1 + seg_len
            return ("image/jpeg", None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            byte_rate = None
            dur = None
            i = 12
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                clen = int.from_bytes(b[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    byte_rate = int.from_bytes(b[i + 16:i + 20], "little")
                elif cid == b"data" and byte_rate:
                    dur = int(clen * 1000 // byte_rate)
                    break
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            return ("audio/wav", None, None, dur)
    except Exception:
        pass
    return ("application/octet-stream", None, None, None)


def decode_headers(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "content",
) -> DataFrame:
    """Populate :data:`MEDIA_META` from payload headers, Arrow-batched.
    Same scale shape as :func:`extract_features` — binary stays
    executor-side, one Arrow batch in memory per task."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_media_header(bytes(x) if x is not None else b"")
                     for x in pdf[bytes_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "mime": [m[0] for m in metas],
                "width": pd.array([m[1] for m in metas], dtype="Int32"),
                "height": pd.array([m[2] for m in metas], dtype="Int32"),
                "duration_ms": pd.array([m[3] for m in metas], dtype="Int32"),
            })

    schema = StructType([StructField("media_id", StringType()), *MEDIA_META.fields])
    return df.mapInPandas(run, schema=schema)


def decode_bmp(data: bytes):
    """Pure-stdlib 24bpp uncompressed BMP pixel decoder -> (H, W, 3)
    uint8 RGB array (top-down).  Handles bottom-up (positive height) and
    top-down (negative height) files and 4-byte row padding.  This is a
    REAL decoder — no codec library needed because BI_RGB stores raw
    pixels — so feature extraction over it produces genuine
    pixel-derived values inside this container (PIL/librosa absent)."""
    import numpy as np

    b = data or b""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    stride = (3 * w + 3) // 4 * 4
    if off + stride * h > len(b):
        raise ValueError("truncated BMP pixel data")
    px = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = px.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # stored BGR -> RGB


def bmp_mean_rgb(data: bytes) -> list[float]:
    """Mean R/G/B over all pixels of a 24bpp BMP — a real pixel-derived
    feature vector (plug into ``extract_features(decoder=...)``).
    Exact: channel sums are small integers, so the float64 means are
    exact rationals an independent engine reproduces bit-for-bit."""
    import numpy as np

    arr = decode_bmp(data).astype(np.float64)
    return [float(x) for x in arr.mean(axis=(0, 1))]


def bmp_ahash_hex(data: bytes) -> str:
    """Perceptual average-hash (aHash) of a 24bpp BMP, as 16 hex chars —
    THE image near-dup primitive: downsample to an 8x8 grid
    (nearest-neighbor sample at cell centers), threshold each cell
    against the grid mean, pack 64 bits.  Near-duplicate images differ
    in a few bits (hamming distance), so downstream dedup is the same
    banded-signature machinery as SimHash.

    Exactness discipline: the cell value is the INTEGER r+g+b sum
    (0..765) and the threshold is total/64.0 — an exact power-of-two
    division — so the hash is bit-reproducible by independent integer
    arithmetic (no float summation order anywhere)."""
    return _ahash_hex_from_array(decode_bmp(data))


def decode_wav_pcm16(data: bytes):
    """Pure-stdlib 16-bit mono PCM WAV decoder -> np.int32 samples.
    Walks RIFF chunks to the `data` chunk; rejects non-PCM/stereo/
    non-16-bit forms loudly rather than mis-decoding."""
    import struct

    import numpy as np

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_ok = 12, False
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels = struct.unpack("<HH", body[:4])
            bits = struct.unpack("<H", body[14:16])[0]
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})")
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok:
                raise ValueError("WAV data chunk before fmt")
            return np.frombuffer(body[: size - size % 2], dtype="<i2").astype(np.int32)
        pos += 8 + size + (size % 2)
    raise ValueError("WAV data chunk missing")


def wav_energy_windows(data: bytes, window: int = 256) -> list[int]:
    """Sum-of-squares energy per fixed-size sample window over decoded
    PCM — the audio feature-extraction analog of bmp_ahash_hex, with
    the same exactness discipline: int16 squares summed as integers,
    no floats anywhere, so an independent engine reproduces every
    window bit-for-bit."""
    s = decode_wav_pcm16(data)
    n = (len(s) // window) * window
    return [int((s[i : i + window].astype("int64") ** 2).sum()) for i in range(0, n, window)]


def _paeth(left, up, upleft):
    """Paeth predictor (PNG spec 9.4), vectorized over numpy arrays."""
    import numpy as np

    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


def encode_png(arr, filters=None) -> bytes:
    """Pure-stdlib PNG writer for (H, W, 3) uint8 RGB arrays: 8-bit
    color type 2, one zlib-deflated IDAT, correct CRCs.  ``filters``
    optionally gives a per-row filter type (0=None 1=Sub 2=Up 3=Average
    4=Paeth, cycled over rows) so decoders can be exercised on every
    unfilter path; default is filter 0 throughout.  The filter passes
    are vectorized (the encoder knows the raw bytes, so left/up/upleft
    are just shifted views)."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError(f"encode_png wants (H, W, 3) RGB, got {ch} channels")
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for r in range(h):
        row = a[r].reshape(-1).astype(np.int32)
        ft = 0 if filters is None else int(filters[r % len(filters)])
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        elif ft == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Pure-stdlib PNG PIXEL decoder -> (H, W, 3) uint8 RGB: chunk walk,
    multi-IDAT zlib inflate, and full per-scanline unfiltering (None/
    Sub/Up/Average/Paeth).  Supports the baseline form this engine
    emits (8-bit, color type 2, no interlace) and rejects other forms
    loudly rather than mis-decoding — the same contract as decode_bmp.

    The None/Up rows unfilter vectorized; Sub/Average/Paeth carry a
    left-neighbor dependency, which is inherently sequential within a
    scanline (a Python loop here).  At corpus scale the decode is still
    Arrow-batched per task via extract_features; swap in an optimized
    codec through the same ``decoder=`` hook when available."""
    import zlib

    import numpy as np

    b = data or b""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w, h, idat = 8, None, None, bytearray()
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        tag = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, comp, filt, interlace = body[8:13]
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not w or not h or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, 3 * w
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


def _ahash_hex_from_array(arr) -> str:
    """64-bit average-hash of an (H, W, 3) uint8 array as 16 hex chars
    — the integer-exact 8x8 grid shared by the BMP and PNG paths (see
    bmp_ahash_hex for the exactness discipline)."""
    a = arr.astype(int)
    h, w = a.shape[:2]
    rows = [(2 * i + 1) * h // 16 for i in range(8)]
    cols = [(2 * j + 1) * w // 16 for j in range(8)]
    cells = [[int(a[r, c].sum()) for c in cols] for r in rows]
    mean = sum(sum(r) for r in cells) / 64.0
    bits = 0
    for i in range(8):
        for j in range(8):
            if cells[i][j] > mean:
                bits |= 1 << (8 * i + j)
    return format(bits, "016x")


def png_ahash_hex(data: bytes) -> str:
    """Perceptual average-hash of a PNG payload (real inflate + unfilter
    + 8x8 integer grid) — the PNG sibling of bmp_ahash_hex; identical
    pixels produce identical hashes across the two codecs."""
    return _ahash_hex_from_array(decode_png(data))


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81), grayscale, pure numpy/stdlib — the last
# entropy-coded codec, now REAL: DCT + quantization + Huffman entropy
# coding on the encode side; marker parse + Huffman decode + dequant +
# IDCT on the decode side.  Standard Annex K luminance Huffman tables.
# --------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.1 / K.3.2: standard luminance DC and AC Huffman tables
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# default quant table: DC step 1, AC step 2.  Flat 8x8 blocks have AC
# exactly 0 and a DC divisible by the step, so they roundtrip pixel-
# EXACT (the property the oracle query builds on); general content
# quantizes with |error| <= 1 per AC coefficient.  AC step 2 also caps
# the coded magnitude at 512 < 1024, inside the standard AC table's
# 10-bit category range for any uint8 input.
_JPEG_QUANT_DEFAULT = [1] + [2] * 63


def _jpeg_dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


def _jpeg_canonical_codes(bits):
    """Annex C code generation: (code, length) per symbol in table order."""
    out, code = [], 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln))
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


def _jpeg_magnitude(v: int):
    """(category, appended-bits) for a DC diff / AC value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    cat = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_gray(arr, quant=None) -> bytes:
    """Pure numpy/stdlib baseline JPEG encoder for (H, W) uint8
    grayscale: level shift, orthonormal 8x8 DCT, quantization, DC
    differential + AC run-length coding, standard Annex K Huffman
    tables, correct byte stuffing.  Edge-replicates to 8x8 MCUs; true
    dimensions ride in SOF0 so the decoder crops back."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_jpeg_gray wants (H, W) grayscale")
    h, w = a.shape
    # quant tables are SPECIFIED in zigzag order (DQT stores them that
    # way); re-lay to natural order for the coefficient grid
    qnat = np.empty(64)
    qz = np.array(quant if quant is not None else _JPEG_QUANT_DEFAULT, dtype=np.float64)
    # a 0 entry would divide to inf mid-DCT and a >255 entry only fails
    # later inside bytes() during DQT assembly — reject at the boundary
    if qz.shape != (64,) or not np.all((qz >= 1) & (qz <= 255)):
        raise ValueError("quant must be 64 entries, each in 1..255")
    for zi, nat in enumerate(_JPEG_ZIGZAG):
        qnat[nat] = qz[zi]
    qnat = qnat.reshape(8, 8)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64) - 128.0
    C = _jpeg_dct_matrix()
    dc_code = dict(zip(_JPEG_DC_VALS, _jpeg_canonical_codes(_JPEG_DC_BITS)))
    ac_code = dict(zip(_JPEG_AC_VALS, _jpeg_canonical_codes(_JPEG_AC_BITS)))
    bw = _JpegBitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            blk = padded[by:by + 8, bx:bx + 8]
            coef = C @ blk @ C.T
            lev = np.round(coef / qnat).astype(np.int64)
            zz = [int(lev.reshape(-1)[nat]) for nat in _JPEG_ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            cat, bits = _jpeg_magnitude(diff)
            code, ln = dc_code[cat]
            bw.write(code, ln)
            if cat:
                bw.write(bits, cat)
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_code[0xF0]     # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat, bits = _jpeg_magnitude(v)
                code, ln = ac_code[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(bits, cat)
                run = 0
            if run:
                code, ln = ac_code[0x00]         # EOB
                bw.write(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(int(x) for x in qz))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)) + \
        seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bw.flush() + b"\xff\xd9"


class _JpegBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.pos += 1                    # unstuff 0xFF00
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v


def _jpeg_decode_huff_table(bits, vals):
    return {cl: sym for sym, cl in zip(vals, _jpeg_canonical_codes(bits))}


def _jpeg_read_symbol(br: _JpegBitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read(1)
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in JPEG stream")


def _jpeg_extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_gray(data: bytes):
    """Pure numpy/stdlib baseline JPEG PIXEL decoder -> (H, W) uint8
    grayscale: marker walk, DQT/DHT/SOF0/SOS parse, Huffman entropy
    decode (with unstuffing), dequantization, inverse zigzag, IDCT,
    crop to the SOF dimensions.  Supports the baseline single-component
    form this engine emits (SOF0, 8-bit, no subsampling, no restart
    intervals) and rejects other forms loudly — same contract as
    decode_bmp/decode_png."""
    import numpy as np

    b = data or b""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant = {}
    dc_tabs, ac_tabs = {}, {}
    h = w = None
    comp_q = comp_dc = comp_ac = None
    entropy = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported")
                quant[tq] = list(body[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _jpeg_decode_huff_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = body[0], int.from_bytes(body[1:3], "big"), \
                int.from_bytes(body[3:5], "big"), body[5]
            if prec != 8 or nc != 1 or body[7] != 0x11:
                raise ValueError(
                    "unsupported JPEG (only 8-bit single-component 1x1 baseline)"
                )
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG frame type (baseline SOF0 only)")
        elif marker == 0xDD:
            if int.from_bytes(body[:2], "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            if body[0] != 1:
                raise ValueError("unsupported JPEG (multi-component scan)")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            entropy = b[pos + 2 + ln:]
            break
        pos += 2 + ln
    if h is None or entropy is None or comp_q not in quant:
        raise ValueError("truncated JPEG (missing SOF/SOS/DQT)")
    qnat = np.empty(64)
    for zi, nat in enumerate(_JPEG_ZIGZAG):
        qnat[nat] = quant[comp_q][zi]
    qnat = qnat.reshape(8, 8)
    dct = dc_tabs[comp_dc]
    act = ac_tabs[comp_ac]
    C = _jpeg_dct_matrix()
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    br = _JpegBitReader(entropy)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = [0] * 64
            cat = _jpeg_read_symbol(br, dct)
            prev_dc += _jpeg_extend(br.read(cat), cat) if cat else 0
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _jpeg_read_symbol(br, act)
                if sym == 0x00:                  # EOB
                    break
                run, cat = sym >> 4, sym & 0x0F
                if cat == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    k += 16                      # ZRL
                    continue
                k += run
                if k >= 64:
                    raise ValueError("AC run past block end")
                zz[k] = _jpeg_extend(br.read(cat), cat)
                k += 1
            lev = np.zeros(64)
            for zi, nat in enumerate(_JPEG_ZIGZAG):
                lev[nat] = zz[zi]
            coef = lev.reshape(8, 8) * qnat
            out[by:by + 8, bx:bx + 8] = C.T @ coef @ C
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


def jpeg_ahash_hex(data: bytes) -> str:
    """Perceptual average-hash of a baseline JPEG payload (real Huffman
    + dequant + IDCT decode) — completes the codec family next to
    bmp_ahash_hex / png_ahash_hex; grayscale pixels are stacked to the
    shared 3-channel integer grid so identical luma hashes identically
    across codecs."""
    import numpy as np

    g = decode_jpeg_gray(data)
    return _ahash_hex_from_array(np.repeat(g[..., None], 3, axis=2))


# IMA ADPCM (Interactive Multimedia Association, "DVI4") — the classic
# table-driven 4-bit-per-sample speech codec (RFC 3551 §4.5.1 describes
# the same scheme).  No entropy coding: each nibble quantizes the delta
# to a step-table-scaled magnitude, and BOTH sides run the identical
# predictor state machine — which is what makes the decode exactly
# reproducible by an independent engine (the oracle replays the state
# machine as a DuckDB recursive CTE over the same integer tables).
_ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_ADPCM_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]  # by magnitude bits (sign-mirrored)


def _adpcm_step_state(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One decoder state transition: (pred', idx') after `nibble`."""
    step = _ADPCM_STEPS[idx]
    mag = nibble & 7
    delta = step >> 3
    if mag & 4:
        delta += step
    if mag & 2:
        delta += step >> 1
    if mag & 1:
        delta += step >> 2
    pred = pred - delta if nibble & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _ADPCM_INDEX[mag]))
    return pred, idx


def encode_adpcm_ima(samples) -> bytes:
    """Encode int16 mono samples to a self-describing IMA-ADPCM payload:
    b'ADP1' + uint32 LE n_samples + int16 LE init predictor + uint8
    init index + 1 pad byte, then packed nibbles (low nibble = earlier
    sample).  Initial state is (0, 0) — no per-block headers, one
    stream, which keeps the roundtrip fuzzable in one call."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim != 1:
        raise ValueError("encode_adpcm_ima wants a 1-D sample vector")
    if len(s) and (s.max() > 32767 or s.min() < -32768):
        raise ValueError("samples must fit int16")
    pred, idx = 0, 0
    nibbles = []
    for x in s:
        diff = int(x) - pred
        nib = 8 if diff < 0 else 0
        diff = abs(diff)
        step = _ADPCM_STEPS[idx]
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        nibbles.append(nib)
        pred, idx = _adpcm_step_state(nib, pred, idx)
    out = bytearray(struct.pack("<4sIhBB", b"ADP1", len(s), 0, 0, 0))
    for j in range(0, len(nibbles) - 1, 2):
        out.append(nibbles[j] | (nibbles[j + 1] << 4))
    if len(nibbles) % 2:
        out.append(nibbles[-1])
    return bytes(out)


def decode_adpcm_ima(data: bytes):
    """Decode an ``encode_adpcm_ima`` payload back to np.int16 samples.
    Real table-driven decode (steps/index tables above) — the
    compressed-AUDIO slot next to the PCM WAV parser; `multimodal_
    adpcm_energy` hash-gates this against a DuckDB recursive-CTE replay
    of the same state machine."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"ADP1":
        raise ValueError("not an ADP1 payload")
    n, pred, idx, _pad = struct.unpack("<IhBB", data[4:12])
    body = data[12:]
    if len(body) < (n + 1) // 2:
        raise ValueError("truncated ADP1 body")
    if idx > 88:
        raise ValueError("ADP1 index out of range")
    out = np.empty(n, dtype=np.int16)
    for t in range(n):
        b = body[t >> 1]
        nib = (b >> 4) & 0xF if t & 1 else b & 0xF
        pred, idx = _adpcm_step_state(nib, pred, idx)
        out[t] = pred
    return out


def adpcm_energy_windows(data: bytes, window: int = 64) -> list[int]:
    """Sum-of-squares energy per window over ADPCM-decoded samples —
    same exactness discipline as :func:`wav_energy_windows` (integer
    squares, integer sums, no floats)."""
    s = decode_adpcm_ima(data).astype("int64")
    n = (len(s) // window) * window
    return [int((s[i : i + window] ** 2).sum()) for i in range(0, n, window)]


def real_decode_stub(data: bytes) -> list[float]:
    """The production decoder slot for codecs NOT implemented in this
    container (PERCEPTUAL audio — MP3/AAC/Opus need librosa/ffmpeg).
    BMP, PCM WAV, IMA-ADPCM, PNG and baseline JPEG decode are REAL
    above."""
    raise NotImplementedError(
        "perceptual-audio decoding needs librosa/ffmpeg; wire your codec "
        "into extract_features(decoder=...)"
    )


def frame_sample_plan(df: DataFrame, every_ms: int, bytes_col: str = "content") -> DataFrame:
    """Video frame-sampling *plan* shape: explode per-frame offsets from
    metadata (real frame grab stubbed).  Demonstrates the schema and the
    explode-based row fan-out that a real sampler would use."""
    return df.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
