"""Real media codecs for the multimodal pipeline — SURVEY.md §2 media.

The reference treats media as opaque payloads; the engine's decode
step (multimodal.extract_features) needs actual bytes→pixels kernels.
Production installs use PIL/ffmpeg; this container has neither, so the
decode dispatcher is layered:

1. **PIL fast path** (import-gated, like the Excel bridge in
   sources/readers.py): if `PIL.Image` imports, every format PIL
   knows decodes through it.
2. **Pure-stdlib fallback** (always available, used by CI): real
   decoders for PNG (zlib inflate + full scanline-filter inversion,
   8-bit gray/RGB/RGBA, non-interlaced), 24-bit BMP, binary PPM (P6),
   and 16-bit PCM WAV — enough to verify the pipeline end-to-end on
   genuine encoded bytes, not a hash-of-payload fake.

Matching pure encoders (PNG with selectable filter type, BMP, PPM,
WAV) exist so tests and the driver fixture can synthesize real
payloads deterministically without any third-party dependency.

These kernels run INSIDE Arrow-batched `mapInPandas` workers on
payloads that are already local bytes — per-image Python cost is the
irreducible decode work, not a row-at-a-time expression UDF. At 100 TB
the parallelism comes from partitioning the media table, never from
this module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

try:  # import-gated fast path; the stdlib fallback is always present
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - PIL absent in this container
    _PILImage = None

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type -> channel count (8-bit, non-interlaced support only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------- PNG

def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, {1,3,4}) uint8 array as a real PNG.

    ``filter_type`` applies one scanline filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) to every row — exercising the decoder's full
    unfilter matrix from tests without PIL."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    raw = bytearray()
    bpp = ch  # bytes per pixel at bit depth 8
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        row = arr[r].reshape(-1)
        filt = _apply_filter(filter_type, row, prev, bpp)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _apply_filter(ft: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward PNG scanline filter (encoder side), mod-256 arithmetic."""
    if ft == 0:
        return row
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    up = prev
    upleft = np.zeros_like(row)
    upleft[bpp:] = prev[:-bpp]
    r = row.astype(np.int16)
    if ft == 1:
        return (r - left).astype(np.uint8)
    if ft == 2:
        return (r - up).astype(np.uint8)
    if ft == 3:
        return (r - ((left.astype(np.int16) + up) // 2)).astype(np.uint8)
    if ft == 4:
        pred = _paeth(left.astype(np.int16), up.astype(np.int16), upleft.astype(np.int16))
        return (r - pred).astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {ft}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray/RGB/RGBA) to an
    (h, w, ch) uint8 array. Inverts all five scanline filters."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w = 8, 0
    idat = bytearray()
    h = bit_depth = color_type = interlace = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); install PIL for full coverage"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)], dtype=np.uint8
        )
        out[r] = _unfilter(ft, line, prev, ch)
        prev = out[r]
    return out.reshape(h, w, ch)


def _unfilter(ft: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Invert one PNG scanline filter. Sub/Average/Paeth recurrences
    are sequential in the pixel index, so those three run a per-pixel
    loop over the (already tiny) scanline; None/Up stay vectorized."""
    if ft == 0:
        return line.copy()
    if ft == 2:
        return (line.astype(np.int16) + prev).astype(np.uint8)
    out = np.zeros_like(line)
    for i in range(len(line)):
        a = int(out[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ft == 1:
            pred = a
        elif ft == 3:
            pred = (a + b) // 2
        elif ft == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[i] = (int(line[i]) + pred) & 0xFF
    return out


# ---------------------------------------------------------------- BMP

def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row pad)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("BMP encoder supports RGB only")
    row_size = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        bgr = arr[r, :, ::-1].tobytes()
        body.extend(bgr)
        body.extend(b"\x00" * (row_size - len(bgr)))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", payload[10:14])
    _, w, h, _, bpp, compression = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"unsupported BMP (bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_size
        row = np.frombuffer(payload[start : start + w * 3], dtype=np.uint8)
        r = (h - 1 - i) if bottom_up else i
        out[r] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------- PPM

def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("PPM encoder supports RGB only")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to (h, w, 3) uint8 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments unsupported — synthetic fixtures never emit them)
    fields, pos = [], 2
    while len(fields) < 3:
        while payload[pos] in b" \t\r\n":
            pos += 1
        start = pos
        while payload[pos] not in b" \t\r\n":
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    return (
        np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono PCM samples as a WAV container (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to (samples int16 [n, channels], rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        data = np.frombuffer(f.readframes(n), dtype="<i2").reshape(n, ch)
    return data, rate


# ---------------------------------------------------------- dispatch

def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, ch) uint8 array.

    PIL first when importable (full format coverage); otherwise the
    stdlib decoders by magic-byte sniff. Unknown formats raise
    NotImplementedError with the stub boundary spelled out."""
    if _PILImage is not None:  # pragma: no cover - PIL absent here
        arr = np.asarray(_PILImage.open(io.BytesIO(payload)))
        return arr[:, :, None] if arr.ndim == 2 else arr
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "unrecognized image format and PIL unavailable; "
        "supported without PIL: PNG (8-bit), BMP (24-bit), PPM (P6)"
    )
