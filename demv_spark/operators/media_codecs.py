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

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    bit_depth: int = 8,
    trns: "bytes | None" = None,
    filter_type: int = 0,
) -> bytes:
    """Encode an (h, w) uint8 INDEX array + (n, 3) RGB palette as a
    real indexed-color PNG (color type 3) at bit depth 1/2/4/8 —
    the icon/graphic format crawls are full of. Sub-byte depths pack
    indices MSB-first with zero-padded row tails (RFC 2083 §2.3);
    filters run over the PACKED bytes with bpp=1, like every
    conformant encoder. Optional ``trns`` bytes give per-index
    alpha."""
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError(f"palette PNG bit depth must be 1/2/4/8, got {bit_depth}")
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("expected (h, w) indices and (n, 3) palette")
    n = palette.shape[0]
    if n > (1 << bit_depth):
        raise ValueError(f"palette of {n} entries needs more than {bit_depth} bits")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("index out of palette range")
    if trns is not None and len(trns) > n:
        raise ValueError(
            f"tRNS has {len(trns)} entries for a {n}-entry palette"
        )
    h, w = indices.shape
    raw = bytearray()
    prev = None
    for r in range(h):
        if bit_depth == 8:
            packed = indices[r]
        else:
            bits = np.unpackbits(
                indices[r][:, None], axis=1, bitorder="big"
            )[:, 8 - bit_depth :]
            flat = bits.reshape(-1)
            pad = (-len(flat)) % 8
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
            packed = np.packbits(flat, bitorder="big")
        if prev is None:
            prev = np.zeros_like(packed)
        filt = _apply_filter(filter_type, packed, prev, 1)
        raw.append(filter_type)
        raw.extend(np.asarray(filt, dtype=np.uint8).tobytes())
        prev = packed
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 3, 0, 0, 0)
    out = PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(trns))
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


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
    """Decode a non-interlaced PNG to an (h, w, ch) uint8 array:
    8-bit gray/RGB/RGBA, plus INDEXED color (type 3) at bit depth
    1/2/4/8 — palette pixels expand through PLTE to RGB, or to RGBA
    when a tRNS chunk carries per-index alpha. Inverts all five
    scanline filters (over packed bytes with bpp=1 for indexed
    rows, per the spec)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w = 8, 0
    idat = bytearray()
    plte = trns = None
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
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    indexed = color_type == 3
    ok = interlace == 0 and (
        (bit_depth == 8 and color_type in _PNG_CHANNELS)
        or (indexed and bit_depth in (1, 2, 4, 8))
    )
    if not ok:
        raise NotImplementedError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); install PIL for full coverage"
        )
    raw = zlib.decompress(bytes(idat))
    if indexed:
        if plte is None:
            raise ValueError("indexed PNG without a PLTE chunk")
        stride = (w * bit_depth + 7) // 8
        bpp = 1
    else:
        ch = _PNG_CHANNELS[color_type]
        stride = w * ch
        bpp = ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)], dtype=np.uint8
        )
        out[r] = _unfilter(ft, line, prev, bpp)
        prev = out[r]
    if not indexed:
        return out.reshape(h, w, ch)
    if bit_depth == 8:
        idx = out[:, :w]
    else:
        # unpack the packed rows, group bit_depth MSB-first bits per
        # pixel, fold back to an index
        bits = np.unpackbits(out, axis=1, bitorder="big")
        grouped = bits[:, : w * bit_depth].reshape(h, w, bit_depth)
        idx = np.zeros((h, w), dtype=np.uint8)
        for b in range(bit_depth):
            idx = (idx << 1) | grouped[:, :, b]
    if int(idx.max(initial=0)) >= plte.shape[0]:
        raise ValueError("palette index out of PLTE range")
    rgb = plte[idx]
    if trns is None:
        return rgb
    if len(trns) > plte.shape[0]:
        raise ValueError(
            f"invalid PNG: tRNS has {len(trns)} entries for a "
            f"{plte.shape[0]}-entry PLTE"
        )
    alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
    alpha[: len(trns)] = trns
    return np.dstack([rgb, alpha[idx]])


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
    if payload[:2] == JPEG_MAGIC:
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    raise NotImplementedError(
        "unrecognized image format and PIL unavailable; supported "
        "without PIL: PNG (8-bit), BMP (24-bit), PPM (P6), JPEG "
        "(baseline gray + 4:4:4/4:2:2/4:2:0 color), GIF"
    )


# --------------------------------------------------------------- JPEG
# Grayscale BASELINE JPEG (ITU T.81 sequential DCT, 8-bit, one
# component) in pure stdlib+numpy — the dominant real-world image
# format gets a real decode path even without PIL (when PIL imports,
# decode_image prefers it and covers color/progressive too). The
# boundary is crisp: multi-component (color), progressive (SOF2),
# 12-bit and restart-interval streams raise NotImplementedError.
#
# The matching encoder exists for fixtures/tests: with the default
# quant steps an image whose 8x8 tiles are CONSTANT round-trips
# BIT-EXACTLY (each block quantizes to a lone DC coefficient that the
# dc_step divides), which is what lets the driver oracle re-derive
# decoded-pixel functions (dHash) in closed form despite JPEG being
# lossy in general.

JPEG_MAGIC = b"\xff\xd8"

# natural order index for each zigzag position (T.81 Figure A.6)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# standard luminance Huffman tables (T.81 Annex K.3)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_dct_matrix() -> "np.ndarray":
    """Orthonormal 8-point DCT-II matrix C (T.81 A.3.3 scaling):
    F = C f Cᵀ, f = Cᵀ F C."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, for the decoder."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:       # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)

    def restart_marker(self, idx: int) -> None:
        """1-pad to a byte boundary and emit RSTn (n = idx mod 8) —
        markers are raw, never byte-stuffed (T.81 B.2.1)."""
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        self.out.append(0xFF)
        self.out.append(0xD0 + (idx % 8))


def _jpeg_category(v: int) -> int:
    """Bit category of a coefficient value (T.81 F.1.2.1.1)."""
    return int(abs(v)).bit_length()


def _check_jpeg_steps(dc_step, ac_step) -> None:
    if int(dc_step) < 1 or int(ac_step) < 1:
        raise ValueError(
            f"dc_step/ac_step must be >= 1 (got {dc_step}/{ac_step}): "
            "a zero quant step divides by zero, and sub-1 steps could "
            "push AC coefficients past the baseline Huffman range"
        )


def _jpeg_container(
    h: int,
    w: int,
    samplings: "list[int]",
    qnat: "np.ndarray",
    data: bytes,
    restart_interval: int,
) -> bytes:
    """Assemble the marker stream around an entropy-coded scan:
    SOI/DQT/SOF0/DHT[/DRI]/SOS + data + EOI, shared by all three
    encoders. ``samplings`` is the per-component sampling byte list
    (component ids are 1..n, everything uses quant slot 0 and
    Huffman pair 0)."""

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    ncomp = len(samplings)
    qzz = bytes(int(qnat.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([i + 1, s, 0]) for i, s in enumerate(samplings)
    )
    sos = bytes([ncomp]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(ncomp)
    ) + bytes([0, 63, 0])
    out = bytearray(JPEG_MAGIC)                        # SOI
    out += seg(0xFFDB, b"\x00" + qzz)                  # DQT, 8-bit, id 0
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", int(restart_interval)))
    out += seg(0xFFDA, sos)
    out += data
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def _encode_block(
    bw: "_BitWriter",
    block_u8: "np.ndarray",
    qnat: "np.ndarray",
    c: "np.ndarray",
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    ac_step,
) -> int:
    """FDCT + quantize + Huffman-code ONE 8x8 uint8 block into the
    bit stream; returns the new DC predictor (T.81 F.1.2). Shared by
    the grayscale and color encoders — color interleaves per-component
    blocks with independent predictors."""
    block = block_u8.astype(np.float64) - 128.0
    coef = c @ block @ c.T
    quant = np.rint(coef / qnat).astype(np.int64)
    zz = [int(quant.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64)]
    # DC: category + appended bits of the difference
    diff = zz[0] - pred
    pred = zz[0]
    s = _jpeg_category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    # AC: run-length of zeros, ZRL for 16, EOB at end
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_codes[0xF0]
            bw.write(zcode, zlen)
            run -= 16
        s = _jpeg_category(v)
        if s > 10:
            # the baseline Annex-K AC table only defines (run, size)
            # symbols up to size 10; |quantized AC| >= 1024 is
            # reachable with small ac_step on high-contrast blocks
            # (theoretical max ~2048)
            raise ValueError(
                f"quantized AC coefficient {v} exceeds the baseline "
                f"Huffman range (|AC| < 1024); raise ac_step "
                f"(got ac_step={ac_step})"
            )
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]   # EOB
        bw.write(code, length)
    return pred


# JFIF/BT.601 color-transform coefficients. Both directions use the
# floor(x + 0.5) rounding convention on LEFT-ASSOCIATIVE double
# expressions, so a SQL oracle can reproduce every transformed pixel
# bit-exactly (same IEEE literals, same op order, same floor) — the
# color analogue of the grayscale lossless-tile corner.
_YCC_FWD = (
    (0.299, 0.587, 0.114),
    (-0.168735892, -0.331264108, 0.5),
    (0.5, -0.418687589, -0.081312411),
)
_YCC_INV_R_CR = 1.402
_YCC_INV_G_CB = 0.344136286
_YCC_INV_G_CR = 0.714136286
_YCC_INV_B_CB = 1.772


def rgb_to_ycbcr_u8(arr: "np.ndarray") -> "np.ndarray":
    """(h, w, 3) uint8 RGB → uint8 YCbCr with floor(x+0.5) rounding
    (NOT numpy rint ties-to-even — floor keeps the transform exactly
    reproducible as FLOOR(expr + 0.5) in any SQL engine)."""
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = _YCC_FWD[0][0] * r + _YCC_FWD[0][1] * g + _YCC_FWD[0][2] * b
    cb = 128.0 + _YCC_FWD[1][0] * r + _YCC_FWD[1][1] * g + _YCC_FWD[1][2] * b
    cr = 128.0 + _YCC_FWD[2][0] * r + _YCC_FWD[2][1] * g + _YCC_FWD[2][2] * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb_u8(arr: "np.ndarray") -> "np.ndarray":
    """(h, w, 3) uint8 YCbCr → uint8 RGB, floor(x+0.5) convention
    (see rgb_to_ycbcr_u8)."""
    y = arr[:, :, 0].astype(np.float64)
    cb = arr[:, :, 1].astype(np.float64) - 128.0
    cr = arr[:, :, 2].astype(np.float64) - 128.0
    r = y + _YCC_INV_R_CR * cr
    g = y - _YCC_INV_G_CB * cb - _YCC_INV_G_CR * cr
    b = y + _YCC_INV_B_CB * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def encode_jpeg_color(
    arr: "np.ndarray",
    dc_step: int = 8,
    ac_step: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a real baseline COLOR
    JPEG: YCbCr 4:4:4, interleaved 1-block-per-component MCUs,
    independent per-component DC predictors, one shared quant table
    and one shared (DC, AC) Huffman pair for all three components —
    all legal baseline (T.81 allows ≤4 quant / ≤2+2 Huffman slots;
    sharing slot 0 is the degenerate case every decoder handles).

    Same lossless corner as the grayscale encoder, per CHANNEL: an
    image of constant 8x8 RGB tiles converts to constant YCbCr tiles
    (integers, via the floor(x+0.5) transform), each quantizing to a
    lone losslessly-coded DC at the default dc_step=8 — so
    decode_jpeg returns the exact YCbCr→RGB round-trip of the input,
    reproducible pixel-for-pixel in closed-form SQL."""
    _check_jpeg_steps(dc_step, ac_step)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg_color expects an (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    ycc = rgb_to_ycbcr_u8(arr)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    qnat = np.full((8, 8), int(ac_step), dtype=np.int32)
    qnat[0, 0] = int(dc_step)
    c = _jpeg_dct_matrix()
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_n = rst_n = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.restart_marker(rst_n)
                rst_n += 1
                preds = [0, 0, 0]
            mcu_n += 1
            for comp in range(3):                # interleaved MCU
                preds[comp] = _encode_block(
                    bw,
                    padded[by : by + 8, bx : bx + 8, comp],
                    qnat, c, dc_codes, ac_codes, preds[comp], ac_step,
                )
    data = bw.flush()
    # 3 components, all 1x1 sampling (4:4:4)
    return _jpeg_container(h, w, [0x11, 0x11, 0x11], qnat, data,
                           restart_interval)


def encode_jpeg_420(
    arr: "np.ndarray",
    dc_step: int = 8,
    ac_step: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:2:0 COLOR
    JPEG — the dominant crawl/camera variant: Y at full resolution
    (2x2 sampling), Cb/Cr downsampled 2× per axis by integer box
    average with round-half-up ((sum + 2) // 4), interleaved
    16×16-pixel MCUs of 4 Y + 1 Cb + 1 Cr blocks, shared quant and
    Huffman tables (all legal baseline).

    Lossless corner, 4:2:0 edition: an image of constant 16×16 RGB
    MACRO-tiles gives 4 constant Y blocks and (box-average of a
    constant =) constant chroma blocks per MCU — every block
    quantizes to a lone losslessly-coded DC at dc_step=8, so
    ``decode_jpeg`` returns the exact YCbCr→RGB round-trip of the
    input, closed-form in SQL exactly like the 4:4:4 encoder."""
    _check_jpeg_steps(dc_step, ac_step)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg_420 expects an (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    ycc = rgb_to_ycbcr_u8(arr)
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    yplane = padded[:, :, 0]
    # 2x2 box average, round-half-up — integer-exact and therefore
    # SQL-reproducible (a plain mean would round ties bankers-style)
    chroma = padded[:, :, 1:].astype(np.int64)
    csum = (
        chroma[0::2, 0::2] + chroma[0::2, 1::2]
        + chroma[1::2, 0::2] + chroma[1::2, 1::2]
    )
    cplanes = ((csum + 2) // 4).astype(np.uint8)   # (ph/2, pw/2, 2)

    qnat = np.full((8, 8), int(ac_step), dtype=np.int32)
    qnat[0, 0] = int(dc_step)
    c = _jpeg_dct_matrix()
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_n = rst_n = 0
    for my in range(0, ph, 16):
        for mx in range(0, pw, 16):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.restart_marker(rst_n)
                rst_n += 1
                preds = [0, 0, 0]
            mcu_n += 1
            for bv in range(2):                  # 4 Y blocks, raster
                for bhz in range(2):
                    preds[0] = _encode_block(
                        bw,
                        yplane[
                            my + bv * 8 : my + bv * 8 + 8,
                            mx + bhz * 8 : mx + bhz * 8 + 8,
                        ],
                        qnat, c, dc_codes, ac_codes, preds[0], ac_step,
                    )
            for comp in (1, 2):                  # 1 Cb + 1 Cr block
                preds[comp] = _encode_block(
                    bw,
                    cplanes[
                        my // 2 : my // 2 + 8,
                        mx // 2 : mx // 2 + 8,
                        comp - 1,
                    ],
                    qnat, c, dc_codes, ac_codes, preds[comp], ac_step,
                )
    data = bw.flush()
    # Y 2x2, Cb/Cr 1x1 (4:2:0)
    return _jpeg_container(h, w, [0x22, 0x11, 0x11], qnat, data,
                           restart_interval)


def encode_jpeg_gray(
    arr: "np.ndarray",
    dc_step: int = 8,
    ac_step: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) or (h, w, 1) uint8 array as a real baseline
    grayscale JPEG (SOI/DQT/SOF0/DHT/SOS, standard Annex-K Huffman
    tables, byte-stuffed entropy stream). Edge blocks pad by
    replication. With ``dc_step`` dividing 8·(c−128) for every block
    constant c — any integer c at the default dc_step=8 — an image of
    constant 8x8 tiles survives encode→decode bit-exactly (all AC
    coefficients are exactly 0; the DC quantizes losslessly)."""
    _check_jpeg_steps(dc_step, ac_step)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("JPEG encoder supports grayscale only")
        arr = arr[:, :, 0]
    h, w = arr.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")

    # quant table in NATURAL order; zigzag index 0 is the DC
    qnat = np.full((8, 8), int(ac_step), dtype=np.int32)
    qnat[0, 0] = int(dc_step)
    c = _jpeg_dct_matrix()

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    pred = 0
    mcu_n = rst_n = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.restart_marker(rst_n)
                rst_n += 1
                pred = 0
            mcu_n += 1
            block = padded[by : by + 8, bx : bx + 8]
            pred = _encode_block(
                bw, block, qnat, c, dc_codes, ac_codes, pred, ac_step
            )
    data = bw.flush()
    return _jpeg_container(h, w, [0x11], qnat, data, restart_interval)


# progressive AC Huffman table: the Annex-K baseline table has no
# EOBn symbols (0x10..0xE0), which progressive AC scans require, so
# the progressive encoder ships its own flat table — every symbol it
# can emit (EOB runs n=0..14, ZRL, and (run,size) for size 1..10) at
# code length 8 (176 codes < 255, all-ones code unassigned: valid
# per T.81 C.2). Decoders rebuild it from the DHT segment like any
# other table; compression optimality is not a goal of this encoder.
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_PROG_AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _jpeg_quant_zigzag(channel: "np.ndarray", qnat, c) -> "np.ndarray":
    """FDCT + quantize one uint8 channel into (bh, bw, 64)
    ZIGZAG-ordered int32 coefficients (edge blocks pad by
    replication) — the front half of the PROGRESSIVE encoder, which
    must materialize all coefficients before scan planning. The
    baseline encoders keep their fused streaming path
    (``_encode_block``: FDCT+quantize+Huffman per block, no
    materialization); both use the same ``np.rint(coef / qnat)``
    quantization, pinned equal by the progressive≡baseline decode
    tests."""
    h, w = channel.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(channel, ((0, ph - h), (0, pw - w)), mode="edge")
    bh, bw = ph // 8, pw // 8
    out = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            block = (
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    np.float64
                )
                - 128.0
            )
            quant = np.rint((c @ block @ c.T) / qnat).astype(np.int64)
            out[by, bx] = quant.reshape(-1)[_JPEG_ZIGZAG]
    return out


def _prog_emit_eobrun(bw, ac_codes, state) -> None:
    """Flush a pending EOB run (EOBn symbol + extension bits) and any
    correction bits buffered under it (T.81 G.1.2.2; jcphuff's
    emit_eobrun ordering)."""
    if state["eobrun"] > 0:
        e = state["eobrun"]
        r = e.bit_length() - 1
        code, length = ac_codes[r << 4]
        bw.write(code, length)
        if r:
            bw.write(e - (1 << r), r)
        state["eobrun"] = 0
        for b in state["bits"]:
            bw.write(b, 1)
        state["bits"] = []


def _prog_encode_ac_first(bw, tband, ac_codes, state) -> None:
    """One block of a first AC scan (Ah=0): baseline-style run/size
    coding of the point-transformed band, EOBs accumulated into runs."""
    last_nz = max((k for k in range(len(tband)) if tband[k]), default=-1)
    if last_nz < 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _prog_emit_eobrun(bw, ac_codes, state)
        return
    _prog_emit_eobrun(bw, ac_codes, state)
    run = 0
    for k in range(last_nz + 1):
        v = int(tband[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_codes[0xF0]
            bw.write(zcode, zlen)
            run -= 16
        s = _jpeg_category(v)
        if s > 10:
            raise ValueError(
                f"quantized AC coefficient {v} exceeds the Huffman "
                "range (|AC| < 1024); raise ac_step"
            )
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(tband) - 1:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _prog_emit_eobrun(bw, ac_codes, state)


def _prog_encode_ac_refine(bw, vband, al, ac_codes, state) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients as (run,1) symbols over ZERO-HISTORY positions,
    correction bits for every already-nonzero coefficient buffered
    and flushed after each symbol / EOB run (jcphuff's
    encode_mcu_AC_refine flow)."""
    absv = [abs(int(v)) >> al for v in vband]
    eob = max((k for k in range(len(absv)) if absv[k] == 1), default=-1)
    r = 0
    pend = []     # correction bits since the last emitted symbol
    for k in range(len(absv)):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _prog_emit_eobrun(bw, ac_codes, state)
            zcode, zlen = ac_codes[0xF0]
            bw.write(zcode, zlen)
            r -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if t > 1:
            pend.append(t & 1)
            continue
        _prog_emit_eobrun(bw, ac_codes, state)
        code, length = ac_codes[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if vband[k] > 0 else 0, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        state["eobrun"] += 1
        state["bits"].extend(pend)
        if state["eobrun"] == 0x7FFF:
            _prog_emit_eobrun(bw, ac_codes, state)


def encode_jpeg_progressive(
    arr: "np.ndarray",
    dc_step: int = 8,
    ac_step: int = 16,
    ac_bands: "tuple[tuple[int, int], ...]" = ((1, 63),),
    al: int = 1,
) -> bytes:
    """Encode an (h, w)/(h, w, 1) grayscale or (h, w, 3) RGB array as
    a REAL progressive JPEG (SOF2) with the successive-approximation
    script web encoders actually use: DC first at Al=``al``
    (interleaved for color), one first AC scan per component per
    spectral band at Al=``al``, then refinement scans walking Al down
    to 0 — so every decoder path (spectral bands, EOB runs,
    correction bits, chained refinements) is exercised by our own
    fixtures. ``ac_bands=((1,5),(6,63)), al=2`` mirrors libjpeg's
    default script shape. Same quantization as the baseline encoders:
    the constant-8×8-tile lossless corner holds, because progressive
    scans only re-order WHICH bits of the same quantized coefficients
    are transmitted, never their values."""
    _check_jpeg_steps(dc_step, ac_step)
    if al < 0 or al > 13:
        raise ValueError(f"successive-approximation Al must be 0..13, got {al}")
    covered = sorted(k for s, e in ac_bands for k in range(s, e + 1))
    if covered != list(range(1, 64)):
        raise ValueError("ac_bands must exactly partition 1..63")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        channels = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = rgb_to_ycbcr_u8(arr)
        channels = [ycc[:, :, i] for i in range(3)]
    else:
        raise ValueError("expected (h, w[, 1]) grayscale or (h, w, 3) RGB")
    h, w = channels[0].shape
    ncomp = len(channels)
    qnat = np.full((8, 8), int(ac_step), dtype=np.int32)
    qnat[0, 0] = int(dc_step)
    c = _jpeg_dct_matrix()
    coefs = [_jpeg_quant_zigzag(ch, qnat, c) for ch in channels]
    bh, bw_ = coefs[0].shape[:2]
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(sel: "list[int]", ss: int, se: int, ah: int, al: int) -> bytes:
        # Td/Ta byte is 0x00: both the DC and AC table live in slot 0
        body = bytes([len(sel)]) + b"".join(
            bytes([ci + 1, 0x00]) for ci in sel
        ) + bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = bytearray(JPEG_MAGIC)
    qzz = bytes(int(qnat.reshape(-1)[_JPEG_ZIGZAG[k]]) for k in range(64))
    out += seg(0xFFDB, b"\x00" + qzz)
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(ncomp)
    )
    out += seg(0xFFC2, sof)
    out += seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += seg(
        0xFFC4,
        b"\x10" + bytes(_JPEG_PROG_AC_BITS) + bytes(_JPEG_PROG_AC_VALS),
    )

    # scan 1: DC first, all components, Al=al (interleaved for color)
    out += sos(list(range(ncomp)), 0, 0, 0, al)
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(ncomp):
                v = int(coefs[ci][by, bx, 0]) >> al    # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                s = _jpeg_category(diff)
                code, length = dc_codes[s]
                bw.write(code, length)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += bw.flush()
    # first AC scan per component per band, Al=al
    for ci in range(ncomp):
        for ss, se in ac_bands:
            out += sos([ci], ss, se, 0, al)
            bw = _BitWriter()
            state = {"eobrun": 0, "bits": []}
            for by in range(bh):
                for bx in range(bw_):
                    t = [
                        (av >> al) if v >= 0 else -((-int(v)) >> al)
                        for v in coefs[ci][by, bx, ss : se + 1]
                        for av in (abs(int(v)),)
                    ]
                    _prog_encode_ac_first(bw, t, ac_codes, state)
            _prog_emit_eobrun(bw, ac_codes, state)
            out += bw.flush()
    # refinement ladder: Al = al-1 .. 0 (DC raw bits, then AC per band)
    for level in range(al - 1, -1, -1):
        out += sos(list(range(ncomp)), 0, 0, level + 1, level)
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(ncomp):
                    bw.write((int(coefs[ci][by, bx, 0]) >> level) & 1, 1)
        out += bw.flush()
        for ci in range(ncomp):
            for ss, se in ac_bands:
                out += sos([ci], ss, se, level + 1, level)
                bw = _BitWriter()
                state = {"eobrun": 0, "bits": []}
                for by in range(bh):
                    for bx in range(bw_):
                        _prog_encode_ac_refine(
                            bw,
                            coefs[ci][by, bx, ss : se + 1],
                            level,
                            ac_codes,
                            state,
                        )
                _prog_emit_eobrun(bw, ac_codes, state)
                out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over a byte-stuffed entropy stream."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos]
                if nxt == 0x00:
                    self.pos += 1          # stuffed 0xFF data byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside an "
                        "entropy segment (truncated or corrupt scan)"
                    )
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align (discarding fill bits) and consume one RSTn
        marker. Tolerates a stuffed all-ones pad byte (0xFF 0x00 —
        what our writer emits) and bare 0xFF fill bytes before the
        marker (T.81 B.1.1.2 — what other encoders emit)."""
        self.acc, self.n = 0, 0
        while (
            self.d[self.pos] == 0xFF and self.d[self.pos + 1] == 0x00
        ):
            self.pos += 2
        while self.d[self.pos] == 0xFF and self.d[self.pos + 1] == 0xFF:
            self.pos += 1
        b0, b1 = self.d[self.pos], self.d[self.pos + 1]
        if b0 != 0xFF or not 0xD0 <= b1 <= 0xD7:
            raise ValueError(
                f"expected JPEG restart marker, found 0x{b0:02X}{b1:02X}"
            )
        self.pos += 2


def _huff_read(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("invalid JPEG Huffman stream")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: map s received bits to a signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---- progressive (SOF2) machinery: T.81 Annex G, the Huffman
# procedures of Figures G.3-G.7 (the same flow libjpeg's
# jdphuff.c/jcphuff.c implement). Coefficients accumulate across
# scans in ZIGZAG index space; dequant+IDCT happen once at EOI.

def _prog_geometry(comps, h, w):
    """Per-component geometry: (hmax, vmax, mcux, mcuy, and for each
    component its padded interleaved block dims and its true
    non-interleaved block dims)."""
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = []
    for _, _, hi, vi in comps:
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        geo.append(
            {
                "pad_bw": mcux * hi,
                "pad_bh": mcuy * vi,
                "bw": -(-cw // 8),
                "bh": -(-ch // 8),
                "hi": hi,
                "vi": vi,
            }
        )
    return hmax, vmax, mcux, mcuy, geo


def _prog_alloc(comps, h, w):
    """Zigzag-indexed coefficient planes, padded to interleaved MCU
    coverage (non-interleaved scans touch only the true blocks)."""
    hmax, vmax, mcux, mcuy, geo = _prog_geometry(comps, h, w)
    coefs = [
        np.zeros((g["pad_bh"], g["pad_bw"], 64), dtype=np.int32) for g in geo
    ]
    return coefs, (hmax, vmax, mcux, mcuy, geo)


def _prog_next_marker(payload: bytes, pos: int) -> int:
    """Skip to the next marker after an entropy segment (stuffed
    0xFF00 bytes belong to the segment; RST markers are consumed by
    the scan loop, so anything else ends the segment)."""
    n = len(payload)
    while pos < n - 1:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            return pos
        pos += 1
    return n


def _refine_nonzero(br: "_BitReader", coef, k: int, p1: int) -> None:
    """AC refinement of an already-nonzero coefficient (G.7): one
    correction bit; 1 moves the magnitude one step outward."""
    if br.bit() and (abs(int(coef[k])) & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else -p1


def _prog_ac_first(br, coef, ss, se, al, state):
    """First AC scan of a band (Ah=0): Figure G.3 with EOB runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_read(br, state["ac_tab"])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            return
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overrun")
        coef[k] = _jpeg_extend(br.bits(s), s) << al
        k += 1


def _prog_ac_refine(br, coef, ss, se, al, state):
    """AC refinement scan (Ah=Al+1): Figure G.7 — newly-nonzero
    coefficients arrive as ±1<<Al, zero-run counts skip only
    ZERO-HISTORY positions, and every nonzero coefficient passed
    (including those under an EOB run) takes a correction bit."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_read(br, state["ac_tab"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break
                val = 0              # ZRL: skip 16 zero-history coeffs
            elif s == 1:
                val = p1 if br.bit() else -p1
            else:
                raise ValueError(
                    "corrupt progressive JPEG: refinement size > 1"
                )
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(br, coef, k, p1)
                else:
                    if r == 0:
                        if val:
                            coef[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(br, coef, k, p1)
            k += 1
        state["eobrun"] -= 1


def _prog_decode_scan(
    payload, data_pos, body, comps, coefs, geom, htables, restart_int
):
    """Decode ONE progressive scan's entropy segment into the
    coefficient planes; returns the position of the next marker."""
    hmax, vmax, mcux, mcuy, geo = geom
    ns = body[0]
    if len(body) < 4 + 2 * ns:
        raise ValueError("corrupt progressive JPEG: truncated SOS header")
    scan_sel = []
    for si in range(ns):
        cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
        idx = next(
            i for i, (cid, _, _, _) in enumerate(comps) if cid == cs
        )
        scan_sel.append((idx, tdta >> 4, tdta & 0x0F))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ahal = body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    br = _BitReader(payload, data_pos)
    if ss == 0:                                   # DC scan
        if se != 0:
            raise ValueError("corrupt progressive JPEG: Ss=0 with Se>0")
        preds = [0] * len(scan_sel)
        if ns > 1:
            # interleaved MCU order
            units = []
            for myi in range(mcuy):
                for mxi in range(mcux):
                    mcu = []
                    for sidx, (ci, dct, _) in enumerate(scan_sel):
                        g = geo[ci]
                        for bv in range(g["vi"]):
                            for bhz in range(g["hi"]):
                                mcu.append(
                                    (sidx, ci, dct,
                                     myi * g["vi"] + bv,
                                     mxi * g["hi"] + bhz)
                                )
                    units.append(mcu)
        else:
            ci, dct, _ = scan_sel[0]
            g = geo[ci]
            units = [
                [(0, ci, dct, by, bx)]
                for by in range(g["bh"])
                for bx in range(g["bw"])
            ]
        for ui, mcu in enumerate(units):
            if restart_int and ui and ui % restart_int == 0:
                br.restart()
                preds = [0] * len(scan_sel)
            for sidx, ci, dct, by, bx in mcu:
                c = coefs[ci][by, bx]
                if ah == 0:
                    s = _huff_read(br, htables[(0, dct)])
                    diff = _jpeg_extend(br.bits(s), s) if s else 0
                    preds[sidx] += diff
                    c[0] = preds[sidx] << al
                else:
                    c[0] |= br.bit() << al
    else:                                         # AC scan
        if ns != 1:
            raise ValueError(
                "corrupt progressive JPEG: AC scan must be single-component"
            )
        ci, _, act = scan_sel[0]
        g = geo[ci]
        state = {"eobrun": 0, "ac_tab": htables.get((1, act))}
        if state["ac_tab"] is None:
            raise ValueError("progressive AC scan references missing DHT")
        fn = _prog_ac_first if ah == 0 else _prog_ac_refine
        bi = 0
        for by in range(g["bh"]):
            for bx in range(g["bw"]):
                if restart_int and bi and bi % restart_int == 0:
                    br.restart()
                    state["eobrun"] = 0
                bi += 1
                fn(br, coefs[ci][by, bx], ss, se, al, state)
    return _prog_next_marker(payload, br.pos)


def _prog_finish(comps, coefs, qtables, h, w):
    """Dequantize + IDCT the accumulated coefficient planes, upsample
    subsampled components, crop, color-transform — the shared
    baseline epilogue applied once at EOI."""
    if not coefs:
        raise ValueError("progressive JPEG contains no scans")
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    c = _jpeg_dct_matrix()
    full = []
    for comp, (cid, tq, hi, vi) in enumerate(comps):
        q = qtables[tq]
        qn = np.zeros(64, dtype=np.int64)
        for k in range(64):
            qn[_JPEG_ZIGZAG[k]] = q[k]
        qn = qn.reshape(8, 8)
        bh_, bw_ = coefs[comp].shape[:2]
        plane = np.zeros((bh_ * 8, bw_ * 8), dtype=np.uint8)
        for by in range(bh_):
            for bx in range(bw_):
                zz = coefs[comp][by, bx]
                if not zz.any():
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128
                    continue
                coefn = np.zeros(64, dtype=np.float64)
                coefn[_JPEG_ZIGZAG] = zz
                block = c.T @ (coefn.reshape(8, 8) * qn) @ c
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.rint(block + 128.0), 0, 255
                ).astype(np.uint8)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        full.append(plane[:h, :w])
    out = np.stack(full, axis=2)
    if len(comps) == 1:
        return out
    return ycbcr_to_rgb_u8(out)


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Decode a baseline OR progressive JPEG: grayscale → (h, w, 1)
    uint8, YCbCr 4:4:4 color (interleaved single scan) → (h, w, 3)
    uint8 RGB via the floor(x+0.5) inverse transform
    (``ycbcr_to_rgb_u8``).

    Baseline (SOF0): the sequential-DCT 8-bit 1- or 3-component
    streams the encoders above emit (and any other baseline file
    using in-file quant/Huffman tables, sampling factors ≤ 2 per
    axis — 4:4:4 / 4:2:2 / 4:2:0 — and any DRI restart interval).
    Progressive (SOF2): full spectral selection AND successive
    approximation (DC/AC first + refinement scans, EOB runs,
    interleaved DC scans, per-component AC scans, DRI restarts) —
    the libjpeg-default script of web progressive JPEGs decodes.
    12-bit, arithmetic-coded, hierarchical and >2×-sampled streams
    raise NotImplementedError — install PIL for those."""
    if payload[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    restart_int = 0
    progressive = False
    coefs: "list[np.ndarray]" = []      # per comp (bv, bh, 64) zigzag ints
    dc_preds_geom: "tuple | None" = None
    comps: list[tuple[int, int, int, int]] = []  # (comp_id, tq, hi, vi)
    scan: dict[int, tuple[int, int]] = {}   # comp_id -> (dc_id, ac_id)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        pos += 1
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede the
        # marker code — legal in conformant files, skip them
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:                       # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:                       # DQT (possibly several)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables unsupported")
                qtables[tq] = list(body[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:                     # DHT (possibly several)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                htables[(tc, th)] = _huff_decode_map(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC2):             # SOF0 baseline / SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG unsupported (grayscale "
                    "or YCbCr only; CMYK needs PIL)"
                )
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported "
                        "(1 or 2 per axis: 4:4:4 / 4:2:2 / 4:2:0)"
                    )
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF marker 0xFF{marker:02X}: "
                "extended/lossless/arithmetic/hierarchical) needs PIL"
            )
        elif marker == 0xDD:                     # DRI
            (restart_int,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                     # SOS — entropy data follows
            if progressive:
                if not coefs:
                    if h is None:
                        raise ValueError("SOS before SOF in JPEG stream")
                    coefs, dc_preds_geom = _prog_alloc(comps, h, w)
                pos = _prog_decode_scan(
                    payload, pos + seglen, body, comps, coefs,
                    dc_preds_geom, htables, restart_int,
                )
                scan = {cid: (0, 0) for cid, _, _, _ in comps}
                continue
            ns = body[0]
            if ns != len(comps) or ns not in (1, 3):
                raise NotImplementedError(
                    "multi-scan / partial-scan baseline JPEG unsupported "
                    "(one interleaved scan covering every component only)"
                )
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan[cs] = (tdta >> 4, tdta & 0x0F)
            pos += seglen
            break
        pos += seglen
    if h is None or not scan:
        raise ValueError("truncated JPEG (missing SOF/SOS)")
    if progressive:
        return _prog_finish(comps, coefs, qtables, h, w)

    c = _jpeg_dct_matrix()
    ncomp = len(comps)
    if ncomp == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit in plain raster order and the SOF
        # sampling factors are ignored (a legal grayscale file may
        # declare 2x2; treating it as interleaved 4-block MCUs
        # misparses the entropy stream)
        cid0, tq0, _, _ = comps[0]
        comps = [(cid0, tq0, 1, 1)]
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    # per-component dequant + Huffman tables, in SOF order
    qnats, dc_tabs, ac_tabs = [], [], []
    for cid, tq, _, _ in comps:
        q = qtables[tq]
        qn = np.zeros(64, dtype=np.int64)
        for k in range(64):
            qn[_JPEG_ZIGZAG[k]] = q[k]
        qnats.append(qn.reshape(8, 8))
        dc_id, ac_id = scan[cid]
        dc_tabs.append(htables[(0, dc_id)])
        ac_tabs.append(htables[(1, ac_id)])

    # interleaved MCUs: each covers 8·hmax × 8·vmax pixels and holds
    # hi×vi raster-ordered blocks per component (T.81 A.2.3); each
    # component decodes into its own DOWNSAMPLED plane, upsampled by
    # pixel replication afterwards
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.uint8)
        for _, _, hi, vi in comps
    ]
    br = _BitReader(payload, pos)
    preds = [0] * ncomp
    mcu_n = 0
    for myi in range(mcuy):
        for mxi in range(mcux):
            # DRI: every restart_int MCUs the stream byte-aligns,
            # emits RSTn and resets every DC predictor
            if restart_int and mcu_n and mcu_n % restart_int == 0:
                br.restart()
                preds = [0] * ncomp
            mcu_n += 1
            for comp in range(ncomp):
                _, _, hi, vi = comps[comp]
                for bv in range(vi):
                    for bhz in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_read(br, dc_tabs[comp])
                        diff = _jpeg_extend(br.bits(s), s) if s else 0
                        preds[comp] += diff
                        zz[0] = preds[comp]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, ac_tabs[comp])
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0x00:       # EOB
                                break
                            if rs == 0xF0:       # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _jpeg_extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZIGZAG] = zz
                        block = c.T @ (coef.reshape(8, 8) * qnats[comp]) @ c
                        pix = np.clip(
                            np.rint(block + 128.0), 0, 255
                        ).astype(np.uint8)
                        py = (myi * vi + bv) * 8
                        px = (mxi * hi + bhz) * 8
                        planes[comp][py : py + 8, px : px + 8] = pix
    full = []
    for comp in range(ncomp):
        _, _, hi, vi = comps[comp]
        p = planes[comp]
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        full.append(p[:h, :w])
    out = np.stack(full, axis=2)
    if ncomp == 1:
        return out
    return ycbcr_to_rgb_u8(out)


# ---------------------------------------------------------------- GIF
# GIF87a/89a (CompuServe spec + RFC-referenced LZW variant) in pure
# stdlib — the remaining common crawl image format after PNG/BMP/PPM/
# JPEG: icons, UI graphics and animation stills. Lossless and
# palette-based, so fixtures round-trip bit-exactly (the palette-PNG
# property) and the driver oracle is closed-form.
#
# decode_gif(payload, frame=N) returns frame N COMPOSITED on the
# logical screen with real animation semantics — GCE transparency and
# disposal methods 0-3 applied between frames — so frame-sampling an
# animated GIF sees what a viewer sees. Transparent pixels show the
# canvas beneath (the alpha channel itself is dropped, matching
# decode_image's RGB contract). Requesting a frame past a valid
# animation's end raises GifFrameRangeError (a ValueError subclass);
# corrupt or truncated streams raise plain ValueError, so callers can
# treat "short animation" and "broken payload" differently.

GIF_MAGIC = b"GIF8"


class GifFrameRangeError(ValueError):
    """Requested frame is past the end of a VALID animation — the
    stream decoded cleanly through its trailer but held fewer frames.
    Distinct from plain ValueError (corrupt/truncated stream) so that
    frame samplers can skip short animations without also swallowing
    genuinely broken payloads (round-10 ADVICE finding)."""


def _lzw_compress_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, LSB-first bit packing, clear/EOI codes, table
    reset at 4096 entries. Returns the raw code stream (sub-block
    framing is the caller's job)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(clear)}

    width = min_code_size + 1
    table = fresh_table()
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # widen when the just-assigned code is 2^width: the
            # decoder adds the same entry one code LATER (after
            # reading the next code), where its table length hits
            # 2^width — lockstep is pinned by the real-file decode
            # and roundtrip tests
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # table full: reset (the simple always-clear policy every
            # decoder must support)
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress_gif(codestream: bytes, min_code_size: int) -> bytes:
    """Inverse of _lzw_compress_gif, including the KwKwK case and
    deferred clear codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    n = len(codestream)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # tolerant: missing EOI
            acc |= codestream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index array + (n, 3) RGB palette as a
    real single-frame GIF89a with a global color table — the
    palette-PNG fixture twin for the GIF decode path. Lossless:
    decode_gif(encode_gif(ix, pal)) == pal[ix] bit-exactly."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("expected (h, w) indices and (n, 3) palette")
    n = palette.shape[0]
    if n < 1 or n > 256:
        raise ValueError(f"GIF palette must have 1..256 entries, got {n}")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("index out of palette range")
    h, w = indices.shape
    # global color table size: smallest power of two >= max(n, 2);
    # the LSD size field stores log2(size) - 1
    gct_bits = max(1, (max(n, 2) - 1).bit_length())
    gct_n = 1 << gct_bits
    gct = np.zeros((gct_n, 3), dtype=np.uint8)
    gct[:n] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    # image descriptor: left, top, width, height, flags (no local
    # color table, not interlaced)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, gct_bits)
    out += bytes([min_code_size])
    stream = _lzw_compress_gif(indices.tobytes(), min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(payload: bytes, frame: int = 0) -> np.ndarray:
    """Decode frame ``frame`` of a GIF87a/89a payload, COMPOSITED on
    the logical screen as an (screen_h, screen_w, 3) uint8 RGB array
    — real animation semantics: Graphics Control Extension
    transparency (transparent pixels show what is beneath) and
    disposal methods 0/1 (keep), 2 (restore background) and 3
    (restore previous canvas) applied between frames, so frame
    sampling an animated GIF sees what a viewer sees. Undrawn canvas
    is the background-color palette entry. Supports global and local
    color tables and interlaced row order; raises on corrupt streams
    or a ``frame`` beyond the animation (the latter as
    GifFrameRangeError; truncated/corrupt streams raise plain
    ValueError, never IndexError — every indexed read is
    bounds-checked)."""
    if payload[:4] != GIF_MAGIC or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a payload")
    if frame < 0:
        raise ValueError(f"frame must be >= 0, got {frame}")

    def _need(at: int, n: int, what: str) -> None:
        if at + n > len(payload):
            raise ValueError(
                f"truncated GIF stream: need {n} byte(s) for {what} at "
                f"offset {at}, have {len(payload) - at}"
            )

    _need(6, 7, "logical screen descriptor")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct_n = 2 << (flags & 0x07)
        _need(pos, gct_n * 3, "global color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=gct_n * 3, offset=pos)
        gct = gct.reshape(gct_n, 3)
        pos += gct_n * 3
    bg_color = (
        gct[bg] if gct is not None and bg < gct.shape[0]
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_color
    fidx = 0
    disposal = 0
    trans_idx: "int | None" = None
    saw_trailer = False
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension: label + sub-blocks
            _need(pos, 1, "extension label")
            label = payload[pos]
            pos += 1
            _need(pos, 1, "extension sub-block size")
            if label == 0xF9 and payload[pos] >= 4:
                _need(pos, 5, "graphics control extension")
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 0x07
                trans_idx = payload[pos + 4] if gflags & 0x01 else None
            while payload[pos]:
                pos += 1 + payload[pos]
                _need(pos, 1, "extension sub-block size")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{block:02x}")
        _need(pos, 9, "image descriptor")
        left, top, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            lct_n = 2 << (iflags & 0x07)
            _need(pos, lct_n * 3, "local color table")
            table = np.frombuffer(
                payload, dtype=np.uint8, count=lct_n * 3, offset=pos
            ).reshape(lct_n, 3)
            pos += lct_n * 3
        if table is None:
            raise ValueError("GIF image has neither global nor local color table")
        _need(pos, 1, "LZW min code size")
        min_code_size = payload[pos]
        pos += 1
        stream = bytearray()
        _need(pos, 1, "image sub-block size")
        while payload[pos]:
            ln = payload[pos]
            _need(pos + 1, ln, "image sub-block data")
            stream += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            _need(pos, 1, "image sub-block size")
        pos += 1
        data = _lzw_decompress_gif(bytes(stream), min_code_size)
        if len(data) < w * h:
            raise ValueError(
                f"GIF pixel data short: {len(data)} of {w * h} indices"
            )
        ix = np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
        if iflags & 0x40:  # interlaced: pass order 8/8, 8/8+4, 4/2, 2/1
            de = np.empty_like(ix)
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de[np.array(rows)] = ix
            ix = de
        if int(ix.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF index out of color-table range")
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"GIF frame ({left},{top})+{w}x{h} exceeds the "
                f"{sw}x{sh} logical screen"
            )
        prev = canvas.copy() if (disposal == 3 and fidx < frame) else None
        region = canvas[top : top + h, left : left + w]
        if trans_idx is not None:
            mask = ix != trans_idx
            region[mask] = table[ix][mask]
        else:
            region[:, :] = table[ix]
        if fidx == frame:
            return canvas
        # dispose BEFORE the next frame draws
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_color
        elif disposal == 3 and prev is not None:
            canvas = prev
        fidx += 1
        disposal = 0
        trans_idx = None
    if not saw_trailer:
        raise ValueError(
            f"truncated GIF stream: no trailer after {fidx} frame(s)"
        )
    if fidx:
        # the stream decoded cleanly through its trailer but held
        # fewer frames than requested — a short VALID animation
        raise GifFrameRangeError(
            f"GIF animation has {fidx} frame(s); requested frame {frame}"
        )
    raise ValueError("GIF stream contains no image data")


# ------------------------------------------------------- JPEG EXIF

def jpeg_orientation(payload: bytes) -> int:
    """EXIF orientation (1..8) from a JPEG's APP1 segment, or 1 when
    absent/unparseable — the tag phones set instead of rotating
    pixels, so a pipeline that ignores it trains on sideways images.
    Parses the TIFF header inside APP1 (both II and MM byte orders)
    and IFD0's tag 0x0112; never raises on malformed EXIF (corrupt
    metadata is routine in crawls — the pixel decode is the thing
    that must stay strict)."""
    if payload[:2] != JPEG_MAGIC:
        return 1
    pos = 2
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return 1
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            if marker in (0xDA, 0xD9):       # entropy data / end: no EXIF
                return 1
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            body = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                tiff = body[6:]
                if tiff[:2] == b"II":
                    bo = "<"
                elif tiff[:2] == b"MM":
                    bo = ">"
                else:
                    return 1
                (ifd0,) = struct.unpack(bo + "I", tiff[4:8])
                (n,) = struct.unpack(bo + "H", tiff[ifd0 : ifd0 + 2])
                for i in range(n):
                    at = ifd0 + 2 + 12 * i
                    tag, typ, _cnt = struct.unpack(
                        bo + "HHI", tiff[at : at + 8]
                    )
                    if tag == 0x0112 and typ == 3:   # SHORT
                        (val,) = struct.unpack(
                            bo + "H", tiff[at + 8 : at + 10]
                        )
                        return val if 1 <= val <= 8 else 1
                return 1
            pos += 2 + seglen
    except (struct.error, IndexError):
        return 1
    return 1


def apply_exif_orientation(arr: "np.ndarray", orientation: int) -> "np.ndarray":
    """Rotate/flip decoded pixels into display orientation (EXIF
    1..8). Orientation semantics per the EXIF spec: the value names
    where the stored image's row-0/col-0 sit in the scene."""
    o = int(orientation)
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    if o == 5:
        return np.rot90(arr, k=-1)[:, ::-1]
    if o == 6:
        return np.rot90(arr, k=-1)
    if o == 7:
        return np.rot90(arr, k=1)[:, ::-1]
    if o == 8:
        return np.rot90(arr, k=1)
    return arr


def decode_image_oriented(payload: bytes) -> "np.ndarray":
    """decode_image + EXIF orientation applied — what a training
    pipeline should feed downstream of camera uploads."""
    arr = decode_image(payload)
    if payload[:2] == JPEG_MAGIC:
        return np.ascontiguousarray(
            apply_exif_orientation(arr, jpeg_orientation(payload))
        )
    return arr
