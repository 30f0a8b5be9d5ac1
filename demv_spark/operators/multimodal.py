"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode is layered (media_codecs.py): PIL/ffmpeg when importable, a
pure-stdlib real decoder (PNG/BMP/PPM/WAV) always — so
``extract_features(real_codecs=True)`` decodes genuine encoded bytes
even in this no-deps container, and the deterministic hash fake
(`_fake_decode`) remains only as the zero-cost CI default. The
Spark-side plumbing is identical on every path: schemas,
Arrow-batched `mapInPandas` signatures, batch shapes, and partition
sizing are exactly what a production decode pipeline uses.

Design for 100 TB of media:
- media rows are wide (MBs) → repartition so batches stay within
  executor memory; `spark.sql.files.maxPartitionBytes` and
  `maxRecordsPerBatch` bound Arrow transfer, not row counts.
- metadata travels in plain columns so filters (format, duration,
  size) push down to parquet without touching payloads — payload
  column pruning is the single biggest scan saver.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("format", StringType(), True),    # png | wav | mp4 ...
        StructField("payload", BinaryType(), True),   # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feat_dim", IntegerType(), True),
    ]
)

# real-decode output: decoded geometry + exact per-channel means are
# plain columns (SQL-oracle-able), the model-feature vector rides along
REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("decoded_width", IntegerType(), True),
        StructField("decoded_height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("mean_amp", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from any id column — payload is
    a seeded byte blob so tests have real binary data to push through
    the pipeline. Pure column expressions."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("fake").alias("format"),
        payload.alias("payload"),
        (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def synthesize_media_real(
    df: DataFrame, id_col: str, kind: str = "image", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic REAL encoded payloads from any id column — actual
    PNG bytes (zlib-deflated, scanline-filtered) or 16-bit PCM WAV, so
    the decode path runs on genuine codec output with zero third-party
    deps.

    Image content is fully determined by the id (w = id%64+16,
    h = id%48+16, pixel[y][x][c] = (id*7 + c*13) % 200 + (x+y) % 50)
    and the PNG filter type cycles id%5 — every decode exercises one of
    the five scanline filters, and per-channel means are re-derivable
    exactly in SQL (integer sums over a generate_series grid), which is
    what the driver oracle does. ``kind="jpeg"`` emits real baseline
    grayscale JPEG bytes built from constant 8x8 tiles (see the inline
    comment) so even the lossy format round-trips its fixture pixels
    bit-exactly. Audio samples follow
    ((id*31 + i*17) % 2048) - 1024 at ``sample_rate``."""
    from demv_spark.operators import media_codecs as C

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for pdf in it:
            rows = []
            for raw_id in pdf[id_col]:
                mid = int(raw_id)
                if kind == "image":
                    w, h = mid % 64 + 16, mid % 48 + 16
                    base = np.array(
                        [(mid * 7 + c * 13) % 200 for c in range(3)], dtype=np.int32
                    )
                    yy, xx = np.mgrid[0:h, 0:w]
                    grad = (xx + yy) % 50
                    arr = (base[None, None, :] + grad[:, :, None]).astype(np.uint8)
                    payload = C.encode_png(arr, filter_type=mid % 5)
                    rows.append((mid, "image", "png", payload, w, h, None))
                elif kind == "jpeg":
                    # grayscale baseline JPEG of CONSTANT 8x8 tiles:
                    # tile(by,bx) = (id*7)%200 + ((bx+by+id)%5)*11 —
                    # constant tiles quantize to a lone losslessly-
                    # coded DC, so the LOSSY format round-trips these
                    # pixels bit-exactly and the dHash oracle can
                    # re-derive decoded content in closed form
                    w, h = mid % 64 + 16, mid % 48 + 16
                    nby, nbx = -(-h // 8), -(-w // 8)
                    by, bx = np.mgrid[0:nby, 0:nbx]
                    tiles = (
                        (mid * 7) % 200 + ((bx + by + mid) % 5) * 11
                    ).astype(np.uint8)
                    arr = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]
                    payload = C.encode_jpeg_gray(arr)
                    rows.append((mid, "image", "jpeg", payload, w, h, None))
                elif kind == "jpeg_color":
                    # baseline COLOR JPEG (YCbCr 4:4:4) of constant
                    # 8x8 RGB tiles: tile(by,bx) channels are mod-256
                    # affine in (id, bx, by), so the whole
                    # RGB→YCbCr→DC-roundtrip→RGB pipeline is
                    # re-derivable in closed-form SQL (the floor(x+.5)
                    # transform convention; see encode_jpeg_color)
                    w, h = mid % 64 + 16, mid % 48 + 16
                    nby, nbx = -(-h // 8), -(-w // 8)
                    by, bx = np.mgrid[0:nby, 0:nbx]
                    tiles = np.stack(
                        [
                            (mid * 7 + bx * 3 + by * 5) % 256,
                            (mid * 11 + bx * 7 + by * 2) % 256,
                            (mid * 13 + bx * 5 + by * 7) % 256,
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    arr = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]
                    payload = C.encode_jpeg_color(arr)
                    rows.append((mid, "image", "jpeg", payload, w, h, None))
                elif kind == "jpeg420":
                    # baseline 4:2:0 COLOR JPEG of constant 16x16 RGB
                    # MACRO-tiles (the subsampled MCU unit): 4
                    # constant Y blocks + box-averaged-constant
                    # chroma per MCU — lossless corner holds, so the
                    # census oracle is closed-form at 16-px tile
                    # granularity (see encode_jpeg_420)
                    w, h = mid % 64 + 16, mid % 48 + 16
                    nby, nbx = -(-h // 16), -(-w // 16)
                    by, bx = np.mgrid[0:nby, 0:nbx]
                    tiles = np.stack(
                        [
                            (mid * 7 + bx * 3 + by * 5) % 256,
                            (mid * 11 + bx * 7 + by * 2) % 256,
                            (mid * 13 + bx * 5 + by * 7) % 256,
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    arr = np.repeat(np.repeat(tiles, 16, 0), 16, 1)[:h, :w]
                    payload = C.encode_jpeg_420(arr)
                    rows.append((mid, "image", "jpeg", payload, w, h, None))
                elif kind == "jpeg_prog":
                    # PROGRESSIVE (SOF2) grayscale with the
                    # libjpeg-shaped script (bands 1-5/6-63, Al=2):
                    # same constant-tile pixels as kind="jpeg", so
                    # the lossless corner holds — progressive scans
                    # re-order bits of the same quantized
                    # coefficients, never change them
                    w, h = mid % 64 + 16, mid % 48 + 16
                    nby, nbx = -(-h // 8), -(-w // 8)
                    by, bx = np.mgrid[0:nby, 0:nbx]
                    tiles = (
                        (mid * 7) % 200 + ((bx + by + mid) % 5) * 11
                    ).astype(np.uint8)
                    arr = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]
                    payload = C.encode_jpeg_progressive(
                        arr, ac_bands=((1, 5), (6, 63)), al=2
                    )
                    rows.append((mid, "image", "jpeg", payload, w, h, None))
                elif kind == "gif":
                    # palette GIF: n-color palette and index grid are
                    # both mod-256 affine in (id, x, y), and GIF is
                    # LOSSLESS, so per-channel sums have a closed
                    # form the oracle re-derives pixel-by-pixel over
                    # a generate_series grid
                    w, h = mid % 64 + 16, mid % 48 + 16
                    n = mid % 197 + 8
                    pi = np.arange(n, dtype=np.int64)
                    pal = np.stack(
                        [
                            (pi * 7 + mid) % 256,
                            (pi * 11 + 3) % 256,
                            (pi * 13 + 5 * mid) % 256,
                        ],
                        axis=1,
                    ).astype(np.uint8)
                    yy, xx = np.mgrid[0:h, 0:w]
                    ix = ((mid * 3 + xx + 2 * yy) % n).astype(np.uint8)
                    payload = C.encode_gif(ix, pal)
                    rows.append((mid, "image", "gif", payload, w, h, None))
                elif kind == "audio":
                    dur_ms = mid % 9000 + 1000
                    n = sample_rate * dur_ms // 1000
                    i = np.arange(n, dtype=np.int64)
                    samples = ((mid * 31 + i * 17) % 2048 - 1024).astype("<i2")
                    payload = C.encode_wav(samples, sample_rate)
                    rows.append((mid, "audio", "wav", payload, None, None, dur_ms))
                else:
                    raise ValueError(f"unsupported kind {kind!r}")
            yield pd.DataFrame(rows, columns=cols)

    return df.select(F.col(id_col)).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """STUB decode: deterministic feature vector from payload bytes.

    A real pipeline replaces this one function with PIL/ffmpeg decode +
    model inference; everything around it (batching, schema, shuffle
    boundaries) is production-shaped. Raises NotImplementedError for
    codec formats to make the stub boundary explicit."""
    h = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        chunk = h[(4 * i) % 28 : (4 * i) % 28 + 4]
        (v,) = struct.unpack(">I", chunk)
        out.append((v % 10_000) / 10_000.0)
    return out


def extract_features(
    df: DataFrame, dim: int = 16, real_codecs: bool = False
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    mapInPandas — the production shape for Python-side media work:
    each batch is a pandas DataFrame, payloads stay binary end-to-end,
    output schema is fixed and columnar.

    ``real_codecs=True`` decodes ACTUAL image bytes (PIL when
    importable, stdlib PNG/BMP/PPM otherwise — media_codecs.py) and
    returns REAL_FEATURE_SCHEMA: decoded geometry + exact per-channel
    means as plain columns (integer pixel sum / pixel count, one IEEE
    division — SQL-oracle-able) plus a ``dim``-long block-mean feature
    vector. The default fake path keeps FEATURE_SCHEMA for zero-dep
    CI speed."""
    if real_codecs:
        from demv_spark.operators.media_codecs import decode_image

        def decode_real(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [f.name for f in REAL_FEATURE_SCHEMA.fields]
            for pdf in it:
                recs = []
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                ):
                    arr = decode_image(bytes(payload))
                    h, w, ch = arr.shape
                    n = h * w
                    sums = [int(arr[:, :, c].sum()) for c in range(ch)]
                    means = [s / n for s in sums]
                    while len(means) < 3:  # gray: replicate channel 0
                        means.append(means[0])
                    feat = _block_mean_feature(arr, dim)
                    recs.append(
                        (int(mid), kind, w, h, ch,
                         means[0], means[1], means[2], feat)
                    )
                yield pd.DataFrame(recs, columns=cols)

        return df.mapInPandas(decode_real, schema=REAL_FEATURE_SCHEMA)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p if p is not None else b"", dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def _block_mean_feature(arr: "np.ndarray", dim: int) -> list[float]:
    """Fixed-``dim`` feature from decoded pixels: row-block means of
    the channel-averaged image, normalized to [0, 1] — a stand-in for
    model inference that is still a pure function of real pixels."""
    gray = arr.astype(np.float64).mean(axis=2).reshape(-1)
    blocks = np.array_split(gray, dim)
    return [float(b.mean() / 255.0) if len(b) else 0.0 for b in blocks]


def audio_features(df: DataFrame) -> DataFrame:
    """Decode 16-bit PCM WAV payloads (stdlib) to summary features:
    sample count, rate, mean amplitude (integer sum / count — exact),
    RMS. Same Arrow-batched mapInPandas shape as the image path."""
    from demv_spark.operators.media_codecs import decode_wav

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]
        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                flat = samples.astype(np.int64).reshape(-1)
                n = len(flat)
                mean_amp = int(flat.sum()) / n if n else 0.0
                rms = float(np.sqrt((flat.astype(np.float64) ** 2).mean())) if n else 0.0
                recs.append((int(mid), n, rate, mean_amp, rms))
            yield pd.DataFrame(recs, columns=cols)

    return df.mapInPandas(decode_batches, schema=AUDIO_FEATURE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize bookkeeping (target dims, scale factor) computed as pure
    columns — the byte-level resample lives inside extract_features'
    decode stub. Keeping geometry in columns lets Catalyst prune/filter
    on it without touching payloads."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return df.withColumn("scale", scale).withColumn(
        "target_width", F.ceil(F.col("width") * F.col("scale")).cast("int")
    ).withColumn(
        "target_height", F.ceil(F.col("height") * F.col("scale")).cast("int")
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling plan: explode per-media frame timestamps
    (bounded by max_frames) — the downstream decode consumes
    (media_id, frame_ts_ms) pairs. Pure sequence/explode, no UDF."""
    n_frames = F.least(
        F.floor(F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms) + 1,
        F.lit(max_frames),
    ).cast("int")
    ts = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: (i * every_ms).cast("int")
    )
    return df.select(
        "media_id", "kind", F.explode(ts).alias("frame_ts_ms")
    )


def image_channel_sums(df: DataFrame) -> DataFrame:
    """Per-image integer channel sums over REAL decoded pixels —
    the cheapest whole-image content signature that still pins every
    pixel value (a one-pixel change moves a sum). Grayscale decodes
    replicate their single channel. Emits (media_id, w, h, r_sum,
    g_sum, b_sum) — all integers, so the signature value-hashes
    cross-engine when the decoded content has a closed form (the
    constant-tile JPEG fixtures do).

    Arrow-batched mapInPandas decode, map-only at any scale — the
    same shape as ``image_dhash``."""
    from demv_spark.operators.media_codecs import decode_image

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("r_sum", LongType()),
            StructField("g_sum", LongType()),
            StructField("b_sum", LongType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                h, w = arr.shape[:2]
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                sums = arr.sum(axis=(0, 1))
                recs.append(
                    (int(mid), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in out_schema.fields]
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


def image_dhash(
    df: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels — the
    image near-duplicate key (two re-encodes / resamples of the same
    picture give equal or near-equal dHashes, Hamming distance ranks
    the rest).

    Integer-exact by construction so the hash is reproducible on any
    engine: grayscale is the per-pixel CHANNEL SUM (no /3), the
    (hash_w+1)×hash_h grid uses floor-boundary blocks
    (x0 = j·w div (hash_w+1)), and each left>right comparison
    cross-multiplies integer block sums against block areas
    (sumL·areaR > sumR·areaL) — no float ever appears, so a SQL
    oracle can re-derive the bits from a closed-form pixel model (the
    driver does, over a generate_series grid). Emitted as a
    fixed-width hex string (row-major bits, MSB-first per row-byte),
    with (media_id, w, h) for downstream joins.

    Arrow-batched mapInPandas decode, map-only at any scale; bucket
    the hex (or its bands) for candidate generation exactly like
    simhash.
    """
    from demv_spark.operators.media_codecs import decode_image

    n_bits = hash_w * hash_h
    n_hex = (n_bits + 3) // 4

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("dhash_hex", StringType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload)).astype(np.int64)
                h, w = arr.shape[0], arr.shape[1]
                gray = arr.sum(axis=2)  # channel sum: integer grayscale
                # integral image for O(1) exact block sums
                ii = np.zeros((h + 1, w + 1), dtype=np.int64)
                ii[1:, 1:] = gray.cumsum(0).cumsum(1)
                gw, gh = hash_w + 1, hash_h
                xs = [j * w // gw for j in range(gw + 1)]
                ys = [i * h // gh for i in range(gh + 1)]
                bits = []
                for i in range(gh):
                    y0, y1 = ys[i], ys[i + 1]
                    row = []
                    for j in range(gw):
                        x0, x1 = xs[j], xs[j + 1]
                        s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
                        row.append((int(s), (y1 - y0) * (x1 - x0)))
                    for j in range(hash_w):
                        (sl, al), (sr, ar) = row[j], row[j + 1]
                        bits.append(1 if sl * ar > sr * al else 0)
                v = 0
                for b in bits:
                    v = (v << 1) | b
                recs.append((int(mid), w, h, format(v, f"0{n_hex}x")))
            # yield per input batch — buffering all batches would hold
            # the whole partition's results in memory
            yield pd.DataFrame(recs, columns=["media_id", "w", "h", "dhash_hex"])

    return df.mapInPandas(run, schema=out_schema)


def audio_fingerprint(df: DataFrame, n_frames: int = 33) -> DataFrame:
    """Perceptual audio fingerprint from REAL decoded PCM — the audio
    twin of :func:`image_dhash`: split the sample stream into
    ``n_frames`` floor-boundary frames, compute integer frame
    energies (Σ sample²), and emit one bit per adjacent-frame energy
    comparison (cross-multiplied against frame lengths, so unequal
    frame sizes never need a float). Uniform gain changes scale every
    energy by the same factor and preserve all comparisons — the
    invariance that makes it a content key, not a byte hash.

    ``n_frames−1`` bits, hex-emitted MSB-first. Integer-exact ⇒ a SQL
    oracle re-derives every bit from the closed-form sample model.
    Arrow-batched mapInPandas decode, map-only at any scale.
    """
    from demv_spark.operators.media_codecs import decode_wav

    n_bits = n_frames - 1
    n_hex = (n_bits + 3) // 4

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("fp_hex", StringType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                flat = samples.astype(np.int64).reshape(-1)
                n = len(flat)
                # frame of sample i = (i·n_frames) div n — the one
                # floor-partition a SQL GROUP BY can recompute without
                # boundary tables. Frame energies are < 2⁵³ (len ≤
                # n/n_frames+1 times 1024²), so the float64 bincount
                # accumulation is exact term-for-term.
                ks = (np.arange(n, dtype=np.int64) * n_frames) // max(n, 1)
                sq = (flat * flat).astype(np.float64)
                e = np.bincount(ks, weights=sq, minlength=n_frames).astype(np.int64)
                ln = np.bincount(ks, minlength=n_frames).astype(np.int64)
                v = 0
                for k in range(n_bits):
                    bit = 1 if int(e[k]) * int(ln[k + 1]) > int(e[k + 1]) * int(ln[k]) else 0
                    v = (v << 1) | bit
                recs.append((int(mid), n, format(v, f"0{n_hex}x")))
            yield pd.DataFrame(recs, columns=["media_id", "n_samples", "fp_hex"])

    return df.mapInPandas(run, schema=out_schema)


def gif_frame_sums(
    df: DataFrame,
    frames: "tuple[int, ...]" = (0,),
    on_corrupt: str = "error",
) -> DataFrame:
    """REAL multi-frame sampling for animated GIFs — the decode half
    of ``frame_sample_plan``'s (media_id, frame) pairs: each requested
    frame is composited per the animation's disposal/transparency
    semantics (media_codecs.decode_gif) and reduced to integer channel
    sums. Frames beyond a VALID animation's end are skipped, not
    fatal (crawl GIFs lie about frame counts routinely) — detected by
    the typed GifFrameRangeError, so corrupt/truncated payloads are
    NOT silently conflated with short animations (round-10 ADVICE
    finding). Corrupt payloads follow ``on_corrupt``: "error" (the
    default — fail the task with the decode error) or "skip" (drop
    that media_id entirely, for lossy crawl sweeps). Arrow-batched
    mapInPandas, map-only at any scale — the image_channel_sums
    shape with a frame axis."""
    if on_corrupt not in ("error", "skip"):
        raise ValueError(f"on_corrupt must be 'error' or 'skip', got {on_corrupt!r}")
    from demv_spark.operators.media_codecs import GifFrameRangeError, decode_gif

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame", IntegerType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("r_sum", LongType()),
            StructField("g_sum", LongType()),
            StructField("b_sum", LongType()),
        ]
    )
    want = sorted(set(int(f) for f in frames))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # a GIF truncated after frame 0 decodes frame 0 fine,
                # then raises at frame 1: on the corrupt-skip path the
                # whole media_id must go, including rows already
                # appended for its earlier frames (round-10 ADVICE)
                start = len(recs)
                for fr in want:
                    try:
                        arr = decode_gif(bytes(payload), frame=fr).astype(
                            np.int64
                        )
                    except GifFrameRangeError:
                        break  # past a valid animation's end
                    except ValueError:
                        if on_corrupt == "skip":
                            del recs[start:]  # documented whole-media drop
                            break
                        raise
                    h, w = arr.shape[:2]
                    s = arr.sum(axis=(0, 1))
                    recs.append(
                        (int(mid), fr, w, h, int(s[0]), int(s[1]), int(s[2]))
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    return df.select("media_id", "payload").mapInPandas(run, schema=out_schema)
