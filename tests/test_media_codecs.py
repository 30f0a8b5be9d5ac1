"""Real media codecs (media_codecs.py) + the real-decode pipeline path
(multimodal.extract_features(real_codecs=True), audio_features):
encode→decode roundtrips across every PNG scanline filter, BMP/PPM/WAV,
and the Spark end-to-end on genuine encoded payloads."""

import numpy as np
import pytest

from demv_spark.operators import media_codecs as C
from demv_spark.operators.multimodal import (
    audio_features,
    extract_features,
    synthesize_media_real,
)


def _pattern(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    arr = _pattern(13, 17, 3, seed=filter_type)
    out = C.decode_png(C.encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_channel_counts(ch):
    arr = _pattern(9, 5, ch, seed=ch)
    out = C.decode_png(C.encode_png(arr, filter_type=4))
    np.testing.assert_array_equal(out, arr)


def test_bmp_roundtrip_odd_width_padding():
    arr = _pattern(7, 5, 3, seed=1)  # 15-byte rows -> 16 with pad
    out = C.decode_bmp(C.encode_bmp(arr))
    np.testing.assert_array_equal(out, arr)


def test_ppm_roundtrip():
    arr = _pattern(6, 11, 3, seed=2)
    out = C.decode_ppm(C.encode_ppm(arr))
    np.testing.assert_array_equal(out, arr)


def test_wav_roundtrip():
    samples = (np.arange(4000, dtype=np.int64) * 37 % 4096 - 2048).astype("<i2")
    out, rate = C.decode_wav(C.encode_wav(samples, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(out[:, 0], samples)


def test_decode_image_sniffs_formats():
    arr = _pattern(4, 4, 3, seed=3)
    for enc in (C.encode_png, C.encode_bmp, C.encode_ppm):
        np.testing.assert_array_equal(C.decode_image(enc(arr)), arr)
    with pytest.raises(NotImplementedError):
        C.decode_image(b"\x00\x01junkbytes")


def test_real_extract_features_decodes_true_dimensions(spark):
    ids = spark.range(1, 26).withColumnRenamed("id", "media_id")
    media = synthesize_media_real(ids, "media_id")
    feats = {r["media_id"]: r for r in
             extract_features(media, dim=8, real_codecs=True).collect()}
    assert len(feats) == 25
    for mid, r in feats.items():
        w, h = mid % 64 + 16, mid % 48 + 16
        assert (r["decoded_width"], r["decoded_height"], r["channels"]) == (w, h, 3)
        # closed-form channel mean: base_c + mean((x+y) % 50) over grid
        yy, xx = np.mgrid[0:h, 0:w]
        grad_sum = int(((xx + yy) % 50).sum())
        for c, col in enumerate(["mean_r", "mean_g", "mean_b"]):
            base = (mid * 7 + c * 13) % 200
            assert r[col] == (base * w * h + grad_sum) / (w * h)
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])


def test_audio_features_real_wav(spark):
    ids = spark.range(1, 6).withColumnRenamed("id", "media_id")
    media = synthesize_media_real(ids, "media_id", kind="audio")
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    for mid, r in out.items():
        dur_ms = mid % 9000 + 1000
        assert r["n_samples"] == 8000 * dur_ms // 1000
        assert r["sample_rate"] == 8000
        i = np.arange(r["n_samples"], dtype=np.int64)
        samples = (mid * 31 + i * 17) % 2048 - 1024
        assert r["mean_amp"] == int(samples.sum()) / len(samples)


# ---- image_dhash ----


def test_dhash_invariant_to_reencode_and_locality(spark):
    """The SAME pixels encoded with different PNG scanline filters must
    produce identical dHashes (the property that makes it a perceptual
    dedup key, not a byte hash); a small brightness shift must keep
    the hash EQUAL (uniform shifts don't change left>right order),
    while structural change flips bits."""
    import pandas as pd
    from demv_spark.operators.multimodal import MEDIA_SCHEMA, image_dhash

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(40, 40, 3)).astype(np.uint8)
    shifted = np.clip(arr.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    structural = arr.copy()
    structural[:, :20] = 255  # blow out the left half

    rows = [
        (0, "image", "png", C.encode_png(arr, filter_type=0), 40, 40, None),
        (1, "image", "png", C.encode_png(arr, filter_type=4), 40, 40, None),
        (2, "image", "png", C.encode_png(shifted, filter_type=2), 40, 40, None),
        (3, "image", "png", C.encode_png(structural, filter_type=1), 40, 40, None),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        schema=MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r["dhash_hex"] for r in image_dhash(media).collect()}
    assert got[0] == got[1]          # re-encode invariant
    assert got[0] == got[2]          # uniform brightness shift invariant
    assert got[0] != got[3]          # structural change detected
    ham = sum(
        bin(int(a, 16) ^ int(b, 16)).count("1")
        for a, b in [(got[0], got[3])]
    )
    assert ham >= 8  # left-half blowout flips many comparisons


def test_audio_fingerprint_gain_invariant(spark):
    """Halving the gain scales every frame energy by the same factor
    and preserves all comparisons → identical fingerprint; swapping
    loud/quiet halves flips bits."""
    import pandas as pd
    from demv_spark.operators.multimodal import MEDIA_SCHEMA, audio_fingerprint

    rng = np.random.RandomState(11)
    loudness = np.where(np.arange(16000) < 8000, 1000, 120)
    base = (rng.randint(-100, 101, 16000) * loudness // 100).astype("<i2")
    half = (base.astype(np.int32) // 2).astype("<i2")
    swapped = np.concatenate([base[8000:], base[:8000]]).astype("<i2")

    rows = [
        (0, "audio", "wav", C.encode_wav(base, 8000), None, None, 2000),
        (1, "audio", "wav", C.encode_wav(half, 8000), None, None, 2000),
        (2, "audio", "wav", C.encode_wav(swapped, 8000), None, None, 2000),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        schema=MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r["fp_hex"] for r in audio_fingerprint(media).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]


# ---- JPEG (baseline grayscale, pure stdlib) ----

def _tile_image(mid, h, w):
    nby, nbx = -(-h // 8), -(-w // 8)
    by, bx = np.mgrid[0:nby, 0:nbx]
    tiles = ((mid * 7) % 200 + ((bx + by + mid) % 5) * 11).astype(np.uint8)
    return np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]


def test_jpeg_constant_tiles_roundtrip_exact():
    """An image of constant 8x8 tiles survives the LOSSY format
    bit-exactly: every block quantizes to a lone DC that the default
    dc_step codes losslessly — the property the driver oracle's
    closed-form pixel model rests on."""
    from demv_spark.operators import media_codecs as C

    rng = np.random.RandomState(7)
    for _ in range(4):
        h, w = int(rng.randint(9, 70)), int(rng.randint(9, 70))
        bh, bw = -(-h // 8), -(-w // 8)
        tiles = rng.randint(0, 256, size=(bh, bw))
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w].astype(np.uint8)
        dec = C.decode_jpeg(C.encode_jpeg_gray(img))
        assert dec.shape == (h, w, 1)
        assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_general_image_near_lossless_at_unit_quant():
    """With unit quant steps the only loss is DCT float rounding:
    any image round-trips within ±2 — the general Huffman/IDCT path
    is exercised on dense non-zero AC spectra, not just DC blocks."""
    from demv_spark.operators import media_codecs as C

    y = np.arange(40)[:, None] / 5.0
    x = np.arange(56)[None, :] / 7.0
    img = (128 + 80 * np.sin(y) * np.cos(x)).astype(np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg_gray(img, dc_step=1, ac_step=1))[:, :, 0]
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_dispatch_and_unsupported_variants():
    """decode_image sniffs the 0xFFD8 magic; CMYK, subsampled-color
    beyond 2x and lossless/arithmetic streams raise with the boundary
    spelled out. (Progressive SOF2 is SUPPORTED since round 9 — a
    baseline stream merely relabeled SOF2 is corrupt, not
    unimplemented: its Ss=0/Se=63 scan header is illegal progressive.)"""
    from demv_spark.operators import media_codecs as C

    enc = C.encode_jpeg_gray(_tile_image(3, 24, 32))
    assert C.decode_image(enc).shape == (24, 32, 1)

    sof = enc.find(b"\xff\xc0")
    mislabeled = enc[:sof] + b"\xff\xc2" + enc[sof + 2:]
    with pytest.raises(ValueError, match="Ss=0 with Se>0"):
        C.decode_jpeg(mislabeled)
    lossless = enc[:sof] + b"\xff\xc3" + enc[sof + 2:]
    with pytest.raises(NotImplementedError, match="lossless"):
        C.decode_jpeg(lossless)

    img = np.dstack([_tile_image(3, 24, 32)] * 3)
    cenc = C.encode_jpeg_color(img)
    csof = cenc.find(b"\xff\xc0")
    cmyk = bytearray(cenc)
    cmyk[csof + 9] = 4          # ncomp byte inside SOF0
    with pytest.raises(NotImplementedError, match="4-component"):
        C.decode_jpeg(bytes(cmyk))
    sub = bytearray(cenc)
    sub[csof + 11] = 0x31       # Y sampling factor 3x1 — beyond 2
    with pytest.raises(NotImplementedError, match="sampling factor 3x1"):
        C.decode_jpeg(bytes(sub))


def test_jpeg_color_constant_tiles_roundtrip_exact():
    """The color lossless corner: constant 8x8 RGB tiles →
    decode equals the exact YCbCr round-trip of the input (the DC
    quantizes losslessly per channel at dc_step=8; AC all zero), with
    edge-tile crop."""
    from demv_spark.operators import media_codecs as C

    rng = np.random.RandomState(11)
    for _ in range(4):
        nby, nbx = rng.randint(2, 5), rng.randint(2, 5)
        tiles = rng.randint(0, 256, size=(nby, nbx, 3))
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)
        h, w = nby * 8 - rng.randint(0, 5), nbx * 8 - rng.randint(0, 5)
        img = img[:h, :w]
        dec = C.decode_jpeg(C.encode_jpeg_color(img))
        expect = C.ycbcr_to_rgb_u8(C.rgb_to_ycbcr_u8(img))
        assert dec.shape == (h, w, 3)
        assert np.array_equal(dec, expect)


def test_jpeg_420_constant_macrotiles_roundtrip_exact():
    """The 4:2:0 lossless corner: constant 16x16 RGB macro-tiles give
    4 constant Y blocks and box-averaged-constant chroma per MCU —
    decode equals the exact YCbCr round-trip, with edge crop through
    both the luma and the upsampled chroma planes."""
    from demv_spark.operators import media_codecs as C

    rng = np.random.RandomState(13)
    for _ in range(4):
        nby, nbx = rng.randint(2, 4), rng.randint(2, 4)
        tiles = rng.randint(0, 256, size=(nby, nbx, 3))
        img = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)
        h, w = nby * 16 - rng.randint(0, 9), nbx * 16 - rng.randint(0, 9)
        img = img[:h, :w]
        dec = C.decode_jpeg(C.encode_jpeg_420(img))
        expect = C.ycbcr_to_rgb_u8(C.rgb_to_ycbcr_u8(img))
        assert dec.shape == (h, w, 3)
        assert np.array_equal(dec, expect)


def test_jpeg_420_luma_survives_chroma_averaging():
    """On a general image the Y channel at unit quant stays within
    DCT float error of the forward transform, while chroma is the
    2x2 box average upsampled back — checked against a python mirror
    of the exact downsample/upsample arithmetic."""
    from demv_spark.operators import media_codecs as C

    y, x = np.mgrid[0:24, 0:32]
    img = np.stack(
        [128 + 60 * np.sin(y / 6.0), (x * 2) % 256, (y * 5) % 256], axis=2
    ).astype(np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg_420(img, dc_step=1, ac_step=1))
    ycc = C.rgb_to_ycbcr_u8(img).astype(np.int64)
    ch = ycc[:, :, 1:]
    csum = ch[0::2, 0::2] + ch[0::2, 1::2] + ch[1::2, 0::2] + ch[1::2, 1::2]
    cavg = ((csum + 2) // 4).astype(np.uint8)
    up = np.repeat(np.repeat(cavg, 2, 0), 2, 1)
    mirror = np.dstack([ycc[:, :, 0].astype(np.uint8), up])
    expect = C.ycbcr_to_rgb_u8(mirror)
    assert int(np.abs(dec.astype(int) - expect.astype(int)).max()) <= 4


def test_jpeg_restart_intervals_roundtrip_all_variants():
    """DRI streams decode identically to their marker-free twins:
    byte-align + RSTn + DC-predictor reset at every interval, for
    grayscale, 4:4:4 and 4:2:0 — including interval=1 (a marker
    between every MCU) and an interval larger than the MCU count
    (no marker ever fires)."""
    from demv_spark.operators import media_codecs as C

    rng = np.random.RandomState(3)
    g = (np.arange(40 * 56).reshape(40, 56) * 7 % 251).astype(np.uint8)
    base_g = C.decode_jpeg(C.encode_jpeg_gray(g, dc_step=1, ac_step=1))
    for ri in (1, 2, 7, 35, 100):
        got = C.decode_jpeg(
            C.encode_jpeg_gray(g, dc_step=1, ac_step=1, restart_interval=ri)
        )
        assert np.array_equal(got, base_g), ri

    tiles = rng.randint(0, 256, size=(3, 4, 3))
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)[:22, :30]
    base_c = C.decode_jpeg(C.encode_jpeg_color(img))
    mimg = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)[:44, :60]
    base_m = C.decode_jpeg(C.encode_jpeg_420(mimg))
    for ri in (1, 3, 50):
        assert np.array_equal(
            C.decode_jpeg(C.encode_jpeg_color(img, restart_interval=ri)),
            base_c,
        )
        assert np.array_equal(
            C.decode_jpeg(C.encode_jpeg_420(mimg, restart_interval=ri)),
            base_m,
        )


def test_jpeg_color_general_near_lossless_at_unit_quant():
    """A smooth color image at dc_step=ac_step=1 decodes within a few
    counts of its YCbCr round-trip (DCT float error only)."""
    from demv_spark.operators import media_codecs as C

    y, x = np.mgrid[0:24, 0:40]
    img = np.stack(
        [
            128 + 80 * np.sin(y / 5.0) * np.cos(x / 7.0),
            (x * 3) % 256,
            (y * 7) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg_color(img, dc_step=1, ac_step=1))
    ref = C.ycbcr_to_rgb_u8(C.rgb_to_ycbcr_u8(img))
    assert int(np.abs(dec.astype(int) - ref.astype(int)).max()) <= 4


def test_jpeg_encoder_rejects_degenerate_quant_steps():
    """ADVICE r8: sub-1 steps either divide by zero (int(step)=0) or
    could push |quantized AC| past the baseline table's size-10
    ceiling — the encoder rejects them with a clear message instead
    of an opaque KeyError deep in Huffman coding."""
    from demv_spark.operators import media_codecs as C

    img = _tile_image(3, 16, 16)
    for dc, ac in ((0, 16), (8, 0), (0.5, 16), (8, 0.9)):
        with pytest.raises(ValueError, match="must be >= 1"):
            C.encode_jpeg_gray(img, dc_step=dc, ac_step=ac)


def test_jpeg_fixture_media_pipeline(spark):
    """synthesize_media_real(kind='jpeg') produces real JPEG bytes the
    whole media pipeline consumes: extract_features decodes geometry +
    exact means, image_dhash hashes the decoded pixels."""
    from demv_spark.operators.multimodal import (
        extract_features,
        image_dhash,
        synthesize_media_real,
    )

    ids = spark.range(6).withColumnRenamed("id", "mid")
    media = synthesize_media_real(ids, "mid", kind="jpeg")
    rows = media.collect()
    assert all(bytes(r["payload"])[:2] == b"\xff\xd8" for r in rows)
    assert all(r["format"] == "jpeg" for r in rows)

    feats = {r["media_id"]: r for r in
             extract_features(media, real_codecs=True).collect()}
    for mid in range(6):
        w, h = mid % 64 + 16, mid % 48 + 16
        img = _tile_image(mid, h, w)
        r = feats[mid]
        assert (r["decoded_width"], r["decoded_height"], r["channels"]) == (w, h, 1)
        assert r["mean_r"] == int(img.sum()) / (h * w)   # gray replicates
        assert r["mean_r"] == r["mean_g"] == r["mean_b"]

    dh = {r["media_id"]: r["dhash_hex"] for r in image_dhash(media).collect()}
    assert len(dh) == 6 and all(len(v) == 16 for v in dh.values())


def test_jpeg_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code — a conformant file using them must decode
    identically, not misparse."""
    enc = C.encode_jpeg_gray(_tile_image(5, 24, 32))
    want = C.decode_jpeg(enc)
    # insert fill bytes before the DQT and SOS markers
    filled = enc.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    filled = filled.replace(b"\xff\xda", b"\xff\xff\xda", 1)
    got = C.decode_jpeg(filled)
    assert np.array_equal(got, want)


def test_png_palette_roundtrip_all_depths_and_filters():
    """Indexed-color PNG (type 3): every bit depth (1/2/4/8) × every
    scanline filter round-trips through PLTE expansion exactly;
    tRNS adds per-index alpha; missing PLTE raises."""
    from demv_spark.operators import media_codecs as C

    rng = np.random.RandomState(9)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
        for ft in range(5):
            h, w = rng.randint(5, 20), rng.randint(5, 23)
            idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
            dec = C.decode_png(
                C.encode_png_palette(idx, pal, bit_depth=depth,
                                     filter_type=ft))
            assert np.array_equal(dec, pal[idx]), (depth, ft)
    pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, size=(6, 7)).astype(np.uint8)
    enc = C.encode_png_palette(idx, pal, bit_depth=2, trns=bytes([0, 128]))
    dec = C.decode_png(enc)
    assert dec.shape == (6, 7, 4)
    alpha = np.array([0, 128, 255, 255], dtype=np.uint8)
    assert np.array_equal(dec[:, :, 3], alpha[idx])
    # strip the PLTE chunk -> loud failure, not garbage pixels
    import struct as _s
    plte_at = enc.find(b"PLTE") - 4
    (ln,) = _s.unpack(">I", enc[plte_at:plte_at + 4])
    broken = enc[:plte_at] + enc[plte_at + 12 + ln:]
    with pytest.raises(ValueError, match="PLTE"):
        C.decode_png(broken)


# ---------------------------------------------------------------- GIF

def test_gif_roundtrip_sweep():
    """Lossless across palette sizes spanning every min-code-size,
    shapes spanning sub-byte and multi-block LZW streams."""
    rng = np.random.RandomState(7)
    for n in (2, 3, 4, 5, 16, 17, 64, 200, 256):
        for shape in ((1, 1), (3, 5), (16, 16), (40, 37)):
            pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
            ix = rng.randint(0, n, shape).astype(np.uint8)
            dec = C.decode_gif(C.encode_gif(ix, pal))
            assert np.array_equal(dec, pal[ix]), (n, shape)


def test_gif_lzw_kwkwk_and_table_reset():
    """Repetitive rows force the KwKwK decode case; a 300x400
    250-color noise image overflows the 4096-entry table repeatedly,
    exercising the clear/reset path on both sides."""
    rng = np.random.RandomState(11)
    pal2 = rng.randint(0, 256, (2, 3)).astype(np.uint8)
    rep = np.zeros((200, 300), np.uint8)
    rep[::3, ::2] = 1
    assert np.array_equal(C.decode_gif(C.encode_gif(rep, pal2)), pal2[rep])
    pal = rng.randint(0, 256, (250, 3)).astype(np.uint8)
    ix = rng.randint(0, 250, (300, 400)).astype(np.uint8)
    assert np.array_equal(C.decode_gif(C.encode_gif(ix, pal)), pal[ix])


def test_gif_interlaced_decode():
    """Craft an interlaced stream: store rows in the 8/8/4/2 pass
    order and set the interlace flag — decode must un-permute."""
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    h, w = 13, 9
    ix = rng.randint(0, 8, (h, w)).astype(np.uint8)
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    enc = bytearray(C.encode_gif(ix[np.array(order)], pal))
    gct_end = 13 + 3 * (2 << (enc[10] & 0x07))
    assert enc[gct_end] == 0x2C  # image separator
    enc[gct_end + 9] |= 0x40  # descriptor flags: set interlace
    assert np.array_equal(C.decode_gif(bytes(enc)), pal[ix])


def test_gif_skips_extension_blocks():
    """A GCE + application extension injected before the image
    descriptor (what ImageMagick/animation encoders emit) is skipped."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    ix = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    enc = C.encode_gif(ix, pal)
    gct_end = 13 + 3 * (2 << (enc[10] & 0x07))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    appext = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    spliced = enc[:gct_end] + gce + appext + enc[gct_end:]
    assert np.array_equal(C.decode_gif(spliced), pal[ix])


def test_gif_decodes_real_external_files():
    """Ground truth from the wild: two REAL GIFs produced by other
    encoders (CPython idlelib `plusnode.gif` and the ImageMagick-made
    `python.gif` from CPython's test data — PSF-licensed test
    fixtures). A variable-width LZW convention mismatch derails the
    bitstream within a few codes (corrupt-code or out-of-palette
    errors), so clean decodes with pinned shapes and channel sums pin
    the convention, not just self-consistency."""
    import base64

    plusnode = base64.b64decode(
        "R0lGODlhCwALAPEDAP///39/fwAAAMDAwCH5BAUAAAMALAAAAAALAAsAAAIfnI8W"
        "y6wAIwgPikhHiBfmLYThVAEdqXFYKX1Nk8RDAQA7"
    )
    arr = C.decode_gif(plusnode)
    assert arr.shape == (11, 11, 3)
    assert int(arr.astype(np.int64).sum()) == 65832

    python_gif = base64.b64decode(
        "R0lGODlhEAAQAPU/AOu7GOu+IfPBGvrHGf3LG//MHOvCKv/PI//PJP/QJf/TLevF"
        "NOjHPf/TMP/UMP3VNvrTOf/XOfnVPv/YOuzORf/aQf/bRP/eS//fTv/iVf/jWP/n"
        "YvLhbvXjb/3pav/rbDJghzZmkDZnkTZpkzdoljdqljlsljpvmzpwnDtwnDxxnj1z"
        "oj50oj92pUB4pkJ7qkN8q0N9rUV/r0aAsUeBskiDtEiFtkqGukyJvEyKvEyKv0+N"
        "wVCPw1KRxv///wAAACH/C0ltYWdlTWFnaWNrB2dhbW1hPTAAIfkEBQAAPwAsAAAA"
        "ABAAEAAABpvAn/C3u81iLRVpyBTmfLMXC1VqMm1RVqo0sv50thjLFDKVqszeDleT"
        "uVSn0fmXuUh+PB1N9oKP/iA/FxUPXzY0UipnIoEUhAo/hzAuXU0VEQoHP0cuIj8c"
        "HhsZGBUTCggEPzFSPx0fGxoYFhENCAUCQispP6+xpacFBVawGAwLBgEAAF6xsw0J"
        "wl4/shEOCT6p0j8QzwUD2uBDQQA7"
    )
    arr = C.decode_gif(python_gif)
    assert arr.shape == (16, 16, 3)
    assert int(arr.astype(np.int64).sum()) == 65587


def test_gif_error_boundaries():
    pal = np.array([[1, 2, 3]], dtype=np.uint8)
    with pytest.raises(ValueError, match="not a GIF"):
        C.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="1..256"):
        C.encode_gif(np.zeros((2, 2), np.uint8),
                     np.zeros((257, 3), np.uint8))
    with pytest.raises(ValueError, match="out of palette"):
        C.encode_gif(np.full((2, 2), 5, np.uint8), pal)
    enc = bytearray(C.encode_gif(np.zeros((4, 4), np.uint8),
                                 np.array([[9, 9, 9]], np.uint8)))
    enc[-10] ^= 0xFF  # corrupt inside the LZW stream
    with pytest.raises(ValueError):
        C.decode_gif(bytes(enc))


def test_gif_dispatch_and_synthesized_fixture():
    """decode_image sniffs GIF magic; the driver fixture's closed
    form (pixel = palette[(id*3 + x + 2y) mod n]) holds exactly."""
    mid = 7
    w, h, n = mid % 64 + 16, mid % 48 + 16, mid % 197 + 8
    pi = np.arange(n, dtype=np.int64)
    pal = np.stack([(pi * 7 + mid) % 256, (pi * 11 + 3) % 256,
                    (pi * 13 + 5 * mid) % 256], axis=1).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    ix = ((mid * 3 + xx + 2 * yy) % n).astype(np.uint8)
    enc = C.encode_gif(ix, pal)
    assert np.array_equal(C.decode_image(enc), pal[ix])


# ------------------------------------------------- progressive JPEG

def test_jpeg_progressive_equals_baseline_decode():
    """The definitive cross-check: a progressive stream transmits the
    SAME quantized coefficients as the baseline stream, just
    re-ordered across scans — so decode(progressive(x)) must equal
    decode(baseline(x)) PIXEL-EXACTLY. Any bit slip in spectral
    selection, EOB runs, successive approximation or refinement
    correction bits destroys the equality."""
    rng = np.random.RandomState(5)
    for shape in ((16, 24), (33, 41), (7, 9)):
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(
            C.decode_jpeg(C.encode_jpeg_gray(arr)),
            C.decode_jpeg(C.encode_jpeg_progressive(arr)),
        ), shape
    for shape in ((40, 56, 3), (33, 41, 3)):
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(
            C.decode_jpeg(C.encode_jpeg_color(arr)),
            C.decode_jpeg(C.encode_jpeg_progressive(arr)),
        ), shape


def test_jpeg_progressive_script_variants():
    """libjpeg's default script shape (bands 1-5/6-63 at Al=2), a
    no-SA script (Al=0), and a 3-level ladder over three bands all
    reproduce the baseline decode — chained refinements included."""
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (48, 40)).astype(np.uint8)
    base = C.decode_jpeg(C.encode_jpeg_gray(arr))
    for sc in (
        dict(ac_bands=((1, 5), (6, 63)), al=2),
        dict(al=0),
        dict(al=3, ac_bands=((1, 2), (3, 20), (21, 63))),
    ):
        assert np.array_equal(
            base, C.decode_jpeg(C.encode_jpeg_progressive(arr, **sc))
        ), sc
    carr = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    cbase = C.decode_jpeg(C.encode_jpeg_color(carr))
    assert np.array_equal(
        cbase,
        C.decode_jpeg(
            C.encode_jpeg_progressive(carr, ac_bands=((1, 5), (6, 63)), al=2)
        ),
    )


def test_jpeg_progressive_lossless_tile_corner():
    """The driver-oracle corner: constant 8x8 tiles survive the full
    progressive pipeline bit-exactly (SA re-orders bits of the same
    lone DC coefficient; every AC band is one long EOB run)."""
    mid = 9
    w, h = mid % 64 + 16, mid % 48 + 16
    nby, nbx = -(-h // 8), -(-w // 8)
    by, bx = np.mgrid[0:nby, 0:nbx]
    tiles = ((mid * 7) % 200 + ((bx + by + mid) % 5) * 11).astype(np.uint8)
    arr = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]
    enc = C.encode_jpeg_progressive(arr, ac_bands=((1, 5), (6, 63)), al=2)
    assert np.array_equal(C.decode_image(enc)[:, :, 0], arr)


def test_jpeg_progressive_boundaries():
    arr = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="partition"):
        C.encode_jpeg_progressive(arr, ac_bands=((1, 5), (7, 63)))
    with pytest.raises(ValueError, match="Al must be"):
        C.encode_jpeg_progressive(arr, al=14)
    # a corrupt stream where an AC scan claims 3 components
    enc = bytearray(C.encode_jpeg_progressive(np.zeros((8, 8, 3), np.uint8)))
    # find the first AC SOS (single component) and bump its ns byte
    i = enc.find(b"\xff\xda")           # DC scan (ns=3)
    j = enc.find(b"\xff\xda", i + 2)    # first AC scan (ns=1)
    assert enc[j + 4] == 1
    enc[j + 4] = 3
    enc[j + 3] = 6 + 4  # fix the segment length for 3 pairs
    enc[j + 2] = 0
    with pytest.raises(ValueError):
        C.decode_jpeg(bytes(enc))


def test_jpeg_progressive_decodes_real_external_file():
    """External ground truth for SOF2: a REAL web-encoder progressive
    JPEG (successive approximation + spectral bands over a 477x720
    photo, ~260 KB — thousands of MCUs across ~10 scans). A width,
    EOB-run or correction-bit misread derails the bitstream within a
    few codes (corrupt Huffman code / band overrun), so a clean parse
    with pinned shape and channel sums pins the convention against
    encoders other than our own. The fixture is VENDORED in-repo
    (tests/fixtures/progressive_sof2.jpg, MIT/Apache-2.0 — see the
    fixtures README) so this test can never silently skip (round 10,
    VERDICT r9 item 5)."""
    import hashlib
    import os

    p = os.path.join(
        os.path.dirname(__file__), "fixtures", "progressive_sof2.jpg"
    )
    data = open(p, "rb").read()
    assert hashlib.md5(data).hexdigest() == "8a54205aaa4d997ab37909f736e20e6f"
    sof2 = data.find(b"\xff\xc2")
    assert 0 < sof2 < data.find(b"\xff\xda")  # genuinely progressive
    arr = C.decode_jpeg(data)
    assert arr.shape == (477, 720, 3)
    assert int(arr.astype(np.int64).sum()) == 111138443


def test_gif_partial_first_frame_composites_on_screen():
    """An optimizing encoder's partial first frame (descriptor offset
    + smaller-than-screen image) composites at (left, top) on a
    background-filled logical screen."""
    pal = np.array([[9, 8, 7], [200, 100, 50]], dtype=np.uint8)
    ix = np.ones((3, 4), np.uint8)
    enc = bytearray(C.encode_gif(ix, pal))
    # grow the logical screen to 10x8 and move the frame to (2, 1)
    enc[6:8] = (10).to_bytes(2, "little")   # screen w
    enc[8:10] = (8).to_bytes(2, "little")   # screen h
    gct_end = 13 + 3 * (2 << (enc[10] & 0x07))
    assert enc[gct_end] == 0x2C
    enc[gct_end + 1 : gct_end + 3] = (2).to_bytes(2, "little")  # left
    enc[gct_end + 3 : gct_end + 5] = (1).to_bytes(2, "little")  # top
    arr = C.decode_gif(bytes(enc))
    assert arr.shape == (8, 10, 3)
    want = np.zeros((8, 10, 3), np.uint8)
    want[:, :] = pal[0]                      # background index 0
    want[1:4, 2:6] = pal[1]
    assert np.array_equal(arr, want)
    # frame exceeding the screen is corrupt, not silently cropped
    bad = bytearray(enc)
    bad[6:8] = (4).to_bytes(2, "little")
    with pytest.raises(ValueError, match="exceeds"):
        C.decode_gif(bytes(bad))


# ------------------------------------------------------- JPEG EXIF

def _with_exif(jpeg: bytes, orientation: int, byte_order: str = "II") -> bytes:
    """Splice a minimal APP1 Exif segment (TIFF header + IFD0 with
    the single 0x0112 SHORT tag) right after SOI."""
    import struct as _s

    bo = "<" if byte_order == "II" else ">"
    tiff = (
        byte_order.encode()
        + _s.pack(bo + "H", 42)
        + _s.pack(bo + "I", 8)           # IFD0 at offset 8
        + _s.pack(bo + "H", 1)           # one entry
        + _s.pack(bo + "HHI", 0x0112, 3, 1)
        + _s.pack(bo + "H", orientation) + b"\x00\x00"
        + _s.pack(bo + "I", 0)           # no next IFD
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + _s.pack(">H", len(body) + 2) + body
    return jpeg[:2] + app1 + jpeg[2:]


def test_jpeg_orientation_parses_both_byte_orders():
    base = C.encode_jpeg_gray(_tile_image(3, 16, 24))
    assert C.jpeg_orientation(base) == 1          # no EXIF
    for o in range(1, 9):
        for order in ("II", "MM"):
            assert C.jpeg_orientation(_with_exif(base, o, order)) == o
    # malformed EXIF never raises — corrupt metadata is routine
    assert C.jpeg_orientation(_with_exif(base, 9)) == 1      # out of range
    broken = _with_exif(base, 6)
    broken = broken.replace(b"Exif\x00\x00II", b"Exif\x00\x00XX", 1)
    assert C.jpeg_orientation(broken) == 1
    assert C.jpeg_orientation(b"\xff\xd8\xff") == 1


def test_decode_image_oriented_roundtrips_all_eight():
    """For every orientation o: store inverse(X, o), tag it o, and
    decode_image_oriented must return X — pinned on an asymmetric
    constant-tile image (lossless corner) so geometry errors show."""
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 256, (3, 4))
    X = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(np.uint8)  # 24x32

    def stored_form(img, o):
        # inverse of apply_exif_orientation
        if o == 2:
            return img[:, ::-1]
        if o == 3:
            return img[::-1, ::-1]
        if o == 4:
            return img[::-1, :]
        if o == 5:
            return img.swapaxes(0, 1)           # transpose is involutive
        if o == 6:
            return np.rot90(img, k=1)           # inverse of CW is CCW
        if o == 7:
            return img[::-1, ::-1].swapaxes(0, 1)
        if o == 8:
            return np.rot90(img, k=-1)
        return img

    for o in range(1, 9):
        stored = np.ascontiguousarray(stored_form(X, o))
        enc = _with_exif(C.encode_jpeg_gray(stored), o)
        got = C.decode_image_oriented(enc)[:, :, 0]
        assert np.array_equal(got, X), o
    # non-JPEG payloads pass through untouched
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    ix = np.array([[0, 1]], dtype=np.uint8)
    assert np.array_equal(
        C.decode_image_oriented(C.encode_gif(ix, pal)), pal[ix]
    )


def _animated_gif(sw, sh, pal, frames):
    """Hand-assemble a multi-frame GIF: frames = list of
    (left, top, ix, disposal, trans_idx_or_None)."""
    import struct as _s

    gct_bits = max(1, (max(pal.shape[0], 2) - 1).bit_length())
    gct = np.zeros((1 << gct_bits, 3), np.uint8)
    gct[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", sw, sh,
                   0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    mcs = max(2, gct_bits)
    for left, top, ix, disposal, tidx in frames:
        gflags = (disposal << 2) | (0x01 if tidx is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gflags, 0, 0, tidx or 0]) + b"\x00"
        h, w = ix.shape
        out += b"\x2c" + _s.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([mcs])
        stream = C._lzw_compress_gif(ix.tobytes(), mcs)
        for i in range(0, len(stream), 255):
            blk = stream[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing_disposals():
    """Frame sampling sees what a viewer sees: transparency shows the
    prior canvas, disposal 1 keeps, 2 restores background, 3 restores
    the previous canvas."""
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   dtype=np.uint8)
    full = np.ones((4, 4), np.uint8)        # red wash
    patch_keep = np.full((2, 2), 2, np.uint8)   # green patch
    # frame2 patch uses index 3 with index-0 transparent holes
    patch_t = np.array([[3, 0], [0, 3]], dtype=np.uint8)

    # disposal 1 (keep): frame1 = red wash + green patch at (1,1);
    # frame2 draws a transparent-holed blue patch at (0,0) over THAT
    gif = _animated_gif(4, 4, pal, [
        (0, 0, full, 1, None),
        (1, 1, patch_keep, 1, None),
        (0, 0, patch_t, 1, 0),
    ])
    f0 = C.decode_gif(gif, frame=0)
    assert (f0 == pal[1]).all()
    f1 = C.decode_gif(gif, frame=1)
    assert (f1[1:3, 1:3] == pal[2]).all() and (f1[0, 0] == pal[1]).all()
    f2 = C.decode_gif(gif, frame=2)
    assert (f2[0, 0] == pal[3]).all()        # drawn
    assert (f2[0, 1] == pal[1]).all()        # transparent -> red beneath
    assert (f2[1, 1] == pal[3]).all()        # drawn (inside the patch)
    assert (f2[2, 2] == pal[2]).all()        # outside patch: frame1 kept

    # disposal 2: frame0's rect restores to BACKGROUND before frame1
    gif2 = _animated_gif(4, 4, pal, [
        (0, 0, full, 2, None),
        (1, 1, patch_t, 1, 0),
    ])
    g1 = C.decode_gif(gif2, frame=1)
    assert (g1[0, 0] == pal[0]).all()        # background restored
    assert (g1[1, 1] == pal[3]).all()        # drawn
    assert (g1[1, 2] == pal[0]).all()        # transparent -> background

    # disposal 3: frame1's effect vanishes before frame2
    gif3 = _animated_gif(4, 4, pal, [
        (0, 0, full, 1, None),
        (1, 1, patch_keep, 3, None),
        (0, 0, patch_t, 1, 0),
    ])
    h2 = C.decode_gif(gif3, frame=2)
    assert (h2[2, 2] == pal[1]).all()        # green patch disposed -> red
    assert (h2[0, 0] == pal[3]).all()

    # beyond-end raises the TYPED range error with the frame count —
    # distinct from plain ValueError so samplers can skip short
    # animations without swallowing corruption
    with pytest.raises(C.GifFrameRangeError, match="has 3 frame"):
        C.decode_gif(gif, frame=3)

    # truncation is plain ValueError (never IndexError, never the
    # range error) at every cut point of a valid stream
    for cut in range(6, len(gif)):
        try:
            C.decode_gif(gif[:cut], frame=2)
        except C.GifFrameRangeError:  # pragma: no cover
            raise AssertionError(f"cut {cut}: truncation typed as range")
        except ValueError:
            pass
