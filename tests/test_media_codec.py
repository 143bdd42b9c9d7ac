"""Stdlib PNG/WAV + baseline JPEG codec tests (functions/media_codec.py).

The decoder is exercised against scanline data filtered with ALL five
PNG filter types — hand-assembled IDAT streams, not just our own
encoder's output — so a decoder bug can't hide behind a symmetric
encoder bug.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_mapwarper_spark.functions.media_codec import (
    _paeth,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_png,
    encode_wav,
    sniff_kind,
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    body = tag + payload
    return (
        struct.pack(">I", len(payload))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def _png_from_filtered(raw: bytes, w: int, h: int, color_type: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_roundtrip_grey():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_rgb_and_rgba():
    rng = np.random.RandomState(11)
    for c in (3, 4):
        img = rng.randint(0, 256, size=(6, 5, c), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def _filter_line(line, prev, ftype, bpp):
    """Apply a PNG filter (encode direction) to one raw scanline."""
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i]
        ul = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = line[i]
        elif ftype == 1:
            v = line[i] - left
        elif ftype == 2:
            v = line[i] - up
        elif ftype == 3:
            v = line[i] - ((left + up) >> 1)
        else:
            v = line[i] - _paeth(left, up, ul)
        out[i] = v & 0xFF
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_each_filter(ftype):
    rng = np.random.RandomState(ftype + 1)
    img = rng.randint(0, 256, size=(5, 7), dtype=np.uint8)
    raw = b""
    prev = bytes(7)
    for y in range(5):
        line = bytes(img[y])
        raw += bytes([ftype]) + _filter_line(line, prev, ftype, bpp=1)
        prev = line
    assert np.array_equal(decode_png(_png_from_filtered(raw, 7, 5)), img)


def test_png_decode_mixed_filters_rgb():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    flat = img.reshape(5, 12)
    raw = b""
    prev = bytes(12)
    for y in range(5):
        line = bytes(flat[y])
        ftype = y % 5
        raw += bytes([ftype]) + _filter_line(line, prev, ftype, bpp=3)
        prev = line
    assert np.array_equal(
        decode_png(_png_from_filtered(raw, 4, 5, color_type=2)), img
    )


def test_png_bad_crc_rejected():
    img = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_wav_roundtrip_int16():
    samples = (np.sin(np.linspace(0, 20, 640)) * 20000).astype(np.int16)
    out = decode_wav(encode_wav(samples))
    assert np.array_equal(out, samples.astype(np.float64))


def test_sniff_kind():
    assert sniff_kind(encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert sniff_kind(encode_wav(np.zeros(4, np.int16))) == "wav"
    assert (
        sniff_kind(encode_jpeg(np.zeros((8, 8), np.uint8))) == "jpeg"
    )
    assert sniff_kind(b"\x00\x01\x02") == "unknown"


def test_decode_real_dispatch():
    from etl_mapwarper_spark.operators.multimodal import decode_real

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_real(encode_png(img), "image"), img)
    s = np.arange(16, dtype=np.int16)
    assert np.array_equal(decode_real(encode_wav(s), "audio"), s)
    flat = np.full((8, 8), 93, dtype=np.uint8)
    assert np.array_equal(
        decode_real(encode_jpeg(flat, quality=100), "image"), flat
    )
    # video containers stay behind the documented stub contract
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x00\x00\x18ftypmp42 fake mp4", "video")


# ---------------------------------------------------------------------------
# Baseline JPEG
# ---------------------------------------------------------------------------


def test_jpeg_flat_blocks_exact_q100():
    """All-ones quant (q=100) carries block-constant images bit-exactly
    through DC-diff Huffman coding — the invariant mm_jpeg_roundtrip's
    closed-form oracle relies on."""
    img = np.zeros((16, 16), dtype=np.uint8)
    for b, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (7 + 37 * b) % 256
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)
    # negative DC diffs too (descending block values)
    desc = np.repeat(
        np.repeat(np.array([[200, 9], [130, 255]], np.uint8), 8, 0), 8, 1
    )
    assert np.array_equal(decode_jpeg(encode_jpeg(desc, quality=100)), desc)


def test_jpeg_ramp_golden():
    """Textured 8×8 (AC coefficients + category bits + ZRL-free runs):
    decode must stay within ±1 at q=90 and match a pinned checksum —
    the codec is deterministic, so any drift is a real change."""
    ramp = (np.arange(64, dtype=np.int64).reshape(8, 8) * 3 % 256).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(ramp, quality=90))
    assert int(np.abs(dec.astype(int) - ramp.astype(int)).max()) <= 1
    assert int(dec.astype(np.int64).sum()) == 6056


def test_jpeg_grey_rgb_exact_q100():
    """r=g=b maps to (Y=v, Cb=Cr=128) exactly under the JFIF transform,
    so grey RGB roundtrips exactly at q=100 through the 3-component
    interleaved scan."""
    img = np.zeros((16, 16), dtype=np.uint8)
    for b, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (11 + 53 * b) % 256
    rgb = np.stack([img] * 3, axis=-1)
    dec = decode_jpeg(encode_jpeg(rgb, quality=100))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec, rgb)


def test_jpeg_color_roundtrip_tolerance():
    """Smooth color image through the full YCbCr path at q=85: lossy,
    but bounded — pins that quantization behaves sanely."""
    y, x = np.mgrid[0:24, 0:24]
    rgb = np.stack(
        [(y * 5 + 40) % 200 + 28, (x * 5 + 80) % 200 + 28, ((x + y) * 3) % 200 + 28],
        axis=-1,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quality=85))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert float(err.mean()) < 8.0
    assert int(err.max()) < 64  # block-edge ringing bound


def test_jpeg_non_multiple_of_8_dims():
    """Edge-replicated padding must crop back to the exact source dims."""
    odd = (np.arange(10 * 13, dtype=np.int64) % 256).astype(np.uint8)
    odd = odd.reshape(10, 13)
    dec = decode_jpeg(encode_jpeg(odd, quality=100))
    assert dec.shape == (10, 13)
    assert int(np.abs(dec.astype(int) - odd.astype(int)).max()) <= 1


def test_jpeg_byte_stuffing_exercised():
    """A high-valued flat image produces 0xFF entropy bytes often
    enough across many values to exercise stuffing; independently,
    scan bytes must never contain a bare 0xFF before EOI."""
    for v in range(0, 256, 17):
        img = np.full((8, 8), v, dtype=np.uint8)
        enc = encode_jpeg(img, quality=100)
        scan = enc[enc.find(b"\xff\xda") + 2 :][:-2]
        i = 0
        # skip the SOS header (length-prefixed)
        seg_len = int.from_bytes(scan[:2], "big")
        body = scan[seg_len:]
        while i < len(body):
            if body[i] == 0xFF:
                assert body[i + 1] == 0x00, "unstuffed 0xFF in scan"
                i += 2
            else:
                i += 1
        assert np.array_equal(decode_jpeg(enc), img)


def test_jpeg_rejects_unsupported():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # rebrand as arithmetic-coded sequential
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))
    # rebranding a BASELINE stream as progressive makes its full-band
    # scan header (Ss=0, Se=63) illegal for a progressive DC scan —
    # corrupt input, not a scope boundary
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG definitely not a jpeg")


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn streams decode bit-identically to the same image
    encoded without restarts (predictor resets + marker alignment are
    internal); a wrong restart index is corrupt input."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    for q, sub, ri in [(90, "444", 1), (90, "420", 3), (100, "444", 7)]:
        plain = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        rst = decode_jpeg(
            encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
        )
        assert np.array_equal(plain, rst), (q, sub, ri)
    enc = bytearray(encode_jpeg(img, quality=90, restart_interval=2))
    i = enc.find(b"\xff\xd0")
    assert i > 0, "RST0 marker must be present"
    enc[i + 1] = 0xD4  # out-of-sequence restart index
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(enc))


def test_jpeg_progressive_matches_baseline_bit_exact():
    """Progressive (SOF2) and baseline encodings carry the SAME
    quantized coefficients (successive approximation transmits every
    bit exactly once), so both decode to bit-identical pixels — the
    differential contract that pins all four progressive scan modes
    (DC/AC first + refine), EOB runs, and correction-bit buffering."""
    from etl_mapwarper_spark.functions.media_codec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(23)
    # textured grey, odd shapes (partial edge blocks)
    for shape in [(8, 8), (24, 17), (7, 5), (64, 48)]:
        g = rng.randint(0, 256, shape).astype(np.uint8)
        for q in (60, 90, 100):
            a = decode_jpeg(encode_jpeg(g, quality=q))
            b = decode_jpeg(encode_jpeg_progressive(g, quality=q))
            assert np.array_equal(a, b), (shape, q)
    # RGB, both subsamplings
    for shape in [(25, 41, 3), (9, 13, 3)]:
        c = rng.randint(0, 256, shape).astype(np.uint8)
        for sub in ("444", "420"):
            a = decode_jpeg(encode_jpeg(c, quality=100, subsampling=sub))
            b = decode_jpeg(
                encode_jpeg_progressive(c, quality=100, subsampling=sub)
            )
            assert np.array_equal(a, b), (shape, sub)
    # smooth low-quality image: long zero bands → deep EOB runs
    yy, xx = np.mgrid[0:64, 0:48]
    smooth = ((yy + xx) // 2 % 256).astype(np.uint8)
    for q in (20, 40):
        a = decode_jpeg(encode_jpeg(smooth, quality=q))
        b = decode_jpeg(encode_jpeg_progressive(smooth, quality=q))
        assert np.array_equal(a, b), q
    # flat q100 stays pixel-exact through the progressive path too
    flat = np.full((16, 24), 201, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, quality=100)), flat
    )


# ---------------------------------------------------------------------------
# JPEG property tests (hypothesis): decoder vs encoder over arbitrary
# shapes/contents, not just the golden fixtures. q=100 keeps every
# quantizer at 1, so the only loss is coefficient rounding — empirically
# and analytically a |err| <= 2 bound per pixel; flat blocks are exact.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_q100_roundtrip_bounded(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=12
    ),
)
def test_jpeg_flat_block_grid_exact(vals):
    """Any grid of constant 8×8 blocks roundtrips exactly at q=100 —
    the mm_jpeg_roundtrip oracle invariant, over arbitrary DC walks
    (large positive and negative diffs through every size category)."""
    n = len(vals)
    img = np.zeros((8, 8 * n), dtype=np.uint8)
    for i, v in enumerate(vals):
        img[:, 8 * i : 8 * (i + 1)] = v
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=28),
    w=st.integers(min_value=1, max_value=28),
    q=st.sampled_from([35, 75, 100]),
    ri=st.sampled_from([0, 1, 2, 5]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_property(h, w, q, ri, seed):
    """Property form of the differential contract: for arbitrary
    shapes/contents/qualities, progressive (SOF2) and baseline
    (restart-interval-encoded or not) streams decode identically."""
    from etl_mapwarper_spark.functions.media_codec import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=q, restart_interval=ri))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
    assert np.array_equal(base, prog)


# ---------------------------------------------------------------------------
# 4:2:0 chroma subsampling (round-6 extension), SOS/SOF component-id
# matching, and the corrupt-table ValueError contract.
# ---------------------------------------------------------------------------


def test_jpeg_420_grey_rgb_exact_q100():
    """Grey-valued RGB (r=g=b) maps to (Y=v, Cb=Cr=128) EXACTLY under
    the JFIF transform, so 2×2 chroma averaging is lossless and the
    q=100 4:2:0 roundtrip of MCU-constant images is bit-exact."""
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    for b, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        img[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16, :] = (
            40 + 61 * b
        ) % 256
    enc = encode_jpeg(img, quality=100, subsampling="420")
    # header really declares 2×2 luma sampling
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 10] == 1 and enc[sof + 11] == 0x22  # Y: id 1, 2×2
    assert enc[sof + 14] == 0x11 and enc[sof + 17] == 0x11  # Cb/Cr 1×1
    dec = decode_jpeg(enc)
    assert np.array_equal(dec, img)


def test_jpeg_420_odd_dims_roundtrip():
    """Non-multiple-of-16 dims: MCU padding + component-extent crop."""
    rng = np.random.RandomState(7)
    grey = rng.randint(0, 256, size=(19, 23)).astype(np.uint8)
    img = np.stack([grey, grey, grey], axis=-1)
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert dec.shape == img.shape
    # grey RGB → chroma constant 128 → only luma rounding error remains
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_420_color_tolerance():
    """Smoothly-varying color at q=90 stays within the usual JPEG
    tolerance even with chroma decimated 2×2 + replicated back."""
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [
            (128 + 4 * (xx // 8)).astype(np.uint8),
            (128 + 4 * (yy // 8)).astype(np.uint8),
            np.full((32, 32), 96, dtype=np.uint8),
        ],
        axis=-1,
    )
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 8.0


def test_jpeg_sos_order_differs_from_sof():
    """T.81 allows SOS to list components in a different order than
    SOF; the decoder must match by component id and walk the MCU in
    SOS order. Constant planes make the expected swap closed-form:
    with the scan bytes carrying (Y=228, Cb=128, Cr=128) but the SOS
    relabeled (3, 2, 1), a cid-matching decoder assigns the first
    block to Cr, giving YCbCr=(128,128,228) → RGB (255, 57, 128)."""
    img = np.full((8, 8, 3), 228, dtype=np.uint8)
    enc = bytearray(encode_jpeg(img, quality=100))
    sos = enc.find(b"\xff\xda")
    assert enc[sos + 5] == 1 and enc[sos + 7] == 2 and enc[sos + 9] == 3
    enc[sos + 5], enc[sos + 9] = 3, 1  # swap first/third scan cids
    dec = decode_jpeg(bytes(enc))
    y, cb, cr = 128.0, 128.0, 228.0
    exp = np.clip(
        np.round(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(dec, np.broadcast_to(exp, (8, 8, 3)))


def test_jpeg_undefined_tables_raise_valueerror():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    sos = enc.find(b"\xff\xda")
    bad = bytearray(enc)
    bad[sos + 6] = 0x31  # DC table 3, AC table 1: neither defined
    with pytest.raises(ValueError, match="undefined DC Huffman table 3"):
        decode_jpeg(bytes(bad))
    bad = bytearray(enc)
    bad[sos + 6] = 0x01  # AC table 1 undefined
    with pytest.raises(ValueError, match="undefined AC Huffman table 1"):
        decode_jpeg(bytes(bad))
    bad = bytearray(enc)
    sof = enc.find(b"\xff\xc0")
    bad[sof + 12] = 2  # component references quant table 2
    with pytest.raises(ValueError, match="undefined quantization table 2"):
        decode_jpeg(bytes(bad))
    bad = bytearray(enc)
    bad[sos + 5] = 9  # SOS names a component id SOF never declared
    with pytest.raises(ValueError, match="undeclared component id 9"):
        decode_jpeg(bytes(bad))




@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_420_q100_roundtrip_bounded(h, w, seed):
    """Property: grey-valued RGB roundtrips through 4:2:0 q=100 within
    the luma rounding bound for ARBITRARY shapes (odd dims, single
    pixels, non-MCU multiples) — chroma is exactly 128 throughout, so
    subsampling adds zero error and the 4:4:4 bound carries over."""
    rng = np.random.RandomState(seed)
    grey = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    img = np.stack([grey, grey, grey], axis=-1)
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=8
    ),
)
def test_jpeg_420_flat_mcu_grid_exact(vals):
    """Any horizontal strip of constant 16×16 grey MCUs roundtrips
    exactly at q=100 under 4:2:0 — the src_binaryfile_media 4:2:0
    fixture invariant, over arbitrary DC walks."""
    n = len(vals)
    img = np.zeros((16, 16 * n, 3), dtype=np.uint8)
    for i, v in enumerate(vals):
        img[:, 16 * i : 16 * (i + 1), :] = v
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert np.array_equal(dec, img)
