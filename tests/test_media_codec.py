"""Stdlib PNG/WAV codec tests (functions/media_codec.py).

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
    decode_png,
    decode_wav,
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
    assert sniff_kind(b"\x00\x01\x02") == "unknown"


def test_decode_real_dispatch():
    from etl_mapwarper_spark.operators.multimodal import decode_real

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_real(encode_png(img), "image"), img)
    s = np.arange(16, dtype=np.int16)
    assert np.array_equal(decode_real(encode_wav(s), "audio"), s)
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0 fake jpeg", "image")
