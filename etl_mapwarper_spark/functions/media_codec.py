"""Real media codecs with stdlib only — no PIL/ffmpeg in this
container, but PNG is zlib deflate + per-scanline filters and WAV is a
RIFF header + PCM samples, both fully decodable with ``zlib``/
``struct``/``wave``.

Scope (documented contract):
- PNG: 8-bit greyscale and 8-bit RGB/RGBA, non-interlaced; all five
  scanline filters (None/Sub/Up/Average/Paeth) on decode; encoder
  emits filter 0. This covers the lossless-screenshot/map-tile class
  of payloads the reference pipeline moves around.
- WAV: PCM 8/16-bit mono/stereo via the stdlib ``wave`` module.
- JPEG/MP4/etc. genuinely need external codecs → NotImplementedError
  (import-gated, same contract as before).

These run inside ``mapInPandas`` batches (operators/multimodal.py) —
per-row Python cost is the codec itself, the Arrow boundary stays
columnar, and payloads remain opaque bytes on the JVM side.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_WAV_MAGIC = b"RIFF"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (grey) or HxWxC (C∈{3,4}) uint8 array as a real PNG."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, channels, color_type = img.shape[0], img.shape[1], 1, 0
        flat = img
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, channels = img.shape
        color_type = 2 if channels == 3 else 6
        flat = img.reshape(h, w * channels)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit grey/RGB/RGBA PNG to uint8 array.

    Returns HxW for greyscale, HxWxC otherwise. Verifies chunk CRCs.
    """
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    channels = 1
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} unsupported")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError(f"color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    if channels == 1:
        return out
    return out.reshape(height, width, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, sampwidth: int = 2
) -> bytes:
    """Encode int16 (or uint8) PCM samples as a real mono WAV."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        dtype = np.int16 if sampwidth == 2 else np.uint8
        w.writeframes(np.asarray(samples, dtype=dtype).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode PCM WAV bytes to a float64 sample array (mono-mixed)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    else:
        raise NotImplementedError(f"sample width {width} unsupported")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples


def sniff_kind(payload: bytes) -> str:
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:4] == _WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"
