"""Real media codecs with stdlib+numpy only — no PIL/ffmpeg in this
container, but PNG is zlib deflate + per-scanline filters, WAV is a
RIFF header + PCM samples, and baseline JPEG is markers + canonical
Huffman + an 8×8 DCT — all implementable from the public specs
(ISO/IEC 10918-1 / ITU T.81 Annex K for the JPEG tables).

Scope (documented contract):
- PNG: 8-bit greyscale and 8-bit RGB/RGBA, non-interlaced; all five
  scanline filters (None/Sub/Up/Average/Paeth) on decode; encoder
  emits filter 0. This covers the lossless-screenshot/map-tile class
  of payloads the reference pipeline moves around.
- WAV: PCM 8/16-bit mono/stereo via the stdlib ``wave`` module.
- JPEG: baseline sequential DCT (SOF0), 8-bit, greyscale or 3-channel
  YCbCr; standard Annex-K Huffman and quantization tables with
  libjpeg-style quality scaling. The decoder handles arbitrary
  integer sampling factors (4:4:4, 4:2:0, 4:2:2 — the dominant real
  scraped-corpus layouts) with pixel-replication chroma upsampling,
  resolves SOS scan entries to SOF components by component id (T.81
  allows the orders to differ), and rejects streams referencing
  undeclared quant/Huffman tables with ValueError. The encoder emits
  4:4:4 by default and 4:2:0 (2×2-mean chroma downsample) on request.
  Progressive (SOF2), restart intervals, and arithmetic coding are
  out of scope → NotImplementedError.
- MP4/video containers genuinely need external codecs →
  NotImplementedError (import-gated, same contract as before).

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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81). Everything below is from the public spec:
# Annex-K typical Huffman/quantization tables, the zigzag scan, the
# libjpeg quality-scaling convention, and the JFIF YCbCr transform.
#
# Design note for the pipeline: quality=100 scales the Annex-K tables
# to all-ones, under which any image whose 8×8 blocks are CONSTANT
# roundtrips bit-exactly (each block reduces to a DC-only spectrum the
# integer pipeline preserves) — that is what lets mm_jpeg_roundtrip
# value-check the full marker/Huffman/DCT path against a closed-form
# SQL oracle even though JPEG is lossy in general. Textured-image
# behavior is pinned by golden tests (tests/test_media_codec.py).
# ---------------------------------------------------------------------------

_JPEG_MAGIC = b"\xff\xd8\xff"

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance quantization table (raster order).
_QTAB_BASE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3: typical DC/AC luminance Huffman tables (BITS, HUFFVAL).
# One DC and one AC table serve every component here — legal JPEG, the
# SOS simply points each component at table 0.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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


def _quality_qtab(quality: int) -> np.ndarray:
    """libjpeg convention: 50 → base table, 100 → all ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QTAB_BASE * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c  # orthonormal: F = C @ B @ C.T is the T.81 spectrum


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman_decode(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) → value."""
    return {
        (length, code): v
        for v, (code, length) in _build_huffman(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # entropy-coded byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xff{marker:02x} in scan"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in JPEG scan")


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value → (size category, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: appended bits → signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 mean chroma downsample (edge-padded to even dims first)."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return np.round(
        (
            plane[0::2, 0::2]
            + plane[0::2, 1::2]
            + plane[1::2, 0::2]
            + plane[1::2, 1::2]
        )
        / 4.0
    )


def _encode_block(
    bw: "_BitWriter",
    block: np.ndarray,
    qtab: np.ndarray,
    dct: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + entropy-code one 8×8 block; returns new DC."""
    spec = dct @ (block - 128.0) @ dct.T
    q = np.round(spec / qtab).astype(np.int64)
    zz = q.ravel()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode HxW grey or HxWx3 RGB uint8 as baseline JFIF JPEG.

    ``subsampling="444"`` (default) emits 1×1 sampling for every
    component; ``"420"`` emits 2×2 luma / 1×1 chroma with a 2×2-mean
    chroma downsample (the dominant layout in real scraped corpora).
    One quantization table and one DC/AC Huffman table pair (Annex K,
    quality-scaled) shared by all components.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        # JFIF YCbCr, rounded to integers like any integer-input codec
        ycc = [
            np.round(0.299 * r + 0.587 * g + 0.114 * b),
            np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
            np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b),
        ]
        ycc = [np.clip(c, 0, 255) for c in ycc]
        if subsampling == "444":
            planes = ycc
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            planes = [ycc[0], _downsample2(ycc[1]), _downsample2(ycc[2])]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    qtab = _quality_qtab(quality)
    dct = _dct_matrix()
    dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    ac_enc = _build_huffman(_AC_BITS, _AC_VALS)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # pad each component plane to its MCU-grid extent by edge replication
    padded = [
        np.pad(
            p,
            ((0, mcy * vi * 8 - p.shape[0]), (0, mcx * hi * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (hi, vi) in zip(planes, samp)
    ]

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (comp, (hi, vi)) in enumerate(zip(padded, samp)):
                for v in range(vi):
                    for u in range(hi):
                        by, bx = my * vi + v, mx * hi + u
                        block = comp[
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        prev_dc[ci] = _encode_block(
                            bw, block, qtab, dct, dc_enc, ac_enc, prev_dc[ci]
                        )
    bw.flush()

    n_comp = len(planes)
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = bytes([0x00]) + bytes(int(v) for v in qtab.ravel()[_ZIGZAG])
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # id, sampling, qtab 0
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    return (
        b"\xff\xd8"
        + _seg(0xE0, app0)
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht)
        + _seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _decode_block(
    br: "_BitReader",
    qtab: np.ndarray,
    dct: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode + dequantize + IDCT one 8×8 block."""
    zz = np.zeros(64, dtype=np.int64)
    size = br.read_code(dc_tab)
    dc = prev_dc + _extend(br.read_bits(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.read_code(ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    spec = np.zeros(64, dtype=np.float64)
    spec[_ZIGZAG] = zz * qtab.ravel()[_ZIGZAG]
    return dct.T @ spec.reshape(8, 8) @ dct + 128.0, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 8-bit).

    Returns HxW for one component, HxWx3 RGB for three. Sampling
    factors are general (4:4:4 / 4:2:0 / 4:2:2 / ...): subsampled
    components are upsampled by integer pixel replication. SOS scan
    entries are resolved to SOF components by component id — T.81
    permits the SOS to list components in a different order than SOF,
    and the MCU loop follows SOS order. Streams referencing undeclared
    quant/Huffman tables or undeclared component ids raise ValueError
    (corrupt input), matching the decoder's error contract.
    Progressive, restart-interval, and arithmetic-coded streams raise
    NotImplementedError — the documented scope boundary.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    h = w = None
    scan: bytes | None = None
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) supported, got SOF {marker:#x}"
            )
        if marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = zz
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC0:
            precision, h, w, n_comp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for ci in range(n_comp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0xF, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n_vals = sum(bits)
                vals = list(body[i + 17 : i + 17 + n_vals])
                tab = _build_huffman_decode(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                i += 17 + n_vals
        elif marker == 0xDA:
            ns = body[0]
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            scan = payload[pos + 2 + length :]
            break
        pos += 2 + length
    if scan is None or h is None:
        raise ValueError("missing SOS/SOF0 segment")

    # Resolve each SOS entry to its SOF component by cid and validate
    # every referenced table exists (corrupt input → ValueError).
    sof_by_cid = {c[0]: c for c in comps}
    if len(sof_by_cid) != len(comps):
        raise ValueError("duplicate component id in SOF")
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "non-interleaved / multi-scan baseline unsupported"
        )
    order: list[tuple[int, int, int, np.ndarray, dict, dict]] = []
    for cid, td, ta in scan_comps:
        if cid not in sof_by_cid:
            raise ValueError(f"SOS references undeclared component id {cid}")
        _, hi, vi, tq = sof_by_cid[cid]
        if tq not in qtabs:
            raise ValueError(f"undefined quantization table {tq}")
        if td not in dc_tabs:
            raise ValueError(f"undefined DC Huffman table {td}")
        if ta not in ac_tabs:
            raise ValueError(f"undefined AC Huffman table {ta}")
        order.append((cid, hi, vi, qtabs[tq], dc_tabs[td], ac_tabs[ta]))
    hmax = max(o[1] for o in order)
    vmax = max(o[2] for o in order)
    for cid, hi, vi, *_ in order:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-integer upsampling ratio for component {cid} "
                f"({hi}×{vi} vs max {hmax}×{vmax})"
            )

    dct = _dct_matrix()
    br = _BitReader(scan)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcy * vi * 8, mcx * hi * 8), dtype=np.float64)
        for cid, hi, vi, *_ in order
    }
    prev_dc = {cid: 0 for cid, *_ in order}
    for my in range(mcy):
        for mx in range(mcx):
            for cid, hi, vi, qtab, dc_tab, ac_tab in order:
                for v in range(vi):
                    for u in range(hi):
                        block, prev_dc[cid] = _decode_block(
                            br, qtab, dct, dc_tab, ac_tab, prev_dc[cid]
                        )
                        by, bx = my * vi + v, mx * hi + u
                        planes[cid][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = block

    # Crop each plane to its true component extent (T.81 A.1.1:
    # ceil(dim * factor / max factor)), replicate up, crop to h×w.
    out = []
    for cid, hi, vi, _tq in comps:  # output in SOF order (Y, Cb, Cr)
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        p = planes[cid][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(np.clip(np.round(p[:h, :w]), 0, 255))
    if len(out) == 1:
        return out[0].astype(np.uint8)
    if len(out) == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(out)}-component JPEG unsupported")


def sniff_kind(payload: bytes) -> str:
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:4] == _WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == _JPEG_MAGIC:
        return "jpeg"
    return "unknown"
