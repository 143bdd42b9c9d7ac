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
- JPEG: baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  spectral selection + successive approximation, all four scan modes
  of T.81 G.2), 8-bit, greyscale or 3-channel YCbCr; standard Annex-K
  Huffman and quantization tables with libjpeg-style quality scaling.
  The decoder handles arbitrary integer sampling factors (4:4:4,
  4:2:0, 4:2:2 — the dominant real scraped-corpus layouts) with
  pixel-replication chroma upsampling, restart intervals (DRI/RSTn,
  strict marker-sequence checking), multi-scan streams, resolves SOS
  scan entries to SOF components by component id (T.81 allows the
  orders to differ), and rejects streams referencing undeclared
  quant/Huffman tables with ValueError. The encoder emits 4:4:4 by
  default, 4:2:0 (2×2-mean chroma downsample) on request, optional
  restart intervals, and ``encode_jpeg_progressive`` emits a
  4-scan-class progressive script (DC first Al=1 → per-component AC
  first Al=1 → DC refine → per-component AC refine) that exercises
  every progressive decode mode incl. EOB runs and correction bits;
  progressive and baseline encodings of the same image decode
  BIT-IDENTICALLY (both carry the same quantized coefficients), which
  is the differential test. Arithmetic coding, hierarchical (SOF5+),
  and 12-bit precision are out of scope → NotImplementedError.
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

    def emit_marker(self, marker: int) -> None:
        """Flush to a byte boundary and append a raw standalone marker
        (RSTn) — bypasses entropy byte-stuffing, per T.81 B.2.1."""
        self.flush()
        self.out += bytes([0xFF, marker])


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

    def restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker for restart index
        ``expected`` (0-7). Strict: a missing or out-of-sequence RST
        is corrupt input (ValueError), not silently resynced."""
        self._n = 0  # discard padding bits of the current byte
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            got = self.data[self.pos : self.pos + 2].hex() or "EOF"
            raise ValueError(
                f"expected restart marker RST{expected}, got 0x{got}"
            )
        self.pos += 2


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


def _jpeg_planes(
    img: np.ndarray, subsampling: str
) -> tuple[list[np.ndarray], list[tuple[int, int]]]:
    """Color-convert + subsample: image → (component planes, sampling)."""
    if img.ndim == 2:
        # Greyscale has a single component, so chroma subsampling does
        # not apply — but an unknown value must still fail loudly
        # rather than silently emitting a different layout than asked.
        if subsampling not in ("444", "420"):
            raise ValueError(f"unsupported subsampling {subsampling!r}")
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
    return planes, samp


def _pad_to_mcu_grid(
    planes: list[np.ndarray],
    samp: list[tuple[int, int]],
    mcx: int,
    mcy: int,
) -> list[np.ndarray]:
    """Edge-replicate each component plane to its MCU-grid extent."""
    return [
        np.pad(
            p,
            ((0, mcy * vi * 8 - p.shape[0]), (0, mcx * hi * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (hi, vi) in zip(planes, samp)
    ]


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW grey or HxWx3 RGB uint8 as baseline JFIF JPEG.

    ``subsampling="444"`` (default) emits 1×1 sampling for every
    component; ``"420"`` emits 2×2 luma / 1×1 chroma with a 2×2-mean
    chroma downsample (the dominant layout in real scraped corpora).
    One quantization table and one DC/AC Huffman table pair (Annex K,
    quality-scaled) shared by all components. ``restart_interval`` > 0
    emits a DRI segment and an RSTn marker (cycling 0-7, DC predictors
    reset) after every that many MCUs — the layout camera firmware and
    libjpeg emit for error resilience.
    """
    img = np.asarray(img, dtype=np.uint8)
    planes, samp = _jpeg_planes(img, subsampling)
    h, w = img.shape[0], img.shape[1]
    qtab = _quality_qtab(quality)
    dct = _dct_matrix()
    dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    ac_enc = _build_huffman(_AC_BITS, _AC_VALS)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = _pad_to_mcu_grid(planes, samp, mcx, mcy)

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    ri = int(restart_interval)
    mcu_idx = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if ri and mcu_idx and mcu_idx % ri == 0:
                bw.emit_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = [0] * len(planes)
            mcu_idx += 1
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
    dri = _seg(0xDD, struct.pack(">H", ri)) if ri else b""
    return (
        b"\xff\xd8"
        + _seg(0xE0, app0)
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht)
        + dri
        + _seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Progressive JPEG encoder (SOF2). Fixed 4-class scan script chosen to
# exercise every progressive decode mode: DC first (interleaved,
# Al=1) → per-component AC first (spectral band 1-63, Al=1) → DC
# refinement (Al=0) → per-component AC refinement (Al=0, with EOB-run
# accumulation and buffered correction bits — the T.81 G.1.2.3 / libjpeg
# jcphuff protocol). Because successive approximation transmits every
# coefficient bit exactly once, the progressive stream carries the SAME
# quantized coefficients as the baseline encoding — decoding either
# yields bit-identical pixels, which is what the differential tests pin.
# ---------------------------------------------------------------------------

# Annex K's AC table lacks the EOBRUN symbols (r<<4 for r=1..14), so
# progressive scans use a complete canonical table: every AC symbol at
# code length 8 (176 symbols ≤ 2^8 → Kraft-valid; compression is not
# the point, completeness is).
_PROG_AC_VALS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]
    + [0xF0]
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

_MAX_CORR_BITS = 937  # libjpeg bound on buffered correction bits


class _EobState:
    """Cross-block EOB-run accumulator for progressive AC scans."""

    __slots__ = ("run", "bits")

    def __init__(self) -> None:
        self.run = 0
        self.bits: list[int] = []


def _emit_eobrun(bw: "_BitWriter", ac_enc: dict, st: _EobState) -> None:
    if st.run == 0:
        return
    nbits = st.run.bit_length() - 1
    code, length = ac_enc[nbits << 4]
    bw.write(code, length)
    if nbits:
        bw.write(st.run & ((1 << nbits) - 1), nbits)
    for b in st.bits:
        bw.write(b, 1)
    st.run = 0
    st.bits = []


def _enc_ac_first_block(bw, ac_enc, zz, ss, se, al, st) -> None:
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        mag = (t if t >= 0 else -t) >> al
        if mag == 0:
            r += 1
            continue
        _emit_eobrun(bw, ac_enc, st)
        while r > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            r -= 16
        size, bits = _magnitude(mag if t >= 0 else -mag)
        code, length = ac_enc[(r << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        r = 0
    if r:
        st.run += 1
        if st.run == 0x7FFF:
            _emit_eobrun(bw, ac_enc, st)


def _enc_ac_refine_block(bw, ac_enc, zz, ss, se, al, st) -> None:
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    r = 0
    pend: list[int] = []  # this block's correction bits since last symbol
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(bw, ac_enc, st)
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            r -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if t > 1:  # nonzero history: one correction bit, not run-counted
            pend.append(t & 1)
            continue
        _emit_eobrun(bw, ac_enc, st)
        code, length = ac_enc[(r << 4) | 1]
        bw.write(code, length)
        bw.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        r = 0
    if r or pend:
        st.run += 1
        st.bits.extend(pend)
        if st.run == 0x7FFF or len(st.bits) > _MAX_CORR_BITS:
            _emit_eobrun(bw, ac_enc, st)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode HxW grey or HxWx3 RGB uint8 as a progressive (SOF2) JPEG.

    Same color path, tables, and quantization as ``encode_jpeg`` —
    only the scan script differs, so baseline and progressive
    encodings of one image decode to bit-identical pixels.
    """
    img = np.asarray(img, dtype=np.uint8)
    planes, samp = _jpeg_planes(img, subsampling)
    h, w = img.shape[0], img.shape[1]
    qtab = _quality_qtab(quality)
    dct = _dct_matrix()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = _pad_to_mcu_grid(planes, samp, mcx, mcy)
    n_comp = len(planes)

    # Quantized zigzag coefficients per component over the padded grid.
    # Deliberately the SAME per-block expression as _encode_block —
    # a vectorized einsum FDCT differs by 1 ulp on some blocks, which
    # flips np.round at exact .5 spectral values and would break the
    # bit-identical-to-baseline contract (seen in practice at q=100).
    coefs: list[np.ndarray] = []
    for p, (hi, vi) in zip(padded, samp):
        nby, nbx = mcy * vi, mcx * hi
        arr = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                spec = dct @ (block - 128.0) @ dct.T
                arr[by, bx] = np.round(spec / qtab).astype(np.int64).ravel()[_ZIGZAG]
        coefs.append(arr)

    dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    ac_enc = _build_huffman(_PROG_AC_BITS, _PROG_AC_VALS)

    def sos_seg(cids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(cids)])
        for cid in cids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def comp_grid(ci: int) -> tuple[int, int]:
        hi, vi = samp[ci]
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        return -(-ch // 8), -(-cw // 8)

    out = bytearray()
    all_cids = [ci + 1 for ci in range(n_comp)]

    # Scan 1: DC first, interleaved, Al=1.
    bw = _BitWriter()
    prev = [0] * n_comp
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (hi, vi) in enumerate(samp):
                for v in range(vi):
                    for u in range(hi):
                        dc = int(coefs[ci][my * vi + v, mx * hi + u, 0]) >> 1
                        size, bits = _magnitude(dc - prev[ci])
                        prev[ci] = dc
                        code, length = dc_enc[size]
                        bw.write(code, length)
                        if size:
                            bw.write(bits, size)
    bw.flush()
    out += sos_seg(all_cids, 0, 0, 0, 1) + bytes(bw.out)

    # Scans 2..1+n: AC first per component, band 1-63, Al=1.
    for ci in range(n_comp):
        cbh, cbw = comp_grid(ci)
        bw = _BitWriter()
        st = _EobState()
        for by in range(cbh):
            for bx in range(cbw):
                _enc_ac_first_block(bw, ac_enc, coefs[ci][by, bx], 1, 63, 1, st)
        _emit_eobrun(bw, ac_enc, st)
        bw.flush()
        out += sos_seg([ci + 1], 1, 63, 0, 1) + bytes(bw.out)

    # DC refinement: one raw bit per block, interleaved, Al=0.
    bw = _BitWriter()
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (hi, vi) in enumerate(samp):
                for v in range(vi):
                    for u in range(hi):
                        bw.write(int(coefs[ci][my * vi + v, mx * hi + u, 0]) & 1, 1)
    bw.flush()
    out += sos_seg(all_cids, 0, 0, 1, 0) + bytes(bw.out)

    # AC refinement per component, Ah=1 → Al=0.
    for ci in range(n_comp):
        cbh, cbw = comp_grid(ci)
        bw = _BitWriter()
        st = _EobState()
        for by in range(cbh):
            for bx in range(cbw):
                _enc_ac_refine_block(bw, ac_enc, coefs[ci][by, bx], 1, 63, 0, st)
        _emit_eobrun(bw, ac_enc, st)
        bw.flush()
        out += sos_seg([ci + 1], 1, 63, 1, 0) + bytes(bw.out)

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = bytes([0x00]) + bytes(int(v) for v in qtab.ravel()[_ZIGZAG])
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    )
    return (
        b"\xff\xd8"
        + _seg(0xE0, app0)
        + _seg(0xDB, dqt)
        + _seg(0xC2, sof)
        + _seg(0xC4, dht)
        + bytes(out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# JPEG decoding — coefficient domain. Every scan (baseline full-block,
# progressive DC/AC first/refine per T.81 G.2, libjpeg jdphuff
# structure) accumulates quantized zigzag coefficients into per-
# component arrays; dequantization + IDCT + upsampling happen once at
# the end, shared by both modes.
# ---------------------------------------------------------------------------


def _full_block(br, dc_tab, ac_tab, pred, zz):
    """Baseline sequential: DC diff + all 63 AC of one block."""
    size = br.read_code(dc_tab)
    pred += _extend(br.read_bits(size), size)
    zz[0] = pred
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
    return pred


def _dc_first_block(br, dc_tab, pred, zz, al):
    size = br.read_code(dc_tab)
    pred += _extend(br.read_bits(size), size)
    zz[0] = pred << al
    return pred


def _dc_refine_block(br, zz, al):
    if br.read_bit():
        zz[0] = int(zz[0]) | (1 << al)


def _ac_first_block(br, ac_tab, zz, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_code(ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run != 15:
                eobrun = (1 << run) - 1  # current block is a member
                if run:
                    eobrun += br.read_bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac_tab, zz, ss, se, al, eobrun):
    """T.81 G.2 successive-approximation AC refinement (the libjpeg
    jdphuff control flow): newly-significant coefficients arrive as
    run/1 symbols with a sign bit; already-nonzero coefficients
    consume one correction bit wherever the scan passes over them —
    including inside ZRL runs and EOB-run tails."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_code(ac_tab)
            run, size = rs >> 4, rs & 0xF
            val = 0
            if size:
                if size != 1:
                    raise ValueError("invalid AC refinement magnitude")
                val = p1 if br.read_bit() else m1
            elif run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += br.read_bits(run)
                break  # tail below handles this block + decrements
            while k <= se:
                cur = int(zz[k])
                if cur:
                    if br.read_bit() and not (cur & p1):
                        zz[k] = cur + (p1 if cur > 0 else m1)
                else:
                    run -= 1
                    if run < 0:
                        break
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(zz[k])
            if cur and br.read_bit() and not (cur & p1):
                zz[k] = cur + (p1 if cur > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data,
    start,
    entries,
    ss,
    se,
    ah,
    al,
    progressive,
    ri,
    comps,
    comp_geom,
    coefs,
    dc_tabs,
    ac_tabs,
    mcx,
    mcy,
):
    """Decode one entropy-coded scan into the coefficient arrays;
    returns the absolute offset of the next marker."""
    by_cid = {c[0]: c for c in comps}
    resolved = []
    for cid, td, ta in entries:
        if cid not in by_cid:
            raise ValueError(f"SOS references undeclared component id {cid}")
        need_dc = (not progressive) or (ss == 0 and ah == 0)
        need_ac = (not progressive) or ss > 0
        if need_dc and td not in dc_tabs:
            raise ValueError(f"undefined DC Huffman table {td}")
        if need_ac and ta not in ac_tabs:
            raise ValueError(f"undefined AC Huffman table {ta}")
        resolved.append(
            (cid, dc_tabs.get(td) if need_dc else None,
             ac_tabs.get(ta) if need_ac else None)
        )
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if ss > 0 and len(entries) != 1:
            raise ValueError("progressive AC scans must be single-component")
        if se > 63 or ss > se:
            raise ValueError("invalid spectral selection")

    scan_data = data[start:]
    br = _BitReader(scan_data)
    preds = dict.fromkeys((cid for cid, *_ in resolved), 0)
    state = {"eobrun": 0, "rst": 0, "units": 0}

    def unit_boundary():
        if ri and state["units"] and state["units"] % ri == 0:
            br.restart(state["rst"])
            state["rst"] = (state["rst"] + 1) % 8
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0
        state["units"] += 1

    def decode_block(cid, dc_tab, ac_tab, zz):
        if not progressive:
            preds[cid] = _full_block(br, dc_tab, ac_tab, preds[cid], zz)
        elif ss == 0 and ah == 0:
            preds[cid] = _dc_first_block(br, dc_tab, preds[cid], zz, al)
        elif ss == 0:
            _dc_refine_block(br, zz, al)
        elif ah == 0:
            state["eobrun"] = _ac_first_block(
                br, ac_tab, zz, ss, se, al, state["eobrun"]
            )
        else:
            state["eobrun"] = _ac_refine_block(
                br, ac_tab, zz, ss, se, al, state["eobrun"]
            )

    if len(resolved) > 1:
        # interleaved: MCU loop over the padded grid (T.81 A.2.3)
        for my in range(mcy):
            for mx in range(mcx):
                unit_boundary()
                for cid, dc_tab, ac_tab in resolved:
                    hi, vi = comp_geom[cid][0], comp_geom[cid][1]
                    arr = coefs[cid]
                    for v in range(vi):
                        for u in range(hi):
                            decode_block(
                                cid, dc_tab, ac_tab,
                                arr[my * vi + v, mx * hi + u],
                            )
    else:
        # non-interleaved: raster over the component's TRUE block grid
        # (T.81 A.2.2 — no MCU padding)
        cid, dc_tab, ac_tab = resolved[0]
        cbh, cbw = comp_geom[cid][4], comp_geom[cid][5]
        arr = coefs[cid]
        for by in range(cbh):
            for bx in range(cbw):
                unit_boundary()
                decode_block(cid, dc_tab, ac_tab, arr[by, bx])

    p, n = br.pos, len(scan_data)
    while p + 1 < n:
        nxt = scan_data[p + 1]
        if scan_data[p] == 0xFF and nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            break
        p += 1
    return start + p


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) Huffman JPEG.

    Returns HxW for one component, HxWx3 RGB for three. Sampling
    factors are general (4:4:4 / 4:2:0 / 4:2:2 / ...): subsampled
    components are upsampled by integer pixel replication. Restart
    intervals (DRI/RSTn) are honored with strict marker-sequence
    checking; progressive streams may carry any legal scan script
    (spectral selection + successive approximation, interleaved DC /
    single-component AC, EOB runs). SOS scan entries are resolved to
    SOF components by component id — T.81 permits the SOS to list
    components in a different order than SOF. Streams referencing
    undeclared quant/Huffman tables or undeclared component ids raise
    ValueError (corrupt input). Arithmetic coding, hierarchical modes,
    and 12-bit precision raise NotImplementedError — the documented
    scope boundary.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    coefs: dict[int, np.ndarray] = {}
    comp_geom: dict[int, tuple[int, int, int, int, int, int]] = {}
    h = w = None
    hmax = vmax = mcx = mcy = 0
    progressive = False
    ri = 0
    saw_scan = False
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers outside a scan
            continue
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) Huffman "
                f"JPEG supported, got SOF {marker:#x}"
            )
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
        elif marker in (0xC0, 0xC2):
            if comps:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            precision, h, w, n_comp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for ci in range(n_comp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0xF, tq))
            if len({c[0] for c in comps}) != len(comps):
                raise ValueError("duplicate component id in SOF")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, _tq in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"non-integer upsampling ratio for component {cid} "
                        f"({hi}×{vi} vs max {hmax}×{vmax})"
                    )
            mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for cid, hi, vi, _tq in comps:
                ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
                coefs[cid] = np.zeros((mcy * vi, mcx * hi, 64), np.int32)
                comp_geom[cid] = (
                    hi, vi, mcy * vi, mcx * hi, -(-ch // 8), -(-cw // 8)
                )
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
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            entries = [
                (body[1 + 2 * ci], body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0xF)
                for ci in range(ns)
            ]
            sss, sse = body[1 + 2 * ns], body[2 + 2 * ns]
            sah, sal = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            pos = _decode_scan(
                payload, pos + 2 + length, entries, sss, sse, sah, sal,
                progressive, ri, comps, comp_geom, coefs,
                dc_tabs, ac_tabs, mcx, mcy,
            )
            saw_scan = True
            continue
        pos += 2 + length
    if not saw_scan or h is None:
        raise ValueError("missing SOS/SOF segment")

    # Dequantize + IDCT every block per component (vectorized), crop
    # each plane to its true extent (T.81 A.1.1), replicate up, crop
    # to h×w, color-convert.
    dct = _dct_matrix()
    qz_cache: dict[int, np.ndarray] = {}
    out = []
    for cid, hi, vi, tq in comps:  # output in SOF order (Y, Cb, Cr)
        if tq not in qtabs:
            raise ValueError(f"undefined quantization table {tq}")
        if tq not in qz_cache:
            qz_cache[tq] = qtabs[tq].ravel()[_ZIGZAG].astype(np.float64)
        nby, nbx = comp_geom[cid][2], comp_geom[cid][3]
        # Per-block IDCT with the same expression order the encoder's
        # FDCT uses — a vectorized einsum differs by 1 ulp on some
        # blocks, flipping np.round at exact .5 pixel values and
        # breaking the pinned golden/oracle outputs.
        plane = np.zeros((nby * 8, nbx * 8))
        zzq = coefs[cid].reshape(-1, 64) * qz_cache[tq][None, :]
        specs = np.zeros((nby * nbx, 64))
        specs[:, _ZIGZAG] = zzq
        specs = specs.reshape(nby, nbx, 8, 8)
        for by in range(nby):
            for bx in range(nbx):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    dct.T @ specs[by, bx] @ dct + 128.0
                )
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        p = plane[:ch, :cw]
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
