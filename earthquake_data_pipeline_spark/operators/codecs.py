"""Pure-stdlib media codecs for the multimodal operators.

This container has no PIL/ffmpeg, but four public formats decode with
nothing beyond ``struct``/``wave``/``zlib``/numpy: Windows BMP
(BITMAPINFOHEADER, 24/32 bpp, BI_RGB), RIFF WAV (PCM 8/16-bit), PNG
(8-bit gray/RGB/RGBA, non-interlaced — DEFLATE via stdlib zlib plus the
five scanline filters from the PNG spec, RFC 2083), and baseline JPEG
(ITU T.81 baseline sequential: Huffman entropy coding + 8×8 DCT,
JFIF markers, grayscale or interleaved color with arbitrary sampling
factors — 4:4:4 / 4:2:2 / 4:2:0 decode). That makes ``decode='real'``
a REAL decode path — sniff, pixel/sample access, resize, re-encode —
while formats needing a full container/entropy stack (MP4, progressive
JPEG, arithmetic coding) still raise at the documented integration
point.

All functions are plain bytes→numpy transforms: they run inside the
Arrow-batched mapInPandas stages of operators/multimodal.py and have no
Spark or I/O dependencies (unit-testable in isolation).
"""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

import numpy as np


def sniff_format(raw: bytes) -> str | None:
    """Magic-byte detection for the formats the pipeline routes on."""
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(raw) >= 12 and raw[4:8] == b"ftyp":
        return "mp4"
    return None


def decode_bmp(raw: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB. Supports the uncompressed 24/32 bpp
    BITMAPINFOHEADER form (BI_RGB), bottom-up or top-down rows.
    Truncated/malformed input raises ValueError."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    try:
        return _decode_bmp_impl(raw)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed BMP: {e}") from e


def _decode_bmp_impl(raw: bytes) -> np.ndarray:
    (data_off,) = struct.unpack_from("<I", raw, 10)
    header_size, width, height = struct.unpack_from("<Iii", raw, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={compression}")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    row_size = (width * channels + 3) & ~3  # rows pad to 4 bytes
    img = np.frombuffer(
        raw, dtype=np.uint8, count=row_size * height, offset=data_off
    ).reshape(height, row_size)[:, : width * channels]
    img = img.reshape(height, width, channels)
    if not top_down:
        img = img[::-1]
    # BMP stores BGR(A); emit RGB
    return np.ascontiguousarray(img[:, :, 2::-1][:, :, :3])


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24 bpp bottom-up BI_RGB BMP bytes."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("encode_bmp expects RGB")
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 54)
    return header + info + pixel_data


def resize_nearest(rgb: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize — the deterministic, dependency-free kernel
    (PIL.Image.NEAREST equivalent)."""
    h, w = rgb.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return rgb[ys][:, xs]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(raw: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8 RGB. Supports 8-bit gray / RGB / gray+alpha /
    RGBA, non-interlaced (the overwhelmingly common web/export form).
    DEFLATE via stdlib zlib; all five scanline filters (None/Sub/Up/
    Average/Paeth) per RFC 2083 §6. Alpha is dropped, gray broadcast.

    Filter reversal for Sub/Average/Paeth is byte-sequential by spec; the
    inner loop is Python, sized for the KB-scale payloads that ride rows
    — a wide-image hot path would want a C/PIL codec at this seam.
    """
    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    try:
        return _decode_png_impl(raw)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"truncated or malformed PNG: {e}") from e


def _decode_png_impl(raw: bytes) -> np.ndarray:
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG form: depth={depth} color_type={color_type}"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    data = zlib.decompress(bytes(idat))
    if len(data) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        off = y * (stride + 1)
        f = data[off]
        line = np.frombuffer(data, np.uint8, stride, offset=off + 1)
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up — vectorized, uint8 add wraps mod 256 per spec
            cur = line + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth are byte-sequential
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                if f == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cur[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(height, width, channels)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → 8-bit truecolor non-interlaced PNG.

    ``filter_type`` applies one scanline filter (0–4) to every row —
    filter 0 for speed/determinism by default; the others exist so tests
    can roundtrip every filter the decoder must reverse.
    """
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("encode_png expects RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"invalid PNG filter type {filter_type}")
    stride = w * 3
    bpp = 3
    flat = rgb.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - a) & 0xFF
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type == 3:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - ((a + prev) >> 1)) & 0xFF
        else:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            c_ = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            pred = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                pred[x] = _paeth(int(a[x]), int(prev[x]), int(c_[x]))
            filt = (cur - pred) & 0xFF
        lines.append(filter_type)
        lines += filt.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """WAV (PCM 8/16-bit) → (sample_rate, n_channels, float32 samples in
    [-1, 1) shaped (n_frames, n_channels)). Truncated/malformed input
    raises ValueError."""
    try:
        return _decode_wav_impl(raw)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"truncated or malformed WAV: {e}") from e


def _decode_wav_impl(raw: bytes) -> tuple[int, int, np.ndarray]:
    with wave.open(io.BytesIO(raw), "rb") as wf:
        rate = wf.getframerate()
        channels = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, channels, samples.reshape(-1, channels)


def image_feature(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic image descriptor: [w, h, mean R/G/B, gray std] +
    a luminance histogram, truncated/padded to ``dim`` floats."""
    h, w = rgb.shape[:2]
    gray = rgb.astype(np.float32).mean(axis=2)
    head = [
        float(w),
        float(h),
        float(rgb[:, :, 0].mean()),
        float(rgb[:, :, 1].mean()),
        float(rgb[:, :, 2].mean()),
        float(gray.std()),
    ]
    hist, _ = np.histogram(gray, bins=max(dim - len(head), 1), range=(0, 255))
    vec = np.array(head + (hist / max(gray.size, 1)).tolist(), dtype=np.float32)
    return np.pad(vec, (0, max(dim - len(vec), 0)))[:dim]


def audio_feature(rate: int, channels: int, samples: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic audio descriptor: [rate/1e3, channels, duration_s,
    rms, zero-crossing rate] + coarse per-segment rms envelope."""
    mono = samples.mean(axis=1)
    n = len(mono)
    head = [
        rate / 1000.0,
        float(channels),
        n / max(rate, 1),
        float(np.sqrt((mono**2).mean())) if n else 0.0,
        float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0,
    ]
    n_seg = max(dim - len(head), 1)
    if n:
        segs = np.array_split(mono, n_seg)
        env = [float(np.sqrt((s**2).mean())) if len(s) else 0.0 for s in segs]
    else:
        env = [0.0] * n_seg
    vec = np.array(head + env, dtype=np.float32)
    return np.pad(vec, (0, max(dim - len(vec), 0)))[:dim]


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 baseline sequential DCT, JFIF interchange)
# ---------------------------------------------------------------------------
# Decoder: table-driven from the file's own DQT/DHT segments; supports
# grayscale and interleaved multi-component scans with arbitrary sampling
# factors (so 4:4:4, 4:2:2, 4:2:0 all decode). Progressive (SOF2),
# arithmetic coding, and restart intervals raise — documented seams.
# Encoder: baseline, 4:4:4 (or 1-component gray), standard Annex K
# luminance quant table scaled by ``quality`` (libjpeg formula; q=100 →
# all-ones table, which makes block-constant inputs roundtrip EXACTLY —
# the property the oracle gate query exploits) and the Annex K luminance
# Huffman tables for every component (legal: tables are file-defined).


def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for d in range(15):
        if d % 2 == 0:  # even diagonal runs bottom-left → top-right
            for i in range(min(d, 7), max(0, d - 7) - 1, -1):
                order.append((i, d - i))
        else:
            for i in range(max(0, d - 7), min(d, 7) + 1):
                order.append((i, d - i))
    return order


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([i for i, _ in _ZIGZAG])
_ZZ_COLS = np.array([j for _, j in _ZIGZAG])

# Orthonormal 8-point DCT-II basis; JPEG's F = _DCT @ block @ _DCT.T
_DCT = np.array(
    [
        [
            0.5 * (1.0 / math.sqrt(2.0) if k == 0 else 1.0)
            * math.cos((2 * n + 1) * k * math.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Annex K (ITU T.81) luminance tables — public spec constants.
_STD_QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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


def _huff_encode_table(bits, values) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: symbol → (code, n_bits)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, values) -> dict[tuple[int, int], int]:
    """(n_bits, code) → symbol, for bit-serial decoding."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per spec


class _BitReader:
    """Bit-serial reader over an entropy-coded segment with 0xFF00
    unstuffing; raises on markers inside the scan (restart unsupported)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside scan — restart "
                        "intervals/progressive JPEG not supported"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _quality_to_quant(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex K luminance table;
    quality=100 → all-ones (lossless-for-representable-coefs)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_STD_QUANT_LUM * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W) uint8 gray or (H, W, 3) uint8 RGB → baseline JFIF bytes.

    4:4:4 sampling; one quant table (scaled Annex K luminance) and the
    Annex K luminance Huffman tables shared by every component. At
    ``quality=100`` the quant table is all ones, so a block-constant
    image roundtrips bit-exactly through decode_jpeg (constant blocks
    have a single DC coefficient, which survives round() unchanged).
    """
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    quant = _quality_to_quant(quality)
    qzz = quant[_ZZ_ROWS, _ZZ_COLS]
    planes = (
        [img.astype(np.float64)]
        if gray
        else [p for p in np.moveaxis(_rgb_to_ycbcr(img), 2, 0)]
    )
    # pad to 8×8 blocks by edge replication
    ph, pw = -h % 8, -w % 8
    planes = [np.pad(p, ((0, ph), (0, pw)), mode="edge") for p in planes]

    dc_tab = _huff_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_tab = _huff_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(0, h + ph, 8):
        for bx in range(0, w + pw, 8):
            for ci, plane in enumerate(planes):
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                qc = np.rint(coef / quant).astype(np.int64)
                zz = qc[_ZZ_ROWS, _ZZ_COLS]
                # DC: category + amplitude bits of the diff
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = int(abs(diff)).bit_length()
                code, ln = dc_tab[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                # AC: (run, size) pairs with ZRL and EOB
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tab[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = int(abs(v)).bit_length()
                    code, ln = ac_tab[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, ln = ac_tab[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    n_comp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in qzz)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for cid in range(1, n_comp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in ((0, _DC_LUM_BITS, _DC_LUM_VALS), (1, _AC_LUM_BITS, _AC_LUM_VALS)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([n_comp])
    for cid in range(1, n_comp + 1):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JFIF → (H, W, 3) uint8 RGB (gray broadcast to 3 chans).

    Table-driven from the file's DQT/DHT; interleaved single-scan SOF0
    with arbitrary sampling factors (4:4:4/4:2:2/4:2:0). Progressive
    (SOF2), arithmetic coding (SOF9+), and restart intervals raise —
    those are the remaining documented seams. Truncated or malformed
    streams always raise ValueError (never a bare IndexError) — the
    contract the mapInPandas error paths rely on.
    """
    try:
        return _decode_jpeg_impl(raw)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed JPEG stream: {e}") from e


def _decode_jpeg_impl(raw: bytes) -> np.ndarray:
    if raw[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    height = width = None
    scan_map: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = raw[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", raw, pos)
        body = raw[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros((8, 8), dtype=np.int64)
                tab[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(body, np.uint8, 64, off)
                quant[tq] = tab
                off += 64
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            _prec, height, width, n_comp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(n_comp):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF 0x{marker:02X} (progressive/arithmetic/"
                "hierarchical) not supported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", body, 0)
            if interval:
                raise ValueError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_map = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(j for j, c in enumerate(comps) if c["id"] == cid)
                scan_map.append((idx, tabs >> 4, tabs & 0x0F))
            pos += seglen
            break  # entropy-coded data follows
        pos += seglen
    if height is None or not scan_map:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(raw, pos)
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, dc_id, ac_id in scan_map:
                c = comps[ci]
                dc_tab, ac_tab = huff[(0, dc_id)], huff[(1, ac_id)]
                q = quant[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.read_symbol(dc_tab)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = br.read_symbol(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        block = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise ValueError(f"unsupported JPEG component count {len(full)}")
