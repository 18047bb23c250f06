"""Pure-stdlib media codecs for the multimodal operators.

This container has no PIL/ffmpeg, but three public formats decode with
nothing beyond ``struct``/``wave``/``zlib``/numpy: Windows BMP
(BITMAPINFOHEADER, 24/32 bpp, BI_RGB), RIFF WAV (PCM 8/16-bit), and PNG
(8-bit gray/RGB/RGBA, non-interlaced — DEFLATE via stdlib zlib plus the
five scanline filters from the PNG spec, RFC 2083). That makes
``decode='real'`` a REAL decode path — sniff, pixel/sample access,
resize, re-encode — while formats needing an entropy/DCT stack
(JPEG/MP4…) still raise at the documented integration point.

All functions are plain bytes→numpy transforms: they run inside the
Arrow-batched mapInPandas stages of operators/multimodal.py and have no
Spark or I/O dependencies (unit-testable in isolation).
"""

from __future__ import annotations

import io
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
    return None


def decode_bmp(raw: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB. Supports the uncompressed 24/32 bpp
    BITMAPINFOHEADER form (BI_RGB), bottom-up or top-down rows."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
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
    [-1, 1) shaped (n_frames, n_channels))."""
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
