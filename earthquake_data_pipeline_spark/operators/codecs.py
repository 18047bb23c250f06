"""Pure-stdlib media codecs for the multimodal operators.

This container has no PIL/ffmpeg, but two uncompressed public formats
decode with nothing beyond ``struct``/``wave``/numpy: Windows BMP
(BITMAPINFOHEADER, 24/32 bpp, BI_RGB) and RIFF WAV (PCM 8/16-bit).
That is enough to make ``decode='real'`` a REAL decode path — sniff,
pixel/sample access, resize, re-encode — while compressed formats
(PNG/JPEG/MP4…) still raise at the documented integration point.

All functions are plain bytes→numpy transforms: they run inside the
Arrow-batched mapInPandas stages of operators/multimodal.py and have no
Spark or I/O dependencies (unit-testable in isolation).
"""

from __future__ import annotations

import io
import struct
import wave

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
