"""Multimodal column plumbing (north-star ops): image/audio/video as opaque
``binary`` columns + typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched pandas stages over mapInPandas.

Codec support is tiered. ``decode=fake`` produces deterministic
pseudo-features from the bytes (full pipeline testable end-to-end with
any payload). ``decode=real`` REALLY decodes the public formats a
pure-stdlib codec can handle — BMP (24/32 bpp BI_RGB), PNG (8-bit
gray/RGB/RGBA non-interlaced, stdlib-zlib DEFLATE + all five scanline
filters), baseline JPEG (T.81 baseline sequential Huffman+DCT, any
sampling on decode), and WAV (PCM 8/16-bit) via operators/codecs.py:
pixel/sample access, numpy feature descriptors, nearest-neighbor resize
with same-format re-encode (JPEG re-encode is 4:4:4 q=85 — lossy by
format nature). Formats needing a full container stack (MP4) or
non-baseline JPEG (progressive/arithmetic) still raise
NotImplementedError at the exact point a PIL/ffmpeg call would go —
that remains the integration seam in this container.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata (no side-channel file fetch per row); mapInPandas streams Arrow
record batches, so executor memory is bounded by batch size — Spark 4
bounds batches by BYTES too (spark.sql.execution.arrow.maxBytesPerBatch,
default 64 MB), which is what actually matters when one row carries a
media blob and records-per-batch alone would admit gigabytes. The
remaining hard ceiling (round-10 wide-row audit) is per-CELL: Arrow's
BinaryType uses 32-bit offsets, so a single payload must stay under
2 GiB. A feature-film MP4 breaches that — at ingest, oversize media
must split into per-row chunks (media_id, chunk_idx, payload) and the
frame-sampling path already works per-box/per-frame, never needing the
whole file in one cell.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped frame from any string column (test
    harness for the binary path: utf-8 bytes stand in for media bytes)."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(source_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(
    media: DataFrame, decode: str = "fake", feature_dim: int = 8
) -> DataFrame:
    """Decode + featurize each payload via Arrow-batched mapInPandas.

    decode='fake': deterministic pseudo-embedding from md5(payload) bytes —
    exercises the full binary→vector pipeline without codecs.
    decode='real': BMP/WAV decode to numpy descriptors via
    operators/codecs.py; compressed formats raise at the PIL/ffmpeg
    integration point.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            ids, lens, hashes, feats = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                if payload is None:
                    lens.append(None)
                    hashes.append(None)
                    feats.append(None)
                    continue
                raw = bytes(payload)
                lens.append(len(raw))
                digest = hashlib.md5(raw)
                hashes.append(digest.hexdigest())
                if decode == "real":
                    fmt = codecs.sniff_format(raw)
                    if fmt == "bmp":
                        feats.append(
                            codecs.image_feature(codecs.decode_bmp(raw), feature_dim)
                        )
                        continue
                    if fmt == "png":
                        feats.append(
                            codecs.image_feature(codecs.decode_png(raw), feature_dim)
                        )
                        continue
                    if fmt == "jpeg":
                        feats.append(
                            codecs.image_feature(codecs.decode_jpeg(raw), feature_dim)
                        )
                        continue
                    if fmt == "wav":
                        feats.append(
                            codecs.audio_feature(*codecs.decode_wav(raw), feature_dim)
                        )
                        continue
                    raise NotImplementedError(
                        f"media decode for {fmt or 'unknown'} requires "
                        "PIL/ffmpeg — not in this container; wire the codec "
                        "call here"
                    )
                # fake decode: md5-seeded bytes → unit-ish float vector
                seed = digest.digest()
                buf = bytearray()
                counter = 0
                while len(buf) < feature_dim * 2:
                    buf += hashlib.md5(seed + counter.to_bytes(2, "big")).digest()
                    counter += 1
                u = np.frombuffer(bytes(buf[: feature_dim * 2]), dtype=">u2")
                feats.append((u.astype(np.float32) / 32768.0 - 1.0))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "byte_len": pd.array(lens, dtype="Int64"),
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, _FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled timestamp.

    With decode='real', MP4 payloads go through the REAL container layer
    (operators/mp4.py — ISO BMFF box walk + stts/stsz/stsc/stco sample
    resolution): each sampled timestamp emits the encoded access unit
    whose media time is the latest ≤ the timestamp, pulled from mdat by
    byte range. Decoding those access units to pixels (H.264 entropy +
    prediction) is the remaining seam — a pixel pipeline wires
    ffmpeg/PyAV where the sample bytes surface. Non-MP4 containers
    raise.

    With decode='fake', frames are deterministic slices of the payload hash
    (the plumbing — explode to frame rows, per-frame binary — is real).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def fn(batches):
        import pandas as pd

        from . import mp4 as mp4lib

        for pdf in batches:
            ids, ts, frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None:
                    continue
                if decode == "real":
                    raw = bytes(payload)
                    if not mp4lib.sniff_mp4(raw):
                        raise NotImplementedError(
                            "real frame sampling needs an ISO BMFF (MP4) "
                            "container — other containers are the ffmpeg "
                            "seam"
                        )
                    track = mp4lib.parse_mp4(raw)
                    times = track.sample_times_ms()
                    total = (times[-1] + every_ms) if times else 0
                    si = 0
                    for t in range(0, total, every_ms):
                        while si + 1 < len(times) and times[si + 1] <= t:
                            si += 1
                        ids.append(mid)
                        ts.append(t)
                        frames.append(
                            mp4lib.extract_samples(raw, track, [si])[0]
                        )
                    continue
                raw = bytes(payload)
                total = int(dur) if dur is not None and not pd.isna(dur) else 3000
                for t in range(0, total, every_ms):
                    ids.append(mid)
                    ts.append(t)
                    frames.append(
                        hashlib.md5(raw + t.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": ts, "frame_bytes": frames}
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        fn, out_schema
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224, decode: str = "fake"
) -> DataFrame:
    """Resize stage: payload → resized payload + recorded target dims.

    decode='fake' re-hashes the payload with the target geometry so the
    output bytes are deterministic and dimension-dependent (pipeline
    plumbing is real: binary in → binary out, metadata columns updated);
    decode='real' decodes BMP, nearest-neighbor-resizes in numpy, and
    re-encodes BMP (codecs.py); other formats raise at the PIL
    integration point.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def fn(batches):
        import pandas as pd

        from . import codecs

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                if payload is None:
                    payloads.append(None)
                    continue
                raw = bytes(payload)
                if decode == "real":
                    fmt = codecs.sniff_format(raw)
                    if fmt in ("bmp", "png", "jpeg"):
                        decoded = {
                            "bmp": codecs.decode_bmp,
                            "png": codecs.decode_png,
                            "jpeg": codecs.decode_jpeg,
                        }[fmt](raw)
                        resized = codecs.resize_nearest(decoded, target_w, target_h)
                        # re-encode in the source format
                        payloads.append(
                            codecs.encode_bmp(resized)
                            if fmt == "bmp"
                            else codecs.encode_png(resized)
                            if fmt == "png"
                            else codecs.encode_jpeg(resized)
                        )
                        continue
                    raise NotImplementedError(
                        "image resize for non-BMP/PNG/JPEG requires PIL — "
                        "wire Image.resize here"
                    )
                tag = f":{target_w}x{target_h}".encode()
                payloads.append(hashlib.md5(raw + tag).digest() + raw[:16])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, out_schema)
