"""MP4 / ISO BMFF container plumbing (ISO/IEC 14496-12, public spec).

Real CONTAINER support for the video path: box-tree walking, track
metadata (codec fourcc, timescale, duration, dimensions), and full
sample-table resolution (stts/stsz/stsc/stco|co64 → per-sample byte
ranges + timestamps) so ``frame_sample(decode='real')`` emits the ACTUAL
encoded access units out of the file — deterministic byte extraction,
no codec involved. Decoding those samples to pixels (H.264/H.265
entropy + prediction) remains the documented seam where ffmpeg/PyAV
would be wired; the container layer here is what a 100 TB video
pipeline shuffles and samples by, and it is pure ``struct`` + bytes.

``build_mp4`` writes a minimal valid single-track file (ftyp/mdat/moov
with the full stbl chain) — the synthesis harness for tests and gate
queries, same role encode_bmp/encode_png play for images.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def sniff_mp4(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[4:8] == b"ftyp"


def walk_boxes(raw: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, box_end) for each box in [start, end);
    recursion into container boxes is the caller's choice via the
    returned ranges."""
    pos = start
    limit = len(raw) if end is None else end
    while pos + 8 <= limit:
        (size,) = struct.unpack_from(">I", raw, pos)
        btype = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", raw, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end
            size = limit - pos
        if size < 8 or pos + size > limit:
            raise ValueError(f"malformed MP4 box {btype!r} at {pos}")
        yield btype, body, pos + size
        pos += size


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: bytes = b""
    codec: str = ""
    timescale: int = 0
    duration: int = 0
    width: int = 0
    height: int = 0
    sample_sizes: list[int] = field(default_factory=list)
    sample_offsets: list[int] = field(default_factory=list)
    sample_times: list[int] = field(default_factory=list)  # media timescale

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    def sample_times_ms(self) -> list[int]:
        ts = max(self.timescale, 1)
        return [t * 1000 // ts for t in self.sample_times]


def parse_mp4(raw: bytes) -> Mp4Track:
    """Parse the first video track (falls back to the first track) into
    resolved per-sample byte ranges and timestamps.

    Truncated/malformed payloads raise ValueError — the same contract
    every decoder in operators/codecs.py honors, which the mapInPandas
    error paths rely on (a bare struct.error or IndexError from a short
    tkhd/mdhd body or an stsc run past the stco table must not escape).
    """
    if not sniff_mp4(raw):
        raise ValueError("not an MP4 payload (no ftyp)")
    tracks: list[Mp4Track] = []
    try:
        for btype, body, box_end in walk_boxes(raw):
            if btype == b"moov":
                for t2, b2, e2 in walk_boxes(raw, body, box_end):
                    if t2 == b"trak":
                        tracks.append(_parse_trak(raw, b2, e2))
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or malformed MP4: {exc}") from exc
    if not tracks:
        raise ValueError("MP4 has no tracks")
    for t in tracks:
        if t.handler == b"vide":
            return t
    return tracks[0]


def _parse_trak(raw: bytes, start: int, end: int) -> Mp4Track:
    tr = Mp4Track()
    stts = stsz = stsc = stco = None
    co64 = False
    for btype, body, box_end in walk_boxes(raw, start, end):
        if btype == b"tkhd":
            version = raw[body]
            if version == 1:
                (tr.track_id,) = struct.unpack_from(">I", raw, body + 4 + 16)
            else:
                (tr.track_id,) = struct.unpack_from(">I", raw, body + 4 + 8)
            # width/height: 16.16 fixed, last 8 bytes of the box
            w, h = struct.unpack_from(">II", raw, box_end - 8)
            tr.width, tr.height = w >> 16, h >> 16
        elif btype == b"mdia":
            for t2, b2, e2 in walk_boxes(raw, body, box_end):
                if t2 == b"mdhd":
                    version = raw[b2]
                    if version == 1:
                        tr.timescale, tr.duration = struct.unpack_from(
                            ">IQ", raw, b2 + 4 + 16
                        )
                    else:
                        tr.timescale, tr.duration = struct.unpack_from(
                            ">II", raw, b2 + 4 + 8
                        )
                elif t2 == b"hdlr":
                    tr.handler = raw[b2 + 8 : b2 + 12]
                elif t2 == b"minf":
                    for t3, b3, e3 in walk_boxes(raw, b2, e2):
                        if t3 != b"stbl":
                            continue
                        for t4, b4, e4 in walk_boxes(raw, b3, e3):
                            if t4 == b"stsd":
                                (n,) = struct.unpack_from(">I", raw, b4 + 4)
                                if n >= 1:
                                    tr.codec = raw[b4 + 12 : b4 + 16].decode(
                                        "latin-1"
                                    )
                            elif t4 == b"stts":
                                stts = _read_entries(raw, b4, 2)
                            elif t4 == b"stsz":
                                stsz = _read_stsz(raw, b4)
                            elif t4 == b"stsc":
                                stsc = _read_entries(raw, b4, 3)
                            elif t4 == b"stco":
                                stco = _read_entries(raw, b4, 1)
                            elif t4 == b"co64":
                                stco = _read_entries(raw, b4, 1, wide=True)
                                co64 = True
    if stts is None or stsz is None or stsc is None or stco is None:
        raise ValueError("MP4 track missing stts/stsz/stsc/stco")
    del co64
    tr.sample_sizes = stsz
    tr.sample_offsets = _resolve_offsets(stsz, stsc, [c[0] for c in stco])
    tr.sample_times = _resolve_times(stts, len(stsz))
    return tr


def _read_entries(raw: bytes, body: int, width: int, wide: bool = False):
    (n,) = struct.unpack_from(">I", raw, body + 4)
    fmt = ">" + ("Q" if wide else "I") * width
    step = (8 if wide else 4) * width
    out = []
    off = body + 8
    for _ in range(n):
        out.append(struct.unpack_from(fmt, raw, off))
        off += step
    return out


def _read_stsz(raw: bytes, body: int) -> list[int]:
    uniform, n = struct.unpack_from(">II", raw, body + 4)
    if uniform:
        return [uniform] * n
    return list(struct.unpack_from(f">{n}I", raw, body + 12))


def _resolve_offsets(
    sizes: list[int], stsc: list[tuple], chunk_offsets: list[int]
) -> list[int]:
    """Expand the stsc chunk runs against stco: absolute offset per sample.

    stsc entries are (first_chunk, samples_per_chunk, desc_index) with
    1-based first_chunk; each run applies until the next entry's chunk.
    """
    offsets: list[int] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for i, (first, per_chunk, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            base = chunk_offsets[chunk - 1]
            run = 0
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return offsets
                offsets.append(base + run)
                run += sizes[si]
                si += 1
    return offsets


def _resolve_times(stts: list[tuple], n_samples: int) -> list[int]:
    times, t = [], 0
    for count, delta in stts:
        for _ in range(count):
            if len(times) >= n_samples:
                return times
            times.append(t)
            t += delta
    while len(times) < n_samples:  # tolerate short stts (spec violation)
        times.append(t)
    return times


def extract_samples(
    raw: bytes, track: Mp4Track, indices: list[int] | None = None
) -> list[bytes]:
    """Pull the encoded sample payloads straight out of mdat by byte
    range — the container-level 'frame read' (no codec)."""
    idx = range(track.n_samples) if indices is None else indices
    out = []
    for i in idx:
        try:
            off, size = track.sample_offsets[i], track.sample_sizes[i]
        except IndexError as exc:
            raise ValueError(f"sample index {i} out of range") from exc
        if off + size > len(raw):
            raise ValueError(f"sample {i} byte range escapes the file")
        out.append(raw[off : off + size])
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def build_mp4(
    samples: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"mp4v",
) -> bytes:
    """Minimal valid single-track ISO BMFF file: ftyp + mdat + moov with
    the full stbl chain (stsd/stts/stsz/stsc/stco), one chunk holding
    every sample. Synthesis harness for tests and oracle queries."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    payload = b"".join(samples)
    mdat = _box(b"mdat", payload)
    mdat_body = len(ftyp) + 8  # first sample offset
    n = len(samples)
    duration = n * sample_delta

    stsd_entry = (
        struct.pack(">I", 86)
        + codec
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">H", 24)
        + struct.pack(">h", -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_body))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
