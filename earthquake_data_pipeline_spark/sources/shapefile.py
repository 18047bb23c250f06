"""S8 — ESRI shapefile ingest: .shp/.dbf → (country, region, wkt) dim rows.

The reference loads Natural Earth world boundaries with geopandas
(pipeline/add_region.py:23) and hands polygons to the spatial join. This
container has no geopandas/fiona/pyshp, and the needed subset of the
public ESRI shapefile spec (ESRI Shapefile Technical Description, 1998)
is tiny: the Polygon record layout plus dBASE III attribute records. A
~150-line pure-Python reader closes the gap without a native dependency.

Driver-side by design: boundary dims are KB–MB scale (258 records in the
reference); the output feeds ``operators.enrichment.spatial_join`` which
broadcasts the parsed rings once per executor. This is a dim LOADER, not
a distributed source — parity with the reference, which also loads the
shapefile on one node before the join.

Geometry semantics: the downstream consumer (functions/geo.py) applies
even-odd ray casting XOR'd across all rings, so hole-assignment does not
change membership. Rings are still grouped by winding order (shapefile
spec: clockwise = outer, counter-clockwise = hole) so the emitted WKT is
also correct for external consumers.
"""

from __future__ import annotations

import struct
from pathlib import Path

_POLYGON_TYPES = {5, 15, 25}  # Polygon, PolygonZ, PolygonM — XY prefix is shared
_NULL_SHAPE = 0


def _signed_area(ring: list[tuple[float, float]]) -> float:
    """Shoelace area: negative = clockwise (shapefile outer ring)."""
    acc = 0.0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        acc += x0 * y1 - x1 * y0
    return acc / 2.0


def _ring_wkt(ring: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + ")"


def _point_in_ring(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Even-odd ray cast for one point (hole→outer assignment only)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        if (y0 > y) != (y1 > y):
            if x < (x1 - x0) * (y - y0) / (y1 - y0) + x0:
                inside = not inside
    return inside


def _rings_to_wkt(rings: list[list[tuple[float, float]]]) -> str | None:
    """Group rings into polygons by winding order and emit WKT.

    Clockwise rings each open a polygon; counter-clockwise rings are
    holes assigned to the outer ring that CONTAINS them (point-in-ring
    test on a hole vertex) — the spec mandates winding but not that a
    hole follow its outer in storage order, so adjacency alone would
    attach holes to the wrong polygon. With NESTED outers
    (island-in-lake-in-island) several outers contain the hole vertex —
    the hole belongs to the smallest-area (innermost) one; taking any
    other would emit wrong WKT for external consumers even though the
    even-odd XOR downstream is unaffected. A counter-clockwise ring
    contained by no outer — nonconforming but seen in the wild — opens
    its own polygon so no geometry is dropped.
    """
    if not rings:
        return None
    valid = [r for r in rings if len(r) >= 4]  # WKT rings are closed, >= 4 pts
    groups: list[list[list[tuple[float, float]]]] = [
        [r] for r in valid if _signed_area(r) < 0
    ]
    for ring in valid:
        if _signed_area(ring) < 0:
            continue
        x, y = ring[0]
        holders = [g for g in groups if _point_in_ring(x, y, g[0])]
        if holders:
            min(holders, key=lambda g: abs(_signed_area(g[0]))).append(ring)
        else:
            groups.append([ring])
    if not groups:
        return None
    if len(groups) == 1:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in groups[0]) + ")"
    bodies = [
        "(" + ", ".join(_ring_wkt(r) for r in rings) + ")" for rings in groups
    ]
    return "MULTIPOLYGON (" + ", ".join(bodies) + ")"


def read_shp_polygons(shp_path: str | Path) -> list[str | None]:
    """Read a .shp file of Polygon records → one WKT (or None) per record.

    Layout per the public spec: 100-byte header (big-endian file code
    9994, little-endian shape type at offset 32), then records of a
    big-endian (record number, content words) header followed by
    little-endian content. Polygon content: shape type, bbox (4 doubles),
    num_parts, num_points, part offsets, XY points. Z/M payloads trail
    the XY block and are ignored.
    """
    data = Path(shp_path).read_bytes()
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError(f"not a shapefile: {shp_path}")
    file_words = struct.unpack(">i", data[24:28])[0]
    end = min(len(data), file_words * 2)
    out: list[str | None] = []
    pos = 100
    while pos + 8 <= end:
        (content_words,) = struct.unpack(">i", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + content_words * 2]
        pos += 8 + content_words * 2
        (shape_type,) = struct.unpack("<i", body[:4])
        if shape_type == _NULL_SHAPE:
            out.append(None)
            continue
        if shape_type not in _POLYGON_TYPES:
            raise ValueError(f"unsupported shape type {shape_type} in {shp_path}")
        num_parts, num_points = struct.unpack("<ii", body[36:44])
        parts = list(struct.unpack(f"<{num_parts}i", body[44 : 44 + 4 * num_parts]))
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack(
            f"<{2 * num_points}d", body[pts_off : pts_off + 16 * num_points]
        )
        pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
        bounds = parts + [num_points]
        rings = [pts[bounds[i] : bounds[i + 1]] for i in range(num_parts)]
        out.append(_rings_to_wkt(rings))
    return out


def read_dbf(dbf_path: str | Path, encoding: str = "latin-1") -> list[dict | None]:
    """Read dBASE III attribute records → list of {field: value} dicts.

    Field types: C (text, stripped), N/F (int/float or None when blank),
    L (bool or None), anything else passed through as stripped text.
    Soft-deleted records (flag ``*``) emit a ``None`` PLACEHOLDER rather
    than being dropped: .shp files keep every shape record, so skipping
    here would desync the positional shp/dbf pairing for every record
    after the first deletion. Callers filter the (None, wkt) pairs out.
    """
    data = Path(dbf_path).read_bytes()
    n_records, header_size, record_size = struct.unpack("<IHH", data[4:12])
    fields: list[tuple[str, str, int]] = []
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        desc = data[pos : pos + 32]
        name = desc[:11].split(b"\x00", 1)[0].decode(encoding)
        ftype = chr(desc[11])
        length = desc[16]
        fields.append((name, ftype, length))
        pos += 32
    out: list[dict] = []
    for i in range(n_records):
        rec = data[header_size + i * record_size :][:record_size]
        if len(rec) < record_size:
            continue  # truncated tail — surfaces as a count mismatch upstream
        if rec[0:1] == b"*":
            out.append(None)  # soft-deleted: hold the position, drop later
            continue
        row: dict = {}
        off = 1
        for name, ftype, length in fields:
            raw = rec[off : off + length].decode(encoding, "replace").strip()
            off += length
            if ftype in ("N", "F"):
                if not raw:
                    row[name] = None
                elif ftype == "N" and "." not in raw:
                    row[name] = int(raw)
                else:
                    row[name] = float(raw)
            elif ftype == "L":
                # tuple membership, NOT `raw in "YyTt"`: the empty
                # string is a substring of every string, so a BLANK
                # (uninitialized) logical field would parse as True
                row[name] = (
                    True
                    if raw in ("Y", "y", "T", "t")
                    else False
                    if raw in ("N", "n", "F", "f")
                    else None
                )
            else:
                row[name] = raw
        out.append(row)
    return out


def load_polygon_dim(
    shp_path: str | Path,
    country_field: str,
    region_field: str | None = None,
) -> list[tuple[str, str | None, str | None]]:
    """Load a boundary shapefile into spatial_join's dim shape:
    (country, region, wkt) tuples — the reference's
    ``gpd.read_file(...)[["SOVEREIGNT", "REGION_UN", "geometry"]]``
    equivalent (add_region.py:23-27) without geopandas.
    """
    shp_path = Path(shp_path)
    wkts = read_shp_polygons(shp_path)
    attrs = read_dbf(shp_path.with_suffix(".dbf"))
    if len(wkts) != len(attrs):
        raise ValueError(
            f"shp/dbf record mismatch: {len(wkts)} shapes, {len(attrs)} rows"
        )
    return [
        (
            str(row[country_field]),
            None if region_field is None else row.get(region_field),
            wkt,
        )
        for row, wkt in zip(attrs, wkts)
        if row is not None  # soft-deleted dbf record: drop the pair
    ]
