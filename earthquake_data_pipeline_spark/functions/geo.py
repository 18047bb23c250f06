"""Minimal planar geometry: WKT polygon parsing + vectorized point-in-polygon.

The reference delegates point-in-polygon to geopandas/shapely/rtree
(pipeline/add_region.py:20-28). Those libs aren't available here, and the
semantics needed are small: POLYGON/MULTIPOLYGON outer rings + holes,
even-odd ray casting. Implemented with numpy, vectorized over POINTS per
edge — O(edges × points) per polygon with a bounding-box prefilter, which
is the same asymptotic shape an STRtree query gives for a few hundred
country polygons.

Boundary semantics: even-odd ray casting — points exactly on an edge are
undefined (as in shapely's ``within``); callers should not rely on them.
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"
_RING_RE = re.compile(r"\(\s*((?:%s\s+%s\s*,?\s*)+)\)" % (_NUM, _NUM))


def parse_wkt_polygon(wkt: str) -> list[list[np.ndarray]]:
    """Parse POLYGON / MULTIPOLYGON WKT → list of polygons, each a list of
    rings (first = exterior, rest = holes), each ring an (N, 2) float array.

    A hand-rolled parser is acceptable here because the engine only carries
    geometry as WKT text between the driver-side dim load and this operator
    (SURVEY.md §2.1 S8) — no other WKT forms occur.
    """
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper()
    if head not in ("POLYGON", "MULTIPOLYGON"):
        raise ValueError(f"unsupported WKT type: {head!r}")

    body = s[s.index("(") :]
    if head == "POLYGON":
        poly_bodies = [body]
    else:
        # split MULTIPOLYGON body into per-polygon groups by paren depth
        inner = body.strip()[1:-1]
        poly_bodies = []
        depth, start = 0, None
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    poly_bodies.append(inner[start : i + 1])
    polys = []
    for pb in poly_bodies:
        rings = []
        for m in _RING_RE.finditer(pb):
            nums = np.array(
                m.group(1).replace(",", " ").split(), dtype=np.float64
            )
            rings.append(nums.reshape(-1, 2))
        if rings:
            polys.append(rings)
    return polys


def ring_bbox(polys: list[list[np.ndarray]]) -> tuple[float, float, float, float]:
    pts = np.concatenate([r for rings in polys for r in rings[:1]])
    return float(pts[:, 0].min()), float(pts[:, 1].min()), float(pts[:, 0].max()), float(pts[:, 1].max())


def _points_in_ring(x: np.ndarray, y: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast (horizontal ray to +inf), vectorized over points."""
    inside = np.zeros(x.shape[0], dtype=bool)
    xs, ys = ring[:, 0], ring[:, 1]
    n = len(ring)
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[(i + 1) % n], ys[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge never crosses a horizontal ray
        crosses = (yi > y) != (yj > y)
        if not crosses.any():
            continue
        x_at = (xj - xi) * (y - yi) / (yj - yi) + xi
        inside ^= crosses & (x < x_at)
    return inside


def points_in_polygon(
    x: np.ndarray, y: np.ndarray, polys: list[list[np.ndarray]]
) -> np.ndarray:
    """True where (x, y) falls inside any polygon (holes subtract, even-odd)."""
    result = np.zeros(x.shape[0], dtype=bool)
    for rings in polys:
        acc = np.zeros(x.shape[0], dtype=bool)
        for ring in rings:  # exterior XOR holes = even-odd
            acc ^= _points_in_ring(x, y, ring)
        result |= acc
    return result
