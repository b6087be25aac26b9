"""Minimal ISO WKB codec (little-endian; Point / LineString / Polygon /
MultiPolygon, 2-D). Geometry columns in the engine are WKB ``binary``
Arrow columns plus ``bbox_xmin/xmax/ymin/ymax`` float64 columns for cheap
vectorized pruning (SURVEY.md §1.3). Format per the OGC Simple Features
spec (public). Capability parity with the reference's OGR-geometry data
model (``/root/reference/buteo/core_vector/core_vector_read.py:29-117``)
without any GDAL dependency.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

# A parsed polygon is a list of rings; each ring is an (N, 2) float64 array
# (closed: first == last vertex). A parsed multipolygon is a list of polygons.
Ring = np.ndarray
Polygon = List[Ring]


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, float(x), float(y))


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.ascontiguousarray(np.asarray(ring, dtype="<f8"))
    if ring.ndim != 2 or ring.shape[1] != 2 or ring.shape[0] < 4:
        raise ValueError("ring must be (N>=4, 2) and closed")
    if not (ring[0] == ring[-1]).all():
        raise ValueError("ring must be closed (first == last vertex)")
    return struct.pack("<I", ring.shape[0]) + ring.tobytes()


def wkb_polygon(rings: Polygon) -> bytes:
    """Encode a polygon (first ring = exterior, rest = holes)."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    out.extend(_ring_bytes(r) for r in rings)
    return b"".join(out)


def wkb_multipolygon(polygons: List[Polygon]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polygons))]
    out.extend(wkb_polygon(p) for p in polygons)
    return b"".join(out)


def _parse_ring(buf: memoryview, off: int) -> Tuple[Ring, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    ring = np.frombuffer(buf, dtype="<f8", count=n * 2, offset=off).reshape(n, 2)
    return ring, off + n * 16


def _parse_geom(buf: memoryview, off: int):
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", buf, off + 1)
    off += 5
    if gtype & 0xFFFFFF00:
        # EWKB SRID/Z/M flags change the payload layout (extra SRID word,
        # extra coordinates); masking them off would misread coordinate
        # bytes silently — reject instead.
        raise ValueError(f"EWKB/Z/M geometry type {gtype:#x} not supported (2-D ISO WKB only)")
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return ("point", (x, y)), off + 16
    if gtype == WKB_LINESTRING:
        ring, off = _parse_ring(buf, off)
        return ("linestring", ring), off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _parse_ring(buf, off)
            rings.append(ring)
        return ("polygon", rings), off
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            (kind, rings), off = _parse_geom(buf, off)
            if kind != "polygon":
                raise ValueError("multipolygon member is not a polygon")
            polys.append(rings)
        return ("multipolygon", polys), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def parse_wkb(wkb: bytes):
    """Decode WKB → ``(kind, payload)`` where payload is (x, y) for points,
    an (N,2) array for linestrings, a list of rings for polygons, or a list
    of polygons for multipolygons."""
    geom, _ = _parse_geom(memoryview(wkb), 0)
    return geom


def geom_bbox(wkb: bytes) -> List[float]:
    """OGR bbox [x_min, x_max, y_min, y_max] of any supported WKB geometry."""
    kind, payload = parse_wkb(wkb)
    if kind == "point":
        x, y = payload
        return [x, x, y, y]
    if kind == "linestring":
        pts = payload
    elif kind == "polygon":
        pts = payload[0]
    else:  # multipolygon — hull over exterior rings
        pts = np.vstack([rings[0] for rings in payload])
    return [float(pts[:, 0].min()), float(pts[:, 0].max()),
            float(pts[:, 1].min()), float(pts[:, 1].max())]
