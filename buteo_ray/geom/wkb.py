"""Minimal ISO WKB codec (little-endian; Point / MultiPoint / LineString /
MultiLineString / Polygon / MultiPolygon / GeometryCollection; XY, XYZ,
XYM, XYZM). Geometry columns in the engine are WKB ``binary`` Arrow
columns plus ``bbox_xmin/xmax/ymin/ymax`` float64 columns for cheap
vectorized pruning (SURVEY.md §1.3). Format per the OGC Simple Features
spec (public). Capability parity with the reference's OGR-geometry data
model (``/root/reference/buteo/core_vector/core_vector_read.py:29-117``,
``utils/utils_translate.py:784-1050`` geometry-type tables) without any
GDAL dependency.

Parsed payload shapes (coordinates always float64, ``ndim`` columns):

- point          → tuple of ndim floats
- multipoint     → (N, ndim) array
- linestring     → (N, ndim) array
- multilinestring→ list of (N, ndim) arrays
- polygon        → list of rings, each (N, ndim), closed
- multipolygon   → list of polygons
- geometrycollection → list of (kind, payload, dims) triples — members
  keep their OWN dimensionality (ISO allows mixing inside a collection)
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

# ISO WKB dimensionality offsets: Z=+1000, M=+2000, ZM=+3000.
_DIM_OFFSET = {"xy": 0, "xyz": 1000, "xym": 2000, "xyzm": 3000}
_NDIM = {"xy": 2, "xyz": 3, "xym": 3, "xyzm": 4}
_DIMS_BY_FLAG = {0: "xy", 1: "xyz", 2: "xym", 3: "xyzm"}

# A parsed polygon is a list of rings; each ring is an (N, ndim) float64
# array (closed: first == last vertex). A parsed multipolygon is a list of
# polygons.
Ring = np.ndarray
Polygon = List[Ring]


def _gtype(base: int, dims: str) -> int:
    return base + _DIM_OFFSET[dims]


def wkb_point(x: float, y: float, *extra: float, dims: str = None) -> bytes:
    """Encode a point; pass z (and m) as extra positional coords, or give
    ``dims='xym'`` to mark a single extra coordinate as M instead of Z."""
    coords = (float(x), float(y)) + tuple(float(e) for e in extra)
    if dims is None:
        dims = {2: "xy", 3: "xyz", 4: "xyzm"}[len(coords)]
    if len(coords) != _NDIM[dims]:
        raise ValueError(f"{len(coords)} coords for dims={dims}")
    return struct.pack("<BI", 1, _gtype(WKB_POINT, dims)) + struct.pack(
        f"<{len(coords)}d", *coords)


def _pointseq_bytes(pts: np.ndarray, ndim: int, min_pts: int) -> bytes:
    pts = np.ascontiguousarray(np.asarray(pts, dtype="<f8"))
    if pts.size == 0:
        # ISO allows empty sequences ('LINESTRING EMPTY' parses as n=0);
        # the parser accepts them, so parse→encode must round-trip.
        return struct.pack("<I", 0)
    if pts.ndim != 2 or pts.shape[1] != ndim or pts.shape[0] < min_pts:
        raise ValueError(f"point sequence must be (N>={min_pts}, {ndim})")
    return struct.pack("<I", pts.shape[0]) + pts.tobytes()


def _ring_bytes(ring: np.ndarray, ndim: int = 2) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    if ring.ndim != 2 or ring.shape[1] != ndim or ring.shape[0] < 4:
        raise ValueError(f"ring must be (N>=4, {ndim}) and closed")
    if not (ring[0] == ring[-1]).all():
        raise ValueError("ring must be closed (first == last vertex)")
    return _pointseq_bytes(ring, ndim, 4)


def wkb_linestring(pts: np.ndarray, dims: str = "xy") -> bytes:
    return struct.pack("<BI", 1, _gtype(WKB_LINESTRING, dims)) + _pointseq_bytes(
        pts, _NDIM[dims], 2)


def wkb_multipoint(pts: np.ndarray, dims: str = "xy") -> bytes:
    """Encode a multipoint from an (N, ndim) array (members are full WKB
    point geometries per the spec)."""
    pts = np.asarray(pts, dtype="<f8")
    out = [struct.pack("<BII", 1, _gtype(WKB_MULTIPOINT, dims), pts.shape[0])]
    out.extend(wkb_point(*p, dims=dims) for p in pts)
    return b"".join(out)


def wkb_multilinestring(lines: List[np.ndarray], dims: str = "xy") -> bytes:
    out = [struct.pack("<BII", 1, _gtype(WKB_MULTILINESTRING, dims), len(lines))]
    out.extend(wkb_linestring(l, dims=dims) for l in lines)
    return b"".join(out)


def wkb_polygon(rings: Polygon, dims: str = "xy") -> bytes:
    """Encode a polygon (first ring = exterior, rest = holes)."""
    out = [struct.pack("<BII", 1, _gtype(WKB_POLYGON, dims), len(rings))]
    out.extend(_ring_bytes(r, _NDIM[dims]) for r in rings)
    return b"".join(out)


def wkb_multipolygon(polygons: List[Polygon], dims: str = "xy") -> bytes:
    out = [struct.pack("<BII", 1, _gtype(WKB_MULTIPOLYGON, dims), len(polygons))]
    out.extend(wkb_polygon(p, dims=dims) for p in polygons)
    return b"".join(out)


def wkb_geometrycollection(members: List[bytes], dims: str = "xy") -> bytes:
    """Encode a collection from already-encoded member WKBs."""
    out = [struct.pack("<BII", 1, _gtype(WKB_GEOMETRYCOLLECTION, dims), len(members))]
    out.extend(members)
    return b"".join(out)


_KIND_NAMES = {
    WKB_POINT: "point",
    WKB_LINESTRING: "linestring",
    WKB_POLYGON: "polygon",
    WKB_MULTIPOINT: "multipoint",
    WKB_MULTILINESTRING: "multilinestring",
    WKB_MULTIPOLYGON: "multipolygon",
    WKB_GEOMETRYCOLLECTION: "geometrycollection",
}

_ENCODERS = {
    "linestring": wkb_linestring,
    "multipoint": wkb_multipoint,
    "multilinestring": wkb_multilinestring,
    "polygon": wkb_polygon,
    "multipolygon": wkb_multipolygon,
}


def encode_geom(kind: str, payload, dims: str = "xy") -> bytes:
    """Re-encode a parsed ``(kind, payload)`` back to WKB. Collection
    members carry their own dims (3-tuples from the parser; legacy
    2-tuples inherit the collection's dims)."""
    if kind == "point":
        return wkb_point(*payload, dims=dims)
    if kind == "geometrycollection":
        return wkb_geometrycollection(
            [encode_geom(m[0], m[1], m[2] if len(m) > 2 else dims)
             for m in payload], dims)
    return _ENCODERS[kind](payload, dims=dims)


def _parse_pointseq(buf: memoryview, off: int, ndim: int) -> Tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=n * ndim, offset=off).reshape(n, ndim)
    return pts, off + n * 8 * ndim


def _parse_geom(buf: memoryview, off: int):
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", buf, off + 1)
    off += 5
    if gtype & 0xE0000000:
        # EWKB Z/M/SRID flag bits change the payload layout (extra SRID
        # word); masking them off would misread coordinate bytes silently
        # — reject instead. ISO +1000/+2000/+3000 dims ARE supported.
        raise ValueError(f"EWKB geometry type {gtype:#x} not supported (ISO WKB only)")
    flag, base = divmod(gtype, 1000)
    if flag not in _DIMS_BY_FLAG or base not in _KIND_NAMES:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    dims = _DIMS_BY_FLAG[flag]
    ndim = _NDIM[dims]
    kind = _KIND_NAMES[base]

    if kind == "point":
        coords = struct.unpack_from(f"<{ndim}d", buf, off)
        return (kind, tuple(coords), dims), off + 8 * ndim
    if kind == "linestring":
        pts, off = _parse_pointseq(buf, off, ndim)
        return (kind, pts, dims), off
    if kind == "polygon":
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _parse_pointseq(buf, off, ndim)
            rings.append(ring)
        return (kind, rings, dims), off

    # Multi-geometries: members are full WKB geometries.
    (nmembers,) = struct.unpack_from("<I", buf, off)
    off += 4
    members = []
    for _ in range(nmembers):
        (mkind, mpayload, mdims), off = _parse_geom(buf, off)
        members.append((mkind, mpayload, mdims))
    if kind in ("multipoint", "multilinestring", "multipolygon"):
        # Homogeneous multis store coordinate arrays of one width — a
        # member whose dims differ from the parent tag would be silently
        # mis-shaped, so reject it loudly.
        bad = [d for _, _, d in members if d != dims]
        if bad:
            raise ValueError(
                f"{kind} member dims {bad[0]} != collection dims {dims}")
    if kind == "multipoint":
        if any(k != "point" for k, _, _ in members):
            raise ValueError("multipoint member is not a point")
        pts = (np.array([p for _, p, _ in members], dtype=np.float64)
               if members else np.zeros((0, ndim)))
        return (kind, pts, dims), off
    if kind == "multilinestring":
        if any(k != "linestring" for k, _, _ in members):
            raise ValueError("multilinestring member is not a linestring")
        return (kind, [p for _, p, _ in members], dims), off
    if kind == "multipolygon":
        if any(k != "polygon" for k, _, _ in members):
            raise ValueError("multipolygon member is not a polygon")
        return (kind, [p for _, p, _ in members], dims), off
    # geometrycollection: members keep their OWN dims — ISO allows a
    # collection to mix dimensionality, so payload entries are
    # (kind, payload, dims) triples.
    return (kind, members, dims), off


def parse_wkb(wkb: bytes):
    """Decode WKB → ``(kind, payload)`` (see module docstring for payload
    shapes; extra Z/M coordinate columns ride along in the arrays)."""
    (kind, payload, _dims), _ = _parse_geom(memoryview(wkb), 0)
    return kind, payload


def parse_wkb_dims(wkb: bytes):
    """Decode WKB → ``(kind, payload, dims)`` with dims ∈ {'xy', 'xyz',
    'xym', 'xyzm'}."""
    (kind, payload, dims), _ = _parse_geom(memoryview(wkb), 0)
    return kind, payload, dims


def geom_vertices(kind: str, payload) -> np.ndarray:
    """All vertices of a parsed geometry as one (N, ndim) array."""
    if kind == "point":
        return np.array([payload], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        pts = np.asarray(payload, dtype=np.float64)
        return pts if pts.size else np.zeros((0, 2))
    if kind == "multilinestring":
        return np.vstack(payload) if payload else np.zeros((0, 2))
    if kind == "polygon":
        # nrings=0 is valid ISO ('POLYGON EMPTY') — vstack([]) would raise.
        return np.vstack(payload) if payload else np.zeros((0, 2))
    if kind == "multipolygon":
        flat = [r for rings in payload for r in rings]
        return np.vstack(flat) if flat else np.zeros((0, 2))
    if kind == "geometrycollection":
        # Members may mix dimensionality — vertices are reported XY-only.
        parts = [geom_vertices(m[0], m[1])[:, :2] for m in payload]
        return np.vstack(parts) if parts else np.zeros((0, 2))
    raise ValueError(f"unknown kind {kind}")


def map_coords(kind: str, payload, fn):
    """Apply ``fn((N, ndim) array) -> (N, ndim') array`` to every
    coordinate sequence; returns the transformed payload."""
    if kind == "point":
        return tuple(fn(np.array([payload], dtype=np.float64))[0])
    if kind in ("linestring", "multipoint"):
        return fn(np.asarray(payload, dtype=np.float64))
    if kind == "multilinestring":
        return [fn(np.asarray(l, dtype=np.float64)) for l in payload]
    if kind == "polygon":
        return [fn(np.asarray(r, dtype=np.float64)) for r in payload]
    if kind == "multipolygon":
        return [[fn(np.asarray(r, dtype=np.float64)) for r in rings]
                for rings in payload]
    if kind == "geometrycollection":
        return [(m[0], map_coords(m[0], m[1], fn)) + tuple(m[2:])
                for m in payload]
    raise ValueError(f"unknown kind {kind}")


def combine_dims(dims_list) -> str:
    """Widest dims covering every input ('xy'+'xyz' → 'xyz',
    'xym'+'xyz' → 'xyzm', …)."""
    has_z = any(d in ("xyz", "xyzm") for d in dims_list)
    has_m = any(d in ("xym", "xyzm") for d in dims_list)
    return {(False, False): "xy", (True, False): "xyz",
            (False, True): "xym", (True, True): "xyzm"}[(has_z, has_m)]


def reshape_coords(pts: np.ndarray, src: str, target: str,
                   z_value: float = 0.0, m_value: float = 0.0) -> np.ndarray:
    """Convert an (N, ndim(src)) coordinate array to ``target`` dims,
    filling added Z/M with the given defaults."""
    pts = np.asarray(pts, dtype=np.float64)
    x, y = pts[:, 0], pts[:, 1]
    z = pts[:, 2] if src in ("xyz", "xyzm") else np.full(len(pts), z_value)
    if src == "xym":
        m = pts[:, 2]
    elif src == "xyzm":
        m = pts[:, 3]
    else:
        m = np.full(len(pts), m_value)
    cols = {"xy": [x, y], "xyz": [x, y, z], "xym": [x, y, m],
            "xyzm": [x, y, z, m]}[target]
    return np.column_stack(cols)


def geom_bbox(wkb: bytes) -> List[float]:
    """OGR bbox [x_min, x_max, y_min, y_max] of any supported WKB geometry."""
    kind, payload = parse_wkb(wkb)
    pts = geom_vertices(kind, payload)
    if pts.shape[0] == 0:
        return [np.nan, np.nan, np.nan, np.nan]
    return [float(pts[:, 0].min()), float(pts[:, 0].max()),
            float(pts[:, 1].min()), float(pts[:, 1].max())]
