"""WKT ↔ parsed-geometry codec (reference parity:
``core_vector/core_vector_write.py:354`` ``vector_create_from_wkt``,
``bbox/conversion.py`` ``bbox_to_wkt``; format per the OGC Simple
Features spec — public). Shares the payload shapes of ``geom/wkb.py``,
so ``wkt_to_wkb`` / ``wkb_to_wkt`` compose the two codecs.

Supported: POINT / MULTIPOINT / LINESTRING / MULTILINESTRING / POLYGON /
MULTIPOLYGON / GEOMETRYCOLLECTION with XY / XYZ (``Z``) / XYM (``M``) /
XYZM (``ZM``) dimensionality and EMPTY geometries.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

__all__ = ["parse_wkt", "emit_wkt", "wkt_to_wkb", "wkb_to_wkt"]

_KINDS = {
    "POINT": "point", "MULTIPOINT": "multipoint",
    "LINESTRING": "linestring", "MULTILINESTRING": "multilinestring",
    "POLYGON": "polygon", "MULTIPOLYGON": "multipolygon",
    "GEOMETRYCOLLECTION": "geometrycollection",
}
_TAG_RE = re.compile(r"\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*", re.IGNORECASE)


def _ndim(dims: str) -> int:
    return {"xy": 2, "xyz": 3, "xym": 3, "xyzm": 4}[dims]


def _parse_coords(body: str, nd: int) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        vals = [float(v) for v in tok.split()]
        if len(vals) != nd:
            raise ValueError(f"expected {nd} coords, got {tok!r}")
        pts.append(vals)
    return np.asarray(pts, dtype=np.float64)


def _split_groups(body: str) -> List[str]:
    """Split 'a, b', '(x),(y)' style bodies at top-level commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return out


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"expected parenthesized group, got {s[:30]!r}")
    return s[1:-1]


def parse_wkt(wkt: str):
    """WKT string → ``(kind, payload, dims)`` in wkb.py payload shapes."""
    m = _TAG_RE.match(wkt)
    if not m or m.group(1).upper() not in _KINDS:
        raise ValueError(f"unsupported WKT: {wkt[:40]!r}")
    kind = _KINDS[m.group(1).upper()]
    dims = {"Z": "xyz", "M": "xym", "ZM": "xyzm", None: "xy"}[
        m.group(2).upper() if m.group(2) else None]
    rest = wkt[m.end():].strip()
    nd = _ndim(dims)

    if rest.upper() == "EMPTY":
        if kind == "point":
            raise ValueError("POINT EMPTY has no coordinate representation")
        empty = {"multipoint": np.zeros((0, nd)), "linestring": np.zeros((0, nd)),
                 "multilinestring": [], "polygon": [], "multipolygon": [],
                 "geometrycollection": []}[kind]
        return kind, empty, dims

    body = _strip_parens(rest)
    if kind == "point":
        return kind, tuple(_parse_coords(body, nd)[0]), dims
    if kind == "linestring":
        return kind, _parse_coords(body, nd), dims
    if kind == "multipoint":
        # Both 'MULTIPOINT (1 2, 3 4)' and 'MULTIPOINT ((1 2), (3 4))'.
        groups = _split_groups(body)
        rows = [_parse_coords(_strip_parens(g) if g.strip().startswith("(")
                              else g, nd)[0] for g in groups]
        return kind, np.asarray(rows, dtype=np.float64), dims
    if kind == "multilinestring":
        return kind, [_parse_coords(_strip_parens(g), nd)
                      for g in _split_groups(body)], dims
    if kind == "polygon":
        return kind, [_parse_coords(_strip_parens(g), nd)
                      for g in _split_groups(body)], dims
    if kind == "multipolygon":
        polys = []
        for g in _split_groups(body):
            rings_body = _strip_parens(g)
            polys.append([_parse_coords(_strip_parens(r), nd)
                          for r in _split_groups(rings_body)])
        return kind, polys, dims
    # geometrycollection: members parsed recursively.
    members = []
    for g in _split_groups(body):
        k2, p2, d2 = parse_wkt(g.strip())
        members.append((k2, p2, d2))
    return kind, members, dims


def _fmt(v: float) -> str:
    return repr(float(v))


def _coords_str(pts: np.ndarray) -> str:
    return ", ".join(" ".join(_fmt(v) for v in row) for row in np.atleast_2d(pts))


def emit_wkt(kind: str, payload, dims: str = "xy") -> str:
    """Parsed geometry → WKT string (repr-precision floats: round-trip
    exact through float64)."""
    tag = {v: k for k, v in _KINDS.items()}[kind]
    mod = {"xy": "", "xyz": " Z", "xym": " M", "xyzm": " ZM"}[dims]
    head = f"{tag}{mod} "
    if kind == "point":
        return head + "(" + " ".join(_fmt(v) for v in payload) + ")"
    if kind == "linestring":
        if len(payload) == 0:
            return head + "EMPTY"
        return head + "(" + _coords_str(payload) + ")"
    if kind == "multipoint":
        if len(payload) == 0:
            return head + "EMPTY"
        return head + "(" + ", ".join(
            "(" + " ".join(_fmt(v) for v in row) + ")" for row in payload) + ")"
    if kind == "multilinestring":
        if not payload:
            return head + "EMPTY"
        return head + "(" + ", ".join(
            "(" + _coords_str(line) + ")" for line in payload) + ")"
    if kind == "polygon":
        if not payload:
            return head + "EMPTY"
        return head + "(" + ", ".join(
            "(" + _coords_str(ring) + ")" for ring in payload) + ")"
    if kind == "multipolygon":
        if not payload:
            return head + "EMPTY"
        return head + "(" + ", ".join(
            "(" + ", ".join("(" + _coords_str(r) + ")" for r in rings) + ")"
            for rings in payload) + ")"
    if kind == "geometrycollection":
        if not payload:
            return head + "EMPTY"
        return head + "(" + ", ".join(
            emit_wkt(k2, p2, d2) for k2, p2, d2 in payload) + ")"
    raise ValueError(f"cannot emit kind {kind!r}")


def wkt_to_wkb(wkt: str) -> bytes:
    from buteo_ray.geom.wkb import encode_geom

    kind, payload, dims = parse_wkt(wkt)
    # encode_geom handles every kind incl. collections (whose members
    # are (kind, payload, dims) triples — the same shape parse_wkt emits).
    return encode_geom(kind, payload, dims)


def wkb_to_wkt(wkb: bytes) -> str:
    from buteo_ray.geom.wkb import parse_wkb_dims

    kind, payload, dims = parse_wkb_dims(wkb)
    return emit_wkt(kind, payload, dims)
