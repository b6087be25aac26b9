"""GeoJSON geometry dict ↔ WKB (reference parity:
``core_vector/core_vector_write.py`` ``vector_create_from_geojson``,
``bbox/conversion.py`` ``bbox_to_geojson``; RFC 7946 — public spec).

GeoJSON has no M dimension: XY and XYZ only (positions with >3 values
are rejected, per the RFC's "SHOULD NOT" made strict here so data is
never silently truncated).
"""

from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["geojson_to_wkb", "wkb_to_geojson"]


def _dims_of(pos) -> str:
    n = len(pos)
    if n == 2:
        return "xy"
    if n == 3:
        return "xyz"
    raise ValueError(f"GeoJSON position must have 2 or 3 values, got {n}")


def _arr(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] not in (2, 3):
        raise ValueError("GeoJSON coordinate array must be (N, 2|3)")
    return a


def geojson_to_wkb(geom: dict) -> bytes:
    """GeoJSON geometry object → WKB bytes."""
    from buteo_ray.geom import wkb as W

    t = geom.get("type")
    c = geom.get("coordinates")
    if t == "Point":
        return W.wkb_point(*c, dims=_dims_of(c))
    if t == "MultiPoint":
        a = _arr(c)
        return W.wkb_multipoint(a, dims="xy" if a.shape[1] == 2 else "xyz")
    if t == "LineString":
        a = _arr(c)
        return W.wkb_linestring(a, dims="xy" if a.shape[1] == 2 else "xyz")
    if t == "MultiLineString":
        lines = [_arr(l) for l in c]
        d = "xyz" if any(l.shape[1] == 3 for l in lines) else "xy"
        return W.wkb_multilinestring(lines, dims=d)
    if t == "Polygon":
        rings = [_arr(r) for r in c]
        d = "xyz" if any(r.shape[1] == 3 for r in rings) else "xy"
        return W.wkb_polygon(rings, dims=d)
    if t == "MultiPolygon":
        polys = [[_arr(r) for r in rings] for rings in c]
        d = "xyz" if any(r.shape[1] == 3 for rings in polys for r in rings) else "xy"
        return W.wkb_multipolygon(polys, dims=d)
    if t == "GeometryCollection":
        return W.wkb_geometrycollection(
            [geojson_to_wkb(g) for g in geom.get("geometries", [])])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _lol(a) -> List:
    return np.asarray(a, dtype=np.float64).tolist()


def wkb_to_geojson(wkb: bytes) -> dict:
    """WKB bytes → GeoJSON geometry dict (XYM/XYZM rejected: GeoJSON
    cannot represent M)."""
    from buteo_ray.geom.wkb import parse_wkb_dims

    return _parsed_to_geojson(*parse_wkb_dims(wkb))


def _parsed_to_geojson(kind: str, payload, dims: str) -> dict:
    if dims in ("xym", "xyzm"):
        raise ValueError("GeoJSON cannot represent M coordinates")
    if kind == "point":
        return {"type": "Point", "coordinates": [float(v) for v in payload]}
    if kind == "multipoint":
        return {"type": "MultiPoint", "coordinates": _lol(payload)}
    if kind == "linestring":
        return {"type": "LineString", "coordinates": _lol(payload)}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [_lol(l) for l in payload]}
    if kind == "polygon":
        return {"type": "Polygon", "coordinates": [_lol(r) for r in payload]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[_lol(r) for r in rings] for rings in payload]}
    if kind == "geometrycollection":
        # Members are already (kind, payload, dims) triples — recurse
        # directly, no codec round-trips.
        return {"type": "GeometryCollection",
                "geometries": [_parsed_to_geojson(k2, p2, d2)
                               for k2, p2, d2 in payload]}
    raise ValueError(f"cannot convert kind {kind!r}")
