"""Hierarchical discrete global grid ("quadcell") — the engine's H3/S2 analog.

The sandbox has no ``h3``/``s2`` wheels, so the cell system is built from
scratch on public, well-known constructions: a plate-carrée quadtree grid
(the familiar XYZ/quadkey tiling generalized to lat/lon) plus Z-order
(Morton) curve ids for locality-preserving 1-D keys. It provides the same
operations the north-star needs from H3/S2: lat/lon→cell at resolutions
0..28, parent/child traversal, k-ring neighbourhoods, and cell bounds.

Layout at resolution ``r``: the world ``lon ∈ [-180, 180), lat ∈ [-90, 90)``
is a ``2^r × 2^r`` grid; ``cell_x`` grows eastward, ``cell_y`` northward.
All math is exact float64 → floor arithmetic so any engine (numpy, DuckDB
SQL oracle, a future C kernel) computes identical cells from identical
doubles.

Packed id layout (uint64): ``res << 58 | y << 29 | x`` (r ≤ 28).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# OGR-ordered [x_min, x_max, y_min, y_max]
GLOBAL_BBOX = [-180.0, 180.0, -90.0, 90.0]

_MAX_RES = 28
_X_BITS = 29
_RES_SHIFT = 58


def cell_xy(lat, lon, res: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized lat/lon → (cell_x, cell_y) at resolution ``res``.

    ``cell = floor((coord - min) / span * 2^res)`` clamped into range so the
    poles/antimeridian land in the last cell. Exactly reproducible in SQL:
    ``LEAST(FLOOR((lon+180)/360*2^r), 2^r-1)``.
    """
    if not 0 <= res <= _MAX_RES:
        raise ValueError(f"res must be in [0, {_MAX_RES}]")
    n = np.int64(1) << res
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    x = np.clip(x, 0, n - 1)
    y = np.clip(y, 0, n - 1)
    return x, y


def cell_id(lat, lon, res: int) -> np.ndarray:
    """Vectorized lat/lon → packed uint64 cell id at resolution ``res``."""
    x, y = cell_xy(lat, lon, res)
    return (
        (np.uint64(res) << np.uint64(_RES_SHIFT))
        | (y.astype(np.uint64) << np.uint64(_X_BITS))
        | x.astype(np.uint64)
    )


def cell_id_to_xy(cid) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed cell id → (res, x, y) arrays."""
    cid = np.asarray(cid, dtype=np.uint64)
    res = (cid >> np.uint64(_RES_SHIFT)).astype(np.int64)
    y = ((cid >> np.uint64(_X_BITS)) & np.uint64((1 << _X_BITS) - 1)).astype(np.int64)
    x = (cid & np.uint64((1 << _X_BITS) - 1)).astype(np.int64)
    return res, x, y


def cell_parent(cid, parent_res: int) -> np.ndarray:
    """Ancestor cell id at a coarser resolution (child x,y >> (r - pr))."""
    res, x, y = cell_id_to_xy(cid)
    res0 = int(res.flat[0]) if res.size else 0
    if res.size and (res != res0).any():
        raise ValueError("cell_parent expects uniform-resolution input")
    if parent_res > res0:
        raise ValueError("parent_res must be coarser (smaller) than the cell res")
    shift = np.uint64(res0 - parent_res)
    px = (x.astype(np.uint64) >> shift)
    py = (y.astype(np.uint64) >> shift)
    return (np.uint64(parent_res) << np.uint64(_RES_SHIFT)) | (py << np.uint64(_X_BITS)) | px


def cell_children(cid: int, child_res: int) -> np.ndarray:
    """All descendant cell ids of one cell at a finer resolution."""
    res, x, y = cell_id_to_xy(np.uint64(cid))
    r = int(res)
    if child_res < r:
        raise ValueError("child_res must be finer (larger) than the cell res")
    k = child_res - r
    n = 1 << k
    base_x = int(x) << k
    base_y = int(y) << k
    xs = np.arange(n, dtype=np.uint64)
    cx, cy = np.meshgrid(base_x + xs, base_y + xs)
    return (
        (np.uint64(child_res) << np.uint64(_RES_SHIFT))
        | (cy.ravel() << np.uint64(_X_BITS))
        | cx.ravel()
    )


def cell_bounds(cid: int) -> List[float]:
    """OGR bbox [x_min, x_max, y_min, y_max] of one cell."""
    res, x, y = cell_id_to_xy(np.uint64(cid))
    n = float(1 << int(res))
    w = 360.0 / n
    h = 180.0 / n
    x_min = -180.0 + float(x) * w
    y_min = -90.0 + float(y) * h
    return [x_min, x_min + w, y_min, y_min + h]


def k_ring(cid: int, k: int) -> np.ndarray:
    """Cell ids within Chebyshev distance ``k`` of a cell (the (2k+1)² block),
    wrapping in x (antimeridian) and clamping in y (poles). This is the
    candidate-gather primitive for cell-partitioned kNN — the quadcell
    equivalent of an H3 k-ring."""
    res, x, y = cell_id_to_xy(np.uint64(cid))
    r = int(res)
    n = 1 << r
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (int(x) + dx.ravel()) % n
    ys = int(y) + dy.ravel()
    keep = (ys >= 0) & (ys < n)
    xs = xs[keep].astype(np.uint64)
    ys = ys[keep].astype(np.uint64)
    out = (np.uint64(r) << np.uint64(_RES_SHIFT)) | (ys << np.uint64(_X_BITS)) | xs
    return np.unique(out)


def morton_encode(x, y) -> np.ndarray:
    """Vectorized Z-order (Morton) interleave of two ≤31-bit ints into uint64.
    Standard bit-twiddling expansion (public-domain technique)."""
    def _part(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64(0x7FFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    x = np.asarray(x)
    y = np.asarray(y)
    return _part(x) | (_part(y) << np.uint64(1))


def morton_decode(code) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`morton_encode`."""
    def _compact(v: np.ndarray) -> np.ndarray:
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v.astype(np.int64)

    code = np.asarray(code, dtype=np.uint64)
    return _compact(code), _compact(code >> np.uint64(1))


def latlon_to_morton(lat, lon, res: int = 15) -> np.ndarray:
    """Locality-preserving 1-D key (the engine's S2-cell analog): quadcell
    (x, y) at ``res`` interleaved on the Z-order curve. Near points share
    long prefixes, so range-partitioning this key co-locates neighbours."""
    x, y = cell_xy(lat, lon, res)
    return morton_encode(x, y)
