"""Hexagonal grid synthesis (reference ``vector/grid.py:24``
``create_hexagonal_grid`` — a "Not implemented yet" stub there; this
delivers the documented contract: hex polygons covering an extent at a
given cell size).

Convention (flat-top hexagons, circumradius ``s``):

- column pitch 1.5·s, row pitch √3·s, odd columns shifted up √3·s/2,
- centers: ``cx = xmin + 1.5·s·i``, ``cy = ymin + √3·s·j + √3·s·0.5·(i%2)``
  for ``0 ≤ i ≤ floor((xmax−xmin)/(1.5 s))``,
  ``0 ≤ j ≤ floor((ymax−ymin)/(√3 s))`` — every arithmetic step is also
  expressible in SQL, so the driver oracle regenerates the lattice
  bit-exactly,
- ``hex_id = i·(nj+1) + j``; neighboring hexes share edges exactly
  (same float expressions on both sides of an edge).

Scale note: the grid is generated as an Arrow table for broadcast use
(AOI-style); for planetary grids generate per-tile inside map_batches
with the same formulas — the lattice is pure arithmetic on (i, j).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from buteo_ray.geom.wkb import wkb_polygon

__all__ = ["create_hexagonal_grid", "hex_grid_sql_cte", "assign_hex"]

_SQRT3 = np.sqrt(3.0)
# Flat-top hex vertex offsets (angles 0°, 60°, ..., 300°): exact
# half-integer cosines, ±√3/2 sines.
_VX = np.array([1.0, 0.5, -0.5, -1.0, -0.5, 0.5])
_VY = np.array([0.0, _SQRT3 / 2, _SQRT3 / 2, 0.0, -_SQRT3 / 2, -_SQRT3 / 2])


def _grid_counts(xmin, ymin, xmax, ymax, s) -> tuple:
    """Column/row counts that guarantee FULL extent coverage: columns
    overlap (pitch 1.5s < hex width 2s) so reaching a last center ≥ xmax
    suffices; rows tile y exactly (pitch √3·s = hex height), so the last
    row's top edge must clear ymax. ceil, not floor — floor left an
    uncovered band up to one cell wide inside the extent."""
    ni = int(np.ceil((xmax - xmin) / (1.5 * s)))
    nj = int(np.ceil((ymax - ymin) / (_SQRT3 * s)))
    return ni, nj


def create_hexagonal_grid(extent, cell_size: float) -> pa.Table:
    """Hexagon layer covering ``extent=[xmin, ymin, xmax, ymax]``:
    columns ``hex_id, i, j, cx, cy, geom_wkb, bbox_*``."""
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    s = float(cell_size)
    if s <= 0 or xmax <= xmin or ymax <= ymin:
        raise ValueError("need positive cell_size and a non-empty extent")
    ni, nj = _grid_counts(xmin, ymin, xmax, ymax, s)
    i = np.repeat(np.arange(ni + 1, dtype=np.int64), nj + 1)
    j = np.tile(np.arange(nj + 1, dtype=np.int64), ni + 1)
    cx = xmin + 1.5 * s * i
    cy = ymin + _SQRT3 * s * j + _SQRT3 * s * 0.5 * (i % 2)

    wkbs = []
    for k in range(len(i)):
        ring = np.column_stack([cx[k] + s * _VX, cy[k] + s * _VY])
        wkbs.append(wkb_polygon([np.vstack([ring, ring[:1]])]))

    return pa.table({
        "hex_id": pa.array(i * (nj + 1) + j),
        "i": pa.array(i), "j": pa.array(j),
        "cx": pa.array(cx), "cy": pa.array(cy),
        "geom_wkb": pa.array(wkbs, type=pa.binary()),
        "bbox_xmin": pa.array(cx - s), "bbox_xmax": pa.array(cx + s),
        "bbox_ymin": pa.array(cy - _SQRT3 * s * 0.5),
        "bbox_ymax": pa.array(cy + _SQRT3 * s * 0.5),
    })


def hex_grid_sql_cte(extent, cell_size: float) -> str:
    """DuckDB CTE regenerating hex_id/i/j/cx/cy/bbox with the exact
    float expressions of :func:`create_hexagonal_grid`."""
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    s = float(cell_size)
    ni, nj = _grid_counts(xmin, ymin, xmax, ymax, s)
    return f"""
    SELECT CAST(i * {nj + 1} + j AS BIGINT) AS hex_id,
           CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           {xmin!r} + 1.5 * {s!r} * i AS cx,
           {ymin!r} + sqrt(3) * {s!r} * j + sqrt(3) * {s!r} * 0.5 * (i % 2) AS cy,
           {xmin!r} + 1.5 * {s!r} * i - {s!r} AS bbox_xmin,
           {xmin!r} + 1.5 * {s!r} * i + {s!r} AS bbox_xmax,
           ({ymin!r} + sqrt(3) * {s!r} * j + sqrt(3) * {s!r} * 0.5 * (i % 2))
             - sqrt(3) * {s!r} * 0.5 AS bbox_ymin,
           ({ymin!r} + sqrt(3) * {s!r} * j + sqrt(3) * {s!r} * 0.5 * (i % 2))
             + sqrt(3) * {s!r} * 0.5 AS bbox_ymax
    FROM (SELECT CAST(range AS BIGINT) AS i FROM range(0, {ni + 1})),
         (SELECT CAST(range AS BIGINT) AS j FROM range(0, {nj + 1}))
    """


def assign_hex(xs, ys, extent, cell_size: float):
    """Vectorized point→hexagon assignment for the
    :func:`create_hexagonal_grid` lattice. A hex grid is its own centers'
    Voronoi diagram, so nearest-center == point-in-polygon (boundary
    ties broken toward the smaller (i, j) — measure-zero for real data).
    Per point: 3 candidate columns × their nearest row, one argmin —
    O(1) arithmetic, no index, no polygon test. Returns (i, j, hex_id);
    a point whose nearest hex lies OUTSIDE the extent's grid range gets
    ``hex_id = -1`` (the raw linear formula would alias such (i, j)
    onto valid neighboring ids, silently mis-binning — filter on the
    sentinel, or rely on in-extent inputs: the grid fully covers its
    extent, so those always get a real id).
    """
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    s = float(cell_size)
    ni, nj = _grid_counts(xmin, ymin, xmax, ymax, s)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)

    i0 = np.rint((xs - xmin) / (1.5 * s)).astype(np.int64)
    best_d = np.full(xs.shape, np.inf)
    best_i = np.zeros(xs.shape, dtype=np.int64)
    best_j = np.zeros(xs.shape, dtype=np.int64)
    for di in (-1, 0, 1):
        i = i0 + di
        off = _SQRT3 * s * 0.5 * (i % 2)
        j = np.rint((ys - ymin - off) / (_SQRT3 * s)).astype(np.int64)
        cx = xmin + 1.5 * s * i
        cy = ymin + _SQRT3 * s * j + off
        d = (xs - cx) ** 2 + (ys - cy) ** 2
        # strict < keeps the earlier (smaller-i) candidate on exact ties
        take = d < best_d
        best_d = np.where(take, d, best_d)
        best_i = np.where(take, i, best_i)
        best_j = np.where(take, j, best_j)
    in_range = ((best_i >= 0) & (best_i <= ni)
                & (best_j >= 0) & (best_j <= nj))
    hex_id = np.where(in_range, best_i * (nj + 1) + best_j, -1)
    return best_i, best_j, hex_id
