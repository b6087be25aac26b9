"""AOI (area-of-interest) polygon layer synthesis — deterministic, seeded
by pure id arithmetic so the SQL oracle can regenerate the rectangles
exactly (FIXTURES.md §2).

Two flavours:

- :func:`synth_aoi_rects` — axis-aligned rectangles whose corner math is
  SQL-expressible (bbox containment joins checked by DuckDB),
- :func:`synth_aoi_polygons` — simple star-shaped polygons (5-12
  vertices; generally NON-convex, so not valid clip rings for the
  convex-only fast paths) with WKB geometry + bbox columns, for the
  exact point-in-polygon / predicate joins (checked by a brute-force
  oracle in pytest).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from buteo_ray.geom.wkb import wkb_polygon
from buteo_ray.stages.geocode import hash_unit, _M1, _M2, _Q1, _Q2, _hash_sql, _TWO32

# Rectangle layout constants (shared by numpy + SQL).
_RX0, _RX_SPAN = -179.0, 350.0
_RY0, _RY_SPAN = -59.0, 110.0
_RW0, _RW_SPAN = 0.5, 4.0
_RH0, _RH_SPAN = 0.5, 6.0


def synth_aoi_rects(n: int) -> pa.Table:
    """n deterministic rectangles: ``aoi_id, bbox_xmin/xmax/ymin/ymax``."""
    k = np.arange(n, dtype=np.int64)
    xmin = _RX0 + hash_unit(3 * k + 1, _M1, _Q1) * _RX_SPAN
    ymin = _RY0 + hash_unit(3 * k + 2, _M2, _Q2) * _RY_SPAN
    w = _RW0 + hash_unit(3 * k, _M2, _Q2) * _RW_SPAN
    h = _RH0 + hash_unit(3 * k, _M1, _Q1) * _RH_SPAN
    return pa.table(
        {
            "aoi_id": k,
            "bbox_xmin": xmin,
            "bbox_xmax": xmin + w,
            "bbox_ymin": ymin,
            "bbox_ymax": ymin + h,
        }
    )


def aoi_rect_sql_cte(n: int) -> str:
    """DuckDB CTE body regenerating :func:`synth_aoi_rects` bit-for-bit."""
    k = "CAST(range AS BIGINT)"
    xmin = f"{_RX0} + (({_hash_sql(f'3*{k}+1', _M1, _Q1)}) / {_TWO32}) * {_RX_SPAN}"
    ymin = f"{_RY0} + (({_hash_sql(f'3*{k}+2', _M2, _Q2)}) / {_TWO32}) * {_RY_SPAN}"
    w = f"{_RW0} + (({_hash_sql(f'3*{k}', _M2, _Q2)}) / {_TWO32}) * {_RW_SPAN}"
    h = f"{_RH0} + (({_hash_sql(f'3*{k}', _M1, _Q1)}) / {_TWO32}) * {_RH_SPAN}"
    return (
        f"SELECT {k} AS aoi_id, ({xmin}) AS bbox_xmin, ({xmin}) + ({w}) AS bbox_xmax, "
        f"({ymin}) AS bbox_ymin, ({ymin}) + ({h}) AS bbox_ymax FROM range({n})"
    )


def synth_aoi_polygons(n: int, include_hot: bool = True) -> pa.Table:
    """n deterministic simple star-shaped polygons with WKB + bbox columns.

    Construction: a seeded center + varying-radius radial vertices (5-12,
    sorted by angle → simple star polygon, usually non-convex). ~10% of polygons sit in the geocoder's
    hot cluster (when ``include_hot``) so PiP joins hit the skewed cells
    — page-side skew (30% of pages in one ~2° cell) is what stresses the
    partitioning; the polygon side stays realistically sparse (most
    pages match 0-2 AOIs, like admin boundaries).
    """
    rng = np.random.default_rng(42)
    aoi_ids = np.arange(n, dtype=np.int64)
    wkbs = []
    xmins = np.empty(n)
    xmaxs = np.empty(n)
    ymins = np.empty(n)
    ymaxs = np.empty(n)
    names = []
    for i in range(n):
        hot = include_hot and (i % 10 == 0)
        if hot:
            cx = -74.0 + rng.uniform(0.0, 2.0)
            cy = 40.0 + rng.uniform(0.0, 2.0)
            radius = rng.uniform(0.02, 0.12)
        else:
            cx = rng.uniform(-175.0, 175.0)
            cy = rng.uniform(-55.0, 55.0)
            radius = rng.uniform(0.2, 1.5)
        nv = int(rng.integers(5, 13))
        angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, nv))
        radii = radius * rng.uniform(0.5, 1.0, nv)
        xs = cx + radii * np.cos(angles)
        ys = cy + radii * np.sin(angles)
        ring = np.column_stack([xs, ys])
        ring = np.vstack([ring, ring[:1]])
        wkbs.append(wkb_polygon([ring]))
        xmins[i] = xs.min()
        xmaxs[i] = xs.max()
        ymins[i] = ys.min()
        ymaxs[i] = ys.max()
        names.append(f"aoi_{i}")
    return pa.table(
        {
            "aoi_id": aoi_ids,
            "name": names,
            "geom_wkb": pa.array(wkbs, type=pa.binary()),
            "bbox_xmin": xmins,
            "bbox_xmax": xmaxs,
            "bbox_ymin": ymins,
            "bbox_ymax": ymaxs,
        }
    )
