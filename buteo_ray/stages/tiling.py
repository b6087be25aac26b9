"""Tile assignment: points → fixed 256×256 pixel-grid tiles.

Maps the reference's pixel-offset tiling (``core_raster_offsets.py``,
``bbox/operations.py:19-98``) onto a global plate-carrée pixel grid: a
:class:`GridSpec` (geotransform + size) defines pixel coordinates; tiles
are ``tile_size × tile_size`` pixel blocks keyed ``(tile_x, tile_y)``.
Tile keys are the shuffle/partition key for rasterization, stitching and
zonal stages (SURVEY.md §7.4).

Pixel math is floor arithmetic on float64 — identical in numpy and SQL
(:func:`tile_sql_exprs`), so tile assignment is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from buteo_ray.grid.cells import GLOBAL_BBOX


@dataclass(frozen=True)
class GridSpec:
    """A raster grid: geotransform + pixel dimensions + tile size.

    The Ray-side replacement for the reference's per-call metadata dict
    (``core_raster/core_raster_info.py:143-259``) — computed once,
    closure-captured, never recomputed per row.
    """

    origin_x: float
    origin_y: float
    pixel_width: float
    pixel_height: float  # negative for north-up
    width: int
    height: int
    tile_size: int = 256
    crs: str = "EPSG:4326"

    @classmethod
    def global_grid(cls, zoom: int, tile_size: int = 256) -> "GridSpec":
        """Plate-carrée global grid: 2^zoom × 2^(zoom-1) tiles of
        ``tile_size`` px (2:1 aspect like the world)."""
        width = (1 << zoom) * tile_size
        height = (1 << max(zoom - 1, 0)) * tile_size
        x_min, x_max, y_min, y_max = GLOBAL_BBOX
        return cls(
            origin_x=x_min,
            origin_y=y_max,
            pixel_width=(x_max - x_min) / width,
            pixel_height=-(y_max - y_min) / height,
            width=width,
            height=height,
            tile_size=tile_size,
        )

    @property
    def geotransform(self) -> List[float]:
        return [self.origin_x, self.pixel_width, 0.0, self.origin_y, 0.0, self.pixel_height]

    def pixel_of(self, lon: np.ndarray, lat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized point → integer pixel coordinate (floor), clamped."""
        px = np.floor((np.asarray(lon, np.float64) - self.origin_x) / self.pixel_width).astype(np.int64)
        py = np.floor((np.asarray(lat, np.float64) - self.origin_y) / self.pixel_height).astype(np.int64)
        px = np.clip(px, 0, self.width - 1)
        py = np.clip(py, 0, self.height - 1)
        return px, py


def assign_tiles(ds, grid: GridSpec, lat_col: str = "lat", lon_col: str = "lon"):
    """Append ``px, py, tile_x, tile_y, tile_off_x, tile_off_y`` columns:
    global pixel coords, owning tile, and the within-tile pixel offset."""
    ts = grid.tile_size

    def _fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        px, py = grid.pixel_of(lon, lat)
        return (
            batch.append_column("px", pa.array(px))
            .append_column("py", pa.array(py))
            .append_column("tile_x", pa.array(px // ts))
            .append_column("tile_y", pa.array(py // ts))
            .append_column("tile_off_x", pa.array(px % ts))
            .append_column("tile_off_y", pa.array(py % ts))
        )

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def tile_sql_exprs(grid: GridSpec, lat_sql: str, lon_sql: str) -> dict:
    """DuckDB expressions reproducing :func:`assign_tiles` bit-for-bit."""
    px = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_sql}) - ({grid.origin_x!r})) / "
        f"({grid.pixel_width!r})) AS BIGINT), 0), {grid.width - 1})"
    )
    py = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_sql}) - ({grid.origin_y!r})) / "
        f"({grid.pixel_height!r})) AS BIGINT), 0), {grid.height - 1})"
    )
    ts = grid.tile_size
    return {
        "px": px,
        "py": py,
        "tile_x": f"(({px}) // {ts})",
        "tile_y": f"(({py}) // {ts})",
        "tile_off_x": f"(({px}) % {ts})",
        "tile_off_y": f"(({py}) % {ts})",
    }
