"""Cell-assignment stage: lat/lon → hierarchical cell ids (res 5-12 by
default) plus the Morton (Z-order) locality key.

This is the engine's partitioning backbone (north rule: "H3/S2 cell
assignment"): every wide operation downstream keys on one of these
columns. Stateless vectorized ``map_batches`` over Arrow batches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa

from buteo_ray.grid.cells import cell_id, cell_xy, latlon_to_morton


def assign_cells(
    ds,
    resolutions: Sequence[int] = (5, 6, 7, 8, 9, 10, 11, 12),
    lat_col: str = "lat",
    lon_col: str = "lon",
    morton_res: int = 15,
    morton_col: str = "s2_cell",
):
    """Append ``cell_r{r}:uint64`` for each resolution plus a Z-order
    ``s2_cell:uint64`` key (the S2-analog)."""

    def _fn(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        # int64 views (same bits; res ≤ 28 ids fit in 63 bits anyway):
        # these are THE shuffle keys, and uint64 group keys trip Ray's
        # pickled-object Arrow fallback in aggregate paths.
        for r in resolutions:
            batch = batch.append_column(
                f"cell_r{r}", pa.array(cell_id(lat, lon, r).view(np.int64)))
        if morton_col:
            batch = batch.append_column(
                morton_col, pa.array(latlon_to_morton(lat, lon, morton_res).view(np.int64)))
        return batch

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def assign_cell_xy(ds, res: int, lat_col: str = "lat", lon_col: str = "lon"):
    """Append unpacked ``cell_x:int64, cell_y:int64`` at one resolution
    (the SQL-friendly form; oracle via :func:`cell_xy_sql_exprs`)."""

    def _fn(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        x, y = cell_xy(lat, lon, res)
        return batch.append_column("cell_x", pa.array(x)).append_column("cell_y", pa.array(y))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def cell_xy_sql_exprs(res: int, lat_sql: str, lon_sql: str) -> Tuple[str, str]:
    """(cell_x_sql, cell_y_sql) DuckDB expressions matching
    :func:`buteo_ray.grid.cells.cell_xy` bit-for-bit."""
    n = 1 << res
    x = f"LEAST(GREATEST(CAST(FLOOR((({lon_sql}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    y = f"LEAST(GREATEST(CAST(FLOOR((({lat_sql}) + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    return x, y
