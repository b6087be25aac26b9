"""Raster clip & dtype ops over tile-row Datasets.

``raster_clip``: clip a tile raster by a polygon cutline (reference
``raster/clip.py:46-411``): tiles fully outside the clip bbox are
DROPPED (predicate pushdown on tile extents — the reference's ``-spat``),
partially-covered tiles get out-of-polygon pixels set to nodata via a
vectorized per-pixel-center PiP mask (the rasterized-cutline step).

``raster_set_datatype``: safe cast per reference
``utils/utils_translate.py:739-783`` (clip to the target range,
round-to-nearest for integer targets).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from buteo_ray.geom.predicates import points_in_polygon
from buteo_ray.sources.raster import tile_to_ndarray
from buteo_ray.stages.tiling import GridSpec


def safe_cast(arr: np.ndarray, target_dtype: str) -> np.ndarray:
    """Range-clipped cast; integers round first (reference
    ``_safe_numpy_casting``)."""
    dt = np.dtype(target_dtype)
    if arr.dtype == dt:
        return arr
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        return np.clip(np.rint(arr), info.min, info.max).astype(dt)
    info = np.finfo(dt)
    return np.clip(arr, info.min, info.max).astype(dt)


def raster_set_datatype(ds, target_dtype: str):
    """Safe-cast every tile's pixels (≙ ``raster_set_datatype``,
    reference core_raster/core_raster_datatypes.py:69-265)."""

    def _fn(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            row = {c: batch[c][i].as_py() for c in
                   ("data", "dtype", "height", "width", "bands", "halo")}
            arr = tile_to_ndarray(row)
            out.append(np.ascontiguousarray(safe_cast(arr, target_dtype)).tobytes())
        # Arrow-native column swap: only data/dtype are rebuilt; every
        # other column stays zero-copy.
        batch = batch.set_column(batch.schema.get_field_index("data"), "data",
                                 pa.array(out, type=pa.binary()))
        return batch.set_column(
            batch.schema.get_field_index("dtype"), "dtype",
            pa.array([target_dtype] * batch.num_rows, type=pa.string()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def raster_clip(ds, clip_rings: Sequence[np.ndarray], grid: GridSpec,
                nodata: float = np.nan, drop_outside: bool = True):
    """Clip a tile-row raster by a polygon (rings as (N,2) map-coord
    arrays). Tiles outside the clip bbox are dropped (when
    ``drop_outside``); partial tiles are masked pixel-by-pixel."""
    allpts = np.vstack([r for r in clip_rings])
    cxmin, cxmax = allpts[:, 0].min(), allpts[:, 0].max()
    cymin, cymax = allpts[:, 1].min(), allpts[:, 1].max()

    def _fn(batch: pa.Table) -> pa.Table:
        keep_rows, out_data, out_nodata = [], [], []
        for i in range(batch.num_rows):
            row = {c: batch[c][i].as_py() for c in
                   ("data", "dtype", "height", "width", "bands", "halo",
                    "x_off", "y_off", "nodata")}
            # Tile extent in map coordinates (y_off grows downward).
            x0 = grid.origin_x + row["x_off"] * grid.pixel_width
            x1 = grid.origin_x + (row["x_off"] + row["width"]) * grid.pixel_width
            y0 = grid.origin_y + (row["y_off"] + row["height"]) * grid.pixel_height
            y1 = grid.origin_y + row["y_off"] * grid.pixel_height
            if x1 < cxmin or x0 > cxmax or y1 < cymin or y0 > cymax:
                if drop_outside:
                    keep_rows.append(False)
                    out_data.append(b"")
                    out_nodata.append(row["nodata"])
                    continue
            arr = tile_to_ndarray(row).astype(np.float64).copy()
            halo = row["halo"]
            h, w = row["height"], row["width"]
            jj, ii = np.meshgrid(np.arange(w), np.arange(h))
            px = grid.origin_x + (row["x_off"] + jj + 0.5) * grid.pixel_width
            py = grid.origin_y + (row["y_off"] + ii + 0.5) * grid.pixel_height
            inside = points_in_polygon(px.ravel(), py.ravel(), clip_rings).reshape(h, w)
            core = arr[halo:halo + h, halo:halo + w, :]
            core[~inside, :] = nodata
            arr[halo:halo + h, halo:halo + w, :] = core
            keep_rows.append(True)
            out_data.append(np.ascontiguousarray(arr).tobytes())
            out_nodata.append(float(nodata))
        batch = batch.set_column(batch.schema.get_field_index("data"), "data",
                                 pa.array(out_data, type=pa.binary()))
        batch = batch.set_column(batch.schema.get_field_index("nodata"), "nodata",
                                 pa.array(out_nodata, type=pa.float64()))
        batch = batch.set_column(
            batch.schema.get_field_index("dtype"), "dtype",
            pa.array(["float64"] * batch.num_rows, type=pa.string()))
        return batch.filter(pa.array(keep_rows, type=pa.bool_()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def raster_set_band_descriptions(ds, descriptions):
    """Attach band-name metadata to every tile row (≙ reference
    ``raster_set_band_descriptions``, core_raster_write.py:353 — GDAL
    SetDescription per band, here a ``band_descriptions`` list column
    the sinks and stack/extract ops carry along). Zero-copy append."""
    descriptions = [str(d) for d in descriptions]

    def _fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            # Validate EVERY row's band count — a batch can mix tiles
            # from rasters with different band counts.
            import pyarrow.compute as pc

            nbs = pc.unique(batch["bands"]).to_pylist()
            bad = [nb for nb in nbs if nb != len(descriptions)]
            if bad:
                raise ValueError(
                    f"got {len(descriptions)} descriptions for tiles "
                    f"with band counts {sorted(set(bad))}")
        col = pa.array([descriptions] * batch.num_rows,
                       type=pa.list_(pa.string()))
        if "band_descriptions" in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index("band_descriptions"),
                "band_descriptions", col)
        return batch.append_column("band_descriptions", col)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
