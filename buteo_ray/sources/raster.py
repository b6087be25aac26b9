"""Tile-row raster datasets: a raster is a ``ray.data.Dataset`` with one
row per tile (SURVEY.md §1.3 schema) — the Ray-native replacement for
the reference's GDAL-dataset-or-path raster abstraction
(``/root/reference/buteo/core_raster/core_raster_read.py:62-151``).

Schema: ``raster_id:string, tile_x:int64, tile_y:int64, x_off:int64,
y_off:int64, width:int64, height:int64, bands:int64, halo:int64,
dtype:string, nodata:double, data:binary`` — ``data`` is the C-order
(h+2·halo, w+2·halo, bands) pixel buffer, zero-copied to numpy inside
``map_batches``. Tiles are cut with ``halo`` overlap pixels at creation
so focal ops (convolution/morphology, §2.8) crop their own halo and need
no cross-task exchange.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.functions.dtypes import safe_cast
from buteo_ray.grid.offsets import get_patch_offsets_fixed_size
from buteo_ray.stages.tiling import GridSpec


TILE_COLUMNS = ("raster_id", "tile_x", "tile_y", "x_off", "y_off",
                "width", "height", "bands", "halo", "dtype", "nodata", "data")


def new_tile_rows() -> dict:
    """Empty column-list dict in the canonical tile-row schema order."""
    return {k: [] for k in TILE_COLUMNS}


def append_tile_row(rows: dict, raster_id: str, tile_x: int, tile_y: int,
                    x0: int, y0: int, tw: int, th: int, bands: int, halo: int,
                    dtype: str, nodata: float, data: bytes) -> None:
    """Append one tile row — the single place the 12-column schema is
    spelled out, so constructors can't drift from each other."""
    for k, v in zip(TILE_COLUMNS, (raster_id, tile_x, tile_y, x0, y0, tw, th,
                                   bands, halo, dtype, nodata, data)):
        rows[k].append(v)


def tile_rows_table(rows: dict) -> pa.Table:
    """Column-list dict → Arrow table (data column forced to binary)."""
    return pa.table({**{k: rows[k] for k in TILE_COLUMNS if k != "data"},
                     "data": pa.array(rows["data"], type=pa.binary())})


def _tile_rows(arr: np.ndarray, raster_id: str, tile_size: int, halo: int,
               border_strategy: int, nodata: Optional[float]) -> pa.Table:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    offsets = get_patch_offsets_fixed_size((bands, h, w), tile_size, tile_size,
                                           border_strategy=border_strategy)
    # Tile indices are ORDINALS of the per-axis position lists, not
    # x_off // tile_size: border strategy 2 shifts the last patch back,
    # which would collide with its neighbour's floor-division key.
    xs_positions = sorted({o[0] for o in offsets})
    ys_positions = sorted({o[1] for o in offsets})
    x_index = {x: i for i, x in enumerate(xs_positions)}
    y_index = {y: i for i, y in enumerate(ys_positions)}
    rows = new_tile_rows()
    for (x0, y0, tw, th) in offsets:
        ys = max(y0 - halo, 0)
        ye = min(y0 + th + halo, h)
        xs = max(x0 - halo, 0)
        xe = min(x0 + tw + halo, w)
        block = arr[ys:ye, xs:xe, :]
        if halo > 0:
            pad_top = halo - (y0 - ys)
            pad_bot = halo - (ye - (y0 + th))
            pad_lef = halo - (x0 - xs)
            pad_rig = halo - (xe - (x0 + tw))
            block = np.pad(block, ((pad_top, pad_bot), (pad_lef, pad_rig), (0, 0)), mode="edge")
        append_tile_row(rows, raster_id, x_index[x0], y_index[y0], x0, y0,
                        tw, th, bands, halo, str(arr.dtype),
                        np.nan if nodata is None else float(nodata),
                        np.ascontiguousarray(block).tobytes())
    return tile_rows_table(rows)


def raster_from_array(
    arr: np.ndarray,
    raster_id: str = "r0",
    tile_size: int = 256,
    halo: int = 0,
    border_strategy: int = 3,
    nodata: Optional[float] = None,
):
    """ndarray (H, W[, C]) → tile-row Dataset (≙ reference
    ``raster_create_from_array``, core_raster_write.py:247-352)."""
    import ray.data as rd

    return rd.from_arrow(_tile_rows(arr, raster_id, tile_size, halo, border_strategy, nodata))


def raster_create_empty(
    height: int, width: int, bands: int = 1, value: float = 0.0,
    dtype: str = "float32", raster_id: str = "r0", tile_size: int = 256,
):
    """Constant raster (≙ ``raster_create_empty``, core_raster_write.py:
    118-246) — generated distributed, no driver array."""
    import ray.data as rd

    offsets = get_patch_offsets_fixed_size((bands, height, width), tile_size, tile_size, 3)
    meta = pd.DataFrame({
        "x_off": [o[0] for o in offsets],
        "y_off": [o[1] for o in offsets],
        "width": [o[2] for o in offsets],
        "height": [o[3] for o in offsets],
    })
    base = rd.from_pandas(meta)

    def _fill(batch: pa.Table) -> pa.Table:
        out = new_tile_rows()
        for x0, y0, tw, th in zip(batch["x_off"].to_pylist(), batch["y_off"].to_pylist(),
                                  batch["width"].to_pylist(), batch["height"].to_pylist()):
            # Floor-division tile ids are safe here: the grid is always cut
            # with border strategy 3, so positions are multiples of tile_size.
            append_tile_row(out, raster_id, x0 // tile_size, y0 // tile_size,
                            x0, y0, tw, th, bands, 0, dtype, np.nan,
                            np.full((th, tw, bands), value, dtype=dtype).tobytes())
        return tile_rows_table(out)

    return base.map_batches(_fill, batch_format="pyarrow", batch_size=None)


def tile_to_ndarray(row: dict) -> np.ndarray:
    """One tile row → (h+2·halo, w+2·halo, bands) ndarray (zero-copy)."""
    h = row["height"] + 2 * row["halo"]
    w = row["width"] + 2 * row["halo"]
    return np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(h, w, row["bands"])


def raster_to_array(ds, raster_id: Optional[str] = None,
                    background: float = np.nan) -> np.ndarray:
    """Stitch a (small) tile-row Dataset back into one ndarray (≙
    reference ``raster_to_array``; driver-side, test/export use —
    at scale use :func:`map_tiles` + ``write_parquet`` instead)."""
    tbl = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    if raster_id is not None:
        tbl = tbl[tbl["raster_id"] == raster_id]
    h = int((tbl["y_off"] + tbl["height"]).max())
    w = int((tbl["x_off"] + tbl["width"]).max())
    bands = int(tbl["bands"].iloc[0])
    dtype = np.dtype(tbl["dtype"].iloc[0])
    # Assemble IN the source dtype — staging through float64 would
    # silently round int64/uint64 pixel values above 2^53.
    out = np.zeros((h, w, bands), dtype=dtype)
    covered = np.zeros((h, w), dtype=bool)
    for _, row in tbl.iterrows():
        block = tile_to_ndarray(row)
        halo = row["halo"]
        core = block[halo:halo + row["height"], halo:halo + row["width"], :]
        out[row["y_off"]:row["y_off"] + row["height"],
            row["x_off"]:row["x_off"] + row["width"], :] = core
        covered[row["y_off"]:row["y_off"] + row["height"],
                row["x_off"]:row["x_off"] + row["width"]] = True
    if not np.isnan(background):
        if not covered.all():
            out[~covered] = np.asarray(background).astype(dtype)
        return out
    # Default NaN background: keep the SOURCE dtype when tiles fully
    # cover the extent (a uint8 raster must not silently come back 8×
    # wider as float64); only an actually-sparse layout needs the float
    # NaN representation.
    if covered.all():
        return out
    fout = out.astype(np.float64)
    fout[~covered] = np.nan
    return fout


def map_tiles(ds, fn: Callable[[np.ndarray, dict], np.ndarray],
              out_dtype: Optional[str] = None, crop_halo: bool = True,
              concurrency: Optional[int] = None):
    """Apply ``fn(tile_array, row_meta) → tile_array`` to every tile —
    the engine's generic per-tile kernel stage (filters, casts, scalers
    over rasters). ``fn`` sees the halo-padded array; when ``crop_halo``
    the output is cropped to the core and halo is reset to 0."""

    def _apply(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        new_data, new_dtype, new_bands = [], [], []
        for _, row in pdf.iterrows():
            arr = tile_to_ndarray(row)
            out = fn(arr, row)
            if out.ndim == 2:
                out = out[:, :, None]
            halo = row["halo"]
            if crop_halo and halo > 0:
                out = out[halo:halo + row["height"], halo:halo + row["width"], :]
            if out_dtype:
                # Checked cast (reference utils_translate.py:739-783):
                # clip to destination range + rint for int targets, so
                # e.g. 300.7 → uint8 gives 255, not numpy's wrapped 44.
                out = safe_cast(out, out_dtype)
            new_data.append(np.ascontiguousarray(out).tobytes())
            new_dtype.append(str(out.dtype))
            new_bands.append(out.shape[2])
        pdf["data"] = new_data
        pdf["dtype"] = new_dtype
        pdf["bands"] = new_bands
        if crop_halo:
            pdf["halo"] = 0
        return pa.Table.from_pandas(pdf, preserve_index=False)

    kwargs = dict(batch_format="pyarrow", batch_size=None)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(_apply, **kwargs)


def raster_extract_bands(ds, bands):
    """Select a band subset from every tile (≙ ``raster_extract_bands``,
    reference core_raster/core_raster_subset.py:19-94)."""
    bands = list(bands)

    def _fn(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        orig_bands = pdf["bands"].to_numpy().copy()
        out = []
        for _, row in pdf.iterrows():
            arr = tile_to_ndarray(row)[:, :, bands]
            out.append(np.ascontiguousarray(arr).tobytes())
        pdf["data"] = out
        pdf["bands"] = len(bands)
        if "band_descriptions" in pdf.columns:
            # Keep name metadata in sync with the selected bands; rows
            # whose descriptions are absent or stale (None / wrong
            # length vs the row's ORIGINAL band count) get None,
            # mirroring raster_stack's guard, instead of raising or
            # silently mislabeling from a stale list.
            pdf["band_descriptions"] = [
                ([list(d)[b] for b in bands]
                 if d is not None and len(list(d)) == orig_bands[i] else None)
                for i, d in enumerate(pdf["band_descriptions"])]
        return pa.Table.from_pandas(pdf, preserve_index=False)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def raster_stack(ds_a, ds_b):
    """Stack two aligned tile-row rasters band-wise (≙
    ``raster_stack_list``, reference core_raster/core_raster_stack.py:
    24-265): positional join on the tile key via tagged union +
    ``groupby(tile).map_groups`` concatenating channel dims. Both inputs
    must share the tiling grid (same x_off/y_off/size per tile)."""

    def _tag(side):
        def _fn(t: pa.Table) -> pa.Table:
            return t.append_column("__side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))

        return _fn

    both = ds_a.map_batches(_tag(0), batch_format="pyarrow", batch_size=None).union(
        ds_b.map_batches(_tag(1), batch_format="pyarrow", batch_size=None))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__side", kind="stable")
        # Exactly one row PER SIDE — len==2 alone would accept a same-side
        # duplicate (e.g. a multi-raster dataset sharing the tile grid)
        # and silently stack a tile with its sibling.
        if len(g) != 2 or sorted(g["__side"].tolist()) != [0, 1]:
            raise ValueError(
                "raster_stack: each tile key must appear exactly once per "
                f"side, got sides {g['__side'].tolist()}")
        arrs = [tile_to_ndarray(row) for _, row in g.iterrows()]
        stacked = np.concatenate(arrs, axis=2)
        out = g.iloc[[0]].drop(columns="__side").copy()
        out["data"] = [np.ascontiguousarray(stacked).tobytes()]
        out["bands"] = stacked.shape[2]
        out["dtype"] = str(stacked.dtype)
        if "band_descriptions" in g.columns:
            # Concatenate names in stack order when BOTH sides carry
            # them and the lengths match their band counts; otherwise a
            # stale side-0 list (wrong length) would mislabel the stack.
            descs = [list(d) if d is not None else None
                     for d in g["band_descriptions"]]
            lens = [a.shape[2] for a in arrs]
            if all(d is not None and len(d) == n
                   for d, n in zip(descs, lens)):
                out["band_descriptions"] = [sum(descs, [])]
            else:
                out = out.drop(columns="band_descriptions")
        return out

    return both.groupby(["tile_x", "tile_y"]).map_groups(_merge, batch_format="pandas")


def rasterize_points(points_ds, grid: GridSpec, value_col: Optional[str] = None,
                     lat_col: str = "lat", lon_col: str = "lon"):
    """Burn a point Dataset onto the grid (≙ ``vector_rasterize``,
    reference vector/rasterize.py:31-217): per-batch partial per-pixel
    sums/counts → ``groupby(tile)`` final → tile rows. Output band 0 =
    count (or sum of ``value_col``)."""
    ts = grid.tile_size

    def _partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        # Points strictly outside the grid extent are DROPPED (reference
        # vector_rasterize burns only in-extent points) — pixel_of's
        # clamp would otherwise pile them onto the border pixels. Points
        # exactly ON the max edge stay (clamped into the last pixel,
        # matching the SQL LEAST twin for poles/antimeridian).
        x_lo = min(grid.origin_x, grid.origin_x + grid.width * grid.pixel_width)
        x_hi = max(grid.origin_x, grid.origin_x + grid.width * grid.pixel_width)
        y_lo = min(grid.origin_y, grid.origin_y + grid.height * grid.pixel_height)
        y_hi = max(grid.origin_y, grid.origin_y + grid.height * grid.pixel_height)
        inside = (lon >= x_lo) & (lon <= x_hi) & (lat >= y_lo) & (lat <= y_hi)
        if not inside.all():
            batch = batch.filter(pa.array(inside))
            lon, lat = lon[inside], lat[inside]
        if len(lon) == 0:
            return pa.table({"tile_x": np.empty(0, np.int64),
                             "tile_y": np.empty(0, np.int64),
                             "off_x": np.empty(0, np.int64),
                             "off_y": np.empty(0, np.int64),
                             "value": np.empty(0, np.float64)})
        px, py = grid.pixel_of(lon, lat)
        val = (batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
               if value_col else np.ones(px.shape[0]))
        key = py * grid.width + px
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=val)
        upx = (uniq % grid.width).astype(np.int64)
        upy = (uniq // grid.width).astype(np.int64)
        return pa.table({
            "tile_x": upx // ts, "tile_y": upy // ts,
            "off_x": upx % ts, "off_y": upy % ts,
            "value": sums,
        })

    def _to_tile(g: pd.DataFrame) -> pd.DataFrame:
        tx = int(g["tile_x"].iloc[0])
        ty = int(g["tile_y"].iloc[0])
        # Edge tiles clip to the grid extent (strategy-3 semantics) so the
        # output stitches/stacks against rasters built on the same grid.
        tw = min(ts, grid.width - tx * ts)
        th = min(ts, grid.height - ty * ts)
        agg = g.groupby(["off_y", "off_x"])["value"].sum()
        block = np.zeros((th, tw, 1), dtype=np.float64)
        oy = agg.index.get_level_values(0).to_numpy()
        ox = agg.index.get_level_values(1).to_numpy()
        block[oy, ox, 0] = agg.to_numpy()
        return pd.DataFrame({
            "raster_id": ["points"], "tile_x": [tx], "tile_y": [ty],
            "x_off": [tx * ts], "y_off": [ty * ts],
            "width": [tw], "height": [th], "bands": [1], "halo": [0],
            "dtype": ["float64"], "nodata": [np.nan],
            "data": [block.tobytes()],
        })

    return (
        points_ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["tile_x", "tile_y"])
        .map_groups(_to_tile, batch_format="pandas")
    )


def raster_intersection_info(grid_a: GridSpec, grid_b: GridSpec) -> Optional[dict]:
    """bbox intersection tests between two rasters (≙ check_rasters_
    intersect / get_raster_intersection / get_raster_overlap_fraction,
    reference core_raster/core_raster_extent.py:27-291). Returns None
    when disjoint, else {bbox, overlap_fraction_a, overlap_fraction_b}."""
    from buteo_ray.grid.bbox import bboxes_intersect, intersection_bboxes

    def _bbox(g: GridSpec):
        x0, y1 = g.origin_x, g.origin_y
        x1 = g.origin_x + g.width * g.pixel_width
        y0 = g.origin_y + g.height * g.pixel_height
        return [min(x0, x1), max(x0, x1), min(y0, y1), max(y0, y1)]

    ba, bb = _bbox(grid_a), _bbox(grid_b)
    if not bboxes_intersect(ba, bb):
        return None
    ib = intersection_bboxes(ba, bb)
    area = (ib[1] - ib[0]) * (ib[3] - ib[2])
    area_a = (ba[1] - ba[0]) * (ba[3] - ba[2])
    area_b = (bb[1] - bb[0]) * (bb[3] - bb[2])
    return {"bbox": ib, "overlap_fraction_a": area / area_a,
            "overlap_fraction_b": area / area_b}


def grid_shift(grid: GridSpec, dx: float, dy: float, pixel_units: bool = False) -> GridSpec:
    """Translate a grid's origin by map units or pixels (≙ raster_shift /
    raster_shift_pixel, reference raster/shift.py:28-238 — metadata-only,
    no pixel work)."""
    from dataclasses import replace

    if pixel_units:
        dx = dx * grid.pixel_width
        dy = dy * grid.pixel_height
    return replace(grid, origin_x=grid.origin_x + dx, origin_y=grid.origin_y + dy)


def coordinate_grid_raster(grid: GridSpec, tile_size: Optional[int] = None):
    """Raster whose two bands are the x/y map coordinates of each pixel
    center (≙ raster_create_grid_with_coordinates, reference
    raster/coordinates.py:17-58) — generated per tile, no driver array."""
    import ray.data as rd

    ts = tile_size or grid.tile_size
    offsets = get_patch_offsets_fixed_size((1, grid.height, grid.width), ts, ts, 3)
    meta = pd.DataFrame({
        "x_off": [o[0] for o in offsets], "y_off": [o[1] for o in offsets],
        "width": [o[2] for o in offsets], "height": [o[3] for o in offsets],
    })

    def _fill(batch: pa.Table) -> pa.Table:
        out = new_tile_rows()
        for x0, y0, tw, th in zip(batch["x_off"].to_pylist(), batch["y_off"].to_pylist(),
                                  batch["width"].to_pylist(), batch["height"].to_pylist()):
            xs = grid.origin_x + (x0 + np.arange(tw) + 0.5) * grid.pixel_width
            ys = grid.origin_y + (y0 + np.arange(th) + 0.5) * grid.pixel_height
            gx, gy = np.meshgrid(xs, ys)
            block = np.stack([gx, gy], axis=-1)
            append_tile_row(out, "coords", x0 // ts, y0 // ts, x0, y0, tw, th,
                            2, 0, "float64", np.nan,
                            np.ascontiguousarray(block).tobytes())
        return tile_rows_table(out)

    return rd.from_pandas(meta).map_batches(_fill, batch_format="pyarrow", batch_size=None)


def random_patches(arr: np.ndarray, n: int, patch_size: int, seed: int = 42) -> np.ndarray:
    """N seeded random fixed-size patches → (N, t, t, C) (≙
    raster_to_array_random_patches, reference core_raster/core_raster_
    array.py:359-455; seeded generator replaces the infinite iterator)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if h < patch_size or w < patch_size:
        raise ValueError("array smaller than patch size")
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, h - patch_size + 1, n)
    xs = rng.integers(0, w - patch_size + 1, n)
    return np.stack([arr[y:y + patch_size, x:x + patch_size, :] for y, x in zip(ys, xs)])
