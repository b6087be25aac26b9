"""Model inference over rasters — the reference's ``predict_array``
(``/root/reference/buteo/array/patches/prediction.py:30-209``) as a
Ray-Data pipeline.

Reference plan (driver-RAM-bound: accumulates n_grids full-size arrays):
dithered offset grids → patches → batched model callback → edge-distance
weights → stitch per grid → weighted merge across grids.

Ray plan (constant memory per task, SURVEY.md §3.2):
1. the input array is ``ray.put`` once; a patch-metadata Dataset
   (grid_id, y0, x0) drives extraction inside tasks (zero-copy reads
   from the object store);
2. scoring is an ACTOR POOL — the model callback is built once per
   actor (``__init__``), batches of patches are scored per call;
3. each scored patch is split into its ≤4 overlapping output tiles
   (``flat_map`` shape) keyed (tile_y, tile_x);
4. ``groupby(tile)`` assembles the per-grid stacks (n_grids, ts, ts, C)
   with NaN fill exactly like the reference's full-size accumulators —
   but per tile — and applies the same weighted merge kernels.

``predict_array_local`` is the single-process reference-parity oracle
used by the tests; the distributed path must match it exactly.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.functions.array_patches import get_kernel_weights
from buteo_ray.functions.merging import MERGE_METHODS
from buteo_ray.grid.offsets import get_dither_offsets


def _prediction_offsets(shape, tile_size: int, n_offsets: int, border_check: bool):
    """Offset grids: dithered + border (reference ``prediction.py:102-118``
    via ``array_to_patches`` offset logic)."""
    h, w = shape[0], shape[1]
    if h < tile_size or w < tile_size:
        # Same guard as the reference's array_to_patches — border offsets
        # would go negative and slice wrong-shaped patches.
        raise ValueError("Array must be larger or equal to tile_size")
    offsets = get_dither_offsets(tile_size, n_offsets)
    if border_check:
        need_y = all((h - off[0]) % tile_size != 0 for off in offsets)
        need_x = all((w - off[1]) % tile_size != 0 for off in offsets)
        if need_y or need_x:
            offsets.append((0, w - tile_size))
            offsets.append((h - tile_size, 0))
            offsets.append((h - tile_size, w - tile_size))
    return offsets


def _grid_patch_positions(shape, tile_size: int, offset):
    h, w = shape[0], shape[1]
    ys = np.arange(offset[0], offset[0] + ((h - offset[0]) // tile_size) * tile_size, tile_size)
    xs = np.arange(offset[1], offset[1] + ((w - offset[1]) // tile_size) * tile_size, tile_size)
    return [(int(y), int(x)) for y in ys for x in xs]


class ModelScorer:
    """Actor-pool stage: the user's model is BUILT ONCE per actor from
    ``model_builder`` (a zero-arg callable returning
    ``fn(P,t,t,C) → (P,t,t,C')``), then applied per batch.

    ``model_builder`` must either live in a module importable on every
    worker or be defined in a scope cloudpickle serializes by value
    (``__main__`` / nested function) — a by-reference pickle of an
    unimportable module sends the actor into a restart loop."""

    def __init__(self, arr_ref, model_builder: Callable, tile_size: int):
        import ray

        self.arr = ray.get(arr_ref)
        self.model = model_builder()
        self.ts = tile_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ys = batch["y0"].to_numpy()
        xs = batch["x0"].to_numpy()
        stack = np.stack([self.arr[y:y + self.ts, x:x + self.ts, :] for y, x in zip(ys, xs)])
        pred = self.model(stack)
        if pred.ndim == 3:
            pred = pred[..., None]
        out_c = pred.shape[-1]
        return pa.table({
            "grid_id": batch["grid_id"],
            "y0": batch["y0"],
            "x0": batch["x0"],
            "bands": np.full(len(ys), out_c, dtype=np.int64),
            "pred": pa.array([np.ascontiguousarray(p.astype(np.float32)).tobytes() for p in pred],
                             type=pa.binary()),
        })


class PatchScorer:
    """Actor-pool stage for the tile-row input path: patches arrive as
    bytes IN the batch (no full-array object-store broadcast); the model
    is built once per actor."""

    def __init__(self, model_builder: Callable, tile_size: int):
        self.model = model_builder()
        self.ts = tile_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = self.ts
        stack = np.stack([
            np.frombuffer(batch["patch"][i].as_py(),
                          dtype=batch["dtype"][i].as_py()).reshape(
                ts, ts, batch["in_bands"][i].as_py())
            for i in range(batch.num_rows)
        ])
        pred = self.model(stack)
        if pred.ndim == 3:
            pred = pred[..., None]
        out_c = pred.shape[-1]
        return pa.table({
            "grid_id": batch["grid_id"],
            "y0": batch["y0"],
            "x0": batch["x0"],
            "bands": np.full(batch.num_rows, out_c, dtype=np.int64),
            "pred": pa.array([np.ascontiguousarray(p.astype(np.float32)).tobytes()
                              for p in pred], type=pa.binary()),
        })


def predict_dataset(
    arr: np.ndarray,
    model_builder: Callable[[], Callable],
    tile_size: int = 64,
    n_offsets: int = 1,
    border_check: bool = True,
    merge_method: str = "median",
    edge_distance: int = 5,
    batch_size: int = 32,
    concurrency: Optional[int] = None,
):
    """Distributed predict_array. Returns a Dataset of merged output
    tiles (tile_y, tile_x, height, width, bands, data) on the
    tile_size-aligned output grid.

    NOTE: this driver-ndarray form broadcasts the whole input via
    ``ray.put`` — reference-parity convenience, O(image) per actor. At
    raster scale use :func:`predict_tiles`, which streams a tile-row
    Dataset and never materializes the full array anywhere."""
    import ray
    import ray.data as rd

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, _ = arr.shape
    ts = tile_size
    offsets = _prediction_offsets(arr.shape, ts, n_offsets, border_check)
    n_grids = len(offsets)

    meta = []
    for gid, off in enumerate(offsets):
        for (y0, x0) in _grid_patch_positions(arr.shape, ts, off):
            meta.append({"grid_id": gid, "y0": y0, "x0": x0})
    # Split the metadata into ~batch-size blocks so the actor pool gets
    # enough parallel inputs (from_pandas alone yields ONE block).
    patches_ds = rd.from_pandas(pd.DataFrame(meta)).repartition(
        max(2, len(meta) // max(batch_size, 1))
    )

    arr_ref = ray.put(np.ascontiguousarray(arr))
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    ctor = dict(arr_ref=arr_ref, model_builder=model_builder, tile_size=ts)
    scored = patches_ds.map_batches(
        ModelScorer, fn_constructor_kwargs=ctor,
        concurrency=concurrency if concurrency is not None else 2, **kwargs)
    return _assemble_and_merge(scored, ts, h, w, n_grids, merge_method, edge_distance)


def predict_tiles(
    tile_ds,
    model_builder: Callable[[], Callable],
    shape=None,
    tile_size: int = 64,
    n_offsets: int = 1,
    border_check: bool = True,
    merge_method: str = "median",
    edge_distance: int = 5,
    batch_size: int = 32,
    concurrency: Optional[int] = None,
):
    """Tile-row input path (VERDICT r01 item 9): score a raster given as
    the engine's tile-row Dataset (``sources/raster.py``) — NO full-array
    ``ray.put`` anywhere. Each tile extracts the prediction patches whose
    top-left falls in its core (tile cores partition the image under the
    default border strategy, so ownership is unique); patches needing
    neighbour pixels read them from the tile's halo, which must be
    ≥ ``tile_size − 1``. Patch bytes stream to a :class:`PatchScorer`
    actor pool, then through the same piece/merge plan as
    :func:`predict_dataset`. ``shape`` (h, w) is derived from the tile
    metadata columns when not given — that probe PINS the tile Dataset
    (materialize) so the upstream lineage is not executed a second time
    by the extract pass and cannot deadlock against the reserved scoring
    actor pool; at scale, pass ``shape`` explicitly to keep the input
    fully streaming. Scores ONE raster: a multi-raster tile Dataset is
    rejected — upfront by the shape probe when ``shape=None``, and by a
    piece-overlap check in the merge stage on the explicit-``shape``
    path (patch keys carry no raster id, so two rasters' predictions
    would otherwise silently merge)."""
    from buteo_ray.sources.raster import tile_to_ndarray

    ts = tile_size
    if shape is None:
        import pyarrow.compute as pc

        tile_ds = tile_ds.materialize()
        meta = tile_ds.map_batches(
            lambda t: pa.table({
                "h": [pc.max(pc.add(t["y_off"], t["height"])).as_py()],
                "w": [pc.max(pc.add(t["x_off"], t["width"])).as_py()],
                "rid_min": [pc.min(t["raster_id"]).as_py()],
                "rid_max": [pc.max(t["raster_id"]).as_py()],
            }),
            batch_format="pyarrow", batch_size=None).to_pandas()
        h, w = int(meta["h"].max()), int(meta["w"].max())
        if meta["rid_min"].min() != meta["rid_max"].max():
            raise ValueError(
                "predict_tiles scores ONE raster; got multiple raster_id "
                "values — split the Dataset per raster first")
    else:
        h, w = int(shape[0]), int(shape[1])
    offsets = _prediction_offsets((h, w), ts, n_offsets, border_check)
    n_grids = len(offsets)

    def _extract(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("grid_id", "y0", "x0", "in_bands", "dtype", "patch")}
        for i in range(batch.num_rows):
            row = {c: batch[c][i].as_py() for c in batch.column_names}
            halo = row["halo"]
            if halo < ts - 1:
                raise ValueError(
                    f"predict_tiles needs halo >= tile_size-1 ({ts - 1}), got {halo}")
            buf = tile_to_ndarray(row)
            ty0, tx0 = row["y_off"], row["x_off"]
            core_h, core_w = row["height"], row["width"]
            for gid, off in enumerate(offsets):
                # grid positions owned by this tile's core
                ys = [y for y in range(off[0], h - ts + 1, ts) if ty0 <= y < ty0 + core_h]
                xs = [x for x in range(off[1], w - ts + 1, ts) if tx0 <= x < tx0 + core_w]
                for y0 in ys:
                    for x0 in xs:
                        py = y0 - (ty0 - halo)
                        px = x0 - (tx0 - halo)
                        patch = buf[py:py + ts, px:px + ts, :]
                        out["grid_id"].append(gid)
                        out["y0"].append(y0)
                        out["x0"].append(x0)
                        out["in_bands"].append(row["bands"])
                        out["dtype"].append(row["dtype"])
                        out["patch"].append(np.ascontiguousarray(patch).tobytes())
        return pa.table({**{k: out[k] for k in out if k != "patch"},
                         "patch": pa.array(out["patch"], type=pa.binary())})

    patches = tile_ds.map_batches(_extract, batch_format="pyarrow", batch_size=None)
    scored = patches.map_batches(
        PatchScorer,
        fn_constructor_kwargs=dict(model_builder=model_builder, tile_size=ts),
        concurrency=concurrency if concurrency is not None else 2,
        batch_format="pyarrow", batch_size=batch_size)
    return _assemble_and_merge(scored, ts, h, w, n_grids, merge_method, edge_distance)


def _assemble_and_merge(scored, ts: int, h: int, w: int, n_grids: int,
                        merge_method: str, edge_distance: int):
    """Shared back half of both predict paths: split scored patches into
    their ≤4 overlapping output tiles, then per-tile weighted merge."""
    weight_kernel = get_kernel_weights(ts, edge_distance)

    def _to_tiles(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("tile_y", "tile_x", "grid_id", "py", "px",
                               "sy", "sx", "h", "w", "bands", "piece")}
        for i in range(batch.num_rows):
            y0 = batch["y0"][i].as_py()
            x0 = batch["x0"][i].as_py()
            gid = batch["grid_id"][i].as_py()
            bands = batch["bands"][i].as_py()
            pred = np.frombuffer(batch["pred"][i].as_py(), dtype=np.float32).reshape(ts, ts, bands)
            ty0, ty1 = y0 // ts, (y0 + ts - 1) // ts
            tx0, tx1 = x0 // ts, (x0 + ts - 1) // ts
            for tyy in range(ty0, ty1 + 1):
                for txx in range(tx0, tx1 + 1):
                    iy0 = max(y0, tyy * ts)
                    iy1 = min(y0 + ts, (tyy + 1) * ts, h)
                    ix0 = max(x0, txx * ts)
                    ix1 = min(x0 + ts, (txx + 1) * ts, w)
                    if iy1 <= iy0 or ix1 <= ix0:
                        continue
                    piece = pred[iy0 - y0:iy1 - y0, ix0 - x0:ix1 - x0, :]
                    out["tile_y"].append(tyy)
                    out["tile_x"].append(txx)
                    out["grid_id"].append(gid)
                    out["py"].append(iy0 - tyy * ts)   # placement in tile
                    out["px"].append(ix0 - txx * ts)
                    out["sy"].append(iy0 - y0)         # source pos in patch (for weights)
                    out["sx"].append(ix0 - x0)
                    out["h"].append(iy1 - iy0)
                    out["w"].append(ix1 - ix0)
                    out["bands"].append(bands)
                    out["piece"].append(np.ascontiguousarray(piece).tobytes())
        return pa.table({**{k: out[k] for k in out if k != "piece"},
                         "piece": pa.array(out["piece"], type=pa.binary())})

    pieces = scored.map_batches(_to_tiles, batch_format="pyarrow", batch_size=None)

    merge_fn = MERGE_METHODS[merge_method]

    def _merge_tile(g: pd.DataFrame) -> pd.DataFrame:
        tyy = int(g["tile_y"].iloc[0])
        txx = int(g["tile_x"].iloc[0])
        bands = int(g["bands"].iloc[0])
        th = min(ts, h - tyy * ts)
        tw = min(ts, w - txx * ts)
        stack = np.full((n_grids, th, tw, bands), np.nan, dtype=np.float32)
        wstack = np.zeros((n_grids, th, tw, 1), dtype=np.float32)
        covered = np.zeros((n_grids, th, tw), dtype=bool)
        for row in g.itertuples(index=False):
            piece = np.frombuffer(row.piece, dtype=np.float32).reshape(row.h, row.w, bands)
            tgt = covered[row.grid_id, row.py:row.py + row.h, row.px:row.px + row.w]
            if tgt.any():
                # One raster's grid positions step by tile_size, so pieces
                # within a grid never overlap — a collision means TWO
                # rasters' patches landed in one output keyspace (the
                # explicit-shape path has no upfront raster_id probe).
                raise ValueError(
                    "overlapping prediction pieces in one merge group — "
                    "predict_tiles scores ONE raster; split the tile "
                    "Dataset per raster_id first")
            tgt[:] = True
            stack[row.grid_id, row.py:row.py + row.h, row.px:row.px + row.w, :] = piece
            wpiece = weight_kernel[row.sy:row.sy + row.h, row.sx:row.sx + row.w]
            wstack[row.grid_id, row.py:row.py + row.h, row.px:row.px + row.w, 0] = wpiece
        merged = merge_fn(stack, wstack)
        return pd.DataFrame({
            "tile_y": [tyy], "tile_x": [txx], "height": [th], "width": [tw],
            "bands": [bands], "data": [np.ascontiguousarray(merged).tobytes()],
        })

    return pieces.groupby(["tile_y", "tile_x"]).map_groups(_merge_tile, batch_format="pandas")


def predicted_tiles_to_array(tiles_df: pd.DataFrame, shape) -> np.ndarray:
    """Assemble merged tiles into one array (test/export helper)."""
    h, w = shape[0], shape[1]
    bands = int(tiles_df["bands"].iloc[0])
    out = np.full((h, w, bands), np.nan, dtype=np.float32)
    ts = max(int(tiles_df["height"].max()), int(tiles_df["width"].max()))
    for _, row in tiles_df.iterrows():
        block = np.frombuffer(row["data"], dtype=np.float32).reshape(row["height"], row["width"], bands)
        out[row["tile_y"] * ts:row["tile_y"] * ts + row["height"],
            row["tile_x"] * ts:row["tile_x"] * ts + row["width"], :] = block
    return out


def predict_array_pixel(arr: np.ndarray, callback: Callable) -> np.ndarray:
    """Per-pixel model scoring of one (H, W, C) array: flatten to
    (H·W, C), score, reshape to (H, W, C_out) (≙ ``predict_array_pixel``,
    reference array/patches/prediction.py:189-209)."""
    if arr.ndim != 3:
        raise ValueError("Array must be 3D")
    flat = arr.reshape((arr.shape[0] * arr.shape[1], arr.shape[2]))
    pred = callback(flat)
    if pred.ndim == 1:
        pred = pred[:, None]
    return pred.reshape((arr.shape[0], arr.shape[1], pred.shape[-1]))


class PixelScorer:
    """Actor-pool stage: per-pixel model scoring over tile rows. The
    model is built once per actor (``__init__``); each tile's pixels are
    scored as one (h·w, C) batch — no patch extraction or merge kernel
    needed because a pixel model has no spatial receptive field, so
    tiles never interact and the stage is embarrassingly parallel."""

    def __init__(self, model_builder: Callable):
        self.model = model_builder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from buteo_ray.sources.raster import tile_to_ndarray

        pdf = batch.to_pandas()
        new_data, new_dtype, new_bands = [], [], []
        for _, row in pdf.iterrows():
            arr = tile_to_ndarray(row)
            out = predict_array_pixel(arr, self.model).astype(np.float32)
            new_data.append(np.ascontiguousarray(out).tobytes())
            new_dtype.append(str(out.dtype))
            new_bands.append(out.shape[2])
        pdf["data"] = new_data
        pdf["dtype"] = new_dtype
        pdf["bands"] = new_bands
        return pa.Table.from_pandas(pdf, preserve_index=False)


def predict_dataset_pixel(ds, model_builder: Callable, concurrency: int = 4):
    """Distributed per-pixel scoring over a tile-row Dataset."""
    return ds.map_batches(PixelScorer, fn_constructor_args=(model_builder,),
                          batch_format="pyarrow", batch_size=None,
                          concurrency=concurrency)


def predict_array_local(
    arr: np.ndarray,
    callback: Callable,
    tile_size: int = 64,
    n_offsets: int = 1,
    border_check: bool = True,
    merge_method: str = "median",
    edge_distance: int = 5,
) -> np.ndarray:
    """Single-process reference-parity oracle: the exact plan of
    ``prediction.py:102-186`` (per-grid stitch into NaN accumulators,
    then weighted merge) using this package's kernels."""
    from buteo_ray.functions.array_patches import (
        array_to_patches_single,
        patches_to_array_single,
    )

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, _ = arr.shape
    offsets = _prediction_offsets(arr.shape, tile_size, n_offsets, border_check)

    first = callback(array_to_patches_single(arr, tile_size, offsets[0])[:1])
    out_c = first.shape[-1] if first.ndim == 4 else 1

    stack = np.full((len(offsets), h, w, out_c), np.nan, dtype=np.float32)
    wstack = np.zeros((len(offsets), h, w, 1), dtype=np.float32)
    kernel = get_kernel_weights(tile_size, edge_distance)

    for gid, off in enumerate(offsets):
        patches = array_to_patches_single(arr, tile_size, off)
        pred = callback(patches)
        if pred.ndim == 3:
            pred = pred[..., None]
        stack[gid] = patches_to_array_single(pred.astype(np.float32), (h, w, out_c), tile_size, off)
        wpatches = np.repeat(kernel[None, :, :, None], patches.shape[0], axis=0)
        wgrid = patches_to_array_single(wpatches, (h, w, 1), tile_size, off, background_value=0.0)
        wstack[gid] = wgrid

    return MERGE_METHODS[merge_method](stack, wstack)
