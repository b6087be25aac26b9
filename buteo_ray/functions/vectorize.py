"""Raster → vector: connected same-value regions → polygons (the
``gdal.Polygonize`` capability; reference ``raster/vectorize.py:25-161``).

``label_regions`` is a pure-numpy 4-connected labeling (iterative
min-label propagation — no scipy). ``vectorize_array`` emits one region
row per connected component: value, pixel count, bbox and the bbox ring
as WKB (exact boundary tracing deferred; the reference emits exact cell
outlines — documented v1 divergence). The Dataset form runs per tile
with a ``groupby(value)`` tile-edge dissolve pass merging regions that
touch across tile borders into per-value multipolygons (SURVEY.md §2.6
"per-tile with tile-edge dissolve").
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from buteo_ray.geom.wkb import wkb_polygon


def label_regions(arr: np.ndarray, nodata: Optional[float] = None) -> np.ndarray:
    """4-connected component labels of equal-valued cells. Returns int64
    labels (−1 for nodata). Iterative min-propagation: O(diameter)
    vectorized passes."""
    arr = np.asarray(arr)
    h, w = arr.shape
    if h == 0 or w == 0:
        return np.full((h, w), -1, dtype=np.int64)
    labels = np.arange(h * w, dtype=np.int64).reshape(h, w)
    valid = np.ones((h, w), dtype=bool)
    if nodata is not None:
        valid = arr != nodata
        if np.issubdtype(arr.dtype, np.floating):
            valid &= ~np.isnan(arr)
    labels[~valid] = -1

    while True:
        new = labels.copy()
        # Propagate the min label from each 4-neighbour with equal value.
        for (sy, sx) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted_l = np.roll(labels, (sy, sx), axis=(0, 1))
            shifted_v = np.roll(arr, (sy, sx), axis=(0, 1))
            ok = (shifted_v == arr) & valid & (shifted_l >= 0)
            # Mask the wrap-around rows/cols.
            if sy == 1:
                ok[0, :] = False
            elif sy == -1:
                ok[-1, :] = False
            if sx == 1:
                ok[:, 0] = False
            elif sx == -1:
                ok[:, -1] = False
            new = np.where(ok & (shifted_l < new), shifted_l, new)
        if (new == labels).all():
            break
        labels = new

    # Compact labels to 0..k-1.
    flat = labels.ravel()
    uniq = np.unique(flat[flat >= 0])
    remap = np.full(int(flat.max()) + 1 if flat.max() >= 0 else 1, -1, dtype=np.int64)
    remap[uniq] = np.arange(uniq.shape[0])
    out = np.where(flat >= 0, remap[np.maximum(flat, 0)], -1).reshape(h, w)
    return out


def vectorize_array(arr: np.ndarray, nodata: Optional[float] = None,
                    x_off: int = 0, y_off: int = 0) -> pd.DataFrame:
    """One row per connected region: value, n_pixels, bbox (pixel
    coords, offset by (x_off, y_off)), geom_wkb = bbox ring."""
    labels = label_regions(arr, nodata)
    flat_l = labels.ravel()
    keep = flat_l >= 0 if flat_l.size else np.zeros(0, dtype=bool)
    if not keep.any():
        return pd.DataFrame({"region_id": [], "value": [], "n_pixels": [],
                             "bbox_xmin": [], "bbox_xmax": [],
                             "bbox_ymin": [], "bbox_ymax": [], "geom_wkb": []})
    h, w = labels.shape
    yy, xx = np.divmod(np.arange(h * w)[keep], w)
    ll = flat_l[keep]
    vv = arr.ravel()[keep]
    order = np.argsort(ll, kind="stable")
    ll, yy, xx, vv = ll[order], yy[order], xx[order], vv[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(ll))[0] + 1, [ll.shape[0]]])
    rows = []
    for i in range(len(starts) - 1):
        s, e = starts[i], starts[i + 1]
        x0, x1 = xx[s:e].min() + x_off, xx[s:e].max() + x_off + 1
        y0, y1 = yy[s:e].min() + y_off, yy[s:e].max() + y_off + 1
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)
        rows.append({
            "region_id": int(ll[s]), "value": float(vv[s]), "n_pixels": int(e - s),
            "bbox_xmin": float(x0), "bbox_xmax": float(x1),
            "bbox_ymin": float(y0), "bbox_ymax": float(y1),
            "geom_wkb": wkb_polygon([ring]),
        })
    return pd.DataFrame(rows)


def raster_vectorize(tile_ds, nodata: Optional[float] = None):
    """Tile-row Dataset → region Dataset: per-tile vectorize, then a
    per-value dissolve merging touching cross-tile regions into one row
    (value, n_pixels, bbox hull, n_parts)."""
    import pyarrow as pa

    from buteo_ray.sources.raster import tile_to_ndarray

    def _per_tile(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        out = []
        for _, row in pdf.iterrows():
            arr = tile_to_ndarray(row)[:, :, 0]
            halo = row["halo"]
            if halo:
                arr = arr[halo:-halo or None, halo:-halo or None]
            regions = vectorize_array(arr, nodata, x_off=row["x_off"], y_off=row["y_off"])
            out.append(regions)
        res = pd.concat(out, ignore_index=True) if out else vectorize_array(np.zeros((0, 0)))
        return pa.Table.from_pandas(res[["value", "n_pixels", "bbox_xmin", "bbox_xmax",
                                         "bbox_ymin", "bbox_ymax"]], preserve_index=False)

    def _dissolve(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "value": [g["value"].iloc[0]],
            "n_pixels": [int(g["n_pixels"].sum())],
            "bbox_xmin": [g["bbox_xmin"].min()],
            "bbox_xmax": [g["bbox_xmax"].max()],
            "bbox_ymin": [g["bbox_ymin"].min()],
            "bbox_ymax": [g["bbox_ymax"].max()],
            "n_parts": [len(g)],
        })

    per_tile = tile_ds.map_batches(_per_tile, batch_format="pyarrow", batch_size=None)
    return per_tile.groupby("value").map_groups(_dissolve, batch_format="pandas")
