"""Raster → vector: connected same-value regions → polygons (the
``gdal.Polygonize`` capability; reference ``raster/vectorize.py:25-161``).

``label_regions`` is a pure-numpy 4-connected labeling (iterative
min-label propagation — no scipy). ``vectorize_array`` emits one region
row per connected component: value, pixel count, bbox and the EXACT
cell-outline geometry (``mask_outlines``: boundary-edge stitching with
hole nesting — reference-parity gdal.Polygonize geometry; ``exact=False``
falls back to the cheap bbox ring). The Dataset form runs per tile with
a ``groupby(value)`` tile-edge dissolve pass merging regions that touch
across tile borders (SURVEY.md §2.6 "per-tile with tile-edge dissolve");
``exact_geometry=True`` unions the per-tile outlines into one exact
multipolygon per value via the boolean-overlay engine.
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


def mask_outlines(mask: np.ndarray, x_off: float = 0.0, y_off: float = 0.0):
    """EXACT cell outlines of a boolean pixel mask (``gdal.Polygonize``
    geometry; reference raster/vectorize.py:25-161): boundary pixel
    edges oriented interior-left, stitched into closed rings with the
    boolean-overlay walker, holes nested. Returns a list of polygons
    (each ``[exterior, hole, ...]``; exteriors CCW in y-down pixel
    space). Coordinates are pixel corners offset by (x_off, y_off)."""
    from buteo_ray.geom.boolean import _nest_rings, _stitch_rings

    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    if not mask.any():
        return []
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = mask
    segs_a, segs_b = [], []
    ii, jj = np.nonzero(mask & ~pad[:-2, 1:-1])   # open above → top edge
    segs_a.append(np.column_stack([jj, ii]))
    segs_b.append(np.column_stack([jj + 1, ii]))
    ii, jj = np.nonzero(mask & ~pad[1:-1, 2:])    # open right
    segs_a.append(np.column_stack([jj + 1, ii]))
    segs_b.append(np.column_stack([jj + 1, ii + 1]))
    ii, jj = np.nonzero(mask & ~pad[2:, 1:-1])    # open below
    segs_a.append(np.column_stack([jj + 1, ii + 1]))
    segs_b.append(np.column_stack([jj, ii + 1]))
    ii, jj = np.nonzero(mask & ~pad[1:-1, :-2])   # open left
    segs_a.append(np.column_stack([jj, ii + 1]))
    segs_b.append(np.column_stack([jj, ii]))
    P0 = np.vstack(segs_a).astype(np.float64)
    P1 = np.vstack(segs_b).astype(np.float64)
    P0[:, 0] += x_off
    P1[:, 0] += x_off
    P0[:, 1] += y_off
    P1[:, 1] += y_off
    rings = _stitch_rings(P0, P1, 0.25)

    def _merge_collinear(ring: np.ndarray) -> np.ndarray:
        pts = ring[:-1]
        inc = pts - np.roll(pts, 1, axis=0)
        out = np.roll(pts, -1, axis=0) - pts
        corner = (inc[:, 0] * out[:, 1] - inc[:, 1] * out[:, 0]) != 0
        kept = pts[corner]
        return np.vstack([kept, kept[:1]])

    return _nest_rings([_merge_collinear(r) for r in rings])


def vectorize_array(arr: np.ndarray, nodata: Optional[float] = None,
                    x_off: int = 0, y_off: int = 0,
                    exact: bool = True) -> pd.DataFrame:
    """One row per connected region: value, n_pixels, bbox (pixel
    coords, offset by (x_off, y_off)), geom_wkb = exact cell outline
    (polygon/multipolygon with holes) when ``exact``, else the bbox
    ring (the cheap v1 geometry)."""
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
        lx0, lx1 = int(xx[s:e].min()), int(xx[s:e].max()) + 1
        ly0, ly1 = int(yy[s:e].min()), int(yy[s:e].max()) + 1
        x0, x1 = lx0 + x_off, lx1 + x_off
        y0, y1 = ly0 + y_off, ly1 + y_off
        if exact:
            # Outline only this region's pixels, cropped to its bbox.
            sub = np.zeros((ly1 - ly0, lx1 - lx0), dtype=bool)
            sub[yy[s:e] - ly0, xx[s:e] - lx0] = True
            polys = mask_outlines(sub, x_off=x0, y_off=y0)
            from buteo_ray.geom.wkb import wkb_multipolygon

            geom = (wkb_polygon(polys[0]) if len(polys) == 1
                    else wkb_multipolygon(polys))
        else:
            ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                            dtype=np.float64)
            geom = wkb_polygon([ring])
        rows.append({
            "region_id": int(ll[s]), "value": float(vv[s]), "n_pixels": int(e - s),
            "bbox_xmin": float(x0), "bbox_xmax": float(x1),
            "bbox_ymin": float(y0), "bbox_ymax": float(y1),
            "geom_wkb": geom,
        })
    return pd.DataFrame(rows)


def raster_vectorize(tile_ds, nodata: Optional[float] = None,
                     exact_geometry: bool = False):
    """Tile-row Dataset → region Dataset: per-tile vectorize, then a
    per-value dissolve merging touching cross-tile regions into one row
    (value, n_pixels, bbox hull, n_parts). With ``exact_geometry`` the
    per-tile exact outlines are unioned into one exact multipolygon per
    value (tile pieces share edges, so the boolean union welds them)."""
    import pyarrow as pa

    from buteo_ray.sources.raster import tile_to_ndarray

    cols = ["value", "n_pixels", "bbox_xmin", "bbox_xmax", "bbox_ymin", "bbox_ymax"]
    if exact_geometry:
        cols = cols + ["geom_wkb"]

    def _per_tile(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        out = []
        for _, row in pdf.iterrows():
            arr = tile_to_ndarray(row)[:, :, 0]
            halo = row["halo"]
            if halo:
                arr = arr[halo:-halo or None, halo:-halo or None]
            regions = vectorize_array(arr, nodata, x_off=row["x_off"],
                                      y_off=row["y_off"], exact=exact_geometry)
            out.append(regions)
        res = pd.concat(out, ignore_index=True) if out else vectorize_array(np.zeros((0, 0)))
        return pa.Table.from_pandas(res[cols], preserve_index=False)

    def _dissolve(g: pd.DataFrame) -> pd.DataFrame:
        out = {
            "value": [g["value"].iloc[0]],
            "n_pixels": [int(g["n_pixels"].sum())],
            "bbox_xmin": [g["bbox_xmin"].min()],
            "bbox_xmax": [g["bbox_xmax"].max()],
            "bbox_ymin": [g["bbox_ymin"].min()],
            "bbox_ymax": [g["bbox_ymax"].max()],
            "n_parts": [len(g)],
        }
        if exact_geometry:
            from buteo_ray.geom.boolean import polygon_union
            from buteo_ray.geom.wkb import parse_wkb, wkb_multipolygon

            polys = []
            for w in g["geom_wkb"]:
                kind, payload = parse_wkb(w)
                polys.extend([payload] if kind == "polygon" else payload)
            # Balanced pairwise merge tree (union is associative): leaf
            # calls see ≤64 polygons and merge levels halve the part
            # count, so disjoint-heavy groups stay O(E² log K) instead of
            # the O(K³) of re-feeding one growing accumulator.
            parts = [polygon_union(polys[i:i + 64])
                     for i in range(0, len(polys), 64)]
            while len(parts) > 1:
                parts = [polygon_union(parts[i] + parts[i + 1])
                         if i + 1 < len(parts) else parts[i]
                         for i in range(0, len(parts), 2)]
            u = parts[0] if parts else []
            out["geom_wkb"] = [wkb_polygon(u[0]) if len(u) == 1
                               else wkb_multipolygon(u)]
        return pd.DataFrame(out)

    per_tile = tile_ds.map_batches(_per_tile, batch_format="pyarrow", batch_size=None)
    return per_tile.groupby("value").map_groups(_dissolve, batch_format="pandas")
