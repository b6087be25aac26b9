"""Warp / align: resample rasters onto a target grid — the engine's
``gdal.Warp`` replacement (reference ``raster/align.py:39-498``,
``raster/reproject.py``, ``raster/warp.py:23-118``).

``warp_array`` is the per-tile kernel: inverse mapping from target pixel
centers to source pixel coordinates (affine grids only, optional CRS
change via ``grid/projection.py``), nearest or bilinear sampling,
out-of-source pixels → nodata. ``align_rasters`` reproduces the
reference's alignment plan: pick the reference grid (explicit /
best-reference search by max-intersections-then-area, ``align.py:
216-381``), snap target bounds (bit-exact ``align_bbox_to_pixel_size``),
warp every input.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from buteo_ray.grid.bbox import (
    bboxes_intersect,
    get_bbox_from_geotransform,
    get_pixel_offsets,
    intersection_bboxes,
    union_bboxes,
)
from buteo_ray.grid.projection import reproject_points

GeoTransform = Sequence[float]


def warp_array(
    src: np.ndarray,
    src_gt: GeoTransform,
    dst_gt: GeoTransform,
    dst_shape: Tuple[int, int],
    method: str = "nearest",
    nodata: float = np.nan,
    src_crs: Optional[str] = None,
    dst_crs: Optional[str] = None,
) -> np.ndarray:
    """Resample ``src`` onto the grid (dst_gt, dst_shape). Channel-last."""
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    dh, dw = dst_shape

    # Target pixel centers in target map coordinates.
    xs = dst_gt[0] + (np.arange(dw) + 0.5) * dst_gt[1]
    ys = dst_gt[3] + (np.arange(dh) + 0.5) * dst_gt[5]
    gx, gy = np.meshgrid(xs, ys)

    if src_crs and dst_crs and src_crs != dst_crs:
        gx, gy = reproject_points(gx.ravel(), gy.ravel(), dst_crs, src_crs)
        gx = gx.reshape(dh, dw)
        gy = gy.reshape(dh, dw)

    # Map coordinates → fractional source pixel indices.
    fx = (gx - src_gt[0]) / src_gt[1] - 0.5
    fy = (gy - src_gt[3]) / src_gt[5] - 0.5

    out = np.full((dh, dw, c), nodata, dtype=np.float64)

    if method == "nearest":
        ix = np.rint(fx).astype(np.int64)
        iy = np.rint(fy).astype(np.int64)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out[valid] = src[iy[valid], ix[valid], :]
    elif method == "bilinear":
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        tx = fx - x0
        ty = fy - y0
        # EXACTLY the nearest path's acceptance set (rint half-to-even,
        # index in range) — a half-open fx < w-0.5 rule disagrees with
        # rint at exact half-pixel boundaries depending on parity, so
        # nearest- and bilinear-warped tiles would disagree on footprint.
        # Accepting x0 >= -1 instead would fabricate edge-replicated
        # values in a half-pixel ring where GDAL writes nodata.
        rx = np.rint(fx)
        ry = np.rint(fy)
        valid = (rx >= 0) & (rx < w) & (ry >= 0) & (ry < h)
        x0c = np.clip(x0, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        a = src[y0c, x0c, :]
        b = src[y0c, x1c, :]
        cc = src[y1c, x0c, :]
        d = src[y1c, x1c, :]
        txe = tx[..., None]
        tye = ty[..., None]
        interp = (a * (1 - tye) * (1 - txe) + b * (1 - tye) * txe
                  + cc * tye * (1 - txe) + d * tye * txe)
        out[valid] = interp[valid]
    else:
        raise ValueError("method must be nearest or bilinear")
    return out


def find_best_reference(geotransforms: List[GeoTransform],
                        shapes: List[Tuple[int, int]]) -> int:
    """Argmax over (number of intersections, intersection area) —
    reference ``raster/align.py:216-381`` (``_raster_find_best_align_
    reference``) semantics."""
    bboxes = [get_bbox_from_geotransform(gt, s[1], s[0])
              for gt, s in zip(geotransforms, shapes)]
    best_idx, best_score = 0, (-1, -1.0)
    for i, bi in enumerate(bboxes):
        n, area = 0, 0.0
        for j, bj in enumerate(bboxes):
            if i == j or not bboxes_intersect(bi, bj):
                continue
            n += 1
            ib = intersection_bboxes(bi, bj)
            area += (ib[1] - ib[0]) * (ib[3] - ib[2])
        if (n, area) > best_score:
            best_score, best_idx = (n, area), i
    return best_idx


def align_rasters(
    arrays: List[np.ndarray],
    geotransforms: List[GeoTransform],
    method: str = "reference",
    reference_index: Optional[int] = None,
    resample: str = "nearest",
    nodata: float = np.nan,
) -> Tuple[List[np.ndarray], GeoTransform]:
    """Align rasters onto a common grid (reference ``raster_align``,
    align.py:384-498). ``method``: 'reference' (a chosen/auto input
    grid), 'intersection' (common overlap), 'union' (hull). Returns
    (aligned arrays, target geotransform); all outputs share one shape.
    """
    shapes = [(a.shape[0], a.shape[1]) for a in arrays]
    bboxes = [get_bbox_from_geotransform(gt, s[1], s[0])
              for gt, s in zip(geotransforms, shapes)]
    ref_i = reference_index if reference_index is not None else find_best_reference(geotransforms, shapes)
    ref_gt = list(geotransforms[ref_i])

    if method == "reference":
        target_bbox = bboxes[ref_i]
    elif method == "intersection":
        target_bbox = bboxes[0]
        for b in bboxes[1:]:
            target_bbox = intersection_bboxes(target_bbox, b)
    elif method == "union":
        target_bbox = bboxes[0]
        for b in bboxes[1:]:
            target_bbox = union_bboxes(target_bbox, b)
    else:
        raise ValueError("method must be reference|intersection|union")

    # Snap the target bounds onto the reference pixel grid, then derive
    # the output size via the reference's pixel-offset arithmetic.
    from buteo_ray.grid.bbox import align_bbox_to_pixel_size

    snapped = align_bbox_to_pixel_size(bboxes[ref_i], target_bbox, ref_gt[1], ref_gt[5])
    _, _, dw, dh = get_pixel_offsets(ref_gt, snapped)
    dst_gt = [snapped[0], ref_gt[1], 0.0, snapped[3], 0.0, ref_gt[5]]

    out = [warp_array(a, gt, dst_gt, (dh, dw), method=resample, nodata=nodata)
           for a, gt in zip(arrays, geotransforms)]
    return out, dst_gt
