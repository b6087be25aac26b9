"""Warp/align and raster vectorize."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.functions.vectorize import label_regions, vectorize_array
from buteo_ray.functions.warp import align_rasters, find_best_reference, warp_array


def test_warp_identity():
    arr = np.arange(24, dtype=np.float64).reshape(4, 6)
    gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    out = warp_array(arr, gt, gt, (4, 6), method="nearest")
    np.testing.assert_array_equal(out[:, :, 0], arr)
    out_b = warp_array(arr, gt, gt, (4, 6), method="bilinear")
    np.testing.assert_allclose(out_b[:, :, 0], arr)


def test_warp_shift_and_nodata():
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    # Target shifted 1 px east: column j of target = column j+1 of source.
    gt2 = [1.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    out = warp_array(arr, gt, gt2, (4, 4), method="nearest", nodata=-1.0)
    np.testing.assert_array_equal(out[:, :3, 0], arr[:, 1:])
    assert (out[:, 3, 0] == -1.0).all()  # beyond source → nodata


def test_warp_downscale():
    arr = np.ones((8, 8), dtype=np.float64)
    gt = [0.0, 1.0, 0.0, 8.0, 0.0, -1.0]
    gt2 = [0.0, 2.0, 0.0, 8.0, 0.0, -2.0]  # 2x coarser
    out = warp_array(arr, gt, gt2, (4, 4), method="bilinear")
    np.testing.assert_allclose(out[:, :, 0], 1.0)


def test_find_best_reference():
    gts = [
        [0.0, 1.0, 0.0, 10.0, 0.0, -1.0],    # overlaps both others
        [5.0, 1.0, 0.0, 10.0, 0.0, -1.0],    # overlaps 0
        [100.0, 1.0, 0.0, 10.0, 0.0, -1.0],  # disjoint
    ]
    shapes = [(10, 10), (10, 10), (10, 10)]
    assert find_best_reference(gts, shapes) == 0


def test_align_rasters_intersection():
    a = np.arange(100, dtype=np.float64).reshape(10, 10)
    b = np.arange(100, dtype=np.float64).reshape(10, 10) + 1000
    gt_a = [0.0, 1.0, 0.0, 10.0, 0.0, -1.0]   # [0,10]x[0,10]
    gt_b = [5.0, 1.0, 0.0, 10.0, 0.0, -1.0]   # [5,15]x[0,10]
    (oa, ob), dst_gt = align_rasters([a, b], [gt_a, gt_b], method="intersection",
                                     reference_index=0)
    assert oa.shape == ob.shape == (10, 5, 1)
    # Overlap = x in [5,10]: a columns 5..9, b columns 0..4.
    np.testing.assert_array_equal(oa[:, :, 0], a[:, 5:])
    np.testing.assert_array_equal(ob[:, :, 0], b[:, :5])
    assert dst_gt[0] == 5.0


def test_align_rasters_union():
    a = np.ones((4, 4))
    b = np.full((4, 4), 2.0)
    gt_a = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    gt_b = [2.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    (oa, ob), dst_gt = align_rasters([a, b], [gt_a, gt_b], method="union",
                                     reference_index=0, nodata=-9.0)
    assert oa.shape == (4, 6, 1)
    assert (oa[:, :4, 0] == 1.0).all() and (oa[:, 4:, 0] == -9.0).all()
    assert (ob[:, 2:, 0] == 2.0).all() and (ob[:, :2, 0] == -9.0).all()


# ------------------------------------------------------------- vectorize

def test_label_regions():
    arr = np.array([
        [1, 1, 2, 2],
        [1, 3, 3, 2],
        [4, 4, 3, 2],
    ])
    labels = label_regions(arr)
    assert labels[0, 0] == labels[0, 1] == labels[1, 0]
    assert labels[0, 2] == labels[0, 3] == labels[1, 3] == labels[2, 3]
    assert labels[1, 1] == labels[1, 2] == labels[2, 2]
    assert labels[2, 0] == labels[2, 1]
    assert len(np.unique(labels)) == 4


def test_label_regions_diagonal_not_connected():
    arr = np.array([[1, 0], [0, 1]])
    labels = label_regions(arr)
    assert labels[0, 0] != labels[1, 1]  # 4-connectivity only


def test_label_regions_nodata():
    arr = np.array([[1.0, -9.0], [1.0, 1.0]])
    labels = label_regions(arr, nodata=-9.0)
    assert labels[0, 1] == -1
    assert labels[0, 0] == labels[1, 0] == labels[1, 1]


def test_vectorize_array():
    arr = np.array([
        [5, 5, 0],
        [5, 0, 0],
        [9, 9, 9],
    ], dtype=np.float64)
    out = vectorize_array(arr, nodata=0.0)
    assert len(out) == 2
    five = out[out["value"] == 5.0].iloc[0]
    assert five["n_pixels"] == 3
    assert (five["bbox_xmin"], five["bbox_xmax"]) == (0.0, 2.0)
    nine = out[out["value"] == 9.0].iloc[0]
    assert nine["n_pixels"] == 3 and nine["bbox_ymin"] == 2.0


def test_raster_vectorize_cross_tile(ray_session):
    from buteo_ray.functions.vectorize import raster_vectorize
    from buteo_ray.sources.raster import raster_from_array

    # A value-7 stripe spanning two tiles; background 0 = nodata.
    arr = np.zeros((8, 16), dtype=np.float64)
    arr[3, :] = 7.0
    ds = raster_from_array(arr, tile_size=8)
    out = raster_vectorize(ds, nodata=0.0).to_pandas()
    row = out[out["value"] == 7.0].iloc[0]
    assert row["n_pixels"] == 16
    assert row["n_parts"] == 2  # one region per tile, dissolved
    assert (row["bbox_xmin"], row["bbox_xmax"]) == (0.0, 16.0)


def test_mask_outlines_exact():
    """Exact cell outlines (VERDICT r01 missing #5): boundary tracing +
    hole nesting; invariant — outline area == pixel count."""
    from buteo_ray.functions.vectorize import mask_outlines
    from buteo_ray.geom.boolean import union_area

    plus = np.zeros((5, 5), dtype=bool)
    plus[2, :] = True
    plus[:, 2] = True
    polys = mask_outlines(plus)
    assert len(polys) == 1
    assert union_area(polys) == 9.0
    # 12-segment staircase outline, not a bbox
    assert len(polys[0][0]) == 13  # closed ring: 12 corners + repeat

    ring_mask = np.ones((4, 4), dtype=bool)
    ring_mask[1:3, 1:3] = False
    polys2 = mask_outlines(ring_mask)
    assert len(polys2) == 1 and len(polys2[0]) == 2  # exterior + hole
    assert union_area(polys2) == 12.0

    rng = np.random.default_rng(0)
    rnd = rng.random((16, 16)) > 0.5
    assert union_area(mask_outlines(rnd)) == float(rnd.sum())


def test_vectorize_array_exact_geometry():
    from buteo_ray.functions.vectorize import vectorize_array
    from buteo_ray.geom.boolean import union_area
    from buteo_ray.geom.wkb import parse_wkb

    arr = np.array([[1, 1, 2], [1, 2, 2], [3, 3, 2]], dtype=float)
    df = vectorize_array(arr, x_off=10, y_off=20)
    assert len(df) == 3
    for r in df.itertuples():
        kind, payload = parse_wkb(r.geom_wkb)
        polys = [payload] if kind == "polygon" else payload
        assert union_area(polys) == pytest.approx(r.n_pixels)
        # offsets applied: all coords within the offset bbox
        v = np.vstack([rr for p in polys for rr in p])
        assert v[:, 0].min() >= 10 and v[:, 1].min() >= 20


def test_raster_vectorize_exact_cross_tile(ray_session):
    """Cross-tile exact union: a region spanning tiles welds into one
    polygon whose area equals its pixel count."""
    from buteo_ray.functions.vectorize import raster_vectorize
    from buteo_ray.geom.boolean import union_area
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.sources.raster import raster_from_array

    arr = np.zeros((16, 16))
    arr[6:10, :] = 7.0      # horizontal band crossing both tile columns
    ds = raster_from_array(arr, tile_size=8)
    out = raster_vectorize(ds, exact_geometry=True).to_pandas()
    band = out[out["value"] == 7.0].iloc[0]
    kind, payload = parse_wkb(band["geom_wkb"])
    polys = [payload] if kind == "polygon" else payload
    assert len(polys) == 1          # welded across the tile boundary
    assert union_area(polys) == pytest.approx(band["n_pixels"]) == 64.0
