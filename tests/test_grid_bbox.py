"""bbox/geotransform algebra — exact cases from the reference doctests
(FIXTURES.md §5; /root/reference/buteo/bbox/operations.py)."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from buteo_ray.grid import (
    align_bbox_to_pixel_size,
    bbox_aspect_ratio,
    bbox_center,
    bbox_contains_point,
    bbox_from_points,
    buffer_bbox,
    gdal_bbox_from_ogr_bbox,
    get_bbox_from_geotransform,
    get_geotransform_from_bbox,
    get_pixel_offsets,
    intersection_bboxes,
    ogr_bbox_from_gdal_bbox,
    union_bboxes,
)


def test_pixel_offsets_doctest():
    assert get_pixel_offsets([0.0, 1.0, 0.0, 10.0, 0.0, -1.0], [2.0, 4.0, 4.0, 8.0]) == (2, 2, 2, 4)


def test_pixel_offsets_zero_pixel_raises():
    with pytest.raises(ValueError):
        get_pixel_offsets([0.0, 0.0, 0.0, 10.0, 0.0, -1.0], [2.0, 4.0, 4.0, 8.0])


def test_bbox_from_geotransform_doctests():
    gt = [0.0, 1.0, 0.0, 10.0, 0.0, -1.0]
    assert get_bbox_from_geotransform(gt, 5, 5) == [0.0, 5.0, 5.0, 10.0]
    assert get_bbox_from_geotransform(gt, 100, 200) == [0.0, 100.0, -190.0, 10.0]
    assert get_bbox_from_geotransform(gt, 0, 0) == [0.0, 0.0, 10.0, 10.0]
    with pytest.raises(ValueError):
        get_bbox_from_geotransform(gt, -5, 5)


def test_intersection_doctests():
    assert intersection_bboxes([0, 2, 0, 2], [1, 3, 1, 3]) == [1.0, 2.0, 1.0, 2.0]
    assert intersection_bboxes([0, 1, 0, 1], [1, 2, 1, 2]) == [1.0, 1.0, 1.0, 1.0]
    with pytest.raises(ValueError):
        intersection_bboxes([0, 1, 0, 1], [2, 3, 2, 3])


def test_union_doctests():
    assert union_bboxes([0, 1, 0, 1], [1, 2, 1, 2]) == [0.0, 2.0, 0.0, 2.0]
    assert union_bboxes([-10, 0, -10, 0], [0, 10, 0, 10]) == [-10.0, 10.0, -10.0, 10.0]


def test_align_snap_doctest():
    assert align_bbox_to_pixel_size([0.0, 4.0, 0.0, 4.0], [1.2, 3.7, 1.2, 3.7], 1.0, -1.0) == [1.0, 4.0, 1.0, 4.0]
    assert align_bbox_to_pixel_size([0.0, 4.0, 0.0, 4.0], [1.2, 3.7, 1.2, 3.7], 0.5, -0.5) == [1.0, 4.0, 1.0, 4.0]
    with pytest.raises(ValueError):
        align_bbox_to_pixel_size([0.0, 4.0, 0.0, 4.0], [1.2, 3.7, 1.2, 3.7], 0.0, -1.0)


def test_geotransform_from_bbox_doctests():
    assert get_geotransform_from_bbox([0.0, 100.0, 50.0, 150.0], 100, 100) == [0.0, 1.0, 0.0, 150.0, 0.0, -1.0]
    assert get_geotransform_from_bbox([0.0, 100.0, 50.0, 150.0], 200, 50) == [0.0, 0.5, 0.0, 150.0, 0.0, -2.0]
    with pytest.raises(ValueError):
        get_geotransform_from_bbox([0.0, 100.0, 50.0, 150.0], 0, 100)


def test_order_conversions():
    assert gdal_bbox_from_ogr_bbox([0.0, 10.0, 20.0, 30.0]) == [0.0, 20.0, 10.0, 30.0]
    assert ogr_bbox_from_gdal_bbox([0.0, 20.0, 10.0, 30.0]) == [0.0, 10.0, 20.0, 30.0]


def test_bbox_helpers():
    pts = np.array([[0.0, 5.0], [2.0, 1.0], [-1.0, 3.0]])
    assert bbox_from_points(pts) == [-1.0, 2.0, 1.0, 5.0]
    assert buffer_bbox([0, 1, 0, 1], 0.5) == [-0.5, 1.5, -0.5, 1.5]
    assert bbox_center([0, 2, 0, 4]) == (1.0, 2.0)
    assert bbox_aspect_ratio([0, 2, 0, 4]) == 0.5
    assert bbox_contains_point([0, 2, 0, 2], 1.0, 2.0)
    assert not bbox_contains_point([0, 2, 0, 2], 2.1, 1.0)


@given(
    x0=st.floats(-1e5, 1e5), w=st.floats(0.1, 1e3),
    y0=st.floats(-1e5, 1e5), h=st.floats(0.1, 1e3),
)
def test_roundtrip_bbox_geotransform(x0, w, y0, h):
    bbox = [x0, x0 + w, y0, y0 + h]
    gt = get_geotransform_from_bbox(bbox, 10, 10)
    out = get_bbox_from_geotransform(gt, 10, 10)
    np.testing.assert_allclose(out, bbox, rtol=1e-9, atol=1e-9)


@given(
    ax=st.floats(-100, 100), ay=st.floats(-100, 100),
    aw=st.floats(0, 50), ah=st.floats(0, 50),
    bx=st.floats(-100, 100), by=st.floats(-100, 100),
    bw=st.floats(0, 50), bh=st.floats(0, 50),
)
def test_union_contains_both(ax, ay, aw, ah, bx, by, bw, bh):
    a = [ax, ax + aw, ay, ay + ah]
    b = [bx, bx + bw, by, by + bh]
    u = union_bboxes(a, b)
    assert u[0] <= min(a[0], b[0]) and u[1] >= max(a[1], b[1])
    assert u[2] <= min(a[2], b[2]) and u[3] >= max(a[3], b[3])
