"""Bounding-box and geotransform algebra (reference-exact).

Bboxes are OGR-ordered ``[x_min, x_max, y_min, y_max]`` (reference:
``bbox/__init__.py:39-58``); geotransforms are GDAL 6-tuples
``[origin_x, pixel_w, row_skew, origin_y, col_skew, pixel_h]`` with
``pixel_h`` negative for north-up (``bbox/operations.py:26-31``).

The rounding/snap arithmetic here must match the reference bit-for-bit —
a one-ulp difference flips a boundary pixel's tile assignment (semantics
from ``/root/reference/buteo/bbox/operations.py``; each function cites the
exact region it reproduces). Implementation is from scratch over numpy.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

Bbox = Sequence[float]
GeoTransform = Sequence[float]


def _check_bbox(bbox: Bbox) -> None:
    if bbox is None or len(bbox) != 4:
        raise ValueError(f"Invalid OGR bounding box provided: {bbox}")
    x_min, x_max, y_min, y_max = (float(v) for v in bbox)
    if math.isnan(x_min) or math.isnan(x_max) or math.isnan(y_min) or math.isnan(y_max):
        raise ValueError(f"Invalid OGR bounding box provided: {bbox}")
    if x_min > x_max or y_min > y_max:
        raise ValueError(f"Invalid OGR bounding box provided: {bbox}")


def get_pixel_offsets(geotransform: GeoTransform, bbox_ogr: Bbox) -> Tuple[int, int, int, int]:
    """Pixel offsets ``(x_start, y_start, x_size, y_size)`` of a bbox within a
    geotransform grid. Rounding is ``np.rint`` (banker's rounding), matching
    reference ``bbox/operations.py:19-98`` (``_get_pixel_offsets``).

    >>> get_pixel_offsets([0.0, 1.0, 0.0, 10.0, 0.0, -1.0], [2.0, 4.0, 4.0, 8.0])
    (2, 2, 2, 4)
    """
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    origin_x = float(geotransform[0])
    origin_y = float(geotransform[3])
    pixel_width = float(geotransform[1])
    pixel_height = float(geotransform[5])
    if abs(pixel_width) < 1e-15 or abs(pixel_height) < 1e-15:
        raise ValueError("Pixel width and height cannot be zero or near-zero")

    x_start = int(np.rint((x_min - origin_x) / pixel_width))
    y_start = int(np.rint((y_max - origin_y) / pixel_height))
    x_size = abs(int(np.rint((x_max - x_min) / pixel_width)))
    y_size = abs(int(np.rint((y_min - y_max) / pixel_height)))
    return (x_start, y_start, x_size, y_size)


def get_bbox_from_geotransform(
    geotransform: GeoTransform, raster_x_size: int, raster_y_size: int
) -> List[float]:
    """OGR bbox of a raster grid. Reference ``bbox/operations.py:101-167``.

    >>> get_bbox_from_geotransform([0.0, 1.0, 0.0, 10.0, 0.0, -1.0], 5, 5)
    [0.0, 5.0, 5.0, 10.0]
    """
    if raster_x_size < 0 or raster_y_size < 0:
        raise ValueError("raster sizes cannot be negative.")
    origin_x = float(geotransform[0])
    pixel_width = float(geotransform[1])
    origin_y = float(geotransform[3])
    pixel_height = float(geotransform[5])
    x_min, y_max = origin_x, origin_y
    x_max = origin_x + (raster_x_size * pixel_width)
    y_min = origin_y + (raster_y_size * pixel_height)
    if x_max < x_min:
        x_min, x_max = x_max, x_min
    if y_max < y_min:
        y_min, y_max = y_max, y_min
    return [x_min, x_max, y_min, y_max]


def bboxes_intersect(bbox1: Bbox, bbox2: Bbox) -> bool:
    """True when the two OGR bboxes intersect (corner-touch counts)."""
    a_xmin, a_xmax, a_ymin, a_ymax = (float(v) for v in bbox1)
    b_xmin, b_xmax, b_ymin, b_ymax = (float(v) for v in bbox2)
    return not (a_xmax < b_xmin or a_xmin > b_xmax or a_ymax < b_ymin or a_ymin > b_ymax)


def intersection_bboxes(bbox1: Bbox, bbox2: Bbox) -> List[float]:
    """Intersection of two OGR bboxes; raises when disjoint; corner-touch
    yields a degenerate box. Reference ``bbox/operations.py:169-229``.

    >>> intersection_bboxes([0, 2, 0, 2], [1, 3, 1, 3])
    [1.0, 2.0, 1.0, 2.0]
    >>> intersection_bboxes([0, 1, 0, 1], [1, 2, 1, 2])
    [1.0, 1.0, 1.0, 1.0]
    """
    _check_bbox(bbox1)
    _check_bbox(bbox2)
    if not bboxes_intersect(bbox1, bbox2):
        raise ValueError("Bounding boxes do not intersect")
    a = [float(v) for v in bbox1]
    b = [float(v) for v in bbox2]
    return [max(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), min(a[3], b[3])]


def union_bboxes(bbox1: Bbox, bbox2: Bbox) -> List[float]:
    """Bounding hull of two OGR bboxes. Reference ``bbox/operations.py:231-287``.

    >>> union_bboxes([0, 1, 0, 1], [1, 2, 1, 2])
    [0.0, 2.0, 0.0, 2.0]
    """
    _check_bbox(bbox1)
    _check_bbox(bbox2)
    a = [float(v) for v in bbox1]
    b = [float(v) for v in bbox2]
    return [min(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), max(a[3], b[3])]


def align_bbox_to_pixel_size(
    bbox_to_align_to: Bbox,
    bbox_to_be_aligned: Bbox,
    pixel_width: float,
    pixel_height: float,
) -> List[float]:
    """Snap a bbox outward onto the pixel grid anchored at the reference
    bbox's top-left. floor/ceil arithmetic matches reference
    ``bbox/operations.py:289-388`` (``_get_aligned_bbox_to_pixel_size``)
    bit-for-bit — identical tile assignment depends on it.

    >>> align_bbox_to_pixel_size([0.0, 4.0, 0.0, 4.0], [1.2, 3.7, 1.2, 3.7], 1.0, -1.0)
    [1.0, 4.0, 1.0, 4.0]
    """
    _check_bbox(bbox_to_align_to)
    _check_bbox(bbox_to_be_aligned)
    pw = float(pixel_width)
    ph = float(pixel_height)
    if pw <= 0:
        raise ValueError(f"pixel_width must be positive, got: {pixel_width}")
    if abs(ph) < 1e-15:
        raise ValueError("pixel_height cannot be zero.")

    ref_x_min = float(bbox_to_align_to[0])
    ref_y_max = float(bbox_to_align_to[3])
    t_x_min, t_x_max, t_y_min, t_y_max = (float(v) for v in bbox_to_be_aligned)

    aligned_x_min = ref_x_min + np.floor((t_x_min - ref_x_min) / pw) * pw
    aligned_x_max = ref_x_min + np.ceil((t_x_max - ref_x_min) / pw) * pw
    aligned_y_max = ref_y_max + np.floor((t_y_max - ref_y_max) / ph) * ph
    aligned_y_min = ref_y_max + np.ceil((t_y_min - ref_y_max) / ph) * ph

    result = [float(aligned_x_min), float(aligned_x_max), float(aligned_y_min), float(aligned_y_max)]
    if any(math.isnan(v) or math.isinf(v) for v in result):
        raise ValueError("Alignment resulted in NaN or infinite values.")
    if result[0] > result[1]:
        result[0], result[1] = result[1], result[0]
    if result[2] > result[3]:
        result[2], result[3] = result[3], result[2]
    return result


def get_geotransform_from_bbox(
    bbox_ogr: Bbox, raster_x_size: int, raster_y_size: int
) -> List[float]:
    """North-up geotransform covering a bbox with the given pixel counts.
    Reference ``bbox/operations.py:481-557``.

    >>> get_geotransform_from_bbox([0.0, 100.0, 50.0, 150.0], 100, 100)
    [0.0, 1.0, 0.0, 150.0, 0.0, -1.0]
    """
    if raster_x_size <= 0 or raster_y_size <= 0:
        raise ValueError("raster dimensions must be positive.")
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    pixel_width = (x_max - x_min) / float(raster_x_size)
    pixel_height = (y_max - y_min) / float(raster_y_size)
    if abs(pixel_width) < 1e-15 or abs(pixel_height) < 1e-15:
        raise ValueError("Calculated pixel width or height is zero or near-zero.")
    return [x_min, pixel_width, 0.0, y_max, 0.0, -abs(pixel_height)]


def gdal_bbox_from_ogr_bbox(bbox_ogr: Bbox) -> List[float]:
    """[x_min, x_max, y_min, y_max] → [x_min, y_min, x_max, y_max].
    Reference ``bbox/operations.py:391-428``."""
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    return [x_min, y_min, x_max, y_max]


def ogr_bbox_from_gdal_bbox(bbox_gdal: Bbox) -> List[float]:
    """[x_min, y_min, x_max, y_max] → [x_min, x_max, y_min, y_max].
    Reference ``bbox/operations.py:430-480``."""
    if bbox_gdal is None or len(bbox_gdal) != 4:
        raise ValueError("Input must be a sequence of 4 numbers.")
    x_min, y_min, x_max, y_max = (float(v) for v in bbox_gdal)
    out = [x_min, x_max, y_min, y_max]
    _check_bbox(out)
    return out


def bbox_from_points(points: np.ndarray) -> List[float]:
    """OGR bbox hull of an ``(N, 2)`` array of (x, y) points.
    Capability parity with reference ``bbox/bbox_class.py:685-733``."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2 or pts.shape[0] == 0:
        raise ValueError("points must be a non-empty (N, 2) array")
    return [float(pts[:, 0].min()), float(pts[:, 0].max()),
            float(pts[:, 1].min()), float(pts[:, 1].max())]


def buffer_bbox(bbox_ogr: Bbox, distance: float) -> List[float]:
    """Expand an OGR bbox by ``distance`` on every side (reference
    ``bbox/bbox_class.py`` buffer semantics)."""
    _check_bbox(bbox_ogr)
    d = float(distance)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    out = [x_min - d, x_max + d, y_min - d, y_max + d]
    _check_bbox(out)
    return out


def bbox_center(bbox_ogr: Bbox) -> Tuple[float, float]:
    """Center point (x, y) of an OGR bbox."""
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    return ((x_min + x_max) / 2.0, (y_min + y_max) / 2.0)


def bbox_aspect_ratio(bbox_ogr: Bbox) -> float:
    """Width / height of an OGR bbox (inf for degenerate height)."""
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    height = y_max - y_min
    if height == 0.0:
        return math.inf
    return (x_max - x_min) / height


def bbox_contains_point(bbox_ogr: Bbox, x: float, y: float) -> bool:
    """Closed-interval containment test of a point in an OGR bbox."""
    _check_bbox(bbox_ogr)
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    return x_min <= float(x) <= x_max and y_min <= float(y) <= y_max


# --- Columnar twins ---------------------------------------------------
# Vectorized counterparts of the scalar algebra above for batch stages:
# a "bbox column set" is four aligned float64 arrays (x_min, x_max,
# y_min, y_max). Semantics match the scalar functions element-wise,
# except intersection does not raise on disjoint rows — callers filter
# with :func:`bboxes_intersect_cols` first (an exception per row has no
# columnar analog).

BboxCols = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def _as_cols(xmin, xmax, ymin, ymax) -> BboxCols:
    return tuple(np.asarray(a, dtype=np.float64)
                 for a in (xmin, xmax, ymin, ymax))


def bboxes_intersect_cols(cols: BboxCols, bbox2: Bbox) -> np.ndarray:
    """Boolean mask: which rows intersect ``bbox2`` (corner-touch
    counts). Columnar twin of :func:`bboxes_intersect`."""
    _check_bbox(bbox2)
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    b0, b1, b2, b3 = (float(v) for v in bbox2)
    return ~((xmax < b0) | (xmin > b1) | (ymax < b2) | (ymin > b3))


def intersection_bboxes_cols(cols: BboxCols, bbox2: Bbox) -> BboxCols:
    """Per-row intersection with ``bbox2``; rows must already be known
    to intersect (pre-filter with :func:`bboxes_intersect_cols`).
    Columnar twin of :func:`intersection_bboxes`."""
    _check_bbox(bbox2)
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    b0, b1, b2, b3 = (float(v) for v in bbox2)
    return (np.maximum(xmin, b0), np.minimum(xmax, b1),
            np.maximum(ymin, b2), np.minimum(ymax, b3))


def union_bboxes_cols(cols: BboxCols, bbox2: Bbox) -> BboxCols:
    """Per-row bounding hull with ``bbox2``. Columnar twin of
    :func:`union_bboxes`."""
    _check_bbox(bbox2)
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    b0, b1, b2, b3 = (float(v) for v in bbox2)
    return (np.minimum(xmin, b0), np.maximum(xmax, b1),
            np.minimum(ymin, b2), np.maximum(ymax, b3))


def buffer_bbox_cols(cols: BboxCols, distance: float) -> BboxCols:
    """Expand every bbox by ``distance`` on each side. Columnar twin of
    :func:`buffer_bbox`."""
    d = float(distance)
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    return (xmin - d, xmax + d, ymin - d, ymax + d)


def bbox_center_cols(cols: BboxCols) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row center (x, y). Columnar twin of :func:`bbox_center`."""
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    return (xmin + xmax) / 2.0, (ymin + ymax) / 2.0


def bbox_aspect_ratio_cols(cols: BboxCols) -> np.ndarray:
    """Per-row width / height, ``inf`` for degenerate height. Columnar
    twin of :func:`bbox_aspect_ratio`."""
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    height = ymax - ymin
    # invalid= too: a width-0 AND height-0 bbox is 0/0 → NaN before
    # np.where discards it, which would warn from every worker.
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(height == 0.0, np.inf, (xmax - xmin) / height)


def bbox_area_cols(cols: BboxCols) -> np.ndarray:
    """Per-row (x_max - x_min) * (y_max - y_min)."""
    xmin, xmax, ymin, ymax = _as_cols(*cols)
    return (xmax - xmin) * (ymax - ymin)
