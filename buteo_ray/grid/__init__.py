"""Grid math: bbox/geotransform algebra, pixel-offset tiling, cell systems.

Pure, deterministic, driver-or-task-side functions. The arithmetic mirrors
the reference engine bit-for-bit where tile assignment depends on it
(see docstring citations into /root/reference).
"""

from buteo_ray.grid.bbox import (
    get_pixel_offsets,
    get_bbox_from_geotransform,
    get_geotransform_from_bbox,
    bboxes_intersect,
    intersection_bboxes,
    union_bboxes,
    align_bbox_to_pixel_size,
    ogr_bbox_from_gdal_bbox,
    gdal_bbox_from_ogr_bbox,
    bbox_from_points,
    buffer_bbox,
    bbox_center,
    bbox_aspect_ratio,
    bbox_contains_point,
)
from buteo_ray.grid.offsets import (
    compute_patch_positions,
    get_patch_offsets_fixed_size,
    find_optimal_patch_factors,
    get_patch_offsets,
    get_dither_offsets,
)
from buteo_ray.grid.cells import (
    cell_xy,
    cell_id,
    cell_id_to_xy,
    cell_parent,
    cell_children,
    cell_bounds,
    k_ring,
    morton_encode,
    morton_decode,
    latlon_to_morton,
    GLOBAL_BBOX,
)

__all__ = [
    "get_pixel_offsets", "get_bbox_from_geotransform",
    "get_geotransform_from_bbox", "bboxes_intersect", "intersection_bboxes",
    "union_bboxes", "align_bbox_to_pixel_size", "ogr_bbox_from_gdal_bbox",
    "gdal_bbox_from_ogr_bbox", "bbox_from_points", "buffer_bbox",
    "bbox_center", "bbox_aspect_ratio", "bbox_contains_point",
    "compute_patch_positions", "get_patch_offsets_fixed_size",
    "find_optimal_patch_factors", "get_patch_offsets", "get_dither_offsets",
    "cell_xy", "cell_id", "cell_id_to_xy", "cell_parent", "cell_children",
    "cell_bounds", "k_ring", "morton_encode", "morton_decode",
    "latlon_to_morton", "GLOBAL_BBOX",
]
