"""Dataset-level operators: every stage takes and returns a
``ray.data.Dataset`` (or adds columns via zero-copy Arrow batch fns).

Modules (import directly for the full surface):
geocode, cell_assign, tiling, join (broadcast spatial),
join_partitioned (large-large co-partitioned), knn, dedup, text, ann,
selection, streaming, vector_ops, zonal, raster_clip, multimodal.
"""

from buteo_ray.stages.geocode import (
    hash_u32,
    hash_unit,
    hash_coords_from_ids,
    geocode,
    geocode_sql_exprs,
)
from buteo_ray.stages.cell_assign import assign_cells, assign_cell_xy, cell_xy_sql_exprs
from buteo_ray.stages.join import (
    broadcast_pip_join,
    broadcast_bbox_join,
    BroadcastIndexProbe,
)
from buteo_ray.stages.tiling import assign_tiles, tile_sql_exprs, GridSpec

__all__ = [
    "hash_u32", "hash_unit", "hash_coords_from_ids", "geocode",
    "geocode_sql_exprs", "assign_cells", "assign_cell_xy", "cell_xy_sql_exprs",
    "broadcast_pip_join", "broadcast_bbox_join", "BroadcastIndexProbe",
    "assign_tiles", "tile_sql_exprs", "GridSpec",
]
