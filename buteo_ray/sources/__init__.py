"""Sources & sinks: page-table synthesis, AOI polygon layers, tile-row
raster datasets, partitioned parquet writers."""

from buteo_ray.sources.pages import synth_pages_table, pages_dataset
from buteo_ray.sources.aoi import synth_aoi_rects, synth_aoi_polygons, aoi_rect_sql_cte

__all__ = [
    "synth_pages_table", "pages_dataset",
    "synth_aoi_rects", "synth_aoi_polygons", "aoi_rect_sql_cte",
]
