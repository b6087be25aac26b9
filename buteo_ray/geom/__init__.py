"""Pure-numpy computational geometry: WKB codec, spatial predicates,
grid-binned spatial index. No GDAL/OGR/shapely — everything built from
scratch on public algorithms (even-odd ray casting, Sutherland–Hodgman,
shoelace, segment orientation tests)."""

from buteo_ray.geom.wkb import (
    wkb_point,
    wkb_linestring,
    wkb_polygon,
    wkb_multipoint,
    wkb_multilinestring,
    wkb_multipolygon,
    wkb_geometrycollection,
    encode_geom,
    parse_wkb,
    parse_wkb_dims,
    geom_bbox,
    geom_vertices,
    map_coords,
)
from buteo_ray.geom.predicates import (
    points_in_ring,
    points_strictly_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    segments_intersect,
    polygons_intersect,
    polygon_contains_polygon,
    polygon_relate,
    clip_polygon_convex,
)
from buteo_ray.geom.index import GridIndex

__all__ = [
    "wkb_point", "wkb_linestring", "wkb_polygon", "wkb_multipoint",
    "wkb_multilinestring", "wkb_multipolygon", "wkb_geometrycollection",
    "encode_geom", "parse_wkb", "parse_wkb_dims", "geom_bbox",
    "geom_vertices", "map_coords",
    "points_in_ring", "points_in_polygon", "points_strictly_in_polygon", "polygon_area", "polygon_centroid",
    "segments_intersect", "polygons_intersect", "polygon_contains_polygon",
    "polygon_relate", "clip_polygon_convex", "GridIndex",
]
