"""Vector-layer constructors and layer splitting (reference parity:
``core_vector/core_vector_write.py:354`` ``vector_create_from_wkt``,
``vector_create_from_geojson``, ``vector_create_from_points``,
``core_vector/core_vector_split.py:133`` ``vector_split_by_attribute``
and ``:23`` ``vector_split_by_feature``).

Constructors return Arrow tables in the engine's vector-layer schema
(``fid``, ``geom_wkb``, bbox columns, plus caller attributes) — feed
them to ``ray.data.from_arrow`` or broadcast them to joins. Splitting
writes one resumable parquet partition per attribute value through the
lineage sink (the distributed analog of one-file-per-value).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from buteo_ray.geom.wkb import geom_vertices, parse_wkb


def _layer_from_wkbs(wkbs: List[bytes], attrs: Optional[dict] = None) -> pa.Table:
    xmin, xmax, ymin, ymax = [], [], [], []
    for w in wkbs:
        kind, payload = parse_wkb(w)
        v = geom_vertices(kind, payload)
        if len(v) == 0:
            xmin.append(np.nan); xmax.append(np.nan)
            ymin.append(np.nan); ymax.append(np.nan)
        else:
            xmin.append(v[:, 0].min()); xmax.append(v[:, 0].max())
            ymin.append(v[:, 1].min()); ymax.append(v[:, 1].max())
    cols = {
        "fid": pa.array(np.arange(len(wkbs), dtype=np.int64)),
        "geom_wkb": pa.array(wkbs, type=pa.binary()),
        "bbox_xmin": pa.array(np.asarray(xmin, dtype=np.float64)),
        "bbox_xmax": pa.array(np.asarray(xmax, dtype=np.float64)),
        "bbox_ymin": pa.array(np.asarray(ymin, dtype=np.float64)),
        "bbox_ymax": pa.array(np.asarray(ymax, dtype=np.float64)),
    }
    for name, values in (attrs or {}).items():
        cols[name] = pa.array(values)
    return pa.table(cols)


def vector_from_wkt(wkts: List[str], attrs: Optional[dict] = None) -> pa.Table:
    """WKT strings → vector-layer table (≙ vector_create_from_wkt)."""
    from buteo_ray.geom.wkt import wkt_to_wkb

    return _layer_from_wkbs([wkt_to_wkb(w) for w in wkts], attrs)


def vector_from_geojson(obj: dict, attrs: Optional[dict] = None) -> pa.Table:
    """GeoJSON geometry / Feature / FeatureCollection → vector-layer
    table (≙ vector_create_from_geojson). Feature properties become
    columns when every feature carries the same property keys."""
    from buteo_ray.geom.geojson import geojson_to_wkb

    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj.get("features", [])
        wkbs = [geojson_to_wkb(f["geometry"]) for f in feats]
        props = [f.get("properties") or {} for f in feats]
        keys = set(props[0]) if props else set()
        merged = dict(attrs or {})
        if keys and all(set(p) == keys for p in props):
            for k in sorted(keys):
                merged[k] = [p[k] for p in props]
        return _layer_from_wkbs(wkbs, merged)
    if t == "Feature":
        return vector_from_geojson(
            {"type": "FeatureCollection", "features": [obj]}, attrs)
    return _layer_from_wkbs([geojson_to_wkb(obj)], attrs)


def vector_from_points(xs, ys, attrs: Optional[dict] = None) -> pa.Table:
    """Coordinate arrays → point-layer table (≙ vector_create_from_points)."""
    from buteo_ray.geom.wkb import wkb_point

    wkbs = [wkb_point(float(x), float(y)) for x, y in zip(xs, ys)]
    return _layer_from_wkbs(wkbs, attrs)


def vector_from_bbox(bbox, attrs: Optional[dict] = None) -> pa.Table:
    """[xmin, xmax, ymin, ymax] → one rectangle feature (≙ reference
    ``vector_create_from_bbox`` / ``raster_to_vector_extent``)."""
    from buteo_ray.geom.wkb import wkb_polygon

    xmin, xmax, ymin, ymax = (float(v) for v in bbox)
    ring = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                     [xmin, ymax], [xmin, ymin]])
    return _layer_from_wkbs([wkb_polygon([ring])], attrs)


def vector_split_by_attribute(ds, attribute: str, out_dir: str,
                              op_version: str = "split-v1"):
    """Write one resumable parquet partition per ``attribute`` value (≙
    vector_split_by_attribute's one-file-per-value, distributed: every
    partition lands atomically with a lineage row; re-running skips
    completed values). Returns the lineage rows written this run."""
    from buteo_ray.state.checkpoint import write_partitioned_resumable

    return write_partitioned_resumable(ds, out_dir, attribute,
                                       op_version=op_version)
