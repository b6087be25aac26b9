"""Vector toolbox over WKB-geometry Datasets — capability parity with the
reference's ``core_vector``/``vector`` modules re-expressed as
``map_batches``/``groupby`` stages.

Geometry Datasets carry ``geom_wkb:binary`` + ``bbox_*`` columns
(SURVEY.md §1.3). All geometry math is this package's pure-numpy layer
(no GDAL/shapely); exact polygon union / intersection / difference come
from ``geom/boolean.py``, so dissolve offers true ``ST_Union`` geometry
and clip accepts arbitrary (concave, holed, multi-part) clip layers.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.geom.predicates import clip_polygon_convex, polygon_area, polygon_centroid
from buteo_ray.geom.wkb import (
    encode_geom,
    geom_bbox,
    geom_vertices,
    map_coords,
    parse_wkb,
    parse_wkb_dims,
    wkb_multipolygon,
    wkb_polygon,
)
from buteo_ray.grid.projection import reproject_points


def _rebuild_bbox_cols(pdf: pd.DataFrame) -> pd.DataFrame:
    boxes = np.array([geom_bbox(w) for w in pdf["geom_wkb"]]) if len(pdf) else np.zeros((0, 4))
    pdf["bbox_xmin"], pdf["bbox_xmax"] = boxes[:, 0] if len(pdf) else [], boxes[:, 1] if len(pdf) else []
    pdf["bbox_ymin"], pdf["bbox_ymax"] = boxes[:, 2] if len(pdf) else [], boxes[:, 3] if len(pdf) else []
    return pdf


# --- pyarrow batch helpers --------------------------------------------
# Stateless map stages take Arrow batches zero-copy from the object
# store: per-feature WKB parsing is inherently row-wise, but every OTHER
# column rides through untouched — the pandas round-trip the stages
# previously paid converted all of them twice per batch.

def _wkbs(t: pa.Table, col: str = "geom_wkb") -> list:
    """Binary column → list of bytes (the per-feature parse input)."""
    return t[col].to_pylist()


def _pa_set_column(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def _pa_mask(t: pa.Table, mask) -> pa.Table:
    return t.filter(pa.array(np.asarray(mask, dtype=bool)))


def _pa_f64(v) -> pa.Array:
    return pa.array(np.asarray(v, dtype=np.float64), type=pa.float64())


def _pa_rebuild_bbox(t: pa.Table, wkbs=None) -> pa.Table:
    wkbs = _wkbs(t) if wkbs is None else wkbs
    boxes = (np.array([geom_bbox(w) for w in wkbs], dtype=np.float64)
             if len(wkbs) else np.zeros((0, 4)))
    for i, name in enumerate(("bbox_xmin", "bbox_xmax",
                              "bbox_ymin", "bbox_ymax")):
        t = _pa_set_column(t, name, _pa_f64(boxes[:, i]))
    return t


def vector_filter_by_function(ds, attr_fn: Optional[Callable] = None,
                              geom_fn: Optional[Callable] = None):
    """Per-feature UDF filter (≙ ``vector_filter_by_function``, reference
    core_vector/core_vector_filter.py:143-301): ``attr_fn(row_dict) →
    bool`` and/or ``geom_fn(parsed_geom) → bool``."""

    def _fn(batch: pa.Table) -> pa.Table:
        keep = np.ones(batch.num_rows, dtype=bool)
        if attr_fn is not None:
            keep &= np.array([bool(attr_fn(r)) for r in batch.to_pylist()])
        if geom_fn is not None:
            keep &= np.array([bool(geom_fn(parse_wkb(w))) for w in _wkbs(batch)])
        return _pa_mask(batch, keep)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_clip_convex(ds, clip_ring: np.ndarray):
    """Geometric intersection-and-crop against a CONVEX clip ring (≙
    ``vector_clip``, reference vector/clip.py:24-151: bbox prefilter +
    exact clip, empty results dropped)."""
    cxmin, cymin = clip_ring[:, 0].min(), clip_ring[:, 1].min()
    cxmax, cymax = clip_ring[:, 0].max(), clip_ring[:, 1].max()

    def _fn(batch: pa.Table) -> pa.Table:
        # bbox prefilter (the reference's -spat)
        bx0, bx1, by0, by1 = (batch[c].to_numpy(zero_copy_only=False)
                              for c in ("bbox_xmin", "bbox_xmax",
                                        "bbox_ymin", "bbox_ymax"))
        batch = _pa_mask(batch, ~((bx1 < cxmin) | (bx0 > cxmax)
                                  | (by1 < cymin) | (by0 > cymax)))
        out_wkb = []
        kept = []
        for w in _wkbs(batch):
            kind, payload = parse_wkb(w)
            polys = [payload] if kind == "polygon" else payload
            # Clip EVERY ring of EVERY member: holes clipped by a convex
            # ring stay holes; members that vanish are dropped.
            new_polys = []
            for rings in polys:
                new_rings = []
                for i, ring in enumerate(rings):
                    clipped = clip_polygon_convex(ring, clip_ring)
                    if clipped.shape[0] >= 4:
                        new_rings.append(clipped)
                    elif i == 0:
                        new_rings = []
                        break  # exterior gone → whole member gone
                if new_rings:
                    new_polys.append(new_rings)
            if new_polys:
                out_wkb.append(wkb_polygon(new_polys[0]) if len(new_polys) == 1
                               else wkb_multipolygon(new_polys))
                kept.append(True)
            else:
                kept.append(False)
        batch = _pa_mask(batch, kept) if batch.num_rows else batch
        batch = _pa_set_column(batch, "geom_wkb",
                               pa.array(out_wkb, type=pa.binary()))
        return _pa_rebuild_bbox(batch, out_wkb)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull (public algorithm) → closed ring."""
    pts = np.unique(points, axis=0)
    if pts.shape[0] < 3:
        raise ValueError("need >= 3 distinct points for a hull")
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def _half(pp):
        out = []
        for p in pp:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = _half(pts)
    upper = _half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def _member_polys(w: bytes) -> list:
    """Polygon members of a WKB geometry (each a list of rings)."""
    kind, payload = parse_wkb(w)
    if kind == "polygon":
        return [payload]
    if kind == "multipolygon":
        return payload
    raise ValueError(f"operation needs polygonal input, got {kind}")


def _dissolve_reduce(wkbs, geometry: str):
    """Combine member geometries → (rings_list, area). Associative for
    every mode (hull of hulls == hull; bbox of bboxes == bbox; union of
    unions == union), which is what makes the two-level plan exact."""
    if geometry == "union":
        from buteo_ray.geom.boolean import polygon_union, union_area

        polys = []
        for w in wkbs:
            polys.extend(_member_polys(w))
        u = polygon_union(polys)
        return u, union_area(u)
    pts = []
    for w in wkbs:
        kind, payload = parse_wkb(w)
        if kind in ("polygon", "multipolygon"):
            polys = [payload] if kind == "polygon" else payload
            # Exterior ring of EVERY member (holes can't extend the hull).
            for rings in polys:
                pts.append(rings[0][:-1, :2])
        else:
            pts.append(geom_vertices(kind, payload)[:, :2])
    allpts = np.vstack(pts)
    if geometry == "bbox":
        x0, y0 = allpts[:, 0].min(), allpts[:, 1].min()
        x1, y1 = allpts[:, 0].max(), allpts[:, 1].max()
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    else:
        ring = _convex_hull(allpts)
    return [[ring]], polygon_area([ring])


def _encode_polyset(polys) -> bytes:
    return (wkb_polygon(polys[0]) if len(polys) == 1 else wkb_multipolygon(polys))


def vector_dissolve(ds, by: Optional[str] = None, geometry: str = "convex_hull",
                    two_level: bool = True):
    """Grouped dissolve (≙ ``vector_dissolve``, reference
    vector/dissolve.py:26-264). Output geometry per group: 'union'
    (exact polygon union via ``geom/boolean.py``), 'convex_hull' of all
    vertices, or 'bbox' hull. ``by=None`` dissolves everything into one
    row (reference's global union / vector_merge_features).

    Two-level plan (default): a ``map_batches`` partial stage combines
    each block's rows per key FIRST, so the final per-key group receives
    one partial row per block instead of every feature — the global
    (``by=None``) dissolve no longer ships the whole dataset to a single
    ``map_groups`` task. All three combine rules are associative, so the
    result is identical to the single-pass plan (pytest-pinned)."""
    if geometry not in ("union", "convex_hull", "bbox"):
        raise ValueError("geometry must be 'union', 'convex_hull' or 'bbox'")

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        polys, area = _dissolve_reduce(list(g["geom_wkb"]), geometry)
        n = int(g["__n"].sum()) if "__n" in g.columns else len(g)
        out = pd.DataFrame({
            "geom_wkb": [_encode_polyset(polys)],
            "n_features": [n],
            "area": [area],
        })
        if by is not None:
            out.insert(0, by, [g[by].iloc[0]])
        return _rebuild_bbox_cols(out)

    key = by
    if by is None:
        ds = ds.map_batches(
            lambda t: t.append_column("__all", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow", batch_size=None)
        key = "__all"

    if two_level:
        def _partial(batch: pa.Table) -> pa.Table:
            key_type = batch.schema.field(key).type
            # Only the key + geometry columns leave Arrow — the per-key
            # combine is pandas-grouped over just those two. dropna=False:
            # null group keys must reach the final groupby exactly as
            # they do in the single-level plan. _bucket_frame keeps an
            # int key EXACT when the block contains null keys (pandas'
            # default conversion would round-trip it through float64,
            # corrupting keys above 2^53).
            from buteo_ray.stages.aggregate import _bucket_frame

            df = _bucket_frame(batch.select([key]), [key])
            df["geom_wkb"] = _wkbs(batch)
            ks, ws, ns = [], [], []
            for kval, g in df.groupby(key, sort=False, dropna=False):
                polys, _ = _dissolve_reduce(list(g["geom_wkb"]), geometry)
                ks.append(kval)
                ws.append(_encode_polyset(polys))
                ns.append(len(g))
            # from_pandas, not pa.array: pandas groupby surfaces null keys
            # as NaN (and nullable ints as floats); from_pandas maps them
            # back to Arrow nulls under the original key type.
            return pa.table({key: pa.Array.from_pandas(pd.Series(ks),
                                                       type=key_type),
                             "geom_wkb": pa.array(ws, type=pa.binary()),
                             "__n": pa.array(np.asarray(ns, dtype=np.int64))})

        ds = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)

    # Dissolve keys are arbitrary attributes (unbounded cardinality):
    # bucketed routing, exact per-key groups iterated inside the bucket.
    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(ds, [key], _final)


def vector_clip(ds, clip_polys):
    """Geometric intersection-and-crop against an ARBITRARY (concave,
    multi-part, holed) clip geometry (≙ ``vector_clip``, reference
    vector/clip.py:24-151 ``-clipsrc``): bbox prefilter + exact boolean
    intersection per feature; empty results dropped. ``clip_polys`` is a
    list of polygons (ring lists) or a single ring array."""
    from buteo_ray.geom.boolean import polygon_boolean

    if isinstance(clip_polys, np.ndarray):
        clip_polys = [[clip_polys]]
    all_clip_pts = np.vstack([r for rings in clip_polys for r in rings])
    cxmin, cymin = all_clip_pts[:, 0].min(), all_clip_pts[:, 1].min()
    cxmax, cymax = all_clip_pts[:, 0].max(), all_clip_pts[:, 1].max()

    def _fn(batch: pa.Table) -> pa.Table:
        bx0, bx1, by0, by1 = (batch[c].to_numpy(zero_copy_only=False)
                              for c in ("bbox_xmin", "bbox_xmax",
                                        "bbox_ymin", "bbox_ymax"))
        batch = _pa_mask(batch, ~((bx1 < cxmin) | (bx0 > cxmax)
                                  | (by1 < cymin) | (by0 > cymax)))
        out_wkb, kept = [], []
        for w in _wkbs(batch):
            clipped = polygon_boolean(_member_polys(w), clip_polys, "intersection")
            if clipped:
                out_wkb.append(_encode_polyset(clipped))
                kept.append(True)
            else:
                kept.append(False)
        batch = _pa_mask(batch, kept) if batch.num_rows else batch
        batch = _pa_set_column(batch, "geom_wkb",
                               pa.array(out_wkb, type=pa.binary()))
        return _pa_rebuild_bbox(batch, out_wkb)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def _explode_members(kind, payload, dims):
    """Members of a geometry as (kind, payload, dims) singleparts (≙
    reference multipart.py split rules: multi → its members, single →
    itself, collection → recursively exploded members, each keeping its
    OWN dims — collections may mix dimensionality)."""
    if kind == "multipolygon":
        return [("polygon", rings, dims) for rings in payload]
    if kind == "multilinestring":
        return [("linestring", l, dims) for l in payload]
    if kind == "multipoint":
        return [("point", tuple(p), dims) for p in payload]
    if kind == "geometrycollection":
        out = []
        for k, p, d in payload:
            out.extend(_explode_members(k, p, d))
        return out
    return [(kind, payload, dims)]


def multipart_to_singlepart(ds):
    """Explode multi-geometries (multipolygon / multilinestring /
    multipoint / geometrycollection) into one row per member (≙
    reference core_vector/conversion/multipart.py:58-190; 1→N with a
    ``part_idx`` ordinal)."""

    def _fn(batch: pa.Table) -> pa.Table:
        geoms, part_idx, counts = [], [], []
        for w in _wkbs(batch):
            kind, payload, dims = parse_wkb_dims(w)
            members = _explode_members(kind, payload, dims)
            counts.append(len(members))
            for i, (k, p, d) in enumerate(members):
                geoms.append(encode_geom(k, p, d))
                part_idx.append(i)
        # 1→N: replicate the source row per member, then overwrite geom.
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                        np.asarray(counts, dtype=np.int64))
        out = batch.take(pa.array(idx))
        out = _pa_set_column(out, "geom_wkb", pa.array(geoms, type=pa.binary()))
        out = _pa_set_column(out, "part_idx",
                             pa.array(np.asarray(part_idx, dtype=np.int64)))
        return _pa_rebuild_bbox(out, geoms)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


_MULTI_OF = {"point": "multipoint", "linestring": "multilinestring",
             "polygon": "multipolygon"}


def _collect_geoms(parts):
    """(kind, payload, dims) singleparts → one multi-geometry:
    homogeneous kinds promote to the matching multi type (mixed-dims
    groups are normalized to the widest dims first — a homogeneous multi
    stores one coordinate width), mixed kinds to a geometrycollection
    whose members keep their own dims."""
    from buteo_ray.geom.wkb import combine_dims, reshape_coords

    kinds = {k for k, _, _ in parts}
    if kinds <= {"point", "linestring", "polygon"} and len(kinds) == 1:
        target = combine_dims([d for _, _, d in parts])
        norm = [map_coords(k, p, lambda pts, _d=d: reshape_coords(pts, _d, target))
                if d != target else p
                for k, p, d in parts]
        if kinds == {"polygon"}:
            return wkb_multipolygon(norm, dims=target)
        if kinds == {"linestring"}:
            from buteo_ray.geom.wkb import wkb_multilinestring

            return wkb_multilinestring(norm, dims=target)
        from buteo_ray.geom.wkb import wkb_multipoint

        return wkb_multipoint(np.array(norm), dims=target)
    from buteo_ray.geom.wkb import wkb_geometrycollection

    return wkb_geometrycollection([encode_geom(k, p, d) for k, p, d in parts])


def singlepart_to_multipart(ds, by: str):
    """Collect geometries per key into one multi-geometry row (N→1, ≙
    multipart.py:191-297). Homogeneous groups promote to multipoint /
    multilinestring / multipolygon; mixed groups to a collection."""

    def _collect(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        dims = "xy"
        for w in sorted(g["geom_wkb"], key=lambda b: b):  # deterministic order
            kind, payload, dims = parse_wkb_dims(w)
            parts.extend(_explode_members(kind, payload, dims))
        out = pd.DataFrame({by: [g[by].iloc[0]],
                            "geom_wkb": [_collect_geoms(parts)],
                            "n_parts": [len(parts)]})
        return _rebuild_bbox_cols(out)

    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(ds, [by], _collect)


def vector_fix_geometry(ds):
    """MakeValid-lite (≙ ``vector_fix_geometry``, reference
    core_vector/core_vector_fixgeometry.py:16-225): close open rings,
    drop degenerate (<3 distinct vertex) rings, enforce CCW exteriors."""

    def _fn(batch: pa.Table) -> pa.Table:
        def _fix_rings(rings):
            out_rings = []
            for ring in rings:
                if not (ring[0] == ring[-1]).all():
                    ring = np.vstack([ring, ring[:1]])
                if np.unique(ring[:-1], axis=0).shape[0] < 3:
                    continue
                x, y = ring[:-1, 0], ring[:-1, 1]
                x1, y1 = ring[1:, 0], ring[1:, 1]
                if float(np.sum(x * y1 - x1 * y)) < 0 and not out_rings:
                    ring = ring[::-1]  # exterior must be CCW
                out_rings.append(ring)
            return out_rings

        fixed, keep = [], []
        for w in _wkbs(batch):
            kind, payload = parse_wkb(w)
            if kind not in ("polygon", "multipolygon"):
                # Points pass through; lines drop degenerate (<2-vertex)
                # members but need no ring repair.
                if kind == "linestring" and np.asarray(payload).shape[0] < 2:
                    keep.append(False)
                    continue
                if kind == "multilinestring":
                    members = [l for l in payload if np.asarray(l).shape[0] >= 2]
                    if not members:
                        keep.append(False)
                        continue
                    from buteo_ray.geom.wkb import wkb_multilinestring

                    fixed.append(wkb_multilinestring(members))
                    keep.append(True)
                    continue
                fixed.append(w)
                keep.append(True)
                continue
            # Fix each multipolygon member SEPARATELY — flattening would
            # turn later members' exteriors into holes of the first.
            polys = [payload] if kind == "polygon" else payload
            fixed_polys = [r for r in (_fix_rings(p) for p in polys) if r]
            if fixed_polys:
                fixed.append(wkb_polygon(fixed_polys[0]) if len(fixed_polys) == 1
                             else wkb_multipolygon(fixed_polys))
                keep.append(True)
            else:
                keep.append(False)
        batch = _pa_mask(batch, keep) if batch.num_rows else batch
        batch = _pa_set_column(batch, "geom_wkb",
                               pa.array(fixed, type=pa.binary()))
        return _pa_rebuild_bbox(batch, fixed)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_reproject(ds, src: str, dst: str):
    """Reproject every geometry (≙ ``vector_reproject``, reference
    vector/reproject.py:24-151) using the from-scratch projection math
    (``grid/projection.py``)."""

    def _tx(pts: np.ndarray) -> np.ndarray:
        x, y = reproject_points(pts[:, 0], pts[:, 1], src, dst)
        # Extra Z/M columns ride through unchanged.
        return np.column_stack([x, y] + [pts[:, j] for j in range(2, pts.shape[1])])

    def _fn(batch: pa.Table) -> pa.Table:
        out = []
        for w in _wkbs(batch):
            kind, payload, dims = parse_wkb_dims(w)
            out.append(encode_geom(kind, map_coords(kind, payload, _tx), dims))
        batch = _pa_set_column(batch, "geom_wkb",
                               pa.array(out, type=pa.binary()))
        return _pa_rebuild_bbox(batch, out)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_add_centroids(ds):
    """Append centroid_x/centroid_y/area columns (attribute derivation
    ≙ vector_add_field family)."""

    def _fn(batch: pa.Table) -> pa.Table:
        cx, cy, areas = [], [], []
        for w in _wkbs(batch):
            kind, payload = parse_wkb(w)
            if kind == "point":
                cx.append(payload[0])
                cy.append(payload[1])
                areas.append(0.0)
                continue
            if kind not in ("polygon", "multipolygon"):
                # Zero-area kinds (lines, multipoints): vertex mean.
                v = geom_vertices(kind, payload)
                cx.append(float(v[:, 0].mean()))
                cy.append(float(v[:, 1].mean()))
                areas.append(0.0)
                continue
            polys = [payload] if kind == "polygon" else payload
            # Multipolygons: area-weighted centroid over all members.
            part_area = np.array([polygon_area(rings) for rings in polys])
            part_c = np.array([polygon_centroid(rings) for rings in polys])
            total = part_area.sum()
            if total > 0:
                c = (part_c * part_area[:, None]).sum(axis=0) / total
            else:
                c = part_c.mean(axis=0)
            cx.append(float(c[0]))
            cy.append(float(c[1]))
            areas.append(float(total))
        batch = _pa_set_column(batch, "centroid_x", _pa_f64(cx))
        batch = _pa_set_column(batch, "centroid_y", _pa_f64(cy))
        batch = _pa_set_column(batch, "area", _pa_f64(areas))
        return batch

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_add_fid(ds, id_col: str = None, out_col: str = "fid"):
    """Stable deterministic row ids (≙ vector_reset_fids /
    vector_create_attribute_from_fid, reference core_vector/
    core_vector_fids.py:19-281). Divergence, by design: the reference
    renumbers 0..N-1 sequentially (single-process order); at scale a
    global sequential renumber is an all-to-all sort, so fids here are
    order-free 64-bit hashes of ``id_col`` (or of the row's content hash
    when no id exists) — stable across partitionings and resumes."""
    from buteo_ray.stages.dedup import _splitmix64, content_hash_column

    def _fn(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            base = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            # view, not astype: content hashes are int64 and int64+uint64
            # silently promotes to float64 inside the mixer, rounding away
            # low bits and colliding distinct hashes above 2^53.
            base = content_hash_column(
                pd.Series([w.hex() for w in _wkbs(batch)])).view(np.uint64)
        return _pa_set_column(batch, out_col,
                              pa.array(_splitmix64(base).view(np.int64)))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_change_multitype(ds, target: str):
    """Promote polygons to single-member multipolygons or demote
    single-member multipolygons to polygons (≙ vector_change_multitype,
    reference core_vector/conversion/multitype.py:69-190; demoting a
    true multi-part geometry raises, as the reference errors)."""
    if target not in ("multi", "single"):
        raise ValueError("target must be 'multi' or 'single'")

    def _fn(batch: pa.Table) -> pa.Table:
        out = []
        for w in _wkbs(batch):
            kind, payload, dims = parse_wkb_dims(w)
            if target == "multi":
                if kind in _MULTI_OF.values() or kind == "geometrycollection":
                    out.append(w)
                else:
                    out.append(_collect_geoms([(kind, payload, dims)]))
            else:
                members = _explode_members(kind, payload, dims)
                if len(members) == 1:
                    k, p, d = members[0]
                    out.append(encode_geom(k, p, d))
                else:
                    raise ValueError("cannot demote a multi-part geometry to single")
        return _pa_set_column(batch, "geom_wkb",
                              pa.array(out, type=pa.binary()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_change_dimensionality(ds, target: str, z_value: float = 0.0,
                                 m_value: float = 0.0):
    """Add/drop Z and M coordinates (≙ ``vector_change_dimensionality``,
    reference core_vector/conversion/dimensionality.py:222-393).
    ``target`` ∈ {'xy', 'xyz', 'xym', 'xyzm'}; added coordinates are
    filled with ``z_value`` / ``m_value``."""
    from buteo_ray.geom.wkb import _NDIM

    if target not in _NDIM:
        raise ValueError(f"target must be one of {sorted(_NDIM)}")

    from buteo_ray.geom.wkb import reshape_coords

    def _reshape(pts: np.ndarray, dims: str) -> np.ndarray:
        return reshape_coords(pts, dims, target, z_value=z_value, m_value=m_value)

    def _redim(kind, payload, src_dims):
        """Reshape every coordinate array to the target dims, recursing
        into collections so each nested member converts from its OWN
        source dims and its dims slot is rewritten at every level."""
        if kind == "geometrycollection":
            return [(k, _redim(k, p, d), target) for k, p, d in payload]
        return map_coords(kind, payload, lambda pts: _reshape(pts, src_dims))

    def _fn(batch: pa.Table) -> pa.Table:
        out = []
        for w in _wkbs(batch):
            kind, payload, dims = parse_wkb_dims(w)
            if dims == target and kind != "geometrycollection":
                out.append(w)
                continue
            out.append(encode_geom(kind, _redim(kind, payload, dims), target))
        return _pa_set_column(batch, "geom_wkb",
                              pa.array(out, type=pa.binary()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def vector_buffer(ds, distance, quad_segs: int = 8,
                  force_multipolygon: bool = True):
    """Buffer every feature (≙ reference ``vector_buffer``,
    vector/buffer.py:154-283: fixed distance or attribute-driven, round
    joins, multipolygon output). ``distance`` is a number, or a COLUMN
    NAME whose per-row value buffers that feature (the reference's
    attribute mode). Negative distances erode polygons (points/lines
    vanish, as in OGR). Features whose buffer is empty are dropped.

    Per-feature Minkowski construction through the exact boolean engine
    (geom/buffer.py) — stateless, embarrassingly parallel, no shuffle.
    """
    from buteo_ray.geom.buffer import buffer_geometry
    from buteo_ray.geom.wkb import wkb_multipolygon

    def _fn(batch: pa.Table) -> pa.Table:
        dists = (batch[distance].to_numpy(zero_copy_only=False).astype(np.float64)
                 if isinstance(distance, str)
                 else np.full(batch.num_rows, float(distance)))
        if np.isnan(dists).any():
            # Loud failure (matching e.g. sample_per_group's negative-id
            # check): a null/NaN attribute distance would otherwise flow
            # into disc_ring and emit NaN-coordinate geometry.
            bad = np.nonzero(np.isnan(dists))[0][:5].tolist()
            raise ValueError(
                f"vector_buffer: null/NaN buffer distance for rows {bad}"
                + (f" (column {distance!r})" if isinstance(distance, str) else ""))
        out_wkb, kept = [], []
        for w, d in zip(_wkbs(batch), dists):
            polys = buffer_geometry(w, float(d), quad_segs=quad_segs)
            if polys:
                out_wkb.append(wkb_multipolygon(polys) if force_multipolygon
                               else _encode_polyset(polys))
                kept.append(True)
            else:
                kept.append(False)
        batch = _pa_mask(batch, kept) if batch.num_rows else batch
        batch = _pa_set_column(batch, "geom_wkb",
                               pa.array(out_wkb, type=pa.binary()))
        return _pa_rebuild_bbox(batch, out_wkb)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


_SHAPES_ALL = ("area", "perimeter", "ipq", "centroid", "hull", "compact")


def vector_add_shapes(ds, shapes=None, prefix: str = ""):
    """Add shape-characteristic columns (≙ reference
    ``vector_add_shapes_in_place``, core_vector_characteristics.py:152):
    area, perimeter, ipq = 4πA/P² (isoperimetric quotient), centroid_x/y
    (area-weighted), hull_area / hull_peri / hull_ratio = A/A_hull, and
    compactness = sqrt(hull_ratio · ipq). Multi-geometries aggregate
    members (summed areas/perimeters, like OGR's GetArea/Length on a
    multipolygon). Stateless vectorized-per-feature Arrow→pandas stage —
    no shuffle."""
    from buteo_ray.geom.predicates import polygon_area, polygon_centroid

    shapes = list(shapes) if shapes is not None else list(_SHAPES_ALL)
    bad = set(shapes) - set(_SHAPES_ALL)
    if bad:
        raise ValueError(f"unknown shapes {sorted(bad)}; valid: {_SHAPES_ALL}")

    def _perimeter(rings) -> float:
        total = 0.0
        for ring in rings:
            d = np.diff(np.asarray(ring)[:, :2], axis=0)
            total += float(np.hypot(d[:, 0], d[:, 1]).sum())
        return total

    def _fn(batch: pa.Table) -> pa.Table:
        out = {s: [] for s in ("area", "perimeter", "ipq", "centroid_x",
                               "centroid_y", "hull_area", "hull_peri",
                               "hull_ratio", "compactness")}
        for w in _wkbs(batch):
            polys = _member_polys(w)
            areas = [polygon_area(p) for p in polys]
            area = float(sum(areas))
            peri = float(sum(_perimeter(p) for p in polys))
            ipq = (4.0 * np.pi * area) / peri ** 2 if peri != 0 else 0.0
            # Area-weighted centroid over ALL members (OGR Centroid
            # semantics on a multipolygon), not just the first.
            cents = [polygon_centroid(p) for p in polys]
            if area != 0.0:
                cx = float(sum(a * c[0] for a, c in zip(areas, cents)) / area)
                cy = float(sum(a * c[1] for a, c in zip(areas, cents)) / area)
            else:
                cx, cy = cents[0] if cents else (float("nan"), float("nan"))
            verts = np.vstack([r[:, :2] for p in polys for r in p])
            hull = _convex_hull(verts)
            h_area = polygon_area([hull])
            h_peri = _perimeter([hull])
            h_ratio = area / h_area if h_area else 0.0
            out["area"].append(area); out["perimeter"].append(peri)
            out["ipq"].append(ipq)
            out["centroid_x"].append(cx); out["centroid_y"].append(cy)
            out["hull_area"].append(h_area); out["hull_peri"].append(h_peri)
            out["hull_ratio"].append(h_ratio)
            out["compactness"].append(float(np.sqrt(h_ratio * ipq)))
        cols = []
        if "area" in shapes:
            cols.append("area")
        if "perimeter" in shapes:
            cols.append("perimeter")
        if "ipq" in shapes:
            cols.append("ipq")
        if "centroid" in shapes:
            cols += ["centroid_x", "centroid_y"]
        if "hull" in shapes:
            cols += ["hull_area", "hull_peri", "hull_ratio"]
        if "compact" in shapes:
            cols.append("compactness")
        for c in cols:
            batch = _pa_set_column(batch, f"{prefix}{c}", _pa_f64(out[c]))
        return batch

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


_BBOX_COLS = ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")


def vector_to_extent(ds, wkb_col: str = "geom_wkb"):
    """Whole-layer extent as ONE polygon row (≙ reference
    ``vector_to_extent``, core_vector/core_vector_extent.py:19-85 — the
    GDAL file→extent-file form mapped to Dataset-in → one-row Dataset).

    Two-level and LAZY like every stage in this module: per-block bbox
    partials (4 floats per block cross the wire, never features) →
    repartition(1) → one fold batch → one row carrying (xmin, ymin,
    xmax, ymax, geom_wkb of the extent ring). Blocks use the
    precomputed bbox_* columns when present (vectorized); otherwise
    each feature's WKB is parsed (the vector-side per-feature
    convention). Empty-geometry features (NaN bbox) are skipped; a
    layer with no finite bounds at all (empty, or only empty
    geometries) yields a 0-row result."""
    from buteo_ray.geom.wkb import geom_bbox, wkb_polygon

    _empty = pa.table({c: pa.array([], type=pa.float64()) for c in _BBOX_COLS})
    _empty_fold = _empty.append_column("geom_wkb",
                                       pa.array([], type=pa.binary()))

    def _skipnan_minmax(a: np.ndarray, op) -> float:
        f = a[~np.isnan(a)]
        return float(op(f)) if f.size else float("nan")

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        if all(c in batch.column_names for c in _BBOX_COLS):
            cols = {c: batch[c].to_numpy(zero_copy_only=False)
                    for c in _BBOX_COLS}
            vals = [_skipnan_minmax(cols["bbox_xmin"], np.min),
                    _skipnan_minmax(cols["bbox_ymin"], np.min),
                    _skipnan_minmax(cols["bbox_xmax"], np.max),
                    _skipnan_minmax(cols["bbox_ymax"], np.max)]
            if any(np.isnan(v) for v in vals):  # all-NaN block
                return _empty
        else:
            # geom_bbox returns the OGR order [x_min, x_max, y_min, y_max];
            # empty geometries report NaN — drop them, never poison the
            # block's min/max
            bb = np.array([geom_bbox(w) for w in _wkbs(batch, wkb_col)],
                          dtype=np.float64)
            bb = bb[~np.isnan(bb).any(axis=1)]
            if bb.shape[0] == 0:
                return _empty
            vals = [bb[:, 0].min(), bb[:, 2].min(),
                    bb[:, 1].max(), bb[:, 3].max()]
        return pa.table({c: _pa_f64([v]) for c, v in zip(_BBOX_COLS, vals)})

    def _fold(p: pa.Table) -> pa.Table:
        if p.num_rows == 0:
            return _empty_fold
        x0 = float(np.min(p["bbox_xmin"].to_numpy(zero_copy_only=False)))
        y0 = float(np.min(p["bbox_ymin"].to_numpy(zero_copy_only=False)))
        x1 = float(np.max(p["bbox_xmax"].to_numpy(zero_copy_only=False)))
        y1 = float(np.max(p["bbox_ymax"].to_numpy(zero_copy_only=False)))
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return pa.table({
            "bbox_xmin": _pa_f64([x0]), "bbox_ymin": _pa_f64([y0]),
            "bbox_xmax": _pa_f64([x1]), "bbox_ymax": _pa_f64([y1]),
            "geom_wkb": pa.array([wkb_polygon([ring])], type=pa.binary()),
        })

    return (ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
            .repartition(1)
            .map_batches(_fold, batch_format="pyarrow", batch_size=None))


def union_by_name(datasets, strict_types: bool = False):
    """SQL ``UNION ALL BY NAME`` over heterogeneous-schema Datasets —
    the schema-evolution union a long-lived 100-TB corpus needs (old
    shards lack columns added later; per-source tables share some
    fields). The reference's layer merge (core_vector_merge.py:24-122)
    requires IDENTICAL layer definitions; this is its by-name
    generalization.

    Output column order = first-seen across inputs. Each dataset gains
    typed null columns for the names it lacks; a shared name whose
    Arrow type differs is cast to the first-seen type
    (``strict_types=True`` raises instead — fail-loud mode for
    pipelines where an implicit cast would hide producer drift).
    Map-only batch alignment + ``Dataset.union``: no shuffle, streams.
    The alignment must happen BEFORE the union — Ray does not unify
    block schemas, so a side-only column would vanish from some blocks
    downstream (same rule as asof_join's tagged union,
    streaming.py:190-198)."""
    from buteo_ray.stages.aggregate import arrow_fields

    datasets = list(datasets)
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    fields_per = [dict(arrow_fields(d)) for d in datasets]
    order: list = []
    union_fields: dict = {}
    for f in fields_per:
        for n, t in f.items():
            if n not in union_fields:
                order.append(n)
                union_fields[n] = t
            elif strict_types and union_fields[n] != t:
                raise TypeError(
                    f"column {n!r}: {union_fields[n]} vs {t} — pass "
                    "strict_types=False to cast to the first-seen type")

    def _align(have: dict):
        def _fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n in order:
                if n not in have:
                    cols[n] = pa.nulls(t.num_rows, type=union_fields[n])
                else:
                    c = t[n]
                    if c.type != union_fields[n]:
                        c = c.cast(union_fields[n])
                    cols[n] = c
            return pa.table(cols)

        return _fn

    out = datasets[0].map_batches(_align(fields_per[0]),
                                  batch_format="pyarrow",
                                  batch_size=None)
    for d, f in zip(datasets[1:], fields_per[1:]):
        out = out.union(d.map_batches(_align(f), batch_format="pyarrow",
                                      batch_size=None))
    return out
