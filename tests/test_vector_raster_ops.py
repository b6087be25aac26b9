"""Projection math, vector toolbox stages, raster long-tail kernels."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.functions.raster_ops import (
    add_border,
    dem_aspect,
    dem_hillshade,
    dem_slope,
    distance_transform,
    fill_nearest,
    resample_average,
    resample_bilinear,
    resample_max,
    resample_nearest,
)
from buteo_ray.geom.wkb import geom_bbox, parse_wkb, wkb_multipolygon, wkb_polygon
from buteo_ray.grid.projection import (
    lonlat_to_mercator,
    lonlat_to_utm,
    mercator_to_lonlat,
    reproject_bbox,
    reproject_points,
    utm_epsg_from_latlng,
    utm_to_lonlat,
    utm_zone_from_latlng,
)


def _ring(*pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.float64)


# -------------------------------------------------------------- projection

def test_mercator_known_point_and_roundtrip():
    x, y = lonlat_to_mercator(0.0, 0.0)
    assert x == 0.0 and y == pytest.approx(0.0, abs=1e-9)
    # Known value: lon 180 → 20037508.34...
    x, _ = lonlat_to_mercator(180.0, 0.0)
    assert x == pytest.approx(20037508.342789244, rel=1e-9)
    lon, lat = mercator_to_lonlat(*lonlat_to_mercator(12.49, 41.89))
    assert lon == pytest.approx(12.49, abs=1e-9)
    assert lat == pytest.approx(41.89, abs=1e-9)


def test_utm_zone_and_roundtrip():
    assert utm_zone_from_latlng(55.7, 12.5) == 33  # Copenhagen
    assert utm_epsg_from_latlng(55.7, 12.5) == 32633
    assert utm_epsg_from_latlng(-33.9, 18.4) == 32734  # Cape Town south

    e, n = lonlat_to_utm(12.5, 55.7, 33)
    # Sub-mm roundtrip within the zone.
    lon, lat = utm_to_lonlat(e, n, 33)
    assert lon == pytest.approx(12.5, abs=1e-8)
    assert lat == pytest.approx(55.7, abs=1e-8)
    # Southern hemisphere false northing.
    e2, n2 = lonlat_to_utm(18.4, -33.9, 34)
    assert n2 > 6e6
    lon2, lat2 = utm_to_lonlat(e2, n2, 34, south=True)
    assert lat2 == pytest.approx(-33.9, abs=1e-8)


def test_reproject_points_and_bbox():
    x, y = reproject_points(np.array([12.49]), np.array([41.89]), "EPSG:4326", "EPSG:3857")
    lon, lat = reproject_points(x, y, "EPSG:3857", "EPSG:4326")
    assert lon[0] == pytest.approx(12.49, abs=1e-9)
    bbox = reproject_bbox([10.0, 11.0, 50.0, 51.0], "EPSG:4326", "EPSG:3857")
    assert bbox[0] < bbox[1] and bbox[2] < bbox[3]
    back = reproject_bbox(bbox, "EPSG:3857", "EPSG:4326")
    assert back[0] == pytest.approx(10.0, abs=1e-6)


# -------------------------------------------------------------- vector ops

@pytest.fixture
def poly_ds(ray_session):
    import ray.data as rd

    rings = [
        _ring((0, 0), (4, 0), (4, 4), (0, 4)),
        _ring((10, 10), (14, 10), (14, 14), (10, 14)),
        _ring((2, 2), (6, 2), (6, 6), (2, 6)),
    ]
    rows = []
    for i, r in enumerate(rings):
        w = wkb_polygon([r])
        b = geom_bbox(w)
        rows.append({"fid": i, "cls": i % 2, "geom_wkb": w,
                     "bbox_xmin": b[0], "bbox_xmax": b[1],
                     "bbox_ymin": b[2], "bbox_ymax": b[3]})
    return rd.from_pandas(pd.DataFrame(rows))


def test_vector_clip_convex(poly_ds):
    from buteo_ray.stages.vector_ops import vector_clip_convex

    clip = _ring((1, 1), (5, 1), (5, 5), (1, 5))
    out = vector_clip_convex(poly_ds, clip).to_pandas()
    # Poly 1 (10..14) is outside → dropped; 0 and 2 clipped.
    assert sorted(out["fid"]) == [0, 2]
    from buteo_ray.geom.predicates import polygon_area

    areas = {r["fid"]: polygon_area(parse_wkb(r["geom_wkb"])[1]) for _, r in out.iterrows()}
    assert areas[0] == pytest.approx(9.0)   # [1,4]x[1,4]
    assert areas[2] == pytest.approx(9.0)   # [2,5]x[2,5]


def test_vector_dissolve(poly_ds):
    from buteo_ray.stages.vector_ops import vector_dissolve

    out = vector_dissolve(poly_ds, by="cls", geometry="bbox").to_pandas()
    assert len(out) == 2
    row0 = out[out["cls"] == 0].iloc[0]  # fids 0 and 2 → hull [0, 6]
    assert (row0["bbox_xmin"], row0["bbox_xmax"]) == (0.0, 6.0)
    glob = vector_dissolve(poly_ds, by=None, geometry="convex_hull").to_pandas()
    assert len(glob) == 1 and glob["n_features"].iloc[0] == 3


def test_multipart_roundtrip(ray_session):
    import ray.data as rd

    from buteo_ray.stages.vector_ops import multipart_to_singlepart, singlepart_to_multipart

    mp = wkb_multipolygon([[_ring((0, 0), (1, 0), (1, 1), (0, 1))],
                           [_ring((5, 5), (6, 5), (6, 6), (5, 6))]])
    b = geom_bbox(mp)
    ds = rd.from_pandas(pd.DataFrame([{"fid": 7, "geom_wkb": mp,
                                       "bbox_xmin": b[0], "bbox_xmax": b[1],
                                       "bbox_ymin": b[2], "bbox_ymax": b[3]}]))
    single = multipart_to_singlepart(ds)
    sp = single.to_pandas()
    assert len(sp) == 2 and sorted(sp["part_idx"]) == [0, 1]
    multi = singlepart_to_multipart(single, by="fid").to_pandas()
    assert len(multi) == 1 and multi["n_parts"].iloc[0] == 2


def test_fix_geometry(ray_session):
    import ray.data as rd

    from buteo_ray.stages.vector_ops import vector_fix_geometry

    open_ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=np.float64)
    cw_ring = _ring((0, 0), (0, 2), (2, 2), (2, 0))  # clockwise
    # wkb_polygon requires closed rings; build the open one manually.
    import struct

    def raw_polygon(ring):
        body = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", ring.shape[0]) + \
            np.ascontiguousarray(ring, dtype="<f8").tobytes()
        return body

    rows = [
        {"fid": 0, "geom_wkb": raw_polygon(open_ring)},
        {"fid": 1, "geom_wkb": wkb_polygon([cw_ring])},
    ]
    for r in rows:
        b = geom_bbox(r["geom_wkb"]) if r["fid"] == 1 else [0, 2, 0, 2]
        r.update({"bbox_xmin": b[0], "bbox_xmax": b[1], "bbox_ymin": b[2], "bbox_ymax": b[3]})
    out = vector_fix_geometry(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert len(out) == 2
    for w in out["geom_wkb"]:
        kind, rings = parse_wkb(w)
        ring = rings[0]
        assert (ring[0] == ring[-1]).all()  # closed
        x, y = ring[:-1, 0], ring[:-1, 1]
        assert float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0  # CCW


def test_vector_reproject_stage(poly_ds):
    from buteo_ray.stages.vector_ops import vector_reproject

    out = vector_reproject(poly_ds, "EPSG:4326", "EPSG:3857").to_pandas()
    assert len(out) == 3
    back = parse_wkb(out.iloc[0]["geom_wkb"])[1][0]
    assert back[:, 0].max() > 100000  # meters now


def test_vector_filter_by_function(poly_ds):
    from buteo_ray.stages.vector_ops import vector_filter_by_function

    out = vector_filter_by_function(
        poly_ds,
        attr_fn=lambda r: r["fid"] != 1,
        geom_fn=lambda g: g[1][0][:, 0].max() <= 6.0,
    ).to_pandas()
    assert sorted(out["fid"]) == [0, 2]


def test_vector_add_centroids(poly_ds):
    from buteo_ray.stages.vector_ops import vector_add_centroids

    out = vector_add_centroids(poly_ds).to_pandas().sort_values("fid")
    assert out["centroid_x"].iloc[0] == pytest.approx(2.0)
    assert out["area"].iloc[0] == pytest.approx(16.0)


# -------------------------------------------------------------- raster ops

def test_resample(rng):
    arr = rng.normal(size=(8, 8, 1))
    up = resample_nearest(arr, 2.0)
    assert up.shape == (16, 16, 1)
    np.testing.assert_array_equal(up[::2, ::2, :], arr)
    down = resample_average(arr, 2)
    assert down.shape == (4, 4, 1)
    np.testing.assert_allclose(down[0, 0, 0], arr[:2, :2, 0].mean())
    dmax = resample_max(arr, 2)
    np.testing.assert_allclose(dmax[0, 0, 0], arr[:2, :2, 0].max())
    bil = resample_bilinear(arr, 2.0)
    assert bil.shape == (16, 16, 1)
    # Constant array stays constant under bilinear.
    np.testing.assert_allclose(resample_bilinear(np.ones((4, 4)), 3.0), 1.0)


def test_dem_derivatives():
    # Plane with constant gradient: slope constant, aspect east-facing.
    x = np.arange(20, dtype=np.float64)
    plane = np.tile(x, (20, 1))  # rises to the east
    s = dem_slope(plane, pixel_size=1.0)
    np.testing.assert_allclose(s[5:-5, 5:-5], 45.0, atol=1e-6)
    a = dem_aspect(plane)
    # Downslope faces west (270°).
    np.testing.assert_allclose(a[5:-5, 5:-5], 270.0, atol=1e-6)
    h = dem_hillshade(plane)
    assert h.shape == plane.shape and (h >= 0).all() and (h <= 255).all()


def test_distance_transform_exact():
    mask = np.zeros((12, 16), dtype=bool)
    mask[3, 4] = True
    mask[9, 12] = True
    d = distance_transform(mask)
    yy, xx = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
    expected = np.minimum(np.hypot(yy - 3, xx - 4), np.hypot(yy - 9, xx - 12))
    np.testing.assert_allclose(d, expected, rtol=1e-12)
    capped = distance_transform(mask, max_dist=3.0)
    assert capped.max() == 3.0


def test_fill_nearest():
    arr = np.arange(25, dtype=np.float64).reshape(5, 5)
    arr[2, 2] = -9999.0
    out = fill_nearest(arr, -9999.0)
    assert out[2, 2] != -9999.0 and not np.isnan(out[2, 2])
    # Other cells untouched.
    assert out[0, 0] == 0.0 and out[4, 4] == 24.0


def test_add_border():
    arr = np.ones((3, 3))
    out = add_border(arr, 2, value=7.0)
    assert out.shape == (7, 7, 1)
    assert out[0, 0, 0] == 7.0 and out[3, 3, 0] == 1.0


def test_vector_add_fid(poly_ds):
    from buteo_ray.stages.vector_ops import vector_add_fid

    out = vector_add_fid(poly_ds, id_col="fid", out_col="stable_fid").to_pandas()
    assert out["stable_fid"].nunique() == len(out)
    out2 = vector_add_fid(poly_ds, id_col="fid", out_col="stable_fid").to_pandas()
    m = out.set_index("fid")["stable_fid"].sort_index()
    m2 = out2.set_index("fid")["stable_fid"].sort_index()
    assert (m == m2).all()  # stable across runs
