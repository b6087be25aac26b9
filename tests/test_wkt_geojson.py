"""WKT / GeoJSON codecs + vector constructors + split-by-attribute
(reference parity: core_vector_write.py:354 vector_create_from_wkt /
from_geojson / from_points, core_vector_split.py:133)."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.geom.geojson import geojson_to_wkb, wkb_to_geojson
from buteo_ray.geom.wkt import parse_wkt, wkb_to_wkt, wkt_to_wkb

CASES = [
    "POINT (1 2)",
    "POINT Z (1 2 3)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING ZM (1 2 3 4, 5 6 7 8)",
    "MULTIPOINT ((1 2), (3 4))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "POLYGON EMPTY",
    "MULTIPOINT EMPTY",
]


@pytest.mark.parametrize("wkt", CASES)
def test_wkt_wkb_roundtrip(wkt):
    b = wkt_to_wkb(wkt)
    back = wkb_to_wkt(b)
    assert wkt_to_wkb(back) == b  # byte-stable through a full cycle


def test_wkt_variants_and_errors():
    # bare and parenthesized MULTIPOINT parse identically
    assert wkt_to_wkb("MULTIPOINT (1 2, 3 4)") == wkt_to_wkb("MULTIPOINT ((1 2), (3 4))")
    kind, payload, dims = parse_wkt("point(7 8)")  # case/space tolerant
    assert kind == "point" and payload == (7.0, 8.0) and dims == "xy"
    with pytest.raises(ValueError):
        parse_wkt("POINT EMPTY")
    with pytest.raises(ValueError):
        parse_wkt("CIRCLE (0 0, 1)")
    with pytest.raises(ValueError):
        parse_wkt("POINT (1 2 3)")  # 3 coords without Z tag


GJ_CASES = [
    {"type": "Point", "coordinates": [1.0, 2.0]},
    {"type": "Point", "coordinates": [1.0, 2.0, 3.0]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
    {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]]},
    {"type": "MultiLineString", "coordinates": [
        [[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]},
    {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [1.0, 2.0]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]}]},
]


@pytest.mark.parametrize("gj", GJ_CASES)
def test_geojson_wkb_roundtrip(gj):
    b = geojson_to_wkb(gj)
    assert wkb_to_geojson(b) == gj


def test_geojson_rejects_m_and_4d():
    with pytest.raises(ValueError):
        geojson_to_wkb({"type": "Point", "coordinates": [1, 2, 3, 4]})
    with pytest.raises(ValueError):
        wkb_to_geojson(wkt_to_wkb("POINT M (1 2 3)"))


def test_vector_constructors():
    from buteo_ray.sources.vector_io import (vector_from_geojson,
                                             vector_from_points,
                                             vector_from_wkt)

    t = vector_from_wkt(["POINT (1 2)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"],
                        attrs={"name": ["a", "b"]})
    assert t.column_names[:2] == ["fid", "geom_wkb"]
    assert t["bbox_xmax"].to_pylist() == [1.0, 2.0]
    assert t["name"].to_pylist() == ["a", "b"]

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"k": 7},
         "geometry": {"type": "Point", "coordinates": [5.0, 6.0]}},
        {"type": "Feature", "properties": {"k": 9},
         "geometry": {"type": "Point", "coordinates": [7.0, 8.0]}}]}
    t2 = vector_from_geojson(fc)
    assert t2["k"].to_pylist() == [7, 9]
    assert t2["bbox_ymin"].to_pylist() == [6.0, 8.0]

    t3 = vector_from_points([0.0, 1.0], [2.0, 3.0])
    assert t3.num_rows == 2 and t3["bbox_xmin"].to_pylist() == [0.0, 1.0]


def test_vector_split_by_attribute(ray_session, tmp_path):
    import ray.data as rd

    from buteo_ray.sources.vector_io import (vector_from_points,
                                             vector_split_by_attribute)
    from buteo_ray.state.checkpoint import read_manifest

    t = vector_from_points(np.arange(20, dtype=float),
                           np.arange(20, dtype=float),
                           attrs={"cls": ["a", "b"] * 10})
    out = str(tmp_path / "split")
    written = vector_split_by_attribute(rd.from_arrow(t), "cls", out)
    assert {r["partition"] for r in written} == {"a", "b"}
    # resume: nothing rewritten
    again = vector_split_by_attribute(rd.from_arrow(t), "cls", out)
    assert again == []
    assert len(read_manifest(out)) == 2


def test_hexagonal_grid_geometry():
    """Hex lattice invariants: regular hexagon area, edge sharing between
    neighbors, full coverage of interior sample points (every point in
    the safe interior is inside >= 1 hex; lattice tiles the plane)."""
    from buteo_ray.geom.predicates import points_in_polygon
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.grid.hexgrid import create_hexagonal_grid

    s = 1.0
    t = create_hexagonal_grid([0.0, 0.0, 8.0, 8.0], s)
    polys = [parse_wkb(w)[1] for w in t["geom_wkb"].to_pylist()]

    # regular flat-top hexagon area = 3*sqrt(3)/2 * s^2
    from buteo_ray.geom.boolean import union_area
    want = 1.5 * np.sqrt(3.0)
    for rings in polys[:5]:
        area = union_area([rings])
        assert abs(area - want) < 1e-12

    # plane tiling: EVERY extent point covered exactly once (the
    # floor-based grid missed a band near xmax/ymax; regression)
    rng = np.random.default_rng(3)
    P = rng.uniform(0.0, 8.0, size=(1500, 2))
    hits = np.zeros(len(P), dtype=np.int64)
    for rings in polys:
        hits += points_in_polygon(P[:, 0], P[:, 1], rings).astype(np.int64)
    # (boundary points could double-count; random floats never land there)
    assert np.all(hits == 1)

    with pytest.raises(ValueError):
        create_hexagonal_grid([0, 0, -1, 1], 1.0)


def test_vector_add_shapes_values(ray_session):
    """Shape metrics on known figures: unit square (ipq = pi/4,
    compactness = sqrt(pi/4)), an L-shape (hull_ratio = 3/4.5), a
    multipolygon (summed areas/perimeters), and input validation."""
    import ray.data as rd

    from buteo_ray.geom.wkb import wkb_multipolygon, wkb_point, wkb_polygon
    from buteo_ray.stages.vector_ops import vector_add_shapes

    sq = [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]
    L = [np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)]
    two = [sq, [np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], float)]]
    df = pd.DataFrame({
        "fid": [1, 2, 3],
        "geom_wkb": [wkb_polygon(sq), wkb_polygon(L), wkb_multipolygon(two)],
    })
    out = (vector_add_shapes(rd.from_pandas(df)).to_pandas()
           .sort_values("fid").reset_index(drop=True))

    assert out.loc[0, "area"] == 1.0 and out.loc[0, "perimeter"] == 4.0
    np.testing.assert_allclose(out.loc[0, "ipq"], np.pi / 4)
    np.testing.assert_allclose(out.loc[0, "compactness"], np.sqrt(np.pi / 4))
    assert (out.loc[0, "centroid_x"], out.loc[0, "centroid_y"]) == (0.5, 0.5)

    # L-shape: area 3, hull = 2x2 triangle-cut... hull area = 3.5
    assert out.loc[1, "area"] == 3.0
    np.testing.assert_allclose(out.loc[1, "hull_area"], 3.5)
    np.testing.assert_allclose(out.loc[1, "hull_ratio"], 3.0 / 3.5)

    # multipolygon sums members; centroid is area-weighted over ALL
    # members (two unit squares at (0.5,0.5) and (5.5,5.5) -> (3,3))
    assert out.loc[2, "area"] == 2.0 and out.loc[2, "perimeter"] == 8.0
    np.testing.assert_allclose(
        (out.loc[2, "centroid_x"], out.loc[2, "centroid_y"]), (3.0, 3.0))

    with pytest.raises(Exception):
        vector_add_shapes(rd.from_pandas(pd.DataFrame(
            {"fid": [1], "geom_wkb": [wkb_point(0.0, 0.0)]}))).to_pandas()
    with pytest.raises(ValueError):
        vector_add_shapes(rd.from_pandas(df), shapes=["bogus"])


def test_vector_from_bbox():
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.sources.vector_io import vector_from_bbox

    t = vector_from_bbox([0.0, 4.0, 1.0, 3.0], attrs={"name": ["ext"]})
    assert t.num_rows == 1
    assert (t["bbox_xmin"][0].as_py(), t["bbox_xmax"][0].as_py()) == (0.0, 4.0)
    kind, rings = parse_wkb(t["geom_wkb"][0].as_py())
    assert kind == "polygon" and len(rings[0]) == 5


def test_vector_checks(ray_session):
    import ray.data as rd

    from buteo_ray.geom.wkb import wkb_linestring, wkb_point, wkb_polygon
    from buteo_ray.sources.vector_io import vector_from_points
    from buteo_ray.stages.vector_checks import (
        check_vector_has_attributes, check_vector_has_geometry,
        check_vector_is_line_type, check_vector_is_multipart,
        check_vector_is_point_type, check_vector_is_polygon_type,
        check_vector_is_valid, invalid_geometry_count)

    pts = rd.from_arrow(vector_from_points([0.0, 1.0], [0.0, 1.0],
                                           attrs={"name": ["a", "b"]}))
    assert check_vector_has_geometry(pts)
    assert check_vector_is_point_type(pts)
    assert not check_vector_is_line_type(pts)
    assert not check_vector_is_multipart(pts)
    assert check_vector_has_attributes(pts)
    assert check_vector_has_attributes(pts, ["name"])
    assert not check_vector_has_attributes(pts, ["missing"])
    assert check_vector_is_valid(pts)

    lines = rd.from_pandas(pd.DataFrame({
        "fid": [1], "geom_wkb": [wkb_linestring(np.array([[0, 0], [1, 1.]]))]}))
    assert check_vector_is_line_type(lines)

    # invalid geometries can't be built through the (validating) WKB
    # encoder — hand-pack raw bytes: an unclosed 4-pt ring, a 3-pt ring,
    # and garbage that fails to parse at all.
    import struct as _s

    def raw_poly(pts):
        body = _s.pack("<BII", 1, 3, 1) + _s.pack("<I", len(pts))
        for x, y in pts:
            body += _s.pack("<dd", x, y)
        return body

    unclosed = raw_poly([(0, 0), (1, 0), (1, 1), (0, 1)])
    tri = raw_poly([(0, 0), (1, 0), (0, 0)])
    mixed = rd.from_pandas(pd.DataFrame({
        "fid": [1, 2, 3, 4],
        "geom_wkb": [unclosed, tri, wkb_point(0.0, 0.0), b"\x01garbage"]}))
    assert invalid_geometry_count(mixed) == 3
    assert not check_vector_is_valid(mixed)

    # kind checks judge (not crash on) null / truncated / non-ISO blobs
    dirty = rd.from_pandas(pd.DataFrame({
        "fid": [1, 2, 3],
        "geom_wkb": [wkb_point(0.0, 0.0), None, b"\x01\x01"]}))
    assert not check_vector_is_point_type(dirty)
    assert not check_vector_is_multipart(dirty)

    # infra columns are not attributes
    assert not check_vector_has_attributes(pts, ["geom_wkb"])
    assert not check_vector_has_attributes(pts, ["bbox_xmin"])

    # invalid polygon INSIDE a collection is found
    from buteo_ray.geom.wkb import wkb_geometrycollection
    coll = wkb_geometrycollection([tri])
    cds = rd.from_pandas(pd.DataFrame({"fid": [1], "geom_wkb": [coll]}))
    assert invalid_geometry_count(cds) == 1


def test_assign_hex_matches_point_in_polygon():
    """Nearest-center hex assignment == PiP against the generated grid
    for every random point (hex lattice = its centers' Voronoi)."""
    from buteo_ray.geom.predicates import points_in_polygon
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.grid.hexgrid import assign_hex, create_hexagonal_grid

    extent, s = [0.0, 0.0, 8.0, 8.0], 1.0
    t = create_hexagonal_grid(extent, s)
    rng = np.random.default_rng(9)
    P = rng.uniform(0, 8, size=(800, 2))
    _, _, hid = assign_hex(P[:, 0], P[:, 1], extent, s)
    id_to_poly = {int(h): parse_wkb(w)[1]
                  for h, w in zip(t["hex_id"].to_pylist(),
                                  t["geom_wkb"].to_pylist())}
    for k in range(len(P)):
        assert int(hid[k]) in id_to_poly
        assert points_in_polygon(P[k:k+1, 0], P[k:k+1, 1],
                                 id_to_poly[int(hid[k])])[0]

    # out-of-extent points get the -1 sentinel, never an aliased id
    _, _, far = assign_hex(np.array([1.6, 0.5, -5.0]),
                           np.array([-1.0, 11.0, 4.0]), extent, s)
    assert list(far) == [-1, -1, -1]


def test_vector_to_extent(ray_session):
    """Both block paths (bbox columns present / WKB-parse fallback) give
    the same one-row extent, and the ring WKB matches it."""
    import ray.data as rd

    from buteo_ray.geom.wkb import geom_bbox, wkb_polygon
    from buteo_ray.stages.vector_ops import vector_to_extent

    rings = [np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]],
                      dtype=np.float64)
             for x, y, w, h in [(0, 0, 2, 1), (-5, 3, 1, 1), (4, -2, 0.5, 6)]]
    df = pd.DataFrame({"fid": range(3),
                       "geom_wkb": [wkb_polygon([r]) for r in rings]})
    out = vector_to_extent(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["bbox_xmin"], row["bbox_ymin"]) == (-5.0, -2.0)
    assert (row["bbox_xmax"], row["bbox_ymax"]) == (4.5, 4.0)
    # geom_bbox uses the OGR order [x_min, x_max, y_min, y_max]
    assert geom_bbox(row["geom_wkb"]) == [-5.0, 4.5, -2.0, 4.0]

    # vectorized path: precomputed bbox columns, multiple blocks
    bb = np.array([geom_bbox(w) for w in df["geom_wkb"]])
    df2 = df.assign(bbox_xmin=bb[:, 0], bbox_ymin=bb[:, 2],
                    bbox_xmax=bb[:, 1], bbox_ymax=bb[:, 3])
    out2 = vector_to_extent(rd.from_pandas(df2).repartition(3)).to_pandas()
    pd.testing.assert_frame_equal(
        out.drop(columns="geom_wkb"), out2.drop(columns="geom_wkb"))

    # empty layer -> 0-row result (lazy contract; no build-time raise)
    assert vector_to_extent(rd.from_pandas(df.iloc[:0])).count() == 0

    # an empty geometry in one block must not NaN-poison that block's
    # partial (regression: min/max propagated NaN, dropping real rows)
    from buteo_ray.geom.wkb import wkb_polygon as _wp
    df3 = pd.DataFrame({"fid": [0, 1, 2],
                        "geom_wkb": [_wp([]), df["geom_wkb"].iloc[0],
                                     df["geom_wkb"].iloc[2]]})
    out3 = vector_to_extent(rd.from_pandas(df3).repartition(2)).to_pandas()
    assert (out3.iloc[0]["bbox_xmin"], out3.iloc[0]["bbox_xmax"]) == (0.0, 4.5)
