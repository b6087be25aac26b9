"""Line/multipoint/collection WKB support + Z/M dimensionality
(reference parity: utils_translate.py:784-1050 geometry-type tables,
core_vector/conversion/multipart.py:58-297, dimensionality.py:222-393)."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.geom.wkb import (
    encode_geom,
    geom_bbox,
    geom_vertices,
    parse_wkb,
    parse_wkb_dims,
    wkb_geometrycollection,
    wkb_linestring,
    wkb_multilinestring,
    wkb_multipoint,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)


def _ring(*pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.float64)


LINE = np.array([[0.0, 0.0], [3.0, 1.0], [5.0, -2.0]])
LINE2 = np.array([[10.0, 10.0], [12.0, 14.0]])


def test_linestring_roundtrip():
    w = wkb_linestring(LINE)
    kind, pts = parse_wkb(w)
    assert kind == "linestring"
    np.testing.assert_array_equal(pts, LINE)
    assert geom_bbox(w) == [0.0, 5.0, -2.0, 1.0]


def test_multilinestring_roundtrip():
    w = wkb_multilinestring([LINE, LINE2])
    kind, lines = parse_wkb(w)
    assert kind == "multilinestring" and len(lines) == 2
    np.testing.assert_array_equal(lines[1], LINE2)
    assert geom_bbox(w) == [0.0, 12.0, -2.0, 14.0]


def test_multipoint_roundtrip():
    pts = np.array([[1.0, 2.0], [-3.0, 4.0], [5.0, 6.0]])
    w = wkb_multipoint(pts)
    kind, got = parse_wkb(w)
    assert kind == "multipoint"
    np.testing.assert_array_equal(got, pts)
    assert geom_bbox(w) == [-3.0, 5.0, 2.0, 6.0]


def test_geometrycollection_roundtrip():
    w = wkb_geometrycollection([
        wkb_point(1.0, 2.0),
        wkb_linestring(LINE),
        wkb_polygon([_ring((0, 0), (1, 0), (1, 1), (0, 1))]),
    ])
    kind, members = parse_wkb(w)
    assert kind == "geometrycollection"
    # collection members are (kind, payload, dims) triples
    assert [m[0] for m in members] == ["point", "linestring", "polygon"]
    assert [m[2] for m in members] == ["xy", "xy", "xy"]
    assert geom_bbox(w) == [0.0, 5.0, -2.0, 2.0]
    # re-encode is byte-identical
    assert encode_geom(kind, members) == w


@pytest.mark.parametrize("dims,coords", [
    ("xyz", (1.0, 2.0, 3.0)),
    ("xym", (1.0, 2.0, 9.0)),
    ("xyzm", (1.0, 2.0, 3.0, 9.0)),
])
def test_zm_point_roundtrip(dims, coords):
    w = wkb_point(*coords, dims=dims)
    kind, payload, got_dims = parse_wkb_dims(w)
    assert (kind, got_dims) == ("point", dims)
    assert payload == coords


def test_zm_linestring_and_polygon():
    line3 = np.column_stack([LINE, [7.0, 8.0, 9.0]])
    w = wkb_linestring(line3, dims="xyz")
    kind, pts, dims = parse_wkb_dims(w)
    assert (kind, dims) == ("linestring", "xyz")
    np.testing.assert_array_equal(pts, line3)
    # bbox ignores z
    assert geom_bbox(w) == [0.0, 5.0, -2.0, 1.0]

    ring = _ring((0, 0), (2, 0), (2, 2), (0, 2))
    ring3 = np.column_stack([ring, np.full(len(ring), 5.0)])
    wp = wkb_polygon([ring3], dims="xyz")
    kind, rings, dims = parse_wkb_dims(wp)
    assert dims == "xyz" and rings[0].shape == (5, 3)


def test_parse_rejects_ewkb():
    import struct

    bad = struct.pack("<BI", 1, 0x80000001) + struct.pack("<ddd", 1, 2, 3)
    with pytest.raises(ValueError, match="EWKB"):
        parse_wkb(bad)


def test_geom_vertices_all_kinds():
    assert geom_vertices("point", (1.0, 2.0)).shape == (1, 2)
    assert geom_vertices("multilinestring", [LINE, LINE2]).shape == (5, 2)
    w = wkb_geometrycollection([wkb_point(0, 0), wkb_linestring(LINE)])
    kind, members = parse_wkb(w)
    assert geom_vertices(kind, members).shape == (4, 2)


# ---------------------------------------------------------- dataset stages

def _geom_ds(wkbs, **extra_cols):
    import ray.data as rd

    rows = []
    for i, w in enumerate(wkbs):
        b = geom_bbox(w)
        row = {"fid": i, "geom_wkb": w, "bbox_xmin": b[0], "bbox_xmax": b[1],
               "bbox_ymin": b[2], "bbox_ymax": b[3]}
        for k, v in extra_cols.items():
            row[k] = v[i]
        rows.append(row)
    return rd.from_pandas(pd.DataFrame(rows))


def test_explode_collect_lines(ray_session):
    from buteo_ray.stages.vector_ops import (
        multipart_to_singlepart,
        singlepart_to_multipart,
    )

    ds = _geom_ds([wkb_multilinestring([LINE, LINE2]),
                   wkb_multipoint(np.array([[1.0, 1.0], [2.0, 2.0]]))],
                  key=["a", "b"])
    single = multipart_to_singlepart(ds).to_pandas()
    assert len(single) == 4
    kinds = sorted(parse_wkb(w)[0] for w in single["geom_wkb"])
    assert kinds == ["linestring", "linestring", "point", "point"]

    # collect back per key: homogeneous kinds promote to the multi type
    back = singlepart_to_multipart(
        _geom_ds([wkb_linestring(LINE), wkb_linestring(LINE2)], key=["k", "k"]),
        by="key").to_pandas()
    assert parse_wkb(back["geom_wkb"].iloc[0])[0] == "multilinestring"

    mixed = singlepart_to_multipart(
        _geom_ds([wkb_linestring(LINE), wkb_point(1.0, 2.0)], key=["k", "k"]),
        by="key").to_pandas()
    assert parse_wkb(mixed["geom_wkb"].iloc[0])[0] == "geometrycollection"


def test_reproject_line_keeps_z(ray_session):
    from buteo_ray.stages.vector_ops import vector_reproject

    line3 = np.column_stack([LINE + 10.0, [7.0, 8.0, 9.0]])
    ds = _geom_ds([wkb_linestring(line3, dims="xyz")])
    out = vector_reproject(ds, "EPSG:4326", "EPSG:3857").to_pandas()
    kind, pts, dims = parse_wkb_dims(out["geom_wkb"].iloc[0])
    assert (kind, dims) == ("linestring", "xyz")
    np.testing.assert_array_equal(pts[:, 2], [7.0, 8.0, 9.0])  # z untouched
    assert abs(pts[0, 0]) > 1e5  # x actually projected to meters


def test_change_dimensionality(ray_session):
    from buteo_ray.stages.vector_ops import vector_change_dimensionality

    ds = _geom_ds([wkb_linestring(LINE), wkb_point(1.0, 2.0)])
    up = vector_change_dimensionality(ds, "xyz", z_value=4.5)
    got = up.to_pandas()
    for w in got["geom_wkb"]:
        kind, payload, dims = parse_wkb_dims(w)
        assert dims == "xyz"
        v = geom_vertices(kind, payload)
        np.testing.assert_array_equal(v[:, 2], 4.5)
    # drop back down: exact original bytes for the linestring
    down = vector_change_dimensionality(up, "xy").to_pandas().sort_values("fid")
    assert down["geom_wkb"].iloc[0] == wkb_linestring(LINE)
    # xyz -> xyzm adds m, keeps z
    zm = vector_change_dimensionality(up, "xyzm", m_value=-1.0).to_pandas()
    for w in zm["geom_wkb"]:
        kind, payload, dims = parse_wkb_dims(w)
        v = geom_vertices(kind, payload)
        assert dims == "xyzm"
        np.testing.assert_array_equal(v[:, 2], 4.5)
        np.testing.assert_array_equal(v[:, 3], -1.0)


def test_fix_geometry_lines_pass(ray_session):
    from buteo_ray.stages.vector_ops import vector_fix_geometry

    ds = _geom_ds([wkb_linestring(LINE), wkb_point(3.0, 4.0)])
    out = vector_fix_geometry(ds).to_pandas()
    assert len(out) == 2
    assert sorted(parse_wkb(w)[0] for w in out["geom_wkb"]) == ["linestring", "point"]


def test_change_multitype_lines(ray_session):
    from buteo_ray.stages.vector_ops import vector_change_multitype

    ds = _geom_ds([wkb_linestring(LINE)])
    multi = vector_change_multitype(ds, "multi").to_pandas()
    assert parse_wkb(multi["geom_wkb"].iloc[0])[0] == "multilinestring"
    single = vector_change_multitype(
        _geom_ds([wkb_multilinestring([LINE])]), "single").to_pandas()
    assert parse_wkb(single["geom_wkb"].iloc[0])[0] == "linestring"
