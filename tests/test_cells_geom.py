"""Cell system + geometry predicates. PiP is cross-checked against an
independent winding-number oracle (FIXTURES.md §6 tie-rule pinning)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from buteo_ray.geom import (
    GridIndex,
    clip_polygon_convex,
    geom_bbox,
    parse_wkb,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    polygon_contains_polygon,
    polygon_relate,
    polygons_intersect,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)
from buteo_ray.grid import (
    cell_bounds,
    cell_children,
    cell_id,
    cell_id_to_xy,
    cell_parent,
    cell_xy,
    k_ring,
    latlon_to_morton,
    morton_decode,
    morton_encode,
)


def _ring(*pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.float64)


SQUARE = _ring((0, 0), (4, 0), (4, 4), (0, 4))
TRIANGLE = _ring((1, 1), (3, 1), (2, 3))


# ---------- cells ----------

def test_cell_xy_basic():
    x, y = cell_xy(0.0, 0.0, 1)  # 2x2 grid
    assert (x, y) == (1, 1)
    x, y = cell_xy(-90.0, -180.0, 3)
    assert (x, y) == (0, 0)
    # Edges clamp into the last cell.
    x, y = cell_xy(90.0, 180.0, 3)
    assert (x, y) == (7, 7)


def test_cell_id_roundtrip():
    lats = np.array([-89.9, -45.0, 0.0, 37.77, 89.9])
    lons = np.array([-179.9, -122.4, 0.0, 12.5, 179.9])
    for res in (0, 5, 12, 28):
        cid = cell_id(lats, lons, res)
        r, x, y = cell_id_to_xy(cid)
        assert (r == res).all()
        ex, ey = cell_xy(lats, lons, res)
        np.testing.assert_array_equal(x, ex)
        np.testing.assert_array_equal(y, ey)


def test_cell_parent_child():
    cid = cell_id(37.77, -122.4, 12)
    parent = cell_parent(cid, 5)
    r, _, _ = cell_id_to_xy(parent)
    assert int(r) == 5
    kids = cell_children(int(parent), 12)
    assert int(cid) in set(int(k) for k in kids)
    assert len(kids) == 4 ** 7


def test_cell_bounds_contains_point():
    cid = int(cell_id(37.77, -122.4, 9))
    xmin, xmax, ymin, ymax = cell_bounds(cid)
    assert xmin <= -122.4 <= xmax and ymin <= 37.77 <= ymax


def test_k_ring_counts_and_wrap():
    cid = int(cell_id(0.0, 0.0, 6))
    assert len(k_ring(cid, 0)) == 1
    assert len(k_ring(cid, 1)) == 9
    assert len(k_ring(cid, 2)) == 25
    # Antimeridian wrap: ring around x=0 includes x=2^r-1 cells.
    edge = int(cell_id(0.0, -180.0, 6))
    ring = k_ring(edge, 1)
    _, xs, _ = cell_id_to_xy(ring)
    assert (xs == (1 << 6) - 1).any()
    # Pole clamp: y out of range dropped.
    pole = int(cell_id(89.99, 0.0, 6))
    assert len(k_ring(pole, 1)) == 6


def test_morton_roundtrip():
    xs = np.array([0, 1, 5, 1000, 2**28 - 1], dtype=np.int64)
    ys = np.array([0, 3, 2, 999, 2**27], dtype=np.int64)
    code = morton_encode(xs, ys)
    dx, dy = morton_decode(code)
    np.testing.assert_array_equal(dx, xs)
    np.testing.assert_array_equal(dy, ys)


def test_morton_locality():
    base = latlon_to_morton(10.0, 10.0, 15)
    near = latlon_to_morton(10.0001, 10.0001, 15)
    far = latlon_to_morton(-80.0, 170.0, 15)
    assert abs(int(base) - int(near)) < abs(int(base) - int(far))


# ---------- WKB ----------

def test_wkb_point_roundtrip():
    kind, (x, y) = parse_wkb(wkb_point(1.5, -2.5))
    assert kind == "point" and x == 1.5 and y == -2.5


def test_wkb_polygon_roundtrip():
    wkb = wkb_polygon([SQUARE, _ring((1, 1), (2, 1), (2, 2), (1, 2))])
    kind, rings = parse_wkb(wkb)
    assert kind == "polygon" and len(rings) == 2
    np.testing.assert_array_equal(rings[0], SQUARE)
    assert geom_bbox(wkb) == [0.0, 4.0, 0.0, 4.0]


def test_wkb_multipolygon_roundtrip():
    wkb = wkb_multipolygon([[SQUARE], [TRIANGLE + 10.0]])
    kind, polys = parse_wkb(wkb)
    assert kind == "multipolygon" and len(polys) == 2
    assert geom_bbox(wkb) == [0.0, 13.0, 0.0, 13.0]


# ---------- predicates ----------

def _winding_inside(px, py, ring):
    # Independent oracle: winding number (angle-sum free formulation).
    wn = 0
    for i in range(len(ring) - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        if y0 <= py:
            if y1 > py and (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) > 0:
                wn += 1
        else:
            if y1 <= py and (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) < 0:
                wn -= 1
    return wn != 0


def test_pip_square():
    px = np.array([2.0, 5.0, 0.0, 4.0, -0.1, 2.0])
    py = np.array([2.0, 2.0, 0.0, 4.0, 2.0, 0.0])
    out = points_in_polygon(px, py, [SQUARE])
    np.testing.assert_array_equal(out, [True, False, True, True, False, True])


def test_pip_hole():
    hole = _ring((1, 1), (3, 1), (3, 3), (1, 3))
    out = points_in_polygon(np.array([2.0, 0.5]), np.array([2.0, 0.5]), [SQUARE, hole],
                            include_boundary=False)
    np.testing.assert_array_equal(out, [False, True])


@settings(max_examples=200, deadline=None)
@given(px=st.floats(-1, 5), py=st.floats(-1, 5))
def test_pip_matches_winding_oracle(px, py):
    for ring in (SQUARE, TRIANGLE):
        ours = points_in_polygon(np.array([px]), np.array([py]), [ring],
                                 include_boundary=False)[0]
        oracle = _winding_inside(px, py, ring)
        # Boundary points may legitimately differ between rules; skip them.
        on_edge = points_in_polygon(np.array([px]), np.array([py]), [ring])[0] != ours
        if not on_edge:
            assert ours == oracle


def test_polygon_area_centroid():
    assert polygon_area([SQUARE]) == 16.0
    assert polygon_area([SQUARE, _ring((1, 1), (2, 1), (2, 2), (1, 2))]) == 15.0
    assert polygon_centroid([SQUARE]) == (2.0, 2.0)


def test_polygon_predicates():
    inner = _ring((1, 1), (2, 1), (2, 2), (1, 2))
    shifted = SQUARE + 2.0  # overlaps
    disjoint = SQUARE + 10.0
    touching = SQUARE + np.array([4.0, 0.0])  # shares the x=4 edge

    assert polygons_intersect([SQUARE], [inner])
    assert polygons_intersect([SQUARE], [shifted])
    assert not polygons_intersect([SQUARE], [disjoint])
    assert polygons_intersect([SQUARE], [touching])

    assert polygon_contains_polygon([SQUARE], [inner])
    assert not polygon_contains_polygon([inner], [SQUARE])

    assert polygon_relate([SQUARE], [inner], "contains")
    assert polygon_relate([inner], [SQUARE], "within")
    assert polygon_relate([SQUARE], [touching], "touches")
    assert not polygon_relate([SQUARE], [shifted], "touches")
    assert polygon_relate([SQUARE], [shifted], "overlaps")
    assert not polygon_relate([SQUARE], [inner], "overlaps")
    assert not polygon_relate([SQUARE], [shifted], "crosses")
    with pytest.raises(ValueError):
        polygon_relate([SQUARE], [inner], "bogus")


def test_clip_convex():
    clipped = clip_polygon_convex(TRIANGLE, SQUARE)
    np.testing.assert_allclose(clipped[:-1], TRIANGLE[:-1])
    # Clip square against shifted square → 2x4 rectangle.
    out = clip_polygon_convex(SQUARE, SQUARE + np.array([2.0, 0.0]))
    assert polygon_area([out]) == 8.0
    # Disjoint → empty.
    empty = clip_polygon_convex(SQUARE, SQUARE + 10.0)
    assert empty.shape[0] == 0


# ---------- grid index ----------

def test_grid_index_points(rng):
    n = 200
    xmin = rng.uniform(-10, 10, n)
    ymin = rng.uniform(-10, 10, n)
    xmax = xmin + rng.uniform(0.1, 2.0, n)
    ymax = ymin + rng.uniform(0.1, 2.0, n)
    idx = GridIndex(xmin, xmax, ymin, ymax)

    px = rng.uniform(-12, 12, 500)
    py = rng.uniform(-12, 12, 500)
    pi, gi = idx.query_points(px, py)

    got = set(zip(pi.tolist(), gi.tolist()))
    expected = set()
    for p in range(500):
        for g in range(n):
            if xmin[g] <= px[p] <= xmax[g] and ymin[g] <= py[p] <= ymax[g]:
                expected.add((p, g))
    assert got == expected


def test_grid_index_bbox_query(rng):
    n = 100
    xmin = rng.uniform(-10, 10, n)
    ymin = rng.uniform(-10, 10, n)
    xmax = xmin + rng.uniform(0.1, 2.0, n)
    ymax = ymin + rng.uniform(0.1, 2.0, n)
    idx = GridIndex(xmin, xmax, ymin, ymax)
    got = set(idx.query_bbox(-1, 1, -1, 1).tolist())
    expected = {g for g in range(n)
                if xmax[g] >= -1 and xmin[g] <= 1 and ymax[g] >= -1 and ymin[g] <= 1}
    assert got == expected


def test_polyset_matches_points_in_polygon(rng):
    from buteo_ray.geom.polyset import PolygonSet

    polys = []
    for _ in range(30):
        cx, cy = rng.uniform(-5, 5, 2)
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 2.0, nv)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        polys.append([ring])
    pset = PolygonSet(polys)

    px = rng.uniform(-7, 7, 400)
    py = rng.uniform(-7, 7, 400)
    poly_idx = rng.integers(0, 30, 400)
    got = pset.contains_pairs(px, py, poly_idx)
    expected = np.array([
        points_in_polygon(px[i:i+1], py[i:i+1], polys[poly_idx[i]])[0]
        for i in range(400)
    ])
    np.testing.assert_array_equal(got, expected)


def test_polyset_empty():
    from buteo_ray.geom.polyset import PolygonSet

    pset = PolygonSet([])
    assert pset.contains_pairs(np.empty(0), np.empty(0), np.empty(0, dtype=int)).shape == (0,)
