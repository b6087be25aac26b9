"""Exact polygon boolean engine (geom/boolean.py) + dissolve/clip stages.

Verification strategy per VERDICT r01 item 5: results are checked
against a brute-force rasterized even-odd oracle — membership of a fine
point grid in the result must equal membership under the boolean rule
applied to the inputs (points near any edge excluded to dodge boundary
ambiguity).
"""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.geom.boolean import (
    polygon_boolean,
    polygon_union,
    union_area,
)
from buteo_ray.geom.predicates import points_in_polygon
from buteo_ray.geom.wkb import geom_bbox, parse_wkb, wkb_polygon


def _ring(*pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.float64)


def _rect(x0, y0, x1, y1):
    return _ring((x0, y0), (x1, y0), (x1, y1), (x0, y1))


def _covered(px, py, polys):
    out = np.zeros(px.shape[0], dtype=bool)
    for rings in polys:
        out |= points_in_polygon(px, py, rings)
    return out


def _grid_oracle_check(polys_a, polys_b, op, result, n=120):
    """Rasterized even-odd oracle: grid membership under the boolean rule
    on the INPUTS == membership in the RESULT."""
    all_pts = np.vstack([r for p in (list(polys_a) + list(polys_b) or [[]]) for r in p])
    lo, hi = all_pts.min(axis=0) - 0.5, all_pts.max(axis=0) + 0.5
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.ravel(), gy.ravel()

    # exclude points near any input edge (boundary ambiguity)
    near = np.zeros(px.shape[0], dtype=bool)
    for p in list(polys_a) + list(polys_b):
        for ring in p:
            a, b = ring[:-1], ring[1:]
            for i in range(len(a)):
                d = b[i] - a[i]
                ll = d @ d
                t = np.clip(((px - a[i][0]) * d[0] + (py - a[i][1]) * d[1]) / ll, 0, 1)
                dist2 = (a[i][0] + t * d[0] - px) ** 2 + (a[i][1] + t * d[1] - py) ** 2
                near |= dist2 < (0.01) ** 2
    keep = ~near

    ia = _covered(px, py, polys_a)
    ib = _covered(px, py, polys_b)
    rule = {"union": ia | ib, "intersection": ia & ib,
            "difference": ia & ~ib}[op]
    got = _covered(px, py, result)
    np.testing.assert_array_equal(got[keep], rule[keep])


def test_union_overlapping_squares():
    u = polygon_union([[_rect(0, 0, 2, 2)], [_rect(1, 1, 3, 3)]])
    assert len(u) == 1
    assert union_area(u) == pytest.approx(7.0)
    _grid_oracle_check([[_rect(0, 0, 2, 2)], [_rect(1, 1, 3, 3)]], [], "union", u)


def test_union_disjoint_and_touching():
    u = polygon_union([[_rect(0, 0, 2, 2)], [_rect(5, 5, 7, 7)]])
    assert len(u) == 2 and union_area(u) == pytest.approx(8.0)
    # shared-edge squares merge into one component
    u2 = polygon_union([[_rect(0, 0, 2, 2)], [_rect(2, 0, 4, 2)]])
    assert len(u2) == 1 and union_area(u2) == pytest.approx(8.0)


def test_union_creates_hole():
    # four rectangles forming a picture frame around (1,1)-(2,2)
    frame = [[_rect(0, 0, 3, 1)], [_rect(2, 0, 3, 3)],
             [_rect(0, 2, 3, 3)], [_rect(0, 0, 1, 3)]]
    u = polygon_union(frame)
    assert len(u) == 1 and len(u[0]) == 2  # exterior + hole
    assert union_area(u) == pytest.approx(8.0)
    _grid_oracle_check(frame, [], "union", u)


def test_difference_hole_and_split():
    d = polygon_boolean([[_rect(0, 0, 3, 3)]], [[_rect(1, 1, 2, 2)]], "difference")
    assert len(d) == 1 and len(d[0]) == 2
    assert union_area(d) == pytest.approx(8.0)
    # subtract a full-height band → two components
    d2 = polygon_boolean([[_rect(0, 0, 3, 3)]], [[_rect(1, -1, 2, 4)]], "difference")
    assert len(d2) == 2 and union_area(d2) == pytest.approx(6.0)
    _grid_oracle_check([[_rect(0, 0, 3, 3)]], [[_rect(1, -1, 2, 4)]], "difference", d2)


def test_concave_intersection():
    L = _ring((0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3))
    c = polygon_boolean([[_rect(0, 0, 2, 2)]], [[L]], "intersection")
    assert union_area(c) == pytest.approx(3.0)
    _grid_oracle_check([[_rect(0, 0, 2, 2)]], [[L]], "intersection", c)


def test_union_random_rects_vs_rasterized_oracle():
    rng = np.random.default_rng(7)
    rects = []
    for _ in range(14):
        x0, y0 = rng.uniform(0, 8, 2)
        w, h = rng.uniform(0.5, 3, 2)
        rects.append([_rect(x0, y0, x0 + w, y0 + h)])
    u = polygon_union(rects)
    _grid_oracle_check(rects, [], "union", u, n=150)
    # area must match Monte-Carlo-free exact pixel-ish bound: compare to
    # inclusion-exclusion via fine grid integral within 2%
    all_pts = np.vstack([r for p in rects for r in p])
    lo, hi = all_pts.min(axis=0), all_pts.max(axis=0)
    xs = np.linspace(lo[0], hi[0], 400)
    ys = np.linspace(lo[1], hi[1], 400)
    gx, gy = np.meshgrid(xs, ys)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    approx = _covered(gx.ravel(), gy.ravel(), rects).sum() * cell
    assert union_area(u) == pytest.approx(approx, rel=0.02)


def test_empty_and_degenerate():
    assert polygon_union([]) == []
    assert polygon_boolean([[_rect(0, 0, 1, 1)]], [[_rect(5, 5, 6, 6)]],
                           "intersection") == []


# ---------------------------------------------------------- dataset stages

def _poly_ds(rings_list, keys=None):
    import ray.data as rd

    rows = []
    for i, rings in enumerate(rings_list):
        w = wkb_polygon(rings)
        b = geom_bbox(w)
        rows.append({"fid": i, "cls": (keys[i] if keys else i % 2),
                     "geom_wkb": w, "bbox_xmin": b[0], "bbox_xmax": b[1],
                     "bbox_ymin": b[2], "bbox_ymax": b[3]})
    return rd.from_pandas(pd.DataFrame(rows))


def test_dissolve_union_stage(ray_session):
    from buteo_ray.stages.vector_ops import vector_dissolve

    ds = _poly_ds([[_rect(0, 0, 2, 2)], [_rect(1, 1, 3, 3)],
                   [_rect(10, 10, 12, 12)], [_rect(11, 11, 13, 13)]],
                  keys=[0, 0, 1, 1])
    out = vector_dissolve(ds, by="cls", geometry="union").to_pandas().sort_values("cls")
    assert len(out) == 2
    np.testing.assert_allclose(out["area"].to_numpy(), [7.0, 7.0])
    assert all(parse_wkb(w)[0] in ("polygon", "multipolygon")
               for w in out["geom_wkb"])


def test_dissolve_two_level_equals_single(ray_session):
    """VERDICT item 6: two-level plan == single-group plan on a
    many-block dataset, for every geometry mode."""
    from buteo_ray.stages.vector_ops import vector_dissolve

    rng = np.random.default_rng(3)
    rects = []
    for _ in range(40):
        x0, y0 = rng.uniform(0, 10, 2)
        w, h = rng.uniform(0.5, 2, 2)
        rects.append([_rect(x0, y0, x0 + w, y0 + h)])
    ds = _poly_ds(rects).repartition(8)
    for geometry in ("union", "convex_hull", "bbox"):
        a = vector_dissolve(ds, by=None, geometry=geometry,
                            two_level=True).to_pandas()
        b = vector_dissolve(ds, by=None, geometry=geometry,
                            two_level=False).to_pandas()
        assert len(a) == len(b) == 1
        assert a["n_features"].iloc[0] == b["n_features"].iloc[0] == 40
        assert a["area"].iloc[0] == pytest.approx(b["area"].iloc[0], rel=1e-9)
        for c in ("bbox_xmin", "bbox_xmax", "bbox_ymin", "bbox_ymax"):
            assert a[c].iloc[0] == pytest.approx(b[c].iloc[0], abs=1e-9)


def test_vector_clip_concave(ray_session):
    from buteo_ray.stages.vector_ops import vector_clip

    L = _ring((0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3))
    ds = _poly_ds([[_rect(0, 0, 2, 2)],     # clips to L-shaped area 3
                   [_rect(10, 10, 11, 11)],  # outside — dropped
                   [_rect(2, 0, 3, 1)]])     # fully inside the L arm
    out = vector_clip(ds, [[L]]).to_pandas().sort_values("fid")
    assert list(out["fid"]) == [0, 2]
    from buteo_ray.geom.boolean import union_area

    k0, p0 = parse_wkb(out["geom_wkb"].iloc[0])
    a0 = union_area([p0] if k0 == "polygon" else p0)
    assert a0 == pytest.approx(3.0)


# --------------------------- property-based fuzz (hypothesis) -------------

from hypothesis import given, settings, strategies as st


def _star(cx, cy, r, nv, seed):
    rng = np.random.default_rng(seed)
    angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
    radii = r * rng.uniform(0.5, 1.0, nv)
    pts = np.column_stack([cx + radii * np.cos(angles),
                           cy + radii * np.sin(angles)])
    return np.vstack([pts, pts[:1]])


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10**6), st.integers(2, 5),
       st.sampled_from(["union", "intersection", "difference"]))
def test_boolean_fuzz_vs_grid_oracle(seed, n_shapes, op):
    """Random mixes of rotated rects and star polygons (shared regions,
    touching edges, slivers) must agree with the even-odd grid oracle
    for every boolean op."""
    rng = np.random.default_rng(seed)
    shapes = []
    for i in range(n_shapes):
        kind = rng.integers(0, 2)
        cx, cy = rng.uniform(0, 6, 2)
        if kind == 0:
            w, h = rng.uniform(0.5, 3, 2)
            theta = rng.uniform(0, np.pi)
            R = np.array([[np.cos(theta), -np.sin(theta)],
                          [np.sin(theta), np.cos(theta)]])
            base = _rect(-w / 2, -h / 2, w / 2, h / 2) @ R.T + [cx, cy]
            shapes.append([base])
        else:
            shapes.append([_star(cx, cy, rng.uniform(0.5, 2.0),
                                 int(rng.integers(5, 9)), seed + i)])
    k = max(1, n_shapes // 2)
    a, b = shapes[:k], shapes[k:]
    if op == "union":
        result = polygon_union(a + b)
        _grid_oracle_check(a + b, [], "union", result, n=90)
    else:
        result = polygon_boolean(a, b, op)
        _grid_oracle_check(a, b, op, result, n=90)
