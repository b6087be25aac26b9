"""Geometry buffering (geom/buffer.py + stages/vector_ops.vector_buffer)
vs exact distance-band oracles: the inscribed-32-gon buffer must contain
every point within d·cos(pi/n) of the input and no point beyond d.
Reference parity target: vector/buffer.py:154-283."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.geom.boolean import union_area
from buteo_ray.geom.buffer import buffer_parsed
from buteo_ray.geom.predicates import points_in_polygon

N = 32  # quad_segs=8


def _covered(P, polys):
    ins = np.zeros(len(P), bool)
    for poly in polys:
        ins |= points_in_polygon(P[:, 0], P[:, 1], poly)
    return ins


def _dist_segs(P, pts):
    d = np.full(len(P), np.inf)
    for a, b in zip(pts[:-1], pts[1:]):
        ab = b - a
        t = np.clip(((P - a) @ ab) / (ab @ ab), 0, 1)
        proj = a + t[:, None] * ab
        d = np.minimum(d, np.hypot(*(P - proj).T))
    return d


def test_point_buffer_exact_area_and_bbox():
    polys = buffer_parsed("point", (1.0, 2.0), 0.5, quad_segs=8)
    want = 0.5 * N * 0.25 * np.sin(2 * np.pi / N)
    assert abs(union_area(polys) - want) < 1e-12
    v = polys[0][0]
    assert v[:, 0].min() == 0.5 and v[:, 0].max() == 1.5  # center ± r exact
    assert v[:, 1].min() == 1.5 and v[:, 1].max() == 2.5


def test_line_buffer_band_oracle():
    line = np.array([[0, 0], [2, 0], [2, 2]], float)
    r = 0.3
    polys = buffer_parsed("linestring", line, r)
    rng = np.random.default_rng(0)
    P = rng.uniform(-1, 4, size=(4000, 2))
    d = _dist_segs(P, line)
    ins = _covered(P, polys)
    assert np.all(ins[d <= r * np.cos(np.pi / N) - 1e-9])
    assert not np.any(ins[d > r + 1e-9])


def test_polygon_dilation_and_erosion_band_oracle():
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    rng = np.random.default_rng(1)
    P = rng.uniform(-2, 6, size=(5000, 2))
    in_sq = (P[:, 0] > 0) & (P[:, 0] < 4) & (P[:, 1] > 0) & (P[:, 1] < 4)
    db = _dist_segs(P, sq[0])  # distance to boundary

    dil = buffer_parsed("polygon", sq, 0.8)
    ins = _covered(P, dil)
    assert np.all(ins[in_sq])  # dilation contains the original
    assert np.all(ins[~in_sq & (db <= 0.8 * np.cos(np.pi / N) - 1e-9)])
    assert not np.any(ins[~in_sq & (db > 0.8 + 1e-9)])

    ero = buffer_parsed("polygon", sq, -0.8)
    assert abs(union_area(ero) - (4 - 1.6) ** 2) < 0.02  # inner square
    ins2 = _covered(P, ero)
    assert np.all(ins2[in_sq & (db >= 0.8 + 1e-9)])
    assert not np.any(ins2[~in_sq])
    assert not np.any(ins2[in_sq & (db <= 0.8 * np.cos(np.pi / N) - 1e-9)])


def test_buffer_geometrycollection():
    """Collections buffer member-wise and union the results."""
    from buteo_ray.geom.boolean import union_area
    from buteo_ray.geom.buffer import buffer_geometry
    from buteo_ray.geom.wkt import wkt_to_wkb

    polys = buffer_geometry(
        wkt_to_wkb("GEOMETRYCOLLECTION (POINT (0 0), POINT (10 0))"), 0.5)
    want = 2 * 0.5 * N * 0.25 * np.sin(2 * np.pi / N)
    assert abs(union_area(polys) - want) < 1e-12


def test_negative_buffer_eats_small_polygon():
    tiny = [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]
    assert buffer_parsed("polygon", tiny, -0.8) == []
    assert buffer_parsed("point", (0.0, 0.0), -1.0) == []
    with pytest.raises(ValueError):
        buffer_parsed("point", (0.0, 0.0), 0.0)


def test_vector_buffer_stage_attribute_mode(ray_session):
    """Dataset stage: per-feature attribute distances, bbox rebuild,
    multipolygon output, erosion-drops-empty rows."""
    import ray.data as rd

    from buteo_ray.geom.wkb import parse_wkb, wkb_point, wkb_polygon
    from buteo_ray.stages.vector_ops import vector_buffer

    sq = [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]
    df = pd.DataFrame({
        "fid": [1, 2, 3],
        "geom_wkb": [wkb_point(10.0, 10.0), wkb_polygon(sq), wkb_polygon(sq)],
        "dist": [2.0, 0.5, -0.8],
        "bbox_xmin": [10.0, 0, 0], "bbox_xmax": [10.0, 1, 1],
        "bbox_ymin": [10.0, 0, 0], "bbox_ymax": [10.0, 1, 1],
    })
    out = (vector_buffer(rd.from_pandas(df), distance="dist").to_pandas()
           .sort_values("fid").reset_index(drop=True))
    assert out["fid"].tolist() == [1, 2]  # fid 3 eroded away entirely
    assert out.loc[0, "bbox_xmin"] == 8.0 and out.loc[0, "bbox_xmax"] == 12.0
    kind, _ = parse_wkb(out.loc[1, "geom_wkb"])
    assert kind == "multipolygon"  # force_multipolygon default
    assert out.loc[1, "bbox_xmin"] == -0.5 and out.loc[1, "bbox_ymax"] == 1.5
