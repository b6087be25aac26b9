"""Regression tests pinning the round-1 review fixes."""

import numpy as np
import pandas as pd
import pytest


def test_partitioned_join_multipolygon_second_member(ray_session):
    """A point inside the SECOND member of a multipolygon AOI must join
    (the bbox prune previously used only the first ring)."""
    import ray.data as rd

    from buteo_ray.geom.wkb import geom_bbox, wkb_multipolygon
    from buteo_ray.stages.join_partitioned import cell_partitioned_pip_join

    def _ring(*pts):
        return np.asarray(list(pts) + [pts[0]], dtype=np.float64)

    mp = wkb_multipolygon([
        [_ring((0, 0), (1, 0), (1, 1), (0, 1))],
        [_ring((10, 10), (11, 10), (11, 11), (10, 11))],
    ])
    b = geom_bbox(mp)
    aoi = pd.DataFrame([{"aoi_id": 0, "geom_wkb": mp,
                         "bbox_xmin": b[0], "bbox_xmax": b[1],
                         "bbox_ymin": b[2], "bbox_ymax": b[3]}])
    pts = pd.DataFrame({"doc_id": [1, 2, 3],
                        "lon": [0.5, 10.5, 50.0],
                        "lat": [0.5, 10.5, 50.0]})
    out = cell_partitioned_pip_join(rd.from_pandas(pts), rd.from_pandas(aoi),
                                    res=4).to_pandas()
    assert set(out["doc_id"]) == {1, 2}


def test_border_strategy2_unique_tile_keys(ray_session, rng):
    from buteo_ray.sources.raster import raster_from_array, raster_stack, raster_to_array

    arr = rng.normal(size=(300, 300)).astype(np.float32)
    ds = raster_from_array(arr, tile_size=256, border_strategy=2)
    pdf = ds.to_pandas()
    keys = list(zip(pdf["tile_x"], pdf["tile_y"]))
    assert len(keys) == len(set(keys))  # no collisions

    # Stack works (needs exactly 2 rows per tile key).
    other = raster_from_array(arr * 2, tile_size=256, border_strategy=2)
    stacked = raster_stack(raster_from_array(arr, tile_size=256, border_strategy=2), other)
    assert stacked.count() == len(keys)


def test_minhash_short_docs_not_near_dups(ray_session):
    import ray.data as rd

    from buteo_ray.stages.dedup import minhash_lsh_pairs

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["a", "b", "hi", "zz"]})
    pairs = minhash_lsh_pairs(rd.from_pandas(df), threshold=0.5).to_pandas()
    assert len(pairs) == 0  # distinct short docs are NOT near-dups

    df2 = pd.DataFrame({"doc_id": [0, 1], "text": ["hi", "hi"]})
    pairs2 = minhash_lsh_pairs(rd.from_pandas(df2), threshold=0.5).to_pandas()
    assert len(pairs2) == 1  # identical short docs still collide


def test_stratified_sampling_deterministic_across_runs(ray_session):
    import ray.data as rd

    from buteo_ray.stages.selection import sampling_stratified

    df = pd.DataFrame({"id": np.arange(1000), "cls": [f"c{i % 4}" for i in range(1000)]})
    a = sampling_stratified(rd.from_pandas(df), "cls", 50, seed=7).to_pandas()
    b = sampling_stratified(rd.from_pandas(df), "cls", 50, seed=7).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])


def test_media_resize_aspect(ray_session):
    import ray.data as rd

    from buteo_ray.stages.multimodal import decode_media, synth_media_table

    media = rd.from_arrow(synth_media_table(5, width=64, height=48))
    out = decode_media(media, decoder="fake", target=(32, 100)).to_pandas()
    assert (out["dec_height"] == 32).all() and (out["dec_width"] == 100).all()


def test_multitype_conversion(ray_session):
    import ray.data as rd

    from buteo_ray.geom.wkb import geom_bbox, parse_wkb, wkb_polygon
    from buteo_ray.stages.vector_ops import vector_change_multitype

    def _ring(*pts):
        return np.asarray(list(pts) + [pts[0]], dtype=np.float64)

    w = wkb_polygon([_ring((0, 0), (1, 0), (1, 1), (0, 1))])
    b = geom_bbox(w)
    ds = rd.from_pandas(pd.DataFrame([{"fid": 0, "geom_wkb": w,
                                       "bbox_xmin": b[0], "bbox_xmax": b[1],
                                       "bbox_ymin": b[2], "bbox_ymax": b[3]}]))
    multi = vector_change_multitype(ds, "multi")
    assert parse_wkb(multi.to_pandas()["geom_wkb"].iloc[0])[0] == "multipolygon"
    single = vector_change_multitype(multi, "single")
    assert parse_wkb(single.to_pandas()["geom_wkb"].iloc[0])[0] == "polygon"


# ----------------------------- round-2 review regressions -----------------


def _rect(x0, y0, x1, y1):
    return np.asarray([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                      dtype=np.float64)


def test_union_float_shared_edge():
    """Numerically-collinear shared edges (rotated floats) must still be
    split and welded — the old tol² parallel test skipped them."""
    from buteo_ray.geom.boolean import polygon_union, union_area

    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    a = _rect(0, 0, 2, 2) @ R.T
    b = _rect(2, 0, 4, 2) @ R.T  # shares the rotated edge x=2 exactly-ish
    u = polygon_union([[a], [b]])
    assert len(u) == 1
    assert union_area(u) == pytest.approx(8.0, rel=1e-9)


def test_hole_nesting_concave():
    """A C-shaped hole whose vertex mean falls inside an island exterior
    must still nest under its true containing exterior."""
    from buteo_ray.geom.boolean import polygon_boolean, union_area

    outer = _rect(0, 0, 10, 10)
    # C-shaped cut: open square annulus around the island at (4..6)
    c_cut = [
        [_rect(2, 2, 8, 3)],   # bottom bar
        [_rect(2, 3, 3, 8)],   # left bar
        [_rect(2, 7, 8, 8)],   # top bar
        [_rect(7, 3, 8, 7)],   # right bar (closes the ring → true hole)
    ]
    from buteo_ray.geom.boolean import polygon_union

    cut = polygon_union(c_cut)
    d = polygon_boolean([[outer]], cut, "difference")
    # island (4..6 core) survives inside the hole as its own exterior
    areas = sorted(round(union_area([p]), 6) for p in d)
    # outer minus ring + island: outer=100, ring area=20, island=(3..7)^2 minus bars → 16
    assert sum(areas) == pytest.approx(100 - 20)
    assert len(d) == 2  # big poly with hole + island


def test_mixed_dims_collect(ray_session):
    """xy + xyz geometries collected per key normalize to the widest
    dims instead of crashing (round-2 review finding)."""
    import ray.data as rd

    from buteo_ray.geom.wkb import (
        geom_bbox,
        parse_wkb_dims,
        wkb_linestring,
    )
    from buteo_ray.stages.vector_ops import singlepart_to_multipart

    l_xy = wkb_linestring(np.array([[0.0, 0.0], [1.0, 1.0]]))
    l_xyz = wkb_linestring(np.array([[2.0, 2.0, 9.0], [3.0, 3.0, 9.0]]), dims="xyz")
    rows = []
    for w in (l_xy, l_xyz):
        b = geom_bbox(w)
        rows.append({"key": "k", "geom_wkb": w, "bbox_xmin": b[0],
                     "bbox_xmax": b[1], "bbox_ymin": b[2], "bbox_ymax": b[3]})
    out = singlepart_to_multipart(rd.from_pandas(pd.DataFrame(rows)), by="key").to_pandas()
    kind, payload, dims = parse_wkb_dims(out["geom_wkb"].iloc[0])
    assert (kind, dims) == ("multilinestring", "xyz")
    # the xy member gained z=0.0
    zs = sorted(float(l[0, 2]) for l in payload)
    assert zs == [0.0, 9.0]


def test_collection_mixed_member_dims_roundtrip():
    """A collection tagged xy holding a Z point (valid in the wild) must
    parse, re-encode byte-identically, and explode with member dims."""
    from buteo_ray.geom.wkb import (
        encode_geom,
        parse_wkb_dims,
        wkb_geometrycollection,
        wkb_linestring,
        wkb_point,
    )

    w = wkb_geometrycollection([
        wkb_point(1.0, 2.0, 3.0, dims="xyz"),
        wkb_linestring(np.array([[0.0, 0.0], [1.0, 0.0]])),
    ])
    kind, members, dims = parse_wkb_dims(w)
    assert kind == "geometrycollection" and dims == "xy"
    assert [(m[0], m[2]) for m in members] == [("point", "xyz"),
                                              ("linestring", "xy")]
    assert encode_geom(kind, members, dims) == w

    from buteo_ray.stages.vector_ops import _explode_members

    parts = _explode_members(kind, members, dims)
    assert [(k, d) for k, _, d in parts] == [("point", "xyz"),
                                            ("linestring", "xy")]


def test_multipoint_member_dims_mismatch_rejected():
    import struct

    from buteo_ray.geom.wkb import parse_wkb, wkb_point

    # hand-build a MULTIPOINT (xy tag) containing a Z point
    bad = struct.pack("<BII", 1, 4, 1) + wkb_point(1.0, 2.0, 3.0, dims="xyz")
    with pytest.raises(ValueError, match="dims"):
        parse_wkb(bad)


def test_dissolve_two_level_null_keys(ray_session):
    """Null group keys survive the two-level partial stage (pandas
    dropna default would silently drop them)."""
    import ray.data as rd

    from buteo_ray.geom.wkb import geom_bbox, wkb_polygon
    from buteo_ray.stages.vector_ops import vector_dissolve

    rows = []
    for i, key in enumerate(["a", None, None]):
        w = wkb_polygon([_rect(3 * i, 0, 3 * i + 2, 2)])
        b = geom_bbox(w)
        rows.append({"grp": key, "geom_wkb": w, "bbox_xmin": b[0],
                     "bbox_xmax": b[1], "bbox_ymin": b[2], "bbox_ymax": b[3]})
    ds = rd.from_pandas(pd.DataFrame(rows))
    two = vector_dissolve(ds, by="grp", geometry="bbox", two_level=True).to_pandas()
    one = vector_dissolve(ds, by="grp", geometry="bbox", two_level=False).to_pandas()
    assert int(two["n_features"].sum()) == int(one["n_features"].sum()) == 3
    assert len(two) == len(one) == 2


def test_hash_join_auto_collision_and_suffix(ray_session):
    import ray.data as rd

    from buteo_ray.stages.join_partitioned import hash_join_auto

    left = rd.from_items([{"k": i, "v": i * 2} for i in range(5)])
    right = rd.from_items([{"rk": i, "v": i * 10} for i in range(5)])
    with pytest.raises(Exception, match="collides"):
        hash_join_auto(left, right, "k", "rk").to_pandas()
    out = hash_join_auto(left, right, "k", "rk", right_suffix="_r").to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert len(out) == 5 and (out.sort_values("k")["v_r"].to_numpy()
                              == np.arange(5) * 10).all()


def test_shallow_angle_crossing_not_dropped():
    """Second-review regression: a nearly-parallel GENUINE crossing must
    still split (the parallel epsilon is a dimensionless sine bound, not
    the span-scaled tol)."""
    from buteo_ray.geom.boolean import polygon_boolean, union_area

    big = _rect(0, 0, 1e5, 2)
    theta = 5e-6
    c = np.array([5e4, 1.0])
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    rot = (big - c) @ R.T + c
    inter = polygon_boolean([[big]], [[rot]], "intersection")
    assert union_area(inter) > 0.9 * 2e5 * 0.9  # most of the strip overlaps


def test_nested_collection_dimensionality(ray_session):
    """Nested collections: members convert from their OWN dims at every
    nesting level (no crash, no silent z loss)."""
    import ray.data as rd

    from buteo_ray.geom.wkb import (
        geom_bbox,
        geom_vertices,
        parse_wkb_dims,
        wkb_geometrycollection,
        wkb_point,
    )
    from buteo_ray.stages.vector_ops import vector_change_dimensionality

    inner = wkb_geometrycollection([wkb_point(1.0, 2.0, 9.0, dims="xyz"),
                                    wkb_point(3.0, 4.0)])
    outer = wkb_geometrycollection([inner, wkb_point(5.0, 6.0)])
    b = geom_bbox(outer)
    ds = rd.from_pandas(pd.DataFrame([{
        "fid": 0, "geom_wkb": outer, "bbox_xmin": b[0], "bbox_xmax": b[1],
        "bbox_ymin": b[2], "bbox_ymax": b[3]}]))
    out = vector_change_dimensionality(ds, "xyz", z_value=-5.0).to_pandas()
    kind, members, dims = parse_wkb_dims(out["geom_wkb"].iloc[0])
    assert (kind, dims) == ("geometrycollection", "xyz")
    ik, ip, idm = members[0]
    assert idm == "xyz"
    zs = sorted(float(geom_vertices(k, p)[0, 2]) for k, p, d in ip)
    assert zs == [-5.0, 9.0]  # real z preserved, missing z filled


def test_hash_join_auto_suffixed_collision_rejected(ray_session):
    import ray.data as rd

    from buteo_ray.stages.join_partitioned import hash_join_auto

    left = rd.from_items([{"k": i, "v": i, "v_r": i} for i in range(3)])
    right = rd.from_items([{"rk": i, "v": i * 10} for i in range(3)])
    with pytest.raises(Exception, match="still collides"):
        hash_join_auto(left, right, "k", "rk", right_suffix="_r").to_pandas()


def test_vectorize_union_merge_tree(ray_session):
    """Disjoint-heavy exact vectorize still produces correct union via
    the balanced merge tree (many parts, none weldable)."""
    from buteo_ray.functions.vectorize import raster_vectorize
    from buteo_ray.geom.boolean import union_area
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.sources.raster import raster_from_array

    arr = np.zeros((16, 16))
    arr[::2, ::2] = 3.0  # 64 isolated single-pixel regions of value 3
    ds = raster_from_array(arr, tile_size=8)
    out = raster_vectorize(ds, exact_geometry=True).to_pandas()
    row = out[out["value"] == 3.0].iloc[0]
    kind, payload = parse_wkb(row["geom_wkb"])
    polys = [payload] if kind == "polygon" else payload
    assert len(polys) == 64
    assert union_area(polys) == pytest.approx(64.0)


# ----------------------------- round-2 third-pass review ------------------


def test_knn_cells_ring_wrap_no_duplicates(ray_session):
    """Ring wrap (2*ring+1 > 2^res) must not emit duplicate candidate
    pairs — duplicates would consume top-k slots."""
    import ray.data as rd

    from buteo_ray.stages.knn import knn_broadcast, knn_cells

    rng = np.random.default_rng(0)
    n = 60
    ids = np.arange(n, dtype=np.int64)
    lat = rng.uniform(-40, 40, n)
    lon = rng.uniform(-170, 170, n)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "lat": lat, "lon": lon}))
    qids = ids[:5]
    # res=3 (8 cells/axis), ring=4 → 2*4+1 = 9 > 8: x wraps onto itself
    out = knn_cells(ds, qids, lat[:5], lon[:5], k=4, res=3, ring=4,
                    metric="planar2").to_pandas()
    for q, g in out.groupby("query_id"):
        assert g["neighbor_id"].is_unique, f"duplicate neighbors for {q}"
    # ring=4 at res=3 covers the whole globe → must equal brute force
    brute = knn_broadcast(ds, qids, lat[:5], lon[:5], k=4,
                          metric="planar2").to_pandas()
    a = out.sort_values(["query_id", "dist", "neighbor_id"]).reset_index(drop=True)
    b = brute.sort_values(["query_id", "dist", "neighbor_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["query_id", "neighbor_id"]],
                                  b[["query_id", "neighbor_id"]])


def test_checkpoint_resume_nonstring_partitions(ray_session, tmp_path):
    """Resume must skip completed partitions even for float/bool
    partition columns (Arrow's cast-to-string disagrees with str())."""
    import ray.data as rd

    from buteo_ray.state.checkpoint import (
        filter_completed,
        read_partitioned,
        write_partitioned_resumable,
    )

    out_dir = str(tmp_path / "ckpt")
    df = pd.DataFrame({"part": [1.5, 1.5, 2.5], "v": [1, 2, 3]})
    write_partitioned_resumable(rd.from_pandas(df), out_dir, "part")
    remaining = filter_completed(rd.from_pandas(df), "part", out_dir).to_pandas()
    assert len(remaining) == 0  # every partition already complete
    back = read_partitioned(out_dir)
    assert back.count() == 3


def test_read_partitioned_empty_dir(ray_session, tmp_path):
    from buteo_ray.state.checkpoint import read_partitioned

    d = str(tmp_path / "empty")
    import os

    os.makedirs(d, exist_ok=True)
    assert read_partitioned(d).count() == 0


def test_contains_with_swallowed_hole():
    """A polygon does NOT contain B when B covers one of A's holes."""
    from buteo_ray.geom.predicates import polygon_contains_polygon, polygon_relate

    A = [_rect(0, 0, 10, 10), _rect(4, 4, 6, 6)[::-1]]  # square with hole
    B = [_rect(3, 3, 7, 7)]
    assert not polygon_contains_polygon(A, B)
    assert not polygon_relate(A, B, "contains")
    # B inside A avoiding the hole IS contained
    C = [_rect(1, 1, 3, 3)]
    assert polygon_contains_polygon(A, C)


def test_rasterize_edge_tiles_clip_to_grid(ray_session):
    import ray.data as rd

    from buteo_ray.sources.raster import raster_to_array, rasterize_points
    from buteo_ray.stages.tiling import GridSpec

    grid = GridSpec(origin_x=0.0, origin_y=10.0, pixel_width=1.0,
                    pixel_height=-1.0, width=12, height=10, tile_size=8)
    pts = pd.DataFrame({"lon": [11.5, 1.5], "lat": [0.5, 9.5]})
    out = rasterize_points(rd.from_pandas(pts), grid).to_pandas()
    # edge tile (tx=1) is clipped to width 4, not padded to 8
    edge = out[out["tile_x"] == 1].iloc[0]
    assert edge["width"] == 4
    arr = raster_to_array(rd.from_pandas(out))
    assert arr.shape[:2] == (10, 12)
    assert np.nansum(arr) == 2.0  # absent (point-free) tiles read as NaN


# ---------------------------------------------------------------- 4th pass


def test_kernel_weights_zero_edge_distance():
    """edge_distance=0 means no feathering → uniform weights, not NaN."""
    from buteo_ray.functions.array_patches import get_kernel_weights

    k = get_kernel_weights(8, 0)
    assert np.all(np.isfinite(k))
    assert np.all(k == 1.0)


def test_integer_noise_clipped_not_wrapped():
    """Additive noise on integer imagery: computed in float then rounded and
    clipped back — never truncated to zero or wrapped past the dtype range."""
    from buteo_ray.functions.augmentation import (
        augmentation_noise_normal,
        augmentation_noise_uniform,
    )

    X = np.zeros((16, 16, 1), np.uint8)
    out = augmentation_noise_uniform(X, np.random.default_rng(0), amount=3.0)
    assert out.dtype == np.uint8
    assert out.max() <= 3          # no wrap to 255 from negative noise
    assert out.max() > 0           # sub-integer noise not silently dropped

    X2 = np.full((16, 16, 1), 250, np.uint8)
    out2 = augmentation_noise_normal(X2, np.random.default_rng(1), std=20.0)
    assert out2.dtype == np.uint8 and int(out2.max()) <= 255
    assert out2.min() < 250        # noise actually applied


def test_cutmix_degenerate_size_range():
    """min_size == max_size (or a tiny sample) must not raise in
    rng.integers(low, high)."""
    from buteo_ray.functions.augmentation import augmentation_cutmix

    rng = np.random.default_rng(0)
    X_t = np.zeros((12, 12, 2))
    X_s = np.ones((12, 12, 2))
    y_t = np.array([1.0, 0.0])
    y_s = np.array([0.0, 1.0])
    X, y = augmentation_cutmix(X_t, y_t, X_s, y_s, rng,
                               min_size=0.5, max_size=0.5)
    assert X.shape == X_t.shape
    assert np.isclose(y.sum(), 1.0)
    # 2x2 sample: int(h*min) == int(h*max) == 0
    X2, _ = augmentation_cutmix(np.zeros((2, 2, 1)), y_t,
                                np.ones((2, 2, 1)), y_s, rng)
    assert X2.sum() >= 1  # a >=1x1 patch was pasted


def test_spatial_label_smoothing_preserves_argmax(rng):
    """preserve_class boosts the center weight so the per-pixel winning
    class never flips; rows stay a distribution (sum 1)."""
    from buteo_ray.functions.augmentation import spatial_label_smoothing

    cls = (rng.random((20, 20)) > 0.5).astype(np.int64)
    y = np.zeros((20, 20, 2))
    y[np.arange(20)[:, None], np.arange(20)[None, :], cls] = 1.0
    out = spatial_label_smoothing(y, radius=1.0)
    assert np.allclose(out.sum(axis=2), 1.0)
    assert np.array_equal(out.argmax(axis=2), cls)
    # smoothing actually happened at class boundaries
    assert out.max() < 1.0 or np.all(cls == cls[0, 0])


def test_column_stats_population_std(ray_session):
    """column_stats std is the population (ddof=0) estimator, matching the
    array scalers' np.nanstd."""
    import ray.data as rd

    from buteo_ray.functions.scalers import column_stats

    vals = np.array([1.0, 2.0, 3.0, 10.0])
    stats = column_stats(rd.from_pandas(pd.DataFrame({"v": vals})), "v")
    assert np.isclose(stats["std"], np.std(vals))  # ddof=0


def test_warp_bilinear_coverage_matches_nearest():
    """Bilinear writes nodata in exactly the same half-pixel ring as
    nearest — no fabricated edge-replicated values outside the footprint."""
    from buteo_ray.functions.warp import warp_array

    src = np.arange(16, dtype=np.float64).reshape(4, 4)
    src_gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    dst_gt = (-1.0, 1.0, 0.0, 5.0, 0.0, -1.0)  # one-pixel ring around src
    near = warp_array(src, src_gt, dst_gt, (6, 6), method="nearest")
    bil = warp_array(src, src_gt, dst_gt, (6, 6), method="bilinear")
    assert np.array_equal(np.isnan(near), np.isnan(bil))
    # interior values agree exactly on pixel centers
    assert np.allclose(bil[1:5, 1:5, 0], src)


def test_utm_undesignated_zone_roundtrip_across_equator():
    """'UTM:31' (no hemisphere letter) round-trips points on both sides of
    the equator — one consistent false-northing convention."""
    from buteo_ray.grid.projection import reproject_points

    lon = np.array([3.0, 3.5, 3.0])
    lat = np.array([-5.0, 0.0, 5.0])
    x, y = reproject_points(lon, lat, "EPSG:4326", "UTM:31")
    lon2, lat2 = reproject_points(x, y, "UTM:31", "EPSG:4326")
    assert np.allclose(lon2, lon, atol=1e-6)
    assert np.allclose(lat2, lat, atol=1e-6)


def test_stratified_sampling_block_layout_invariant(ray_session):
    """The sampled rows are identical regardless of how the input is split
    into blocks (the in-group order is canonicalized before choice)."""
    import ray.data as rd

    from buteo_ray.stages.selection import sampling_stratified

    df = pd.DataFrame({
        "cls": np.arange(300) % 3,
        "val": np.arange(300) * 7 % 101,
    })
    outs = []
    for nblocks in (1, 8):
        ds = rd.from_pandas(df).repartition(nblocks)
        out = sampling_stratified(ds, "cls", 10, seed=7).to_pandas()
        outs.append(out.sort_values(["cls", "val"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 30


def test_topk_per_group_matches_brute_force_any_layout(ray_session, rng):
    """Two-level top-k == single-frame pandas brute force, regardless of
    block layout; at most k rows per key."""
    import ray.data as rd

    from buteo_ray.stages.selection import topk_per_group

    df = pd.DataFrame({
        "key": rng.integers(0, 40, 500),
        "score": rng.integers(0, 30, 500).astype(np.float64),  # many ties
        "id": np.arange(500),
    })
    want = (df.sort_values(["score", "id", "key"], ascending=False, kind="stable")
            .groupby("key", sort=False).head(3)
            .sort_values(["key", "id"]).reset_index(drop=True))
    for nblocks in (1, 7):
        got = (topk_per_group(rd.from_pandas(df).repartition(nblocks),
                              "key", ["score"], 3).to_pandas()
               .sort_values(["key", "id"]).reset_index(drop=True)[want.columns])
        pd.testing.assert_frame_equal(got, want)


def test_grouped_aggregate_matches_pandas(ray_session, rng):
    """Arrow partial+final combiner == single-frame pandas groupby for
    sums/means/mins/maxs/count, at any block layout."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import grouped_aggregate

    df = pd.DataFrame({
        "k1": rng.integers(0, 4, 400).astype(str),
        "k2": rng.integers(0, 3, 400),
        "a": rng.normal(size=400),
        "b": rng.integers(0, 100, 400).astype(np.float64),
    })
    want = (df.groupby(["k1", "k2"], as_index=False)
            .agg(sum_a=("a", "sum"), avg_b=("b", "mean"),
                 min_a=("a", "min"), max_b=("b", "max"), n=("a", "size")))
    want["n"] = want["n"].astype(np.int64)
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    for nblocks in (1, 6):
        got = grouped_aggregate(
            rd.from_pandas(df).repartition(nblocks), ["k1", "k2"],
            sums={"sum_a": "a"}, means={"avg_b": "b"},
            mins={"min_a": "a"}, maxs={"max_b": "b"}, count="n",
        ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)


# ---------------------------------------------------------------- 5th pass


def test_warp_bilinear_nearest_footprint_parity_odd_grid():
    """At exact half-pixel boundaries (odd source dim, 2x downsample) the
    bilinear mask must equal nearest's rint-based mask — a half-open rule
    diverges depending on index parity."""
    from buteo_ray.functions.warp import warp_array

    src = np.arange(25, dtype=np.float64).reshape(5, 5)
    src_gt = (0.0, 1.0, 0.0, 5.0, 0.0, -1.0)
    dst_gt = (0.0, 2.0, 0.0, 5.0, 0.0, -2.0)
    near = warp_array(src, src_gt, dst_gt, (3, 3), method="nearest")
    bil = warp_array(src, src_gt, dst_gt, (3, 3), method="bilinear")
    assert np.array_equal(np.isnan(near), np.isnan(bil))


def test_stratified_sampling_with_tensor_column(ray_session):
    """Non-scalar (embedding) columns must not crash the canonical-order
    sort; sampling stays deterministic via the scalar columns."""
    import ray.data as rd

    from buteo_ray.stages.selection import sampling_stratified

    df = pd.DataFrame({
        "cls": np.arange(60) % 2,
        "id": np.arange(60),
        "emb": [np.arange(4, dtype=np.float32) + i for i in range(60)],
    })
    outs = []
    for nblocks in (1, 5):
        out = sampling_stratified(rd.from_pandas(df).repartition(nblocks),
                                  "cls", 5, seed=3).to_pandas()
        outs.append(sorted(out["id"].tolist()))
    assert outs[0] == outs[1] and len(outs[0]) == 10


def test_spatial_label_smoothing_2d_and_single_channel():
    """2-D label maps and single-channel stacks fall back to plain blur
    (class preservation needs a class axis) instead of crashing or
    returning all-ones."""
    from buteo_ray.functions.augmentation import spatial_label_smoothing

    y2 = np.random.default_rng(0).random((8, 8))
    out2 = spatial_label_smoothing(y2, radius=1.0)
    assert out2.shape == (8, 8) and np.all(np.isfinite(out2))
    y1 = y2[:, :, None]
    out1 = spatial_label_smoothing(y1, radius=1.0)
    assert out1.shape == (8, 8, 1)
    assert not np.allclose(out1, 1.0)


def test_grouped_aggregate_mean_skips_nulls(ray_session):
    """Means use the non-null denominator (SQL AVG semantics)."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import grouped_aggregate

    df = pd.DataFrame({"k": [0, 0, 0, 1], "x": [2.0, np.nan, 4.0, 7.0]})
    got = grouped_aggregate(rd.from_pandas(df), ["k"],
                            means={"avg": "x"}, count="n").to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["avg"].tolist() == [3.0, 7.0]   # not 2.0 (sum/rowcount)
    assert got["n"].tolist() == [3, 1]         # count stays rows


def test_augmentation_integer_cast_all_kernels():
    """channel_scale/contrast/blur/sharpen/mixup on uint8: round+clip,
    never truncate or wrap."""
    from buteo_ray.functions.augmentation import (
        augmentation_blur,
        augmentation_channel_scale,
        augmentation_contrast,
        augmentation_mixup,
        augmentation_sharpen,
    )

    X = np.zeros((12, 12, 2), np.uint8)
    X[0, 0, 0] = 5  # dark pixel far below the mean
    out = augmentation_contrast(X, np.random.default_rng(0), amount=0.9)
    assert out.dtype == np.uint8 and out.max() <= 60  # no wrap to ~255

    Xs = np.full((12, 12, 2), 100, np.uint8)
    sc = augmentation_channel_scale(Xs, np.random.default_rng(1), amount=0.1)
    assert sc.dtype == np.uint8
    assert not np.array_equal(sc, Xs)  # sub-integer scale not truncated away

    for fn in (augmentation_blur, augmentation_sharpen):
        o = fn(X, np.random.default_rng(2))
        assert o.dtype == np.uint8
    Xm, _ = augmentation_mixup(Xs, np.array([1.0, 0.0]),
                               np.zeros_like(Xs), np.array([0.0, 1.0]),
                               np.random.default_rng(3))
    assert Xm.dtype == np.uint8


def test_exact_dedup_no_hash_column(ray_session):
    """The content hash is a local bucketing detail — it must not appear
    in the output schema or cross the shuffle."""
    import ray.data as rd

    from buteo_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({"doc_id": [3, 1, 2], "text": ["a", "a", "b"]})
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert "content_hash" not in out.columns and "__bucket" not in out.columns
    assert sorted(out["doc_id"]) == [1, 2]


# ---------------------------------------------------------------- 6th pass


def test_estimate_bytes_never_executes(ray_session):
    """derive_num_partitions sizing must be metadata-only even on
    map-derived datasets (Dataset.size_bytes() would execute the plan)."""
    import ray.data as rd

    from buteo_ray.state.skew import derive_num_partitions, estimate_bytes

    calls = {"n": 0}

    def _boom(t):
        calls["n"] += 1
        return t

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    m = ds.map_batches(_boom, batch_format="pyarrow", batch_size=None)
    est = estimate_bytes(m)
    n = derive_num_partitions(m, m)
    assert calls["n"] == 0          # nothing executed
    assert est > 0 and n >= 8      # sized from the source read's metadata


def test_text_stages_compose_without_duplicate_columns(ray_session):
    """add_quality_score after add_token_count (both derive n_tokens)
    must replace, not duplicate, the column."""
    import ray.data as rd

    from buteo_ray.stages.text import add_quality_score, add_token_count

    df = pd.DataFrame({"text": ["a b c", "d e"]})
    out = add_quality_score(add_token_count(rd.from_pandas(df))).to_pandas()
    assert list(out.columns).count("n_tokens") == 1
    assert out["n_tokens"].tolist() == [3, 2]


def test_asof_right_dedup_ignores_null_values(ray_session):
    """Duplicate right timestamps with a null value: the kept row is the
    max NON-NULL value (SQL MAX semantics)."""
    import ray.data as rd

    from buteo_ray.stages.streaming import asof_join

    left = pd.DataFrame({"user_id": [1], "ts": [10.0], "event_id": [100]})
    right = pd.DataFrame({"user_id": [1, 1, 1], "ts": [5.0, 5.0, 5.0],
                          "value": [3.0, np.nan, 7.0]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="user_id", ts_col="ts",
                    right_cols=["value"]).to_pandas()
    assert out["right_value"].tolist() == [7.0]


def test_probe_bits_over_two_rejected():
    from buteo_ray.stages.ann import _probe_buckets

    with pytest.raises(ValueError):
        _probe_buckets(0, 8, 3)


def test_centroids_label_dtype_follows_input(ray_session):
    """Empty partial blocks keep the input label dtype (int64 here) so
    schema unification succeeds."""
    import ray.data as rd

    from buteo_ray.stages.ann import centroids_per_label

    df = pd.DataFrame({
        "label": np.array([7, 7, 9], dtype=np.int64),
        "embedding": [np.ones(3, np.float32)] * 3,
    })
    empty = df.iloc[:0]
    ds = rd.from_pandas(df).union(rd.from_pandas(empty))
    out = centroids_per_label(ds).to_pandas()
    assert sorted(out["label"].tolist()) == [7, 9]


# ---------------------------------------------------------------- 7th pass


def test_write_partitioned_sharded_resume(ray_session, tmp_path):
    """Sharded sink: low-cardinality partition col fans out to
    (value, shard) units; resume skips completed shards; manifest has
    no duplicate rows after a resume=False rerun; slash-bearing
    partition values survive the rename and read back."""
    import ray.data as rd

    from buteo_ray.state.checkpoint import (
        read_manifest,
        read_partitioned,
        write_partitioned_resumable,
    )

    df = pd.DataFrame({"split": ["train"] * 90 + ["a/b"] * 10,
                       "id": np.arange(100)})
    out = str(tmp_path / "sink")
    rows = write_partitioned_resumable(rd.from_pandas(df), out, "split",
                                       shard_col="id", num_shards=4)
    assert len(rows) >= 5                  # train fanned out over shards
    back = read_partitioned(out).to_pandas()
    assert len(back) == 100
    assert sorted(back[back["split"] == "a/b"]["id"]) == list(range(90, 100))

    # rerun without resume: manifest must not double-count
    write_partitioned_resumable(rd.from_pandas(df), out, "split",
                                shard_col="id", num_shards=4, resume=False)
    man = read_manifest(out)
    parts = [r["partition"] for r in man]
    assert len(parts) == len(set(parts))
    assert sum(r["rows"] for r in man) == 100

    # resume: everything complete -> nothing rewritten
    rows3 = write_partitioned_resumable(rd.from_pandas(df), out, "split",
                                        shard_col="id", num_shards=4)
    assert rows3 == []


def test_training_pipeline_rejects_string_ids(ray_session):
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    df = pd.DataFrame({"page_id": ["u1", "u2"], "text": ["a b", "c d"]})
    with pytest.raises(TypeError):
        training_data_pipeline(rd.from_pandas(df))


def test_rasterize_points_drops_out_of_extent(ray_session):
    """Points outside a non-global grid are dropped, not clamped onto
    the border pixels; exact max-edge points stay in the last pixel."""
    import ray.data as rd

    from buteo_ray.sources.raster import raster_to_array, rasterize_points
    from buteo_ray.stages.tiling import GridSpec

    grid = GridSpec(origin_x=0.0, origin_y=4.0, pixel_width=1.0,
                    pixel_height=-1.0, width=4, height=4, tile_size=4)
    pts = pd.DataFrame({"lon": [-1.0, 0.5, 4.0, 9.0],
                        "lat": [2.0, 3.5, 0.0, 2.0]})
    arr = raster_to_array(rasterize_points(rd.from_pandas(pts), grid))
    # only the inside point (0.5, 3.5) and the max-edge point (4.0, 0.0)
    assert np.nansum(arr) == 2.0
    assert arr[0, 0, 0] == 1.0      # inside point
    assert arr[3, 3, 0] == 1.0      # edge point clamps into last pixel


def test_raster_to_array_keeps_dtype_when_covered(ray_session):
    from buteo_ray.sources.raster import raster_from_array, raster_to_array

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    back = raster_to_array(raster_from_array(arr, tile_size=4))
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back[:, :, 0], arr)


def test_predict_tiles_rejects_multi_raster(ray_session, rng):
    from buteo_ray.pipelines.predict import predict_tiles
    from buteo_ray.sources.raster import raster_from_array

    a = rng.normal(size=(96, 96)).astype(np.float32)
    tiles = raster_from_array(a, tile_size=64, halo=63, raster_id="a").union(
        raster_from_array(a, tile_size=64, halo=63, raster_id="b"))

    def builder():
        return lambda x: x[..., :1]

    with pytest.raises(Exception):
        predict_tiles(tiles, builder, tile_size=64).to_pandas()


# ---------------------------------------------------------------- 8th pass


def test_shard_scheme_recorded_and_enforced(ray_session, tmp_path):
    """A resume with a different shard scheme must be refused (the old
    shard dirs don't contain the rows the new hash would mark complete),
    and derive_num_shards must adopt the recorded scheme instead of a
    drifted byte estimate."""
    import ray.data as rd

    from buteo_ray.state.checkpoint import (derive_num_shards,
                                            write_partitioned_resumable)

    out = str(tmp_path / "sharded_scheme")
    df = pd.DataFrame({"k": np.zeros(60, dtype=np.int64),
                       "id": np.arange(60), "v": np.arange(60)})
    write_partitioned_resumable(rd.from_pandas(df), out, "k",
                                shard_col="id", num_shards=2)
    with pytest.raises(ValueError, match="scheme mismatch"):
        write_partitioned_resumable(rd.from_pandas(df), out, "k",
                                    shard_col="id", num_shards=3)
    with pytest.raises(ValueError, match="scheme mismatch"):
        write_partitioned_resumable(rd.from_pandas(df), out, "k",
                                    shard_col="v", num_shards=2)
    # recorded scheme wins over any size-derived proposal
    assert derive_num_shards(rd.from_pandas(df), out_dir=out) == 2
    # matching scheme resumes cleanly: everything complete → no-op
    assert write_partitioned_resumable(rd.from_pandas(df), out, "k",
                                       shard_col="id", num_shards=2) == []


def test_predict_tiles_rejects_multi_raster_with_explicit_shape(ray_session, rng):
    """The explicit-shape path skips the raster_id probe; the merge-stage
    piece-overlap backstop must still reject a two-raster input instead
    of silently averaging both rasters' predictions."""
    from buteo_ray.pipelines.predict import predict_tiles
    from buteo_ray.sources.raster import raster_from_array

    a = rng.normal(size=(96, 96)).astype(np.float32)
    tiles = raster_from_array(a, tile_size=64, halo=63, raster_id="a").union(
        raster_from_array(a, tile_size=64, halo=63, raster_id="b"))

    def builder():
        return lambda x: x[..., :1]

    with pytest.raises(Exception, match="ONE raster"):
        predict_tiles(tiles, builder, tile_size=64, shape=(96, 96)).to_pandas()


def test_asof_multicol_tie_uses_per_column_max(ray_session):
    """Two right rows at one (key, ts) with complementary nulls: the
    oracle's GROUP BY + per-column MAX yields (3, 5) — a value no single
    right row contains — so row-tuple dedup would diverge."""
    import ray.data as rd

    from buteo_ray.stages.streaming import asof_join

    left = pd.DataFrame({"user_id": [1], "ts": [10.0], "event_id": [100]})
    right = pd.DataFrame({"user_id": [1, 1], "ts": [5.0, 5.0],
                          "a": [3.0, np.nan], "b": [np.nan, 5.0]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="user_id", ts_col="ts",
                    right_cols=["a", "b"]).to_pandas()
    assert len(out) == 1
    assert out["right_a"].tolist() == [3.0]
    assert out["right_b"].tolist() == [5.0]


def test_estimate_bytes_counts_shared_leaf_per_path(ray_session):
    """A source reaching the sink via two union branches executes twice,
    so it must weigh twice — id-deduping leaves would size downstream
    shuffles at half the true bytes."""
    import ray.data as rd

    from buteo_ray.state.skew import estimate_bytes

    src = rd.from_pandas(pd.DataFrame({"v": np.arange(20000)}))

    def _ident(t):
        return t

    one = estimate_bytes(src.map_batches(_ident, batch_format="pyarrow",
                                         batch_size=None))
    both = src.map_batches(_ident, batch_format="pyarrow", batch_size=None).union(
        src.map_batches(_ident, batch_format="pyarrow", batch_size=None))
    assert one > 0
    assert estimate_bytes(both) == 2 * one


def test_strategy2_patch_larger_than_axis_raises():
    """border_strategy=2 with patch > axis must fail loudly, not emit a
    negative start that silently corrupts downstream tiles."""
    from buteo_ray.grid.offsets import compute_patch_positions
    from buteo_ray.sources.raster import raster_from_array

    with pytest.raises(ValueError, match="border_strategy=2"):
        compute_patch_positions(100, 256, 0, 2)
    with pytest.raises(ValueError, match="border_strategy=2"):
        raster_from_array(np.zeros((100, 100), dtype=np.float32),
                          tile_size=256, border_strategy=2)
    # Strategies 1 and 3 keep their defined semantics on short axes.
    assert compute_patch_positions(100, 256, 0, 1) == []
    assert compute_patch_positions(100, 256, 0, 3) == [0]


def test_empty_geometry_bbox_and_roundtrip():
    """ISO 'POLYGON EMPTY' / 'LINESTRING EMPTY' parse, bbox to NaN, and
    re-encode without raising."""
    import struct

    from buteo_ray.geom.wkb import encode_geom, geom_bbox, parse_wkb_dims

    poly_empty = struct.pack("<BII", 1, 3, 0)
    line_empty = struct.pack("<BII", 1, 2, 0)
    mpoly_empty = struct.pack("<BII", 1, 6, 0)
    for wkb in (poly_empty, line_empty, mpoly_empty):
        assert all(np.isnan(v) for v in geom_bbox(wkb))
        kind, payload, dims = parse_wkb_dims(wkb)
        out = encode_geom(kind, payload, dims)
        kind2, payload2, dims2 = parse_wkb_dims(out)
        assert kind2 == kind and dims2 == dims


def test_raster_stack_same_side_duplicate_raises(ray_session):
    """Two rasters on one side sharing a tile key must not silently stack
    with each other when the other side lacks the tile."""
    from buteo_ray.sources.raster import raster_from_array, raster_stack

    a1 = raster_from_array(np.zeros((64, 64), dtype=np.float32), raster_id="a1",
                           tile_size=64)
    a2 = raster_from_array(np.ones((64, 64), dtype=np.float32), raster_id="a2",
                           tile_size=64)
    # b tiles at (0,0) and (1,0); drop (0,0) so the a-side pair is alone.
    b = raster_from_array(np.zeros((64, 128), dtype=np.float32), raster_id="b",
                          tile_size=64).filter(lambda r: r["tile_x"] == 1)
    with pytest.raises(Exception, match="per side"):
        raster_stack(a1.union(a2), b).to_pandas()


def test_query_bbox_world_query_on_point_index():
    """A whole-extent query against a fine-resolution point index must be
    bounded by index contents (the old meshgrid enumerated (2^24)^2 cells)."""
    from buteo_ray.geom.index import GridIndex

    rng = np.random.default_rng(7)
    x = rng.uniform(-170, 170, 500)
    y = rng.uniform(-80, 80, 500)
    idx = GridIndex(x, x, y, y)  # point bboxes -> auto res 24
    assert idx.res == 24
    got = idx.query_bbox(-180.0, 180.0, -90.0, 90.0)
    assert set(got.tolist()) == set(range(500))
    sub = idx.query_bbox(0.0, 50.0, 0.0, 50.0)
    expect = np.nonzero((x >= 0) & (x <= 50) & (y >= 0) & (y <= 50))[0]
    assert set(sub.tolist()) == set(expect.tolist())


def test_raster_to_array_preserves_int64_above_2_53(ray_session):
    """Round-trip of an int64 raster with values above 2^53 must be exact
    (no float64 staging)."""
    from buteo_ray.sources.raster import raster_from_array, raster_to_array

    arr = (np.int64(2) ** 53 + np.arange(16, dtype=np.int64)).reshape(4, 4)
    ds = raster_from_array(arr, tile_size=2)
    out = raster_to_array(ds)
    assert out.dtype == np.int64
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_stitch_rings_never_uturns_onto_reverse_edge():
    """A pure out-and-back path must dangle (no ring), not retrace into a
    zero-area ring; a genuine square still stitches."""
    from buteo_ray.geom.boolean import _ring_signed_area, _stitch_rings

    path = np.array([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (1.0, 0.0)])
    path_next = np.array([(1.0, 0.0), (2.0, 0.0), (1.0, 0.0), (0.0, 0.0)])
    assert _stitch_rings(path, path_next, 1e-9) == []

    sq = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    sq_next = np.array([(1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])
    rings = _stitch_rings(sq, sq_next, 1e-9)
    assert len(rings) == 1
    assert abs(_ring_signed_area(rings[0])) == pytest.approx(1.0)


def test_cosine_dup_pairs_chunked_scoring(ray_session):
    """Chunked in-group scoring (bounded cos-matrix memory) must produce
    identical pairs to single-slab scoring, across chunk boundaries on
    both the diagonal and cross block cases."""
    import ray.data as rd

    from buteo_ray.stages.dedup import cosine_dup_pairs

    rng = np.random.default_rng(3)
    X = rng.normal(size=(90, 8)).astype(np.float32)
    X[45:60] = X[0:15] + rng.normal(scale=0.03, size=(15, 8)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(90, dtype=np.int64),
         "embedding": [v.tolist() for v in X]}))
    whole = cosine_dup_pairs(ds, threshold=0.9, n_blocks=2,
                             score_chunk=1024).to_pandas()
    chunked = cosine_dup_pairs(ds, threshold=0.9, n_blocks=2,
                               score_chunk=7).to_pandas()
    w = whole.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    c = chunked.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(w) >= 15
    pd.testing.assert_frame_equal(w, c)


def test_cosine_dup_pairs_row_derived_blocks(ray_session):
    """Default n_blocks must scale with estimated ROW count (bounding the
    per-group quadratic), not source bytes."""
    import ray.data as rd

    from buteo_ray.stages import dedup as dd

    n = 40_000
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [[0.0, 0.0]] * n}))
    from buteo_ray.state.skew import estimate_rows
    assert estimate_rows(ds) == n
    # 40k rows / 8192 target → B=5 (not the old bytes-derived floor of 2).
    expect = -(-n // dd._BLOCK_ROWS)
    assert expect == 5


def test_ann_ivf_empty_and_zero_norm(ray_session):
    """IVF search degrades gracefully (empty result) on an empty corpus
    and on an all-zero-norm corpus, like the exact and LSH paths."""
    import ray.data as rd

    from buteo_ray.stages.ann import ann_ivf_topk

    qids = np.array([1], dtype=np.int64)
    qvecs = np.array([[1.0, 0.0]])

    empty = rd.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series([], dtype=np.int64),
         "embedding": pd.Series([], dtype=object)}))
    out = ann_ivf_topk(empty, qids, qvecs, k=3).to_pandas()
    assert len(out) == 0

    zeros = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(5, dtype=np.int64),
         "embedding": [[0.0, 0.0]] * 5}))
    out2 = ann_ivf_topk(zeros, qids, qvecs, k=3).to_pandas()
    assert len(out2) == 0


def test_bucketed_count_null_bearing_int_key_blocks(ray_session):
    """The same int key must hash to ONE bucket whether or not its block
    contains a null: a to_pandas() detour turned int64 7 into float64
    7.0 on null-bearing blocks, splitting the key's counts into
    duplicate unmerged rows (and degrading the key dtype)."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    ds = rd.from_pandas([
        pd.DataFrame({"k": pd.array([7, 8, 7], dtype="Int64")}),
        pd.DataFrame({"k": pd.array([7, 8, None], dtype="Int64")}),
    ])
    out = bucketed_count(ds, ["k"], alias="n").to_pandas()
    got = {(None if pd.isna(k) else int(k)): int(n)
           for k, n in zip(out["k"], out["n"])}
    assert got == {7: 3, 8: 2, None: 1}
    assert len(out) == 3


def test_bucketed_group_map_all_none_bucket(ray_session):
    """A bucket whose every group returns None must emit the declared
    output schema (via empty=), never the input schema; without empty=
    it must raise instead of silently poisoning the block union."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_group_map

    ks = list(range(32))
    ds = rd.from_pandas(pd.DataFrame({"k": ks, "v": [float(k) for k in ks]}))
    empty = pd.DataFrame({"out_a": pd.Series([], dtype="int64")})

    def _only_key_zero(g: pd.DataFrame):
        if int(g["k"].iloc[0]) != 0:
            return None  # 31 of 32 keys drop → some bucket is all-None
        return pd.DataFrame({"out_a": [int(g["k"].iloc[0])]})

    out = bucketed_group_map(ds, ["k"], _only_key_zero,
                             num_buckets=8, empty=empty).to_pandas()
    assert list(out.columns) == ["out_a"]
    assert out["out_a"].tolist() == [0]

    with pytest.raises(Exception, match="empty"):
        bucketed_group_map(ds, ["k"], lambda g: None,
                           num_buckets=2).to_pandas()


def test_safe_cast_integer_paths_exact():
    """Clip-mode casting must not take a float64 detour for integer
    sources (corrupts > 2^53; near-max uint64 overflowed to INT64_MIN)
    and must map NaN to 0 deterministically for integer targets."""
    from buteo_ray.functions.dtypes import safe_cast

    v = np.array([2**62 + 1], dtype=np.int64)
    assert int(safe_cast(v, "uint64")[0]) == 2**62 + 1

    big = np.array([2**64 - 1, 2**63 - 1, 5], dtype=np.uint64)
    out = safe_cast(big, "int64")
    assert out.dtype == np.int64
    assert int(out[0]) == 2**63 - 1  # clamped to int64 max, not wrapped
    assert int(out[1]) == 2**63 - 1
    assert int(out[2]) == 5

    neg = np.array([-5, -1, 3], dtype=np.int64)
    assert safe_cast(neg, "uint8").tolist() == [0, 0, 3]

    f = np.array([np.nan, np.inf, -np.inf, 300.6], dtype=np.float64)
    out = safe_cast(f, "uint8")
    assert out.tolist() == [0, 255, 0, 255]

    # float64 → int64 at the representability edge: must clamp inside
    # the target range, never overflow the final cast.
    e = np.array([9.3e18, -9.3e18], dtype=np.float64)
    out = safe_cast(e, "int64")
    assert out[0] > 0 and out[1] < 0


def test_lsh_topk_tie_break_by_neighbor_id(ray_session):
    """Tied cosines at the rank-k boundary must keep the smaller
    neighbor_id regardless of corpus batch order (the oracle's
    'cos desc, neighbor_id asc' rule)."""
    import ray.data as rd

    from buteo_ray.stages.ann import ann_lsh_topk

    v = [1.0, 0.0, 0.0, 0.0]
    # Three identical vectors (exact ties) in REVERSED id order across
    # the batch, plus one distinct distractor.
    emb = pd.DataFrame({
        "vec_id": [30, 20, 10, 40],
        "embedding": [v, v, v, [0.0, 1.0, 0.0, 0.0]],
    })
    out = ann_lsh_topk(rd.from_pandas(emb), np.array([10]),
                       np.array([v]), k=2, nbits=4, n_tables=2,
                       probe_bits=2).to_pandas()
    assert sorted(out["neighbor_id"].tolist()) == [20, 30]


def test_safe_cast_raise_exact_at_int64_boundary():
    """mode="raise" must not let float64(2^63) slip through: the naive
    `vals > hi` compare promotes the int bound to float64 (rounding it
    UP to 2^63) and the astype then wraps to INT64_MIN silently."""
    from buteo_ray.functions.dtypes import safe_cast

    with pytest.raises(OverflowError):
        safe_cast(np.array([9.223372036854776e18]), "int64", mode="raise")
    with pytest.raises(OverflowError):
        safe_cast(np.array([1.8446744073709552e19]), "uint64", mode="raise")
    # uint64 source above int64.max: integer compare must stay exact.
    with pytest.raises(OverflowError):
        safe_cast(np.array([2**64 - 1], dtype=np.uint64), "int64",
                  mode="raise")
    # The rounded value is what gets cast, so 127.6 → 128 must raise
    # for int8 while 127.4 → 127 passes.
    with pytest.raises(OverflowError):
        safe_cast(np.array([127.6]), "int8", mode="raise")
    assert safe_cast(np.array([127.4]), "int8",
                     mode="raise").tolist() == [127]


def test_bucketed_count_exact_int_keys_with_nulls(ray_session):
    """A null key in the bucket must not degrade int64 keys to float64
    (keys above 2^53 would silently merge)."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    t = pa.table({"k": pa.array([2**62, 2**62 + 1, 2**62, None],
                                type=pa.int64())})
    out = bucketed_count(rd.from_arrow(t), ["k"], num_buckets=1).to_pandas()
    assert len(out) == 3
    vals = set(out["k"].dropna().astype("int64"))
    assert vals == {2**62, 2**62 + 1}


def test_bucketed_count_negative_zero_merges(ray_session):
    """-0.0 and 0.0 are the same group key; they must hash to the same
    bucket at ANY bucket count (bit-pattern hashing split them)."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    t = pa.table({"k": pa.array([0.0, -0.0, 0.0, 1.5])})
    for num_buckets in (1, 7):
        out = bucketed_count(rd.from_arrow(t), ["k"],
                             num_buckets=num_buckets).to_pandas()
        assert len(out) == 2
        assert out.set_index("k")["n"].to_dict() == {0.0: 3, 1.5: 1}


def test_checkpoint_scheme_records_shard_hash(tmp_path):
    """A sharded layout records the shard-hash algorithm; a scheme file
    from the pre-splitmix64 era (no shard_hash field) must refuse to
    resume instead of silently remapping every row to new shard names."""
    import json

    from buteo_ray.state.checkpoint import check_scheme

    out = str(tmp_path / "sink")
    check_scheme(out, "split", "doc_id", 8)
    with open(f"{out}/_scheme.json") as f:
        scheme = json.load(f)
    assert scheme["shard_hash"] == "splitmix64-v1"

    # Simulate an old layout: same scheme minus the hash id.
    old = str(tmp_path / "old_sink")
    import os
    os.makedirs(old)
    with open(f"{old}/_scheme.json", "w") as f:
        json.dump({"partition_col": "split", "shard_col": "doc_id",
                   "num_shards": 8}, f)
    with pytest.raises(ValueError, match="scheme mismatch"):
        check_scheme(old, "split", "doc_id", 8)


def test_dissolve_partial_exact_int_keys_with_nulls(ray_session):
    """The two-level dissolve's partial stage must not round-trip int
    keys through float64 when a block holds a null key."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.geom.wkb import wkb_polygon
    from buteo_ray.stages.vector_ops import vector_dissolve

    def sq(x):
        return wkb_polygon([np.array(
            [[x, 0], [x + 1, 0], [x + 1, 1], [x, 1], [x, 0]], float)])

    t = pa.table({
        "k": pa.array([2**62, 2**62 + 1, 2**62, None], type=pa.int64()),
        "geom_wkb": pa.array([sq(i) for i in range(4)], type=pa.binary()),
        "bbox_xmin": pa.array([float(i) for i in range(4)]),
        "bbox_xmax": pa.array([float(i + 1) for i in range(4)]),
        "bbox_ymin": pa.array([0.0] * 4),
        "bbox_ymax": pa.array([1.0] * 4),
    })
    out = vector_dissolve(rd.from_arrow(t), by="k",
                          geometry="bbox").to_pandas()
    assert len(out) == 3
    assert set(out["k"].dropna().astype("int64")) == {2**62, 2**62 + 1}


def test_bounded_aggregate_matches_pandas(ray_session, rng):
    """The driver-fold variant (for grid-bounded key domains) must equal
    grouped_aggregate / a single-frame pandas groupby at any block
    layout, including int keys with nulls (exactness via _bucket_frame)."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import bounded_aggregate

    df = pd.DataFrame({
        "px": rng.integers(0, 8, 300),
        "py": rng.integers(0, 6, 300),
        "v": rng.integers(0, 1000, 300).astype(np.int64),
    })
    want = (df.groupby(["px", "py"], as_index=False)
            .agg(sum_v=("v", "sum"), avg_v=("v", "mean"),
                 min_v=("v", "min"), max_v=("v", "max"), n=("v", "size")))
    want["n"] = want["n"].astype(np.int64)
    want = want.sort_values(["px", "py"]).reset_index(drop=True)
    for nblocks in (1, 5):
        got = bounded_aggregate(
            rd.from_pandas(df).repartition(nblocks), ["px", "py"],
            sums={"sum_v": "v"}, means={"avg_v": "v"},
            mins={"min_v": "v"}, maxs={"max_v": "v"}, count="n",
        ).sort_values(["px", "py"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns], want)

    # Exact int64 keys above 2^53 with a null key present: the fold must
    # not round-trip the key through float64.
    import pyarrow as pa

    t = pa.table({"k": pa.array([2**62, 2**62 + 1, 2**62, None],
                                type=pa.int64()),
                  "v": pa.array([1, 2, 3, 4], type=pa.int64())})
    out = bounded_aggregate(rd.from_arrow(t), ["k"], count="n",
                            sums={"s": "v"})
    assert len(out) == 3
    assert set(out["k"].dropna().astype("int64")) == {2**62, 2**62 + 1}
    got_null = out[out["k"].isna()]
    assert got_null["s"].iloc[0] == 4 and got_null["n"].iloc[0] == 1


# ---------------------------------------------------------------------------
# Round-4 review fixes


def test_hash_key_column_date32_time32(ray_session):
    """date32/time32 keys must route (Arrow lacks a direct → int64
    cast; previously raised ArrowNotImplementedError)."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    t = pa.table({
        "d": pa.array([datetime.date(2020, 1, 1), datetime.date(2020, 1, 2),
                       datetime.date(2020, 1, 1), None], type=pa.date32()),
    })
    out = bucketed_count(rd.from_arrow(t), ["d"], alias="n").to_pandas()
    got = {(None if pd.isna(k) else k): v for k, v in zip(out["d"], out["n"])}
    assert got == {datetime.date(2020, 1, 1): 2,
                   datetime.date(2020, 1, 2): 1, None: 1}

    t2 = pa.table({"t": pa.array([1000, 2000, 1000], type=pa.time32("ms"))})
    out2 = bucketed_count(rd.from_arrow(t2), ["t"], alias="n").to_pandas()
    assert sorted(out2["n"]) == [1, 2]


def test_float_key_null_and_nan_one_group(ray_session):
    """Arrow-null and NaN float keys are one group (the pandas fold
    cannot distinguish them, so the route hash must not either)."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    t = pa.table({"k": pa.array([None, float("nan"), 1.5, -0.0, 0.0],
                                type=pa.float64())})
    out = bucketed_count(rd.from_arrow(t), ["k"], alias="n",
                         num_buckets=7).to_pandas()
    nan_rows = out[out["k"].isna()]
    assert len(nan_rows) == 1 and nan_rows["n"].iloc[0] == 2
    zero = out[out["k"] == 0.0]
    assert len(zero) == 1 and zero["n"].iloc[0] == 2


def test_bounded_aggregate_empty_pandas_dataset(ray_session):
    """Empty pandas-backed input must return an empty result, not crash
    on a PandasBlockSchema."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import bounded_aggregate

    empty = pd.DataFrame({"px": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="float64")})
    out = bounded_aggregate(rd.from_pandas(empty), ["px"], count="n",
                            sums={"s": "v"})
    assert len(out) == 0 and set(out.columns) == {"px", "n", "s"}


def test_bucketed_sum_all_null_group_is_null(ray_session):
    """An all-null value group must sum to null (SQL / Sum semantics),
    not 0."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_sum

    t = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                  "v": pa.array([None, None, 5.0], type=pa.float64())})
    out = bucketed_sum(rd.from_arrow(t), ["k"], sums={"s": "v"}).to_pandas()
    got = dict(zip(out["k"], out["s"]))
    assert pd.isna(got[1]) and got[2] == 5.0


def test_bounded_aggregate_all_null_group_sum_is_null(ray_session):
    """bounded_aggregate's driver fold must match grouped_aggregate /
    SQL on an all-null group: sum → NULL (NaN), not pandas' default 0
    (the dict-form .agg(plan) could not pass min_count=1)."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.aggregate import bounded_aggregate

    t = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                  "v": pa.array([None, None, 5.0], type=pa.float64())})
    # Two blocks so the all-null group's partial sum (null) is folded.
    out = bounded_aggregate(rd.from_arrow(t).repartition(2), ["k"],
                            sums={"s": "v"}, means={"m": "v"}, count="n")
    got = out.set_index("k")
    assert pd.isna(got.loc[1, "s"]) and pd.isna(got.loc[1, "m"])
    assert got.loc[1, "n"] == 2
    assert got.loc[2, "s"] == 5.0 and got.loc[2, "m"] == 5.0


def test_dup_clusters_star_fallback_on_nonconvergence(ray_session):
    """When label propagation exhausts max_iters on a chained graph,
    dup_clusters must switch to star contraction and still return the
    EXACT components — never partially-propagated labels."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.dedup import dup_clusters

    # Path graph 0-1-…-10 (diameter 10 > max_iters=3) plus a separate
    # triangle component {100, 101, 102} plus a SELF-LOOP-ONLY node 77
    # (the contraction drops self-loops — its label row must still come
    # back, matching the other two tiers).
    chain = pa.table({
        "id_a": list(range(10)) + [100, 101, 100, 77],
        "id_b": list(range(1, 11)) + [101, 102, 102, 77],
    })
    # driver_threshold=0 forces the distributed tier (the size-gated
    # driver fold has no iteration cap to exhaust).
    out = dup_clusters(rd.from_arrow(chain), max_iters=3,
                       driver_threshold=0).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    want = {i: 0 for i in range(11)}
    want.update({100: 100, 101: 100, 102: 100, 77: 77})
    assert got == want


def test_star_contraction_olog_rounds(ray_session):
    """Star contraction on a long path graph (diameter ≫ 4) must match
    the numpy components oracle AND converge in O(log n) rounds
    (Kiveris et al., SoCC'14), not diameter rounds."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.dedup import _components_numpy, _star_contraction

    n = 33  # path 0-1-…-32, diameter 32
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    # _star_contraction takes the symmetrized edge set (dup_clusters'
    # pinned form).
    sym = pa.table({"u": np.concatenate([u, v]),
                    "v": np.concatenate([v, u])})
    labels, rounds = _star_contraction(rd.from_arrow(sym))
    got = labels.to_pandas().sort_values("node").reset_index(drop=True)
    ids, cl = _components_numpy(u, v)
    assert got["node"].tolist() == ids.tolist()
    assert got["lbl"].tolist() == cl.tolist()
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_bounded_aggregate_empty_nullable_dtypes(ray_session):
    """Empty pandas-backed input with EXTENSION dtypes (Int64/Float64)
    must also return empty, not crash on np.dtype(Int64Dtype())."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import bounded_aggregate

    empty = pd.DataFrame({"px": pd.Series(dtype="Int64"),
                          "v": pd.Series(dtype="Float64")})
    out = bounded_aggregate(rd.from_pandas(empty), ["px"], count="n",
                            sums={"s": "v"})
    assert len(out) == 0 and set(out.columns) == {"px", "n", "s"}


def test_dup_clusters_null_id_raises(ray_session):
    """A null id in the pair list must fail loud — to_numpy on a null
    int column would silently promote to float64/NaN and emit garbage
    cluster ids (same convention as assign_shuffle_shards)."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.dedup import dup_clusters

    pairs = pa.table({"id_a": pa.array([1, None], type=pa.int64()),
                      "id_b": pa.array([2, 3], type=pa.int64())})
    with pytest.raises(Exception, match="null ids"):
        dup_clusters(rd.from_arrow(pairs)).to_pandas()


def test_bench_query_loop_survives_errors(ray_session, tmp_path, monkeypatch):
    """bench.py's query loop must record {"err": ...} for a failing
    query, keep running the rest, and flush partials to disk — a
    mid-loop crash must never zero the whole artifact (it did, twice)."""
    import json

    import ray

    import bench
    from buteo_ray.pipelines import queries as q

    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))

    def boom(sf):
        raise RuntimeError("synthetic query failure")

    monkeypatch.setattr(q, "QUERIES", {
        "boom": boom, "shuffle_shards": q.QUERIES["shuffle_shards"]})
    payload = {"queries": {}}
    times = bench.run_queries(ray, payload)
    assert times["boom"] == {"err": "RuntimeError: synthetic query failure"}
    assert isinstance(times["shuffle_shards"], float)
    saved = json.loads((tmp_path / "partial.json").read_text())
    assert saved["queries"]["boom"]["err"].startswith("RuntimeError")
    assert ray.is_initialized()


def test_assign_shuffle_shards_null_id_raises(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.selection import assign_shuffle_shards

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, None, 3],
                                                    type=pa.int64())}))
    with pytest.raises(Exception, match="nulls"):
        assign_shuffle_shards(ds, "doc_id").materialize()


def test_asof_heterogeneous_exact_int64_and_no_padding_leak(ray_session):
    """Third-review regressions: (a) a left-only int64 column above 2^53
    must survive the union padding exactly (no float64 round-trip);
    (b) the padding columns must not leak into the output schema;
    (c) shared-name dtype mismatches (us vs ns timestamps) are cast."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.streaming import asof_join

    big = 2**53 + 1
    left = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([2_000, 3_000], pa.timestamp("ns")),
        "lv": pa.array([big, big + 2], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([1], pa.timestamp("us")),  # unit differs from left
        "rv": pa.array([7], pa.int64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    right_cols=["rv"]).to_pandas()
    assert sorted(out.columns) == ["lv", "right_rv", "right_ts",
                                   "ts", "user_id"]  # no leaked 'rv'
    assert sorted(int(v) for v in out["lv"]) == [big, big + 2]  # exact
    assert (out["right_rv"] == 7).all()


def test_hash_join_auto_schemaless_empty_side(ray_session):
    """from_items([]) has no schema at all; the known-empty short-circuit
    must still return an empty result instead of crashing."""
    import ray.data as rd

    from buteo_ray.stages.join_partitioned import hash_join_auto

    right = rd.from_items([{"rk": 1, "w": 10}])
    out = hash_join_auto(rd.from_items([]), right, "k", "rk").to_pandas()
    assert len(out) == 0


def test_nonempty_arrow_blocks_drops_schemaless_empties(ray_session):
    """map_groups over mostly-empty sort partitions emits 0-row blocks
    with cleared schemas; the shared collect helper must drop them and
    return only typed, non-empty Arrow tables."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from buteo_ray.stages.aggregate import nonempty_arrow_blocks

    ds = rd.from_items([{"k": 1, "v": i} for i in range(3)]).repartition(8)
    g = ds.groupby("k").map_groups(lambda df: df, batch_format="pandas")
    m = g.map_batches(lambda t: t, batch_format="pyarrow",
                      batch_size=None).materialize()
    out = nonempty_arrow_blocks(m)
    assert all(isinstance(t, pa.Table) and t.num_rows for t in out)
    assert sum(t.num_rows for t in out) == 3
    assert all("v" in t.column_names for t in out)
