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
