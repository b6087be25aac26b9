"""Multimodal plumbing: stubbed decode via actor pool, features, frames."""

import numpy as np
import pytest


def test_decode_fake_and_features(ray_session):
    import ray.data as rd

    from buteo_ray.stages.multimodal import (
        decode_media,
        extract_features,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(40, width=32, height=24))
    decoded = decode_media(media, decoder="fake", concurrency=2, batch_size=16)
    out = decoded.to_pandas()
    assert len(out) == 40
    assert (out["dec_height"] == 24).all() and (out["dec_width"] == 32).all()
    # Deterministic: same payload → same pixels.
    out2 = decode_media(rd.from_arrow(synth_media_table(40, width=32, height=24)),
                        decoder="fake").to_pandas()
    a = out.sort_values("media_id")["pixels"].iloc[0]
    b = out2.sort_values("media_id")["pixels"].iloc[0]
    assert a == b

    feats = extract_features(decoded).to_pandas()
    assert len(feats) == 40
    assert all(len(m) == 3 for m in feats["channel_mean"])


def test_decode_resize_target(ray_session):
    import ray.data as rd

    from buteo_ray.stages.multimodal import decode_media, synth_media_table

    media = rd.from_arrow(synth_media_table(10, width=64, height=48))
    out = decode_media(media, decoder="fake", target=(24, 32)).to_pandas()
    assert (out["dec_height"] == 24).all() and (out["dec_width"] == 32).all()


def test_decode_real_raises(ray_session):
    import ray.data as rd

    from buteo_ray.stages.multimodal import decode_media, synth_media_table

    media = rd.from_arrow(synth_media_table(4))
    with pytest.raises(Exception):  # NotImplementedError surfaces via Ray
        decode_media(media, decoder="real").count()


def test_sample_frames(ray_session):
    import ray.data as rd

    from buteo_ray.stages.multimodal import sample_frames, synth_media_table

    media = rd.from_arrow(synth_media_table(5, media_type="video", n_frames=10))
    frames = sample_frames(media, every_nth=3).to_pandas()
    assert len(frames) == 5 * 4  # frames 0,3,6,9
    assert set(frames["frame_idx"]) == {0, 3, 6, 9}


def test_extract_features_exact_vs_per_row(ray_session):
    """Vectorized uniform-dims path == per-image numpy stats, bit-exact."""
    import ray.data as rd

    from buteo_ray.stages.multimodal import (
        _fake_decode,
        decode_media,
        extract_features,
        synth_media_table,
    )

    tbl = synth_media_table(30, width=16, height=12)
    decoded = decode_media(rd.from_arrow(tbl), decoder="fake", batch_size=8)
    feats = extract_features(decoded).to_pandas().sort_values("media_id")
    for i, (_, row) in enumerate(feats.iterrows()):
        img = _fake_decode(tbl["payload"][i].as_py(), 12, 16)
        assert np.array_equal(np.asarray(row["channel_mean"]), img.mean(axis=(0, 1)))
        assert np.array_equal(np.asarray(row["channel_std"]), img.std(axis=(0, 1)))


def test_extract_features_mixed_dims_fallback(ray_session):
    """Batches mixing decoded sizes take the per-row path, same results."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.multimodal import (
        decode_media,
        extract_features,
        synth_media_table,
    )

    a = synth_media_table(8, width=16, height=12)
    b = synth_media_table(8, width=8, height=6)
    b = b.set_column(0, "media_id", pa.array(np.arange(100, 108, dtype=np.int64)))
    media = rd.from_arrow(pa.concat_tables([a, b])).repartition(1)
    feats = extract_features(
        decode_media(media, decoder="fake", batch_size=64)).to_pandas()
    assert len(feats) == 16
    assert all(len(m) == 3 for m in feats["channel_mean"])
    assert all(np.isfinite(np.asarray(m)).all() for m in feats["channel_std"])


def test_sample_frames_varying_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.multimodal import sample_frames, synth_media_table

    tbl = synth_media_table(4, media_type="video", n_frames=1)
    tbl = tbl.set_column(5, "n_frames", pa.array(np.array([1, 0, 7, 3], dtype=np.int32)))
    frames = sample_frames(rd.from_arrow(tbl), every_nth=3).to_pandas()
    got = {mid: sorted(g["frame_idx"]) for mid, g in frames.groupby("media_id")}
    assert got == {0: [0], 2: [0, 3, 6], 3: [0]}
