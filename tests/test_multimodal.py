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
