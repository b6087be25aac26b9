"""predict_array parity (distributed vs local oracle), augmentations,
selection/splits."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.functions.augmentation import (
    AugmentationPipeline,
    augmentation_channel_scale,
    augmentation_contrast,
    augmentation_cutmix,
    augmentation_label_smoothing,
    augmentation_mirror,
    augmentation_mirror_xy,
    augmentation_misalign,
    augmentation_mixup,
    augmentation_noise_normal,
    augmentation_noise_uniform,
    augmentation_rotation,
    augmentation_rotation_xy,
    mask_channels,
    mask_ellipse,
    mask_lines,
    mask_pixels,
    mask_rectangle,
    spatial_label_smoothing,
)


@pytest.mark.parametrize("merge_method", ["median", "average", "max"])
def test_predict_distributed_matches_local(ray_session, rng, merge_method):
    # NOTE: the builder is defined INSIDE the test so cloudpickle
    # serializes it by value — a module-level function in an
    # unimportable test module would put the scorer actor into a
    # deserialize-crash-restart loop on the workers.
    def _model_builder():
        def model(patches):
            m = patches.mean(axis=-1, keepdims=True)
            return np.concatenate([m + 1.0, m * 2.0], axis=-1).astype(np.float32)

        return model

    from buteo_ray.pipelines.predict import (
        predict_array_local,
        predict_dataset,
        predicted_tiles_to_array,
    )

    arr = rng.normal(size=(50, 70, 3)).astype(np.float32)
    local = predict_array_local(arr, _model_builder(), tile_size=16, n_offsets=1,
                                merge_method=merge_method)
    tiles = predict_dataset(arr, _model_builder, tile_size=16, n_offsets=1,
                            merge_method=merge_method).to_pandas()
    dist = predicted_tiles_to_array(tiles, arr.shape)
    # Identical stacks → identical merges (NaN where no grid covered).
    np.testing.assert_allclose(
        np.nan_to_num(dist, nan=-1), np.nan_to_num(local, nan=-1), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("merge_method", ["median", "average"])
def test_predict_tiles_matches_local(ray_session, rng, merge_method):
    """Tile-row input path (VERDICT r01 item 9): distributed scoring of
    the tile Dataset — no full-array ray.put anywhere — equals the local
    reference-parity oracle."""
    def _model_builder():
        def model(patches):
            m = patches.mean(axis=-1, keepdims=True)
            return np.concatenate([m + 1.0, m * 2.0], axis=-1).astype(np.float32)

        return model

    from buteo_ray.pipelines.predict import (
        predict_array_local,
        predict_tiles,
        predicted_tiles_to_array,
    )
    from buteo_ray.sources.raster import raster_from_array

    arr = rng.normal(size=(80, 70, 3)).astype(np.float32)
    local = predict_array_local(arr, _model_builder(), tile_size=16, n_offsets=2,
                                merge_method=merge_method)
    tile_ds = raster_from_array(arr, tile_size=32, halo=16)
    out = predict_tiles(tile_ds, _model_builder, tile_size=16, n_offsets=2,
                        merge_method=merge_method).to_pandas()
    dist = predicted_tiles_to_array(out, arr.shape)
    np.testing.assert_allclose(
        np.nan_to_num(dist, nan=-1), np.nan_to_num(local, nan=-1), rtol=1e-5, atol=1e-6
    )

    # halo too small for the patch reach is rejected loudly
    with pytest.raises(Exception):
        predict_tiles(raster_from_array(arr, tile_size=32, halo=2), _model_builder,
                      tile_size=16).to_pandas()


def test_augmentations_shapes_and_determinism(rng):
    X = rng.normal(size=(16, 16, 3)).astype(np.float32)
    y = np.zeros((4,), dtype=np.float32)
    y[1] = 1.0

    r1 = augmentation_rotation(X, np.random.default_rng(1))
    r2 = augmentation_rotation(X, np.random.default_rng(1))
    np.testing.assert_array_equal(r1, r2)  # seeded determinism
    assert r1.shape == X.shape

    Xr, yr = augmentation_rotation_xy(X, X[:, :, :1], np.random.default_rng(2))
    assert Xr.shape == X.shape and yr.shape == (16, 16, 1)

    m = augmentation_mirror(X, np.random.default_rng(3))
    assert m.shape == X.shape
    Xm, ym = augmentation_mirror_xy(X, X, np.random.default_rng(3))
    np.testing.assert_array_equal(Xm, ym)

    ys = augmentation_label_smoothing(y, 0.1)
    np.testing.assert_allclose(ys.sum(), 1.0, rtol=1e-6)
    assert ys.max() < 1.0 and ys.min() > 0.0

    for fn in (augmentation_noise_uniform, augmentation_noise_normal,
               augmentation_channel_scale, augmentation_contrast,
               augmentation_misalign):
        out = fn(X, np.random.default_rng(4))
        assert out.shape == X.shape
        assert not np.array_equal(out, X)

    Xc, yc = augmentation_cutmix(X, y, X + 1.0, y[::-1].copy(), np.random.default_rng(5))
    assert Xc.shape == X.shape
    np.testing.assert_allclose(yc.sum(), 1.0, rtol=1e-6)

    Xu, yu = augmentation_mixup(X, y, X + 1.0, y[::-1].copy(), np.random.default_rng(6))
    assert Xu.shape == X.shape
    np.testing.assert_allclose(yu.sum(), 1.0, rtol=1e-6)


def test_masking(rng):
    X = np.ones((20, 20, 3), dtype=np.float32)
    mp = mask_pixels(X, np.random.default_rng(1), p=0.2)
    assert (mp == 0).any() and mp.shape == X.shape
    # whole-pixel masking: all channels zeroed together
    zeroed = (mp == 0).all(axis=-1) | (mp == 1).all(axis=-1)
    assert zeroed.all()

    mc = mask_channels(X, np.random.default_rng(7), p=0.5)
    per_chan = [(mc[..., c] == 0).all() or (mc[..., c] == 1).all() for c in range(3)]
    assert all(per_chan)

    mr = mask_rectangle(X, np.random.default_rng(2))
    assert (mr == 0).any()
    me = mask_ellipse(X, np.random.default_rng(3))
    assert (me == 0).any()
    ml = mask_lines(X, np.random.default_rng(4))
    assert (ml == 0).any()

    sm = spatial_label_smoothing(X[:, :, :1], radius=1.0)
    assert sm.shape == (20, 20, 1)


def test_augmentation_pipeline_deterministic(rng):
    X = rng.normal(size=(8, 8, 2)).astype(np.float32)
    pipe = AugmentationPipeline([
        (augmentation_rotation, 1.0, {}),
        (augmentation_noise_uniform, 0.5, {"amount": 0.1}),
    ], seed=9)
    a = pipe.apply(X, sample_id=123)
    b = pipe.apply(X, sample_id=123)
    np.testing.assert_array_equal(a, b)
    c = pipe.apply(X, sample_id=124)
    assert not np.array_equal(a, c)


def test_splits_and_sampling(ray_session):
    import ray.data as rd

    from buteo_ray.stages.selection import (
        add_split_column,
        sampling_random,
        sampling_stratified,
        split_train_val,
    )

    df = pd.DataFrame({"id": np.arange(2000), "cls": np.arange(2000) % 4})
    ds = rd.from_pandas(df)

    tagged = add_split_column(ds, "id", val_frac=0.2, test_frac=0.1).to_pandas()
    frac_val = (tagged["split"] == "val").mean()
    frac_test = (tagged["split"] == "test").mean()
    assert 0.15 < frac_val < 0.25 and 0.06 < frac_test < 0.14
    # Determinism: same assignment on re-run.
    tagged2 = add_split_column(rd.from_pandas(df), "id", val_frac=0.2, test_frac=0.1).to_pandas()
    pd.testing.assert_series_equal(
        tagged.sort_values("id")["split"].reset_index(drop=True),
        tagged2.sort_values("id")["split"].reset_index(drop=True),
    )

    train, val = split_train_val(ds, "id", val_frac=0.25)
    assert train.count() + val.count() == 2000

    samp = sampling_random(ds, 0.3, "id").to_pandas()
    assert 0.25 < len(samp) / 2000 < 0.35

    strat = sampling_stratified(ds, "cls", n_per_class=50).to_pandas()
    assert (strat.groupby("cls").size() == 50).all()
