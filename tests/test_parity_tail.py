"""Fine-grained parity tail (VERDICT r02 item 5): encode_width /
encode_arr_position, 3-way split, class-label nearest fill, bezier line
masks, per-pixel prediction — each mirroring the reference's tests
(`/root/reference/buteo/ai/encoding.py:270-337`, `ai/selection.py:71-140`,
`array/fill.py:122-225` + `tests/tests_array/test_array_fill.py:67-94`,
`ai/masking/line_masking.py:305-396`, `array/patches/prediction.py:189-209`)."""

import numpy as np
import pandas as pd
import pytest

from buteo_ray.functions.encoding import encode_arr_position, encode_width


def _ref_encode_width(lng, lng_max):
    s = ((np.sin(2 * np.pi * (lng / lng_max)) + 1)) / 2.0
    c = ((np.cos(2 * np.pi * (lng / lng_max)) + 1)) / 2.0
    return np.array([s, c], dtype=np.float32)


def test_encode_width_matches_reference_math():
    for lng in [-180.0, -37.5, 0.0, 1.0, 90.0, 179.0, 359.0]:
        got = encode_width(lng, 360.0)
        exp = _ref_encode_width(lng, 360.0)
        np.testing.assert_allclose(got, exp, atol=1e-6)
        assert got.dtype == np.float32
    # cyclical: position 0 and position lng_max encode identically
    np.testing.assert_allclose(encode_width(0.0, 17.0), encode_width(17.0, 17.0), atol=1e-6)


def test_encode_arr_position_matches_reference_loop():
    m, n = 5, 7
    arr = np.zeros((m, n), dtype=np.float32)
    got = encode_arr_position(arr)
    assert got.shape == (m, n, 3) and got.dtype == np.float32
    # reference triple loop (encoding.py:300-337), transcribed:
    col_end, row_end = m - 1, n - 1
    exp = np.zeros((m, n, 3), dtype=np.float32)
    for col in range(m):
        for row in range(n):
            enc = _ref_encode_width(np.float32(row), row_end)
            exp[col, row, 0] = enc[0]
            exp[col, row, 1] = enc[1]
            exp[col, row, 2] = np.float32(col) / col_end
    np.testing.assert_allclose(got, exp, atol=1e-6)
    # width axis cyclical: first and last columns of axis 1 agree on sin/cos
    np.testing.assert_allclose(got[:, 0, :2], got[:, -1, :2], atol=1e-6)
    # linear axis: monotonically increasing 0 → 1
    assert got[0, 0, 2] == 0.0 and got[-1, 0, 2] == 1.0

    with pytest.raises(ValueError):
        encode_arr_position(np.zeros((1, 5)))
    with pytest.raises(ValueError):
        encode_arr_position(np.zeros(5))


def test_split_train_val_test_arrays_reference_parity():
    from buteo_ray.stages.selection import split_train_val_test_arrays

    n = 1000
    X = np.arange(n * 3, dtype=np.float64).reshape(n, 3)
    y = np.arange(n)
    xt, xv, xs, yt, yv, ys = split_train_val_test_arrays(
        X, y, val_size=0.1, test_size=0.2, random_state=7)
    # reference cut points: test at int(n·0.8), val at int(0.9·that)
    test_split = int(n * 0.8)
    val_split = int(0.9 * test_split)
    assert len(xt) == val_split and len(xv) == test_split - val_split
    assert len(xs) == n - test_split
    # X/y stay aligned and the 3 parts partition the input exactly
    for xa, ya in [(xt, yt), (xv, yv), (xs, ys)]:
        np.testing.assert_array_equal(xa[:, 0] // 3, ya)
    all_ids = np.concatenate([yt, yv, ys])
    assert len(np.unique(all_ids)) == n
    # bit-identical to the reference's np.random.seed + shuffle plan
    np.random.seed(7)
    idx = np.arange(n)
    np.random.shuffle(idx)
    np.testing.assert_array_equal(yt, y[idx[:val_split]])
    np.testing.assert_array_equal(ys, y[idx[test_split:]])


def test_split_train_val_test_dataset(ray_session):
    import ray.data as rd

    from buteo_ray.stages.selection import split_train_val_test

    df = pd.DataFrame({"id": np.arange(3000)})
    tr, va, te = split_train_val_test(rd.from_pandas(df), "id",
                                      val_frac=0.1, test_frac=0.2, seed=3)
    nt, nv, ns = tr.count(), va.count(), te.count()
    assert nt + nv + ns == 3000
    # reference proportions: P(test)=0.2, P(val)=0.1·0.8=0.08
    assert 0.16 < ns / 3000 < 0.24
    assert 0.05 < nv / 3000 < 0.11
    with pytest.raises(ValueError):
        split_train_val_test(rd.from_pandas(df), "id", val_frac=0.0)


def test_fill_nearest_classes_reference_fixtures():
    from buteo_ray.functions.raster_ops import fill_nearest_classes

    # reference test_array_fill.py:30-74 — tie between classes 1 and 2
    # breaks to the first of the ascending-sorted uniques (class 1)
    arr = np.array([[1, 1, 2], [2, -1, 1], [1, 2, 2]], dtype=np.int64)
    filled = fill_nearest_classes(arr, nodata=-1)
    assert filled[1, 1] == 1
    assert (filled != -1).all()
    # untouched cells keep their values
    keep = arr != -1
    np.testing.assert_array_equal(filled[keep], arr[keep])

    # reference test_array_fill.py:77-94 — masking out (0,0) removes one
    # diagonal class-1 vote, so class 2 wins
    mask = np.ones((3, 3), dtype=np.uint8)
    mask[0, 0] = 0
    filled2 = fill_nearest_classes(arr, nodata=-1, mask=mask)
    assert filled2[1, 1] == 2
    assert filled2[0, 0] == arr[0, 0]


def test_fill_nearest_classes_iterates_and_bounds():
    from buteo_ray.functions.raster_ops import fill_nearest_classes

    arr = np.full((1, 6), -1, dtype=np.int64)
    arr[0, 0] = 5
    one_iter = fill_nearest_classes(arr, nodata=-1, max_iter=1)
    assert one_iter[0, 1] == 5 and one_iter[0, 3] == -1
    full = fill_nearest_classes(arr, nodata=-1)
    assert (full == 5).all()
    # unreachable hole (all neighbours masked) terminates without filling
    m = np.zeros((1, 6), dtype=np.uint8)
    m[0, 3] = 1
    stuck = fill_nearest_classes(arr, nodata=-1, mask=m)
    assert stuck[0, 3] == -1


def test_mask_lines_bezier():
    from buteo_ray.functions.augmentation import mask_lines_bezier

    X = np.ones((32, 40, 3), dtype=np.float32)
    m = mask_lines_bezier(X, np.random.default_rng(5), p=0.2)
    assert m.shape == (32, 40, 3) and m.dtype == np.uint8
    assert set(np.unique(m)) <= {0, 1}
    assert (m == 0).any()
    # same lines on every channel
    assert (m == m[:, :, :1]).all()
    # deterministic under the same rng seed
    m2 = mask_lines_bezier(X, np.random.default_rng(5), p=0.2)
    np.testing.assert_array_equal(m, m2)
    # p=0 → nothing masked
    m0 = mask_lines_bezier(X, np.random.default_rng(5), p=0.0)
    assert (m0 == 1).all()


def test_predict_array_pixel_local_and_dataset(ray_session):
    from buteo_ray.pipelines.predict import predict_array_pixel, predict_dataset_pixel
    from buteo_ray.sources.raster import raster_from_array, raster_to_array

    rng = np.random.default_rng(11)
    arr = rng.normal(size=(48, 56, 3)).astype(np.float32)
    W = np.array([[1.0, 0.5], [-1.0, 2.0], [0.25, 0.0]], dtype=np.float32)

    def model(flat):
        return flat @ W

    local = predict_array_pixel(arr, model)
    assert local.shape == (48, 56, 2)
    np.testing.assert_allclose(local[10, 20], arr[10, 20] @ W, atol=1e-5)
    # 2-output reshape parity with the reference's plan: reshape→call→reshape
    np.testing.assert_allclose(
        local, (arr.reshape(-1, 3) @ W).reshape(48, 56, 2), atol=0)

    with pytest.raises(ValueError):
        predict_array_pixel(arr[..., 0], model)

    tiles = raster_from_array(arr, tile_size=16, halo=0)
    scored = predict_dataset_pixel(tiles, lambda: model, concurrency=2)
    out = raster_to_array(scored)
    np.testing.assert_allclose(out, local, atol=1e-5)
