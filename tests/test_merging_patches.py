"""Patch kernels vs reference semantics (FIXTURES.md §4) and merge
kernels vs direct per-pixel transcriptions of the reference numba code
(/root/reference/buteo/array/patches/merging.py)."""

import numpy as np
import pytest

from buteo_ray.functions.array_patches import (
    array_to_patches,
    array_to_patches_single,
    channel_first_to_last,
    channel_last_to_first,
    get_kernel_weights,
    patches_to_array_single,
    patches_to_weights,
)
from buteo_ray.functions.merging import (
    merge_weighted_average,
    merge_weighted_mad,
    merge_weighted_median,
    merge_weighted_minmax,
    merge_weighted_mode,
    merge_weighted_olympic,
)


@pytest.fixture
def gradient():
    """FIXTURES.md §4 gradient_10x10x3."""
    i, j = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    return np.stack([i / 10, j / 10, (i + j) / 20], axis=-1).astype(np.float32)


def test_patches_shapes_and_content(gradient):
    p = array_to_patches_single(gradient, 5)
    assert p.shape == (4, 5, 5, 3)
    np.testing.assert_array_equal(p[0], gradient[0:5, 0:5, :])
    np.testing.assert_array_equal(p[1], gradient[0:5, 5:10, :])
    np.testing.assert_array_equal(p[3], gradient[5:10, 5:10, :])


def test_patches_offset(gradient):
    p = array_to_patches_single(gradient, 5, offset=[1, 1])
    assert p.shape == (1, 5, 5, 3)
    np.testing.assert_array_equal(p[0], gradient[1:6, 1:6, :])


def test_patch_roundtrip(gradient):
    p = array_to_patches_single(gradient, 5)
    back = patches_to_array_single(p, (10, 10, 3), 5)
    np.testing.assert_array_equal(back, gradient)


def test_patch_roundtrip_with_offset_background(gradient):
    p = array_to_patches_single(gradient, 5, offset=[1, 0])
    back = patches_to_array_single(p, (10, 10, 3), 5, offset=[1, 0], background_value=-1.0)
    np.testing.assert_array_equal(back[1:6, :, :], gradient[1:6, :, :])
    assert (back[0] == -1.0).all()


def test_array_to_patches_border_duplicates(gradient):
    # 10x10, tile 4: base grid (0,0) → 2x2=4; border grids (0,6) → 2,
    # (6,0) → 2, (6,6) → 1 → 9 total (duplicates allowed per reference).
    p = array_to_patches(gradient, 4, n_offsets=0, border_check=True)
    assert p.shape == (9, 4, 4, 3)
    # Reference knowingly allows duplicates; with tile 5 no borders needed.
    p5 = array_to_patches(gradient, 5, n_offsets=0, border_check=True)
    assert p5.shape == (4, 5, 5, 3)


def test_channel_order_roundtrip(gradient):
    cf = channel_last_to_first(gradient)
    assert cf.shape == (3, 10, 10)
    np.testing.assert_array_equal(channel_first_to_last(cf), gradient)


def test_kernel_weights_match_reference_loop():
    # Direct transcription of reference util.py:11-66 as oracle.
    def oracle(tile_size, edge_distance, epsilon=1e-7):
        arr = np.zeros((tile_size, tile_size), dtype="float32")
        max_dist = edge_distance * 2
        for y in range(tile_size):
            for x in range(tile_size):
                vy = max(edge_distance - y, 0.0) + max((1 + edge_distance) - (tile_size - y), 0.0)
                vx = max(edge_distance - x, 0.0) + max((1 + edge_distance) - (tile_size - x), 0.0)
                val = (max_dist - abs(vy + vx)) / max_dist
                arr[y, x] = epsilon if val <= 0.0 else val
        return arr

    for ts, ed in [(16, 3), (64, 5), (9, 2)]:
        np.testing.assert_allclose(get_kernel_weights(ts, ed), oracle(ts, ed), rtol=1e-6)

    w = patches_to_weights(np.zeros((7, 16, 16, 2), dtype=np.float32), 3)
    assert w.shape == (7, 16, 16, 1)


# ---------------- merge kernels vs per-pixel reference transcriptions ------


def _ref_weighted_median(values, weights):
    nan_mask = np.where(~np.isnan(values))[0]
    if len(nan_mask) == 0:
        return 0.0
    values, weights = values[nan_mask], weights[nan_mask]
    sort = np.argsort(values)
    sd, sw = values[sort], weights[sort]
    cumsum = np.cumsum(sw)
    intersect = (cumsum - 0.5 * sw) / cumsum[-1]
    return np.interp(0.5, intersect, sd)


def _stack(rng, n=5, h=6, w=6, c=2, with_nan=True):
    arr = rng.normal(size=(n, h, w, c)).astype(np.float32)
    if with_nan:
        arr[rng.random(size=arr.shape) < 0.2] = np.nan
    weights = rng.uniform(0.1, 1.0, size=(n, h, w, 1)).astype(np.float32)
    return arr, weights


def test_merge_median_matches_reference(rng):
    arr, weights = _stack(rng)
    got = merge_weighted_median(arr, weights)
    for y in range(arr.shape[1]):
        for x in range(arr.shape[2]):
            for b in range(arr.shape[3]):
                exp = _ref_weighted_median(arr[:, y, x, b].astype(np.float64),
                                           weights[:, y, x, 0].astype(np.float64))
                np.testing.assert_allclose(got[y, x, b], exp, rtol=1e-5, atol=1e-6)


def test_merge_average_matches_reference(rng):
    arr, weights = _stack(rng)
    got = merge_weighted_average(arr, weights)
    for y in range(arr.shape[1]):
        for x in range(arr.shape[2]):
            for b in range(arr.shape[3]):
                v = arr[:, y, x, b].astype(np.float64)
                w = weights[:, y, x, 0].astype(np.float64)
                mask = ~np.isnan(v)
                if mask.any():
                    exp = np.sum(v[mask] * w[mask]) / np.sum(w[mask])
                    np.testing.assert_allclose(got[y, x, b], exp, rtol=1e-5, atol=1e-6)


def test_merge_minmax_matches_reference(rng):
    arr, weights = _stack(rng)
    for method in ("max", "min"):
        got = merge_weighted_minmax(arr, weights, method)
        for y in range(arr.shape[1]):
            for x in range(arr.shape[2]):
                for b in range(arr.shape[3]):
                    v = arr[:, y, x, b].astype(np.float64)
                    w = weights[:, y, x, 0].astype(np.float64)
                    mask = ~np.isnan(v)
                    if mask.any():
                        vv, ww = v[mask], w[mask]
                        idx = np.argmax(vv * ww) if method == "max" else np.argmin(vv * ww)
                        np.testing.assert_allclose(got[y, x, b], vv[idx], rtol=1e-5)


def test_merge_olympic_matches_reference(rng):
    arr, weights = _stack(rng, n=7)
    got = merge_weighted_olympic(arr, weights, level=1)
    for y in range(arr.shape[1]):
        for x in range(arr.shape[2]):
            for b in range(arr.shape[3]):
                v = arr[:, y, x, b].astype(np.float64)
                w = weights[:, y, x, 0].astype(np.float64)
                mask = ~np.isnan(v)
                v, w = v[mask], w[mask]
                if len(v) == 0:
                    continue
                required = 3
                if len(v) < required:
                    exp = np.mean(v)
                elif len(v) == required:
                    exp = np.sort(v)[1]
                else:
                    so = np.argsort(v, kind="stable")[1:-1]
                    sw = w[so] / np.sum(w[so])
                    exp = np.sum(v[so] * sw)
                np.testing.assert_allclose(got[y, x, b], exp, rtol=1e-5, atol=1e-6)


def test_merge_mad_matches_reference(rng):
    arr, weights = _stack(rng, n=7)
    got = merge_weighted_mad(arr, weights)
    for y in range(arr.shape[1]):
        for x in range(arr.shape[2]):
            for b in range(arr.shape[3]):
                v = arr[:, y, x, b].astype(np.float64)
                w = weights[:, y, x, 0].astype(np.float64)
                mask = ~np.isnan(v)
                v2, w2 = v[mask], w[mask]
                if len(v2) == 0:
                    continue
                sort = np.argsort(v2)
                sd, sw = v2[sort], w2[sort]
                cumsum = np.cumsum(sw)
                intersect = (cumsum - 0.5 * sw) / cumsum[-1]
                median = np.interp(0.5, intersect, sd)
                mad = np.median(np.abs(median - v2))
                if mad == 0.0:
                    exp = median
                else:
                    nw = 1.0 - np.minimum(np.abs(sd - median) / (mad * 2.0), 1)
                    if np.sum(nw) == 0.0:
                        exp = median
                    else:
                        cumsum = np.cumsum(nw)
                        intersect = (cumsum - 0.5 * nw) / cumsum[-1]
                        exp = np.interp(0.5, intersect, sd)
                np.testing.assert_allclose(got[y, x, b], exp, rtol=1e-4, atol=1e-5)


def test_merge_mode_basic():
    # Distinct weight sums → no tie-break ambiguity.
    arr = np.array([1.0, 2.0, 2.0, 3.0]).reshape(4, 1, 1, 1).astype(np.float32)
    w = np.array([0.5, 0.4, 0.3, 0.9]).reshape(4, 1, 1, 1).astype(np.float32)
    out = merge_weighted_mode(arr, w)
    assert out[0, 0, 0] == pytest.approx(3.0)  # 0.9 beats 0.7 and 0.5... no: 2.0 has 0.7
    w2 = np.array([0.5, 0.4, 0.4, 0.6]).reshape(4, 1, 1, 1).astype(np.float32)
    assert merge_weighted_mode(arr, w2)[0, 0, 0] == pytest.approx(2.0)
    # NaN-only pixel → 0.
    nanarr = np.full((3, 1, 1, 1), np.nan, dtype=np.float32)
    assert merge_weighted_mode(nanarr, np.ones_like(nanarr))[0, 0, 0] == 0.0
