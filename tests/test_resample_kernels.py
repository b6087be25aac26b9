"""Resample algorithm parity (VERDICT r01 item 4): cubic / cubicspline /
lanczos separable kernels + mode/median/q1/q3/sum/rms/min statistical
reducers, with the tiled == untiled invariant (halo-correct map_tiles
use). Reference surface: raster/resample.py:29-332,
utils/utils_translate.py:293-346."""

import numpy as np
import pytest

from buteo_ray.functions.raster_ops import (
    resample,
    resample_reduce,
    resample_separable,
    resample_tile,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_cubic_exact_on_linear_ramp():
    # Keys cubic interpolates degree-<=1 signals exactly (a=-0.5 kernel);
    # interior output pixels of an upsampled linear ramp must lie ON the ramp.
    x = np.arange(16, dtype=np.float64)
    arr = np.tile(x, (16, 1))[:, :, None] * 2.0 + 3.0
    up = resample_separable(arr, 2.0, "cubic")
    assert up.shape == (32, 32, 1)
    fx = (np.arange(32) + 0.5) / 2.0 - 0.5
    interior = slice(4, -4)
    np.testing.assert_allclose(up[8, interior, 0], fx[interior] * 2.0 + 3.0,
                               atol=1e-9)


def test_separable_identity_at_scale_one():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(9, 7, 2))
    for alg in ("cubic", "lanczos"):
        # scale 1 puts every output center exactly on a source sample —
        # interpolating kernels must reproduce the input bit-for-bit-ish.
        np.testing.assert_allclose(resample_separable(arr, 1.0, alg), arr, atol=1e-12)
    # cubicspline SMOOTHS (B-spline is not interpolating): constant
    # arrays survive, arbitrary arrays need not.
    np.testing.assert_allclose(resample_separable(np.full((6, 6), 4.5), 1.0,
                                                  "cubicspline"), 4.5)


def test_lanczos_constant_and_dc_gain(rng):
    arr = np.full((10, 10), 7.25)
    for s in (0.5, 1.5, 2.0):
        np.testing.assert_allclose(resample_separable(arr, s, "lanczos"), 7.25,
                                   atol=1e-12)


def test_reducers_hand_oracle():
    arr = np.array([[1.0, 2.0, 10.0, 20.0],
                    [3.0, 4.0, 30.0, 40.0],
                    [5.0, 5.0, 1.0, 2.0],
                    [5.0, 6.0, 2.0, 2.0]])
    f = 2
    cases = {
        "sum": [[10.0, 100.0], [21.0, 7.0]],
        "min": [[1.0, 10.0], [5.0, 1.0]],
        "max": [[4.0, 40.0], [6.0, 2.0]],
        "average": [[2.5, 25.0], [5.25, 1.75]],
        "median": [[2.5, 25.0], [5.0, 2.0]],
        "rms": [[np.sqrt(30 / 4), np.sqrt(3000 / 4)],
                [np.sqrt(111 / 4), np.sqrt(13 / 4)]],
        "q1": [[1.75, 17.5], [5.0, 1.75]],
        "q3": [[3.25, 32.5], [5.25, 2.0]],
        "mode": [[1.0, 10.0], [5.0, 2.0]],  # ties → smallest
    }
    for stat, expect in cases.items():
        got = resample_reduce(arr, f, stat)[:, :, 0]
        np.testing.assert_allclose(got, expect, err_msg=stat)


def test_reducers_nodata():
    arr = np.array([[1.0, -9.0], [-9.0, -9.0],
                    [2.0, 4.0], [6.0, 8.0]])
    out = resample_reduce(arr, 2, "average", nodata=-9.0)[:, :, 0]
    np.testing.assert_allclose(out, [[1.0], [5.0]])
    out_all = resample_reduce(np.full((2, 2), -9.0), 2, "median", nodata=-9.0)
    assert out_all[0, 0, 0] == -9.0


def test_mode_prefers_most_frequent(rng):
    arr = np.array([[3.0, 3.0, 1.0, 1.0],
                    [3.0, 9.0, 1.0, 2.0]])
    got = resample_reduce(arr, 2, "mode")[:, :, 0]
    np.testing.assert_allclose(got, [[3.0, 1.0]])


def test_dispatcher_full_surface(rng):
    arr = rng.normal(size=(8, 8, 1))
    for alg in ("nearest", "bilinear", "cubic", "cubicspline", "lanczos"):
        assert resample(arr, 2.0, alg).shape == (16, 16, 1)
    for alg in ("average", "sum", "min", "max", "median", "rms", "q1", "q3", "mode"):
        assert resample(arr, 0.5, alg).shape == (4, 4, 1)
    with pytest.raises(ValueError, match="integer downscale"):
        resample(arr, 0.3, "median")
    with pytest.raises(ValueError, match="unknown"):
        resample(arr, 2.0, "nope")


@pytest.mark.parametrize("alg,halo", [("cubic", 4), ("lanczos", 4),
                                      ("cubicspline", 4)])
def test_tiled_equals_untiled(rng, alg, halo):
    """Per-tile resample over haloed tiles stitches to the whole-array
    result (the map_tiles invariant)."""
    arr = rng.normal(size=(24, 24, 1))
    whole = resample_separable(arr, 2.0, alg)
    ts = 8
    out = np.zeros_like(whole)
    for y0 in range(0, 24, ts):
        for x0 in range(0, 24, ts):
            ys, ye = max(y0 - halo, 0), min(y0 + ts + halo, 24)
            xs, xe = max(x0 - halo, 0), min(x0 + ts + halo, 24)
            block = arr[ys:ye, xs:xe, :]
            pad = ((halo - (y0 - ys), halo - (ye - y0 - ts)),
                   (halo - (x0 - xs), halo - (xe - x0 - ts)), (0, 0))
            block = np.pad(block, pad, mode="edge")
            tile_out = resample_tile(block, halo, 2.0, alg)
            out[2 * y0:2 * (y0 + ts), 2 * x0:2 * (x0 + ts), :] = tile_out
    # Interior tiles are exact; image-boundary tiles see edge-replicated
    # halos identical to the whole-array clamp → everything matches.
    np.testing.assert_allclose(out, whole, atol=1e-9)


def test_reduce_tiled_equals_untiled(rng):
    arr = rng.normal(size=(16, 16, 1))
    whole = resample_reduce(arr, 2, "median")
    ts = 8
    out = np.zeros_like(whole)
    for y0 in range(0, 16, ts):
        for x0 in range(0, 16, ts):
            t = resample_tile(arr[y0:y0 + ts, x0:x0 + ts, :], 0, 0.5, "median")
            out[y0 // 2:(y0 + ts) // 2, x0 // 2:(x0 + ts) // 2, :] = t
    np.testing.assert_allclose(out, whole)
