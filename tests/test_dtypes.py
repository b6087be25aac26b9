"""Checked safe-casting parity with the reference
(utils/utils_translate.py:474-565 range table, :739-783
``_safe_numpy_casting``; test cases mirror the reference's
tests_utils/test_utils_translate.py:110-135)."""

import numpy as np
import pytest

from buteo_ray.functions.dtypes import (dtype_range, parse_dtype, safe_cast,
                                        value_fits_dtype)


@pytest.fixture
def sample_array():
    # Mirrors the reference fixture's intent: values that overflow
    # narrow integer targets in both directions, plus fractions.
    return np.array([-300.6, -128.4, -0.5, 0.5, 127.5, 254.5, 300.7, 1e6])


def test_parse_dtype():
    assert parse_dtype("int32") == np.dtype("int32")
    assert parse_dtype(np.int32) == np.dtype("int32")
    with pytest.raises(ValueError):
        parse_dtype("invalid")
    with pytest.raises(TypeError):
        parse_dtype(None)


def test_dtype_range_table():
    assert dtype_range("uint8") == (0, 255)
    assert dtype_range("int16") == (-32768, 32767)
    assert dtype_range("uint64") == (0, 18446744073709551615)
    # The reference's deliberately-rounded float bounds, kept verbatim.
    assert dtype_range("float32") == (-3.4e38, 3.4e38)
    with pytest.raises(ValueError):
        dtype_range("complex128")


def test_value_fits_dtype():
    assert value_fits_dtype(255, "uint8")
    assert not value_fits_dtype(256, "uint8")
    assert not value_fits_dtype(-1, "uint8")
    assert value_fits_dtype(-1.5, "float32")


def test_safe_cast_clip_matches_reference(sample_array):
    # reference test_safe_numpy_casting: float32 passthrough cast
    result = safe_cast(sample_array, "float32")
    assert result.dtype == np.dtype("float32")

    # uint8: clip to [0, 255] with rint rounding, NOT numpy wrap.
    result = safe_cast(sample_array, "uint8")
    assert result.dtype == np.dtype("uint8")
    assert np.all(result <= 255)
    expected = np.clip(np.rint(sample_array), 0, 255).astype("uint8")
    np.testing.assert_array_equal(result, expected)
    assert result[-1] == 255  # 1e6 clamps, does not wrap

    # int8: negative clamp side.
    result = safe_cast(sample_array, "int8")
    assert result[0] == -128 and result[-1] == 127

    with pytest.raises(TypeError):
        safe_cast([1, 2, 3], "int32")


def test_safe_cast_rint_banker_rounding():
    # np.rint rounds half-to-even — parity with the reference's rule.
    arr = np.array([0.5, 1.5, 2.5, -0.5])
    np.testing.assert_array_equal(safe_cast(arr, "int32"),
                                  np.array([0, 2, 2, 0], dtype=np.int32))


def test_safe_cast_same_dtype_is_noop():
    arr = np.arange(4, dtype=np.float32)
    assert safe_cast(arr, "float32") is arr


def test_safe_cast_raise_mode():
    arr = np.array([0.0, 300.0])
    with pytest.raises(OverflowError):
        safe_cast(arr, "uint8", mode="raise")
    ok = safe_cast(np.array([0.0, 200.0]), "uint8", mode="raise")
    np.testing.assert_array_equal(ok, np.array([0, 200], dtype=np.uint8))
    with pytest.raises(OverflowError):
        safe_cast(np.array([np.nan, 1.0]), "int32", mode="raise")
    # NaN → float target is representable; raise mode allows it.
    out = safe_cast(np.array([np.nan, 1.0]), "float32", mode="raise")
    assert np.isnan(out[0])


def test_safe_cast_unsafe_mode_wraps():
    out = safe_cast(np.array([300], dtype=np.int64), "uint8", mode="unsafe")
    assert out[0] == 44  # numpy wrap — explicit opt-out only


def test_map_tiles_out_dtype_clips(ray_session):
    """map_tiles(out_dtype=...) must use the checked cast: an
    overflowing float kernel output clamps to the dtype range instead
    of wrapping (reference utils_translate.py:739-783 semantics)."""
    from buteo_ray.sources.raster import (map_tiles, raster_from_array,
                                          raster_to_array)

    arr = np.full((32, 48), 200.0, dtype=np.float64)
    ds = raster_from_array(arr, tile_size=32, halo=0)
    out = map_tiles(ds, lambda a, row: a * 2.0, out_dtype="uint8")
    back = raster_to_array(out)[:, :, 0]
    assert back.dtype == np.uint8
    assert (back == 255).all()  # 400 clamps to 255, not 400 % 256 == 144
