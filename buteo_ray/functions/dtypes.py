"""Checked dtype casting — parity with the reference's safe-casting
rules (reference utils/utils_translate.py:474-565 range table and
:739-783 ``_safe_numpy_casting``).

Numpy's ``astype`` wraps silently on integer overflow (e.g. ``300 →
uint8`` gives 44); the reference instead clips to the destination
range and rounds half-away-from-zero-ish via ``np.rint`` for integer
targets. ``safe_cast`` reproduces that, plus an opt-in ``"raise"``
mode for callers that want a hard error instead of a clamp.
"""

from typing import Tuple, Union

import numpy as np

# Reference range table (utils_translate.py:500-517). Float ranges are
# the reference's own deliberately-rounded constants, kept verbatim so
# clip behavior matches; integer ranges are exact.
_DTYPE_RANGES = {
    "int8": (-128, 127),
    "int16": (-32768, 32767),
    "int32": (-2147483648, 2147483647),
    "int64": (-9223372036854775808, 9223372036854775807),
    "uint8": (0, 255),
    "uint16": (0, 65535),
    "uint32": (0, 4294967295),
    "uint64": (0, 18446744073709551615),
    "float16": (-6.1e4, 6.1e4),
    "float32": (-3.4e38, 3.4e38),
    "float64": (-1.8e308, 1.8e308),
}


def parse_dtype(dtype: Union[str, np.dtype, type]) -> np.dtype:
    """Normalize a dtype spec (≙ ``_parse_dtype``); raises ValueError
    on anything numpy can't parse."""
    if dtype is None:
        raise TypeError("dtype cannot be None")
    try:
        return np.dtype(dtype)
    except Exception as e:
        raise ValueError(f"Invalid dtype: {dtype!r}") from e


def dtype_range(dtype: Union[str, np.dtype, type]) -> Tuple[float, float]:
    """(min, max) representable per the reference's table (≙
    ``_get_range_for_numpy_datatype``)."""
    name = parse_dtype(dtype).name
    if name == "bool":
        return (0, 1)
    if name not in _DTYPE_RANGES:
        raise ValueError(f"No range known for dtype {name!r}")
    return _DTYPE_RANGES[name]


def value_fits_dtype(value: float, dtype: Union[str, np.dtype]) -> bool:
    """≙ ``_check_value_is_within_dtype_range``
    (utils_translate.py:540-568)."""
    lo, hi = dtype_range(dtype)
    return lo <= value <= hi


def safe_cast(arr: np.ndarray, dtype: Union[str, np.dtype, type],
              mode: str = "clip") -> np.ndarray:
    """Checked cast (≙ ``_safe_numpy_casting``,
    utils_translate.py:739-783).

    ``mode="clip"`` (the reference's behavior): clip to the destination
    range — rounding with ``np.rint`` first for integer targets — then
    cast. ``mode="raise"``: raise OverflowError if any finite value
    falls outside the destination range (NaN → integer also raises).
    ``mode="unsafe"``: plain ``astype`` (numpy wrap semantics).
    """
    if not isinstance(arr, np.ndarray):
        raise TypeError("Input must be a numpy array")
    target = parse_dtype(dtype)
    if arr.dtype == target:
        return arr
    if mode == "unsafe":
        return arr.astype(target)
    if mode not in ("clip", "raise"):
        raise ValueError(f"mode must be clip|raise|unsafe, got {mode!r}")

    is_int_target = target.kind in ("i", "u")
    lo, hi = dtype_range(target)

    if mode == "raise":
        vals = arr
        if arr.dtype.kind == "f":
            finite = np.isfinite(arr)
            if is_int_target and not finite.all():
                raise OverflowError(
                    f"non-finite values cannot cast to {target.name}")
            vals = arr[finite] if not finite.all() else arr
        if vals.size:
            if vals.dtype.kind in ("i", "u", "b"):
                # Exact int comparison: an array-vs-python-int compare
                # can promote to float64 (uint64 source) and round the
                # bound, hiding edge overflows.
                mn, mx = int(vals.min()), int(vals.max())
                if mn < lo or mx > hi:
                    raise OverflowError(
                        f"values [{mn}, {mx}] exceed {target.name} "
                        f"range [{lo}, {hi}]")
            elif is_int_target:
                # Float source → integer target: check the ROUNDED
                # value against bounds nudged inward to the nearest
                # float64 that is still inside the target range —
                # float64(int64.max) rounds UP to 2^63, so a plain
                # `vals > hi` compare promotes hi to 2^63 and lets
                # exactly-2^63 values through to a wrapping astype.
                v = np.rint(vals.astype(np.float64))
                lo_f, hi_f = np.float64(lo), np.float64(hi)
                if int(lo_f) < lo:
                    lo_f = np.nextafter(lo_f, np.float64(0))
                if int(hi_f) > hi:
                    hi_f = np.nextafter(hi_f, np.float64(0))
                if np.any(v < lo_f) or np.any(v > hi_f):
                    raise OverflowError(
                        f"rounded values [{v.min()}, {v.max()}] exceed "
                        f"{target.name} range [{lo}, {hi}]")
            else:
                if np.any(vals < lo) or np.any(vals > hi):
                    raise OverflowError(
                        f"values [{np.min(vals)}, {np.max(vals)}] exceed "
                        f"{target.name} range [{lo}, {hi}]")
        if is_int_target and arr.dtype.kind == "f":
            return np.rint(arr).astype(target)
        return arr.astype(target)

    # clip mode — the reference default.
    if is_int_target:
        if arr.dtype.kind == "b":
            return arr.astype(target)
        if arr.dtype.kind in ("i", "u"):
            # Integer source: clamp in INTEGER arithmetic. A float64
            # detour (np.rint promotes ints) corrupts values above
            # 2^53 and overflows near-max uint64 → INT64_MIN. The
            # bounds are expressed exactly in the source dtype (both
            # lie inside its range after max/min), so the comparison
            # never promotes.
            info = np.iinfo(arr.dtype)
            if int(info.min) >= lo and int(info.max) <= hi:
                return arr.astype(target)
            lo_s = arr.dtype.type(max(lo, int(info.min)))
            hi_s = arr.dtype.type(min(hi, int(info.max)))
            return np.clip(arr, lo_s, hi_s).astype(target)
        # Float source → integer target: round, map NaN to 0
        # (deterministic — numpy's NaN→int astype is undefined
        # behavior), then clamp against the nearest float64 bounds
        # that stay INSIDE the target range: float64(int64.max)
        # rounds UP to 2^63, and clipping to that would overflow the
        # final cast back to INT64_MIN.
        v = np.rint(arr.astype(np.float64))
        v = np.where(np.isnan(v), 0.0, v)
        # Exact comparisons via int(): a float64-vs-int comparison would
        # promote the int bound to float64 and hide the very rounding
        # this guard exists to catch (float64(int64.max) == 2^63).
        lo_f, hi_f = np.float64(lo), np.float64(hi)
        if int(lo_f) < lo:
            lo_f = np.nextafter(lo_f, np.float64(0))
        if int(hi_f) > hi:
            hi_f = np.nextafter(hi_f, np.float64(0))
        return np.clip(v, lo_f, hi_f).astype(target)
    return np.clip(arr, lo, hi).astype(target)
