"""Cyclical coordinate encodings and per-pixel timeseries regression —
vectorized parity with ``/root/reference/buteo/ai/encoding.py:13-337``
and ``array/timeseries.py:8-113``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def encode_latitude(lat) -> np.ndarray:
    """(…,) lat → (…, 2) [sin01, cos01]; reference ``encoding.py:13-44``."""
    lat = np.asarray(lat, dtype=np.float64)
    adj = (lat + 90.0) / 180.0
    s = (np.sin(2 * np.pi * adj) + 1.0) / 2.0
    c = (np.cos(2 * np.pi * adj) + 1.0) / 2.0
    return np.stack([s, c], axis=-1).astype(np.float32)


def encode_longitude(lng) -> np.ndarray:
    """(…,) lon → (…, 2) [sin01, cos01]; reference ``encoding.py:47-78``."""
    lng = np.asarray(lng, dtype=np.float64)
    adj = (lng + 180.0) / 360.0
    s = (np.sin(2 * np.pi * adj) + 1.0) / 2.0
    c = (np.cos(2 * np.pi * adj) + 1.0) / 2.0
    return np.stack([s, c], axis=-1).astype(np.float32)


def encode_latlngs(latlngs: np.ndarray) -> np.ndarray:
    """(N, 2) [lat, lng] → (N, 4) [lat_sin, lat_cos, lng_sin, lng_cos]."""
    latlngs = np.asarray(latlngs, dtype=np.float64)
    return np.concatenate(
        [encode_latitude(latlngs[..., 0]), encode_longitude(latlngs[..., 1])], axis=-1
    )


def decode_latitude(encoded_sin, encoded_cos) -> np.ndarray:
    """Inverse of :func:`encode_latitude` (reference ``encoding.py:81-120``)."""
    s = np.asarray(encoded_sin, dtype=np.float64) * 2.0 - 1.0
    c = np.asarray(encoded_cos, dtype=np.float64) * 2.0 - 1.0
    angle = np.arctan2(s, c)
    frac = np.mod(angle / (2 * np.pi), 1.0)
    return (frac * 180.0) - 90.0


def decode_longitude(encoded_sin, encoded_cos) -> np.ndarray:
    s = np.asarray(encoded_sin, dtype=np.float64) * 2.0 - 1.0
    c = np.asarray(encoded_cos, dtype=np.float64) * 2.0 - 1.0
    angle = np.arctan2(s, c)
    frac = np.mod(angle / (2 * np.pi), 1.0)
    return (frac * 360.0) - 180.0


def add_latlng_encoding(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """Dataset stage: append the 4 cyclical encoding columns."""

    def _fn(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        el = encode_latitude(lat)
        eg = encode_longitude(lon)
        return (
            batch.append_column("lat_sin", pa.array(el[:, 0].astype(np.float64)))
            .append_column("lat_cos", pa.array(el[:, 1].astype(np.float64)))
            .append_column("lng_sin", pa.array(eg[:, 0].astype(np.float64)))
            .append_column("lng_cos", pa.array(eg[:, 1].astype(np.float64)))
        )

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def encode_width(lng, lng_max: float) -> np.ndarray:
    """(…,) position → (…, 2) [sin01, cos01] over a cyclical width
    ``lng_max`` (reference ``encoding.py:270-297``). Unlike
    :func:`encode_longitude` there is no +half-range shift."""
    lng = np.asarray(lng, dtype=np.float64)
    frac = lng / float(lng_max)
    s = (np.sin(2 * np.pi * frac) + 1.0) / 2.0
    c = (np.cos(2 * np.pi * frac) + 1.0) / 2.0
    return np.stack([s, c], axis=-1).astype(np.float32)


def encode_arr_position(arr: np.ndarray) -> np.ndarray:
    """(M, N) grid → (M, N, 3) positional encoding where axis 1 (the
    "width") is cyclical and axis 0 is linear — channels are
    [width_sin, width_cos, col_linear] (reference ``encoding.py:300-337``,
    vectorized via broadcasting instead of the prange triple loop)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("encode_arr_position expects a 2D array")
    m, n = arr.shape
    if m < 2 or n < 2:
        raise ValueError("encode_arr_position needs both dims >= 2")
    row_enc = encode_width(np.arange(n, dtype=np.float32), n - 1)  # (N, 2)
    col_enc = (np.arange(m, dtype=np.float32) / np.float32(m - 1))  # (M,)
    out = np.empty((m, n, 3), dtype=np.float32)
    out[:, :, 0:2] = row_enc[None, :, :]
    out[:, :, 2] = col_enc[:, None]
    return out


def timeseries_least_square_slope(arr: np.ndarray) -> np.ndarray:
    """Per-pixel OLS slope along the last axis of an (H, W, T) stack.
    Reference ``array/timeseries.py:8-49`` (same vectorized formula)."""
    if arr.ndim != 3:
        raise ValueError("Input array must be 3D")
    y = np.asarray(arr, dtype=np.float64)
    x = np.arange(y.shape[-1], dtype=np.float64)
    x_mean = x.mean()
    y_mean = y.mean(axis=2, keepdims=True)
    num = ((x - x_mean) * (y - y_mean)).sum(axis=2, keepdims=True)
    den = ((x - x_mean) ** 2).sum()
    return num / den


def timeseries_robust_slope(arr: np.ndarray, std_threshold: float = 1.0,
                            iterations: int = 2) -> np.ndarray:
    """Robust variant: iteratively drop samples with residual > k·σ then
    refit (reference ``timeseries.py:50-113`` semantics, fixed iteration
    count instead of 10 progress-reported splits)."""
    y = np.asarray(arr, dtype=np.float64)
    t = y.shape[-1]
    x = np.arange(t, dtype=np.float64)
    mask = np.ones_like(y, dtype=bool)
    slope = np.zeros(y.shape[:2] + (1,))
    for _ in range(iterations):
        w = mask.astype(np.float64)
        n = w.sum(axis=2, keepdims=True)
        x_mean = (x * w).sum(axis=2, keepdims=True) / n
        y_mean = (y * w).sum(axis=2, keepdims=True) / n
        num = ((x - x_mean) * (y - y_mean) * w).sum(axis=2, keepdims=True)
        den = (((x - x_mean) ** 2) * w).sum(axis=2, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(den != 0, num / den, 0.0)
        intercept = y_mean - slope * x_mean
        resid = np.abs(y - (slope * x + intercept))
        std = np.sqrt((resid ** 2 * w).sum(axis=2, keepdims=True) / n)
        mask = resid <= std_threshold * np.maximum(std, 1e-12)
    return slope
