"""Color-space conversion — vectorized HSL↔RGB with the reference's
conventions (``/root/reference/buteo/array/color.py:89-179``: channel-
first (3, H, W) float arrays normalized to [0, 1], hue stored /360)."""

from __future__ import annotations

import numpy as np


def color_rgb_to_hsl(rgb: np.ndarray) -> np.ndarray:
    """(3, H, W) RGB in [0,1] → (3, H, W) HSL in [0,1] (hue/360)."""
    if rgb.ndim != 3 or rgb.shape[0] != 3:
        raise ValueError("input must be (3, H, W)")
    r, g, b = rgb[0].astype(np.float64), rgb[1].astype(np.float64), rgb[2].astype(np.float64)
    cmax = np.maximum(np.maximum(r, g), b)
    cmin = np.minimum(np.minimum(r, g), b)
    delta = cmax - cmin
    lum = (cmax + cmin) / 2.0

    sat = np.zeros_like(r)
    nz = delta != 0
    with np.errstate(invalid="ignore", divide="ignore"):
        sat[nz] = (delta / (1 - np.abs(2 * lum - 1)))[nz]

    hue = np.zeros_like(r)
    with np.errstate(invalid="ignore", divide="ignore"):
        h_r = ((g - b) / delta) % 6
        h_g = (b - r) / delta + 2
        h_b = (r - g) / delta + 4
    hue = np.where(cmax == r, h_r, np.where(cmax == g, h_g, h_b))
    hue = np.where(nz, (hue * 60) % 360, 0.0)
    hue = np.where(hue < 0, hue + 360, hue) / 360.0

    return np.clip(np.stack([hue, sat, lum]), 0.0, 1.0).astype(np.float32)


def color_hsl_to_rgb(hsl: np.ndarray) -> np.ndarray:
    """(3, H, W) HSL in [0,1] → (3, H, W) RGB in [0,1] (standard CSS
    formulation, matching the reference's `_single_hsl_to_rgb`)."""
    if hsl.ndim != 3 or hsl.shape[0] != 3:
        raise ValueError("input must be (3, H, W)")
    h = hsl[0].astype(np.float64) * 360.0
    s = hsl[1].astype(np.float64)
    lum = hsl[2].astype(np.float64)

    c = (1 - np.abs(2 * lum - 1)) * s
    x = c * (1 - np.abs((h / 60.0) % 2 - 1))
    m = lum - c / 2

    z = np.zeros_like(h)
    conds = [
        (h < 60, (c, x, z)),
        ((h >= 60) & (h < 120), (x, c, z)),
        ((h >= 120) & (h < 180), (z, c, x)),
        ((h >= 180) & (h < 240), (z, x, c)),
        ((h >= 240) & (h < 300), (x, z, c)),
        (h >= 300, (c, z, x)),
    ]
    r = np.zeros_like(h)
    g = np.zeros_like(h)
    b = np.zeros_like(h)
    for mask, (rr, gg, bb) in conds:
        r = np.where(mask, rr, r)
        g = np.where(mask, gg, g)
        b = np.where(mask, bb, b)
    return np.clip(np.stack([r + m, g + m, b + m]), 0.0, 1.0).astype(np.float32)
