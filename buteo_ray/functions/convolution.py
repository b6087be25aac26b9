"""Convolution / neighborhood (focal) operations — vectorized numpy
re-implementations of the reference's numba kernels.

Semantics follow ``/root/reference/buteo/array/convolution/funcs.py``
(the ``_hood_*`` reducers, including their weighted max/min/contrast
definitions and the cumulative-weight quantile) and
``kernels.py:51-488`` (kernel constructors). The circular kernel's
fractional rim coverage reproduces the reference's 10×10-point cell
sampling exactly (kernels.py ``_area_covered``), vectorized as one
distance matrix over rim cells × sample points.

Engine mapping: these run inside ``map_batches`` over HALO-PADDED tile
rows — the tile carries ``halo`` extra pixels on each side so focal ops
need no cross-task communication (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ kernels


def circular_kernel(radius: float) -> np.ndarray:
    """(2⌈r⌉+1)² kernel: 1 inside the circle, 0 outside, and the
    reference's 10×10-point cell-coverage fraction on the rim
    (kernels.py `_circular_kernel_2D` + `_area_covered` — a cell is rim
    iff its four corners straddle ``radius + 0.5``; bit-matched here by
    one vectorized distance matrix over all rim cells × sample points,
    float32 compares like the reference)."""
    size = int(np.ceil(radius) * 2 + 1)
    step = size // 2
    coords = np.arange(-step, step + 1, dtype=np.float64)
    yy, xx = np.meshgrid(coords, coords, indexing="ij")
    cr = np.float32(radius + 0.5)
    corner_in = np.zeros((size, size), dtype=np.int64)
    for dy in (-0.5, 0.5):
        for dx in (-0.5, 0.5):
            corner_in += np.sqrt((yy + dy) ** 2 + (xx + dx) ** 2).astype(np.float32) <= cr
    kernel = (corner_in == 4).astype(np.float32)
    rim = (corner_in > 0) & (corner_in < 4)
    if rim.any():
        t = np.linspace(-0.5, 0.5, 10)
        py, px = np.meshgrid(t, t, indexing="ij")
        ry, rx = yy[rim], xx[rim]
        d = np.sqrt(((ry[:, None] + py.ravel()[None, :]) ** 2
                     + (rx[:, None] + px.ravel()[None, :]) ** 2).astype(np.float32))
        kernel[rim] = ((d <= cr).sum(axis=1) / 100.0).astype(np.float32)
    return kernel


def distance_weighted_kernel(radius: float, method: int = 0, decay: float = 0.2,
                             sigma: float = 2.0) -> np.ndarray:
    """Distance weighting per reference ``kernels.py:149-200``:
    0 linear (1-decay)^d, 1 sqrt, 2 power, 3 gaussian, 4 constant."""
    size = int(np.ceil(radius) * 2 + 1)
    step = size // 2
    yy, xx = np.meshgrid(np.arange(-step, step + 1), np.arange(-step, step + 1), indexing="ij")
    dist = np.sqrt(xx.astype(np.float64) ** 2 + yy ** 2)
    if method == 0:
        k = np.power(1 - decay, dist)
    elif method == 1:
        k = np.power(np.sqrt(1 - decay), dist)
    elif method == 2:
        k = np.power((1 - decay) ** 2, dist)
    elif method == 3:
        k = np.exp(-(dist ** 2) / (2 * sigma ** 2))
    else:
        k = np.ones_like(dist)
    return k.astype(np.float32)


def kernel_base(
    radius: float,
    circular: bool = False,
    distance_weighted: bool = False,
    normalised: bool = True,
    hole: bool = False,
    method: int = 0,
    decay: float = 0.2,
    sigma: float = 2.0,
) -> np.ndarray:
    """General kernel constructor (reference ``kernels.py:199-268``)."""
    size = int(np.ceil(radius) * 2 + 1)
    kernel = np.ones((size, size), dtype=np.float32)
    if hole:
        kernel[size // 2, size // 2] = 0.0
    if circular:
        kernel = kernel * circular_kernel(radius)
    if distance_weighted:
        kernel = kernel * distance_weighted_kernel(radius, method, decay, sigma)
    if normalised:
        kernel = kernel / np.sum(kernel)
    return kernel


def kernel_sobel(scale: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """(gx, gy) Sobel kernels (public operator)."""
    gx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=np.float32)
    gy = gx.T.copy()
    if scale > 1:
        gx = np.kron(gx, np.ones((scale, scale), dtype=np.float32))
        gy = np.kron(gy, np.ones((scale, scale), dtype=np.float32))
    return gx, gy


def kernel_unsharp() -> np.ndarray:
    """3×3 unsharp kernel (reference ``kernels.py:134-108`` weights)."""
    return np.array([
        [-0.09911165, -0.15088834, -0.09911165],
        [-0.15088834, 2.0, -0.15088834],
        [-0.09911165, -0.15088834, -0.09911165],
    ], dtype=np.float32)


# ---------------------------------------------------------------- engine


def _windows(arr: np.ndarray, kh: int, kw: int, pad_mode: str = "edge",
             constant_value: float = 0.0) -> np.ndarray:
    """(H, W) → (H, W, kh*kw) neighborhood view via SAME padding."""
    py, px = kh // 2, kw // 2
    if pad_mode == "constant":
        padded = np.pad(arr, ((py, py), (px, px)), mode="constant",
                        constant_values=constant_value)
    else:
        padded = np.pad(arr, ((py, py), (px, px)), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, (kh, kw))
    return win.reshape(arr.shape[0], arr.shape[1], kh * kw)


def _weighted_quantile(values: np.ndarray, weights: np.ndarray, q: float) -> np.ndarray:
    """Axis=-1 weighted quantile with the reference's intersect scheme
    (``funcs.py:115-128``): interp(q, (cumsum - 0.5·w)/total, sorted)."""
    order = np.argsort(values, axis=-1, kind="stable")
    sv = np.take_along_axis(values, order, axis=-1)
    sw = np.take_along_axis(weights, order, axis=-1)
    cum = np.cumsum(sw, axis=-1)
    total = cum[..., -1:]
    with np.errstate(invalid="ignore", divide="ignore"):
        intersect = (cum - 0.5 * sw) / total
    below = (intersect < q).sum(axis=-1)
    hi = np.clip(below, 0, sv.shape[-1] - 1)
    lo = np.clip(hi - 1, 0, sv.shape[-1] - 1)
    x0 = np.take_along_axis(intersect, lo[..., None], axis=-1)[..., 0]
    x1 = np.take_along_axis(intersect, hi[..., None], axis=-1)[..., 0]
    y0 = np.take_along_axis(sv, lo[..., None], axis=-1)[..., 0]
    y1 = np.take_along_axis(sv, hi[..., None], axis=-1)[..., 0]
    denom = x1 - x0
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(denom != 0, (q - x0) / denom, 0.0)
    out = y0 + t * (y1 - y0)
    return np.where(hi == 0, np.take_along_axis(sv, np.zeros_like(hi)[..., None], axis=-1)[..., 0], out)


def convolve2d(
    arr: np.ndarray,
    kernel: np.ndarray,
    method: str = "sum",
    nodata: Optional[float] = None,
    quantile: float = 0.5,
    value: Optional[float] = None,
) -> np.ndarray:
    """Neighborhood reduce of a 2-D array with a 2-D kernel.

    methods: sum, mean, median, quantile, max, min, contrast, mode, std,
    var, mad, center_difference, sigma_lee, count_occurances[_normalise]
    (``value`` = the counted number) — semantics per the reference ``_hood_*``
    reducers (weighted max = value at argmax(v·w); weighted min = value
    at argmin(where(w==0, max, v)/(w+1e-7)); std/var centered on the
    weighted SUM as in ``funcs.py:172-192``). ``nodata``/NaN entries get
    weight 0 (mean/median renormalize over valid weights).
    """
    arr = np.asarray(arr, dtype=np.float64)
    kh, kw = kernel.shape
    v = _windows(arr, kh, kw)
    w = np.broadcast_to(kernel.astype(np.float64).ravel(), v.shape).copy()

    invalid = np.isnan(v)
    center_invalid = np.isnan(arr)
    if nodata is not None:
        invalid |= v == nodata
        center_invalid = center_invalid | (arr == nodata)
    w[invalid] = 0.0
    v = np.where(invalid, 0.0, v)

    if nodata is not None and invalid.any():
        # Reference nodata semantics (base.py hood renormalisation):
        # surviving weights are scaled back up to the full kernel mass,
        # and a nodata CENTER stays nodata in the output.
        kernel_total = float(kernel.astype(np.float64).sum())
        valid_sum = w.sum(axis=-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            factor = np.where(valid_sum > 0, kernel_total / valid_sum, 0.0)
        w = w * factor[..., None]

    def _restore_nodata(out: np.ndarray) -> np.ndarray:
        if nodata is not None:
            return np.where(center_invalid, nodata, out)
        return out

    def _compute() -> np.ndarray:
        if method == "sum":
            return (v * w).sum(axis=-1)
        if method == "mean":
            den = w.sum(axis=-1)
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(den > 0, (v * w).sum(axis=-1) / den, np.nan)
        if method in ("median", "quantile", "mad"):
            q = 0.5 if method != "quantile" else quantile
            vq = np.where(w > 0, v, np.nan)
            med = _weighted_quantile(np.where(np.isnan(vq), np.inf, vq), w, q)
            if method != "mad":
                return med
            absdev = np.abs(v - med[..., None])
            return _weighted_quantile(np.where(w > 0, absdev, np.inf), w, 0.5)
        if method == "max":
            idx = np.argmax(v * w, axis=-1)
            return np.take_along_axis(v, idx[..., None], axis=-1)[..., 0]
        if method == "min":
            vmax = v.max(axis=-1, keepdims=True)
            adjusted = np.where(w == 0.0, vmax, v)
            idx = np.argmin(adjusted / (w + 1e-7), axis=-1)
            return np.take_along_axis(v, idx[..., None], axis=-1)[..., 0]
        if method == "contrast":
            vmax = v.max(axis=-1, keepdims=True)
            local_min = (np.where(w == 0.0, vmax, v) / (w + 1e-7)).min(axis=-1)
            local_max = (v * w).max(axis=-1)
            return np.abs(local_max - local_min)
        if method == "mode":
            vr = np.rint(v)
            order = np.argsort(vr, axis=-1, kind="stable")
            sv = np.take_along_axis(vr, order, axis=-1)
            sw = np.take_along_axis(w, order, axis=-1)
            h_, w_, k_ = sv.shape
            flat_v = sv.reshape(-1, k_)
            flat_w = sw.reshape(-1, k_)
            change = np.ones_like(flat_v, dtype=bool)
            change[:, 1:] = flat_v[:, 1:] != flat_v[:, :-1]
            for_row = np.arange(flat_v.shape[0])
            best_val = np.full(flat_v.shape[0], 0.0)
            best_wt = np.full(flat_v.shape[0], -np.inf)
            # Bounded loop over run ids (≤ k distinct values per hood).
            run_id = np.cumsum(change, axis=-1) - 1
            nruns = run_id[:, -1] + 1
            for r in range(int(nruns.max())):
                in_run = run_id == r
                has = in_run.any(axis=-1)
                wt = np.where(in_run, flat_w, 0.0).sum(axis=-1)
                val = np.where(has, flat_v[for_row, np.argmax(in_run, axis=-1)], 0.0)
                better = has & (wt > best_wt)
                best_wt = np.where(better, wt, best_wt)
                best_val = np.where(better, val, best_val)
            return best_val.reshape(h_, w_)
        if method in ("std", "var"):
            summed = (v * w).sum(axis=-1)
            variance = ((v - summed[..., None]) ** 2 * w).sum(axis=-1)
            return np.sqrt(variance) if method == "std" else variance
        if method == "sigma_lee":
            # Sigma-Lee SAR despeckle (funcs.py:199-233): select hood
            # values with |v| ≥ weighted-std, take their renormalized
            # weighted mean; the reference's 5-attempt escalating loop
            # re-counts prior selections, so success reduces to
            # Σ_{m=1..5} count(|v| ≥ m·std) ≥ k_size and the selected
            # set is always the loosest (m=1) mask; fallback: full
            # weighted sum. Empty selected-weight sum → 0.
            k_total = v.shape[-1]
            ks = int(np.rint(-0.0000837834 * k_total**2 + 0.045469 * k_total + 0.805733))
            summed = (v * w).sum(axis=-1)
            std = np.sqrt(((v - summed[..., None]) ** 2 * w).sum(axis=-1))
            passed = np.zeros(std.shape, dtype=np.int64)
            for m in range(1, 6):
                passed += (np.abs(v) >= (std * m)[..., None]).sum(axis=-1)
            mask1 = np.abs(v) >= std[..., None]
            sw = np.where(mask1, w, 0.0).sum(axis=-1)
            sel = np.where(mask1, v * w, 0.0).sum(axis=-1)
            with np.errstate(invalid="ignore", divide="ignore"):
                sel_mean = np.where(sw != 0, sel / sw, 0.0)
            return np.where(passed >= ks, sel_mean, summed)
        if method in ("count_occurances", "count_occurances_normalise"):
            # Weighted occurrence count of ``value`` (funcs.py:77-98;
            # reference spelling kept for parity). None → all zeros.
            if value is None:
                return np.zeros(v.shape[:-1])
            hits = (np.where(w > 0.0, w, 0.0) * (v == value)).sum(axis=-1)
            if method.endswith("normalise"):
                hits = hits / v.shape[-1]
            return hits
        if method in ("roughness", "tpi", "tri", "zscore", "zscore_mad"):
            center = arr[..., None]  # (H, W, 1) vs windows (H, W, K)
            if method == "roughness":
                # |center − value at argmax(|v−center|·w)| (funcs.py:238-253).
                idx = np.argmax(np.abs(v - center) * w, axis=-1)
                far = np.take_along_axis(v, idx[..., None], axis=-1)[..., 0]
                return np.abs(arr - far)
            if method == "tpi":
                # center − weighted hood mean (funcs.py:254-270).
                den = w.sum(axis=-1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    mean = np.where(den > 0, (v * w).sum(axis=-1) / den, np.nan)
                return arr - mean
            if method == "tri":
                # weighted mean absolute difference to center (funcs.py:271-287).
                den = w.sum(axis=-1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    return np.where(den > 0, (np.abs(v - center) * w).sum(axis=-1) / den, np.nan)
            if method == "zscore":
                # (center − Σv·w) / weighted-std (funcs.py:142-156).
                summed = (v * w).sum(axis=-1)
                std = np.sqrt(((v - summed[..., None]) ** 2 * w).sum(axis=-1))
                with np.errstate(invalid="ignore", divide="ignore"):
                    return (arr - summed) / std
            # zscore_mad: (center − median) / (MAD·1.4826) (funcs.py:157-171).
            vq = np.where(w > 0, v, np.inf)
            med = _weighted_quantile(vq, w, 0.5)
            absdev = np.where(w > 0, np.abs(v - med[..., None]), np.inf)
            mad_std = _weighted_quantile(absdev, w, 0.5) * 1.4826
            with np.errstate(invalid="ignore", divide="ignore"):
                return (arr - med) / mad_std
        if method == "center_difference":
            center = arr
            k2 = kernel.copy()
            k2[kh // 2, kw // 2] = 0.0
            s = k2.sum()
            if s != 0:
                k2 = k2 / s
            hood_mean = convolve2d(arr, k2, "mean", nodata=nodata)
            return center - hood_mean
        raise ValueError(f"unknown method {method}")

    return _restore_nodata(_compute())


def convolve(arr: np.ndarray, kernel: np.ndarray, method: str = "sum",
             nodata: Optional[float] = None, quantile: float = 0.5) -> np.ndarray:
    """2-D or channel-last 3-D (per-channel) convolution."""
    if arr.ndim == 2:
        return convolve2d(arr, kernel, method, nodata, quantile)
    if arr.ndim == 3:
        return np.stack(
            [convolve2d(arr[..., c], kernel, method, nodata, quantile)
             for c in range(arr.shape[2])], axis=-1)
    raise ValueError("array must be 2D or 3D (channel-last)")


def kernel_get_offsets_and_weights(kernel: np.ndarray, remove_zero_weights: bool = True):
    """Kernel matrix → ((dy, dx) offsets, weights) pairs — the custom-
    kernel hook (reference ``kernels.py:453-488``,
    ``kernel_get_offsets_and_weights``)."""
    kh, kw = kernel.shape
    cy, cx = kh // 2, kw // 2
    dy, dx = np.meshgrid(np.arange(kh) - cy, np.arange(kw) - cx, indexing="ij")
    offsets = np.stack([dy.ravel(), dx.ravel()], axis=1).astype(np.int64)
    weights = kernel.astype(np.float32).ravel()
    if remove_zero_weights:
        keep = weights != 0.0
        offsets, weights = offsets[keep], weights[keep]
    return offsets, weights


def kernel_shift(x_offset: float, y_offset: float):
    """Fractional-pixel shift kernel: ((dy, dx) offsets, weights) whose
    weighted sum translates a raster by sub-pixel amounts (reference
    ``kernels.py:120-...`` ``kernel_shift``; also the augmentation
    misalignment primitive). Supports the axis-aligned cases the
    reference implements plus the general bilinear 4-tap case.

    Offset rows are (dy, dx) — the same convention
    :func:`convolve_offsets` and :func:`kernel_get_offsets_and_weights`
    use, so the output feeds ``convolve_offsets`` directly."""
    if x_offset == 0.0 and y_offset == 0.0:
        return np.array([[0, 0]], dtype=np.int64), np.array([1.0], dtype=np.float32)

    x0, x1 = int(np.floor(x_offset)), int(np.ceil(x_offset))
    y0, y1 = int(np.floor(y_offset)), int(np.ceil(y_offset))
    fx = x_offset - x0
    fy = y_offset - y0
    taps = {}
    for (dx, wx) in ((x0, 1 - fx), (x1, fx)) if x0 != x1 else ((x0, 1.0),):
        for (dy, wy) in ((y0, 1 - fy), (y1, fy)) if y0 != y1 else ((y0, 1.0),):
            w = wx * wy
            if w != 0.0:
                taps[(dy, dx)] = taps.get((dy, dx), 0.0) + w
    offsets = np.array(list(taps.keys()), dtype=np.int64)
    weights = np.array(list(taps.values()), dtype=np.float32)
    return offsets, weights


def convolve_offsets(arr: np.ndarray, offsets: np.ndarray, weights: np.ndarray,
                     nodata: Optional[float] = None) -> np.ndarray:
    """Weighted sum over explicit (first-axis, second-axis) offset taps —
    the reference's offsets+weights convolution form (``convolution/
    base.py`` convolve_array with offsets). 2-D input; offsets rows are
    (dy, dx) — the convention shared by
    :func:`kernel_get_offsets_and_weights` and :func:`kernel_shift`."""
    arr = np.asarray(arr, dtype=np.float64)
    out = np.zeros_like(arr)
    wsum = np.zeros_like(arr)
    invalid_center = np.isnan(arr) | ((arr == nodata) if nodata is not None else False)
    n, m = arr.shape
    ri = np.arange(n)
    ci = np.arange(m)
    for (dy, dx), w in zip(offsets, weights):
        # Edge-replicating tap: gather with clamped source indices — safe
        # for any |offset|, including offsets larger than the array.
        rows = np.clip(ri + int(dy), 0, n - 1)
        cols = np.clip(ci + int(dx), 0, m - 1)
        shifted = arr[np.ix_(rows, cols)]
        valid = ~(np.isnan(shifted) | ((shifted == nodata) if nodata is not None else False))
        out += np.where(valid, shifted, 0.0) * w * valid
        wsum += w * valid
    with np.errstate(invalid="ignore", divide="ignore"):
        # Renormalize surviving taps to the full kernel mass (reference
        # nodata semantics, same rule as convolve2d).
        total_w = float(np.sum(weights))
        result = np.where(wsum > 0, out / wsum * total_w, np.nan)
    if nodata is not None:
        result = np.where(invalid_center, nodata, result)
    return result
