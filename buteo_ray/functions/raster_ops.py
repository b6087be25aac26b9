"""Raster long-tail kernels: resample, DEM derivatives, distance
transform, nodata infill, border padding — per-tile numpy kernels for
``map_tiles`` (reference modules: ``raster/resample.py``,
``raster/dem.py``, ``raster/proximity.py`` + ``array/distance.py``,
``array/fill.py``, ``raster/borders.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


# ------------------------------------------------------------- resample


def resample_nearest(arr: np.ndarray, scale: float) -> np.ndarray:
    """Nearest-neighbour resample by a scale factor (≙ resample_alg
    'nearest', reference raster/resample.py:29-332). Channel-last."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, _ = arr.shape
    oh, ow = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    yi = np.minimum((np.arange(oh) / scale).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(ow) / scale).astype(np.int64), w - 1)
    return arr[yi[:, None], xi[None, :], :]


def resample_average(arr: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor downscale by block mean (≙ 'average')."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    h2, w2 = (h // factor) * factor, (w // factor) * factor
    v = arr[:h2, :w2, :].reshape(h2 // factor, factor, w2 // factor, factor, c)
    return v.mean(axis=(1, 3))


def resample_max(arr: np.ndarray, factor: int) -> np.ndarray:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    h2, w2 = (h // factor) * factor, (w // factor) * factor
    v = arr[:h2, :w2, :].reshape(h2 // factor, factor, w2 // factor, factor, c)
    return v.max(axis=(1, 3))


def resample_bilinear(arr: np.ndarray, scale: float) -> np.ndarray:
    """Bilinear resample (≙ 'bilinear'); standard formulation."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    oh, ow = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    fy = (np.arange(oh) + 0.5) / scale - 0.5
    fx = (np.arange(ow) + 0.5) / scale - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = arr[y0[:, None], x0[None, :], :]
    b = arr[y0[:, None], x1[None, :], :]
    cc = arr[y1[:, None], x0[None, :], :]
    d = arr[y1[:, None], x1[None, :], :]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + cc * wy * (1 - wx) + d * wy * wx)


def _kernel_cubic(t: np.ndarray) -> np.ndarray:
    """Keys bicubic, a=-0.5 (GDAL 'cubic'); support 2."""
    a = -0.5
    t = np.abs(t)
    w = np.where(t <= 1, (a + 2) * t**3 - (a + 3) * t**2 + 1,
                 np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0))
    return w


def _kernel_cubicspline(t: np.ndarray) -> np.ndarray:
    """Cubic B-spline (GDAL 'cubicspline'); support 2. Smoothing —
    does NOT interpolate the samples (by design)."""
    t = np.abs(t)
    return np.where(t < 1, 2.0 / 3.0 - t**2 + 0.5 * t**3,
                    np.where(t < 2, ((2 - t) ** 3) / 6.0, 0.0))


def _kernel_lanczos(t: np.ndarray) -> np.ndarray:
    """Lanczos a=3 (GDAL 'lanczos'); support 3."""
    t = np.abs(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.sinc(t) * np.sinc(t / 3.0)
    return np.where(t < 3, w, 0.0)


_SEPARABLE = {"cubic": (_kernel_cubic, 2), "cubicspline": (_kernel_cubicspline, 2),
              "lanczos": (_kernel_lanczos, 3)}


def resample_separable(arr: np.ndarray, scale: float, alg: str = "cubic") -> np.ndarray:
    """Separable convolution resample (cubic / cubicspline / lanczos ≙
    reference resample_alg table, utils/utils_translate.py:293-346 +
    raster/resample.py:29-332). Edge-replicating; per-axis weights
    normalized to 1 (GDAL semantics). Channel-last (H, W, C)."""
    kernel, support = _SEPARABLE[alg]
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = np.asarray(arr, dtype=np.float64)
    h, w, c = arr.shape

    def _axis(n_in: int, n_out: int, sc: float):
        f = (np.arange(n_out) + 0.5) / sc - 0.5
        base = np.floor(f).astype(np.int64)
        taps = np.arange(-support + 1, support + 1)
        idx = base[:, None] + taps[None, :]
        wgt = kernel(f[:, None] - idx)
        wgt /= wgt.sum(axis=1, keepdims=True)
        return np.clip(idx, 0, n_in - 1), wgt

    oh = max(int(round(h * scale)), 1)
    ow = max(int(round(w * scale)), 1)
    yi, yw = _axis(h, oh, scale)
    xi, xw = _axis(w, ow, scale)
    # y pass: (oh, w, c)
    tmp = np.einsum("otwc,ot->owc", arr[yi, :, :], yw)
    # x pass: (oh, ow, c)
    return np.einsum("hotc,ot->hoc", tmp[:, xi, :], xw)


def _block_mode(v: np.ndarray, axis: int) -> np.ndarray:
    """Vectorized mode along ``axis`` (ties → smallest value; NaNs never
    win unless a block is all-NaN). O(k²) pair counts, k = block size."""
    s = np.sort(np.moveaxis(v, axis, -1), axis=-1)
    k = s.shape[-1]
    counts = np.zeros(s.shape, dtype=np.int32)
    for j in range(k):
        cj = np.zeros(s.shape[:-1], dtype=np.int32)
        for m in range(k):
            cj += (s[..., m] == s[..., j]).astype(np.int32)
        counts[..., j] = cj
    counts = np.where(np.isnan(s), 0, counts)
    best = counts.argmax(axis=-1)
    return np.take_along_axis(s, best[..., None], axis=-1)[..., 0]


def _rms(v: np.ndarray, axis) -> np.ndarray:
    return np.sqrt(np.nanmean(np.square(v), axis=axis))


_REDUCERS = {
    "average": np.nanmean,
    "sum": np.nansum,
    "min": np.nanmin,
    "max": np.nanmax,
    "median": np.nanmedian,
    "rms": _rms,
    "q1": lambda v, axis: np.nanquantile(v, 0.25, axis=axis),
    "q3": lambda v, axis: np.nanquantile(v, 0.75, axis=axis),
    "mode": _block_mode,
}


def resample_reduce(arr: np.ndarray, factor: int, stat: str = "average",
                    nodata: Optional[float] = None) -> np.ndarray:
    """Integer-factor downscale by block statistic: average / sum / min /
    max / median / rms / q1 / q3 / mode (≙ the reference's statistical
    resample algs, raster/resample.py + utils_translate.py:293-346).
    ``nodata`` cells are excluded; all-nodata blocks emit ``nodata``."""
    if stat not in _REDUCERS:
        raise ValueError(f"stat must be one of {sorted(_REDUCERS)}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    h2, w2 = (h // factor) * factor, (w // factor) * factor
    v = arr[:h2, :w2, :].astype(np.float64)
    if nodata is not None:
        v = np.where(v == nodata, np.nan, v)
    v = (v.reshape(h2 // factor, factor, w2 // factor, factor, c)
         .transpose(0, 2, 4, 1, 3)
         .reshape(h2 // factor, w2 // factor, c, factor * factor))
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = _REDUCERS[stat](v, axis=-1)
    if nodata is not None:
        out = np.where(np.isnan(out), nodata, out)
    return out


def resample(arr: np.ndarray, scale: float, alg: str = "nearest",
             nodata: Optional[float] = None) -> np.ndarray:
    """Algorithm dispatcher with the reference's full 14-alg surface
    (utils/utils_translate.py:293-346): nearest / bilinear / cubic /
    cubicspline / lanczos at any scale; average / sum / min / max /
    median / rms / q1 / q3 / mode as integer-factor downscales."""
    if alg == "nearest":
        return resample_nearest(arr, scale)
    if alg == "bilinear":
        return resample_bilinear(arr, scale)
    if alg in _SEPARABLE:
        return resample_separable(arr, scale, alg)
    if alg in _REDUCERS:
        inv = 1.0 / scale
        factor = int(round(inv))
        if abs(inv - factor) > 1e-9 or factor < 1:
            raise ValueError(f"alg '{alg}' needs an integer downscale factor, got scale={scale}")
        return resample_reduce(arr, factor, alg, nodata=nodata)
    raise ValueError(f"unknown resample alg '{alg}'")


def resample_tile(tile: np.ndarray, halo: int, scale: float,
                  alg: str = "cubic", nodata: Optional[float] = None) -> np.ndarray:
    """Halo-correct per-tile resample for ``map_tiles`` pipelines: resample
    the haloed buffer, then crop ``scale·halo`` so per-tile output ==
    the whole-array resample (requires halo ≥ kernel support — 2 for
    cubic, 3 for lanczos; reducers need halo ≡ 0 mod factor)."""
    out = resample(tile, scale, alg, nodata=nodata)
    crop = int(round(halo * scale))
    if crop > 0:
        out = out[crop:-crop, crop:-crop, :]
    return out


# ---------------------------------------------------------------- DEM


def dem_slope(arr: np.ndarray, pixel_size: float = 1.0, degrees: bool = True) -> np.ndarray:
    """Slope via Horn's method (public; ≙ GDAL DEMProcessing 'slope',
    reference raster/dem.py:16-495). 2-D input."""
    p = np.pad(arr, 1, mode="edge")
    dzdx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])) / (8.0 * pixel_size)
    dzdy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])) / (8.0 * pixel_size)
    slope = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    return np.degrees(slope) if degrees else slope


def dem_aspect(arr: np.ndarray, degrees: bool = True) -> np.ndarray:
    """Aspect (downslope direction, 0=N clockwise), Horn's method."""
    p = np.pad(arr, 1, mode="edge")
    dzdx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])) / 8.0
    dzdy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
            - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])) / 8.0
    aspect = np.arctan2(dzdy, -dzdx)
    aspect = np.mod(np.pi / 2 - aspect, 2 * np.pi)
    return np.degrees(aspect) if degrees else aspect


def dem_to_orientation(arr: np.ndarray, pixel_size: float = 1.0,
                       include_height: bool = False,
                       height_normalisation_value: float = 8849.0) -> np.ndarray:
    """ML-ready terrain encoding (≙ reference raster_dem_to_orientation,
    raster/dem.py:351-495): channels (H, W, 3|4) =

    - ``(sin(2π·aspect/360) + 1) / 2`` — cyclical aspect, x component,
    - ``(cos(2π·aspect/360) + 1) / 2`` — cyclical aspect, y component,
    - ``clip(slope_percent / 90, 0, 1)``,
    - optionally ``height / height_normalisation_value``.

    Divergence note (documented, intentional): the reference's
    ``np.divide(slope, 90.0, where=slope != 0)`` with no ``out=`` leaves
    UNINITIALIZED memory where slope == 0; here flat cells encode 0
    (the obviously intended value). Slope 'percent' = 100·tan(slope).
    """
    aspect = dem_aspect(arr, degrees=True)
    slope_pct = 100.0 * np.tan(dem_slope(arr, pixel_size, degrees=False))
    a = aspect / 360.0
    enc_sin = (np.sin(2 * np.pi * a) + 1.0) / 2.0
    enc_cos = (np.cos(2 * np.pi * a) + 1.0) / 2.0
    enc_slope = np.clip(slope_pct / 90.0, 0.0, 1.0)
    chans = [enc_sin, enc_cos, enc_slope]
    if include_height:
        chans.append(arr / float(height_normalisation_value))
    return np.stack(chans, axis=-1).astype(np.float32)


def dem_hillshade(arr: np.ndarray, azimuth: float = 315.0, altitude: float = 45.0,
                  pixel_size: float = 1.0) -> np.ndarray:
    """Hillshade 0-255 (standard GDAL-style formula)."""
    slope = dem_slope(arr, pixel_size, degrees=False)
    aspect = dem_aspect(arr, degrees=False)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    shaded = (np.sin(alt) * np.cos(slope)
              + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2 - aspect))
    return np.clip(shaded * 255.0, 0, 255)


# ------------------------------------------------- distance / proximity


def distance_transform(mask: np.ndarray, pixel_size: float = 1.0,
                       max_dist: Optional[float] = None) -> np.ndarray:
    """Exact euclidean distance to the nearest True pixel — Felzenszwalb
    & Huttenlocher's separable parabola EDT (public, 2004). ≙ the
    reference's ``convolve_distance`` / ``raster_get_proximity``
    (raster/proximity.py:25-195) without the max_dist window scan."""
    mask = np.asarray(mask, dtype=bool)
    INF = 1e18
    d = np.where(mask, 0.0, INF)

    def _edt_1d(f: np.ndarray) -> np.ndarray:
        n = f.shape[0]
        v = np.zeros(n, dtype=np.int64)
        z = np.full(n + 1, 0.0)
        z[0], z[1] = -INF, INF
        k = 0
        out = np.empty(n)
        for q in range(1, n):
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            while s <= z[k]:
                k -= 1
                s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            k += 1
            v[k] = q
            z[k] = s
            z[k + 1] = INF
        k = 0
        for q in range(n):
            while z[k + 1] < q:
                k += 1
            out[q] = (q - v[k]) ** 2 + f[v[k]]
        return out

    # Pass 1: columns; pass 2: rows.
    for x in range(d.shape[1]):
        d[:, x] = _edt_1d(d[:, x])
    for y in range(d.shape[0]):
        d[y, :] = _edt_1d(d[y, :])
    out = np.sqrt(d) * pixel_size
    if max_dist is not None:
        out = np.minimum(out, max_dist)
    return out


def fill_nearest(arr: np.ndarray, nodata: float, max_iter: int = 100) -> np.ndarray:
    """Fill nodata with the nearest valid value by iterative 3×3
    majority-of-neighbours dilation (≙ ``convolve_fill_nearest``,
    reference array/fill.py:18-225)."""
    arr = np.asarray(arr, dtype=np.float64).copy()
    invalid = (arr == nodata) | np.isnan(arr)
    for _ in range(max_iter):
        if not invalid.any():
            break
        p = np.pad(np.where(invalid, np.nan, arr), 1, mode="edge")
        stack = np.stack([
            p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:],
            p[1:-1, :-2], p[1:-1, 2:],
            p[2:, :-2], p[2:, 1:-1], p[2:, 2:],
        ])
        with np.errstate(all="ignore"):
            neigh = np.nanmean(stack, axis=0)
        fill = invalid & ~np.isnan(neigh)
        arr[fill] = neigh[fill]
        invalid = invalid & ~fill
    return arr


def fill_nearest_classes(arr: np.ndarray, nodata, mask: np.ndarray | None = None,
                         max_iter: int | None = None) -> np.ndarray:
    """Fill nodata cells with the 1/d²-weight-majority CLASS of their 3×3
    neighbours, iterating until stable (≙ ``convolve_fill_nearest_classes``,
    reference array/fill.py:122-225). Vectorized: one padded shift + add
    per (offset, class) instead of the reference's per-pixel prange loop;
    weights are accumulated per class in the reference's sorted-by-distance
    offset order so tie-breaks (np.argmax → first of the ascending-sorted
    unique classes) match exactly.

    ``arr``/``mask`` are 2D (single channel); ``mask==1`` marks cells that
    both participate as neighbours and are eligible for filling."""
    arr = np.asarray(arr)
    out = arr.copy()
    h, w = out.shape
    if mask is None:
        mask = np.ones((h, w), dtype=np.uint8)
    mask = np.asarray(mask).astype(np.uint8)

    classes = np.unique(out)
    classes = classes[classes != nodata]
    if classes.size == 0:
        return out

    # 8 neighbour offsets sorted by distance (orthogonal then diagonal),
    # weights 1/d² normalized — same construction as the reference.
    offs = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)])
    d = np.sqrt((offs ** 2).sum(axis=1))
    order = np.argsort(d, kind="stable")[1:]
    offs = offs[order]
    wts = 1.0 / (d[order] ** 2)
    wts = (wts / wts.sum()).astype(np.float32)

    it = 0
    while True:
        hole = (out == nodata) & (mask == 1)
        if not hole.any():
            break
        score = np.zeros((classes.size, h, w), dtype=np.float32)
        valid = (out != nodata) & (mask == 1)
        for (dc, dr), wt in zip(offs, wts):
            # neighbour at (row+dr, col+dc) seen from each cell
            src_r = slice(max(dr, 0), h + min(dr, 0))
            src_c = slice(max(dc, 0), w + min(dc, 0))
            dst_r = slice(max(-dr, 0), h + min(-dr, 0))
            dst_c = slice(max(-dc, 0), w + min(-dc, 0))
            v = valid[src_r, src_c]
            vals = out[src_r, src_c]
            for ci, cls in enumerate(classes):
                score[ci][dst_r, dst_c] += wt * ((vals == cls) & v)
        total = score.sum(axis=0)
        winner = classes[np.argmax(score, axis=0)]
        fillable = hole & (total > 0)
        if not fillable.any():
            break  # unreachable holes (all neighbours masked) — no progress
        out[fillable] = winner[fillable]
        it += 1
        if max_iter is not None and it >= max_iter:
            break
    return out


def add_border(arr: np.ndarray, border_size: int = 1, value: float = 0.0) -> np.ndarray:
    """Constant border padding (≙ ``raster_add_border``,
    reference raster/borders.py:30-226)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.pad(arr, ((border_size, border_size), (border_size, border_size), (0, 0)),
                  mode="constant", constant_values=value)
