"""Image coregistration: CLAHE contrast normalization + EFolki/GeFolki-
style pyramidal local optical flow (reference surface:
``raster/gefolki.py:27-700``, ``raster/coregister.py:19-228`` — itself an
adaptation of ONERA's public GeFolki code and skimage CLAHE).

From-scratch numpy formulations of the PUBLIC algorithms:

- :func:`clahe` — contrast-limited adaptive histogram equalization:
  per-tile clipped histograms → CDF mappings → bilinear interpolation
  between the four surrounding tile mappings (Zuiderveld 1994).
- :func:`rank_transform` — local rank transform (fraction of window
  pixels smaller than the center; Zabih & Woodfill 1994): the
  radiometric-invariance step GeFolki uses to register SAR ↔ optical.
- :func:`efolki_flow` — iterative Lucas-Kanade with box-integrated
  normal equations (Folki), coarse-to-fine over an average pyramid.
- :func:`coregister` — estimate flow and warp the moving image onto the
  fixed image's grid (bilinear, edge-clamped).

Coregistration is inherently a whole-scene iterative solve (the
reference operates on full arrays too); at tile scale run it per tile
pair with halos via ``map_tiles`` — flows are local, so halo ≥ max
window radius × 2^levels keeps per-tile results consistent.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------- CLAHE

def clahe(image: np.ndarray, ntiles_x: int = 8, ntiles_y: int = 8,
          clip_limit: float = 0.01, nbins: int = 256) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization → float64 in
    [0, 1]. Trailing rows/cols beyond an even tile multiple are
    processed in the last tile row/column (shape preserved)."""
    img = np.asarray(image, dtype=np.float64)
    lo, hi = float(img.min()), float(img.max())
    if hi <= lo:
        return np.zeros_like(img)
    norm = (img - lo) / (hi - lo)
    bins = np.minimum((norm * nbins).astype(np.int64), nbins - 1)
    h, w = img.shape
    ty = np.linspace(0, h, ntiles_y + 1).astype(np.int64)
    tx = np.linspace(0, w, ntiles_x + 1).astype(np.int64)

    # Per-tile clipped-histogram CDF mappings.
    maps = np.zeros((ntiles_y, ntiles_x, nbins))
    for i in range(ntiles_y):
        for j in range(ntiles_x):
            tile = bins[ty[i]:ty[i + 1], tx[j]:tx[j + 1]]
            hist = np.bincount(tile.ravel(), minlength=nbins).astype(np.float64)
            n_pix = tile.size
            clip = max(clip_limit * n_pix, 1.0)
            excess = np.clip(hist - clip, 0, None).sum()
            hist = np.minimum(hist, clip) + excess / nbins
            cdf = np.cumsum(hist)
            maps[i, j] = (cdf - cdf[0]) / max(cdf[-1] - cdf[0], 1e-12)

    # Bilinear interpolation between the 4 surrounding tile mappings.
    cy = (ty[:-1] + ty[1:]) / 2.0
    cx = (tx[:-1] + tx[1:]) / 2.0
    yy = np.arange(h, dtype=np.float64)
    xx = np.arange(w, dtype=np.float64)
    iy = np.clip(np.searchsorted(cy, yy) - 1, 0, ntiles_y - 2)
    ix = np.clip(np.searchsorted(cx, xx) - 1, 0, ntiles_x - 2)
    fy = np.clip((yy - cy[iy]) / np.maximum(cy[iy + 1] - cy[iy], 1e-12), 0, 1)
    fx = np.clip((xx - cx[ix]) / np.maximum(cx[ix + 1] - cx[ix], 1e-12), 0, 1)

    b = bins
    m00 = maps[iy[:, None], ix[None, :], b]
    m01 = maps[iy[:, None], ix[None, :] + 1, b]
    m10 = maps[iy[:, None] + 1, ix[None, :], b]
    m11 = maps[iy[:, None] + 1, ix[None, :] + 1, b]
    wy = fy[:, None]
    wx = fx[None, :]
    return ((1 - wy) * (1 - wx) * m00 + (1 - wy) * wx * m01
            + wy * (1 - wx) * m10 + wy * wx * m11)


# ------------------------------------------------------------ rank / warp

def rank_transform(img: np.ndarray, radius: int = 4) -> np.ndarray:
    """Local rank transform (fraction of window neighbours strictly
    smaller than the center) — GeFolki's radiometry equalizer
    (``gefolki.py:627-672`` rank filters)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    out = np.zeros_like(img)
    n = 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            rows = np.clip(np.arange(h) + dy, 0, h - 1)
            cols = np.clip(np.arange(w) + dx, 0, w - 1)
            out += img[np.ix_(rows, cols)] < img
            n += 1
    return out / n


def warp_bilinear(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Sample ``img`` at (x+u, y+v), bilinear, edge-clamped (the
    reference's ``wrapData``/``interp2``)."""
    h, w = img.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    sx = np.clip(xx + u, 0, w - 1)
    sy = np.clip(yy + v, 0, h - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0
    return (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
            + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)


def _box_sum(img: np.ndarray, radius: int) -> np.ndarray:
    """Box-window sum via integral image (the Folki window integral)."""
    h, w = img.shape
    pad = np.pad(img, ((radius + 1, radius), (radius + 1, radius)), mode="edge")
    ii = pad.cumsum(axis=0).cumsum(axis=1)
    r = 2 * radius + 1
    return (ii[r:, r:] - ii[:-r, r:] - ii[r:, :-r] + ii[:-r, :-r])[:h, :w]


def _downsample2(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    v = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2)
    return v.mean(axis=(1, 3))


def _upsample_flow(f: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Nearest-ish bilinear upsample of a flow field ×2 (values doubled)."""
    h, w = shape
    src_h, src_w = f.shape
    yy = np.minimum(np.arange(h) / 2.0, src_h - 1)
    xx = np.minimum(np.arange(w) / 2.0, src_w - 1)
    y0 = np.floor(yy).astype(np.int64)
    x0 = np.floor(xx).astype(np.int64)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    up = (f[np.ix_(y0, x0)] * (1 - fy) * (1 - fx) + f[np.ix_(y0, x1)] * (1 - fy) * fx
          + f[np.ix_(y1, x0)] * fy * (1 - fx) + f[np.ix_(y1, x1)] * fy * fx)
    return up * 2.0


def _folki_level(I0: np.ndarray, I1: np.ndarray, u: np.ndarray, v: np.ndarray,
                 iterations: int, radii: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Iterative windowed Lucas-Kanade at one pyramid level
    (``gefolki.py:363-409`` EFolkiIter structure: gradients of I0, warp
    I1 by the current flow, box-integrated 2×2 normal equations)."""
    Iy, Ix = np.gradient(I0)
    for radius in radii:
        Ixx = _box_sum(Ix * Ix, radius)
        Iyy = _box_sum(Iy * Iy, radius)
        Ixy = _box_sum(Ix * Iy, radius)
        det = Ixx * Iyy - Ixy * Ixy
        ok = det > 1e-12
        for _ in range(iterations):
            I1w = warp_bilinear(I1, u, v)
            # Residual linearized at the CURRENT flow estimate.
            it = I1w - I0 - Ix * u - Iy * v
            Ixt = _box_sum(Ix * it, radius)
            Iyt = _box_sum(Iy * it, radius)
            with np.errstate(invalid="ignore", divide="ignore"):
                nu = np.where(ok, -(Iyy * Ixt - Ixy * Iyt) / det, 0.0)
                nv = np.where(ok, -(Ixx * Iyt - Ixy * Ixt) / det, 0.0)
            u, v = nu, nv
    return u, v


def efolki_flow(
    fixed: np.ndarray,
    moving: np.ndarray,
    iterations: int = 4,
    radii: Sequence[int] = (8, 4),
    levels: int = 3,
    rank: Optional[int] = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (u, v) flow mapping ``fixed``'s grid into ``moving``
    (coarse-to-fine EFolki; ``rank`` applies the GeFolki rank transform
    to both inputs first — None skips it for same-modality pairs)."""
    I0 = np.asarray(fixed, dtype=np.float64)
    I1 = np.asarray(moving, dtype=np.float64)
    if I0.shape != I1.shape:
        raise ValueError("fixed and moving must share a shape")
    if rank is not None:
        I0 = rank_transform(I0, rank)
        I1 = rank_transform(I1, rank)

    pyr0: List[np.ndarray] = [I0]
    pyr1: List[np.ndarray] = [I1]
    for _ in range(levels - 1):
        if min(pyr0[-1].shape) < 2 * (max(radii) + 2):
            break
        pyr0.append(_downsample2(pyr0[-1]))
        pyr1.append(_downsample2(pyr1[-1]))

    u = np.zeros_like(pyr0[-1])
    v = np.zeros_like(pyr0[-1])
    for lvl in range(len(pyr0) - 1, -1, -1):
        if u.shape != pyr0[lvl].shape:
            u = _upsample_flow(u, pyr0[lvl].shape)
            v = _upsample_flow(v, pyr0[lvl].shape)
        u, v = _folki_level(pyr0[lvl], pyr1[lvl], u, v, iterations, radii)
    return u, v


def coregister(fixed: np.ndarray, moving: np.ndarray, **flow_kwargs) -> np.ndarray:
    """Warp ``moving`` onto ``fixed``'s grid (≙ coregister_images_efolki
    / _gefolki, reference coregister.py:19-228): estimate the flow on
    the (optionally rank-transformed) pair, resample the ORIGINAL
    moving image through it."""
    u, v = efolki_flow(fixed, moving, **flow_kwargs)
    return warp_bilinear(np.asarray(moving, dtype=np.float64), u, v)
