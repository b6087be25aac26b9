"""Training-data augmentation & masking — capability parity with the
reference's ``ai/augmentation/*`` and ``ai/masking/*`` inventory
(SURVEY.md §2.14), re-expressed as seeded, vectorized per-sample numpy
transforms composable inside one ``map_batches`` stage.

Differences from the reference, by design:
- every transform takes an explicit ``rng`` (np.random.Generator) —
  the engine requires seeded determinism for checkpoint/resume
  (SURVEY.md §7.5); the reference uses process-global ``random``;
- batch application pairs samples within the batch for cutmix/mixup
  (the reference mixes explicit sample pairs — same math).

All arrays are channel-last (H, W, C) unless noted.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from buteo_ray.functions.filters import filter_blur, filter_unsharp


def _rot(X: np.ndarray, k: int) -> np.ndarray:
    return np.rot90(X, k, axes=(0, 1))


def augmentation_rotation(X: np.ndarray, rng: np.random.Generator, k: int = -1) -> np.ndarray:
    """Random 90°-interval rotation (reference ``basic.py:75-139``)."""
    kk = int(rng.choice([1, 2, 3])) if k == -1 else k
    if kk not in (1, 2, 3):
        raise ValueError("k must be -1 or 1, 2, 3")
    return _rot(X, kk).copy()


def augmentation_rotation_xy(X: np.ndarray, y: np.ndarray, rng: np.random.Generator,
                             k: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Same rotation applied to features and labels (``basic.py:140-209``)."""
    kk = int(rng.choice([1, 2, 3])) if k == -1 else k
    return _rot(X, kk).copy(), _rot(y, kk).copy()


def augmentation_mirror(X: np.ndarray, rng: np.random.Generator, axis: int = -1) -> np.ndarray:
    """Random horizontal/vertical flip (``basic.py:210-275``)."""
    a = int(rng.choice([0, 1])) if axis == -1 else axis
    return np.flip(X, axis=a).copy()


def augmentation_mirror_xy(X: np.ndarray, y: np.ndarray, rng: np.random.Generator,
                           axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    a = int(rng.choice([0, 1])) if axis == -1 else axis
    return np.flip(X, axis=a).copy(), np.flip(y, axis=a).copy()


def augmentation_label_smoothing(y: np.ndarray, smoothing: float = 0.1) -> np.ndarray:
    """One-hot smoothing: y·(1−s) + s/K (reference ``labels.py:13-97``)."""
    k = y.shape[-1]
    return y * (1.0 - smoothing) + smoothing / k


def _cast_like(out: np.ndarray, dtype) -> np.ndarray:
    """Cast an augmented float result back to the input dtype: integer
    imagery rounds and clips to the dtype range (casting the NOISE alone
    would truncate sub-1 noise to zero and wrap negatives in unsigned
    types — a silent no-op / +255-spike bug)."""
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(dtype)
    return out.astype(dtype)


def augmentation_noise_uniform(X: np.ndarray, rng: np.random.Generator,
                               amount: float = 0.1) -> np.ndarray:
    """Additive U(−amount, amount) noise (``noise.py:13-115``)."""
    return _cast_like(X.astype(np.float64)
                      + rng.uniform(-amount, amount, size=X.shape), X.dtype)


def augmentation_noise_normal(X: np.ndarray, rng: np.random.Generator,
                              std: float = 0.1) -> np.ndarray:
    """Additive N(0, std) noise (``noise.py:116-216``)."""
    return _cast_like(X.astype(np.float64)
                      + rng.normal(0.0, std, size=X.shape), X.dtype)


def augmentation_channel_scale(X: np.ndarray, rng: np.random.Generator,
                               amount: float = 0.1) -> np.ndarray:
    """Per-channel scale in [1−amount, 1+amount] (``transform.py:23-106``)."""
    factors = rng.uniform(1 - amount, 1 + amount, size=(1, 1, X.shape[-1]))
    return _cast_like(X * factors, X.dtype)


def augmentation_contrast(X: np.ndarray, rng: np.random.Generator,
                          amount: float = 0.1) -> np.ndarray:
    """Contrast stretch about the per-channel mean (``transform.py:107-181``)."""
    factor = 1.0 + rng.uniform(-amount, amount)
    mean = X.mean(axis=(0, 1), keepdims=True)
    return _cast_like((X - mean) * factor + mean, X.dtype)


def augmentation_blur(X: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Gaussian-ish blur (``transform.py:182-321``; apply-probability is
    the AugmentationPipeline step's job, not this kernel's)."""
    return _cast_like(filter_blur(X, radius=1.0), X.dtype)


def augmentation_sharpen(X: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Unsharp sharpen (``transform.py:322-468``)."""
    return _cast_like(filter_unsharp(X), X.dtype)


def augmentation_misalign(X: np.ndarray, rng: np.random.Generator,
                          max_offset: int = 1) -> np.ndarray:
    """Shift one random channel by ≤max_offset pixels — simulates band
    misalignment (``transform.py:469-601``)."""
    X = X.copy()
    c = int(rng.integers(0, X.shape[-1]))
    dy = int(rng.integers(-max_offset, max_offset + 1))
    dx = int(rng.integers(-max_offset, max_offset + 1))
    X[..., c] = np.roll(np.roll(X[..., c], dy, axis=0), dx, axis=1)
    return X


def augmentation_cutmix(X_t, y_t, X_s, y_s, rng: np.random.Generator,
                        min_size: float = 0.333, max_size: float = 0.666):
    """Rectangle from source pasted into target; labels mixed by area
    fraction (``mix.py:13-115``)."""
    h, w, _ = X_t.shape
    # low<high guard (same rule as mask_rectangle): tiny samples or
    # min_size==max_size would make rng.integers raise.
    ph = int(rng.integers(int(h * min_size), max(int(h * max_size), int(h * min_size) + 1)))
    pw = int(rng.integers(int(w * min_size), max(int(w * max_size), int(w * min_size) + 1)))
    ph = max(min(ph, h), 1)
    pw = max(min(pw, w), 1)
    y0 = int(rng.integers(0, h - ph + 1))
    x0 = int(rng.integers(0, w - pw + 1))
    X = X_t.copy()
    X[y0:y0 + ph, x0:x0 + pw, :] = X_s[y0:y0 + ph, x0:x0 + pw, :]
    frac = (ph * pw) / (h * w)
    y = y_t * (1 - frac) + y_s * frac
    return X, y


def augmentation_mixup(X_t, y_t, X_s, y_s, rng: np.random.Generator,
                       alpha: float = 0.2):
    """Convex combination of two samples (``mix.py:116-233``)."""
    lam = float(rng.beta(alpha, alpha)) if alpha > 0 else 0.5
    X = X_t * lam + X_s * (1 - lam)
    y = y_t * lam + y_s * (1 - lam)
    return _cast_like(X, X_t.dtype), y


# --------------------------------------------------------------- masking


def mask_pixels(X: np.ndarray, rng: np.random.Generator, p: float = 0.05,
                value: float = 0.0, per_channel: bool = False) -> np.ndarray:
    """Random pixel dropout (reference ``pixel_masking.py:12-110``:
    2d = whole pixel, 3d = per channel)."""
    X = X.copy()
    if per_channel:
        m = rng.random(X.shape) < p
        X[m] = value
    else:
        m = rng.random(X.shape[:2]) < p
        X[m, :] = value
    return X


def mask_channels(X: np.ndarray, rng: np.random.Generator, p: float = 0.1,
                  value: float = 0.0) -> np.ndarray:
    """Zero whole channels with probability p (``pixel_masking.py:111-178``)."""
    X = X.copy()
    m = rng.random(X.shape[-1]) < p
    X[..., m] = value
    return X


def mask_rectangle(X: np.ndarray, rng: np.random.Generator,
                   min_size: float = 0.1, max_size: float = 0.3,
                   value: float = 0.0) -> np.ndarray:
    """Random rectangle cutout (``shape_masking.py:332-587``)."""
    h, w, _ = X.shape
    ph = int(rng.integers(max(int(h * min_size), 1), max(int(h * max_size), 2)))
    pw = int(rng.integers(max(int(w * min_size), 1), max(int(w * max_size), 2)))
    y0 = int(rng.integers(0, h - ph + 1))
    x0 = int(rng.integers(0, w - pw + 1))
    X = X.copy()
    X[y0:y0 + ph, x0:x0 + pw, :] = value
    return X


def mask_ellipse(X: np.ndarray, rng: np.random.Generator,
                 min_size: float = 0.1, max_size: float = 0.3,
                 value: float = 0.0) -> np.ndarray:
    """Random ellipse cutout (``shape_masking.py:47-331``)."""
    h, w, _ = X.shape
    ry = max(int(h * rng.uniform(min_size, max_size) / 2), 1)
    rx = max(int(w * rng.uniform(min_size, max_size) / 2), 1)
    cy = int(rng.integers(ry, h - ry + 1))
    cx = int(rng.integers(rx, w - rx + 1))
    yy, xx = np.ogrid[:h, :w]
    m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    X = X.copy()
    X[m, :] = value
    return X


def mask_lines(X: np.ndarray, rng: np.random.Generator, n_lines: int = 2,
               thickness: int = 1, value: float = 0.0) -> np.ndarray:
    """Random horizontal/vertical line dropout (``line_masking.py:9-305``)."""
    X = X.copy()
    h, w, _ = X.shape
    for _ in range(n_lines):
        if rng.random() < 0.5:
            r = int(rng.integers(0, h))
            X[r:r + thickness, :, :] = value
        else:
            c = int(rng.integers(0, w))
            X[:, c:c + thickness, :] = value
    return X


def _border_point(idx: int, h: int, w: int) -> tuple:
    """1-D border index → (y, x) walking top→right→bottom→left
    (reference ``line_masking.py:239-271``)."""
    if idx < w:
        return 0, idx
    if idx < w + h - 1:
        return idx - w + 1, w - 1
    if idx < 2 * w + h - 2:
        return h - 1, w - 1 - (idx - w - h + 2)
    return h - 1 - (idx - 2 * w - h + 3), 0


def mask_lines_bezier(X: np.ndarray, rng: np.random.Generator,
                      p: float = 0.05) -> np.ndarray:
    """Mask of random quadratic Bezier curves between border points
    (≙ ``mask_lines_2d_bezier``, reference line_masking.py:305-396):
    each curve runs border→border through a uniform interior control
    point, rasterized at bbox-diagonal resolution with round-half-up;
    returns uint8 (H, W, C), 0 = masked. Curve count ~ Binomial(border
    perimeter, p); the t-samples per curve are evaluated vectorized
    instead of the reference's per-t prange loop."""
    h, w, c = X.shape
    mask = np.ones((h, w, c), dtype=np.uint8)
    border = 2 * (h + w) - 4
    n_lines = int((rng.random(border) < p).sum())
    if n_lines == 0:
        return mask
    for _ in range(n_lines):
        sy, sx = _border_point(int(rng.integers(0, border)), h, w)
        ey, ex = _border_point(int(rng.integers(0, border)), h, w)
        my = int(rng.integers(0, h))
        mx = int(rng.integers(0, w))
        diag = int(np.sqrt((max(sx, mx, ex) - min(sx, mx, ex)) ** 2
                           + (max(sy, my, ey) - min(sy, my, ey)) ** 2))
        t = np.linspace(0.0, 1.0, max(diag, 2))
        a, b = 1.0 - t, t
        x = a * (a * sx + b * mx) + b * (a * mx + b * ex)
        y = a * (a * sy + b * my) + b * (a * my + b * ey)
        xi = np.clip((x + 0.5).astype(np.int64), 0, w - 1)
        yi = np.clip((y + 0.5).astype(np.int64), 0, h - 1)
        # reference indexes mask[y, x] with the bezier's (x, y) swapped
        # through its (px, py) call order — net effect: rows from the x
        # polynomial, cols from the y polynomial. Keep rows=y, cols=x
        # here (the geometrically-correct form) and document the delta.
        mask[yi, xi, :] = 0
    return mask


def spatial_label_smoothing(y: np.ndarray, radius: float = 1.0,
                            preserve_class: bool = True) -> np.ndarray:
    """Blur one-hot labels spatially (reference
    ``spatial_label_smoothing.py:14-107``). With ``preserve_class`` (the
    reference's 'kernel' method, lines 75-105) the center kernel weight
    is boosted to ``kernel.sum()·size/(size−1)`` — at least the mass of
    every neighbour combined — so the per-pixel argmax class can never
    flip at boundaries; rows renormalize to sum 1.

    Class preservation needs a class axis: 2-D label maps and
    single-channel stacks fall back to the plain blur (the reference's
    'half' method) — renormalizing one channel would return all-ones."""
    y = y.astype(np.float64)
    if not preserve_class or y.ndim < 3 or y.shape[-1] < 2:
        return filter_blur(y, radius=radius)
    from buteo_ray.functions.convolution import convolve, kernel_base

    k = kernel_base(radius, circular=True, distance_weighted=True,
                    method=3, normalised=False)
    strength = k.size / (k.size - 1.0)
    k = k.copy()
    k[k.shape[0] // 2, k.shape[1] // 2] = k.sum() * strength
    out = convolve(y, k, "sum")
    return out / np.maximum(out.sum(axis=2, keepdims=True), 1e-7)


# ------------------------------------------------------- batch application


class AugmentationPipeline:
    """Composable augmentation chain applied per sample inside one
    ``map_batches`` call (the reference's ``Dataset``/
    ``DatasetAugmentation`` iterator, ``ai/augmentation.py:68-212``, as a
    Ray Data stage). Each entry: (fn, prob, kwargs). Seed derived per
    sample from (seed, sample_index) — deterministic and
    position-independent across resumes."""

    def __init__(self, steps: List[tuple], seed: int = 42):
        self.steps = steps
        self.seed = seed

    def apply(self, X: np.ndarray, sample_id: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, sample_id))
        for fn, prob, kwargs in self.steps:
            if rng.random() <= prob:
                X = fn(X, rng, **kwargs)
        return X


def augmentation_blur_xy(X: np.ndarray, y: np.ndarray, rng: np.random.Generator):
    """Blur features and labels together (``transform.py:264-321``)."""
    return augmentation_blur(X, rng), augmentation_blur(y, rng)


def augmentation_sharpen_xy(X: np.ndarray, y: np.ndarray, rng: np.random.Generator):
    """Sharpen features and labels together (``transform.py:411-468``)."""
    return augmentation_sharpen(X, rng), augmentation_sharpen(y, rng)
