"""Weighted merge kernels for overlapping patch predictions — vectorized
re-implementations of the reference's numba kernels
(``/root/reference/buteo/array/patches/merging.py:15-396``).

Input layout matches the reference: ``arr`` is (N, H, W, C) — N
overlapping predictions per pixel — and ``weights`` is (N, H, W, 1);
NaN entries are skipped per pixel. Output is (H, W, C) float32.

Parity notes (each verified against a direct per-pixel transcription of
the reference kernel in tests/test_merging.py):
- median/mad use the reference's cumulative-weight interpolation
  (``intersect = (cumsum - 0.5·w) / total``, interp at 0.5);
- sorting is stable; the reference's unstable numba argsort only
  reorders equal values, whose interpolated result is unchanged;
- mode ties are broken toward the smaller value here (the reference
  breaks toward first appearance order — documented divergence, only
  reachable when two distinct values have exactly equal weight sums).
"""

from __future__ import annotations

import numpy as np


def _flatten(arr: np.ndarray, weights: np.ndarray):
    n, h, w, c = arr.shape
    v = arr.reshape(n, -1).astype(np.float64)          # (N, M) M = H*W*C
    wt = np.broadcast_to(weights, (n, h, w, c)).reshape(n, -1).astype(np.float64)
    return v, wt, (h, w, c)


def _weighted_median_cols(sv: np.ndarray, sw: np.ndarray) -> np.ndarray:
    """Column-wise weighted median of pre-sorted values (NaNs last with
    weight 0). Mirrors np.interp(0.5, intersect, sorted_data)."""
    cum = np.cumsum(sw, axis=0)
    total = cum[-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        intersect = (cum - 0.5 * sw) / total
    # First row where intersect >= 0.5 (NaN rows have intersect using 0
    # weight → values > 0.5 handled; all-NaN columns give total 0 → NaN).
    below = intersect < 0.5
    hi = below.sum(axis=0)
    m = sv.shape[1]
    cols = np.arange(m)
    hi = np.clip(hi, 0, sv.shape[0] - 1)
    lo = np.clip(hi - 1, 0, sv.shape[0] - 1)
    x0 = intersect[lo, cols]
    x1 = intersect[hi, cols]
    y0 = sv[lo, cols]
    y1 = sv[hi, cols]
    denom = x1 - x0
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(denom != 0, (0.5 - x0) / denom, 0.0)
    out = y0 + t * (y1 - y0)
    # hi == 0 → 0.5 below the first point → fp[0] (np.interp clamp).
    out = np.where(hi == 0, sv[0, cols], out)
    return out


def _sorted(v: np.ndarray, wt: np.ndarray):
    wt = np.where(np.isnan(v), 0.0, wt)
    order = np.argsort(v, axis=0, kind="stable")  # NaNs sort last
    sv = np.take_along_axis(v, order, axis=0)
    sw = np.take_along_axis(wt, order, axis=0)
    return sv, sw


def merge_weighted_median(arr: np.ndarray, weights: np.ndarray) -> np.ndarray:
    v, wt, shape = _flatten(arr, weights)
    sv, sw = _sorted(v, wt)
    out = _weighted_median_cols(sv, sw)
    valid = ~np.isnan(v)
    out = np.where(valid.any(axis=0), out, 0.0)
    return out.reshape(shape).astype(np.float32)


def merge_weighted_average(arr: np.ndarray, weights: np.ndarray) -> np.ndarray:
    v, wt, shape = _flatten(arr, weights)
    mask = np.isnan(v)
    wt = np.where(mask, 0.0, wt)
    v0 = np.where(mask, 0.0, v)
    num = (v0 * wt).sum(axis=0)
    den = wt.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return out.reshape(shape).astype(np.float32)


def merge_weighted_minmax(arr: np.ndarray, weights: np.ndarray, method: str = "max") -> np.ndarray:
    v, wt, shape = _flatten(arr, weights)
    mask = np.isnan(v)
    weighted = v * wt
    if method == "max":
        weighted = np.where(mask, -np.inf, weighted)
        idx = np.argmax(weighted, axis=0)
    elif method == "min":
        weighted = np.where(mask, np.inf, weighted)
        idx = np.argmin(weighted, axis=0)
    else:
        raise ValueError("method must be min or max")
    cols = np.arange(v.shape[1])
    out = v[idx, cols]
    out = np.where(mask.all(axis=0), 0.0, out)
    return out.reshape(shape).astype(np.float32)


def merge_weighted_olympic(arr: np.ndarray, weights: np.ndarray, level: int = 1) -> np.ndarray:
    """Olympic merge: drop the ``level`` lowest/highest, weighted-average
    the rest; small-count fallbacks per reference ``merging.py:187-252``."""
    v, wt, shape = _flatten(arr, weights)
    sv, sw = _sorted(v, wt)
    n_valid = (~np.isnan(v)).sum(axis=0)
    required = level * 2 + 1
    m = v.shape[1]
    out = np.zeros(m, dtype=np.float64)

    # Case 1: n < required → plain mean of valid values.
    mean_all = np.nanmean(np.where(np.isnan(v), np.nan, v), axis=0,
                          where=~np.isnan(v)) if m else np.zeros(0)
    # Case 2: n == required → middle (level-th) sorted value.
    cols = np.arange(m)
    middle = sv[np.minimum(level, sv.shape[0] - 1), cols]
    # Case 3: trimmed weighted mean over ranks [level, n-level).
    ranks = np.arange(sv.shape[0])[:, None]
    keep = (ranks >= level) & (ranks < (n_valid - level)[None, :])
    tw = np.where(keep, sw, 0.0)
    tv = np.where(keep, sv, 0.0)
    den = tw.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        trimmed = np.where(den > 0, (tv * tw).sum(axis=0) / den, 0.0)

    out = np.where(n_valid < required, np.where(n_valid > 0, mean_all, 0.0),
                   np.where(n_valid == required, middle, trimmed))
    return out.reshape(shape).astype(np.float32)


def merge_weighted_mad(arr: np.ndarray, weights: np.ndarray, mad_dist: float = 2.0) -> np.ndarray:
    """MAD merge per reference ``merging.py:255-341``: weighted median →
    MAD reweighting → weighted median with the new weights."""
    v, wt, shape = _flatten(arr, weights)
    sv, sw = _sorted(v, wt)
    median = _weighted_median_cols(sv, sw)

    valid = ~np.isnan(v)
    absdev = np.abs(np.where(valid, v, np.nan) - median[None, :])
    mad = np.nanmedian(absdev, axis=0)

    with np.errstate(invalid="ignore", divide="ignore"):
        new_w = 1.0 - np.minimum(np.abs(sv - median[None, :]) / (mad * mad_dist)[None, :], 1.0)
    new_w = np.where(np.isnan(sv), 0.0, np.where(np.isnan(new_w), 0.0, new_w))
    remerged = _weighted_median_cols(sv, new_w)

    out = np.where((mad == 0.0) | (new_w.sum(axis=0) == 0.0), median, remerged)
    out = np.where(valid.any(axis=0), out, 0.0)
    return out.reshape(shape).astype(np.float32)


def merge_weighted_mode(arr: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Weighted mode; ties toward the smaller value (see module note)."""
    v, wt, shape = _flatten(arr, weights)
    sv, sw = _sorted(v, wt)
    n, m = sv.shape
    # Run-length encode equal values per column (column-major flatten).
    flat_v = sv.T.ravel()
    flat_w = sw.T.ravel()
    col_of = np.repeat(np.arange(m), n)
    change = np.ones(flat_v.shape[0], dtype=bool)
    same = (flat_v[1:] == flat_v[:-1]) & (col_of[1:] == col_of[:-1])
    change[1:] = ~same
    run_starts = np.nonzero(change)[0]
    run_sums = np.add.reduceat(flat_w, run_starts)
    run_vals = flat_v[run_starts]
    run_cols = col_of[run_starts]
    # NaN-value runs (weightless) must never win.
    run_sums = np.where(np.isnan(run_vals), -1.0, run_sums)
    # Vectorized per-column argmax with smallest-value tie-break: sort by
    # (col asc, sum asc, value desc) and take the last run of each column.
    order = np.lexsort((-run_vals, run_sums, run_cols))
    sc = run_cols[order]
    last_of_col = np.nonzero(np.concatenate([sc[1:] != sc[:-1], [True]]))[0]
    best_cols = sc[last_of_col]
    best_vals = run_vals[order][last_of_col]
    best_sums = run_sums[order][last_of_col]
    out = np.zeros(m, dtype=np.float64)
    out[best_cols] = np.where(best_sums >= 0, best_vals, 0.0)
    out = np.where(np.isnan(out), 0.0, out)
    return out.reshape(shape).astype(np.float32)


MERGE_METHODS = {
    "median": merge_weighted_median,
    "mean": merge_weighted_average,
    "average": merge_weighted_average,
    "max": lambda a, w: merge_weighted_minmax(a, w, "max"),
    "min": lambda a, w: merge_weighted_minmax(a, w, "min"),
    "olympic": merge_weighted_olympic,
    "mad": merge_weighted_mad,
    "mode": merge_weighted_mode,
}
