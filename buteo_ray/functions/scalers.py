"""Normalization scalers — reference-parity array kernels
(``/root/reference/buteo/ai/scalers.py:11-392``: same formulas, same
``(result, stat_dict)`` contract, float32 results, zero-guarded
divisions) plus the two-phase Dataset form: a distributed statistics
pass (``ds.aggregate`` partial+final — SURVEY.md §2.5 "scaler
statistics") feeding a stateless vectorized transform.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

MAD_TO_STD = 1.4826


def scaler_minmax(arr: np.ndarray, stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    arr_min = stat_dict["min"] if stat_dict else arr.min()
    arr_max = stat_dict["max"] if stat_dict else arr.max()
    # Return the stats actually APPLIED (fit-on-train / apply-on-test
    # callers chain this dict; recomputing from the input would leak
    # batch-local stats). Deliberate divergence: the reference recomputes
    # from the input here (scalers.py:48-51) while its own scaler_to_range
    # returns the applied stats — we follow the consistent contract.
    stat_dict = {"min": arr_min, "max": arr_max}
    num = np.subtract(arr, arr_min)
    den = np.subtract(arr_max, arr_min)
    result = np.zeros_like(arr, dtype="float32")
    np.divide(num, den, out=result, where=den != 0)
    return result, stat_dict


def scaler_standardise(arr: np.ndarray, stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    mean = stat_dict["mean"] if stat_dict else np.nanmean(arr)
    std = stat_dict["std"] if stat_dict else np.nanstd(arr)
    stat_dict = {"mean": mean, "std": std}
    result = np.zeros_like(arr, dtype="float32")
    np.divide(np.subtract(arr, mean), std, out=result, where=std != 0)
    return result, stat_dict


def scaler_standardise_mad(arr: np.ndarray, stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    if stat_dict:
        median, madstd = stat_dict["median"], stat_dict["madstd"]
        absdev = stat_dict.get("absdev")
    else:
        median = np.nanmedian(arr)
        absdev = np.abs(np.subtract(arr, median))
        madstd = np.nanmedian(absdev) * MAD_TO_STD
    stat_dict = {"median": median, "absdev": absdev, "madstd": madstd}
    result = np.zeros_like(arr, dtype="float32")
    np.divide(np.subtract(arr, median), madstd, out=result, where=madstd != 0)
    return result, stat_dict


def scaler_iqr(arr: np.ndarray, q1: float = 0.25, q3: float = 0.75,
               stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    if stat_dict:
        v1, med, v3 = stat_dict["q1"], stat_dict["median"], stat_dict["q3"]
    else:
        v1, med, v3 = np.nanquantile(arr, [q1, 0.5, q3])
    stat_dict = {"q1": v1, "median": med, "q3": v3}
    num = np.subtract(arr, med)
    den = v3 - v1
    result = np.zeros_like(arr, dtype="float32")
    np.divide(num, den, out=result, where=den != 0)
    return result, stat_dict


def scaler_to_range(arr: np.ndarray, min_val: float = 0.0, max_val: float = 1.0,
                    stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    arr_min = stat_dict["min"] if stat_dict else np.min(arr)
    arr_max = stat_dict["max"] if stat_dict else np.max(arr)
    stat_dict = {"min": arr_min, "max": arr_max}
    num = np.subtract(arr, arr_min)
    den = np.subtract(arr_max, arr_min)
    result = np.zeros_like(arr, dtype="float32")
    np.divide(num, den, out=result, where=den != 0)
    result = np.multiply(result, max_val - min_val) + min_val
    return result, stat_dict


def scaler_truncate(arr: np.ndarray, trunc_min: float, trunc_max: float,
                    target_min: float = 0.0, target_max: float = 1.0,
                    stat_dict: Optional[dict] = None) -> Tuple[np.ndarray, dict]:
    if trunc_min >= trunc_max:
        raise ValueError("trunc_min must be less than trunc_max")
    truncated = np.clip(arr, trunc_min, trunc_max)
    result, stat_dict = scaler_to_range(truncated, target_min, target_max, stat_dict)
    return result, stat_dict


# ------------------------------------------------------- Dataset two-phase


def column_stats(ds, col: str, quantiles: bool = False) -> dict:
    """Distributed statistics of one column: min/max/mean/std exact via
    ``ds.aggregate``; quantiles (when requested) exact only if the column
    fits the driver — else computed from a seeded 1% sample (documented
    approximation, SURVEY.md §2.5 median note)."""
    from ray.data.aggregate import Max, Mean, Min, Std

    # ddof=0: the array kernels (scaler_standardise et al.) use
    # population std (np.nanstd default); Ray's Std defaults to the
    # sample estimator and would diverge for small n.
    res = ds.aggregate(Min(col), Max(col), Mean(col), Std(col, ddof=0))
    stats = {
        "min": res[f"min({col})"],
        "max": res[f"max({col})"],
        "mean": res[f"mean({col})"],
        "std": res[f"std({col})"],
    }
    if quantiles:
        n = ds.count()
        sample = ds if n <= 1_000_000 else ds.random_sample(0.01, seed=42)
        vals = np.sort(sample.select_columns([col]).to_pandas()[col].to_numpy())
        stats["q1"], stats["median"], stats["q3"] = np.nanquantile(vals, [0.25, 0.5, 0.75])
        stats["madstd"] = float(np.nanmedian(np.abs(vals - stats["median"])) * MAD_TO_STD)
    return stats


def scale_column(ds, col: str, method: str = "minmax", out_col: Optional[str] = None):
    """Two-phase scaling of a Dataset column: global stats → broadcast →
    stateless transform. ``method`` ∈ {minmax, standardise, iqr, mad}."""
    need_q = method in ("iqr", "mad")
    stats = column_stats(ds, col, quantiles=need_q)
    out_col = out_col or f"{col}_scaled"

    def _fn(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if method == "minmax":
            r, _ = scaler_minmax(v, {"min": stats["min"], "max": stats["max"]})
        elif method == "standardise":
            r, _ = scaler_standardise(v, {"mean": stats["mean"], "std": stats["std"]})
        elif method == "iqr":
            r, _ = scaler_iqr(v, stat_dict={"q1": stats["q1"], "median": stats["median"], "q3": stats["q3"]})
        elif method == "mad":
            r, _ = scaler_standardise_mad(v, {"median": stats["median"], "madstd": stats["madstd"], "absdev": None})
        else:
            raise ValueError(f"unknown method {method}")
        return batch.append_column(out_col, pa.array(r.astype(np.float64)))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
