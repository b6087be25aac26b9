"""Zonal statistics: per-zone reductions of a value raster against a
zone raster (reference ``raster/zonal_statistics.py:29-157``: rasterized
zone ids + per-zone stats; and the 21-stat vector variant marked broken
since 0.7, ``vector/zonal_statistics.py``).

Ray plan (SURVEY.md §2.5): positional tile join (tagged union on the
tile key) → per-tile PARTIAL stats via ``np.bincount`` over zone ids
(sum/count/min/max/sumsq) → tiny ``groupby(zone)`` final merge. Mean,
std and variance are exact (derived from merged moments); median is
exact only per-collection (use ``exact_median=True`` to gather values
per zone — bounded by zone size; the scalable default reports the
moment stats, approximation documented like the reference's plan note).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.sources.raster import tile_to_ndarray


#: The reference's full 21-stat inventory (vector/zonal_statistics.py:35-63).
STAT_NAMES = ("n", "range", "min", "max", "sum", "mean", "var", "std",
              "skew", "kurtosis", "median", "iqr", "q02", "q98", "q1", "q3",
              "mad", "mode", "snr", "eff", "cv")


def zone_stats_21(v: np.ndarray) -> dict:
    """All 21 reference statistics of one zone's values
    (vector/zonal_statistics.py:70-152 formulas: population var/std,
    non-excess kurtosis, snr/eff/cv zero-guarded; mode ties → smallest
    value). Divergence, by design: the reference's iqr computes
    q25+q75 (an upstream bug in commented-out numba code); this engine
    returns the standard q3 − q1."""
    v = np.asarray(v, dtype=np.float64)
    n = v.size
    mean = float(v.mean())
    var = float(v.var())
    std = float(np.sqrt(var))
    dev = v - mean
    q02, q1, med, q3, q98 = (float(x) for x in
                             np.quantile(v, [0.02, 0.25, 0.5, 0.75, 0.98]))
    uniq, counts = np.unique(v, return_counts=True)
    return {
        "n": n,
        "range": float(v.max() - v.min()),
        "min": float(v.min()),
        "max": float(v.max()),
        "sum": float(v.sum()),
        "mean": mean,
        "var": var,
        "std": std,
        "skew": float(np.sum(dev**3) / n / std**3) if std > 0 else 0.0,
        "kurtosis": float(np.sum(dev**4) / n / std**4) if std > 0 else 0.0,
        "median": med,
        "iqr": q3 - q1,
        "q02": q02,
        "q98": q98,
        "q1": q1,
        "q3": q3,
        "mad": float(np.median(np.abs(v - med))),
        "mode": float(uniq[counts.argmax()]),  # first max → smallest value
        "snr": mean / std if std > 0 else 0.0,
        "eff": var / mean**2 if mean != 0 else 0.0,
        "cv": std / mean if mean != 0 else 0.0,
    }


def zonal_statistics_table(ds, by, value_col: str, stats=STAT_NAMES):
    """Tabular 21-stat zonal statistics: per-``by``-group stats of
    ``value_col`` (the vector/attribute form of the reference's
    vector_zonal_statistics). Quantile-family stats need the group's
    values in one place, so this gathers per group (bounded by zone
    size — same trade as ``exact_median`` in the raster form)."""
    by_cols = [by] if isinstance(by, str) else list(by)

    def _grp(g: pd.DataFrame) -> pd.DataFrame:
        s = zone_stats_21(g[value_col].to_numpy())
        out = {c: [g[c].iloc[0]] for c in by_cols}
        for k in stats:
            out[k] = [s[k]]
        return pd.DataFrame(out)

    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(ds, by_cols, _grp)


def zonal_statistics(value_ds, zone_ds, nodata: Optional[float] = None,
                     exact_median: bool = False, full_stats: bool = False):
    """Per-zone stats of band 0 of ``value_ds`` grouped by the integer
    zone ids in band 0 of ``zone_ds`` (same tiling grid). Returns
    Dataset[(zone, n, sum, mean, min, max, std, var[, median])], or the
    full 21-stat suite (``STAT_NAMES``) when ``full_stats=True`` (the
    quantile family requires the per-zone gather, like exact_median)."""
    gather = exact_median or full_stats

    def _tag(side):
        def _fn(t: pa.Table) -> pa.Table:
            return t.append_column("__side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))

        return _fn

    both = value_ds.map_batches(_tag(0), batch_format="pyarrow", batch_size=None).union(
        zone_ds.map_batches(_tag(1), batch_format="pyarrow", batch_size=None))

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        vals_row = g[g["__side"] == 0]
        zone_row = g[g["__side"] == 1]
        if len(vals_row) != 1 or len(zone_row) != 1:
            raise ValueError("zonal_statistics: tile missing on one side")

        def _core(row):
            # Crop any halo: stats must count each core pixel exactly once.
            arr = tile_to_ndarray(row)
            halo = row["halo"]
            return arr[halo:halo + row["height"], halo:halo + row["width"], 0]

        v = _core(vals_row.iloc[0]).ravel().astype(np.float64)
        z = _core(zone_row.iloc[0]).ravel().astype(np.int64)
        valid = ~np.isnan(v)
        if nodata is not None:
            valid &= v != nodata
        v, z = v[valid], z[valid]
        if v.size == 0:
            # Full column set: a zone-only frame would give this block a
            # different schema than every other partial.
            empty = {
                "zone": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sum": pd.Series([], dtype="float64"),
                "sumsq": pd.Series([], dtype="float64"),
                "min": pd.Series([], dtype="float64"),
                "max": pd.Series([], dtype="float64"),
            }
            if gather:
                empty["values"] = pd.Series([], dtype="object")
            return pd.DataFrame(empty)
        zones, inv = np.unique(z, return_inverse=True)
        zmin = np.full(zones.shape[0], np.inf)
        zmax = np.full(zones.shape[0], -np.inf)
        np.minimum.at(zmin, inv, v)
        np.maximum.at(zmax, inv, v)
        out = pd.DataFrame({
            "zone": zones,
            "n": np.bincount(inv),
            "sum": np.bincount(inv, weights=v),
            "sumsq": np.bincount(inv, weights=v * v),
            "min": zmin,
            "max": zmax,
        })
        if gather:
            # One stable argsort + split, not a full-vector mask scan per
            # zone (O(n log n) vs O(zones·pixels) on many-zone tiles).
            chunks = np.split(v[np.argsort(inv, kind="stable")],
                              np.cumsum(np.bincount(inv))[:-1])
            out["values"] = [c.tobytes() for c in chunks]
        return out

    # Tile count is unbounded (grows with raster extent): bucketed
    # routing with exact per-tile groups inside each bucket.
    from buteo_ray.stages.aggregate import bucketed_group_map

    partials = bucketed_group_map(both, ["tile_x", "tile_y"], _partial)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        if full_stats:
            vals = np.concatenate([np.frombuffer(b) for b in g["values"]])
            s = zone_stats_21(vals)
            return pd.DataFrame({"zone": [int(g["zone"].iloc[0])],
                                 **{k: [s[k]] for k in STAT_NAMES}})
        n = int(g["n"].sum())
        s = float(g["sum"].sum())
        ss = float(g["sumsq"].sum())
        mean = s / n
        var = max(ss / n - mean * mean, 0.0)
        out = {
            "zone": [int(g["zone"].iloc[0])],
            "n": [n], "sum": [s], "mean": [mean],
            "min": [float(g["min"].min())], "max": [float(g["max"].max())],
            "std": [float(np.sqrt(var))], "var": [var],
        }
        if exact_median:
            vals = np.concatenate([np.frombuffer(b) for b in g["values"]])
            out["median"] = [float(np.median(vals))]
        return pd.DataFrame(out)

    return bucketed_group_map(partials, ["zone"], _final)
