"""Partial+final grouped aggregation (the combiner pattern, SURVEY.md
§2.5): an Arrow-native per-block ``pyarrow.Table.group_by`` (C++ hash
aggregate, zero pandas conversion) reduces each block to at most one row
per key BEFORE the shuffle, so partials — not rows — cross the exchange;
Ray's ``groupby().aggregate()`` then merges the partials.

At 100 TB with low-cardinality keys this shuffles kilobytes instead of
the corpus; with high-cardinality keys it degrades gracefully to the
plain shuffle (each block's partial is the block itself).

Reference parity: the zonal-statistics partial plan
(``raster/zonal_statistics.py:29-157``) generalized to attribute keys.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    sums: Optional[Dict[str, str]] = None,
    means: Optional[Dict[str, str]] = None,
    mins: Optional[Dict[str, str]] = None,
    maxs: Optional[Dict[str, str]] = None,
    count: Optional[str] = None,
):
    """Grouped sum/mean/min/max/count with Arrow per-block partials.

    ``sums``/``means``/``mins``/``maxs`` map OUTPUT alias → input column;
    ``count`` is the alias for the group row count (rows, not non-null —
    pandas ``size`` semantics). Means are derived exactly from
    (sum, valid-count) partials — null values are skipped, matching SQL
    AVG and ``ray.data.aggregate.Mean`` (an all-null group yields NaN).
    Input columns named like ``*_sum`` / ``*_count`` / ``count_all``
    would collide with the partial names — rename first.
    Result column order: keys, sums, means, mins, maxs, count."""
    from ray.data.aggregate import Max, Min, Sum

    sums = dict(sums or {})
    means = dict(means or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    keys = list(keys)

    sum_cols = sorted(set(sums.values()) | set(means.values()))
    mean_cols = sorted(set(means.values()))
    min_cols = sorted(set(mins.values()))
    max_cols = sorted(set(maxs.values()))
    need_count = count is not None

    def _partial(t: pa.Table) -> pa.Table:
        aggs = ([(c, "sum") for c in sum_cols]
                + [(c, "count") for c in mean_cols]  # non-null denominator
                + [(c, "min") for c in min_cols]
                + [(c, "max") for c in max_cols])
        if need_count:
            aggs.append(([], "count_all"))
        return t.group_by(keys).aggregate(aggs)

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)

    aggs = [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in sum_cols]
    aggs += [Sum(f"{c}_count", alias_name=f"{c}_count") for c in mean_cols]
    aggs += [Min(f"{c}_min", alias_name=f"{c}_min") for c in min_cols]
    aggs += [Max(f"{c}_max", alias_name=f"{c}_max") for c in max_cols]
    if need_count:
        aggs.append(Sum("count_all", alias_name="count_all"))
    merged = partials.groupby(keys).aggregate(*aggs)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = {k: g[k] for k in keys}
        for a, c in sums.items():
            out[a] = g[f"{c}_sum"]
        for a, c in means.items():
            out[a] = g[f"{c}_sum"] / g[f"{c}_count"]
        for a, c in mins.items():
            out[a] = g[f"{c}_min"]
        for a, c in maxs.items():
            out[a] = g[f"{c}_max"]
        if count is not None:
            out[count] = g["count_all"].astype(np.int64)
        return pd.DataFrame(out)

    return merged.map_batches(_final, batch_format="pandas", batch_size=None)
