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

from typing import Callable, Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

# Ray's sort-based ``groupby(key)`` pays per-GROUP Python overhead in
# the reduce (measured here: ~1.5 ms/group — 72 s for a 50k-key count,
# linear in distinct keys; the hash-shuffle strategy spawns a 200-actor
# pool, worse on one node). Any operator whose key cardinality is
# unbounded at 100 TB must therefore group by HASH BUCKET — a bounded,
# size-derived B — and run ONE vectorized pandas/Arrow operation per
# bucket (measured: 1M distinct keys in ~2 s vs ~25 min raw). The
# helpers below are that pattern, shared engine-wide.

BUCKET_COL = "__key_bucket"


# Fixed sentinel hash for null key values (any constant works; the
# requirement is only that every block maps null to the SAME bucket).
_NULL_HASH = np.uint64(0xA5A5A5A55A5A5A5A)


def _hash_key_column(arr) -> np.ndarray:
    """Dtype-STABLE uint64 hash of one key column.

    Must not route through ``to_pandas()`` dtype inference for numeric
    types: an int64 column converts to float64 when the block happens
    to contain a null, and pandas hashes int64 7 and float64 7.0
    differently — the same key would land in different buckets
    depending on its neighbors. Integer/bool/temporal values are hashed
    from their exact int64 payload (splitmix64), floats from their
    float64 bits, nulls to a fixed sentinel; strings/binary keep the
    pandas object hash (object dtype is stable regardless of nulls)."""
    import pyarrow.compute as pc

    from buteo_ray.stages.dedup import _splitmix64

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    t = a.type
    if pa.types.is_dictionary(t):
        a = a.dictionary_decode()
        t = a.type
    if (pa.types.is_integer(t) or pa.types.is_boolean(t)
            or pa.types.is_temporal(t)):
        null = pc.is_null(a).to_numpy(zero_copy_only=False)
        if pa.types.is_date32(t) or pa.types.is_time32(t):
            # Arrow has no direct date32/time32 → int64 cast; go through
            # the 32-bit storage type first.
            a = a.cast(pa.int32(), safe=False)
        as_int = a.cast(pa.int64(), safe=False).fill_null(0)
        vals = as_int.to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(vals.view(np.uint64))
    elif pa.types.is_floating(t):
        # Arrow-null and NaN float keys are INDISTINGUISHABLE in the
        # pandas fold (to_pandas turns null into NaN, and groupby
        # dropna=False makes one NaN group), so they must route to the
        # same bucket too — nan_is_null=True sends both to the null
        # sentinel; a float key therefore has ONE null∪NaN group.
        null = pc.is_null(a, nan_is_null=True).to_numpy(zero_copy_only=False)
        vals = (a.cast(pa.float64()).fill_null(0.0)
                .to_numpy(zero_copy_only=False).astype(np.float64))
        # Canonicalize before viewing bits: -0.0 == 0.0 under groupby,
        # so they must hash equal too (adding +0.0 maps -0.0 → 0.0).
        vals = vals + 0.0
        vals = np.where(null, 0.0, vals)  # NaN payloads → sentinel path
        h = _splitmix64(vals.view(np.uint64))
    else:
        h = pd.util.hash_pandas_object(
            a.to_pandas(), index=False).to_numpy().astype(np.uint64)
        null = pc.is_null(a).to_numpy(zero_copy_only=False)
    if null.any():
        h = h.copy()
        h[null] = _NULL_HASH
    return h


def _bucket_of_keys(t: pa.Table, keys: Sequence[str],
                    num_buckets: int) -> np.ndarray:
    """Vectorized row-hash of the key columns → bucket id, combined
    across columns with a splitmix64 re-mix so multi-key routing stays
    well distributed."""
    from buteo_ray.stages.dedup import _MIX, _splitmix64

    h = _hash_key_column(t[keys[0]])
    for k in keys[1:]:
        h = _splitmix64(h * _MIX + _hash_key_column(t[k]))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def append_key_bucket(ds, keys: Sequence[str],
                      num_buckets: Optional[int] = None):
    """Append ``BUCKET_COL`` = hash(keys) % B (B size-derived when not
    given). The routing step of every bucketed-groupby plan."""
    from buteo_ray.state.skew import derive_num_partitions

    B = int(num_buckets or derive_num_partitions(ds))
    keys = list(keys)

    def _fn(t: pa.Table) -> pa.Table:
        return t.append_column(BUCKET_COL,
                               pa.array(_bucket_of_keys(t, keys, B)))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def arrow_fields(ds) -> "list[tuple[str, pa.DataType]]":
    """(name, arrow type) pairs of the dataset's schema, robust to
    pandas-backed datasets whose ``schema()`` is a PandasBlockSchema
    (numpy/extension dtypes, no ``base_schema``). Object dtype maps to
    string — best-effort."""
    sch = ds.schema()
    if sch is None:  # fully-empty schemaless dataset
        return []
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return [(f.name, f.type) for f in base]
    fields = []
    for n, t in zip(base.names, base.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        elif isinstance(t, pd.api.extensions.ExtensionDtype):
            # Nullable pandas dtypes (Int64Dtype, Float64Dtype, ...)
            # are not np.dtype-interpretable; map via their scalar type
            # (StringDtype's `str` falls through to string).
            try:
                fields.append((n, pa.from_numpy_dtype(t.type)))
            except (TypeError, pa.ArrowNotImplementedError):
                fields.append((n, pa.string()))
        else:
            dt = np.dtype(t)
            fields.append((n, pa.string() if dt == np.dtype(object)
                           else pa.from_numpy_dtype(dt)))
    return fields


def _empty_arrow_table(ds) -> pa.Table:
    """0-row Arrow table with the dataset's schema (see arrow_fields)."""
    return pa.schema(arrow_fields(ds)).empty_table()


def nonempty_arrow_blocks(ds) -> "list[pa.Table]":
    """``ray.get(ds.to_arrow_refs())`` with two Ray 2.49 quirks handled:
    0-row blocks may carry a CLEARED schema (poisoning concat_tables),
    and empty PANDAS blocks can reach to_arrow_refs unconverted —
    ``map_batches`` skips the UDF on empty blocks, so a pandas block
    emitted by an upstream ``map_groups`` for an empty sort partition
    survives every later stage and then lacks ``.num_rows``. Both kinds
    carry no rows; drop them. The collect helper every driver-side
    gather in the engine must use."""
    import ray

    out = []
    for t in ray.get(ds.to_arrow_refs()):
        if isinstance(t, pa.Table):
            if t.num_rows:
                out.append(t)
        elif len(t):  # non-empty pandas block that escaped conversion
            out.append(pa.Table.from_pandas(t, preserve_index=False))
    return out


def _bucket_frame(t: pa.Table, keys: Sequence[str]) -> pd.DataFrame:
    """Arrow bucket → pandas WITHOUT key-precision loss.

    Pandas' default conversion turns an int64 KEY column into float64
    whenever the bucket contains a null key, silently merging distinct
    keys above 2^53 (this engine routinely groups on 64-bit hash keys).
    Integer key columns with nulls become pandas nullable IntegerArrays
    (exact payload + mask) instead; non-key columns keep the default
    conversion so value/output dtypes are unchanged."""
    import pyarrow.compute as pc

    df = t.to_pandas()
    for k in keys:
        f = t.schema.field(k)
        col = t.column(k)
        if pa.types.is_integer(f.type) and col.null_count:
            ca = col.combine_chunks()
            mask = pc.is_null(ca).to_numpy(zero_copy_only=False)
            vals = ca.fill_null(0).to_numpy(zero_copy_only=False)
            df[k] = pd.arrays.IntegerArray(vals, mask)
    return df


def bucketed_group_map(ds, keys: Sequence[str],
                       fn: Callable[[pd.DataFrame], pd.DataFrame],
                       num_buckets: Optional[int] = None,
                       empty: Optional[pd.DataFrame] = None):
    """``groupby(keys).map_groups(fn)`` for UNBOUNDED key cardinality.

    Routes rows by hash bucket, then inside each bucket iterates the
    real key groups with pandas (µs per group) and applies ``fn`` to
    each — so Ray's per-group machinery runs B times, not once per
    distinct key. ``fn`` sees exactly what ``map_groups`` would: all
    rows of one key, as a DataFrame (without the bucket column).

    ``fn`` may return ``None`` to drop a group, but then ``empty`` (a
    zero-row frame with fn's OUTPUT schema) must be given so a bucket
    whose every group drops still emits the right block schema —
    falling back to the input schema would poison the union. Fns that
    filter should prefer returning typed empty frames (they carry
    their own schema and concat correctly without ``empty``)."""
    keys = list(keys)
    bucketed = append_key_bucket(ds, keys, num_buckets)

    def _per_bucket(t: pa.Table) -> pd.DataFrame:
        g = _bucket_frame(t.drop_columns([BUCKET_COL]), keys)
        outs = [fn(sub) for _, sub in
                g.groupby(keys, sort=False, dropna=False)]
        outs = [o for o in outs if o is not None]
        if not outs:
            if empty is None:
                raise TypeError(
                    "bucketed_group_map: every group in a bucket "
                    "returned None and no `empty` schema frame was "
                    "given — return zero-row DataFrames (they carry "
                    "the output schema) or pass empty=.")
            return empty
        return pd.concat(outs, ignore_index=True)

    return bucketed.groupby(BUCKET_COL).map_groups(
        _per_bucket, batch_format="pyarrow")


def bucketed_fold(ds, keys: Sequence[str],
                  fold: Callable[[pd.DataFrame], pd.DataFrame],
                  num_buckets: Optional[int] = None,
                  protect: Optional[Sequence[str]] = None):
    """Like :func:`bucketed_group_map` but ``fold`` receives the WHOLE
    bucket (all rows of every key hashing into it) and must be
    key-aware itself (one vectorized ``DataFrame.groupby(keys).agg``
    per bucket — the fastest shape; no per-key Python at all).

    ``protect``: columns given :func:`_bucket_frame`'s int64-null
    precision protection (default = the routing keys). A fold that
    ALSO groups on a non-key column (e.g. mode's value column) must
    list it here, or a null in the bucket degrades it to float64 and
    merges distinct values above 2^53."""
    keys = list(keys)
    bucketed = append_key_bucket(ds, keys, num_buckets)
    guard = list(protect) if protect is not None else keys

    def _per_bucket(t: pa.Table) -> pd.DataFrame:
        return fold(_bucket_frame(t.drop_columns([BUCKET_COL]), guard))

    return bucketed.groupby(BUCKET_COL).map_groups(
        _per_bucket, batch_format="pyarrow")


def bucketed_count(ds, keys: Sequence[str], alias: str = "n",
                   num_buckets: Optional[int] = None):
    """Per-key row counts at any key cardinality: Arrow per-block
    partial counts (C++ hash aggregate) → bucketed vectorized fold.
    Returns Dataset[(*keys, alias:int64)]."""
    keys = list(keys)

    def _partial(t: pa.Table) -> pa.Table:
        out = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["__pn"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(keys, sort=False, dropna=False, as_index=False)
               ["__pn"].sum())
        return out.rename(columns={"__pn": alias})

    return bucketed_fold(partials, keys, _fold, num_buckets)


def bucketed_sum(ds, keys: Sequence[str], sums: Dict[str, str],
                 num_buckets: Optional[int] = None):
    """Per-key column sums at any key cardinality: one vectorized
    pandas groupby-sum per hash bucket. ``sums`` maps OUTPUT alias →
    input column (duplicated inputs allowed). Null keys group together
    (``dropna=False``), matching :func:`bucketed_count` — the single
    definition all sum-folds share so the null-key rule can't diverge
    per call site. Returns Dataset[(*keys, *sums)]."""
    keys = list(keys)
    in_cols = sorted(set(sums.values()))

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # min_count=1: an all-null group sums to null, matching SQL /
        # ray.data.aggregate.Sum / grouped_aggregate's fold — not 0.
        agg = (g.groupby(keys, sort=False, dropna=False, as_index=False)
               [in_cols].sum(min_count=1))
        out = {k: agg[k] for k in keys}
        for a, c in sums.items():
            out[a] = agg[c]
        return pd.DataFrame(out)

    return bucketed_fold(ds, keys, _fold, num_buckets)


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
    Result column order: keys, sums, means, mins, maxs, count.

    Scale shape: per-block Arrow partials cross the exchange (not
    rows), and the merge is a BUCKETED vectorized pandas fold — key
    cardinality is data-derived here (users, hosts, urls), so the
    merge must never be Ray's per-key reduce."""
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

    sum_part_cols = ([f"{c}_sum" for c in sum_cols]
                     + [f"{c}_count" for c in mean_cols]
                     + (["count_all"] if need_count else []))
    min_part_cols = [f"{c}_min" for c in min_cols]
    max_part_cols = [f"{c}_max" for c in max_cols]

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # Merge the partials with vectorized pandas per hash bucket
        # (never Ray's sort-based reduce — ~1.5 ms of Python PER
        # DISTINCT KEY; see module header). min_count=1 keeps an
        # all-null sum NaN instead of pandas' default 0, matching
        # ray.data.aggregate.Sum / SQL.
        gb = g.groupby(keys, sort=False, dropna=False)
        parts = []
        if sum_part_cols:
            parts.append(gb[sum_part_cols].sum(min_count=1))
        if min_part_cols:
            parts.append(gb[min_part_cols].min())
        if max_part_cols:
            parts.append(gb[max_part_cols].max())
        agg = pd.concat(parts, axis=1).reset_index()
        out = {k: agg[k] for k in keys}
        for a, c in sums.items():
            out[a] = agg[f"{c}_sum"]
        for a, c in means.items():
            out[a] = agg[f"{c}_sum"] / agg[f"{c}_count"]
        for a, c in mins.items():
            out[a] = agg[f"{c}_min"]
        for a, c in maxs.items():
            out[a] = agg[f"{c}_max"]
        if count is not None:
            out[count] = agg["count_all"].astype(np.int64)
        return pd.DataFrame(out)

    return bucketed_fold(partials, keys, _fold)

def bounded_aggregate(
    ds,
    keys: Sequence[str],
    sums: Optional[Dict[str, str]] = None,
    means: Optional[Dict[str, str]] = None,
    mins: Optional[Dict[str, str]] = None,
    maxs: Optional[Dict[str, str]] = None,
    count: Optional[str] = None,
) -> pd.DataFrame:
    """Grouped agg for key domains BOUNDED BY CONSTRUCTION — fixed
    raster grids, cell resolutions, enum codes — where the caller would
    collect the result to the driver anyway (densify into an array,
    return a small table).

    Plan: Arrow per-block partial aggregate (same combiner as
    :func:`grouped_aggregate`) → the partials (≤ n_blocks × |domain|
    rows, kilobytes) are collected and folded with ONE vectorized
    pandas groupby on the driver. This skips Ray's reduce entirely:
    the sort-based ``groupby`` pays ~1.5 ms of Python per distinct key
    (see module header), which even a 768-cell DEM grid feels (~1.2 s
    for a two-column count the fold does in ~0.05 s).

    NOT for data-derived keys — |domain| must be a compile-time
    property of the operator, not of the data; use the ``bucketed_*``
    helpers there. Same alias conventions and mean/null semantics as
    :func:`grouped_aggregate`; null keys group together
    (``dropna=False``). Returns a pandas DataFrame with columns
    (keys, sums, means, mins, maxs, count)."""
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
                + [(c, "count") for c in mean_cols]
                + [(c, "min") for c in min_cols]
                + [(c, "max") for c in max_cols])
        if need_count:
            aggs.append(([], "count_all"))
        return t.group_by(keys).aggregate(aggs)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    # Bounded by contract: n_blocks × |domain| one-row-per-key partials.
    import ray

    blocks = nonempty_arrow_blocks(partials)
    if not blocks:
        tab = _partial(_empty_arrow_table(ds))
    else:
        tab = pa.concat_tables(blocks, promote_options="permissive")
    g = _bucket_frame(tab, keys)

    # Same split-plan fold as grouped_aggregate._fold: dict-form
    # .agg(plan) cannot pass min_count=1, so an all-null group's sum
    # would silently fold to 0.0 instead of NaN (≠ SQL NULL /
    # ray.data.aggregate.Sum / grouped_aggregate).
    sum_part_cols = ([f"{c}_sum" for c in sum_cols]
                     + [f"{c}_count" for c in mean_cols]
                     + (["count_all"] if need_count else []))
    min_part_cols = [f"{c}_min" for c in min_cols]
    max_part_cols = [f"{c}_max" for c in max_cols]
    gb = g.groupby(keys, sort=False, dropna=False)
    parts = []
    if sum_part_cols:
        parts.append(gb[sum_part_cols].sum(min_count=1))
    if min_part_cols:
        parts.append(gb[min_part_cols].min())
    if max_part_cols:
        parts.append(gb[max_part_cols].max())
    agg = pd.concat(parts, axis=1).reset_index()

    out = {k: agg[k] for k in keys}
    for a, c in sums.items():
        out[a] = agg[f"{c}_sum"]
    for a, c in means.items():
        out[a] = agg[f"{c}_sum"] / agg[f"{c}_count"]
    for a, c in mins.items():
        out[a] = agg[f"{c}_min"]
    for a, c in maxs.items():
        out[a] = agg[f"{c}_max"]
    if count is not None:
        out[count] = agg["count_all"].astype(np.int64)
    return pd.DataFrame(out)


def pivot_counts(ds, keys: Sequence[str], pivot_col: str,
                 values: Sequence, value_col: Optional[str] = None,
                 num_buckets: Optional[int] = None):
    """Pivot a bounded categorical column into wide per-key columns
    (SQL: ``COUNT(*) FILTER (WHERE pivot = v)`` / ``SUM(CASE WHEN pivot
    = v THEN value ELSE 0 END)`` per ``v``): for each key, one
    ``n_{v}`` count column per pivot value, plus ``sum_{v}`` when
    ``value_col`` is given. Rows whose pivot value is outside
    ``values`` count toward no column (SQL FILTER semantics).

    ``values`` must be the bounded IN-list the caller pivots on (like
    SQL PIVOT's IN clause) — the output schema is static, never
    data-dependent, so the plan stays streaming.

    Scale: per-block Arrow indicator partials (one C++ hash aggregate
    per block — at most one partial row per key per block crosses the
    exchange) → bucketed vectorized fold; keys may be unbounded.
    Null semantics match SQL: ``sum_{v}`` is NULL only when every
    matching row's value is NULL (min_count=1 fold over skip-null
    Arrow partials); counts are never NULL.
    """
    import pyarrow.compute as pc

    keys = list(keys)
    values = list(values)
    n_cols = [f"n_{v}" for v in values]
    s_cols = [f"sum_{v}" for v in values] if value_col else []

    def _partial(t: pa.Table) -> pa.Table:
        pv = t[pivot_col]
        cols = {k: t[k] for k in keys}
        for v, nc in zip(values, n_cols):
            m = pc.fill_null(pc.equal(pv, v), False)
            cols[nc] = pc.cast(m, pa.int64())
            if value_col:
                # NULL where (matched AND value NULL) — Arrow's sum and
                # the pandas min_count=1 fold both skip it, matching
                # SQL SUM(CASE WHEN m THEN value ELSE 0 END).
                cols[f"sum_{v}"] = pc.if_else(
                    m, t[value_col], pa.scalar(0.0, pa.float64()))
        tt = pa.table(cols)
        out = tt.group_by(keys).aggregate(
            [(c, "sum") for c in n_cols + s_cols])
        return out.rename_columns(keys + n_cols + s_cols)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    return bucketed_sum(partials, keys,
                        {c: c for c in n_cols + s_cols}, num_buckets)


def group_standardize(ds, keys: Sequence[str], value_col: str,
                      z_col: str = "z", mean_col: str = "grp_mean",
                      std_col: str = "grp_std"):
    """Per-group z-score standardization: every row gains its group's
    mean / population-std of ``value_col`` and ``z = (value - mean) /
    std`` (SQL: ``(v - AVG(v) OVER (PARTITION BY keys)) / STDDEV_POP(v)
    OVER (...)``) — the per-group feature scaling / outlier-scoring
    step of a training-data pipeline (quality filtering per language
    or per source).

    Two streaming passes, no window shuffle: (1) per-key (n, Σv, Σv²)
    via Arrow per-block partials + bucketed fold (keys unbounded);
    (2) the derived (mean, std) table — one row per DISTINCT key —
    joins back through :func:`hash_join_auto` (size-gated broadcast;
    hash-partitioned fallback past 64 MB of distinct keys).

    Variance uses the textbook Σv²/n − mean² form — document the SQL
    oracle the same way (``SQRT(GREATEST(s2/n - m*m, 0))``) rather
    than STDDEV_POP, whose Welford accumulation differs in final ulps.

    SQL-matching edge rules: rows with a NULL key or a NULL value are
    dropped (inner join on the key + division needs v), as are
    CONSTANT groups (std = 0 — SQL raises/infs on the division;
    filtering keeps both sides total). Population std (ddof=0).
    """
    import pyarrow.compute as pc

    from buteo_ray.stages.join_partitioned import hash_join_auto

    keys = list(keys)
    GK = "__gkey"

    def _add_gkey(t: pa.Table) -> pa.Table:
        # Composite key: US-delimited string concat. Nulls propagate
        # (emit_null) → null gkey → filtered, mirroring SQL's
        # NULL-never-joins rule.
        parts = [pc.cast(t[k], pa.string()) for k in keys]
        gk = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "\x1f",
                                        null_handling="emit_null")
        t = t.append_column(GK, gk)
        return t.filter(pc.and_(pc.is_valid(gk),
                                pc.is_valid(t[value_col])))

    keyed = ds.map_batches(_add_gkey, batch_format="pyarrow",
                           batch_size=None)

    def _partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        tt = pa.table({GK: t[GK], "__v": v,
                       "__vv": pc.multiply(v, v)})
        out = tt.group_by([GK]).aggregate(
            [("__v", "count"), ("__v", "sum"), ("__vv", "sum")])
        return out.rename_columns([GK, "__n", "__s1", "__s2"])

    folded = bucketed_sum(keyed.map_batches(_partial,
                                            batch_format="pyarrow",
                                            batch_size=None),
                          [GK], {"__n": "__n", "__s1": "__s1",
                                 "__s2": "__s2"})

    def _stats(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["__s1"].to_numpy(zero_copy_only=False)
        s2 = t["__s2"].to_numpy(zero_copy_only=False)
        m = s1 / n
        sd = np.sqrt(np.maximum(s2 / n - m * m, 0.0))
        out = pa.table({GK: t[GK], mean_col: m, std_col: sd})
        return out.filter(pc.greater(out[std_col], 0.0))

    stats = folded.map_batches(_stats, batch_format="pyarrow",
                               batch_size=None)

    joined = hash_join_auto(keyed, stats, GK, GK)

    def _z(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        z = pc.divide(pc.subtract(v, t[mean_col]), t[std_col])
        return t.append_column(z_col, z).drop_columns([GK])

    return joined.map_batches(_z, batch_format="pyarrow",
                              batch_size=None)


def collect_ordered(ds, key_col: str, order_cols: Sequence[str],
                    value_col: str, sep: str = ">",
                    alias: str = "path", count_alias: str = "n_items",
                    num_buckets: Optional[int] = None):
    """Ordered list-collect per key, emitted as a joined string (SQL:
    ``STRING_AGG(value, sep ORDER BY order_cols)``) plus the non-null
    item count — the sequence-assembly step of a training-data
    pipeline (per-user event paths, per-conversation turn order).

    NULL values are skipped (SQL STRING_AGG rule); a key whose values
    are ALL null still emits a row with a NULL path and count 0 (SQL
    GROUP BY keeps the group).

    Keys are unbounded: hash-bucketed; inside a bucket one stable sort
    + one pandas groupby-join. The join is inherently O(total output
    chars) per group — there is no vectorized shortcut for string
    concatenation, and each group's cost is its own output size, so
    the bucket stays the unit of parallelism.
    """
    order_cols = list(order_cols)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        grp = g.groupby(key_col, sort=False, dropna=False)[value_col]
        path = grp.agg(lambda s: sep.join(s.dropna().astype(str))
                       if s.notna().any() else None)
        n = grp.count().astype(np.int64)
        return pd.DataFrame({key_col: path.index, alias: path.values,
                             count_alias: n.values})

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def rollup_aggregate(ds, keys: Sequence[str],
                     sums: Optional[Dict[str, str]] = None,
                     count: Optional[str] = None) -> pd.DataFrame:
    """``GROUP BY ROLLUP(keys)`` — finest level plus every prefix
    level, rolled-out key columns NULL, one grand-total row last.

    The finest level runs distributed (:func:`grouped_aggregate`:
    Arrow per-block partials, bucketed fold); every coarser level is
    re-aggregated FROM THE FINEST RESULT, not the raw rows — the
    standard rollup re-aggregation identity (sums and counts are
    re-aggregable; means/medians are not accepted here). The finest
    aggregate is collected to the driver, which is bounded by the
    rollup key domain — rollup keys are enum-like by construction (a
    rollup over an unbounded data-derived key is a different query).

    Float caveat: cascading re-sums add in a different order than a
    raw-row scan; callers needing bit-exact SQL parity roll up
    integer-valued columns (order-independent in float64 below 2^53)
    or round.

    Returns a pandas DataFrame (keys, sums..., count), finest level
    first, then each prefix level, then the grand total.
    """
    sums = dict(sums or {})
    keys = list(keys)
    agg_cols = list(sums) + ([count] if count else [])

    finest_ds = grouped_aggregate(ds, keys, sums=sums, count=count)
    blocks = nonempty_arrow_blocks(finest_ds)
    if not blocks:
        # SQL GROUP BY ROLLUP always emits the () grouping set: one
        # grand-total row (NULL keys, NULL sums, count 0) even over an
        # empty input.
        row = {k: [None] for k in keys}
        row.update({a: [np.nan] for a in sums})
        if count:
            row[count] = np.array([0], dtype=np.int64)
        return pd.DataFrame(row)[keys + agg_cols]
    finest = pa.concat_tables(
        blocks, promote_options="permissive").to_pandas()

    levels = [finest[keys + agg_cols]]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        if kept:
            lv = (cur.groupby(kept, sort=False, dropna=False,
                              as_index=False)[agg_cols].sum(min_count=1))
        else:
            lv = pd.DataFrame({c: [cur[c].sum(min_count=1)]
                               for c in agg_cols})
        for k in keys[i:]:
            lv[k] = None
        levels.append(lv[keys + agg_cols])
        cur = lv
    out = pd.concat(levels, ignore_index=True)
    if count:
        out[count] = out[count].astype(np.int64)
    return out


def robust_group_stats(ds, key: str, col: str, z: float = 3.0):
    """Per-group robust location/scale + outlier count: median, MAD
    (median absolute deviation) and ``n_out = #{|x - med| > z*MAD}`` —
    the robust-scaler sibling of :func:`group_standardize` (mean/std
    z-scores break down under the heavy-tailed value distributions of
    web data; median/MAD have a 50 % breakdown point).

    Scale contract: exact medians need each group's values gathered
    (same contract as the exact per-group median query) — groups must
    be partition-sized. For unbounded groups use an approximate
    quantile instead.

    Returns Dataset[(key, med, mad, n_out:int64)].
    """
    def _f(g: pd.DataFrame) -> pd.DataFrame:
        # NULLs are skipped, matching SQL MEDIAN — without the dropna a
        # single null would poison np.median into NaN for the whole
        # group. An ALL-null group still emits its row (SQL GROUP BY
        # keeps it) with NaN stats and n_out 0.
        x = g[col].dropna().to_numpy(dtype=np.float64)
        if len(x):
            med = float(np.median(x))
            ad = np.abs(x - med)
            mad = float(np.median(ad))
            n_out = np.int64((ad > z * mad).sum())
        else:
            med = mad = float("nan")
            n_out = np.int64(0)
        return pd.DataFrame({key: [g[key].iloc[0]], "med": [med],
                             "mad": [mad], "n_out": [n_out]})

    return ds.groupby(key).map_groups(_f, batch_format="pandas")


def cube_aggregate(ds, keys: Sequence[str],
                   sums: Optional[Dict[str, str]] = None,
                   count: Optional[str] = None) -> pd.DataFrame:
    """``GROUP BY CUBE(keys)`` — every subset of the key set, rolled-out
    columns NULL. Same single-scan shape as :func:`rollup_aggregate`
    (finest level distributed, every coarser grouping set re-aggregated
    from the FINEST RESULT), same bounded-domain contract and float
    caveat; 2^len(keys) grouping sets, so keys stays short by
    construction. Grouping sets emit finest-first, grand total last."""
    import itertools

    sums = dict(sums or {})
    keys = list(keys)
    agg_cols = list(sums) + ([count] if count else [])

    finest_ds = grouped_aggregate(ds, keys, sums=sums, count=count)
    blocks = nonempty_arrow_blocks(finest_ds)
    if not blocks:
        finest = pd.DataFrame(columns=keys + agg_cols)
    else:
        finest = pa.concat_tables(
            blocks, promote_options="permissive").to_pandas()

    levels = []
    for r in range(len(keys), -1, -1):
        for kept in itertools.combinations(keys, r):
            kept = list(kept)
            if len(kept) == len(keys):
                lv = finest[keys + agg_cols].copy()
            elif kept:
                lv = (finest.groupby(kept, sort=False, dropna=False,
                                     as_index=False)[agg_cols]
                      .sum(min_count=1))
            else:
                # the () set always exists — one grand-total row, even
                # over an empty input (count 0, NULL sums).
                lv = pd.DataFrame(
                    {c: [finest[c].sum(min_count=1)
                         if len(finest) else
                         (np.int64(0) if c == count else np.nan)]
                     for c in agg_cols})
            for k in keys:
                if k not in kept:
                    lv[k] = None
            levels.append(lv[keys + agg_cols])
    out = pd.concat(levels, ignore_index=True)
    if count:
        # to_numpy(na_value=0) sidesteps pandas' deprecated
        # object-fillna downcast (FutureWarning since 2.1)
        out[count] = pd.to_numeric(out[count]).to_numpy(
            dtype=np.float64, na_value=0.0).astype(np.int64)
    return out


def group_corr(ds, keys: Sequence[str], x_col: str, y_col: str,
               min_n: int = 2, num_buckets: Optional[int] = None):
    """Per-group Pearson correlation + population covariance of two
    columns (SQL ``CORR(x, y)`` / ``COVAR_POP(x, y)`` per group) — the
    feature-relationship scan of a quality pipeline (does doc length
    track score? does value track payload size per user?).

    One streaming pass: rows with a null in EITHER column are dropped
    (SQL's pairwise rule), then an Arrow per-block hash aggregate
    reduces each block to per-key ``(n, Σx, Σy, Σx², Σy², Σxy)``
    partials and a bucketed fold sums them — keys may be unbounded,
    only six doubles per distinct key cross the exchange, and the sums
    are order-free up to IEEE rounding (oracles round the derived
    floats; see q_corr_by_group).

    Derivation uses the textbook moment forms ``cov = Σxy/n − mx·my``,
    ``var = Σv²/n − m²`` — mirror the SQL oracle the same way, NOT
    DuckDB's CORR/COVAR_POP (Welford accumulation, differs in final
    ulps). Groups with ``n < min_n`` or a zero variance on either side
    are dropped (SQL CORR yields NULL there; filtering keeps both
    sides total — constant groups sum identical doubles exactly, so
    the var==0 test cannot diverge across engines).

    Returns Dataset[(*keys, n:int64, cov_pop:float64, corr:float64)].
    """
    import pyarrow.compute as pc

    keys = list(keys)

    def _partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        tt = pa.table({**{k: t[k] for k in keys}, "__x": x, "__y": y}
                      ).filter(ok)
        x = tt["__x"]
        y = tt["__y"]
        tt = tt.append_column("__xx", pc.multiply(x, x))
        tt = tt.append_column("__yy", pc.multiply(y, y))
        tt = tt.append_column("__xy", pc.multiply(x, y))
        out = tt.group_by(keys).aggregate(
            [("__x", "count"), ("__x", "sum"), ("__y", "sum"),
             ("__xx", "sum"), ("__yy", "sum"), ("__xy", "sum")])
        return out.rename_columns(
            keys + ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    folded = bucketed_sum(
        partials, keys,
        {c: c for c in ("__n", "__sx", "__sy", "__sxx", "__syy",
                        "__sxy")},
        num_buckets)

    def _derive(t: pa.Table) -> pa.Table:
        n_i = t["__n"].to_numpy(zero_copy_only=False)
        n = n_i.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mx = t["__sx"].to_numpy(zero_copy_only=False) / n
            my = t["__sy"].to_numpy(zero_copy_only=False) / n
            cov = t["__sxy"].to_numpy(zero_copy_only=False) / n - mx * my
            vx = t["__sxx"].to_numpy(zero_copy_only=False) / n - mx * mx
            vy = t["__syy"].to_numpy(zero_copy_only=False) / n - my * my
            corr = cov / np.sqrt(vx * vy)
        keep = (n_i >= min_n) & (vx > 0.0) & (vy > 0.0)
        out = pa.table({**{k: t[k] for k in keys},
                        "n": t["__n"],
                        "cov_pop": pa.array(cov, pa.float64()),
                        "corr": pa.array(corr, pa.float64())})
        return out.filter(pa.array(keep))

    return folded.map_batches(_derive, batch_format="pyarrow",
                              batch_size=None)


def cohort_retention(ds, user_col: str, ts_col: str,
                     period_us: int = 7 * 86400 * 10 ** 6,
                     num_buckets: Optional[int] = None):
    """Cohort retention matrix: each user's cohort = the period (week
    by default) of their FIRST event; each cell (cohort, offset) counts
    the distinct users from that cohort active ``offset`` periods later
    plus their raw event count — the standard activity-retention
    rollup, and the shape of any "when did this crawl's documents
    reappear" lineage scan.

    All-integer arithmetic (period id = FLOOR-div of epoch micros —
    uniform bucket widths across the epoch; note DuckDB's integer
    ``//`` TRUNCATES toward zero instead, so an oracle over pre-epoch
    timestamps must spell out floor division — for positive epochs the
    two agree) — zero float risk. Three bounded
    exchanges, each over reduced rows, never raw events:

    1. per-user MIN(period) — Arrow per-block min partials + bucketed
       min-fold (users unbounded);
    2. the (user, cohort) table joins back through
       :func:`~buteo_ray.stages.join_partitioned.hash_join_auto`
       (size-gated broadcast, hash-partitioned past 64 MB);
    3. distinct (cohort, offset, user) via ``bucketed_count``, then the
       cell rollup — ≤ cohorts × offsets rows — via a second bucketed
       fold summing users and events.

    Rows with a null user or null timestamp are dropped (SQL: the join
    and MIN skip them). Returns Dataset[(cohort_week:int64,
    week_offset:int64, n_users:int64, n_events:int64)].
    """
    import pyarrow.compute as pc

    from buteo_ray.stages.join_partitioned import hash_join_auto

    def _week(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[ts_col]))
        t = t.filter(ok)
        # normalize the unit FIRST — a raw int64 cast yields the
        # column's native unit (ns for pandas-born frames, us for the
        # parquet tables), which would scale every period id
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        wk = us // np.int64(period_us)  # numpy // FLOORS (see docstring)
        return pa.table({user_col: t[user_col], "__wk": wk})

    weeks = ds.map_batches(_week, batch_format="pyarrow", batch_size=None)

    def _min_partial(t: pa.Table) -> pa.Table:
        out = t.group_by([user_col]).aggregate([("__wk", "min")])
        return out.rename_columns([user_col, "__cw"])

    def _min_fold(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([user_col], sort=False, dropna=False,
                          as_index=False)["__cw"].min())

    cohorts = bucketed_fold(
        weeks.map_batches(_min_partial, batch_format="pyarrow",
                          batch_size=None),
        [user_col], _min_fold, num_buckets)

    joined = hash_join_auto(weeks, cohorts, user_col, user_col)

    def _offset(t: pa.Table) -> pa.Table:
        off = pc.subtract(t["__wk"], t["__cw"])
        return pa.table({"cohort_week": t["__cw"], "week_offset": off,
                         user_col: t[user_col]})

    cells = joined.map_batches(_offset, batch_format="pyarrow",
                               batch_size=None)
    per_user = bucketed_count(
        cells, ["cohort_week", "week_offset", user_col],
        alias="__ev", num_buckets=num_buckets)

    def _cell_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["cohort_week", "week_offset"], sort=False,
                         dropna=False, as_index=False)
               .agg(n_users=(user_col, "size"), n_events=("__ev", "sum")))
        out["n_users"] = out["n_users"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return bucketed_fold(per_user, ["cohort_week", "week_offset"],
                         _cell_fold, num_buckets)


def group_entropy(ds, key_col: str, cat_col: str,
                  num_buckets: Optional[int] = None):
    """Per-key Shannon entropy (nats) and Herfindahl concentration of a
    categorical column's distribution — the diversity metrics a
    training-data pipeline tracks per source/domain/user (low entropy =
    one category dominates; HHI is its concentration dual).

    Two-level plan, both bucketed: :func:`bucketed_count` over
    (key, cat) (Arrow per-block partials — raw rows never shuffle;
    only one row per distinct (key, cat) pair crosses the wire) → one
    bucketed fold per key computing N = Σn, p = n/N, entropy = −Σ p·ln p
    and hhi = Σ p² with cythonized groupby transforms (no per-key
    Python).

    Float note: the per-category sum order differs from SQL's — callers
    comparing across engines round to a coarse grid (the query twin
    floors half-up at 8 dp; drift is ~1e-15 on O(1) values).

    Returns Dataset[(key, n:int64, n_cats:int64, entropy, hhi)].
    """

    cnt = bucketed_count(ds, [key_col, cat_col], alias="__n",
                         num_buckets=num_buckets)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        n = g["__n"].to_numpy(dtype=np.float64)
        tot = g.groupby(key_col, sort=False)["__n"].transform("sum")
        p = n / tot.to_numpy(dtype=np.float64)
        terms = pd.DataFrame({key_col: g[key_col],
                              "__pl": p * np.log(p), "__p2": p * p,
                              "__n": g["__n"]})
        out = (terms.groupby(key_col, sort=False, as_index=False)
               .agg(n=("__n", "sum"), n_cats=("__pl", "size"),
                    __pl=("__pl", "sum"), hhi=("__p2", "sum")))
        out["entropy"] = -out.pop("__pl")
        out["n"] = out["n"].astype(np.int64)
        out["n_cats"] = out["n_cats"].astype(np.int64)
        return out[[key_col, "n", "n_cats", "entropy", "hhi"]]

    return bucketed_fold(cnt, [key_col], _fold, num_buckets)


def mode_by_group(ds, key_col: str, value_col: str,
                  mode_alias: str = "mode_val", n_alias: str = "mode_n",
                  num_buckets: Optional[int] = None):
    """Per-key MODE: the most frequent value of ``value_col``, ties
    broken to the SMALLEST value (deterministic — equals SQL's
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY COUNT(*) DESC,
    value ASC)`` = 1). The canonical-label pick of a dedup/cleaning
    pipeline (e.g. the dominant language per domain).

    One shuffle: Arrow per-block (key, value) count partials (raw rows
    never cross the wire — at most one row per distinct pair per
    block), bucketed by KEY, then one vectorized fold per bucket:
    sum the partials, sort (key, n desc, value asc), first row per key.
    NULL values form their own candidate group and lose ties to any
    non-null (pandas ``na_position='last'`` ≡ SQL ASC NULLS LAST).

    Returns Dataset[(key, mode_alias, n_alias:int64)].
    """

    def _partial(t: pa.Table) -> pa.Table:
        out = (t.select([key_col, value_col])
               .group_by([key_col, value_col]).aggregate([([], "count_all")]))
        return out.rename_columns([key_col, value_col, "__pn"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby([key_col, value_col], sort=False, dropna=False,
                         as_index=False)["__pn"].sum())
        agg = agg.sort_values([key_col, "__pn", value_col],
                              ascending=[True, False, True], kind="stable")
        out = agg.drop_duplicates(key_col, keep="first")
        out = out.rename(columns={value_col: mode_alias, "__pn": n_alias})
        out[n_alias] = out[n_alias].astype(np.int64)
        return out[[key_col, mode_alias, n_alias]]

    # protect the VALUE column too — the fold groups on it, and a null
    # in a bucket would float64-degrade int64 values (see bucketed_fold)
    return bucketed_fold(partials, [key_col], _fold, num_buckets,
                         protect=[key_col, value_col])


def group_quantiles_cont(ds, key_col: str, value_col: str,
                         qs: Sequence[float],
                         prefix: str = "q"):
    """Exact per-group CONTINUOUS (interpolated) quantiles — SQL
    ``quantile_cont(value, q)`` per group: h = q·(n−1) over the sorted
    non-null values, linear interpolation v[⌊h⌋] + (h−⌊h⌋)·(v[⌈h⌉] −
    v[⌊h⌋]) (the exact DuckDB/Postgres PERCENTILE_CONT formula, applied
    term-for-term so the doubles agree). Null values are ignored; an
    all-null group yields nulls.

    One ``groupby(key).map_groups`` gather per group — exact
    continuous quantiles of unbounded-domain values need the group in
    one place (median_by_group's plan); for groups too large to
    gather use the histogram-CDF approximate path instead.

    Returns Dataset[(key, {prefix}{q*100:g} for each q)].
    """
    qs = [float(q) for q in qs]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    names = [f"{prefix}{q * 100:g}" for q in qs]

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].dropna().to_numpy(dtype=np.float64))
        n = len(v)
        out = {key_col: [g[key_col].iloc[0]]}
        for q, name in zip(qs, names):
            if n == 0:
                out[name] = [np.nan]
                continue
            h = q * (n - 1)
            f = int(np.floor(h))
            c = min(f + 1, n - 1)
            out[name] = [v[f] + (h - f) * (v[c] - v[f])]
        return pd.DataFrame(out)

    return (ds.select_columns([key_col, value_col])
            .groupby(key_col).map_groups(_q, batch_format="pandas"))
