"""Sketch-based distributed operators: exact heavy hitters behind a
hashed-bucket prefilter, HyperLogLog distinct counts, fixed-bin
approximate group quantiles, and a count-min frequency sketch.

The reference engine's aggregation surface stops at exact per-key
statistics over bounded key domains (its zonal/attribute-table family,
see core_vector/core_vector_attributes.py and the raster zonal paths);
a 100-TB web corpus also needs the sub-linear-memory variants —
frequency mining, cardinality and quantile estimation whose
driver/actor state is a FIXED-SIZE array regardless of key cardinality.
Every operator here keeps the per-row step vectorized (numpy over Arrow
buffers), moves only reduced MERGEABLE state across the exchange (sum
for counters, max for registers — so block layout, retries and
re-splits cannot change the answer), and documents its error direction:
heavy_hitters is exact, CMS never undercounts, Bloom (text.py) never
misses, HLL/quantiles carry symmetric bounded error.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (0 → 64).

    Branch-free bit binary search — no float round-trip (np.log2 is
    wrong in the last ulp near powers of two, which would corrupt rho
    for ~1/2^53 of hashes and, worse, NON-deterministically across
    libm builds)."""
    x = x.astype(np.uint64, copy=True)
    res = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        res[m] += s
        x[m] <<= np.uint64(s)
    res[x == 0] = 64  # only all-zero inputs remain 0 after the smears
    return res


# ------------------------------------------------------------- heavy hitters

def heavy_hitters(ds, col: str, threshold: Optional[int] = None,
                  phi: Optional[float] = None,
                  num_buckets: int = 1 << 14):
    """EXACT frequent items — ``GROUP BY col HAVING COUNT(*) >= t`` —
    without a full-cardinality shuffle of the raw keys.

    Two linear passes over ``ds`` (which is lazy and re-executed, so
    upstream transforms run twice — materialize upstream first if they
    are expensive):

    1. Per-batch ``np.bincount`` of ``hash(col) % B`` → sparse
       ``(bucket, n)`` partials → streamed driver fold into ONE dense
       ``int64[B]`` vector (B = ``num_buckets``; 128 KiB at the
       default). Driver memory is O(B), never O(|distinct keys|).
    2. The hot-bucket mask (bucket total >= t, a B-bit array shipped in
       the task closure) drops rows in cold buckets BEFORE the exact
       per-key count (:func:`~buteo_ray.stages.aggregate.bucketed_count`),
       so the only key-cardinality fold runs over hot-bucket members.

    Correctness: a key with global count >= t lives in a bucket whose
    total >= t, so the prefilter admits false positives but never false
    negatives; the final filter on exact counts removes the false
    positives. Discrimination needs ``t > n_rows / B`` — below that
    every bucket is hot and pass 2 degenerates to a plain exact count
    (still correct, just unpruned).

    ``threshold`` is an absolute count; ``phi`` instead derives
    ``t = ceil(phi * n_rows)`` from the pass-1 totals (no extra scan).
    Returns Dataset[(col, n:int64)] of the exact survivors.
    """
    from buteo_ray.stages.aggregate import _hash_key_column, bucketed_count

    if (threshold is None) == (phi is None):
        raise ValueError("pass exactly one of threshold= / phi=")
    B = int(num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        h = (_hash_key_column(t[col]) % np.uint64(B)).astype(np.int64)
        counts = np.bincount(h, minlength=B)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": nz.astype(np.int64),
                         "n": counts[nz].astype(np.int64)})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    total = np.zeros(B, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        np.add.at(total, b["bucket"].to_numpy(), b["n"].to_numpy())

    if phi is not None:
        import math
        thr = int(math.ceil(phi * float(total.sum())))
    else:
        thr = int(threshold)
    hot = total >= thr  # bool[B] — broadcast via closure (2 KiB/16 KiB)

    def _prefilter(t: pa.Table) -> pa.Table:
        h = (_hash_key_column(t[col]) % np.uint64(B)).astype(np.int64)
        return t.filter(pa.array(hot[h]))

    survivors = ds.select_columns([col]).map_batches(
        _prefilter, batch_format="pyarrow", batch_size=None)
    counts = bucketed_count(survivors, [col], alias="n")

    def _having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], pa.scalar(thr, pa.int64())))

    return counts.map_batches(_having, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------- HyperLogLog

def hll_distinct(ds, keys: Sequence[str], col: str, p: int = 12):
    """Approximate ``COUNT(DISTINCT col)`` per key group via
    HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AOFA 2007).

    Per batch: splitmix64 hash of ``col``; register index = top ``p``
    bits; rho = leading-zero count of the remaining 64-p bits + 1. One
    ``uint8[2^p]`` register row per (group, batch) leaves the map stage
    — NOT one row per value — and registers fold per group by
    elementwise max (a bucketed fold). Max-merge is commutative,
    associative and idempotent, which is what makes the sketch
    cluster-scale: block order, retries and re-splits cannot change the
    answer. Estimate = alpha_m·m²/Σ2^-M with the small-range
    linear-counting correction from the paper. Standard error ≈
    1.04/√(2^p) (~1.6 % at the default p=12; 4 KiB per group per
    in-flight batch).

    Exact twin: ``count_distinct`` (the two-level exact plan). Use this
    one when the (group × distinct-values) product no longer fits an
    exact pairwise dedup — registers are O(groups · 2^p) total.

    Returns Dataset[(keys..., n_distinct_est: float64)].
    """
    from buteo_ray.stages.aggregate import _hash_key_column, bucketed_fold

    if not 4 <= p <= 18:
        raise ValueError(f"p={p} outside the sane 4..18 register range")
    keys = list(keys)
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # m >= 128 constant (p >= 7)
    if p < 7:
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}[p]

    def _partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        h = _hash_key_column(t[col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)).astype(np.uint64)
        rho = np.where(rest == 0, 64 - p + 1, _clz64(rest) + 1).astype(np.uint8)
        # NULL values must not set registers — COUNT(DISTINCT) skips
        # NULLs (the exact twin count_distinct does too). rho=0 never
        # beats a real register, so masking to 0 drops them while the
        # group row itself survives (an all-null group estimates 0 via
        # linear counting, and SQL GROUP BY keeps the group).
        valid = ~pc.is_null(t[col]).to_numpy(zero_copy_only=False)
        rho = np.where(valid, rho, np.uint8(0))
        df = t.select(keys).to_pandas()
        df["__idx"] = idx
        df["__rho"] = rho
        out_keys = {k: [] for k in keys}
        regs = []
        for kv, g in df.groupby(keys, sort=False, dropna=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            r = np.zeros(m, dtype=np.uint8)
            np.maximum.at(r, g["__idx"].to_numpy(), g["__rho"].to_numpy())
            for k, v in zip(keys, kv):
                out_keys[k].append(v)
            regs.append(r)
        out = pd.DataFrame(out_keys)
        out["registers"] = regs
        return out

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # Group loop, not .agg: pandas aggregation rejects array-valued
        # results ("Must produce aggregated value"), and the loop runs
        # once per DISTINCT GROUP in the bucket, not per row — register
        # rows were already reduced to one per (group, batch) upstream.
        out_keys = {k: [] for k in keys}
        ests = []
        for kv, grp in g.groupby(keys, sort=False, dropna=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            regs = np.maximum.reduce(
                [np.asarray(r, dtype=np.uint8)
                 for r in grp["registers"]]).astype(np.float64)
            E = alpha * m * m / np.sum(np.exp2(-regs))
            V = int((regs == 0).sum())
            # Small-range correction: linear counting when E <= 2.5m
            # and some registers are still zero. (64-bit hashes make
            # the original 32-bit large-range correction unnecessary.)
            if E <= 2.5 * m and V > 0:
                E = m * np.log(m / V)
            for k, v in zip(keys, kv):
                out_keys[k].append(v)
            ests.append(float(E))
        out = pd.DataFrame(out_keys)
        out["n_distinct_est"] = np.asarray(ests, dtype=np.float64)
        return out

    return bucketed_fold(partials, keys, _fold)


# ------------------------------------------------- approximate quantiles

def approx_quantile_by_group(ds, keys: Sequence[str], col: str,
                             qs: Sequence[float], num_bins: int = 4096):
    """Per-group approximate quantiles with a DETERMINISTIC error
    bound: two linear passes, no per-group gather — the scale path
    where the exact :func:`~buteo_ray.stages.aggregate.robust_group_stats`
    / exact-median contract (whole group in one task) stops holding.

    Pass 1: per-group min/max (grouped partials + bucketed fold).
    Pass 2: per-group fixed-width histogram over [min, max] — per-batch
    ``np.bincount`` partials keyed by (group, bin), folded by sum.
    Quantile q = lower edge of the first bin where the cumulative count
    reaches ``ceil(q * n)`` (a lower bound of the true quantile_disc),
    so the error is at most one bin width: (max-min)/num_bins, with
    ZERO error when the group's value domain has ≤ num_bins distinct
    equally-spaced values (e.g. integer grades narrower than the bin
    count). NULLs are skipped, SQL-style; an all-null group emits NaN
    quantiles. State: num_bins int64 per (group, in-flight batch) —
    32 KiB at the default — regardless of group size.

    Like ``ds`` being scanned twice, the two passes re-execute upstream
    transforms; materialize upstream first if it is expensive.

    Returns Dataset[(keys..., q_<q>: float64 ...)].
    """
    from buteo_ray.stages.aggregate import (bucketed_fold,
                                            grouped_aggregate,
                                            nonempty_arrow_blocks)

    keys = list(keys)
    qs = [float(q) for q in qs]
    if not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    B = int(num_bins)

    # Pass 1 — per-group [min, max]. Group cardinality of a quantile
    # report is bounded by construction (it IS the report's row count),
    # so a driver-side dict broadcast by closure is safe.
    mm = grouped_aggregate(ds, keys, mins={"__lo": col},
                           maxs={"__hi": col})
    mm_tab = nonempty_arrow_blocks(mm)

    def _norm_key(kv) -> tuple:
        # NaN/None group keys must hash EQUAL between the dict build
        # and the pandas-groupby probe — distinct NaN objects hash by
        # identity, so a null-keyed group would silently miss its
        # bounds and come back all-NaN
        return tuple(
            None if x is None
            or (isinstance(x, float) and np.isnan(x))
            or x is pd.NaT else x
            for x in kv)

    bounds: dict = {}
    for t in mm_tab:
        df = t.to_pandas()
        los = df["__lo"].to_numpy()
        his = df["__hi"].to_numpy()
        kcols = [df[k].to_numpy() for k in keys]
        for i in range(len(df)):
            bounds[_norm_key(c[i] for c in kcols)] = (los[i], his[i])

    def _hist(t: pa.Table) -> pd.DataFrame:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        kdf = t.select(keys).to_pandas()
        out_rows = {k: [] for k in keys}
        h_bins, h_cnts = [], []
        for kv, g in kdf.groupby(keys, sort=False, dropna=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            lo, hi = bounds.get(_norm_key(kv), (np.nan, np.nan))
            x = vals[g.index.to_numpy()]
            x = x[~np.isnan(x)]
            if not len(x) or not np.isfinite(lo) or hi <= lo:
                # single-valued group: everything lands in bin 0
                # (quantile = lo exactly). An all-null slice still
                # emits a ZERO-COUNT marker so the group's row survives
                # to the fold (SQL GROUP BY keeps all-null groups; the
                # fold turns n=0 into NaN quantiles).
                b = np.zeros(len(x), dtype=np.int64)
            else:
                b = np.minimum(((x - lo) / (hi - lo) * B)
                               .astype(np.int64), B - 1)
            cnt = np.bincount(b, minlength=1)
            nz = np.flatnonzero(cnt)
            if not len(nz):
                nz = np.array([0], dtype=np.int64)  # zero-count marker
            for k, v in zip(keys, kv):
                out_rows[k].extend([v] * len(nz))
            h_bins.extend(nz.tolist())
            h_cnts.extend(cnt[nz].tolist())
        out = pd.DataFrame(out_rows)
        out["__bin"] = np.asarray(h_bins, dtype=np.int64)
        out["__cnt"] = np.asarray(h_cnts, dtype=np.int64)
        return out

    partials = ds.map_batches(_hist, batch_format="pyarrow",
                              batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        merged = (g.groupby(keys + ["__bin"], sort=False, dropna=False,
                            as_index=False)["__cnt"].sum())
        out_rows = {k: [] for k in keys}
        qcols: dict = {f"q_{q}": [] for q in qs}
        for kv, grp in merged.groupby(keys, sort=False, dropna=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            grp = grp.sort_values("__bin")
            bins = grp["__bin"].to_numpy()
            cum = grp["__cnt"].to_numpy().cumsum()
            n = int(cum[-1]) if len(cum) else 0
            lo, hi = bounds.get(_norm_key(kv), (np.nan, np.nan))
            width = (hi - lo) / B if (np.isfinite(lo) and hi > lo) else 0.0
            for k, v in zip(keys, kv):
                out_rows[k].append(v)
            for q in qs:
                if n == 0:
                    qcols[f"q_{q}"].append(float("nan"))
                    continue
                # exact-rational rank ⌈q·n⌉ for q with ≤ 12 decimals —
                # float np.ceil(q*n) overshoots at exact boundaries
                # (0.05·20 → 1.0000000000000002 → rank 2), diverging
                # from quantile_disc in precisely the huge-n regime
                # this tier exists for
                q12 = int(round(q * 10 ** 12))
                rank = max(-(-q12 * n // 10 ** 12), 1)
                i = int(np.searchsorted(cum, rank))
                qcols[f"q_{q}"].append(float(lo + bins[i] * width))
        out = pd.DataFrame(out_rows)
        for c, v in qcols.items():
            out[c] = np.asarray(v, dtype=np.float64)
        return out

    return bucketed_fold(partials, keys, _fold)


# ------------------------------------------------------- count-min sketch

def _cms_positions(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) positions: row d probes splitmix64(h + d·golden) % w —
    the same salt family as the Bloom filter, so the d rows are
    pairwise-independent enough in practice."""
    from buteo_ray.stages.dedup import _splitmix64

    out = np.empty((depth, len(h)), dtype=np.int64)
    for d in range(depth):
        salt = np.uint64((d * 0x9E3779B97F4A7C15) % (1 << 64))
        out[d] = (_splitmix64(h + salt) % np.uint64(width)).astype(np.int64)
    return out


def count_min_sketch(ds, col: str, width: int = 1 << 16,
                     depth: int = 4) -> "tuple[np.ndarray, int]":
    """Count-min sketch of ``col`` (Cormode & Muthukrishnan, J.Alg
    2005): a (depth × width) int64 counter grid estimating EVERY key's
    frequency in fixed memory (2 MiB at the defaults), one-sided —
    estimates never undercount, and overshoot ≤ 2n/width with
    probability 1 − 2^-depth.

    Distributed shape mirrors :func:`heavy_hitters` pass 1: per-batch
    sparse (row, pos, cnt) partials (np.bincount per depth row; counter
    grids are SUM-mergeable, so block layout cannot change the result)
    → streamed driver fold into the dense grid. Driver memory is
    O(depth · width), never O(|keys|).

    Returns (sketch grid, total row count n).
    """
    from buteo_ray.stages.aggregate import _hash_key_column

    W, D = int(width), int(depth)

    def _partial(t: pa.Table) -> pa.Table:
        h = _hash_key_column(t[col])
        pos = _cms_positions(h, W, D)
        rows, cols, cnts = [], [], []
        for d in range(D):
            c = np.bincount(pos[d], minlength=0)
            nz = np.flatnonzero(c)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            cols.append(nz)
            cnts.append(c[nz])
        # Batch row count rides in the FIRST row's ``n`` (zeros after),
        # so the driver fold recovers total n with a plain column sum.
        n_col = np.zeros(sum(len(r) for r in rows), dtype=np.int64)
        if len(n_col):
            n_col[0] = len(t)
        return pa.table({"row": np.concatenate(rows),
                         "pos": np.concatenate(cols),
                         "cnt": np.concatenate(cnts),
                         "n": n_col})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    grid = np.zeros((D, W), dtype=np.int64)
    n_total = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        np.add.at(grid, (b["row"].to_numpy(), b["pos"].to_numpy()),
                  b["cnt"].to_numpy())
        n_total += int(b["n"].to_numpy().sum())
    return grid, n_total


def cms_estimate(grid: np.ndarray, values, hash_like=None) -> np.ndarray:
    """Point-frequency estimates for ``values`` (an Arrow array /
    numpy array matching the sketched column's type): min over the
    depth rows — never an undercount."""
    from buteo_ray.stages.aggregate import _hash_key_column

    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) \
        else pa.array(values)
    h = _hash_key_column(arr)
    D, W = grid.shape
    pos = _cms_positions(h, W, D)
    ests = np.stack([grid[d, pos[d]] for d in range(D)])
    return ests.min(axis=0)
