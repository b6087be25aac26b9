"""Sketch-based distributed operators: exact heavy hitters behind a
hashed-bucket prefilter, and HyperLogLog approximate distinct counts.

The reference engine's aggregation surface stops at exact per-key
statistics over bounded key domains (its zonal/attribute-table family,
see core_vector/core_vector_attributes.py and the raster zonal paths);
a 100-TB web corpus also needs the sub-linear-memory variants —
frequency mining and cardinality estimation whose driver/actor state is
a FIXED-SIZE array regardless of key cardinality. Both operators here
keep every per-row step vectorized (numpy over Arrow buffers) and move
only reduced state across the exchange.
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
