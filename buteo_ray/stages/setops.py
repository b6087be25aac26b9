"""Distinct set operations over whole rows — SQL ``INTERSECT`` /
``EXCEPT`` (SURVEY.md §2.10 set-ops family, completing the
``union_all`` / ``distinct`` / ``union_by_name`` row; reference analog:
the layer set-combinators around vector merge, core_vector_merge.py).

Plan (one shuffle, pre-shrunk at the map side):
1. per-batch Arrow ``group_by(all_cols)`` distinct — the C++ hash
   aggregate collapses duplicates BEFORE anything moves, so the
   shuffle carries at most one row per (batch, distinct row);
2. tag each side with presence flags, union the two streams;
3. one bucketed fold over ALL columns: ``max`` of the flags per
   distinct row, filter by mode.

NULL semantics are SQL set-op semantics (NULLs compare as NOT
DISTINCT, i.e. equal): the pandas fold groups with ``dropna=False``
and the bucket router sends null and NaN keys to one bucket
(aggregate.py:_hash_key_column), so a NULL row in both inputs appears
in the intersection — matching DuckDB ``INTERSECT``.

At 100 TB: the shuffled volume is the per-block-distinct row set, not
the input — for low-cardinality projections (the common use: column
subsets) that is a tiny fraction of the scan. Pinned bytes: none; the
fold streams bucket-by-bucket.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.stages.aggregate import bucketed_fold

_IN_A = "__setop_in_a"
_IN_B = "__setop_in_b"


def _check_schemas(a_ds, b_ds, fn: str) -> "list[str]":
    from buteo_ray.stages.aggregate import arrow_fields

    fa, fb = arrow_fields(a_ds), arrow_fields(b_ds)
    na, nb = [n for n, _ in fa], [n for n, _ in fb]
    if na != nb:
        raise ValueError(
            f"{fn}: column names/order differ between sides: "
            f"{na} vs {nb} (set ops are positional-by-name here; "
            "project both sides to the same columns first)")
    # Types must match too: mismatched sides would give TIER-dependent
    # results (the driver pandas concat coerces, the distributed hash
    # router keeps int 2 and float 2.0 apart) — fail loud instead.
    ta, tb = [t for _, t in fa], [t for _, t in fb]
    bad = [f"{n}: {x} vs {y}" for n, x, y in zip(na, ta, tb) if x != y]
    if bad:
        raise ValueError(
            f"{fn}: column types differ between sides ({'; '.join(bad)}); "
            "cast both sides to one type first")
    return na


def _tag(flag_a: int, flag_b: int):
    def _fn(t: pa.Table) -> pa.Table:
        # Per-batch distinct: group_by with no aggregates returns the
        # unique key rows (Arrow C++ hash aggregate, vectorized).
        d = t.group_by(t.column_names).aggregate([])
        n = d.num_rows
        d = d.append_column(_IN_A, pa.array(
            np.full(n, flag_a, dtype=np.int8)))
        return d.append_column(_IN_B, pa.array(
            np.full(n, flag_b, dtype=np.int8)))

    return _fn


def _set_op(a_ds, b_ds, keep_b: bool, fn: str,
            num_buckets: Optional[int] = None,
            driver_bytes: int = 64 << 20):
    cols = _check_schemas(a_ds, b_ds, fn)
    tagged = a_ds.map_batches(_tag(1, 0), batch_format="pyarrow",
                              batch_size=None).union(
        b_ds.map_batches(_tag(0, 1), batch_format="pyarrow",
                         batch_size=None))

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(cols, sort=False, dropna=False, as_index=False)
               [[_IN_A, _IN_B]].max())
        in_a = agg[_IN_A].to_numpy() > 0
        in_b = agg[_IN_B].to_numpy() > 0
        mask = in_a & (in_b if keep_b else ~in_b)
        return agg.loc[mask, cols]

    # Size-gated driver tier (compact_cells pattern): when the INPUTS'
    # metadata byte estimate fits under ``driver_bytes`` (an upper
    # bound on the per-block-distinct partials — never executes
    # anything), one in-process pandas fold replaces the bucketed
    # shuffle. Distributed tier above the gate or when sizes are
    # unknown (pytest-forced via driver_bytes=0).
    from buteo_ray.state.skew import estimate_bytes

    est_a, est_b = estimate_bytes(a_ds), estimate_bytes(b_ds)
    if est_a and est_b and est_a + est_b < driver_bytes:
        import ray

        from buteo_ray.stages.aggregate import (_bucket_frame,
                                                nonempty_arrow_blocks)

        # _bucket_frame, not to_pandas: a null-bearing int64 column
        # would convert to float64 and merge distinct keys above 2^53
        # (same guard the distributed tier's fold gets for free).
        tabs = nonempty_arrow_blocks(tagged)
        if not tabs:
            return ray.data.from_pandas(
                pd.DataFrame({c: pd.Series([], dtype=object)
                              for c in cols}))
        pdf = _bucket_frame(pa.concat_tables(tabs), cols)
        return ray.data.from_pandas(_fold(pdf))
    return bucketed_fold(tagged, cols, _fold, num_buckets)


def intersect_distinct(a_ds, b_ds, num_buckets: Optional[int] = None,
                       driver_bytes: int = 64 << 20):
    """SQL ``a INTERSECT b``: distinct rows present in BOTH inputs.
    Both sides must share column names and order (project first).
    Returns Dataset[distinct common rows]."""
    return _set_op(a_ds, b_ds, True, "intersect_distinct", num_buckets,
                   driver_bytes)


def except_distinct(a_ds, b_ds, num_buckets: Optional[int] = None,
                    driver_bytes: int = 64 << 20):
    """SQL ``a EXCEPT b``: distinct rows of ``a`` absent from ``b``.
    Returns Dataset[distinct a-only rows]."""
    return _set_op(a_ds, b_ds, False, "except_distinct", num_buckets,
                   driver_bytes)
