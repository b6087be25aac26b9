"""Interval / range join: probe rows matched to every interval that
CONTAINS their timestamp (``lo <= ts < hi``) with NO equi-key — the
pure range join the reference's batch model never needed but a
log/attribution pipeline does (task brief §custom operators; the
reference's closest analog is the bbox extent pre-filter of
``vector/clip.py:63-105`` — a coordinate-range containment test used
to restrict candidates before the exact op — generalized here to 1-D
time with no GDAL layer).

Two tiers, size-gated like every other small-side join in the engine:

* **broadcast** — the interval table is collected once, sorted by
  ``lo``, and shipped via ``ray.put``; each probe batch finds its
  candidate interval range with two ``searchsorted`` calls (valid
  because an interval with ``lo <= ts - max_dur`` must end at or
  before ``ts``) and expands matches fully vectorized.
* **partitioned** — both sides map into fixed-width time cells
  (width = the intervals' max duration, so an interval overlaps at
  most 2 cells); tagged rows co-shuffle by ``hash(cell) % B`` and a
  per-bucket pandas merge applies the exact containment filter.
  Every (probe, interval) pair meets EXACTLY once — the probe row
  lives in a single cell — so no post-join dedup pass is needed.

Null timestamps / null bounds never match (SQL comparison semantics);
they are filtered out on entry in both tiers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Broadcast gate: same order of magnitude as the other small-side
# joins (join.py / dedup.py hot-key gates).
BROADCAST_LIMIT_BYTES = 64 << 20


def _as_ticks(col) -> np.ndarray:
    """Timestamp-or-int column → int64 ticks (timestamps keep their
    own unit; caller guarantees both sides share one unit, which holds
    whenever both derive from the same source column)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _drop_null_rows(t: pa.Table, cols) -> pa.Table:
    mask = None
    for c in cols:
        v = pc.is_valid(t[c])
        mask = v if mask is None else pc.and_(mask, v)
    return t.filter(mask)


def _drop_unmatchable_intervals(t: pa.Table, lo_col: str, hi_col: str) -> pa.Table:
    """Null bounds and inverted/empty intervals (``hi <= lo``) can never
    satisfy ``lo <= ts < hi`` — drop them on entry. Dropping (rather
    than clamping) keeps the broadcast tier's max-duration arithmetic
    non-negative and both tiers byte-identical on malformed input."""
    t = _drop_null_rows(t, [lo_col, hi_col])
    return t.filter(pc.greater(t[hi_col], t[lo_col]))


def _tick_unit(t: pa.DataType):
    """Comparable tick domain of a ts/bound column: the timestamp unit,
    or ``"int"`` for raw integer ticks."""
    if pa.types.is_timestamp(t):
        return t.unit
    return "int"


def _check_units(p_fields, i_fields, ts_col, lo_col, hi_col):
    types = {n: t for n, t in list(p_fields) + list(i_fields)}
    units = {c: _tick_unit(types[c]) for c in (ts_col, lo_col, hi_col)}
    if len(set(units.values())) != 1:
        raise ValueError(
            "range_join: ts/lo/hi columns must share one tick domain "
            f"(timestamp unit or raw int64), got {units} — cast "
            "explicitly upstream; mixed units would produce a silently "
            "empty or wrong join.")


def _empty_joined(probe_ds, interval_ds):
    """Zero-row result carrying the full joined schema (probe fields +
    interval fields) — the empty-interval-side short-circuit of both
    tiers."""
    from buteo_ray.stages.aggregate import arrow_fields

    joined = pa.schema(list(arrow_fields(probe_ds)) +
                       list(arrow_fields(interval_ds)))

    def _empty(t: pa.Table) -> pa.Table:
        return joined.empty_table()

    return probe_ds.map_batches(_empty, batch_format="pyarrow",
                                batch_size=None)


def _expand_candidates(start: np.ndarray, end: np.ndarray):
    """Vectorized expansion of per-probe candidate index ranges
    [start_i, end_i) → (probe_row_idx, candidate_idx) pair arrays."""
    counts = end - start
    total = int(counts.sum())
    probe_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    cum = np.cumsum(counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(cum - counts, counts)
    cand_idx = np.repeat(start, counts) + within
    return probe_idx, cand_idx


def range_join(
    probe_ds,
    interval_ds,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    mode: str = "auto",
    broadcast_limit: int = BROADCAST_LIMIT_BYTES,
    num_buckets: Optional[int] = None,
    cell_width: Optional[int] = None,
):
    """Inner range join: each probe row × every interval row with
    ``lo_col <= ts_col < hi_col``. Column names of the two sides must
    be disjoint (the join introduces no prefixes — rename upstream).

    ``mode``: ``"broadcast"`` | ``"partitioned"`` | ``"auto"`` (pick by
    the interval side's metadata byte estimate — never executes it).

    ``cell_width`` (partitioned tier): time-cell width in ticks. Any
    positive width is CORRECT — intervals replicate into every cell
    they overlap, so a too-small width costs replication factor, not
    wrong pairs. Omitted, it is derived as the intervals' max duration
    (one extra streaming pass over the interval side); pass it when the
    duration bound is statically known to skip that pass.
    """
    from buteo_ray.stages.aggregate import arrow_fields
    from buteo_ray.state.skew import estimate_bytes

    p_fields = list(arrow_fields(probe_ds))
    i_fields = list(arrow_fields(interval_ds))
    shared = {n for n, _ in p_fields} & {n for n, _ in i_fields}
    if shared:
        raise ValueError(
            f"range_join: column names must be disjoint, shared={sorted(shared)}")
    _check_units(p_fields, i_fields, ts_col, lo_col, hi_col)
    if mode == "auto":
        mode = ("broadcast"
                if estimate_bytes(interval_ds) <= broadcast_limit
                else "partitioned")
    if mode == "broadcast":
        return _range_join_broadcast(probe_ds, interval_ds, ts_col, lo_col, hi_col)
    if mode == "partitioned":
        return _range_join_partitioned(
            probe_ds, interval_ds, ts_col, lo_col, hi_col, num_buckets,
            cell_width)
    raise ValueError(f"range_join: unknown mode {mode!r}")


def _range_join_broadcast(probe_ds, interval_ds, ts_col, lo_col, hi_col):
    import ray

    from buteo_ray.stages.aggregate import nonempty_arrow_blocks

    blocks = nonempty_arrow_blocks(interval_ds)
    itab = (pa.concat_tables(blocks, promote_options="default")
            if blocks else None)
    if itab is not None:
        itab = _drop_unmatchable_intervals(itab, lo_col, hi_col)
    if itab is None or itab.num_rows == 0:
        return _empty_joined(probe_ds, interval_ds)
    lo = _as_ticks(itab[lo_col])
    hi = _as_ticks(itab[hi_col])
    order = np.argsort(lo, kind="stable")
    itab = itab.take(pa.array(order))
    lo, hi = lo[order], hi[order]
    max_dur = int((hi - lo).max()) if len(lo) else 0
    ref = ray.put((lo, hi, itab, max_dur))

    def _probe(t: pa.Table) -> pa.Table:
        slo, shi, stab, sdur = ray.get(ref)
        t = _drop_null_rows(t, [ts_col])
        ts = _as_ticks(t[ts_col])
        # Candidates: lo in (ts - max_dur, ts]. Any interval starting at
        # or before ts - max_dur has hi <= lo + max_dur <= ts → no match.
        start = np.searchsorted(slo, ts - sdur, side="right")
        end = np.searchsorted(slo, ts, side="right")
        probe_idx, cand_idx = _expand_candidates(start, end)
        keep = shi[cand_idx] > ts[probe_idx]
        probe_idx, cand_idx = probe_idx[keep], cand_idx[keep]
        left = t.take(pa.array(probe_idx))
        right = stab.take(pa.array(cand_idx))
        out = left
        for name in right.schema.names:
            out = out.append_column(name, right[name])
        return out

    return probe_ds.map_batches(_probe, batch_format="pyarrow",
                                batch_size=None)


def _range_join_partitioned(probe_ds, interval_ds, ts_col, lo_col, hi_col,
                            num_buckets: Optional[int] = None,
                            cell_width: Optional[int] = None):
    from buteo_ray.stages.aggregate import (BUCKET_COL, _bucket_frame,
                                            append_key_bucket, arrow_fields)
    from buteo_ray.state.skew import derive_num_partitions

    if cell_width is None:
        # One streaming pass over the interval side for the cell width
        # (the max duration). Tiny result (one scalar per block → one
        # global max); the interval side executes once more than
        # strictly necessary — pass cell_width when the duration bound
        # is statically known.
        def _dur(t: pa.Table) -> pa.Table:
            t = _drop_unmatchable_intervals(t, lo_col, hi_col)
            if t.num_rows == 0:
                return pa.table({"__dur": pa.array([], type=pa.int64())})
            d = _as_ticks(t[hi_col]) - _as_ticks(t[lo_col])
            return pa.table({"__dur": [int(d.max())]})

        cell_width = interval_ds.map_batches(
            _dur, batch_format="pyarrow", batch_size=None).max("__dur")
    if cell_width is None:  # empty interval side
        return _empty_joined(probe_ds, interval_ds)
    width = max(int(cell_width), 1)
    n_buckets = int(num_buckets or
                    derive_num_partitions(probe_ds, interval_ds))

    p_fields, i_fields = list(arrow_fields(probe_ds)), list(arrow_fields(interval_ds))
    reserved = {"__cell", "__side", BUCKET_COL} & \
        {n for n, _ in p_fields + i_fields}
    if reserved:
        raise ValueError(
            "range_join (partitioned): input columns collide with "
            f"internal routing columns {sorted(reserved)} — rename them "
            "upstream (a silent overwrite would mis-route rows).")
    order = [n for n, _ in p_fields] + [n for n, _ in i_fields]
    types = {n: t for n, t in p_fields + i_fields}

    def _aligned(t: pa.Table, have: set, side: int, cell: np.ndarray) -> pa.Table:
        cols = {"__cell": pa.array(cell),
                "__side": pa.array(np.full(len(cell), side, dtype=np.int8))}
        for n in order:
            if n in have:
                cols[n] = t[n]
            else:
                cols[n] = pa.nulls(len(cell), type=types[n])
        return pa.table(cols)

    p_have = {n for n, _ in p_fields}
    i_have = {n for n, _ in i_fields}

    def _probe_rows(t: pa.Table) -> pa.Table:
        t = _drop_null_rows(t, [ts_col])
        cell = _as_ticks(t[ts_col]) // width
        return _aligned(t, p_have, 0, cell)

    def _interval_rows(t: pa.Table) -> pa.Table:
        # Replicate each interval into every cell it overlaps — at most
        # 2 when width >= max duration (end cell uses hi - 1: the hi
        # bound is exclusive), more when the caller passed a smaller
        # cell_width (still exact, just a higher replication factor).
        t = _drop_unmatchable_intervals(t, lo_col, hi_col)
        lo = _as_ticks(t[lo_col])
        hi = _as_ticks(t[hi_col])
        c0 = lo // width
        c1 = np.maximum((hi - 1) // width, c0)
        row_idx, within = _expand_candidates(
            np.zeros(len(c0), dtype=np.int64), (c1 - c0 + 1))
        cell = c0[row_idx] + within
        return _aligned(t.take(pa.array(row_idx)), i_have, 1, cell)

    both = probe_ds.map_batches(_probe_rows, batch_format="pyarrow",
                                batch_size=None).union(
        interval_ds.map_batches(_interval_rows, batch_format="pyarrow",
                                batch_size=None))

    # The engine-wide routing step (dtype-stable hash, null sentinel) —
    # not a bespoke re-implementation.
    both = append_key_bucket(both, ["__cell"], n_buckets)
    p_cols = [n for n, _ in p_fields]
    i_cols = [n for n, _ in i_fields]

    def _join(gt: pa.Table) -> pd.DataFrame:
        # Split sides in ARROW, before the pandas conversion: dropping
        # the other side's columns first removes every alignment-padding
        # null, so int columns convert to native int64 (a whole-frame
        # conversion would see padded nulls in every side-specific int
        # column and pay nullable-dtype merges). _bucket_frame still
        # guards genuinely null user int columns.
        side = gt["__side"]
        int_cols = [f.name for f in gt.schema
                    if pa.types.is_integer(f.type)]
        left = _bucket_frame(
            gt.filter(pc.equal(side, 0)).select(["__cell", *p_cols]),
            [c for c in int_cols if c == "__cell" or c in p_cols])
        right = _bucket_frame(
            gt.filter(pc.equal(side, 1)).select(["__cell", *i_cols]),
            [c for c in int_cols if c == "__cell" or c in i_cols])
        m = left.merge(right, on="__cell", how="inner")
        if len(m):
            # Series comparisons (not .to_numpy()): nullable Int64 key
            # columns round-trip to OBJECT ndarrays, whose elementwise
            # bool arrays cannot mask. Pandas handles Int64/datetime
            # uniformly and the inner merge guarantees no nulls remain.
            keep = ((m[lo_col] <= m[ts_col]) & (m[ts_col] < m[hi_col]))
            m = m[np.asarray(keep, dtype=bool)]
        return m.drop(columns=["__cell"]).reset_index(drop=True)

    return both.groupby(BUCKET_COL).map_groups(_join, batch_format="pyarrow")
