"""Stream-shaped operators over the events log (SURVEY.md §2.12: the
reference is strictly batch, so these are required new capabilities).

Ray Data has no event-time windows; the engine treats the events table
as an ordered, partitioned log: partition by key, sort within partition
inside ``groupby(key).map_groups``, and compute windows/sessions with
vectorized pandas. Ordering assumption: per-key processing sorts by
``ts`` — global order is never required (documented per the guide).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap: pd.Timedelta = pd.Timedelta(minutes=30)):
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap``. Returns the input rows +
    ``session_id`` (key-scoped, 0-based) + ``session_key`` (globally
    unique string)."""

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable").reset_index(drop=True)
        gaps = g[ts_col].diff() > gap
        g["session_id"] = gaps.cumsum().fillna(0).astype(np.int64)
        g["session_key"] = g[key_col].astype(str) + "#" + g["session_id"].astype(str)
        return g

    # User keys are unbounded: route by hash bucket (bounded Ray group
    # count), iterate exact per-key groups inside the bucket.
    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(ds, [key_col], _fn)


def session_stats(ds, key_col: str = "user_id", ts_col: str = "ts",
                  gap: pd.Timedelta = pd.Timedelta(minutes=30)):
    """One row per session: count, start/end, duration seconds."""

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable").reset_index(drop=True)
        sid = (g[ts_col].diff() > gap).cumsum().fillna(0).astype(np.int64)
        out = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            t_start=(ts_col, "min"),
            t_end=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out["session_id"] = np.arange(len(out), dtype=np.int64)
        out["duration_sec"] = (out["t_end"] - out["t_start"]).dt.total_seconds()
        return out

    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(ds, [key_col], _fn)


def tumbling_window(ds, ts_col: str = "ts", window: str = "1h",
                    keys: Optional[list] = None, value_col: str = "value"):
    """Tumbling-window aggregate: window id = epoch // width; grouped
    count/sum per (keys..., window)."""
    def _assign(t: pa.Table) -> pa.Table:
        unit = t.schema.field(ts_col).type.unit  # s | ms | us | ns
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        width = int(pd.Timedelta(window).total_seconds() * per_sec)
        ticks = t[ts_col].cast(pa.int64()).to_numpy()
        return t.append_column("window_id", pa.array(ticks // width))

    group_keys = (keys or []) + ["window_id"]
    assigned = ds.map_batches(_assign, batch_format="pyarrow",
                              batch_size=None)

    # (key, window) cardinality grows with log length — unbounded:
    # Arrow per-block partials, then a bucketed vectorized fold.
    def _partial(t: pa.Table) -> pa.Table:
        out = (t.select(group_keys + [value_col]).group_by(group_keys)
               .aggregate([([], "count_all"), (value_col, "sum")]))
        return out.rename_columns(group_keys + ["__n", "__s"])

    partials = assigned.map_batches(_partial, batch_format="pyarrow",
                                    batch_size=None)

    from buteo_ray.stages.aggregate import bucketed_sum

    return bucketed_sum(partials, group_keys,
                        {"n_events": "__n", "sum_value": "__s"})


def sliding_window_counts(ds, ts_col: str = "ts", window: str = "1h",
                          slide: str = "30min", keys: Optional[list] = None):
    """Sliding windows via flat_map into the ⌈window/slide⌉ overlapping
    window ids each event belongs to, then a tumbling groupby."""
    def _explode(t: pa.Table) -> pa.Table:
        unit = t.schema.field(ts_col).type.unit
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        width_t = int(pd.Timedelta(window).total_seconds() * per_sec)
        slide_t = int(pd.Timedelta(slide).total_seconds() * per_sec)
        n_overlap = (width_t + slide_t - 1) // slide_t
        ticks = t[ts_col].cast(pa.int64()).to_numpy()
        base = ticks // slide_t
        cols = {c: [] for c in (keys or [])}
        win = []
        for k in range(n_overlap):
            wid = base - k
            keep = (wid * slide_t + width_t) > ticks
            win.append(wid[keep])
            for c in keys or []:
                cols[c].append(t[c].to_numpy(zero_copy_only=False)[keep])
        out = {"window_start": np.concatenate(win) * slide_t}
        for c in keys or []:
            out[c] = np.concatenate(cols[c])
        return pa.table(out)

    from buteo_ray.stages.aggregate import bucketed_count

    group_keys = (keys or []) + ["window_start"]
    exploded = ds.map_batches(_explode, batch_format="pyarrow",
                              batch_size=None)
    return bucketed_count(exploded, group_keys, alias="n_events")


def rolling_window(ds, key_col: str = "user_id", order_cols=("ts",),
                   value_col: str = "value", preceding: int = 3,
                   round4: bool = False):
    """Per-key rolling ROW-window aggregate: for every row, mean / sum /
    non-null count of ``value_col`` over the ``preceding`` rows before
    it plus itself, within its key partition ordered by ``order_cols``
    (SQL: ``... OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    preceding PRECEDING AND CURRENT ROW)``). Deterministic iff
    ``order_cols`` is a total order within each key — pass a unique
    tiebreaker column (e.g. the event id) after the timestamp.

    Output: the input rows + ``roll_mean`` / ``roll_sum`` / ``roll_n``.
    ``round4=True`` applies the engine-wide FLOOR half-up 4-dp rounding
    to mean/sum (use when comparing against a SQL window oracle — the
    two sides accumulate the window sum in different orders).

    Keys are unbounded: routed by hash bucket (one pandas
    ``groupby.rolling`` per ≈64 MB bucket), never one Ray group per key.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    order_cols = list(order_cols)
    win = int(preceding) + 1

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols],
                          kind="stable").reset_index(drop=True)
        r = g.groupby(key_col, sort=False, dropna=False)[value_col] \
            .rolling(window=win, min_periods=1)
        # One window scan for all three stats; droplevel(0) restores the
        # pre-group row index → index alignment back onto g is exact
        # regardless of group order.
        agg = r.agg(["mean", "sum", "count"]).droplevel(0).sort_index()
        mean, total = agg["mean"], agg["sum"]
        if round4:
            mean = np.floor(mean * 10000.0 + 0.5) / 10000.0
            total = np.floor(total * 10000.0 + 0.5) / 10000.0
        g["roll_mean"] = mean
        g["roll_sum"] = total
        g["roll_n"] = agg["count"].astype(np.int64)
        return g

    return bucketed_fold(ds, [key_col], _fold)


def asof_join(left_ds, right_ds, key_col: str = "user_id", ts_col: str = "ts",
              right_cols: Optional[list] = None):
    """As-of join: each left row matched to the latest right row with
    ``right.ts <= left.ts`` per key (the guide's range-join pattern:
    co-partition via tagged union, ``pd.merge_asof`` per partition).
    Left rows with no prior right row are dropped (inner asof).

    Partitioning: groups by ``hash(key) % B`` — NOT by the raw key — so
    one vectorized ``merge_asof(by=key)`` handles every key in a bucket
    (per-raw-key map_groups paid one pandas call per key: 3.2 → ~1.4 s
    on 1M events). B is size-derived, keeping buckets ≈64 MB at any
    scale; the by= engine inside merge_asof is a single C pass."""
    from buteo_ray.stages.aggregate import arrow_fields
    from buteo_ray.state.skew import derive_num_partitions

    n_buckets = derive_num_partitions(left_ds, right_ds)

    # Heterogeneous sides (the canonical trades-vs-quotes shape) must be
    # schema-ALIGNED before the union: Ray's sort/groupby does not unify
    # block schemas, so a side-only column would vanish from some group
    # frames. Each side gains null-typed columns for the other side's
    # extras and shared-name columns are CAST to the left side's type
    # (e.g. timestamp[us] quotes vs timestamp[ns] trades); both emit one
    # canonical column order. The right-only padding added to left rows
    # is stripped again inside the join kernel (drop_from_left), so the
    # output schema stays 'left columns + right_{col} + right_ts'.
    # NOTE: reading the schemas of LAZY map-derived inputs makes Ray
    # probe one block at plan time — materialize (or use
    # asof_join_tagged) if the upstream contains an expensive shuffle.
    lf, rf = dict(arrow_fields(left_ds)), dict(arrow_fields(right_ds))
    order = list(lf) + [n for n in rf if n not in lf]
    union_fields = {**rf, **lf}  # left's type wins on shared names

    def _tag(side, have):
        def _fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n in order:
                if n not in have:
                    cols[n] = pa.nulls(t.num_rows, type=union_fields[n])
                else:
                    c = t[n]
                    if c.type != union_fields[n]:
                        c = c.cast(union_fields[n])
                    cols[n] = c
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            return pa.table(cols)

        return _fn

    both = left_ds.map_batches(_tag(0, lf), batch_format="pyarrow",
                               batch_size=None).union(
        right_ds.map_batches(_tag(1, rf), batch_format="pyarrow",
                             batch_size=None))
    return asof_join_tagged(both, key_col=key_col, ts_col=ts_col,
                            right_cols=right_cols, n_buckets=n_buckets,
                            drop_from_left={n for n in rf if n not in lf})


def asof_join_tagged(both, key_col: str = "user_id", ts_col: str = "ts",
                     right_cols: Optional[list] = None,
                     n_buckets: Optional[int] = None,
                     drop_from_left: Optional[set] = None):
    """As-of join over a PRE-TAGGED dataset: ``both`` carries an int8
    ``__side`` column (0 = left/probe, 1 = right/reference). Use this
    form when both sides derive from ONE source (e.g. an event log split
    by event_type) — :func:`asof_join`'s two-Dataset union would execute
    the upstream read twice; tagging in a single ``map_batches`` pass
    reads it once.

    ``drop_from_left``: columns stripped from LEFT rows before the merge
    — :func:`asof_join` passes its schema-alignment padding (right-only
    columns null-filled onto left rows) so they never leak into the
    output, which stays 'left columns + right_{col} + right_ts'."""
    from buteo_ray.state.skew import derive_num_partitions

    if n_buckets is None:
        n_buckets = derive_num_partitions(both)

    def _bucket(t: pa.Table) -> pa.Table:
        # Dtype-stable key hash (aggregate._hash_key_column): a numpy
        # detour via to_numpy() turns an int key column float64 when
        # the block contains a null, splitting the same key across
        # buckets depending on its block neighbors.
        from buteo_ray.stages.aggregate import _hash_key_column

        b = _hash_key_column(t[key_col]) % np.uint64(n_buckets)
        return t.append_column("__bucket", pa.array(b.astype(np.int64)))

    both = both.map_batches(_bucket, batch_format="pyarrow", batch_size=None)

    rcols = right_cols or []
    pad_left = sorted(drop_from_left or ())

    def _join(gt: pa.Table) -> pd.DataFrame:
        # One code path for every bucket — merge_asof handles empty sides
        # and the group frame carries the true dtypes, so all emitted
        # blocks share one schema (a hand-built placeholder would guess
        # dtypes/column order and break Arrow block unification).
        # Pyarrow group format + _int_exact_frame: the default pandas
        # conversion turns an int64 column with nulls (e.g. alignment
        # padding on the other side's rows) into float64, silently
        # rounding 64-bit ids above 2^53; nullable IntegerArrays keep
        # the exact payload through the merge.
        from buteo_ray.stages.aggregate import _bucket_frame

        int_cols = [f.name for f in gt.schema
                    if pa.types.is_integer(f.type)]
        g = _bucket_frame(gt, int_cols)
        drop = ["__side", "__bucket"]
        left = g[g["__side"] == 0].drop(columns=drop + pad_left) \
            .sort_values(ts_col, kind="stable")
        right = g[g["__side"] == 1].drop(columns=drop)
        right2 = right[[key_col, ts_col] + rcols].rename(
            columns={c: f"right_{c}" for c in rcols})
        # Deterministic tie-break for duplicate RIGHT timestamps per key:
        # per-column MAX over (key, ts) — EXACTLY the oracle's GROUP BY +
        # MAX (pandas merge_asof and DuckDB ASOF JOIN each pick an
        # arbitrary row among equal-ts matches). Per-column, not
        # row-tuple: with two value columns and rows (3, NULL)/(NULL, 5)
        # SQL MAX yields (3, 5), which no single kept row contains.
        # groupby().max() skips NaN per column like SQL MAX; an all-null
        # column stays null. Left rows are NOT deduplicated — every left
        # event emits its own match.
        if len(right2):
            right2 = right2.groupby([key_col, ts_col], as_index=False,
                                    sort=False).max()
        right2["right_ts"] = right2[ts_col]
        merged = pd.merge_asof(left, right2.sort_values(ts_col, kind="stable"),
                               on=ts_col, by=key_col, direction="backward")
        # merge_asof keeps unmatched lefts with NaT; inner semantics drop them.
        return merged.dropna(subset=["right_ts"])

    # __side/__bucket are dropped inside _join; output schema is
    # left columns + right_{col} + right_ts.
    return both.groupby("__bucket").map_groups(_join, batch_format="pyarrow")


def window_shift(ds, key_col: str = "user_id", order_cols=("ts",),
                 value_col: str = "value", lag: int = 1, lead: int = 1,
                 default: float = -1.0):
    """Per-key ordered LAG / LEAD / ROW_NUMBER (SQL: ``LAG(value, lag,
    default) OVER (PARTITION BY key ORDER BY order_cols)`` etc.) — the
    row-navigation window functions the reference's strictly-batch
    engine has no analog for (SURVEY.md §2.12 family).

    Output: the input rows + ``row_num`` (1-based within key),
    ``lag_value`` / ``lead_value`` (``default`` where no such row —
    a non-null default keeps the output schema null-free so oracle
    comparison never hits the pandas-NaN vs SQL-NULL mismatch), and
    ``delta`` = value - lag_value (``default`` on the first row of a
    key). ``delta`` is ONE IEEE subtraction of two untouched input
    doubles, so it is bit-identical across engines — no rounding
    needed.

    Deterministic iff ``order_cols`` is a total order within each key
    (pass a unique tiebreaker, e.g. the event id). Keys are unbounded:
    routed by hash bucket (one vectorized pandas groupby-shift per
    ≈64 MB bucket), never one Ray group per key.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    order_cols = list(order_cols)
    lag, lead = int(lag), int(lead)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols],
                          kind="stable").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False, dropna=False)
        g["row_num"] = grp.cumcount() + 1
        v = grp[value_col]
        lag_v = v.shift(lag)
        g["lag_value"] = lag_v.fillna(default)
        g["lead_value"] = v.shift(-lead).fillna(default)
        # delta from the UNFILLED lag: a first-of-key row gets the
        # default, not value - default.
        g["delta"] = (g[value_col] - lag_v).fillna(default)
        return g

    return bucketed_fold(ds, [key_col], _fold)


def transition_counts(ds, key_col: str, order_cols: list,
                      value_col: str, src: str = "src",
                      dst: str = "dst", alias: str = "n",
                      num_buckets: Optional[int] = None):
    """First-order transition matrix over per-key ordered sequences:
    count every adjacent ``(value, next value)`` pair within a key —
    SQL ``LEAD(value) OVER (PARTITION BY key ORDER BY ...)`` then
    ``GROUP BY value, next``. The Markov-chain summary of an event log
    (page-flow mining, crawler state transitions, session path stats).

    One bucketed pass builds per-bucket pair partials (stable sort +
    vectorized groupby-shift — no per-key Python), then a second
    bucketed fold sums partials per (src, dst); pair cardinality may be
    unbounded, only reduced counts cross the second exchange. The last
    row of each key has no successor and is dropped (SQL: ``WHERE next
    IS NOT NULL``); a null value mid-sequence drops the pair it ends
    (its dst is null) but still starts the next pair as a null src —
    matching the window-SQL rule exactly. ``order_cols`` must totally
    order each key. Returns Dataset[(src, dst, alias:int64)].
    """
    from buteo_ray.stages.aggregate import bucketed_fold, bucketed_sum

    order_cols = list(order_cols)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, *order_cols], kind="stable")
             .reset_index(drop=True))
        grp = g.groupby(key_col, sort=False, dropna=False)
        nxt = grp[value_col].shift(-1)
        keep = nxt.notna().to_numpy()
        p = pd.DataFrame({src: g[value_col].to_numpy()[keep],
                          dst: nxt.to_numpy()[keep]})
        out = (p.groupby([src, dst], sort=False, dropna=False)
               .size().reset_index(name="__pn"))
        if len(out) == 0 and out[src].dtype == object:
            # An all-singleton bucket emits zero pairs; empty OBJECT
            # columns type as Arrow null and cannot union with the
            # string blocks other buckets emit — pin them to string
            # (object value columns are strings engine-wide).
            out = out.astype({src: "string", dst: "string"})
        return out

    partials = bucketed_fold(ds, [key_col], _pairs, num_buckets)
    return bucketed_sum(partials, [src, dst], {alias: "__pn"},
                        num_buckets)


def rank_stats(ds, key_col: str, value_col: str,
               rank_col: str = "rnk", dense_col: str = "drnk",
               pct_col: str = "prnk", cume_col: Optional[str] = None,
               num_buckets: Optional[int] = None):
    """Per-key value ranking with full tie semantics — SQL ``RANK() /
    DENSE_RANK() / PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    value)`` — the per-group leaderboard/percentile labeling step.

    Exact SQL tie rules: RANK = 1 + strictly-smaller row count (peers
    share, gaps after), DENSE_RANK = distinct-value index, PERCENT_RANK
    = (rank − 1) / (n − 1) with 0.0 for single-row keys — one integer
    subtraction and one IEEE division of exact ints, bit-identical
    across engines. NULL values rank LAST as one peer group (SQL's
    default NULLS LAST), via pandas ``na_option='bottom'``.

    Keys unbounded → one hash-bucketed fold, two vectorized
    ``groupby.rank`` passes per bucket (no per-key Python). Returns the
    input rows + the three rank columns (rank/dense int64, pct
    float64).
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(key_col, sort=False, dropna=False)
        rnk = grp[value_col].rank(method="min", na_option="bottom")
        drnk = grp[value_col].rank(method="dense", na_option="bottom")
        n = grp[key_col].transform("size").to_numpy().astype(np.int64)
        r = rnk.to_numpy().astype(np.int64)
        with np.errstate(invalid="ignore"):
            pct = np.where(n > 1, (r - 1) / np.maximum(n - 1, 1), 0.0)
        g = g.copy()
        g[rank_col] = r
        g[dense_col] = drnk.to_numpy().astype(np.int64)
        g[pct_col] = pct
        if cume_col is not None:
            # CUME_DIST = |peers with value ≤ current| / n — the max-
            # method rank over n; null peer group reaches 1.0 (SQL:
            # nulls are peers too under NULLS LAST)
            rmax = (grp[value_col].rank(method="max",
                                        na_option="bottom")
                    .to_numpy().astype(np.int64))
            g[cume_col] = rmax / n
        return g

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def running_total(ds, key_col: str, order_cols: list, value_col: str,
                  sum_col: str = "run_sum", n_col: str = "run_n",
                  num_buckets: Optional[int] = None):
    """Per-key running totals over an ordered stream — SQL ``SUM(v)
    OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    plus the running non-null count — the cumulative-exposure /
    budget-burn-down scan.

    SQL null rules: a null value leaves the running sum unchanged and
    the rows BEFORE a key's first non-null value carry a NULL sum (not
    0). The running count is exact int64. The float sum is a prefix
    sum — both engines add sequentially in window order, but segment-
    tree re-association inside SQL engines is allowed, so oracles
    round the float (see q_running_total). ``order_cols`` must totally
    order each key. Keys unbounded → one hash-bucketed fold, one
    stable sort + vectorized ``groupby.cumsum`` per bucket.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    order_cols = list(order_cols)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, *order_cols], kind="stable")
             .reset_index(drop=True))
        v = g[value_col]
        cs = v.fillna(0.0).groupby(g[key_col], sort=False,
                                   dropna=False).cumsum()
        seen = v.notna().groupby(g[key_col], sort=False,
                                 dropna=False).cumsum()
        g = g.copy()
        g[sum_col] = cs.where(seen > 0, other=np.nan)
        g[n_col] = seen.to_numpy().astype(np.int64)
        return g

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def interval_cover(ds, key_col: str, lo_col: str, hi_col: str,
                   num_buckets: Optional[int] = None):
    """Per-key interval-union statistics (gaps-and-islands): merge
    overlapping-or-touching ``[lo, hi]`` intervals within each key and
    return one row per key with ``n_intervals`` (input rows),
    ``n_merged`` (islands after union) and ``covered`` (Σ island
    lengths) — the coverage/occupancy scan (sessions-on-air, crawl
    visit coverage, sensor uptime).

    Merge rule: sorted by (lo, hi), an interval starts a NEW island iff
    its ``lo`` is strictly greater than the running max ``hi`` of all
    earlier intervals (touching endpoints merge) — the exact semantics
    of the classic SQL window form ``lo > MAX(hi) OVER (... ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    ``lo``/``hi`` should be integer-like (e.g. epoch micros) so the
    covered sum is exact. Keys unbounded → hash-bucketed fold, one
    stable sort + vectorized cummax per bucket, no per-key Python.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, lo_col, hi_col], kind="stable")
             .reset_index(drop=True))
        lo = g[lo_col].to_numpy()
        hi = g[hi_col].to_numpy()
        key = g[key_col]
        karr = key.to_numpy()
        # Running max hi of STRICTLY EARLIER rows within each key —
        # cythonized groupby transforms (cummax + shift), no per-key
        # Python.
        cm = pd.Series(hi).groupby(karr, sort=False).cummax()
        prev_max = cm.groupby(karr, sort=False).shift().to_numpy()
        first = key.ne(key.shift()).to_numpy()
        brk = first | (lo > prev_max)
        island = np.cumsum(brk) - 1  # global island id across the bucket
        isl = pd.DataFrame({key_col: key.to_numpy(), "__i": island,
                            "__lo": lo, "__hi": hi})
        merged = (isl.groupby("__i", sort=False)
                  .agg(**{key_col: (key_col, "first"),
                          "__lo": ("__lo", "min"),
                          "__hi": ("__hi", "max")}))
        out = (merged.assign(__len=merged["__hi"] - merged["__lo"])
               .groupby(key_col, sort=False, as_index=False)
               .agg(n_merged=("__len", "size"), covered=("__len", "sum")))
        n_in = (g.groupby(key_col, sort=False, as_index=False)
                .size().rename(columns={"size": "n_intervals"}))
        out = n_in.merge(out, on=key_col)
        out["n_merged"] = out["n_merged"].astype(np.int64)
        out["n_intervals"] = out["n_intervals"].astype(np.int64)
        return out

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def densify_days(ds, key_col: str, ts_col: str = "ts",
                 count_col: str = "n_events",
                 num_buckets: Optional[int] = None):
    """Per-key daily gap-fill: one row per (key, day) for EVERY day
    between the key's first and last event day, with the event count
    (0 for gap days) — the dense time-series features a per-entity
    model trains on.

    Plan: per-block Arrow partial counts on (key, epoch-day) → one
    hash-bucketed fold that emits each key's full ``arange(min_day,
    max_day + 1)`` with zeros scattered in (vectorized; no per-day
    Python). Output size = Σ per-key day spans — bounded by key count
    × calendar span, NOT by event count; the pre-aggregation means the
    fold never sees raw events.

    Returns Dataset[(key, day:int64 epoch days, count_col:int64)].
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    def _partial(t: pa.Table) -> pa.Table:
        unit = t.schema.field(ts_col).type.unit
        per_day = {"s": 86400, "ms": 86400 * 10**3,
                   "us": 86400 * 10**6, "ns": 86400 * 10**9}[unit]
        ticks = t[ts_col].cast(pa.int64()).to_numpy()
        # Floor division keeps pre-epoch timestamps on the correct day.
        day = ticks // per_day
        part = pa.table({key_col: t[key_col], "day": day})
        out = part.group_by([key_col, "day"]).aggregate([([], "count_all")])
        return out.rename_columns([key_col, "day", "__pn"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # Fold partial counts, then densify each key's span with one
        # vectorized scatter over the concatenated per-key aranges.
        cnt = (g.groupby([key_col, "day"], sort=False, as_index=False)
               ["__pn"].sum())
        span = (cnt.groupby(key_col, sort=False, as_index=False)
                .agg(d0=("day", "min"), d1=("day", "max")))
        if not len(span):
            return pd.DataFrame({key_col: cnt[key_col],
                                 "day": pd.Series([], dtype=np.int64),
                                 count_col: pd.Series([], dtype=np.int64)})
        lens = (span["d1"] - span["d0"] + 1).to_numpy()
        total = int(lens.sum())
        # days = concat(arange(d0_k, d1_k+1) for every key k), built as
        # one global arange minus per-key start offsets.
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        base = np.repeat(span["d0"].to_numpy() - starts, lens)
        days = np.arange(total, dtype=np.int64) + base
        keys = np.repeat(span[key_col].to_numpy(), lens)
        # Scatter the observed counts into the dense vector (offsets
        # joined back vectorized — no per-row dict lookups).
        span = span.assign(__off=starts - span["d0"].to_numpy())
        cnt = cnt.merge(span[[key_col, "__off"]], on=key_col)
        dense = np.zeros(total, dtype=np.int64)
        dense[(cnt["__off"] + cnt["day"]).to_numpy()] = \
            cnt["__pn"].to_numpy().astype(np.int64)
        return pd.DataFrame({key_col: keys, "day": days,
                             count_col: dense})

    return bucketed_fold(partials, [key_col], _fold, num_buckets)


def funnel_steps(ds, key_col: str, ts_col: str, event_col: str,
                 steps: Sequence[str], missing: int = -1,
                 num_buckets: Optional[int] = None):
    """Ordered funnel completion per key (the product-analytics /
    crawl-journey primitive): t₁ = the key's earliest ``steps[0]``
    event; tᵢ = its earliest ``steps[i]`` event STRICTLY AFTER tᵢ₋₁.
    One row per key that reached step 1, with each stage's epoch-micros
    timestamp (``missing`` where the stage was never reached — an
    integer sentinel, not NULL, so the output stays a plain int64
    column on every engine) and ``steps_completed``.

    Per bucket: |steps| vectorized passes (one filter + merge +
    groupby-min each), no per-key Python. Strictly-increasing
    timestamps gate each stage, so an unreached stage censors all
    later ones by construction (its candidates compare against the
    sentinel-free NaN and drop out).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel_steps: empty step list")
    from buteo_ray.stages.aggregate import bucketed_fold

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        ticks = g[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        d = pd.DataFrame({key_col: g[key_col].to_numpy(),
                          "__t": ticks, "__e": g[event_col].to_numpy()})
        cur = (d[d["__e"] == steps[0]]
               .groupby(key_col, as_index=False)["__t"].min()
               .rename(columns={"__t": "t1"}))
        cols = ["t1"]
        for i, st in enumerate(steps[1:], start=2):
            prev = cols[-1]
            cand = (d[d["__e"] == st]
                    .merge(cur[[key_col, prev]], on=key_col, how="inner"))
            cand = cand[cand["__t"] > cand[prev]]
            nxt = (cand.groupby(key_col, as_index=False)["__t"].min()
                   .rename(columns={"__t": f"t{i}"}))
            cur = cur.merge(nxt, on=key_col, how="left")
            cols.append(f"t{i}")
        out = pd.DataFrame({key_col: cur[key_col]})
        completed = np.zeros(len(cur), dtype=np.int64)
        for c in cols:
            # Epoch micros < 2^53: exact through the float64 NaN pass.
            v = cur[c].to_numpy(dtype=np.float64)
            reached = ~np.isnan(v)
            completed += reached.astype(np.int64)
            out[c] = np.where(reached, v, float(missing)).astype(np.int64)
        out["steps_completed"] = completed
        return out

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def ewma_by_key(ds, key_col: str, order_cols: list, value_col: str,
                alpha: float, out_col: str = "ewma",
                num_buckets: Optional[int] = None):
    """Per-key exponentially-weighted moving average over an ordered
    stream — the classic recursive smoother: y₁ = x₁, yᵢ = α·xᵢ +
    (1−α)·yᵢ₋₁ (``adjust=False`` form). Null rules: a null value
    leaves the average unchanged (carries yᵢ₋₁); rows before a key's
    first non-null carry null. ``order_cols`` must totally order each
    key.

    The recurrence is sequential per key but vectorized ACROSS keys (a
    jagged scan): rows are regrouped by within-key position and one
    numpy update per position advances every key's state at once —
    total work O(rows), Python steps = the LONGEST key's row count,
    never the row count. Keys unbounded → one hash-bucketed fold.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    a = float(alpha)
    order_cols = list(order_cols)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, *order_cols], kind="stable")
             .reset_index(drop=True))
        kidx, _ = pd.factorize(g[key_col], use_na_sentinel=False)
        rn = g.groupby(kidx, sort=False).cumcount().to_numpy()
        x = g[value_col].to_numpy(dtype=np.float64)
        order = np.argsort(rn, kind="stable")
        counts = np.bincount(rn) if len(rn) else np.empty(0, np.int64)
        n_keys = int(kidx.max()) + 1 if len(g) else 0
        state = np.full(n_keys, np.nan)
        out = np.empty(len(g))
        pos = 0
        for c in counts:
            rows = order[pos:pos + c]
            pos += c
            k = kidx[rows]
            xv = x[rows]
            prev = state[k]
            upd = a * xv + (1.0 - a) * prev
            y = np.where(np.isnan(xv), prev,
                         np.where(np.isnan(prev), xv, upd))
            state[k] = y
            out[rows] = y
        g = g.copy()
        g[out_col] = out
        return g

    return bucketed_fold(ds, [key_col], _fold, num_buckets)
