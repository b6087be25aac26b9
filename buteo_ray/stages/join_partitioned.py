"""Large-large co-partitioned spatial join (SURVEY.md §2.4): when the
polygon side is too big to broadcast, BOTH sides are keyed by quadcell
and joined cell-by-cell inside ``groupby(cell).map_groups``.

Plan:
1. points → one row per point keyed by its cell at ``res``;
2. polygons → ``flat_map`` to one row per COVERING cell (bbox cover,
   so a polygon spanning k cells is replicated k× — boundary/dateline
   duplication per SURVEY.md §2.4);
3. tag sides, union, ``groupby(cell)`` → within each group build a
   bbox index over the local polygons, probe the local points, exact
   PiP refine;
4. duplicates from polygon replication are impossible by construction:
   a (point, polygon) pair meets only in the single cell containing the
   point (the polygon is replicated, the point is not).

Skew: pass ``salt_factor > 1`` to split HOT cells — hot-cell points get
``salt = hash(id) % k`` while the polygon side is replicated into every
salt of a hot cell (build-side replication, probe-side split).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.geom.polyset import PolygonSet
from buteo_ray.geom.wkb import parse_wkb
from buteo_ray.grid.cells import cell_xy
from buteo_ray.stages.dedup import _splitmix64


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cy.astype(np.int64) << np.int64(32)) | cx.astype(np.int64)


def cell_partitioned_pip_join(
    points_ds,
    polys_ds,
    res: int = 7,
    point_id_col: str = "doc_id",
    poly_id_col: str = "aoi_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    hot_cells: Optional[Dict[int, int]] = None,
    salt_factor: int = 1,
):
    """Inner PiP join of two large Datasets. Returns
    Dataset[(point_id_col, poly_id_col)].

    ``hot_cells``: optional {cell_key: count} from
    :func:`buteo_ray.state.skew.hot_keys`; hot cells are salted
    ``salt_factor`` ways (points split, polygons replicated).
    """
    hot = set(hot_cells or ())
    k = max(int(salt_factor), 1)

    def _point_rows(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        cx, cy = cell_xy(lat, lon, res)
        key = _cell_key(cx, cy)
        pid = batch[point_id_col].to_numpy(zero_copy_only=False)
        if hot and k > 1:
            h = _splitmix64(pid.astype(np.uint64)) % np.uint64(k)
            salt = np.where(np.isin(key, np.fromiter(hot, dtype=np.int64)),
                            h.astype(np.int64), 0)
        else:
            salt = np.zeros(len(pid), dtype=np.int64)
        return pa.table({
            "cell": key, "salt": salt, "side": np.zeros(len(pid), dtype=np.int8),
            "pid": pid, "lat": lat, "lon": lon,
            "poly_id": np.full(len(pid), -1, dtype=np.int64),
            "wkb": pa.array([b""] * len(pid), type=pa.binary()),
        })

    def _poly_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "cell": np.empty(0, np.int64), "salt": np.empty(0, np.int64),
                "side": np.empty(0, np.int8), "pid": np.empty(0, np.int64),
                "lat": np.empty(0, np.float64), "lon": np.empty(0, np.float64),
                "poly_id": np.empty(0, np.int64),
                "wkb": pa.array([], type=pa.binary()),
            })
        xmin = batch["bbox_xmin"].to_numpy()
        xmax = batch["bbox_xmax"].to_numpy()
        ymin = batch["bbox_ymin"].to_numpy()
        ymax = batch["bbox_ymax"].to_numpy()
        x0, y0 = cell_xy(ymin, xmin, res)
        x1, y1 = cell_xy(ymax, xmax, res)
        nx = (x1 - x0 + 1).astype(np.int64)
        ny = (y1 - y0 + 1).astype(np.int64)
        counts = nx * ny
        total = int(counts.sum())
        rep = np.repeat(np.arange(n), counts)
        block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(block_starts, counts)
        rep_nx = np.repeat(nx, counts)
        cx = np.repeat(x0, counts) + local % rep_nx
        cy = np.repeat(y0, counts) + local // rep_nx
        key = _cell_key(cx, cy)
        poly_id = batch[poly_id_col].to_numpy(zero_copy_only=False)[rep]
        wkbs = batch["geom_wkb"].to_pylist()
        wkb_rep = [wkbs[i] for i in rep]
        # Hot-cell polygon rows replicate into every salt bucket.
        if hot and k > 1:
            is_hot = np.isin(key, np.fromiter(hot, dtype=np.int64))
            reps = np.where(is_hot, k, 1)
            key = np.repeat(key, reps)
            poly_id = np.repeat(poly_id, reps)
            wkb_rep = [w for w, r in zip(wkb_rep, reps) for _ in range(r)]
            salt = np.concatenate([np.arange(r, dtype=np.int64) for r in reps]) if len(reps) else np.empty(0, np.int64)
        else:
            salt = np.zeros(key.shape[0], dtype=np.int64)
        m = key.shape[0]
        return pa.table({
            "cell": key, "salt": salt, "side": np.ones(m, dtype=np.int8),
            "pid": np.full(m, -1, dtype=np.int64),
            "lat": np.zeros(m), "lon": np.zeros(m),
            "poly_id": poly_id,
            "wkb": pa.array(wkb_rep, type=pa.binary()),
        })

    pts = points_ds.map_batches(_point_rows, batch_format="pyarrow", batch_size=None)
    pls = polys_ds.map_batches(_poly_rows, batch_format="pyarrow", batch_size=None)
    both = pts.union(pls)

    def _join_cell(g: pd.DataFrame) -> pd.DataFrame:
        points = g[g["side"] == 0]
        polys = g[g["side"] == 1]
        if len(points) == 0 or len(polys) == 0:
            return pd.DataFrame({point_id_col: pd.Series([], dtype="int64"),
                                 poly_id_col: pd.Series([], dtype="int64")})
        ring_lists = []
        for wkb in polys["wkb"]:
            kind, rings = parse_wkb(wkb)
            ring_lists.append(rings if kind == "polygon"
                              else [r for poly in rings for r in poly])
        pset = PolygonSet(ring_lists)
        lon = points["lon"].to_numpy()
        lat = points["lat"].to_numpy()
        # Per-cell bbox index over the local polygons (NOT an npts×npol
        # cartesian product — a dense urban cell with 10^6 points and
        # 10^3 polygons would materialize 10^9 pair rows). Bboxes span
        # ALL rings so multipolygon members beyond ring 0 survive.
        allv = [np.vstack(r) for r in ring_lists]
        xmin = np.array([v[:, 0].min() for v in allv])
        xmax = np.array([v[:, 0].max() for v in allv])
        ymin = np.array([v[:, 1].min() for v in allv])
        ymax = np.array([v[:, 1].max() for v in allv])
        from buteo_ray.geom.index import GridIndex

        local_idx = GridIndex(xmin, xmax, ymin, ymax)
        pi, gi = local_idx.query_points(lon, lat)
        if pi.size:
            exact = pset.contains_pairs(lon[pi], lat[pi], gi)
            pi, gi = pi[exact], gi[exact]
        return pd.DataFrame({
            point_id_col: points["pid"].to_numpy()[pi],
            poly_id_col: polys["poly_id"].to_numpy()[gi],
        })

    # Cell cardinality is grid-resolution-unbounded: route by hash
    # bucket (bounded Ray group count), join cell-by-cell inside.
    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(both, ["cell", "salt"], _join_cell)


def _known_empty(ds) -> bool:
    # Metadata-exact only: _meta_count() knows the row count for
    # materialized / from_* / raw-read datasets and returns None
    # (never executes) for lazy map-derived plans. PRIVATE API,
    # validated on Ray 2.49.2 — if it disappears, the except arm
    # just disables the short-circuit (degrades safe).
    try:
        return ds._meta_count() == 0
    except Exception:
        return False


def _right_out_col_name(c: str, cols, right_suffix, fn: str) -> str:
    """Output name of right column ``c`` given existing ``cols`` — the
    ONE collision/suffix rule every join plan tier uses (broadcast
    probe, known-empty short-circuit, null padding — they must never
    diverge)."""
    if c not in cols:
        return c
    if right_suffix is None:
        raise ValueError(
            f"{fn}: right column '{c}' collides "
            "with a left column; pass right_suffix=")
    name = c + right_suffix
    if name in cols:
        raise ValueError(
            f"{fn}: suffixed column '{name}' "
            "still collides with a left column")
    return name


def _joined_schema(left_ds, right_ds, right_on, right_suffix, fn: str):
    from buteo_ray.stages.aggregate import _empty_arrow_table

    lt, rt = _empty_arrow_table(left_ds), _empty_arrow_table(right_ds)
    cols = {c: lt[c] for c in lt.column_names}
    for c in rt.column_names:
        if c == right_on:
            continue
        cols[_right_out_col_name(c, cols, right_suffix, fn)] = rt[c]
    return cols


def hash_join_auto(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    broadcast_threshold: int = 64 << 20,
    num_partitions: Optional[int] = None,
    right_bytes_hint: Optional[int] = None,
    right_suffix: Optional[str] = None,
):
    """Inner equi-join with automatic plan selection (the engine's
    broadcast-join optimization): when the RIGHT side's estimated bytes
    fit under ``broadcast_threshold`` AND its keys are unique (a
    dimension table), it is collected once, shipped via ``ray.put`` and
    probed per batch with vectorized ``pc.index_in`` + ``take`` — zero
    shuffles, left side streams. Otherwise both sides go through Ray's
    hash-partitioned ``Dataset.join`` with a byte-derived partition
    count. At 100 TB the fact↔fact joins always take the shuffle path;
    the dim joins never should — Ray's shuffle aggregators cost seconds
    of fixed overhead that dominates megabyte-scale builds (measured
    2.7× on the TPC-H-Q3 bench query)."""
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import _empty_arrow_table
    from buteo_ray.state.skew import derive_num_partitions, estimate_bytes

    def _right_out_name(c: str, cols) -> str:
        return _right_out_col_name(c, cols, right_suffix, "hash_join_auto")

    def _joined_schema_cols():
        return _joined_schema(left_ds, right_ds, right_on, right_suffix,
                              "hash_join_auto")

    # A KNOWN-empty side makes the inner join empty — short-circuit with
    # the joined schema. Ray 2.49's hash-shuffle join crashes in Acero
    # ("No match for FieldRef") when a side contributes only schemaless
    # empty blocks; a LAZY pipeline that merely filters to empty can
    # still hit that upstream limitation — materialize a maybe-empty
    # side before joining on it.
    # The short-circuit is deliberately unconditional: building the
    # joined schema may run ONE probe block of a lazy other side at plan
    # time (ds.schema() fetch), but that is bounded and strictly cheaper
    # than the alternative — Ray 2.49's shuffle join crashing in Acero on
    # the schemaless-empty side (verified by the join property test,
    # which fails if this is gated on metadata-known schemas).
    if _known_empty(left_ds) or _known_empty(right_ds):
        return ray.data.from_arrow(pa.table(_joined_schema_cols()))

    # estimate_bytes is metadata-only (logical-plan leaves): calling
    # Dataset.size_bytes() here would EXECUTE a map-derived right side at
    # plan time. Callers may still pass a tighter hint (e.g. the pre-join
    # input's metadata size) when the source bound is too loose.
    rb = right_bytes_hint
    if rb is None:
        rb = estimate_bytes(right_ds) or None
    if rb is not None and rb < broadcast_threshold:
        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        tabs = nonempty_arrow_blocks(right_ds)
        if not tabs:
            # Keep the FULL right schema so the output schema does not
            # depend on whether the collected side happened to be empty;
            # a right side of only schemaless 0-column blocks still needs
            # the key column for the probe below.
            rtbl = _empty_arrow_table(right_ds)
            if right_on not in rtbl.column_names:
                rtbl = pa.table({right_on: pa.array([], type=pa.int64())})
        else:
            rtbl = pa.concat_tables(tabs)
        keys = rtbl[right_on].combine_chunks()
        if len(keys) == len(pc.unique(keys)):  # dimension table → broadcast
            ref = ray.put((keys, rtbl))

            def _probe(t: pa.Table) -> pa.Table:
                k, rt = ray.get(ref)
                idx = pc.index_in(t[left_on].cast(k.type), value_set=k)
                mask = pc.is_valid(idx)
                t2 = t.filter(mask)
                idx2 = pc.filter(idx, mask)
                cols = {c: t2[c] for c in t2.column_names}
                for c in rt.column_names:
                    if c == right_on:
                        continue
                    # Never silently drop a colliding right column — the
                    # shuffle plan would have kept/suffixed it, and the
                    # schema must not depend on which plan the size
                    # estimate picked (_right_out_name is the shared rule).
                    cols[_right_out_name(c, cols)] = pc.take(rt[c], idx2)
                return pa.table(cols)

            return left_ds.map_batches(_probe, batch_format="pyarrow",
                                       batch_size=None)
    n = num_partitions or derive_num_partitions(left_ds, right_ds)
    return left_ds.join(right_ds, join_type="inner", num_partitions=n,
                        on=(left_on,), right_on=(right_on,),
                        right_suffix=right_suffix)


def left_join_auto(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    broadcast_threshold: int = 64 << 20,
    num_partitions: Optional[int] = None,
    right_bytes_hint: Optional[int] = None,
    right_suffix: Optional[str] = None,
):
    """LEFT OUTER equi-join with the same automatic plan selection as
    :func:`hash_join_auto` (the enrichment join: every left row
    survives; right columns are NULL where no match). A NULL left key
    matches nothing (SQL rule — ``index_in`` propagates the null
    straight through to null right values).

    Tiers, chosen exactly like the inner join so the two functions'
    plans stay side-by-side comparable:
      * right side under the byte gate AND unique-keyed → collected
        once, ``ray.put`` broadcast, per-batch ``index_in`` + ``take``
        (a null index takes a null value — the outer semantics fall out
        of the Arrow kernel; no filter step at all);
      * otherwise Ray's hash-partitioned ``Dataset.join`` with
        ``join_type="left_outer"``.
    Known-empty short-circuits: empty LEFT → empty joined schema;
    empty RIGHT → left stream + typed null padding (no shuffle).
    """
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import _empty_arrow_table
    from buteo_ray.state.skew import derive_num_partitions, estimate_bytes

    def _right_out_name(c: str, cols) -> str:
        return _right_out_col_name(c, cols, right_suffix, "left_join_auto")

    if _known_empty(left_ds):
        return ray.data.from_arrow(pa.table(_joined_schema(
            left_ds, right_ds, right_on, right_suffix, "left_join_auto")))
    if _known_empty(right_ds):
        rt = _empty_arrow_table(right_ds)
        rcols = [(c, rt.schema.field(c).type)
                 for c in rt.column_names if c != right_on]

        def _pad(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in t.column_names}
            for c, typ in rcols:
                cols[_right_out_name(c, cols)] = pa.nulls(len(t), typ)
            return pa.table(cols)

        return left_ds.map_batches(_pad, batch_format="pyarrow",
                                   batch_size=None)

    rb = right_bytes_hint
    if rb is None:
        rb = estimate_bytes(right_ds) or None
    if rb is not None and rb < broadcast_threshold:
        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        tabs = nonempty_arrow_blocks(right_ds)
        if not tabs:
            rtbl = _empty_arrow_table(right_ds)
            if right_on not in rtbl.column_names:
                rtbl = pa.table({right_on: pa.array([], type=pa.int64())})
        else:
            rtbl = pa.concat_tables(tabs)
        keys = rtbl[right_on].combine_chunks()
        if len(keys) == len(pc.unique(keys)):  # dimension table → broadcast
            ref = ray.put((keys, rtbl))

            def _probe(t: pa.Table) -> pa.Table:
                k, rt = ray.get(ref)
                idx = pc.index_in(t[left_on].cast(k.type), value_set=k)
                cols = {c: t[c] for c in t.column_names}
                for c in rt.column_names:
                    if c == right_on:
                        continue
                    cols[_right_out_name(c, cols)] = pc.take(rt[c], idx)
                return pa.table(cols)

            return left_ds.map_batches(_probe, batch_format="pyarrow",
                                       batch_size=None)
    n = num_partitions or derive_num_partitions(left_ds, right_ds)
    return left_ds.join(right_ds, join_type="left_outer",
                        num_partitions=n, on=(left_on,),
                        right_on=(right_on,), right_suffix=right_suffix)


def _filter_join_auto(left_ds, right_ds, left_on, right_on, keep_match,
                      broadcast_threshold, num_partitions,
                      right_bytes_hint):
    """Shared plan for SEMI (``keep_match=True``) and ANTI
    (``keep_match=False``) equi-joins — filtering joins ship NO right
    payload, so the broadcast tier sends only the DISTINCT key array
    (deduped before ``ray.put``; no uniqueness requirement, unlike the
    payload joins). NULL left keys match nothing: dropped by semi, kept
    by anti (SQL LEFT SEMI/ANTI JOIN semantics, not NOT IN).
    Shuffle tier: Ray's ``join_type="left_semi"/"left_anti"``."""
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import _empty_arrow_table
    from buteo_ray.state.skew import derive_num_partitions, estimate_bytes

    if _known_empty(left_ds):
        return left_ds
    if _known_empty(right_ds):
        # semi of nothing is empty; anti of nothing is everything
        if keep_match:
            return ray.data.from_arrow(_empty_arrow_table(left_ds))
        return left_ds

    rb = right_bytes_hint
    if rb is None:
        rb = estimate_bytes(right_ds) or None
    if rb is not None and rb < broadcast_threshold:
        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        tabs = nonempty_arrow_blocks(right_ds)
        if not tabs:
            keys = pa.array([], pa.int64())
        else:
            keys = pc.unique(pa.concat_tables(
                [t.select([right_on]) for t in tabs])[right_on])
        keys = keys.drop_null()
        ref = ray.put(keys)

        def _probe(t: pa.Table) -> pa.Table:
            k = ray.get(ref)
            if len(k) == 0:
                hit = pa.array(np.zeros(len(t), dtype=bool))
            else:
                hit = pc.is_in(t[left_on].cast(k.type), value_set=k)
            if keep_match:
                return t.filter(hit)
            # anti: no match OR null key (null never matches)
            return t.filter(pc.or_kleene(
                pc.invert(pc.fill_null(hit, False)),
                pc.is_null(t[left_on])))

        return left_ds.map_batches(_probe, batch_format="pyarrow",
                                   batch_size=None)
    n = num_partitions or derive_num_partitions(left_ds, right_ds)
    rkeys = right_ds.select_columns([right_on])
    rk = right_on
    if rk == left_on:
        # Acero rejects same-named key fields on filtering joins ("No
        # match or multiple matches for key field reference") — rename
        # the right key to a private name; it never reaches the output.
        rk = "__filter_join_rk"
        # map_batches rename (Dataset.rename_columns breaks on
        # pandas-backed blocks in Ray 2.49).
        rkeys = rkeys.map_batches(
            lambda t, _n=rk: t.rename_columns([_n]),
            batch_format="pyarrow", batch_size=None)
    return left_ds.join(rkeys,
                        join_type="left_semi" if keep_match
                        else "left_anti",
                        num_partitions=n, on=(left_on,),
                        right_on=(rk,))


def semi_join_auto(left_ds, right_ds, left_on: str, right_on: str,
                   broadcast_threshold: int = 64 << 20,
                   num_partitions: Optional[int] = None,
                   right_bytes_hint: Optional[int] = None):
    """LEFT SEMI equi-join: left rows with ≥1 right match, right
    payload never shipped (see :func:`_filter_join_auto`)."""
    return _filter_join_auto(left_ds, right_ds, left_on, right_on, True,
                             broadcast_threshold, num_partitions,
                             right_bytes_hint)


def anti_join_auto(left_ds, right_ds, left_on: str, right_on: str,
                   broadcast_threshold: int = 64 << 20,
                   num_partitions: Optional[int] = None,
                   right_bytes_hint: Optional[int] = None):
    """LEFT ANTI equi-join: left rows with NO right match (null left
    keys kept — SQL ANTI JOIN, not NOT IN). The dedup/decontamination
    drop-filter as a first-class generic join."""
    return _filter_join_auto(left_ds, right_ds, left_on, right_on, False,
                             broadcast_threshold, num_partitions,
                             right_bytes_hint)


def full_outer_join_auto(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    broadcast_threshold: int = 64 << 20,
    num_partitions: Optional[int] = None,
    right_bytes_hint: Optional[int] = None,
    right_suffix: Optional[str] = None,
):
    """FULL OUTER equi-join, composed from the existing auto-tiered
    primitives rather than a third bespoke plan:

        full_outer(L, R) = left_outer(L, R)  UNION ALL
                           null-pad(R ANTI-JOIN L)

    Each constituent picks its own broadcast/shuffle tier, so the small
    dimension side never shuffles and the fact↔fact case degrades to
    exactly one hash-shuffle join plus one filtering join over the same
    partitioning key. Output schema = left columns + right payload
    columns (right key dropped, collisions suffixed by the shared
    ``_right_out_col_name`` rule); the ``left_on`` column carries
    ``COALESCE(left key, right key)`` so unmatched RIGHT rows keep
    their key — the coalesced-key convention every SQL full-outer
    consumer writes by hand. Right keys must be castable to the left
    key's Arrow type.

    A NULL key on either side matches nothing (SQL rule): a null-key
    left row comes through the left_outer arm null-padded; a null-key
    right row survives the anti arm and pads to an all-null-left row.
    """
    from buteo_ray.stages.aggregate import arrow_fields

    fn = "full_outer_join_auto"
    schema_cols = _joined_schema(left_ds, right_ds, right_on,
                                 right_suffix, fn)
    names = list(schema_cols)
    types = {c: schema_cols[c].type for c in names}

    def _normalize(t: pa.Table) -> pa.Table:
        # The shuffle tier of left_join_auto (Ray's Dataset.join) may
        # keep the right key column; the broadcast tier drops it. Pin
        # the output to the ONE schema both arms share.
        cols = {}
        for c in names:
            if c in t.column_names:
                col = t[c]
                cols[c] = (col if col.type == types[c]
                           else col.cast(types[c]))
            else:
                cols[c] = pa.nulls(t.num_rows, types[c])
        return pa.table(cols)

    matched = left_join_auto(
        left_ds, right_ds, left_on, right_on,
        broadcast_threshold=broadcast_threshold,
        num_partitions=num_partitions,
        right_bytes_hint=right_bytes_hint,
        right_suffix=right_suffix,
    ).map_batches(_normalize, batch_format="pyarrow", batch_size=None)

    # Right-payload output names under the SAME collision rule
    # _joined_schema applied (left columns claim names first).
    rmap = {}
    taken = {c: None for c, _t in arrow_fields(left_ds)}
    for c, _t in arrow_fields(right_ds):
        if c == right_on:
            continue
        out = _right_out_col_name(c, taken, right_suffix, fn)
        taken[out] = None
        rmap[c] = out

    unmatched = anti_join_auto(right_ds, left_ds, right_on, left_on,
                               broadcast_threshold=broadcast_threshold,
                               num_partitions=num_partitions)

    def _pad(t: pa.Table) -> pa.Table:
        cols = {}
        for c in names:
            cols[c] = pa.nulls(t.num_rows, types[c])
        cols[left_on] = t[right_on].cast(types[left_on])
        for c, out in rmap.items():
            col = t[c]
            cols[out] = (col if col.type == types[out]
                         else col.cast(types[out]))
        return pa.table({c: cols[c] for c in names})

    padded = unmatched.map_batches(_pad, batch_format="pyarrow",
                                   batch_size=None)
    return matched.union(padded)
