"""k-nearest-neighbour stages (north rule: "kNN uses H3 k-ring expansion
with a groupby-aggregate top-k shuffle").

Two paths:

- :func:`knn_broadcast` — the small-query-set path: queries broadcast to
  every task, each batch emits its per-batch top-k PARTIAL per query
  (k·Q rows per batch, not B·Q), and a tiny ``groupby(query_id)`` merge
  produces the exact global top-k. Shuffle volume is O(blocks·Q·k).
- :func:`knn_cells` — the cell-partitioned path for large query sets:
  queries indexed by quadcell; a candidate batch only scores against
  queries whose k-ring covers the candidate's cell. Partitioning
  assumption (documented per SURVEY.md): all true neighbours lie within
  ``ring`` cells of the query's cell at resolution ``res`` — callers
  size (res, ring) from the data's density floor, or iterate with a
  growing ring.

Distances: ``planar2`` = squared-euclidean on (lat, lon) — every double
bit-identical in numpy and SQL (the oracle metric); ``haversine`` =
great-circle meters (library metric; no SQL parity promised).

The reference has no direct kNN operator (nearest-neighbour semantics
appear as proximity / convolve_distance, ``/root/reference/buteo/raster/
proximity.py:25-195``); this is a required new capability.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.grid.cells import cell_xy

EARTH_RADIUS_M = 6371008.8


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (public haversine formula)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(v, np.float64)) for v in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def _planar2(qlat, qlon, clat, clon) -> np.ndarray:
    """(Q, C) squared planar distance; op order pinned for SQL parity:
    (clat-qlat)*(clat-qlat) + (clon-qlon)*(clon-qlon)."""
    dlat = clat[None, :] - qlat[:, None]
    dlon = clon[None, :] - qlon[:, None]
    return dlat * dlat + dlon * dlon


def _pairs_from_batch(
    qid: np.ndarray, qlat: np.ndarray, qlon: np.ndarray,
    cid: np.ndarray, clat: np.ndarray, clon: np.ndarray,
    k: int, metric: str,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch partial top-k: for each query, the k nearest candidates
    IN THIS BATCH (excluding self by id)."""
    if metric == "planar2":
        d = _planar2(qlat, qlon, clat, clon)
    elif metric == "haversine":
        d = haversine_m(qlat[:, None], qlon[:, None], clat[None, :], clon[None, :])
    else:
        raise ValueError(f"unknown metric {metric}")
    d = np.where(cid[None, :] == qid[:, None], np.inf, d)

    nq, nc = d.shape
    rows = np.repeat(np.arange(nq, dtype=np.int64), nc)
    cols = np.tile(np.arange(nc, dtype=np.int64), nq)
    dist = d.ravel()
    finite = np.isfinite(dist)
    q, n, dd = _partial_topk(rows[finite], cid[cols[finite]], dist[finite], k)
    return qid[q], n, dd


def _partial_topk(out_q: np.ndarray, out_n: np.ndarray, out_d: np.ndarray,
                  k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grouped per-query top-k in ONE lexsort (deterministic (dist, id)
    tie order — argpartition would break k-boundary ties arbitrarily):
    sort by (query, dist, id), rank within each query run, keep rank<k."""
    if out_q.size == 0:
        return out_q, out_n, out_d
    order = np.lexsort((out_n, out_d, out_q))
    oq = out_q[order]
    first = np.concatenate([[True], oq[1:] != oq[:-1]])
    run_start = np.maximum.accumulate(np.where(first, np.arange(oq.size), 0))
    rank = np.arange(oq.size) - run_start
    sel = order[rank < k]
    return out_q[sel], out_n[sel], out_d[sel]


def _final_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["dist", "neighbor_id"], kind="stable").head(k)
    return g.reset_index(drop=True)


def knn_broadcast(
    ds,
    query_ids: np.ndarray,
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    k: int = 5,
    metric: str = "planar2",
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """Exact kNN of each broadcast query against the streaming candidate
    Dataset. Returns Dataset[(query_id, neighbor_id, dist)] — ties broken
    by neighbor_id ascending."""
    qid = np.asarray(query_ids, dtype=np.int64)
    qlat = np.asarray(query_lat, dtype=np.float64)
    qlon = np.asarray(query_lon, dtype=np.float64)

    def _partial(batch: pa.Table) -> pa.Table:
        q, n, d = _pairs_from_batch(
            qid, qlat, qlon,
            batch[id_col].to_numpy(zero_copy_only=False),
            batch[lat_col].to_numpy(zero_copy_only=False),
            batch[lon_col].to_numpy(zero_copy_only=False),
            k, metric,
        )
        return pa.table({"query_id": q, "neighbor_id": n, "dist": d})

    from buteo_ray.stages.aggregate import bucketed_group_map

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    # Bucketed per-query merge: never one Ray group per query.
    return bucketed_group_map(partials, ["query_id"],
                              lambda g: _final_topk(g, k))


class _CellProbe:
    """Stateful probe for knn_cells: query lookup tables built once per
    actor from the broadcast ref."""

    def __init__(self, ref, k: int, metric: str, res: int, ring: int,
                 id_col: str, lat_col: str, lon_col: str):
        import ray

        qid, qlat, qlon = ray.get(ref) if not isinstance(ref, tuple) else ref
        self.qid, self.qlat, self.qlon = qid, qlat, qlon
        self.k, self.metric, self.res, self.ring = k, metric, res, ring
        self.id_col, self.lat_col, self.lon_col = id_col, lat_col, lon_col
        n = 1 << res
        qx, qy = cell_xy(qlat, qlon, res)
        # Expand each query into its k-ring cells → sorted (cell_key → query
        # rows) CSR lookup (x wraps at the antimeridian, y clamps at poles).
        dx, dy = np.meshgrid(np.arange(-ring, ring + 1), np.arange(-ring, ring + 1))
        ex = (qx[:, None] + dx.ravel()[None, :]) % n
        ey = qy[:, None] + dy.ravel()[None, :]
        valid = (ey >= 0) & (ey < n)
        qrows = np.repeat(np.arange(qid.shape[0]), valid.sum(axis=1))
        keys = (ey[valid] << np.int64(32)) | ex[valid]
        # Dedup (key, qrow): when 2·ring+1 > 2^res the x-wrap lists the
        # same cell twice for one query, and the duplicate candidate
        # pairs would each consume a top-k slot downstream.
        order = np.lexsort((qrows, keys))
        keys, qrows = keys[order], qrows[order]
        if keys.size:
            fresh = np.concatenate([[True], (keys[1:] != keys[:-1])
                                    | (qrows[1:] != qrows[:-1])])
            keys, qrows = keys[fresh], qrows[fresh]
        self._keys = keys
        self._qrows = qrows
        self._ukeys, starts = np.unique(self._keys, return_index=True)
        self._starts = np.concatenate([starts, [self._keys.shape[0]]])

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch[self.id_col].to_numpy(zero_copy_only=False)
        clat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        clon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        cx, cy = cell_xy(clat, clon, self.res)
        keys = (cy << np.int64(32)) | cx
        from buteo_ray.geom.index import csr_probe

        cand_rep, flat = csr_probe(self._ukeys, self._starts, keys)
        out_q, out_n, out_d = [], [], []
        if cand_rep.size:
            qrow = self._qrows[flat]
            if self.metric == "planar2":
                dlat = clat[cand_rep] - self.qlat[qrow]
                dlon = clon[cand_rep] - self.qlon[qrow]
                d = dlat * dlat + dlon * dlon
            else:
                d = haversine_m(self.qlat[qrow], self.qlon[qrow], clat[cand_rep], clon[cand_rep])
            keep = self.qid[qrow] != cid[cand_rep]
            out_q, out_n, out_d = self.qid[qrow[keep]], cid[cand_rep[keep]], d[keep]
        out_q = np.asarray(out_q, dtype=np.int64)
        out_n = np.asarray(out_n, dtype=np.int64)
        out_d = np.asarray(out_d, dtype=np.float64)
        # Per-batch partial top-k (deterministic (dist, id) order): only k
        # rows per query per batch can survive the final merge, so don't
        # shuffle every ring pair from a dense cell.
        out_q, out_n, out_d = _partial_topk(out_q, out_n, out_d, self.k)
        return pa.table({
            "query_id": out_q,
            "neighbor_id": out_n,
            "dist": out_d,
        })


def knn_cells(
    ds,
    query_ids: np.ndarray,
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    k: int = 5,
    res: int = 6,
    ring: int = 1,
    metric: str = "haversine",
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    concurrency: Optional[int] = None,
):
    """Cell-partitioned kNN: candidates only score against queries whose
    (res, ring) neighbourhood covers them. EXACT iff every true k-th
    neighbour lies within ``ring`` cells — the caller's partitioning
    assumption (verify by comparing the k-th distance against the ring
    radius, or re-run with ring+1 on the unsatisfied queries)."""
    import ray

    payload = (
        np.asarray(query_ids, np.int64),
        np.asarray(query_lat, np.float64),
        np.asarray(query_lon, np.float64),
    )
    kwargs = dict(batch_format="pyarrow", batch_size=None)
    if concurrency is not None:
        # Only the actor path needs the object-store ref (fetched once per
        # actor); putting it for the task path would pin a never-read copy.
        pairs = ds.map_batches(
            _CellProbe,
            fn_constructor_kwargs=dict(ref=ray.put(payload), k=k, metric=metric,
                                       res=res, ring=ring,
                                       id_col=id_col, lat_col=lat_col, lon_col=lon_col),
            concurrency=concurrency, **kwargs,
        )
    else:
        probe = _CellProbe(payload, k=k, metric=metric, res=res, ring=ring,
                           id_col=id_col, lat_col=lat_col, lon_col=lon_col)
        pairs = ds.map_batches(probe, **kwargs)
    from buteo_ray.stages.aggregate import bucketed_group_map

    return bucketed_group_map(pairs, ["query_id"],
                              lambda g: _final_topk(g, k))


def knn_cells_exact(
    ds,
    query_ids: np.ndarray,
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    k: int = 5,
    res: int = 6,
    ring: int = 1,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    concurrency: Optional[int] = None,
):
    """GUARANTEED-exact cell-partitioned kNN (planar2 metric).

    Plan: :func:`knn_cells` for the bulk, then a per-query certificate —
    a query's result is provably exact iff its k-th distance is smaller
    than the squared distance to the nearest EXCLUDED region (the cells
    beyond its ring window; clamped y-sides and full-wrap x count as
    unbounded). Queries that fail the certificate (or found < k
    neighbours) are re-run through :func:`knn_broadcast`, which is exact
    by construction; with a density-appropriate (res, ring) the residual
    is empty or tiny, so the rescue pass costs one extra streaming scan
    over the corpus for a handful of queries.

    planar2 only: lon does not wrap in the planar metric, so the window
    edge distance is a true lower bound for every excluded candidate
    (no such per-axis bound exists for haversine near the poles)."""
    qid = np.asarray(query_ids, np.int64)
    qlat = np.asarray(query_lat, np.float64)
    qlon = np.asarray(query_lon, np.float64)

    # Materialize: `out` (≤ Q·k rows — tiny) is consumed twice (the
    # certificate aggregate below, then the caller / the rescue filter);
    # without this the FULL corpus-scan lineage re-executes per consumer.
    out = knn_cells(ds, qid, qlat, qlon, k=k, res=res, ring=ring,
                    metric="planar2", id_col=id_col, lat_col=lat_col,
                    lon_col=lon_col, concurrency=concurrency).materialize()

    # ---- certificate: squared distance to the nearest excluded region.
    n = np.int64(1) << res
    csx = 360.0 / float(n)
    csy = 180.0 / float(n)
    qx, qy = cell_xy(qlat, qlon, res)
    inf = np.float64(np.inf)
    if 2 * ring + 1 >= n:
        bx = np.full(qid.shape, inf)
    else:
        lo = (qx - ring) * csx - 180.0          # west edge of the window
        hi = (qx + ring + 1) * csx - 180.0      # east edge
        bx = np.minimum(qlon - lo, hi - qlon)
    lo_y = (qy - ring) * csy - 90.0
    hi_y = (qy + ring + 1) * csy - 90.0
    by_lo = np.where(qy - ring <= 0, inf, qlat - lo_y)    # clamped at pole
    by_hi = np.where(qy + ring >= n - 1, inf, hi_y - qlat)
    bound = np.minimum(bx, np.minimum(by_lo, by_hi))
    bound2 = bound * bound

    # Per-query k-th distance + row count, computed driver-side: `out`
    # is ≤ Q·k rows — the same order as the query payload the caller
    # already holds on the driver — so a pandas groupby here is bounded
    # at any corpus scale and skips a fixed-cost Ray all-to-all.
    op = out.select_columns(["query_id", "dist"]).to_pandas()
    stats = (op.groupby("query_id", as_index=False)
             .agg(kth=("dist", "max"), nn=("dist", "size")))
    kth = pd.Series(np.float64(np.inf), index=qid)
    nn = pd.Series(0, index=qid, dtype=np.int64)
    kth.loc[stats["query_id"].to_numpy()] = stats["kth"].to_numpy()
    nn.loc[stats["query_id"].to_numpy()] = stats["nn"].to_numpy()
    # strict <: an excluded candidate can sit exactly ON the window edge
    ok = (nn.to_numpy() >= k) & (kth.to_numpy() < bound2)
    if ok.all():
        return out

    # ---- rescue: exact broadcast pass for the residual queries only.
    bad = ~ok
    bad_arr = qid[bad]
    rescue = knn_broadcast(ds, bad_arr, qlat[bad], qlon[bad], k=k,
                           metric="planar2", id_col=id_col,
                           lat_col=lat_col, lon_col=lon_col)

    def _drop_bad(t: pa.Table) -> pa.Table:
        keep = ~np.isin(t["query_id"].to_numpy(), bad_arr)
        return t.filter(pa.array(keep))

    kept = out.map_batches(_drop_bad, batch_format="pyarrow", batch_size=None)
    return kept.union(rescue)
