"""Link-graph analytics over edge-list Datasets (beyond-reference: the
training-data companion to the dedup cluster ops — page importance /
crawl prioritization over a web link graph).

The reference engine has no graph ops; this module follows the same
two-tier plan as ``dedup.dup_clusters``: a size-gated vectorized numpy
fold on the driver for edge lists that fit the broadcast budget, and a
distributed superstep loop (join + bucketed fold per iteration) past
it. Per-iteration state is ONE row per node — bounded by the node set,
never the corpus — and the edge list is materialized once and reused
across supersteps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _distinct_edges(edges_ds, src: str, dst: str):
    """Distinct (src, dst) int64 edge list: Arrow per-block distinct
    partials (C++ hash aggregate) → bucketed exact dedup. Fails loud on
    null endpoints (house convention — a null would silently promote
    the id columns to float64 downstream)."""
    from buteo_ray.stages.aggregate import bucketed_fold

    def _partial(t: pa.Table) -> pa.Table:
        a = t[src].cast(pa.int64()).combine_chunks()
        b = t[dst].cast(pa.int64()).combine_chunks()
        if a.null_count or b.null_count:
            raise ValueError(
                f"pagerank: edge list has null endpoints "
                f"({src}: {a.null_count} nulls, {dst}: {b.null_count})")
        return (pa.table({"src": a, "dst": b})
                .group_by(["src", "dst"]).aggregate([]))

    partials = edges_ds.map_batches(_partial, batch_format="pyarrow",
                                    batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"], ignore_index=True)

    return bucketed_fold(partials, ["src", "dst"], _fold)


def _pagerank_numpy(u: np.ndarray, v: np.ndarray, damping: float,
                    iters: int):
    """Driver-tier power iteration on a distinct edge list.

    Semantics (shared with the distributed tier and the SQL oracle):
    r0 = 1/N; each step r'(x) = (1-d)/N + d*(Σ_{(u,x)∈E} r(u)/deg(u)
    + dangling/N) where dangling = Σ r over zero-outdegree nodes —
    the standard dangling-mass redistribution (Page et al., 1999)."""
    nodes, idx = np.unique(np.concatenate([u, v]), return_inverse=True)
    n = nodes.size
    ui, vi = idx[: u.size], idx[u.size:]
    deg = np.bincount(ui, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    sinks = deg == 0
    for _ in range(iters):
        contrib = np.bincount(vi, weights=r[ui] / deg[ui], minlength=n)
        dangling = float(r[sinks].sum())
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return nodes, r


def pagerank(edges_ds, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 3,
             driver_threshold: int = 64 << 20):
    """PageRank over a directed edge list → Dataset[(node:int64,
    rank:float64)], one row per node appearing in any edge.

    Multi-edges collapse first (rank is defined on the DISTINCT edge
    set, so the result is invariant to upstream duplication — e.g. the
    same outlink extracted from multiple snapshots of a page).

    Two tiers, gated on the materialized distinct-edge-list size
    (mirroring ``dup_clusters``): under ``driver_threshold`` bytes a
    vectorized numpy ``bincount`` power iteration on the driver (a web
    dup/link graph's edge list is orders of magnitude smaller than the
    page corpus); past it, the distributed plan below.

    Distributed plan, per iteration (state = ONE row per node):
    1. ship each source node's (rank, outdeg) onto its out-edges with
       ``hash_join_auto`` (broadcast under its size gate, hash-
       partitioned beyond it) and emit (dst, rank/outdeg) contributions;
    2. fold contributions per node with a bucketed fold (node
       cardinality unbounded — never one Ray group per node), seeded
       with a zero row per node so rank-sink nodes keep a row;
    3. one O(1) distributed sum for the dangling mass, then a stateless
       map computes r' = (1-d)/N + d*(contrib + dangling/N).
    The edge list is materialized ONCE and pinned across supersteps;
    per-round materialization pins only the node-rank table.
    """
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import (bucketed_fold, bucketed_sum,
                                            nonempty_arrow_blocks)
    from buteo_ray.stages.join_partitioned import hash_join_auto

    edges = _distinct_edges(edges_ds, src, dst).materialize()
    empty = pa.table({"node": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.float64())})
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    if (edges.size_bytes() or 0) <= driver_threshold:
        et = pa.concat_tables(nonempty_arrow_blocks(edges))
        nodes, r = _pagerank_numpy(
            et["src"].to_numpy(), et["dst"].to_numpy(), damping, iters)
        return ray.data.from_arrow(
            pa.table({"node": nodes, "rank": r}))

    # --- distributed tier -------------------------------------------
    # Node table with out-degree, via sum partials (src rows carry 1,
    # dst rows carry 0) so sink nodes get a deg=0 row without an outer
    # join. One row per node — bounded state.
    def _node_partials(t: pa.Table) -> pa.Table:
        ns, nd = len(t), len(t)
        return pa.table({
            "node": pa.concat_arrays([t["src"].combine_chunks(),
                                      t["dst"].combine_chunks()]),
            "__d": pa.array(np.concatenate([np.ones(ns), np.zeros(nd)])),
        })

    node_deg = bucketed_sum(
        edges.map_batches(_node_partials, batch_format="pyarrow",
                          batch_size=None),
        ["node"], {"deg": "__d"}).materialize()
    n_nodes = node_deg.count()

    def _seed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(len(t), 1.0 / n_nodes)))

    ranks = node_deg.map_batches(_seed, batch_format="pyarrow",
                                 batch_size=None).materialize()

    def _contrib(t: pa.Table) -> pa.Table:
        # deg > 0 guaranteed: every joined src has at least this edge.
        part = pc.divide(t["rank"], t["deg"])
        return pa.table({"node": t["dst"], "deg": pa.array(
            np.full(len(t), -1.0)), "part": part})

    def _zero_seed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "deg": t["deg"],
                         "part": pa.array(np.zeros(len(t)))})

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # deg: max recovers the true degree (the seed row always
        # carries it; contribution rows carry -1). part: plain sum.
        return (g.groupby("node", sort=False, as_index=False)
                .agg(deg=("deg", "max"), part=("part", "sum")))

    def _sink_rank(t: pa.Table) -> pa.Table:
        return pa.table({"r": pc.filter(
            t["rank"], pc.equal(t["deg"], 0.0))})

    seed = node_deg.map_batches(_zero_seed, batch_format="pyarrow",
                                batch_size=None)
    for _ in range(iters):
        dangling = ranks.map_batches(
            _sink_rank, batch_format="pyarrow", batch_size=None).sum("r")
        dangling = float(dangling or 0.0)
        contribs = hash_join_auto(
            edges, ranks, left_on="src", right_on="node").map_batches(
                _contrib, batch_format="pyarrow", batch_size=None)
        folded = bucketed_fold(contribs.union(seed), ["node"], _fold)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def _finish(t: pa.Table, base=base) -> pa.Table:
            r = base + damping * t["part"].to_numpy()
            return pa.table({"node": t["node"], "deg": t["deg"],
                             "rank": pa.array(r)})

        ranks = folded.map_batches(_finish, batch_format="pyarrow",
                                   batch_size=None).materialize()

    return ranks.map_batches(
        lambda t: t.select(["node", "rank"]),
        batch_format="pyarrow", batch_size=None)


def _pairs_within_groups(group_ids: np.ndarray, values: np.ndarray):
    """All unordered value pairs (i < j by position) within each group.

    ``group_ids`` must be sorted (contiguous groups). Vectorized per
    DISTINCT GROUP SIZE: for every size c ≥ 2 the members of all
    groups of that size form a (g, c) matrix and one ``triu_indices``
    broadcast emits every pair — no per-group Python.
    Returns (a, b) value arrays.
    """
    if group_ids.size == 0:
        return (np.empty(0, values.dtype), np.empty(0, values.dtype))
    first = np.concatenate([[True], group_ids[1:] != group_ids[:-1]])
    starts = np.flatnonzero(first)
    counts = np.diff(np.concatenate([starts, [group_ids.size]]))
    outs_a, outs_b = [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        sel = starts[counts == c]
        mat = values[sel[:, None] + np.arange(c)[None, :]]  # (g, c)
        iu, ju = np.triu_indices(c, 1)
        outs_a.append(mat[:, iu].ravel())
        outs_b.append(mat[:, ju].ravel())
    if not outs_a:
        return (np.empty(0, values.dtype), np.empty(0, values.dtype))
    return np.concatenate(outs_a), np.concatenate(outs_b)


def _triangles_numpy(u: np.ndarray, v: np.ndarray) -> int:
    """Driver-tier exact triangle count over a DISTINCT canonical
    (lo < hi) undirected edge list, by degree orientation + wedge
    membership (the standard O(m^1.5) bound: out-degree under the
    orientation is O(√m))."""
    nodes, idx = np.unique(np.concatenate([u, v]), return_inverse=True)
    n = np.int64(nodes.size)
    a, b = idx[: u.size].astype(np.int64), idx[u.size:].astype(np.int64)
    deg = (np.bincount(a, minlength=n)
           + np.bincount(b, minlength=n)).astype(np.int64)
    # total order: (deg, node index) — orientation DAG
    rank = deg * (n + 1) + np.arange(n, dtype=np.int64)
    fwd = rank[a] < rank[b]
    s = np.where(fwd, a, b)
    d = np.where(fwd, b, a)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    wa, wb = _pairs_within_groups(s, d)
    if wa.size == 0:
        return 0
    # wedge (wa, wb): both out-neighbors of one source, already
    # distinct; orient the closing edge by the same total order
    lo_r = rank[wa] < rank[wb]
    wx = np.where(lo_r, wa, wb)
    wy = np.where(lo_r, wb, wa)
    ekeys = s * n + d  # lexsorted by (s, d) ⇒ already monotone
    wkeys = wx * n + wy
    pos = np.searchsorted(ekeys, wkeys)
    pos = np.minimum(pos, ekeys.size - 1)
    return int((ekeys[pos] == wkeys).sum())


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   driver_threshold: int = 64 << 20):
    """Exact GLOBAL triangle count of the undirected simple graph
    induced by the edge list (self-loops dropped, multi-edges and both
    directions collapse). Returns Dataset[(triangles:int64)] — one row.

    Algorithm: degree orientation + wedge counting (Schank & Wagner
    2005 / Suri & Vassilvitskii WWW'11 "MapReduce triangle counting" —
    public literature). Orient every edge from its lower-(degree,id)
    endpoint to the higher; each triangle then has exactly ONE node
    with two out-edges, so counting (wedge, closing-edge) hits each
    triangle exactly once, and out-degrees are O(√m) — the wedge set
    stays near-linear even on power-law graphs.

    Two tiers gated on the materialized distinct-edge bytes (the
    pagerank gate): numpy on the driver under it; past it, the
    distributed plan — degree table via bucketed sum partials, degree
    attach via ``hash_join_auto`` (broadcast under ITS gate), wedge
    generation per source group (one vectorized pass per group), and
    a final tagged-union bucketed fold matching wedges against
    oriented edges. Pinned: the distinct edge list (materialized once)
    and the node-degree table; wedges stream through the fold.
    """
    import ray

    from buteo_ray.stages.aggregate import (bucketed_count,
                                            bucketed_fold,
                                            nonempty_arrow_blocks)
    from buteo_ray.stages.join_partitioned import hash_join_auto

    def _canon(t: pa.Table) -> pa.Table:
        a = t[src].cast(pa.int64()).combine_chunks()
        b = t[dst].cast(pa.int64()).combine_chunks()
        if a.null_count or b.null_count:
            raise ValueError(
                f"triangle_count: edge list has null endpoints "
                f"({src}: {a.null_count}, {dst}: {b.null_count})")
        an = a.to_numpy()
        bn = b.to_numpy()
        lo = np.minimum(an, bn)
        hi = np.maximum(an, bn)
        keep = lo != hi
        return (pa.table({"src": lo[keep], "dst": hi[keep]})
                .group_by(["src", "dst"]).aggregate([]))

    partials = edges_ds.map_batches(_canon, batch_format="pyarrow",
                                    batch_size=None)

    def _fold_e(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"], ignore_index=True)

    edges = bucketed_fold(partials, ["src", "dst"],
                          _fold_e).materialize()
    one = pa.table({"triangles": pa.array([0], pa.int64())})
    if edges.count() == 0:
        return ray.data.from_arrow(one)

    if (edges.size_bytes() or 0) <= driver_threshold:
        et = pa.concat_tables(nonempty_arrow_blocks(edges))
        tri = _triangles_numpy(et["src"].to_numpy(), et["dst"].to_numpy())
        return ray.data.from_arrow(
            pa.table({"triangles": pa.array([tri], pa.int64())}))

    # --- distributed tier -------------------------------------------
    def _endpoints(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["src"].combine_chunks(),
                                      t["dst"].combine_chunks()]),
        })

    node_deg = bucketed_count(
        edges.map_batches(_endpoints, batch_format="pyarrow",
                          batch_size=None),
        ["node"], alias="deg").materialize()

    e1 = hash_join_auto(edges, node_deg, "src", "node",
                        right_suffix="_s")
    e1 = e1.map_batches(lambda t: t.rename_columns(
        [c if c != "deg" else "deg_s" for c in t.column_names]),
        batch_format="pyarrow", batch_size=None)
    e2 = hash_join_auto(e1, node_deg, "dst", "node", right_suffix="_d")

    def _orient(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        # same (deg, id) total order as the driver tier
        ra = t["deg_s"].to_numpy(zero_copy_only=False).astype(np.int64)
        rb = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        fwd = (ra < rb) | ((ra == rb) & (a < b))
        return pa.table({"s": np.where(fwd, a, b),
                         "d": np.where(fwd, b, a),
                         "rs": np.where(fwd, ra, rb),
                         "rd": np.where(fwd, rb, ra)})

    oriented = e2.map_batches(_orient, batch_format="pyarrow",
                              batch_size=None).materialize()

    def _wedges_fold(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized _pairs_within_groups pass per bucket (never a
        # Python call per source node); d and rd share the same sorted
        # group layout so the two pair lists align elementwise.
        g = g.sort_values(["s", "d"], kind="stable")
        sv = g["s"].to_numpy()
        wa, wb = _pairs_within_groups(sv, g["d"].to_numpy())
        ra, rb = _pairs_within_groups(sv, g["rd"].to_numpy())
        fwd = (ra < rb) | ((ra == rb) & (wa < wb))
        return pd.DataFrame({
            "x": np.where(fwd, wa, wb).astype(np.int64),
            "y": np.where(fwd, wb, wa).astype(np.int64),
            "w": np.ones(len(wa), np.int64),
            "e": np.zeros(len(wa), np.int64)})

    wedges = bucketed_fold(oriented, ["s"], _wedges_fold)

    def _edge_rows(t: pa.Table) -> pa.Table:
        m = len(t)
        return pa.table({"x": t["s"], "y": t["d"],
                         "w": pa.array(np.zeros(m, np.int64)),
                         "e": pa.array(np.ones(m, np.int64))})

    tagged = wedges.union(oriented.map_batches(
        _edge_rows, batch_format="pyarrow", batch_size=None))

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["x", "y"], sort=False, as_index=False).agg(
            w=("w", "sum"), e=("e", "max"))
        tri = int(agg.loc[agg["e"] > 0, "w"].sum())
        return pd.DataFrame({"triangles": [np.int64(tri)]})

    per_bucket = bucketed_fold(tagged, ["x", "y"], _match)
    total = sum(t["triangles"].to_numpy().sum()
                for t in nonempty_arrow_blocks(per_bucket.materialize()))
    return ray.data.from_arrow(
        pa.table({"triangles": pa.array([int(total)], pa.int64())}))
