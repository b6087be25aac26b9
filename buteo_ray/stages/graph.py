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
