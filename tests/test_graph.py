"""PageRank: driver tier vs distributed tier vs a dict-based reference
implementation — exact semantics (same float ops, same dangling rule)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.graph import pagerank


def _ref_pagerank(edges, damping, iters):
    """Independent per-node dict implementation (no numpy bincount)."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {x: 0 for x in nodes}
    for u, _ in edges:
        out[u] += 1
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        contrib = {x: 0.0 for x in nodes}
        for u, v in edges:
            contrib[v] += r[u] / out[u]
        dangling = sum(r[x] for x in nodes if out[x] == 0)
        r = {x: (1 - damping) / n + damping * (contrib[x] + dangling / n)
             for x in nodes}
    return r


EDGES = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 4), (3, 6),
         (7, 6), (6, 6),  # self-loop
         (1, 2)]  # duplicate (must collapse)


@pytest.mark.parametrize("threshold", [64 << 20, 0],
                         ids=["driver", "distributed"])
def test_pagerank_matches_reference(ray_session, threshold):
    ds = rd.from_arrow(pa.table({
        "src": pa.array([u for u, _ in EDGES], pa.int64()),
        "dst": pa.array([v for _, v in EDGES], pa.int64())}))
    got = pagerank(ds, iters=4, driver_threshold=threshold).to_pandas()
    got = got.sort_values("node").reset_index(drop=True)
    want = _ref_pagerank(EDGES, 0.85, 4)
    assert list(got["node"]) == sorted(want)
    np.testing.assert_allclose(
        got["rank"].to_numpy(),
        np.array([want[x] for x in sorted(want)]), rtol=1e-12)
    # Ranks form a probability distribution (mass conservation).
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_empty(ray_session):
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())}))
    out = pagerank(ds)
    assert out.count() == 0
    # (Ray's to_pandas drops columns on zero-row data — check schema.)
    assert out.schema().names == ["node", "rank"]


def test_pagerank_null_edge_raises(ray_session):
    ds = rd.from_arrow(pa.table({"src": pa.array([1, None], pa.int64()),
                                 "dst": pa.array([2, 3], pa.int64())}))
    with pytest.raises(Exception, match="null endpoints"):
        pagerank(ds).to_pandas()


def test_pagerank_star_sink(ray_session):
    # All mass funnels into one sink, then redistributes uniformly.
    n_leaves = 50
    ds = rd.from_arrow(pa.table({
        "src": pa.array(list(range(1, n_leaves + 1)), pa.int64()),
        "dst": pa.array([0] * n_leaves, pa.int64())}))
    out = pagerank(ds, iters=6).to_pandas().set_index("node")["rank"]
    assert out.loc[0] > out.loc[1]
    assert abs(out.sum() - 1.0) < 1e-9
    # Leaves are symmetric — identical ranks.
    leaves = out.drop(index=0)
    assert float(leaves.max() - leaves.min()) < 1e-15


def _brute_triangles(edges):
    import itertools

    adj, nodes = set(), set()
    for a, b in edges:
        if a != b:
            adj.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    return sum(1 for a, b, c in itertools.combinations(sorted(nodes), 3)
               if (a, b) in adj and (a, c) in adj and (b, c) in adj)


@pytest.mark.parametrize("seed,thr", [(0, 64 << 20), (0, 0),
                                      (3, 64 << 20), (3, 0)])
def test_triangle_count_matches_brute_force(ray_session, seed, thr):
    from buteo_ray.stages.graph import triangle_count

    rng = np.random.default_rng(seed)
    e = rng.integers(0, 18, (50, 2))
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})
    got = (triangle_count(rd.from_pandas(df).repartition(3),
                          driver_threshold=thr)
           .to_pandas()["triangles"].iloc[0])
    assert got == _brute_triangles([tuple(x) for x in e.tolist()])


def test_triangle_count_empty_and_null(ray_session):
    from buteo_ray.stages.graph import triangle_count

    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)})
    got = triangle_count(rd.from_pandas(empty)).to_pandas()
    assert got["triangles"].tolist() == [0]

    import pyarrow as pa

    bad = rd.from_arrow(pa.table({
        "src": pa.array([1, None], pa.int64()),
        "dst": pa.array([2, 3], pa.int64())}))
    with pytest.raises(Exception, match="null endpoints"):
        triangle_count(bad).to_pandas()
