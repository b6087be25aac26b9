"""PolygonSet: a flattened, CSR-style collection of polygons for
fully-vectorized candidate-pair refinement in spatial joins.

``points_in_polygon`` (predicates.py) is exact but per-polygon; probing a
batch against thousands of distinct candidate polygons costs a Python
loop iteration per polygon. PolygonSet concatenates every ring edge of
every polygon into four flat float64 arrays, so refining N candidate
(point, polygon) pairs is one numpy pass over the expanded
(pair, edge) rows — crossing parity via ``np.bincount`` — regardless of
how many polygons are involved.

Semantics are bit-identical to ``points_in_polygon`` with
``include_boundary=True``: even-odd crossing parity over all rings of
the polygon (exterior XOR holes — parity over concatenated rings equals
the XOR of per-ring parities) plus on-boundary inclusion.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Ring = np.ndarray


class PolygonSet:
    def __init__(self, polygons: Sequence[Sequence[Ring]]):
        x0s, y0s, x1s, y1s = [], [], [], []
        edge_counts = np.zeros(len(polygons), dtype=np.int64)
        for i, rings in enumerate(polygons):
            cnt = 0
            for ring in rings:
                ring = np.asarray(ring, dtype=np.float64)
                x0s.append(ring[:-1, 0])
                y0s.append(ring[:-1, 1])
                x1s.append(ring[1:, 0])
                y1s.append(ring[1:, 1])
                cnt += ring.shape[0] - 1
            edge_counts[i] = cnt
        if x0s:
            self.x0 = np.concatenate(x0s)
            self.y0 = np.concatenate(y0s)
            self.x1 = np.concatenate(x1s)
            self.y1 = np.concatenate(y1s)
        else:
            self.x0 = self.y0 = self.x1 = self.y1 = np.empty(0, dtype=np.float64)
        self.edge_count = edge_counts
        self.edge_start = np.concatenate([[0], np.cumsum(edge_counts)])

    def __len__(self) -> int:
        return self.edge_count.shape[0]

    def contains_pairs(
        self, px: np.ndarray, py: np.ndarray, poly_idx: np.ndarray,
        include_boundary: bool = True,
    ) -> np.ndarray:
        """For each candidate pair (px[i], py[i]) vs polygon poly_idx[i],
        return whether the point is inside (boundary counts when
        ``include_boundary``). One vectorized pass, no per-polygon loop."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        poly_idx = np.asarray(poly_idx, dtype=np.int64)
        n = px.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)

        counts = self.edge_count[poly_idx]
        total = int(counts.sum())
        if total == 0:
            return np.zeros(n, dtype=bool)
        pair_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(block_starts, counts)
        e = np.repeat(self.edge_start[poly_idx], counts) + local

        x0, y0, x1, y1 = self.x0[e], self.y0[e], self.x1[e], self.y1[e]
        qx, qy = px[pair_rep], py[pair_rep]

        # One fused pass: shared diffs feed both the crossing test and the
        # on-boundary test (memory bandwidth is the bottleneck here).
        dx = x1 - x0
        dy = y1 - y0
        ty = qy - y0
        straddle = (y0 > qy) != (y1 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at_y = x0 + ty / dy * dx
        cross = straddle & (qx < x_at_y)
        parity = np.bincount(pair_rep, weights=cross, minlength=n).astype(np.int64)
        inside = (parity % 2) == 1

        if include_boundary:
            collinear = dx * ty - dy * (qx - x0) == 0.0
            within = (
                (qx >= np.minimum(x0, x1)) & (qx <= np.maximum(x0, x1))
                & (qy >= np.minimum(y0, y1)) & (qy <= np.maximum(y0, y1))
            )
            on = np.bincount(pair_rep, weights=collinear & within, minlength=n) > 0
            inside |= on
        return inside
