"""Grid-binned spatial index — the engine's broadcastable STRtree analog.

The reference attaches a file-level R-tree to vector layers
(``/root/reference/buteo/core_vector/core_vector_index.py:14-276``) and
probes it from SpatiaLite. Here the small (build) side of a spatial join
is indexed ONCE on the driver, ``ray.put`` into the object store, and read
zero-copy-ish by every ``map_batches`` task (SURVEY.md §3.4) — never
re-shipped per batch.

Design: uniform grid binning of geometry bboxes at an auto-chosen quadcell
resolution, stored CSR-style (sorted cell keys + offsets + geometry ids)
so lookups are ``np.searchsorted`` — no Python dict, cheap to pickle,
O(1)-ish probe per point. Candidates from the grid are then refined with
the exact predicates in :mod:`buteo_ray.geom.predicates`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from buteo_ray.grid.cells import cell_xy


def csr_probe(unique_keys: np.ndarray, starts: np.ndarray,
              keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Shared CSR lookup: for each ``keys[i]`` found in ``unique_keys``,
    emit (probe_row, flat_position) pairs covering its slice
    ``starts[p]..starts[p+1]``. Used by :class:`GridIndex` and the
    kNN cell probe (one implementation, one set of edge cases)."""
    pos = np.searchsorted(unique_keys, keys)
    valid = pos < unique_keys.shape[0]
    hit = np.zeros(keys.shape[0], dtype=bool)
    hit[valid] = unique_keys[pos[valid]] == keys[valid]
    if not hit.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.nonzero(hit)[0]
    p = pos[hit]
    counts = starts[p + 1] - starts[p]
    row_rep = np.repeat(rows, counts)
    block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(block_starts, counts)
    flat = np.repeat(starts[p], counts) + local
    return row_rep, flat


class GridIndex:
    """Spatial index over N geometries given by bbox columns.

    Parameters
    ----------
    bbox_xmin, bbox_xmax, bbox_ymin, bbox_ymax : float64 arrays (N,)
    res : quadcell resolution; auto-chosen from median bbox size if None.
    payload : optional list of parsed geometries (e.g. ring lists) carried
        alongside for exact refinement at probe time.
    """

    def __init__(
        self,
        bbox_xmin: np.ndarray,
        bbox_xmax: np.ndarray,
        bbox_ymin: np.ndarray,
        bbox_ymax: np.ndarray,
        res: Optional[int] = None,
        payload: Optional[list] = None,
    ):
        xmin = np.asarray(bbox_xmin, dtype=np.float64)
        xmax = np.asarray(bbox_xmax, dtype=np.float64)
        ymin = np.asarray(bbox_ymin, dtype=np.float64)
        ymax = np.asarray(bbox_ymax, dtype=np.float64)
        n = xmin.shape[0]

        if res is None:
            if n == 0:
                res = 8
            else:
                # Cell edge ≈ 1/4 of the median bbox edge: a bbox spans a
                # handful of cells (bounded index size) while per-cell
                # candidate lists stay short even with clustered build
                # sides — measured 10-30× faster probes than edge≈median
                # on hot-spot-skewed AOI layers.
                med = max(float(np.median(xmax - xmin)), float(np.median(ymax - ymin)), 1e-9)
                res = int(np.clip(np.floor(np.log2(360.0 / med)) + 2, 0, 24))
                # Guard against one outlier-large bbox: at a median-driven
                # res, a near-global bbox would bin into nx·ny ≈ 2^(2res)
                # cells (terabytes of np.repeat). Coarsen so the LARGEST
                # bbox spans ≤ ~81 cells.
                big = max(float(np.max(xmax - xmin)), float(np.max(ymax - ymin)), 1e-9)
                res_cap = int(np.clip(np.floor(np.log2(360.0 / big)) + 3, 0, 24))
                res = min(res, res_cap)
        self.res = res

        self.bbox = (xmin, xmax, ymin, ymax)
        self.payload = payload

        # Bin every bbox into the cells it covers (vectorized via repeat).
        x0, y0 = cell_xy(ymin, xmin, res)
        x1, y1 = cell_xy(ymax, xmax, res)
        nx = (x1 - x0 + 1).astype(np.int64)
        ny = (y1 - y0 + 1).astype(np.int64)
        counts = nx * ny
        total = int(counts.sum())
        geom_ids = np.repeat(np.arange(n, dtype=np.int64), counts)

        # Per-entry (cx, cy) offsets within each bbox's cell block.
        if total > 0:
            block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            local = np.arange(total, dtype=np.int64) - np.repeat(block_starts, counts)
            rep_nx = np.repeat(nx, counts)
            cx = np.repeat(x0, counts) + local % rep_nx
            cy = np.repeat(y0, counts) + local // rep_nx
            keys = (cy << np.int64(32)) | cx
            order = np.argsort(keys, kind="stable")
            self._keys_sorted = keys[order]
            self._geom_sorted = geom_ids[order]
            self._unique_keys, starts = np.unique(self._keys_sorted, return_index=True)
            self._starts = np.concatenate([starts, [total]])
        else:
            self._keys_sorted = np.empty(0, dtype=np.int64)
            self._geom_sorted = np.empty(0, dtype=np.int64)
            self._unique_keys = np.empty(0, dtype=np.int64)
            self._starts = np.zeros(1, dtype=np.int64)

    def __len__(self) -> int:
        return self.bbox[0].shape[0]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Candidate (point_idx, geom_idx) pairs whose bbox contains the
        point. Fully vectorized: cell lookup via searchsorted, bbox check
        on the gathered candidates."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        cx, cy = cell_xy(py, px, self.res)
        keys = (cy << np.int64(32)) | cx

        point_rep, flat = csr_probe(self._unique_keys, self._starts, keys)
        if point_rep.size == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        geom_idx = self._geom_sorted[flat]

        xmin, xmax, ymin, ymax = self.bbox
        keep = (
            (px[point_rep] >= xmin[geom_idx]) & (px[point_rep] <= xmax[geom_idx])
            & (py[point_rep] >= ymin[geom_idx]) & (py[point_rep] <= ymax[geom_idx])
        )
        return point_rep[keep], geom_idx[keep]

    def query_bbox(
        self, qxmin: float, qxmax: float, qymin: float, qymax: float
    ) -> np.ndarray:
        """Geometry ids whose bbox intersects the query bbox.

        Work is bounded by the cells PRESENT in the index, never by the
        query area — a whole-world query against a fine-resolution index
        must not enumerate (2^res)^2 candidate cells. Keys sort by
        (cy, cx), so each present cell row is one contiguous key range.
        """
        if self._unique_keys.shape[0] == 0:
            return np.empty(0, dtype=np.int64)
        x0, y0 = cell_xy(np.float64(qymin), np.float64(qxmin), self.res)
        x1, y1 = cell_xy(np.float64(qymax), np.float64(qxmax), self.res)
        x0, x1 = int(min(x0, x1)), int(max(x0, x1))
        y0, y1 = int(min(y0, y1)), int(max(y0, y1))
        all_cy = self._unique_keys >> np.int64(32)
        row_lo = int(np.searchsorted(all_cy, y0, side="left"))
        row_hi = int(np.searchsorted(all_cy, y1, side="right"))
        if row_lo >= row_hi:
            return np.empty(0, dtype=np.int64)
        cys = np.unique(all_cy[row_lo:row_hi])
        lo = np.searchsorted(self._unique_keys, (cys << np.int64(32)) | np.int64(x0))
        hi = np.searchsorted(
            self._unique_keys, (cys << np.int64(32)) | np.int64(x1), side="right")
        counts = hi - lo
        keep_rows = counts > 0
        lo, counts = lo[keep_rows], counts[keep_rows]
        if lo.size == 0:
            return np.empty(0, dtype=np.int64)
        block_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.repeat(lo, counts) + (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(block_starts, counts))
        _, flat = csr_probe(self._unique_keys, self._starts, self._unique_keys[pos])
        cand = np.unique(self._geom_sorted[flat])
        xmin, xmax, ymin, ymax = self.bbox
        keep = (xmax[cand] >= qxmin) & (xmin[cand] <= qxmax) & \
               (ymax[cand] >= qymin) & (ymin[cand] <= qymax)
        return cand[keep]
