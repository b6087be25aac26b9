"""Exact polygon boolean operations (union / intersection / difference)
built from scratch on the classic overlay recipe (public algorithm,
e.g. de Berg et al., *Computational Geometry*, ch. 2 map overlay):

1. split every input edge at every edge-edge intersection,
2. keep a sub-segment iff it lies on the result's boundary (even-odd
   coverage test on points offset to each side of its midpoint),
3. orient kept segments interior-left and stitch them into rings by
   walking the planar graph,
4. classify rings by signed area (CCW exterior / CW hole) and nest
   holes into their containing exteriors.

Replaces the hull-only dissolve geometry and convex-only clip
(reference parity: ``vector/dissolve.py:26-264`` true union,
``vector/clip.py:24-151`` arbitrary ``-clipsrc`` geometry). Pure
numpy — no GDAL/shapely in the environment.

Intended use is PER-GROUP inside ``map_groups`` (dissolve) or against a
broadcast clip layer — the O(E²)-pairs split step is vectorized but not
sublinear; for huge groups do a two-level dissolve (partial unions per
block, then a final union of partials — union is associative).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from buteo_ray.geom.predicates import points_in_polygon

Ring = np.ndarray
Polygon = List[Ring]


def _gather_edges(polys: Sequence[Polygon]) -> Tuple[np.ndarray, np.ndarray]:
    """All ring edges of a polygon set → (P0, P1) arrays, shape (E, 2)."""
    a, b = [], []
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)[:, :2]
            a.append(r[:-1])
            b.append(r[1:])
    if not a:
        return np.zeros((0, 2)), np.zeros((0, 2))
    return np.vstack(a), np.vstack(b)


def _cross(o, d):  # z of 2-D cross product, broadcasting
    return o[..., 0] * d[..., 1] - o[..., 1] * d[..., 0]


_PAIR_BLOCK = 1024  # caps pair-enumeration memory at ~B²·float pairs per tile


def _candidate_pairs(P0: np.ndarray, P1: np.ndarray, tol: float):
    """bbox-overlapping segment pairs (i < j), enumerated in
    ``_PAIR_BLOCK``² tiles so memory stays bounded for any edge count
    (a single np.triu_indices over E segments is O(E²) ints — 80 GB at
    E=100k)."""
    n = P0.shape[0]
    lo = np.minimum(P0, P1) - tol
    hi = np.maximum(P0, P1) + tol
    out_i, out_j = [], []
    for i0 in range(0, n, _PAIR_BLOCK):
        i1 = min(i0 + _PAIR_BLOCK, n)
        for j0 in range(i0, n, _PAIR_BLOCK):
            j1 = min(j0 + _PAIR_BLOCK, n)
            ok = ((lo[i0:i1, None, :] <= hi[None, j0:j1, :])
                  & (lo[None, j0:j1, :] <= hi[i0:i1, None, :])).all(axis=2)
            ii, jj = np.nonzero(ok)
            ii = ii + i0
            jj = jj + j0
            keep = ii < jj
            out_i.append(ii[keep])
            out_j.append(jj[keep])
    if not out_i:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_i), np.concatenate(out_j)


def _split_params(P0: np.ndarray, P1: np.ndarray, tol: float) -> List[np.ndarray]:
    """Per segment, the sorted parameter values t ∈ (0,1) where any other
    segment crosses/touches it (including collinear-overlap endpoints).
    Vectorized over bbox-prefiltered candidate pairs."""
    n = P0.shape[0]
    ts: List[List[float]] = [[] for _ in range(n)]
    if n < 2:
        return [np.array(t) for t in ts]
    D = P1 - P0
    i_idx, j_idx = _candidate_pairs(P0, P1, tol)
    if i_idx.size == 0:
        return [np.array(t) for t in ts]

    p, r = P0[i_idx], D[i_idx]
    q, s = P0[j_idx], D[j_idx]
    rxs = _cross(r, s)
    qp = q - p
    len_r = np.hypot(r[:, 0], r[:, 1])
    len_s = np.hypot(s[:, 0], s[:, 1])
    # Parallelism test scaled by the segment lengths (|r×s| = |r||s|sinθ):
    # a raw tol² threshold misses numerically-collinear float segments,
    # whose overlap points would then silently never split. The epsilon
    # must be DIMENSIONLESS (a sine bound, ~float rounding): using the
    # span-scaled tol here would classify genuinely-crossing shallow
    # pairs as parallel and drop their intersections.
    para = np.abs(rxs) <= 1e-12 * np.maximum(len_r * len_s, 1e-300)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = _cross(qp, s) / rxs
        u = _cross(qp, r) / rxs
    hit = (~para) & (t >= -tol) & (t <= 1 + tol) & (u >= -tol) & (u <= 1 + tol)
    for k in np.nonzero(hit)[0]:
        tv, uv = float(t[k]), float(u[k])
        if tol < tv < 1 - tol:
            ts[i_idx[k]].append(tv)
        if tol < uv < 1 - tol:
            ts[j_idx[k]].append(uv)

    # Collinear overlaps: |qp×r|/|r| = distance from q to the i-line.
    col = para & (np.abs(_cross(qp, r)) <= tol * np.maximum(len_r, 1e-300))
    for k in np.nonzero(col)[0]:
        i, j = i_idx[k], j_idx[k]
        for (src, dst, seg0, segd) in ((j, i, P0[i], D[i]), (i, j, P0[j], D[j])):
            dd = float(segd @ segd)
            if dd <= 0:
                continue
            for endpoint in (P0[src], P1[src]):
                tv = float((endpoint - seg0) @ segd / dd)
                if tol < tv < 1 - tol:
                    ts[dst].append(tv)
    return [np.array(sorted(set(t))) for t in ts]


def _subdivide(P0: np.ndarray, P1: np.ndarray, tol: float) -> Tuple[np.ndarray, np.ndarray]:
    """Split all segments at mutual intersections; returns new (P0, P1)."""
    params = _split_params(P0, P1, tol)
    a_out, b_out = [], []
    for i in range(P0.shape[0]):
        cuts = np.concatenate([[0.0], params[i], [1.0]])
        pts = P0[i] + np.outer(cuts, P1[i] - P0[i])
        a_out.append(pts[:-1])
        b_out.append(pts[1:])
    return np.vstack(a_out), np.vstack(b_out)


def _covered_factory(polys: Sequence[Polygon]):
    """covered(pts) → bool array: even-odd membership in ANY polygon of
    the set (each polygon tested over all its rings — holes included)."""
    ring_sets = [[np.asarray(r, dtype=np.float64)[:, :2] for r in rings]
                 for rings in polys]

    def covered(pts: np.ndarray) -> np.ndarray:
        out = np.zeros(pts.shape[0], dtype=bool)
        px, py = pts[:, 0], pts[:, 1]
        for rings in ring_sets:
            out |= points_in_polygon(px, py, rings)
        return out

    return covered


_OPS = {
    "union": lambda a, b: a | b,
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
}


def _weld_key(pts: np.ndarray, tol: float) -> np.ndarray:
    return np.round(pts / tol).astype(np.int64)


def _stitch_rings(P0: np.ndarray, P1: np.ndarray, tol: float) -> List[np.ndarray]:
    """Walk interior-left directed segments into closed rings. At a
    multi-way vertex take the sharpest LEFT turn (max CCW rotation from
    the incoming direction) — this keeps the traced face on the left."""
    if P0.shape[0] == 0:
        return []
    k0 = _weld_key(P0, tol)
    k1 = _weld_key(P1, tol)
    # drop zero-length and duplicate directed segments
    keymap = {}
    for i in range(P0.shape[0]):
        a, b = tuple(k0[i]), tuple(k1[i])
        if a == b:
            continue
        keymap.setdefault((a, b), i)
    segs = list(keymap.items())
    out_edges: dict = {}
    for (a, b), i in segs:
        out_edges.setdefault(a, []).append((b, i))
    used = set()   # edges committed to an emitted ring
    dead = set()   # start edges whose walk dangled (don't retry them)
    rings = []
    for (a0, b0), i0 in segs:
        if (a0, b0) in used or (a0, b0) in dead:
            continue
        ring_pts = [P0[i0]]
        cur = (a0, b0)
        cur_i = i0
        # Walk tentatively: edges join `used` only if the ring CLOSES —
        # an abandoned walk must not steal edges a later walk could
        # close into a valid ring.
        local_used = {cur}
        guard = 0
        closed = False
        while guard <= len(segs):
            guard += 1
            ring_pts.append(P1[cur_i])
            head = cur[1]
            if head == a0:
                closed = True
                break
            d_in = P1[cur_i] - P0[cur_i]
            ang_in = np.arctan2(d_in[1], d_in[0])
            best, best_ang = None, None
            for (nxt, j) in out_edges.get(head, []):
                if (head, nxt) in used or (head, nxt) in local_used:
                    continue
                if nxt == cur[0]:
                    # The reverse directed edge (welded keys make it
                    # geometrically identical) — never U-turn onto it;
                    # a structural check, the angle wrap maps an exact
                    # reverse to -pi and an angle guard would miss it.
                    continue
                d_out = P1[j] - P0[j]
                # CCW rotation from incoming heading, in (-pi, pi];
                # maximal value = sharpest left turn.
                ang = np.arctan2(d_out[1], d_out[0]) - ang_in
                ang = (ang + np.pi) % (2 * np.pi) - np.pi
                if best is None or ang > best_ang:
                    best, best_ang = (head, nxt, j), ang
            if best is None:
                break  # dangling — abandon this walk
            cur = (best[0], best[1])
            cur_i = best[2]
            local_used.add(cur)
        if closed and len(ring_pts) >= 4:
            used.update(local_used)
            ring = np.vstack(ring_pts)
            ring[-1] = ring[0]  # exact closure after welding
            rings.append(ring)
        else:
            dead.add((a0, b0))
    return rings


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x * y1 - x1 * y))


def _interior_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly inside a simple ring: cast a horizontal scanline
    between two distinct vertex y's and take the midpoint of the first
    crossing interval (robust for concave rings, where the vertex mean
    can land outside)."""
    ys = np.unique(ring[:-1, 1])
    if ys.shape[0] < 2:
        return ring[:-1].mean(axis=0)
    mid = ys.shape[0] // 2
    y = 0.5 * (ys[mid - 1] + ys[mid])
    a, b = ring[:-1], ring[1:]
    crosses = (np.minimum(a[:, 1], b[:, 1]) <= y) & (np.maximum(a[:, 1], b[:, 1]) > y)
    if not crosses.any():
        return ring[:-1].mean(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = a[crosses, 0] + (y - a[crosses, 1]) / (b[crosses, 1] - a[crosses, 1]) \
            * (b[crosses, 0] - a[crosses, 0])
    xs = np.sort(xs)
    if xs.shape[0] >= 2:
        return np.array([0.5 * (xs[0] + xs[1]), y])
    return np.array([xs[0], y])


def _nest_rings(rings: List[np.ndarray]) -> List[Polygon]:
    """CCW rings are exteriors, CW rings are holes of the smallest
    containing exterior (containment tested on a guaranteed-interior
    point of the hole, not the vertex mean — a concave hole's mean can
    fall in a different exterior)."""
    exts = [(abs(_ring_signed_area(r)), r) for r in rings if _ring_signed_area(r) > 0]
    holes = [r for r in rings if _ring_signed_area(r) < 0]
    exts.sort(key=lambda t: t[0])
    polys: List[Polygon] = [[r] for _, r in exts]
    for h in holes:
        cand = _interior_point(h)
        placed = False
        for idx, (_, ext) in enumerate(exts):
            if points_in_polygon(np.array([cand[0]]), np.array([cand[1]]), [ext])[0]:
                polys[idx].append(h)
                placed = True
                break
        if not placed and polys:
            polys[0].append(h)
    return polys


def polygon_boolean(polys_a: Sequence[Polygon], polys_b: Sequence[Polygon],
                    op: str = "union") -> List[Polygon]:
    """Boolean overlay of two even-odd polygon sets → list of polygons
    (each a [exterior, hole, ...] ring list; exteriors CCW, holes CW)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}")
    A0, A1 = _gather_edges(polys_a)
    B0, B1 = _gather_edges(polys_b)
    P0 = np.vstack([A0, B0])
    P1 = np.vstack([A1, B1])
    if P0.shape[0] == 0:
        return []
    span = float(max(P0.max() - P0.min(), 1.0))
    tol = 1e-9 * span
    P0, P1 = _subdivide(P0, P1, tol)

    mids = 0.5 * (P0 + P1)
    d = P1 - P0
    lens = np.hypot(d[:, 0], d[:, 1])
    ok = lens > tol
    P0, P1, mids, d, lens = P0[ok], P1[ok], mids[ok], d[ok], lens[ok]
    left_n = np.column_stack([-d[:, 1], d[:, 0]]) / lens[:, None]
    delta = 1e-6 * span
    in_a = _covered_factory(polys_a)
    in_b = _covered_factory(polys_b)
    rule = _OPS[op]
    left_in = rule(in_a(mids + delta * left_n), in_b(mids + delta * left_n))
    right_in = rule(in_a(mids - delta * left_n), in_b(mids - delta * left_n))
    keep = left_in != right_in
    P0k, P1k = P0[keep], P1[keep]
    flip = right_in[keep]  # interior on the right → flip to interior-left
    P0k[flip], P1k[flip] = P1[keep][flip], P0[keep][flip]

    rings = _stitch_rings(P0k, P1k, tol)
    return _nest_rings(rings)


def polygon_union(polys: Sequence[Polygon]) -> List[Polygon]:
    """Exact n-ary union (≙ GDAL/OGR UnionCascaded semantics for even-odd
    inputs). Associative — safe to apply per block then once on the
    partial results."""
    return polygon_boolean(polys, [], op="union")


def union_area(polys: Sequence[Polygon]) -> float:
    """Total area of an exact union result (exterior − holes)."""
    total = 0.0
    for rings in polys:
        for i, r in enumerate(rings):
            a = _ring_signed_area(r)
            total += a  # holes are CW (negative) by construction
    return total
