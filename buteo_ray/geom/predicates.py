"""Vectorized spatial predicates (pure numpy, from scratch).

Gives the engine the predicate set of the reference's spatial-join
operators — ``vector_intersect`` (``/root/reference/buteo/vector/
intersect.py:27-189``, ST_INTERSECTS semantics) and
``vector_extract_by_location`` (``vector/extract_by_location.py:28-169``,
predicates {intersects, contains, within, crosses, touches, overlaps} with
``invert`` anti-join) — without GDAL/SpatiaLite.

Tie rule (pinned, tested): point-in-polygon uses even-odd ray casting with
a half-open edge rule — a point exactly on a *left or bottom* edge is
inside, on a *right or top* edge is outside; vertices follow the same
half-open convention. ``points_in_polygon`` additionally counts points
exactly on any boundary segment as inside (closed-polygon semantics, the
ST_INTERSECTS convention used by the join operators).

Polygon-polygon predicates assume simple (non-self-intersecting) rings.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

Ring = np.ndarray  # (N, 2), closed


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: Ring) -> np.ndarray:
    """Even-odd (crossing-number) test of many points against one ring.

    Vectorized over points × edges: O(P·E) bools, no Python loop over
    points. Standard ray-casting formulation (public-domain algorithm).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]

    # Edge straddles the horizontal line through the point (half-open in y).
    straddle = (y0[None, :] > py[:, None]) != (y1[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at_y = x0[None, :] + (py[:, None] - y0[None, :]) / (y1 - y0)[None, :] * (x1 - x0)[None, :]
    crossing = straddle & (px[:, None] < x_at_y)
    return crossing.sum(axis=1) % 2 == 1


def points_on_ring(px: np.ndarray, py: np.ndarray, ring: Ring, eps: float = 0.0) -> np.ndarray:
    """True where a point lies exactly on a ring segment (collinear and
    within the segment's bbox; ``eps`` widens the collinearity tolerance)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    collinear = np.abs(cross) <= eps
    within = (
        (px >= np.minimum(x0, x1)) & (px <= np.maximum(x0, x1))
        & (py >= np.minimum(y0, y1)) & (py <= np.maximum(y0, y1))
    )
    return (collinear & within).any(axis=1)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: Sequence[Ring], include_boundary: bool = True
) -> np.ndarray:
    """Points vs a polygon with holes: even-odd over all rings (exterior
    XOR holes), optionally closed (boundary counts as inside)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    if include_boundary:
        on = np.zeros(px.shape[0], dtype=bool)
        for ring in rings:
            on |= points_on_ring(px, py, ring)
        inside |= on
    return inside


def points_strictly_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: Sequence[Ring]
) -> np.ndarray:
    """True interior test: even-odd inside AND not on any boundary segment
    (the half-open crossing rule alone counts left/bottom-edge points as
    inside, which is wrong for interior-intersection predicates)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    on = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        on |= points_on_ring(px, py, ring)
    return inside & ~on


def polygon_area(rings: Sequence[Ring]) -> float:
    """Signed-shoelace area; holes subtract. Public shoelace formula."""
    total = 0.0
    for i, ring in enumerate(rings):
        x, y = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        a = float(np.sum(x * y1 - x1 * y)) / 2.0
        total += abs(a) if i == 0 else -abs(a)
    return total


def polygon_centroid(rings: Sequence[Ring]) -> tuple:
    """Area-weighted centroid of the exterior ring (shoelace moments)."""
    ring = rings[0]
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = float(np.sum(cross)) / 2.0
    if a == 0.0:
        return (float(x.mean()), float(y.mean()))
    cx = float(np.sum((x + x1) * cross)) / (6.0 * a)
    cy = float(np.sum((y + y1) * cross)) / (6.0 * a)
    return (cx, cy)


def _orient(ax, ay, bx, by, cx, cy):
    """Sign of the cross product (b-a) × (c-a): >0 left turn, <0 right, 0 collinear."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect(a0, a1, b0, b1) -> np.ndarray:
    """Vectorized proper-or-touching segment intersection test.

    ``a0, a1``: (N, 2) arrays (segment set A); ``b0, b1``: (M, 2) arrays.
    Returns an (N, M) bool matrix. Classic orientation test with collinear
    bbox-overlap handling (public algorithm, e.g. CLRS §33.1).
    """
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)

    ax0, ay0 = a0[:, 0][:, None], a0[:, 1][:, None]
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    bx0, by0 = b0[:, 0][None, :], b0[:, 1][None, :]
    bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]

    d1 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = _orient(ax0, ay0, ax1, ay1, bx1, by1)

    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & \
             (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def _on(dx, px, py, sx0, sy0, sx1, sy1):
        return (dx == 0) & (px >= np.minimum(sx0, sx1)) & (px <= np.maximum(sx0, sx1)) & \
               (py >= np.minimum(sy0, sy1)) & (py <= np.maximum(sy0, sy1))

    touch = (
        _on(d1, ax0, ay0, bx0, by0, bx1, by1)
        | _on(d2, ax1, ay1, bx0, by0, bx1, by1)
        | _on(d3, bx0, by0, ax0, ay0, ax1, ay1)
        | _on(d4, bx1, by1, ax0, ay0, ax1, ay1)
    )
    return proper | touch


def _ring_edges(rings: Sequence[Ring]):
    starts = np.vstack([r[:-1] for r in rings])
    ends = np.vstack([r[1:] for r in rings])
    return starts, ends


def _edges_properly_cross(rings_a: Sequence[Ring], rings_b: Sequence[Ring]) -> np.ndarray:
    a0, a1 = _ring_edges(rings_a)
    b0, b1 = _ring_edges(rings_b)
    ax0, ay0 = a0[:, 0][:, None], a0[:, 1][:, None]
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    bx0, by0 = b0[:, 0][None, :], b0[:, 1][None, :]
    bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
    d1 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = _orient(ax0, ay0, ax1, ay1, bx1, by1)
    return ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & \
           (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)


def polygons_intersect(rings_a: Sequence[Ring], rings_b: Sequence[Ring]) -> bool:
    """ST_INTERSECTS for two simple polygons: any boundary contact or one
    containing the other."""
    a0, a1 = _ring_edges(rings_a)
    b0, b1 = _ring_edges(rings_b)
    if segments_intersect(a0, a1, b0, b1).any():
        return True
    # No edge contact → either disjoint or one fully inside the other.
    if points_in_polygon(rings_b[0][:1, 0], rings_b[0][:1, 1], rings_a)[0]:
        return True
    if points_in_polygon(rings_a[0][:1, 0], rings_a[0][:1, 1], rings_b)[0]:
        return True
    return False


def polygon_contains_polygon(rings_a: Sequence[Ring], rings_b: Sequence[Ring]) -> bool:
    """A contains B: every B vertex inside (closed) A, no proper edge
    crossing, and no A hole swallowed by B (a hole strictly inside B
    leaves no vertex outside and no crossing, yet its interior is not
    part of A). Exact for simple polygons without holes touching B."""
    vb = np.vstack([r[:-1] for r in rings_b])
    if not points_in_polygon(vb[:, 0], vb[:, 1], rings_a).all():
        return False
    if _edges_properly_cross(rings_a, rings_b).any():
        return False
    for hole in rings_a[1:]:
        if points_strictly_in_polygon(hole[:-1, 0], hole[:-1, 1], rings_b).any():
            return False
    return True


def polygon_relate(rings_a: Sequence[Ring], rings_b: Sequence[Ring], predicate: str) -> bool:
    """Named-predicate dispatch mirroring the reference's
    ``extract_by_location`` predicate set (``vector/extract_by_location.py:
    142-155``): intersects, contains, within, touches, overlaps, crosses
    (crosses is always False for area/area pairs, per OGC)."""
    if predicate == "intersects":
        return polygons_intersect(rings_a, rings_b)
    if predicate == "contains":
        return polygon_contains_polygon(rings_a, rings_b)
    if predicate == "within":
        return polygon_contains_polygon(rings_b, rings_a)
    if predicate == "crosses":
        return False  # area/area crosses is undefined-false per OGC SFS
    if predicate == "touches":
        if not polygons_intersect(rings_a, rings_b):
            return False
        if _edges_properly_cross(rings_a, rings_b).any():
            return False
        # Boundary contact only: probe vertices, edge midpoints AND
        # centroids for strict-interior hits (vertices alone miss
        # identical/contained polygons whose vertices all sit on the
        # other's boundary; centroid covers those for the star-shaped
        # polygons this engine produces — pathological concave cases may
        # still evade the probe set, documented).
        def _probe_pts(rings):
            v = np.vstack([r[:-1] for r in rings])
            mids = np.vstack([(r[:-1] + r[1:]) / 2.0 for r in rings])
            c = np.array([polygon_centroid(rings)])
            return np.vstack([v, mids, c])

        pa_pts = _probe_pts(rings_a)
        pb_pts = _probe_pts(rings_b)
        a_in = points_strictly_in_polygon(pb_pts[:, 0], pb_pts[:, 1], rings_a)
        b_in = points_strictly_in_polygon(pa_pts[:, 0], pa_pts[:, 1], rings_b)
        return not (a_in.any() or b_in.any())
    if predicate == "overlaps":
        if not polygons_intersect(rings_a, rings_b):
            return False
        if polygon_contains_polygon(rings_a, rings_b) or polygon_contains_polygon(rings_b, rings_a):
            return False
        if polygon_relate(rings_a, rings_b, "touches"):
            return False
        return True
    raise ValueError(f"unknown predicate: {predicate}")


def clip_polygon_convex(subject: Ring, clip_ring: Ring) -> np.ndarray:
    """Sutherland–Hodgman clip of a subject ring against a CONVEX clip ring
    (public algorithm). Returns a closed ring (possibly empty (0, 2)).
    Backs the ``vector_clip`` operator (reference ``vector/clip.py:24-151``
    semantics: intersection-and-crop) for convex clip geometries."""
    clip_ring = np.asarray(clip_ring, dtype=np.float64)
    # Ensure counter-clockwise clip ring for a consistent inside test.
    x, y = clip_ring[:-1, 0], clip_ring[:-1, 1]
    x1, y1 = clip_ring[1:, 0], clip_ring[1:, 1]
    if float(np.sum(x * y1 - x1 * y)) < 0:
        clip_ring = clip_ring[::-1]

    output = [tuple(p) for p in np.asarray(subject, dtype=np.float64)[:-1]]
    for i in range(len(clip_ring) - 1):
        cx0, cy0 = clip_ring[i]
        cx1, cy1 = clip_ring[i + 1]
        input_pts, output = output, []
        if not input_pts:
            break
        for j, (px, py) in enumerate(input_pts):
            qx, qy = input_pts[(j + 1) % len(input_pts)]
            p_in = _orient(cx0, cy0, cx1, cy1, px, py) >= 0
            q_in = _orient(cx0, cy0, cx1, cy1, qx, qy) >= 0
            if p_in:
                output.append((px, py))
            if p_in != q_in:
                # Solve orient(c0, c1, p + t·(q−p)) = 0 for t.
                denom = (cx1 - cx0) * (qy - py) - (cy1 - cy0) * (qx - px)
                if denom != 0:
                    t = ((cy1 - cy0) * (px - cx0) - (cx1 - cx0) * (py - cy0)) / denom
                    output.append((px + t * (qx - px), py + t * (qy - py)))
    if len(output) < 3:
        return np.empty((0, 2), dtype=np.float64)
    out = np.asarray(output, dtype=np.float64)
    return np.vstack([out, out[:1]])
